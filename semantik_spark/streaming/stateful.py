"""Custom stateful streaming operators via applyInPandasWithState.

The reference's incremental sync keeps per-source cursors (IMAP UID
cursors imap.py:213-229, per-document content-hash change detection
executor.py:713-744) and per-operation progress counters
(executor.py:188-200). In Structured Streaming those become *keyed
state* maintained by the engine across micro-batches and restarts
(checkpointed), not rows in a control table:

  running_source_stats — per-key running document count / byte total /
                         last content hash; the streaming twin of the
                         reference's Operation progress counters.
  session_tracker      — gap-based sessionization with event-time
                         timeout: sessions are emitted when the
                         watermark passes their gap deadline, the
                         applyInPandasWithState shape of
                         streaming/windows.sessionize.

Both are arbitrary-stateful operators — semantics Spark's built-in
windowed aggregations can't express (emit-on-timeout, custom merge
logic) — which is exactly the applyInPandasWithState escape hatch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = (
    "source string, n_docs bigint, total_bytes bigint, last_hash string"
)
_RUNNING_STATE_SCHEMA = "n_docs bigint, total_bytes bigint, last_hash string"

SESSION_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, n_events bigint"
)
_SESSION_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _fold_running_stats(pdfs: "Iterator[pd.DataFrame]", size_col: str,
                        hash_col: str,
                        init: tuple[int, int, Any]) -> tuple[int, int, Any]:
    """Pure fold for running_source_stats — exposed for direct testing.

    "Last hash" within one micro-batch is the hash of the row with the
    MAXIMUM order key across ALL Arrow chunks of the group, not the
    last chunk's maximum: the iterator's chunk boundaries are
    Arrow-batch-size dependent (nondeterministic), so a per-chunk
    `sort_values().iloc[-1]` that lets later chunks overwrite earlier
    ones would make the emitted hash depend on how the group happened
    to be chunked (r13 formula review — the claim of determinism held
    only for single-chunk groups)."""
    n_docs, total_bytes, last_hash = init
    best: tuple[Any, Any] | None = None  # (order_value, hash) this batch
    for pdf in pdfs:
        n_docs += len(pdf)
        total_bytes += int(pdf[size_col].fillna(0).sum())
        if len(pdf) and hash_col in pdf.columns:
            order_col = "doc_id" if "doc_id" in pdf.columns else hash_col
            chunk = pdf[[order_col, hash_col]].dropna(subset=[order_col])
            if len(chunk):
                row = chunk.loc[chunk[order_col].idxmax()]
                cand = (row[order_col], row[hash_col])
                if best is None or cand[0] > best[0]:
                    best = cand
    if best is not None:
        last_hash = best[1]
    return n_docs, total_bytes, last_hash


def running_source_stats(docs: DataFrame, key_col: str = "source",
                         size_col: str = "n_chars", hash_col: str = "content_hash") -> DataFrame:
    """Per-source running ingest counters, updated every micro-batch.

    Emits one row per key per batch with the TOTAL so far (count, bytes,
    last content hash seen) — state survives across batches and
    restarts via the checkpoint. Batch DataFrames work too (one batch).
    """

    def update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        init = state.get if state.exists else (0, 0, None)
        n_docs, total_bytes, last_hash = _fold_running_stats(
            pdfs, size_col, hash_col, init)
        state.update((n_docs, total_bytes, last_hash))
        yield pd.DataFrame([{
            "source": key[0], "n_docs": n_docs,
            "total_bytes": total_bytes, "last_hash": last_hash,
        }])

    return docs.groupBy(key_col).applyInPandasWithState(
        update, RUNNING_STATS_SCHEMA, _RUNNING_STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout,
    )


def session_tracker(events: DataFrame, gap_minutes: int = 30,
                    key_col: str = "user_id", ts_col: str = "ts",
                    watermark_delay: str = "0 seconds") -> DataFrame:
    """Gap-based sessionization with emit-on-timeout.

    Keeps (start, end, n) per user in state; extends the open session
    while events keep arriving within the gap, EMITS the closed session
    and starts a new one when an event lands beyond the gap, and emits
    the open session once the event-time watermark passes its gap
    deadline (EventTimeTimeout — deterministic, replayable, terminates
    cleanly under availableNow, unlike a processing-time timeout which
    keeps the trigger loop alive). This custom merge/emit logic is what
    the built-in session_window() aggregation can't express — the
    applyInPandasWithState escape hatch. ``ts_col`` must be a
    TimestampType column; the watermark is applied here.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[dict] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append({"user_id": key[0], "session_start_us": s,
                               "session_end_us": e, "n_events": n})
            state.remove()
            if closed:
                yield pd.DataFrame(closed)
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            col = pd.to_datetime(pdf[ts_col])
            ts_us.extend(int(v.value // 1000) for v in col)
        ts_us.sort()
        if state.exists:
            s, e, n = state.get
        else:
            s = e = n = None
        for t in ts_us:
            if s is None:
                s, e, n = t, t, 1
            elif t - e > gap_us:
                closed.append({"user_id": key[0], "session_start_us": s,
                               "session_end_us": e, "n_events": n})
                s, e, n = t, t, 1
            else:
                # late-but-within-watermark events (possible whenever
                # watermark_delay > 0) may only WIDEN the open session —
                # an out-of-order t must never rewind session_end or the
                # timeout deadline, nor clip session_start
                s, e, n = min(s, t), max(e, t), n + 1
        if s is not None:
            state.update((s, e, n))
            # close when the watermark passes session_end + gap (ms epoch)
            state.setTimeoutTimestamp((e + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(closed)

    return events.withWatermark(ts_col, watermark_delay).groupBy(key_col).applyInPandasWithState(
        update, SESSION_SCHEMA, _SESSION_STATE_SCHEMA,
        "append", GroupStateTimeout.EventTimeTimeout,
    )
