"""IMAP mailbox connector (S3).

Reference parity (shared/connectors/imap.py:63-589):
  enumerate   per-mailbox UID listing, newest-first, batch fetch
  cursor      :213-229  per-mailbox `last_seen_uid` — incremental sync
              re-enumerates only UIDs above the cursor
  decode      :32-62    MIME header decode + date normalization (C11,
              shared with sources.parsers)

Storage is a mail server, not a filesystem, so enumeration is
driver-side protocol I/O (same as the reference); the engine's work is
the row contract and the incremental-cursor algebra:

  - enumerate → FileReference-shaped rows (uri `imap://host/mailbox;uid=N`,
    content = raw RFC-822 bytes, change_hint = uid) parallelized into a
    DataFrame, then the stdlib email parser (sources.parsers.parse_email)
    runs distributed over them.
  - the UID cursor is MAX(uid) per mailbox — a one-row aggregate of the
    previous run's output, exactly a streaming checkpoint in batch form.

The client is injected (any imaplib-compatible object) so tests run
against a fake; production passes `imaplib.IMAP4_SSL(...)` — stdlib,
no extra deps.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)


class ImapClient(Protocol):
    """The slice of imaplib.IMAP4 the connector uses."""

    def select(self, mailbox: str, readonly: bool = True): ...
    def uid(self, command: str, *args): ...


ENUM_SCHEMA = StructType([
    StructField("uri", StringType()),
    StructField("mailbox", StringType()),
    StructField("uid", LongType()),
    StructField("size_bytes", LongType()),
    StructField("content", BinaryType()),
    StructField("content_type", StringType()),
    StructField("source_type", StringType()),
    StructField("change_hint", StringType()),
])


def _uid_search_above(client: ImapClient, cursor: int) -> list[int]:
    # UID ranges are inclusive; cursor+1:* returns everything new.
    criterion = f"UID {cursor + 1}:*" if cursor > 0 else "ALL"
    typ, data = client.uid("search", None, criterion)
    if typ != "OK" or not data or not data[0]:
        return []
    uids = [int(u) for u in data[0].split()]
    # servers answer `N:*` with the last message even when N > max — drop
    # anything at/below the cursor (imap.py cursor guard)
    return [u for u in uids if u > cursor]


def enumerate_mailbox(spark: SparkSession, client: ImapClient, host: str,
                      mailbox: str = "INBOX", last_seen_uid: int = 0,
                      batch_size: int = 100) -> DataFrame:
    """Incremental enumeration: messages with uid > last_seen_uid as
    FileReference-shaped rows. Fetching is batched (RFC822 bodies,
    `batch_size` UIDs per round-trip, the reference's batch shape)."""
    client.select(mailbox, readonly=True)
    uids = _uid_search_above(client, last_seen_uid)
    rows = []
    for i in range(0, len(uids), batch_size):
        batch = uids[i:i + batch_size]
        uid_set = ",".join(str(u) for u in batch)
        typ, data = client.uid("fetch", uid_set, "(RFC822)")
        if typ != "OK":
            continue
        fetched: dict[int, bytes] = {}
        # imaplib fetch data: [(b'1 (UID 7 RFC822 {123}', b'raw...'), b')', ...]
        it = iter(data or [])
        for item in it:
            if isinstance(item, tuple) and len(item) >= 2:
                header = item[0].decode("ascii", errors="replace")
                raw = item[1]
                import re

                m = re.search(r"UID (\d+)", header)
                if m:
                    fetched[int(m.group(1))] = bytes(raw)
        for u in batch:
            raw = fetched.get(u)
            if raw is None:
                continue
            rows.append((
                f"imap://{host}/{mailbox};uid={u}", mailbox, u, len(raw),
                raw, "message/rfc822", "imap", str(u),
            ))
    return spark.createDataFrame(rows, ENUM_SCHEMA)


def next_cursor(enumerated: DataFrame, last_seen_uid: int = 0) -> int:
    """New per-mailbox cursor = max(uid) of this run (imap.py:213-229);
    unchanged when the run was empty."""
    row = enumerated.agg(F.max("uid").alias("m")).collect()[0]
    return int(row.m) if row.m is not None else last_seen_uid


def mailbox_documents(spark: SparkSession, client: ImapClient, host: str,
                      mailbox: str = "INBOX", last_seen_uid: int = 0) -> DataFrame:
    """enumerate → distributed stdlib email parse → document rows
    (uri, uid, subject, from_addr, to_addr, sent_at, text, parse_status)."""
    from semantik_spark.sources.parsers import parse_email

    enum = enumerate_mailbox(spark, client, host, mailbox, last_seen_uid)
    parsed = parse_email(enum)
    return (
        enum.select("uri", "mailbox", "uid", "size_bytes", "change_hint")
        .join(parsed, "uri")
    )
