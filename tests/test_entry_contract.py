"""Driver-contract tripwires for __spark_entry__ (no SparkSession).

The correctness driver evaluates the FIRST 50 queries() entries, so an
accidental reorder or a new no-oracle entry silently shrinks coverage.
These asserts fail fast instead.
"""

from __future__ import annotations

import inspect
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

EXPECTED_TOTAL = 112


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    assert len(qs) == EXPECTED_TOTAL
    missing = [k for k in qs if k not in oq]
    assert missing == [], f"queries without oracle SQL: {missing}"
    orphans = [k for k in oq if k not in qs]
    assert orphans == [], f"oracle entries without a query: {orphans}"


def test_window_holds_rotation_invariants():
    """Round-4 window contract (README 'Correctness window rotation'):
    the new/changed queries of this round must sit inside the first 50."""
    window = list(entrymod.queries())[:50]
    for must in ("knn_recall", "pca_projection", "parse_routed",
                 "sniff_formats", "events_sliding", "dedup_embedding",
                 "dedup_canonical", "dedup_passages", "stratified_sample",
                 "text_vocab", "text_collocations", "corpus_shards",
                 "events_anomaly",
                 "events_tumbling", "user_sessions", "events_asof",
                 "events_range_window",
                 "nb_classify", "more_like_this", "cube_agg",
                 "order_priority", "value_percentiles",
                 "doc_length_histogram", "ngram_topk", "knn_pq",
                 "doc_clusters", "approx_distinct_kmv"):
        assert must in window, f"{must} fell out of the driver window"


def test_query_callables_take_spark_and_sfdir():
    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, (name, params)


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().lower()
        assert s.startswith(("select", "with")), name
