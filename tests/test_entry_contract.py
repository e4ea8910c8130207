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

# Queries that MUST sit inside the first-50 driver window this round:
# the 29 round-7 post-window additions awaiting their first driver row
# (judge pre-verified all 29 green at sf0.01 in the r7 verdict), plus
# every query added in round 8.  Extend this list when adding a query —
# never bump a count constant (VERDICT r4 #1: the count-based assert
# rotted; set-based invariants below cannot).
ROUND8_WINDOW_MUST: tuple = (
    "knn_binary",
    "dedup_spans",
    "matryoshka_recall",
    "dedup_cut",
    "stream_interval_join",
    "bm25_pruned_search",
    "unigram_pieces",
    "unigram_encode",
    "knn_ivf_append",
    "stream_interval_join_outer",
    "knn_kcore",
    "textrank_keywords",
    "maxsim_rerank",
    "spell_suggestions",
    "incremental_clusters",
    "events_seasonal",
    "quality_calibrated",
    "bpe_fertility",
    "streaming_scd2",
    "text_entropy",
    "value_band_pairs",
    "events_mad_outliers",
    "curated_manifest",
    "unigram_em_encode",
    "dedup_containment",
    "knn_ppr",
    "customer_rfm",
    "streaming_sessions",
    "events_concurrency",
    # added in round 8 — extend as queries land
    "gdpr_delete_cascade",
    "bm25_append_delete_replay",
    "knn_ivf_sampled",
    "forecast_revenue",
    "approx_distinct_hll",
    "interval_overlap",
    "events_acf",
    "wordpiece_merges",
    "wordpiece_encode",
    "record_linkage",
    "k_anonymity",
    "knn_link_prediction",
    "streaming_hll",
    "temporal_split",
    "knn_assortativity",
)


# Entries added AFTER the round-8 window fills (50/50), if any: never
# driver-evaluated, verified locally via tools/check_oracle.py. These
# MUST head the round-9 window — promote this tuple into the next
# round's WINDOW_MUST list during rotation.
ROUND9_WINDOW_MUST: tuple = ()


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    missing = [k for k in qs if k not in oq]
    assert missing == [], f"queries without oracle SQL: {missing}"
    orphans = [k for k in oq if k not in qs]
    assert orphans == [], f"oracle entries without a query: {orphans}"
    assert set(qs) == set(oq)


def test_window_holds_rotation_invariants():
    """Round-8 window contract (README 'Correctness window rotation'):
    never-driver-evaluated and new/changed queries sit in the first 50."""
    window = list(entrymod.queries())[:50]
    for must in ROUND8_WINDOW_MUST:
        assert must in window, f"{must} fell out of the driver window"
    # round-9 candidates (post-window additions) are registered, past
    # the boundary, awaiting their first driver row next rotation
    names = set(entrymod.queries())
    for must in ROUND9_WINDOW_MUST:
        assert must in names, f"{must} not registered"


def test_query_callables_take_spark_and_sfdir():
    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, (name, params)


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().lower()
        assert s.startswith(("select", "with")), name
