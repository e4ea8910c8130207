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
# the 36 late-round-4 additions awaiting their first driver row, plus
# every query added or behavior-changed in round 5.  Extend this list
# when adding a query — never bump a count constant (VERDICT r4 #1:
# the count-based assert rotted; set-based invariants below cannot).
ROUND5_WINDOW_MUST = (
    # mid/late round-4 additions — first driver evaluation
    "text_readability", "source_mix", "events_rolling",
    "value_correlation", "lm_bigram", "events_transitions",
    "text_boilerplate", "contamination_report", "approx_distinct_daily",
    "funnel_latency", "source_mix_temp", "session_paths",
    "cluster_keywords", "doc_outliers", "hybrid_weighted",
    "profile_table", "state_islands", "zipf_fit", "length_bins",
    "hard_negatives", "knn_pagerank", "event_assoc", "events_ewma",
    "knn_triangles", "kmv_set_ops", "local_supplier_revenue",
    "customer_value_ranks", "priority_grouping_sets", "events_twap",
    "fuzzy_pairs", "purchase_attribution", "dedup_jaccard_prefix",
    "weighted_sample", "events_pivot", "events_dedup_first",
    "ivm_counters",
    # behavior-changed in round 5 (real container decode)
    "multimodal_features", "multimodal_frames",
    # added in round 5
    "audio_wav_segments", "artifact_roundtrip", "bluegreen_swap",
    "shipping_priority", "returned_items", "late_shipment_priority",
    "promo_revenue", "parts_supplier_count", "small_qty_revenue",
    "large_orders", "discounted_revenue", "splade_vocab",
)


# Added AFTER the round-5 window filled (50/50): never driver-evaluated,
# verified locally via tools/check_oracle.py at sf0.001 + sf0.01. These
# MUST head the round-6 window — promote this tuple into the next
# round's WINDOW_MUST list during rotation.
ROUND6_WINDOW_MUST = (
    "quantile_sketch", "dedup_lsh_recall", "url_domain_stats",
    "customer_order_distribution", "top_supplier", "idle_customer_balance",
    "heavy_hitters", "bloom_prune", "winsorized_stats",
    "nation_trade_volume",
)


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    missing = [k for k in qs if k not in oq]
    assert missing == [], f"queries without oracle SQL: {missing}"
    orphans = [k for k in oq if k not in qs]
    assert orphans == [], f"oracle entries without a query: {orphans}"
    assert set(qs) == set(oq)


def test_window_holds_rotation_invariants():
    """Round-5 window contract (README 'Correctness window rotation'):
    never-driver-evaluated and new/changed queries sit in the first 50."""
    window = list(entrymod.queries())[:50]
    for must in ROUND5_WINDOW_MUST:
        assert must in window, f"{must} fell out of the driver window"
    # round-6 candidates are registered (past the boundary, awaiting
    # their first driver row next rotation)
    names = set(entrymod.queries())
    for must in ROUND6_WINDOW_MUST:
        assert must in names, f"{must} not registered"


def test_query_callables_take_spark_and_sfdir():
    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, (name, params)


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().lower()
        assert s.startswith(("select", "with")), name
