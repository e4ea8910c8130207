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

# Queries that MUST sit inside the first-50 driver window this round.
# Round 9 is the first STALENESS-ROTATION round (VERDICT r8 item 2):
# every registered entry already has a driver-green row (r3..r8), so
# the window re-verifies the oldest anchors. Extend the first block
# when adding a query — never bump a count constant (VERDICT r4 #1:
# the count-based assert rotted; set-based invariants cannot).
ROUND9_WINDOW_MUST: tuple = (
    # added in round 9 — each takes its FIRST driver row this round;
    # extend as queries land (displaces the r5 fill, never the r4
    # anchors)
    "gdpr_sync_replay",
    "approx_distinct_hll_packed",
    "interval_overlap_two_level",
    "knn_ivf_sample_sweep",
    "embedding_dbscan",
    "bm25_rocchio_search",
    "lm_dirichlet_search",
    "streaming_exact_dedup",
    "mmr_rerank",
    "search_snippets",
    "sliding_uniques_hll",
    "phrase_search",
    "search_facets",
    "query_autocomplete",
    "user_survival",
    "benford_audit",
    "token_gini",
    "knn_label_modularity",
    "lm_kneser_ney",
    "boolean_search",
    "stat_ks_test",
    "stat_mann_whitney",
    "stat_chi_square",
    "theil_sen_trend",
    "good_turing",
    "stupid_backoff",
    # the longest-unrefreshed anchors (last driver-green row:
    # CORRECTNESS_r04) that still FIT after the new-query block: new
    # queries take window priority (a first-ever driver row beats a
    # refresh), so 24 of the 37 r4 anchors refresh this round and the
    # displaced 13 head the round-10 window (ROUND10_WINDOW_MUST)
    "approx_distinct_kmv",
    "chunk_collapse",
    "chunk_fixed",
    "corpus_shards",
    "cube_agg",
    "customers_without_orders",
    "doc_clusters",
    "doc_length_histogram",
    "events_anomaly",
    "events_asof",
    "events_funnel",
    "events_props_json",
    "events_range_window",
    "events_sliding",
    "events_tumbling",
    "join_revenue",
    "more_like_this",
    "multi_collection_dense",
    "nb_classify",
    "ngram_topk",
    "order_priority",
    "parse_routed",
    "pricing_summary",
    "rerank_search",
)


# Entries added AFTER the round-9 window fills (50/50), if any: never
# driver-evaluated, verified locally via tools/check_oracle.py. These
# MUST head the round-10 window — promote this tuple into the next
# round's WINDOW_MUST list during rotation.
ROUND10_WINDOW_MUST: tuple = (
    # queries added after the r9 window filled — locally oracle-
    # verified, first driver row next rotation
    "heaps_law",
    "corpus_drift_jsd",
    "item_item_cf",
    "burrows_delta",
    "hill_tail",
    "ltr_features",
    "market_hhi",
    "cuped_ab",
    "logrank_test",
    "knn_clustering",
    "price_elasticity",
    "forecast_backtest",
    "streaming_chi_square",
    "markov_stationary",
    "textrank_sentences",
    "referential_integrity",
    "markov_attribution",
    "sequential_patterns",
    "poisson_bootstrap",
    "funnel_wilson",
    "eb_item_rates",
    "ks_family_bh",
    "rank_tau",
    "collocations_llr",
    "knn_harmonic",
    "label_centroids",
    "simpson_audit",
    "mutual_information",
    "cohens_kappa",
    "ljung_box",
    "roc_auc",
    "pacf_daily",
    "brown_forsythe",
    # r4-anchored entries displaced from the round-9 window by the
    # round's 26 new queries — their refresh rolls to round 10
    "rollup_agg",
    "sniff_formats",
    "text_collocations",
    "text_curation",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_repetition",
    "text_token_counts",
    "topk_per_group",
    "user_retention",
    "user_sessions",
    "value_percentiles",
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
    """Round-9 window contract (README 'Correctness window rotation'):
    new queries and the longest-unrefreshed anchors sit in the first 50."""
    window = list(entrymod.queries())[:50]
    for must in ROUND9_WINDOW_MUST:
        assert must in window, f"{must} fell out of the driver window"
    # round-10 candidates (post-window additions) are registered, past
    # the boundary, awaiting their first driver row next rotation
    names = set(entrymod.queries())
    for must in ROUND10_WINDOW_MUST:
        assert must in names, f"{must} not registered"


def test_query_callables_take_spark_and_sfdir():
    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, (name, params)


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().lower()
        assert s.startswith(("select", "with")), name
