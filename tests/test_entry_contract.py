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
# the 10 late-round-5 additions awaiting their first driver row, plus
# every query added or behavior-changed in round 6.  Extend this list
# when adding a query — never bump a count constant (VERDICT r4 #1:
# the count-based assert rotted; set-based invariants below cannot).
ROUND6_WINDOW_MUST = (
    # late round-5 additions — first driver evaluation (judge
    # pre-verified green via tools/check_oracle.py at sf0.01)
    "quantile_sketch", "dedup_lsh_recall", "url_domain_stats",
    "customer_order_distribution", "top_supplier", "idle_customer_balance",
    "heavy_hitters", "bloom_prune", "winsorized_stats",
    "nation_trade_volume",
    # added in round 6 — extend as queries land
    "min_cost_supplier", "excess_qty_supplier", "streaming_heavy_hitters",
    "pipeline_config", "edit_distance_pairs", "bpe_merges",
    "bpe_encode_words", "sole_fault_supplier", "nation_year_profit",
    "gopher_quality", "knn_ivfpq", "dsir_weights", "count_min_freq",
    "streaming_count_min", "semdedup", "logreg_scores", "jl_projection",
    "streaming_lsh_dedup", "market_share", "top_revenue_parts",
    "corpus_overlap", "corpus_drift_psi", "late_data_audit",
    "leakage_safe_split", "knn_nprobe_sweep",
)


# Entries added AFTER the round-6 window fills (50/50): never
# driver-evaluated, verified locally via tools/check_oracle.py. These
# MUST head the round-7 window — promote this tuple into the next
# round's WINDOW_MUST list during rotation.
ROUND7_WINDOW_MUST = (
    "scd2_orders", "events_cusum", "compaction_plan", "knn_communities",
    "simhash_radius_recall", "cdc_dedup", "events_trend", "scd2_asof_join",
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
    """Round-6 window contract (README 'Correctness window rotation'):
    never-driver-evaluated and new/changed queries sit in the first 50."""
    window = list(entrymod.queries())[:50]
    for must in ROUND6_WINDOW_MUST:
        assert must in window, f"{must} fell out of the driver window"
    # round-7 candidates are registered (past the boundary, awaiting
    # their first driver row next rotation)
    names = set(entrymod.queries())
    for must in ROUND7_WINDOW_MUST:
        assert must in names, f"{must} not registered"


def test_query_callables_take_spark_and_sfdir():
    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, (name, params)


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().lower()
        assert s.startswith(("select", "with")), name
