"""Capture .explain("formatted") output for declared queries.

Usage:
    python tools/capture_plans.py <out_suffix> [query ...]
    SPARK_GRAFT_PLANS_DIR=plans/r14 python tools/capture_plans.py ...

Writes plans/<dir>/<query>_<out_suffix>.txt for each named query (or
every BENCH query when none are named). The RETURNED plan is captured
without running its action (initial plan, AdaptiveSparkPlan
isFinalPlan=false) — the judge checks plan-shape claims (Exchange
count, join strategy, PushedFilters, BatchEvalPython nodes) against
these files.

CAVEAT (ADVICE r13): several query builders run EAGER work at
plan-BUILD time — driver training collects (ivf/bpe/logreg) and eager
localCheckpoints (rank_tau, search_snippets, item_item_cf, event_assoc,
theil_sen, rerank_search) — so "captured without executing" applies to
the returned plan only, and a checkpointed subtree prints as a leaf
(ExistingRDD / Scan ExistingRDD). When comparing before/after pairs
across a change that ADDS a checkpoint, the Exchange-count drop partly
reflects plan TRUNCATION (the exchanges moved into the eager build),
not elimination — judge such changes by runtime counters (bench.py
jobs/shuffle deltas), and read the per-file header line this tool now
writes, which flags plans containing checkpoint leaves.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from semantik_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    for name in names:
        if name not in qs:
            print(f"skip {name}: not in queries()")
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            # header flag (ADVICE r13): a checkpointed subtree prints
            # as a leaf, so Exchange counts partly reflect truncation —
            # say so in the artifact itself
            n_leaf = text.count("ExistingRDD")
            if n_leaf:
                text = (f"# NOTE: plan contains {n_leaf} checkpoint "
                        "leaf(s) (Scan ExistingRDD) — subtree(s) were "
                        "materialized eagerly at build time; Exchange "
                        "counts exclude the truncated subtree(s)\n"
                        + text)
        except Exception as e:  # plan build failed — record why
            text = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        n_py = sum(text.count(t) for t in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                    "MapInArrow"))
        print(f"wrote {path}  [Exchange x{n_ex}, python-eval x{n_py}]")


if __name__ == "__main__":
    main()
