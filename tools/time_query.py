"""Time declared queries in isolation with the noop sink (guide §1.4).

Usage:
    SPARK_GRAFT_SF_DIR=... python tools/time_query.py [-r REPS] q1 [q2 ...]

Each query is labelled (setJobDescription), executed REPS times (default
3) against the noop sink — computing every column of every row, no
result-collection cost — and reported as median/min/max wall seconds
plus the UI job/stage/task/shuffle counters of the first rep. This is
the isolation harness for optimization work; bench.py stays the
driver-comparable suite measurement (its .count() timing methodology is
unchanged).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from semantik_spark.session import get_spark
    from bench import PlanCounters

    spark = get_spark("time_query")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # session warm-up
    pc = PlanCounters(spark)
    qs = entrymod.queries()
    for name in args:
        if name not in qs:
            print(f"skip {name}: not in queries()")
            continue
        times = []
        counters = {}
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            if rep == 0:
                snap = pc.snapshot()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            times.append(time.time() - t0)
            if rep == 0:
                counters = pc.delta(snap)
            spark.sparkContext.setJobDescription(None)
        c = counters
        cx = (f"  [{c['jobs']} jobs {c['stages']} stages {c['tasks']} tasks "
              f"shW {c['shuffle_write_bytes']/1e6:.2f}MB "
              f"shR {c['shuffle_read_bytes']/1e6:.2f}MB]" if c else "")
        print(f"{name}: median {statistics.median(times):.3f}s  "
              f"min {min(times):.3f}s  max {max(times):.3f}s{cx}")


if __name__ == "__main__":
    main()
