"""Z-order layout (operators/storage.py): file-level min/max envelopes
must enable skipping on EVERY z-ordered column, which a single-column
sort cannot do. Bucketed-join plan assertions live in test_plans.py."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from semantik_spark.operators.storage import zorder_write


def _file_envelopes(path: str, col_a: str, col_b: str):
    """(min, max) of both columns per parquet file, from footer stats."""
    envs = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    mins[name] = mn if mins[name] is None else min(mins[name], mn)
                    maxs[name] = mx if maxs[name] is None else max(maxs[name], mx)
        envs.append({c: (mins[c], maxs[c]) for c in (col_a, col_b)})
    return envs


def _files_overlapping(envs, col, lo, hi) -> int:
    return sum(1 for e in envs if not (e[col][1] < lo or e[col][0] > hi))


def test_zorder_skips_files_on_both_columns(spark, tmp_path):
    # two independent uniform columns — the adversarial case for any
    # single-column sort
    df = spark.range(40_000).select(
        F.col("id").alias("a"),
        ((F.col("id") * 48271) % 40_000).alias("b"),
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted_a")
    zorder_write(df, zpath, ["a", "b"], n_files=64)
    # baseline: sort by a only, same file count
    (df.repartitionByRange(64, "a").sortWithinPartitions("a")
       .write.mode("overwrite").parquet(spath))

    z = _file_envelopes(zpath, "a", "b")
    s = _file_envelopes(spath, "a", "b")
    assert len(z) == 64 and len(s) == 64
    # a 2.5% range query on each column
    lo, hi = 10_000, 11_000
    for col in ("a", "b"):
        # z-order: both columns skip a clear majority of files
        assert _files_overlapping(z, col, lo, hi) <= 24, col
    assert _files_overlapping(s, "a", lo, hi) <= 4          # sort wins on its column…
    assert _files_overlapping(s, "b", lo, hi) == 64         # …and prunes NOTHING on the other
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == 40_000


def test_bloom_prune_no_false_negatives_and_measured_fp(spark):
    from semantik_spark.operators.storage import bloom_prune_stats

    small = spark.createDataFrame([(i,) for i in range(0, 50)], ["key"])
    large = spark.createDataFrame([(i,) for i in range(0, 2000)], ["key"])
    # tiny filter → false positives guaranteed measurable
    r = bloom_prune_stats(large, small, "key", n_bits=256, k=2).collect()[0]
    assert r["n_small_keys"] == 50 and r["n_probe_keys"] == 2000
    assert r["n_true"] == 50
    assert r["n_pass"] >= r["n_true"], "a true match must always pass"
    assert r["n_false_pos"] == r["n_pass"] - r["n_true"]
    assert 0 < r["n_bits_set"] <= 100
    assert r["fp_rate"] == round(r["n_false_pos"] / 1950, 6)


def test_bloom_prune_probe_side_broadcast_only(spark):
    from semantik_spark.operators.storage import bloom_prune_stats

    small = spark.createDataFrame([(i,) for i in range(5)], ["key"])
    large = spark.createDataFrame([(i,) for i in range(100)], ["key"])
    plan = (
        bloom_prune_stats(large, small, "key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


class TestCompactionPlan:
    def test_packs_by_ffd_cumulative_quota(self, spark):
        from semantik_spark.operators.storage import compaction_plan

        # one partition, target 160; FFD order is 90,80,70,60,50 with
        # cumulative-before 0,90,170,240,300 -> floor(/160) bins
        # 0,0,1,1,1: bin0=[90,80]=170, bin1=[70,60,50]=180
        rows = [("p", f"f{i}", s) for i, s in
                enumerate([50, 90, 70, 80, 60])]
        files = spark.createDataFrame(rows, ["part", "file_id", "size_bytes"])
        plan = {r.bin_id: r for r in
                compaction_plan(files, "part", "file_id", "size_bytes",
                                target_bytes=160).collect()}
        assert set(plan) == {0, 1}
        assert plan[0].n_files == 2 and plan[0].bin_bytes == 170
        assert plan[1].n_files == 3 and plan[1].bin_bytes == 180
        # conservation: every candidate file lands in exactly one bin
        assert sum(r.n_files for r in plan.values()) == 5
        assert sum(r.bin_bytes for r in plan.values()) == 350

    def test_small_below_leaves_big_files_alone(self, spark):
        from semantik_spark.operators.storage import compaction_plan

        rows = [("p", "big", 5000), ("p", "a", 100), ("p", "b", 120)]
        files = spark.createDataFrame(rows, ["part", "file_id", "size_bytes"])
        plan = compaction_plan(files, "part", "file_id", "size_bytes",
                               target_bytes=1000, small_below=1000).collect()
        assert sum(r.n_files for r in plan) == 2  # 'big' untouched
        assert all(r.largest_file < 1000 for r in plan)


def test_zorder_key_rejects_sign_bit_overflow(spark):
    """r12 review: interleaving n*bits > 63 would place the top bit in
    the LONG sign bit — keys with it set sort negative and the curve
    order silently breaks. The builder must fail fast instead."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from semantik_spark.operators.storage import zorder_key

    cols = [F.col(c) for c in ("a", "b", "c", "d")]
    with _pytest.raises(ValueError, match="sign bit"):
        zorder_key(cols, bits=16)  # 64 interleaved bits
    # 4 cols x 15 bits = 60 — fine
    df = spark.createDataFrame([(1, 2, 3, 4)], ["a", "b", "c", "d"])
    assert df.select(zorder_key(cols, bits=15).alias("z")).collect()[0]["z"] >= 0
