"""PCA projection (M7) + multimodal binary-column plumbing."""

from __future__ import annotations

import pytest

from semantik_spark.operators.multimodal import (
    artifact_table,
    image_features,
    media_near_dups,
    sample_frames,
)
from semantik_spark.operators.projection import (
    explained_variance,
    label_categories,
    pca_project,
    sample_for_driver,
    umap_project,
)


@pytest.fixture(scope="module")
def emb(spark):
    # points on a plane embedded in 4-D: PCA must capture ~all variance in 2 comps
    rows = [(i, [float(i), float(2 * i), 0.001 * (i % 3), 0.0]) for i in range(30)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pca_projects_to_2d(emb):
    out = pca_project(emb, k=2)
    rows = out.collect()
    assert set(out.columns) == {"vec_id", "x", "y"}
    assert len(rows) == 30
    xs = sorted(r["x"] for r in rows)
    assert xs[0] != xs[-1]  # non-degenerate spread


def test_explained_variance_concentrated(emb):
    ev = explained_variance(emb, k=2)
    assert ev[0] > 0.99  # the line dominates


def test_label_categories(spark):
    docs = spark.createDataFrame(
        [(1, "src1", 100), (2, None, 500), (3, "src2", 5000)],
        ["doc_id", "source", "n_chars"],
    )
    out = {r["doc_id"]: (r["category_source"], r["category_size"])
           for r in label_categories(docs).collect()}
    assert out[1] == ("src1", "small")
    assert out[2] == ("unknown", "medium")
    assert out[3] == ("src2", "large")


def test_sample_cap(spark):
    big = spark.range(1000).selectExpr("id as vec_id", "array(cast(id as double)) as embedding")
    sampled = sample_for_driver(big, cap=100)
    assert sampled.count() < 1000


def test_umap_separates_clusters_and_is_deterministic(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    pts = np.vstack([rng.randn(40, 8) + c for c in (0.0, 10.0)])
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = umap_project(df, n_neighbors=10, n_iter=150).orderBy("vec_id").collect()
    assert len(out) == 80 and set(out[0].asDict()) == {"vec_id", "x", "y"}
    Y = np.array([[r.x, r.y] for r in out])
    c0, c1 = Y[:40].mean(0), Y[40:].mean(0)
    intra = max(np.linalg.norm(Y[:40] - c0, axis=1).mean(),
                np.linalg.norm(Y[40:] - c1, axis=1).mean())
    assert np.linalg.norm(c0 - c1) > 2 * intra
    out2 = umap_project(df, n_neighbors=10, n_iter=150).orderBy("vec_id").collect()
    assert [(r.x, r.y) for r in out] == [(r.x, r.y) for r in out2]


def test_umap_tiny_input_stable(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)], ["vec_id", "embedding"]
    )
    out = umap_project(df).collect()
    assert len(out) == 3  # degenerate graph → trivial zero layout, no crash


def test_tsne_separates_clusters_and_is_deterministic(spark):
    import numpy as np

    from semantik_spark.operators.projection import tsne_project

    rng = np.random.RandomState(0)
    pts = np.vstack([rng.randn(40, 8) + c for c in (0.0, 10.0)])
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = tsne_project(df, perplexity=15, n_iter=200).orderBy("vec_id").collect()
    assert len(out) == 80 and {c for c in out[0].asDict()} == {"vec_id", "x", "y"}
    Y = np.array([[r.x, r.y] for r in out])
    c0, c1 = Y[:40].mean(0), Y[40:].mean(0)
    intra = max(np.linalg.norm(Y[:40] - c0, axis=1).mean(),
                np.linalg.norm(Y[40:] - c1, axis=1).mean())
    assert np.linalg.norm(c0 - c1) > 2 * intra
    out2 = tsne_project(df, perplexity=15, n_iter=200).orderBy("vec_id").collect()
    assert [(r.x, r.y) for r in out] == [(r.x, r.y) for r in out2]


@pytest.fixture(scope="module")
def media(spark):
    from semantik_spark.operators.multimodal import encode_jpeg_header, encode_png

    png = encode_png(40, 30, color_type=2)  # real 40x30 RGB PNG
    rows = [
        ("m1", "image/png", png),
        ("m2", "image/png", png),                         # identical to m1
        ("m3", "image/jpeg", encode_jpeg_header(64, 48, 3)),
        ("m4", "image/png", None),                        # null content
    ]
    return spark.createDataFrame(rows, "media_id string, mime_type string, content binary")


def test_artifact_table_validates(media):
    rows = artifact_table(media).collect()
    ids = {r["media_id"] for r in rows}
    assert ids == {"m1", "m2", "m3"}  # null content dropped (check constraint)
    by = {r["media_id"]: r for r in rows}
    assert by["m1"]["content_hash"] == by["m2"]["content_hash"]
    assert by["m1"]["size_bytes"] == by["m2"]["size_bytes"]


def test_image_features_deterministic_shape(media):
    feats = image_features(artifact_table(media), feature_dim=8).collect()
    by = {r["media_id"]: r for r in feats}
    assert by["m1"]["feature"] == by["m2"]["feature"]  # same bytes → same features
    assert by["m1"]["feature"] != by["m3"]["feature"]
    # REAL container header parses
    assert (by["m1"]["format"], by["m1"]["width"], by["m1"]["height"],
            by["m1"]["n_channels"]) == ("png", 40, 30, 3)
    assert (by["m3"]["format"], by["m3"]["width"], by["m3"]["height"],
            by["m3"]["n_channels"]) == ("jpeg", 64, 48, 3)
    for r in feats:
        assert len(r["feature"]) == 8
        norm = sum(x * x for x in r["feature"])
        assert norm == pytest.approx(1.0, abs=1e-5)


def test_sample_frames_flatmap_shape(media):
    frames = sample_frames(artifact_table(media), every_ms=500).collect()
    m1 = sorted([r for r in frames if r["media_id"] == "m1"], key=lambda r: r["frame_index"])
    assert m1[0]["ts_ms"] == 0
    if len(m1) > 1:
        assert m1[1]["ts_ms"] == 500
    # identical media → identical frame decomposition
    m2 = [r for r in frames if r["media_id"] == "m2"]
    assert len(m1) == len(m2)


def test_media_near_dups(media):
    pairs = media_near_dups(artifact_table(media), threshold=0.999).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in pairs] == [("m1", "m2")]


def test_audio_segments_and_transcribe(media):
    from semantik_spark.operators.multimodal import (
        artifact_table, audio_segments, transcribe_segments,
    )

    from semantik_spark.operators.multimodal import encode_png

    n_png = len(encode_png(40, 30, color_type=2))
    segs = audio_segments(artifact_table(media), segment_ms=5,
                          fake_bytes_per_ms=1)
    rows = segs.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # m1 is PNG (not WAV) → byte-length fallback: n_png ms duration
    m1 = sorted(by_media["m1"], key=lambda r: r["segment_index"])
    assert len(m1) == -(-n_png // 5)
    assert m1[0]["start_ms"] == 0 and m1[0]["end_ms"] == 5
    assert m1[-1]["end_ms"] == n_png  # clamped tail
    # identical bytes → identical segment payloads (m1 == m2)
    assert [r["samples"] for r in m1] == [
        r["samples"] for r in sorted(by_media["m2"], key=lambda r: r["segment_index"])]
    out = transcribe_segments(segs).collect()
    assert len(out) == len(rows)
    assert all(r["text"].startswith("asr:") for r in out)
    # injected factory overrides the fake
    upper = transcribe_segments(
        segs, model_factory=lambda: (lambda batch: ["X"] * len(batch))
    ).collect()
    assert {r["text"] for r in upper} == {"X"}


def test_decode_image_meta_all_containers():
    from semantik_spark.operators.multimodal import (
        decode_image_meta, encode_bmp, encode_gif, encode_jpeg_header,
        encode_png,
    )

    assert decode_image_meta(encode_png(33, 47, 0)) == ("png", 33, 47, 1)
    assert decode_image_meta(encode_png(33, 47, 6)) == ("png", 33, 47, 4)
    assert decode_image_meta(encode_bmp(20, 15, 8)) == ("bmp", 20, 15, 1)
    assert decode_image_meta(encode_bmp(20, 15, 32)) == ("bmp", 20, 15, 4)
    assert decode_image_meta(encode_gif(300, 200)) == ("gif", 300, 200, 3)
    assert decode_image_meta(encode_jpeg_header(640, 480, 1)) == ("jpeg", 640, 480, 1)
    assert decode_image_meta(b"not an image") == ("unknown", 0, 0, 0)
    assert decode_image_meta(b"") == ("unknown", 0, 0, 0)


def test_audio_segments_real_wav(spark):
    from semantik_spark.operators.multimodal import audio_segments, encode_wav

    # 16 kHz stereo 16-bit, 24000 frames → 1500 ms from the REAL header,
    # regardless of the (much larger) byte length
    rows = [("a1", "audio/wav", encode_wav(16000, 2, 16, 24000)),
            ("a2", "audio/wav", encode_wav(8000, 1, 8, 4000))]  # 500 ms
    media = spark.createDataFrame(
        rows, "media_id string, mime_type string, content binary")
    segs = audio_segments(media, segment_ms=400).collect()
    a1 = sorted([r for r in segs if r["media_id"] == "a1"],
                key=lambda r: r["segment_index"])
    assert [(r["start_ms"], r["end_ms"]) for r in a1] == [
        (0, 400), (400, 800), (800, 1200), (1200, 1500)]
    a2 = sorted([r for r in segs if r["media_id"] == "a2"],
                key=lambda r: r["segment_index"])
    assert [(r["start_ms"], r["end_ms"]) for r in a2] == [(0, 400), (400, 500)]


def test_decode_edge_cases_degrade_not_crash():
    import struct

    from semantik_spark.operators.multimodal import (
        decode_image_meta, decode_wav_meta, encode_wav,
    )

    # sub-byte-sample WAV (ADPCM-style): parse declines, no crash
    assert decode_wav_meta(encode_wav(8000, 1, 4, 100)) is None
    # JPEG fill bytes (B.1.1.2) before the SOF marker still parse
    comp = b"".join(struct.pack(">BBB", i + 1, 0x11, 0) for i in range(3))
    sof = struct.pack(">BHH", 8, 48, 64) + bytes([3]) + comp
    jp = (b"\xff\xd8" + b"\xff\xff\xff" + b"\xff\xc0"
          + struct.pack(">H", 2 + len(sof)) + sof + b"\xff\xd9")
    assert decode_image_meta(jp) == ("jpeg", 64, 48, 3)
    # truncated containers degrade
    assert decode_image_meta(b"\x89PNG\r\n\x1a\n1234") == ("unknown", 0, 0, 0)
    assert decode_wav_meta(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_jl_projection_preserves_pairwise_distance(spark):
    """JL with out_dim=32 of 64: norm ratios concentrate near 1; a
    pair's projected distance stays within a loose (1 +- 0.6) band —
    the distributional guarantee, checked loosely enough to be
    deterministic for this seed. Map-only plan: no shuffle exchange."""
    import math
    import random

    from semantik_spark.operators.projection import jl_projection

    rnd = random.Random(11)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(64)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r for r in jl_projection(emb, out_dim=32, dim=64).collect()}
    assert len(out) == 60
    ratios = [r["norm_ratio"] for r in out.values()]
    assert all(0.4 < x < 1.6 for x in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15
    # pairwise distance preservation on a sample of pairs
    for a, b in [(0, 1), (5, 40), (17, 59)]:
        dx = math.dist(rows[a][1], rows[b][1])
        dy = math.dist(out[a]["proj"], out[b]["proj"])
        assert 0.4 * dx < dy < 1.6 * dx
    # zero vector: ratio 0, proj all zeros
    z = jl_projection(
        spark.createDataFrame([(99, [0.0] * 64)],
                              "vec_id bigint, embedding array<double>"),
        out_dim=16, dim=64).collect()[0]
    assert z["norm_ratio"] == 0.0 and all(c == 0.0 for c in z["proj"])
    # plan: no exchange at all (pure map over the scan)
    plan = jl_projection(emb, out_dim=8, dim=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_q_jl_projection_entry_is_flat(spark):
    """The queries() wrapper posexplodes proj to scalar rows — the
    driver canonicalizer cannot sort a top-level ARRAY column (that was
    round 6's one red driver row; flatten-arrays convention).
    tools/check_oracle.py now also hard-fails on complex columns."""
    import __spark_entry__ as entrymod
    from pyspark.sql import types as T

    df = entrymod.q_jl_projection(spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "vec_id", "pos", "component", "norm_ratio"]
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)), f.name
    # 16 scalar rows per vector, one norm_ratio repeated across them
    first_id = df.agg({"vec_id": "min"}).collect()[0][0]
    one = df.filter(df.vec_id == first_id).collect()
    assert len(one) == 16
    assert sorted(r["pos"] for r in one) == list(range(16))
    assert len({r["norm_ratio"] for r in one}) == 1


def test_dbscan_projected_textbook_fixture(spark):
    """Hand-checkable DBSCAN: a dense 5-point pocket (all mutually
    within eps), one border point hanging off it, and two isolated
    noise points. Vectors are constructed so the first two JL
    components land where we want via a scalar multiple of a probe
    basis — roles and the deterministic min-label cluster id are
    asserted exactly."""
    from pyspark.sql import functions as F

    from semantik_spark.operators.projection import (
        _jl_signs, dbscan_projected)

    # build 64-d vectors whose JL-2D image is (t * s0x, t * s1x): use
    # v = t * e0 (first basis vector) -> dot(v, signs_i) = t * signs_i[0]
    s00 = _jl_signs(0, 64)[0]  # +-1
    s10 = _jl_signs(1, 64)[0]
    # choose t so consecutive points are eps/2 apart along the image
    # line; |image step| = (t_step/sqrt(2)) * sqrt(s00^2 + s10^2) = t_step
    import math
    step = 0.02  # -> 20_000 micro after scaling below
    def vec(k: float):
        return [k * step * math.sqrt(2.0) / math.sqrt(s00 * s00 + s10 * s10)] + [0.0] * 63

    rows = (
        [(i, vec(i * 0.5)) for i in range(6)]     # 0..5: 10k µ apart
        + [(10, vec(4.5))]                        # 90k µ: border off 4,5
        + [(20, vec(15)), (21, vec(25))]          # isolated noise
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in dbscan_projected(
        df, eps_micro=50_000, min_pts=4).collect()}
    # 0..5 at 10k spacing spans 50k total, so with eps=50k every point
    # sees all 6 (boundary inclusive) -> all core, min-label cluster 0
    for i in range(6):
        assert out[i]["role"] == "core", (i, out[i])
        assert out[i]["cluster_id"] == 0
    # 10 at 90k: within eps of cores 4 (50k exactly) and 5 (40k) but
    # only 3 neighbors total (4, 5, self) -> border, inherits cluster 0
    assert out[10]["role"] == "border" and out[10]["cluster_id"] == 0
    for i in (20, 21):
        assert out[i]["role"] == "noise" and out[i]["cluster_id"] is None


def test_dbscan_projected_string_ids_keep_cluster_labels(spark):
    """r12 formula review: the output's cluster_id must keep the
    CALLER's id type — a hardcoded BIGINT cast nulled every
    string-keyed corpus's labels (NULL is the contract's noise value)
    while role still said core, an inconsistent row no oracle sees
    because the registry query is bigint-keyed."""
    import math

    from semantik_spark.operators.projection import (
        _jl_signs, dbscan_projected)

    s00 = _jl_signs(0, 64)[0]
    s10 = _jl_signs(1, 64)[0]
    step = 0.02

    def vec(k: float):
        return [k * step * math.sqrt(2.0)
                / math.sqrt(s00 * s00 + s10 * s10)] + [0.0] * 63

    rows = [(f"doc_{i}", vec(i * 0.5)) for i in range(6)] \
        + [("doc_noise", vec(25))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    res = dbscan_projected(df, eps_micro=50_000, min_pts=4)
    assert dict(res.dtypes)["cluster_id"] == "string"
    out = {r["vec_id"]: r for r in res.collect()}
    expect_cluster = min(f"doc_{i}" for i in range(6))  # min-label = doc_0
    for i in range(6):
        r = out[f"doc_{i}"]
        assert r["role"] == "core"
        assert r["cluster_id"] == expect_cluster, r
    assert out["doc_noise"]["role"] == "noise"
    assert out["doc_noise"]["cluster_id"] is None


def test_dbscan_projected_no_cartesian(spark):
    from semantik_spark.operators.projection import dbscan_projected

    df = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(8)], ["vec_id", "embedding"])
    plan = dbscan_projected(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
