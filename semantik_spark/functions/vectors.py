"""Vector Column-expression helpers — dot/cosine/normalize on
ARRAY<FLOAT|DOUBLE> columns, plus the reference's deterministic mock
embedder (vecpipe/search/dense_search.py:19-44) as a pure expression.

All JVM-side higher-order functions (zip_with/aggregate/transform) — no
Python in the scoring hot path; at 100 TB the brute-force cosine top-k
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i * b_i as double."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    d = dot(a, b)
    nn = norm(a) * norm(b)
    return F.when(nn > 0, d / nn).otherwise(F.lit(0.0))


def l2_normalize(a: Column | str) -> Column:
    n = norm(a)
    return F.when(n > 0, F.transform(_col(a), lambda x: x.cast("double") / n)).otherwise(_col(a).cast("array<double>"))


def _bind(value: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``value`` ONCE and pass it
    to ``body`` as a lambda variable. Catalyst does not CSE repeated
    subexpressions (each reference re-evaluates), so any expression used
    more than once should go through here: transform over a 1-element
    array binds the computed value, get(..., 0) unwraps the result."""
    return F.get(F.transform(F.array(value), body), 0)


def mock_embedding(c: Column | str) -> Column:
    """Deterministic 8-dim mock embedding, reference-identical math
    (dense_search.py:19-44): sha256(text) → 8 big-endian uint32 →
    v/2^32*2-1 → L2 normalize. Pure expression (sha2+conv+substr), so
    the DuckDB oracle can reproduce it bit-for-bit.

    The reference pads with zeros up to the model dim; zero padding does
    not change cosine ranking, so we keep the 8 informative dims.

    The sha2→conv chain is let-bound so it evaluates once per row —
    naively referencing ``vals`` from both the norm and the final
    transform doubles the hash work (no CSE in Catalyst).
    """
    hexs = F.sha2(_col(c).cast("string"), 256)
    vals = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: (
            F.conv(hexs.substr(i * 8 + 1, F.lit(8)), 16, 10).cast("double")
            / F.lit(4294967296.0) * 2.0 - 1.0
        ),
    )
    return _bind(vals, lambda v: _bind(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)),
        lambda n: F.transform(v, lambda x: x / n),
    ))


def mock_embedding_sql(expr: str) -> str:
    """DuckDB SQL string computing the same mock embedding for ``expr``."""
    return (
        "list_transform("
        f"[(('0x'||substr(sha256(cast({expr} as varchar)), i*8+1, 8))::bigint / 4294967296.0)*2.0-1.0 "
        "for i in range(0, 8)], "
        f"x -> x / sqrt(list_sum(list_transform("
        f"[(('0x'||substr(sha256(cast({expr} as varchar)), j*8+1, 8))::bigint / 4294967296.0)*2.0-1.0 "
        "for j in range(0, 8)], y -> y*y))))"
    )


def quantize_int8(a: Column | str) -> Column:
    """Symmetric linear int8 quantization of a vector (the reference's
    Collection.quantization='int8' level, models.py:261): scale =
    127/max|x|, code = floor(x*scale + 0.5). floor(+0.5) instead of
    round() so Spark and the DuckDB oracle share exact half-way
    semantics. Returns STRUCT<codes ARRAY<INT>, scale DOUBLE>."""
    v = _col(a)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(1.0))
    codes = F.transform(v, lambda x: F.floor(x.cast("double") * scale + 0.5).cast("int"))
    return F.struct(codes.alias("codes"), scale.alias("scale"))


def dequantize_int8(q: Column) -> Column:
    """Inverse of quantize_int8: codes/scale as ARRAY<DOUBLE>."""
    return F.transform(q["codes"], lambda c: c.cast("double") / q["scale"])
