"""Tests for the round-2 curation operators: PII scan/redact,
corpus-unigram LM quality, and cross-document sentence dedup."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from semantik_spark.operators.dedup import sentence_dedup_stats
from semantik_spark.operators.pii import (
    inject_synthetic_pii,
    pii_redact,
    pii_report,
    pii_scan,
)
from semantik_spark.operators.textanalysis import unigram_logprob


def test_pii_scan_counts_each_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org thanks"),
            (2, "call 555-123-4567 or 555.987.6543"),
            (3, "ssn 123-45-6789 card 1234-5678-9012-3456 host 10.0.0.1"),
            (4, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in pii_scan(df).collect()}
    assert rows[1].n_email == 1 and rows[1].n_pii == 1 and rows[1].has_pii
    assert rows[2].n_phone == 2 and rows[2].n_pii == 2
    assert rows[3].n_ssn == 1 and rows[3].n_card == 1 and rows[3].n_ipv4 == 1
    assert rows[4].n_pii == 0 and not rows[4].has_pii


def test_pii_redact_replaces_with_placeholders(spark):
    df = spark.createDataFrame(
        [(1, "write a@b.io or dial 555-123-4567; ssn 123-45-6789")],
        ["doc_id", "text"],
    )
    red = pii_redact(df).collect()[0].redacted
    assert red == "write [EMAIL] or dial [PHONE]; ssn [SSN]"


def test_pii_injection_is_deterministic_and_scannable(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(30)], ["doc_id", "text"]
    )
    rep = pii_report(inject_synthetic_pii(df)).collect()
    by_id = {r.doc_id: r for r in rep}
    for i in range(30):
        assert by_id[i].n_email == (1 if i % 3 == 0 else 0)
        assert by_id[i].n_phone == (1 if i % 4 == 0 else 0)
        assert by_id[i].n_ssn == (1 if i % 5 == 0 else 0)
        assert by_id[i].n_ipv4 == (1 if i % 5 == 0 else 0)
        assert by_id[i].n_card == (1 if i % 7 == 0 else 0)
        assert "@" not in by_id[i].redacted or "[EMAIL]" in by_id[i].redacted
    # injection is pure doc_id arithmetic: rerunning yields identical text
    a = sorted(inject_synthetic_pii(df).collect())
    b = sorted(inject_synthetic_pii(df).collect())
    assert a == b


def test_unigram_logprob_scores_rare_tokens_lower(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common rareword"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert rows[1].n_tokens == 4 and rows[2].n_tokens == 4
    # doc 2 contains the rare token -> lower average log-probability
    assert rows[2].avg_logprob < rows[1].avg_logprob
    # doc 1 is all 'common' (7 of 8 tokens): avg = ln(7/8)
    assert math.isclose(rows[1].avg_logprob, round(round(math.log(7 / 8), 9), 6),
                        abs_tol=1e-9)


def test_sentence_dedup_flags_shared_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "The same boilerplate line. Unique to one here. "),
            (2, "The same boilerplate line. Totally different tail. "),
            (3, "Nothing shared at all. Standalone content only. "),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in sentence_dedup_stats(df).collect()}
    assert rows[1].n_sentences == 2 and rows[1].n_dup_sentences == 1
    assert rows[2].n_dup_sentences == 1
    assert rows[3].n_dup_sentences == 0 and rows[3].dup_frac == 0.0
    assert abs(rows[1].dup_frac - 0.5) < 1e-9


def test_pii_scan_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, "x a@b.co")], ["doc_id", "text"])
    plan = pii_report(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_benford_audit_uniform_digits_flagged(spark):
    """A perfectly uniform first-digit distribution (clearly non-
    Benford) must produce a large chi-square; all 9 digits present
    even when some have zero rows; zero/negative values excluded."""
    from semantik_spark.operators.profiling import benford_audit

    rows = [(float(d) * 100.0,) for d in range(1, 10) for _ in range(10)]
    rows += [(0.0,), (-5.0,)]  # excluded
    df = spark.createDataFrame(rows, ["amount"])
    out = {r["digit"]: r for r in benford_audit(df, "amount").collect()}
    assert len(out) == 9
    assert all(out[d]["n"] == 10 for d in range(1, 10))
    # uniform vs Benford on N=90: chi2 ~ 23.8 >> 15.51 critical
    assert out[1]["chi2_total"] > 15.51
    assert out[1]["observed_pct"] == round(10 / 90, 6)


def test_benford_audit_benford_sample_passes(spark):
    """An exactly-Benford-proportioned sample scores a tiny chi-square
    (only rounding residue)."""
    import math

    from semantik_spark.operators.profiling import benford_audit

    n = 10000
    rows = []
    for d in range(1, 10):
        cnt = round(n * math.log10(1 + 1 / d))
        rows += [(float(d),)] * cnt
    df = spark.createDataFrame(rows, ["amount"])
    out = benford_audit(df, "amount").head()
    assert out["chi2_total"] < 0.1


def test_benford_audit_sub1_first_significant_digit(spark):
    """Values in (0,1) participate with their first SIGNIFICANT digit
    (0.042 -> 4), via the exact fixed-point decimal-string scan; a
    positive value below the DECIMAL(38,18) scale is excluded."""
    from semantik_spark.operators.profiling import benford_audit

    rows = [(0.042,), (0.042,), (0.7,), (300.0,), (0.0003,), (1e-25,)]
    df = spark.createDataFrame(rows, ["amount"])
    out = {r["digit"]: r["n"] for r in benford_audit(df, "amount").collect()}
    assert out[4] == 2   # 0.042 twice
    assert out[7] == 1   # 0.7
    assert out[3] == 2   # 300.0 and 0.0003; 1e-25 rounds to zero scale
    assert sum(out.values()) == 5
