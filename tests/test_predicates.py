"""Predicate compiler (F1) grammar parity with
shared/pipeline/predicates.py:7-17 / match_value :90-169 /
_compare_numeric :172-194 / matches_predicate :197-258."""

from __future__ import annotations

import pytest

from semantik_spark.plans.predicates import compile_predicate, glob_to_regex


@pytest.fixture(scope="module")
def files(spark):
    return spark.createDataFrame(
        [
            ("f1", "application/pdf", ".pdf", 5_000_000, "en"),
            ("f2", "application/json", ".json", 20_000_000, "zh"),
            ("f3", "image/png", ".png", 100, None),
            ("f4", "text/markdown", ".md", 1_000, "en"),
        ],
        ["uri", "mime_type", "extension", "size_bytes", "lang"],
    )


def _uris(files, pred):
    return sorted(r["uri"] for r in files.where(compile_predicate(pred)).collect())


def test_exact_match(files):
    assert _uris(files, {"mime_type": "application/pdf"}) == ["f1"]


def test_glob(files):
    assert _uris(files, {"mime_type": "application/*"}) == ["f1", "f2"]


def test_negated_glob(files):
    assert _uris(files, {"mime_type": "!image/*"}) == ["f1", "f2", "f4"]


def test_numeric_compares(files):
    assert _uris(files, {"size_bytes": ">10000000"}) == ["f2"]
    assert _uris(files, {"size_bytes": "<=1000"}) == ["f3", "f4"]
    assert _uris(files, {"size_bytes": "==100"}) == ["f3"]
    assert _uris(files, {"size_bytes": "!=100"}) == ["f1", "f2", "f4"]


def test_array_or(files):
    assert _uris(files, {"extension": [".md", ".json"]}) == ["f2", "f4"]


def test_multiple_keys_and(files):
    assert _uris(files, {"mime_type": "application/*", "size_bytes": ">10000000"}) == ["f2"]


def test_catch_all(files):
    assert _uris(files, None) == ["f1", "f2", "f3", "f4"]
    assert _uris(files, {}) == ["f1", "f2", "f3", "f4"]


def test_null_column_never_matches_positive(files):
    # f3 has NULL lang: neither 'en' nor '!en' should match it
    assert "f3" not in _uris(files, {"lang": "en"})
    assert "f3" not in _uris(files, {"lang": "!en"})


def test_glob_to_regex_charclass():
    assert glob_to_regex("a[bc]*.txt") == "^a[bc].*\\.txt$"
    assert glob_to_regex("file?") == "^file.$"


def test_nested_dot_path(spark):
    df = spark.createDataFrame(
        [(1, {"source": {"language": "zh"}}), (2, {"source": {"language": "en"}})],
        "id int, metadata struct<source:struct<language:string>>",
    )
    out = df.where(compile_predicate({"metadata.source.language": "zh"})).collect()
    assert [r["id"] for r in out] == [1]
    # legacy path translation: source_metadata.x → metadata.source.x
    out2 = df.where(compile_predicate({"source_metadata.language": "zh"})).collect()
    assert [r["id"] for r in out2] == [1]
