"""Shared SparkSession fixture — one local session for the whole run."""

from __future__ import annotations

import pytest

from semantik_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def docs(spark):
    """Tiny deterministic corpus used across operator tests."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "a quick brown fox leaps over a lazy dog today"),  # near-dup of 1
        (4, "spark dataframes shuffle partitions across the cluster"),
        (5, "completely different content about databases and storage engines"),
        (6, "ab"),  # shorter than most shingle widths
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])
