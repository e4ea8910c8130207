"""J6 doc-ref resolution: 5-priority strategy + mapping_status rollup
(benchmark_dataset_service.py:49-117,781-787)."""

from __future__ import annotations

import pytest

from semantik_spark.operators.benchmark import mapping_status, resolve_doc_refs

CATALOG = [
    # doc_id, uri, content_hash, file_name
    (1, "s/1", "h1", "a.txt"),
    (2, "s/2", "h2", "b.txt"),
    (3, "s/3", "hdup", "dup.txt"),
    (4, "s/4", "hdup", "dup.txt"),
]

REFS = [
    # ref_id, dataset, collection, document_id, uri, content_hash, path, file_name
    (1, "ds", "c1", 1, None, None, None, None),        # id hit
    (2, "ds", "c1", 99, None, None, None, None),       # id miss → not_found
    (3, "ds", "c1", None, "s/2", None, None, None),    # uri hit
    (4, "ds", "c1", None, None, "h1", None, None),     # unique hash hit
    (5, "ds", "c1", None, None, "hdup", None, None),   # dup hash → ambiguous
    (6, "ds", "c1", None, None, None, "s/3", None),    # path hit
    (7, "ds", "c1", None, None, None, None, "b.txt"),  # unique name hit
    (8, "ds", "c1", None, None, None, None, "dup.txt"),  # dup name → ambiguous
    (9, "ds", "c1", None, None, None, None, None),     # no identifiers
    # priority: document_id wins even when a lower-priority field would hit
    (10, "ds", "c1", 99, "s/1", None, None, None),     # not_found (no fall-through)
    (11, "ds", "c2", 1, None, None, None, None),       # all-resolved mapping
    (12, "ds", "c3", 99, None, None, None, None),      # none-resolved mapping
    # no-fall-through applies to the REASON too: document_id is the
    # priority field used, so its miss is not_found — the ambiguous
    # lower-priority hash was never consulted
    (13, "ds", "c1", 99, None, "hdup", None, None),
]

COLS = ["ref_id", "dataset_id", "collection_id", "document_id", "uri",
        "content_hash", "path", "file_name"]


@pytest.fixture(scope="module")
def resolved(spark):
    catalog = spark.createDataFrame(
        CATALOG, ["doc_id", "uri", "content_hash", "file_name"])
    refs = spark.createDataFrame(REFS, COLS)
    out = resolve_doc_refs(refs, catalog)
    return {r["ref_id"]: r for r in out.collect()}


def test_five_priorities(resolved):
    assert resolved[1]["resolved_doc_id"] == 1
    assert resolved[3]["resolved_doc_id"] == 2
    assert resolved[4]["resolved_doc_id"] == 1
    assert resolved[6]["resolved_doc_id"] == 3
    assert resolved[7]["resolved_doc_id"] == 2


def test_failure_reasons(resolved):
    assert resolved[2]["failure_reason"] == "not_found"
    assert resolved[5]["failure_reason"] == "ambiguous"
    assert resolved[8]["failure_reason"] == "ambiguous"
    assert resolved[9]["failure_reason"] == "no_identifiers"


def test_no_fall_through(resolved):
    """A present document_id that misses must NOT fall through to the
    uri lookup (reference returns not_found immediately)."""
    assert resolved[10]["resolved_doc_id"] is None
    assert resolved[10]["failure_reason"] == "not_found"
    # the reason follows the priority field as well: an unmatched
    # document_id with an ambiguous hash beneath it is not_found,
    # not ambiguous
    assert resolved[13]["resolved_doc_id"] is None
    assert resolved[13]["failure_reason"] == "not_found"


def test_mapping_status(spark, resolved):
    catalog = spark.createDataFrame(
        CATALOG, ["doc_id", "uri", "content_hash", "file_name"])
    refs = spark.createDataFrame(REFS, COLS)
    out = mapping_status(resolve_doc_refs(refs, catalog))
    st = {r["collection_id"]: r for r in out.collect()}
    assert st["c1"]["mapping_status"] == "partial"
    assert st["c2"]["mapping_status"] == "resolved"
    assert st["c3"]["mapping_status"] == "pending"
    # ref 13 (unmatched document_id over an ambiguous hash) is a third
    # not_found — NOT a third ambiguous (the no-fall-through reason)
    assert st["c1"]["total_count"] == 11
    assert st["c1"]["mapped_count"] == 5
    assert st["c1"]["n_ambiguous"] == 2
    assert st["c1"]["n_not_found"] == 3
