"""Pipeline DAG validation (P1) + conditional router (P2)."""

from __future__ import annotations

import pytest

from semantik_spark.plans.dag import (
    DAGValidationError,
    Edge,
    Node,
    PipelineDAG,
    compile_pipeline,
    route,
    validate_dag,
)
from pyspark.sql import functions as F


def _basic_dag():
    return PipelineDAG(
        nodes=[
            Node("parse", "parser"),
            Node("chunk", "chunker"),
            Node("embed", "embedder"),
        ],
        edges=[
            Edge("__entry__", "parse"),
            Edge("parse", "chunk"),
            Edge("chunk", "embed"),
        ],
    )


def test_valid_dag_passes():
    validate_dag(_basic_dag())


def test_unknown_node_ref():
    dag = _basic_dag()
    dag.edges.append(Edge("parse", "nope"))
    with pytest.raises(DAGValidationError, match="unknown node"):
        validate_dag(dag)


def test_cycle_detection():
    dag = _basic_dag()
    dag.edges.append(Edge("embed", "parse"))
    with pytest.raises(DAGValidationError, match="cycle"):
        validate_dag(dag)


def test_unreachable_node():
    dag = _basic_dag()
    dag.nodes.append(Node("island", "parser"))
    with pytest.raises(DAGValidationError, match="unreachable"):
        validate_dag(dag)


def test_entry_needs_catchall():
    dag = _basic_dag()
    dag.edges[0] = Edge("__entry__", "parse", when={"extension": ".md"})
    with pytest.raises(DAGValidationError, match="catch-all"):
        validate_dag(dag)


def test_two_embedders_on_path():
    dag = _basic_dag()
    dag.nodes.append(Node("embed2", "embedder"))
    dag.edges.append(Edge("embed", "embed2"))
    with pytest.raises(DAGValidationError, match="embedder"):
        validate_dag(dag)


def test_duplicate_parallel_path_names():
    dag = _basic_dag()
    dag.nodes.append(Node("parse2", "parser"))
    dag.edges.append(Edge("__entry__", "parse", parallel=True, path_name="p"))
    dag.edges.append(Edge("__entry__", "parse2", parallel=True, path_name="p"))
    with pytest.raises(DAGValidationError, match="path_name"):
        validate_dag(dag)


@pytest.fixture(scope="module")
def files(spark):
    return spark.createDataFrame(
        [
            ("f1", ".md", 100),
            ("f2", ".pdf", 5000),
            ("f3", ".txt", 10),
        ],
        ["uri", "extension", "size_bytes"],
    )


def test_route_exclusive_first_match(spark, files):
    edges = [
        Edge("__entry__", "md_parser", when={"extension": ".md"}, path_name="md"),
        Edge("__entry__", "pdf_parser", when={"extension": ".pdf"}, path_name="pdf"),
        Edge("__entry__", "text_parser", path_name="default"),
    ]
    out = {r["uri"]: (r["path_id"], r["target_node"]) for r in route(files, edges).collect()}
    assert out["f1"] == ("md", "md_parser")
    assert out["f2"] == ("pdf", "pdf_parser")
    assert out["f3"] == ("default", "text_parser")


def test_route_parallel_fanout(spark, files):
    edges = [
        Edge("__entry__", "archiver", parallel=True, path_name="archive"),  # catch-all: all files
        Edge("__entry__", "md_parser", when={"extension": ".md"}, parallel=True, path_name="md"),
        Edge("__entry__", "text_parser", path_name="default"),
    ]
    rows = route(files, edges).collect()
    f1 = sorted((r["path_id"]) for r in rows if r["uri"] == "f1")
    # f1 fires: parallel md, parallel archive catch-all, exclusive default
    assert f1 == ["archive", "default", "md"]
    f3 = sorted((r["path_id"]) for r in rows if r["uri"] == "f3")
    assert f3 == ["archive", "default"]


def test_route_exclusive_catchall_only_when_no_match(spark, files):
    edges = [
        Edge("__entry__", "md_parser", when={"extension": ".md"}, path_name="md"),
        Edge("__entry__", "fallback", path_name="default"),
    ]
    rows = route(files, edges).collect()
    f1 = [r for r in rows if r["uri"] == "f1"]
    assert len(f1) == 1 and f1[0]["target_node"] == "md_parser"


def test_compile_pipeline_runs_stages(spark, files):
    dag = PipelineDAG(
        nodes=[Node("parse", "parser"), Node("chunk", "chunker")],
        edges=[Edge("__entry__", "parse"), Edge("parse", "chunk")],
    )
    calls = []

    def stage(name):
        def fn(df, config):
            calls.append(name)
            return df.withColumn(f"_{name}", F.lit(True))
        return fn

    run = compile_pipeline(dag, {"parser": stage("parser"), "chunker": stage("chunker")})
    out = run(files)
    assert set(out) == {"default"}
    rows = out["default"].collect()
    assert len(rows) == 3
    assert all(r["_parser"] and r["_chunker"] for r in rows)
    assert calls == ["parser", "chunker"]
