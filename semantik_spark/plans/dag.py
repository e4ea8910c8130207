"""Pipeline DAG definition, validation (P1), and conditional router (P2).

Reference parity (shared/pipeline/types.py:246-517, validation.py,
router.py:7-180):
  - nodes: parser | chunker | extractor | embedder (types.py:16-29)
  - edges: from → to with optional `when` predicate dict, parallel flag,
    path_name
  - validation rules (types.py:413-437): known node refs, acyclicity,
    reachability from entry, at most one embedder per path, catch-all
    entry edge, unique parallel path names
  - routing (router.py:94-180): parallel predicate edges all fire;
    exclusive predicate edges first-match; then parallel catch-alls;
    then exclusive catch-all

Spark-first: the DAG compiles to DataFrame transformations — exclusive
routing is ONE `when/otherwise` chain (single pass, no data movement);
parallel fan-out is a union of branch frames each tagged with path_id.
Validation runs at plan-build time, before any job is submitted.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantik_spark.plans.predicates import compile_predicate

NODE_TYPES = ("source", "parser", "chunker", "extractor", "embedder", "sink")


@dataclass
class Node:
    node_id: str
    node_type: str
    config: dict[str, Any] = field(default_factory=dict)


@dataclass
class Edge:
    from_id: str  # "__entry__" for entry edges
    to_id: str
    when: dict[str, Any] | None = None  # predicate dict; None = catch-all
    parallel: bool = False
    path_name: str = "default"


@dataclass
class PipelineDAG:
    nodes: list[Node]
    edges: list[Edge]

    def node(self, node_id: str) -> Node:
        for n in self.nodes:
            if n.node_id == node_id:
                return n
        raise KeyError(node_id)


class DAGValidationError(ValueError):
    pass


def validate_dag(dag: PipelineDAG) -> None:
    """The reference's 9 build-time rules (types.py:413-437,
    validation.py), raising DAGValidationError on the first violation."""
    ids = [n.node_id for n in dag.nodes]
    if len(set(ids)) != len(ids):
        raise DAGValidationError("duplicate node ids")
    known = set(ids) | {"__entry__"}
    for e in dag.edges:
        if e.from_id not in known or e.to_id not in known - {"__entry__"}:
            raise DAGValidationError(f"edge references unknown node: {e.from_id}->{e.to_id}")
    for n in dag.nodes:
        if n.node_type not in NODE_TYPES:
            raise DAGValidationError(f"unknown node type {n.node_type!r}")
    entry_edges = [e for e in dag.edges if e.from_id == "__entry__"]
    if not entry_edges:
        raise DAGValidationError("no entry edges")
    if not any(e.when is None for e in entry_edges):
        raise DAGValidationError("entry edges need a catch-all (predicate-less) edge")
    # unique path names among parallel sibling edges
    for src in {e.from_id for e in dag.edges}:
        names = [e.path_name for e in dag.edges if e.from_id == src and e.parallel]
        if len(names) != len(set(names)):
            raise DAGValidationError(f"duplicate parallel path_name from {src}")
    # acyclicity + reachability via DFS from __entry__
    adj: dict[str, list[str]] = {}
    for e in dag.edges:
        adj.setdefault(e.from_id, []).append(e.to_id)
    seen: set[str] = set()
    stack: set[str] = set()

    def dfs(v: str) -> None:
        if v in stack:
            raise DAGValidationError(f"cycle through {v}")
        if v in seen:
            return
        stack.add(v)
        for w in adj.get(v, []):
            dfs(w)
        stack.discard(v)
        seen.add(v)

    dfs("__entry__")
    unreachable = set(ids) - seen
    if unreachable:
        raise DAGValidationError(f"unreachable nodes: {sorted(unreachable)}")
    # at most one embedder on any root-to-sink path (reference:
    # exactly-one-embedder per path; we allow embedder-less DAGs since
    # sparse-only pipelines are legal here)
    def max_embedders(v: str) -> int:
        best = 0
        for w in adj.get(v, []):
            cnt = max_embedders(w)
            best = max(best, cnt)
        if v != "__entry__" and dag.node(v).node_type == "embedder":
            best += 1
        return best

    if max_embedders("__entry__") > 1:
        raise DAGValidationError("more than one embedder on a path")


def route(files: DataFrame, edges: list[Edge]) -> DataFrame:
    """P2 conditional router: evaluate sibling edges in the reference's
    order (router.py:94-180) and emit one row per (file, fired path):

      1. parallel predicate edges — ALL that match fire
      2. exclusive predicate edges — FIRST match fires
      3. parallel catch-alls — fire if nothing above fired? No: the
         reference fires parallel catch-alls for every file
      4. exclusive catch-all — fires only when no exclusive predicate
         matched

    Output = input columns + path_id + target_node.
    """
    par_pred = [e for e in edges if e.parallel and e.when is not None]
    exc_pred = [e for e in edges if not e.parallel and e.when is not None]
    par_all = [e for e in edges if e.parallel and e.when is None]
    exc_all = [e for e in edges if not e.parallel and e.when is None]

    branches: list[DataFrame] = []
    for e in par_pred:
        branches.append(
            files.where(compile_predicate(e.when))
            .withColumn("path_id", F.lit(e.path_name))
            .withColumn("target_node", F.lit(e.to_id))
        )
    for e in par_all:
        branches.append(
            files.withColumn("path_id", F.lit(e.path_name))
            .withColumn("target_node", F.lit(e.to_id))
        )
    if exc_pred or exc_all:
        # single when/otherwise chain — one pass over the data
        target = F.lit(None).cast("string")
        path = F.lit(None).cast("string")
        expr_t, expr_p = None, None
        for e in exc_pred:
            cond = compile_predicate(e.when)
            if expr_t is None:
                expr_t = F.when(cond, F.lit(e.to_id))
                expr_p = F.when(cond, F.lit(e.path_name))
            else:
                expr_t = expr_t.when(cond, F.lit(e.to_id))
                expr_p = expr_p.when(cond, F.lit(e.path_name))
        fallback_t = F.lit(exc_all[0].to_id) if exc_all else F.lit(None).cast("string")
        fallback_p = F.lit(exc_all[0].path_name) if exc_all else F.lit(None).cast("string")
        if expr_t is None:
            target, path = fallback_t, fallback_p
        else:
            target, path = expr_t.otherwise(fallback_t), expr_p.otherwise(fallback_p)
        branches.append(
            files.withColumn("path_id", path)
            .withColumn("target_node", target)
            .where(F.col("target_node").isNotNull())
        )
    if not branches:
        return files.withColumn("path_id", F.lit(None).cast("string")) \
                    .withColumn("target_node", F.lit(None).cast("string")).limit(0)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def compile_pipeline(dag: PipelineDAG,
                     stage_fns: dict[str, Callable[[DataFrame, dict], DataFrame]]):
    """P3-lite: validate, then return fn(files_df) -> dict[path_id, df]
    applying each routed branch's node chain. ``stage_fns`` maps
    node_type → (df, config) -> df transformations."""
    validate_dag(dag)
    entry_edges = [e for e in dag.edges if e.from_id == "__entry__"]

    adj: dict[str, list[Edge]] = {}
    for e in dag.edges:
        if e.from_id != "__entry__":
            adj.setdefault(e.from_id, []).append(e)

    def run(files: DataFrame) -> dict[str, DataFrame]:
        routed = route(files, entry_edges)
        out: dict[str, DataFrame] = {}
        for e in entry_edges:
            branch = routed.where(
                (F.col("path_id") == e.path_name) & (F.col("target_node") == e.to_id)
            )
            node_id = e.to_id
            df = branch
            while node_id is not None:
                node = dag.node(node_id)
                fn = stage_fns.get(node.node_type)
                if fn is not None:
                    df = fn(df, node.config)
                nxt = adj.get(node_id, [])
                node_id = nxt[0].to_id if nxt else None
            key = e.path_name
            out[key] = df.unionByName(out[key]) if key in out else df
        return out

    return run
