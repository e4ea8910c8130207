"""Named plugin registry: config string → implementation.

The reference exposes six plugin extension points as runtime-checkable
protocols (reference ``packages/shared/plugins/protocols.py``:
Connector/Embedding/Chunking/Reranker/Extractor/Parser plus
SparseIndexer) and a ~1k-LoC manifest loader/discovery layer that turns
a config string like ``"embedder": "splade"`` into a live
implementation. Spark-side, a "plugin" is just a callable producing a
DataFrame transform, a Column expression, or a pandas_udf factory — so
the same capability collapses to a flat ``(kind, name) → factory``
table with parameter binding, and the protocol checks collapse to the
factory signatures themselves. What this module keeps from the
reference's design is the part users actually touch: every builtin is
reachable BY NAME from a JSON pipeline config, unknown names fail with
the available inventory, and third-party code can register more
without editing this package (the entry-point discovery of the
reference's loader is out of scope in a sealed sandbox; `register` is
the in-process equivalent).

Builtin inventory mirrors the reference's
``shared/plugins/builtins/`` (bm25_sparse_indexer, splade_indexer,
keyword_extractor, qwen3_reranker, text_parser, unstructured_parser)
plus the engine's own operator families.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Iterable

EXTENSION_POINTS = (
    "connector", "parser", "chunker", "embedder",
    "sparse_indexer", "reranker", "extractor",
)

_REGISTRY: dict[tuple[str, str], Callable[..., Any]] = {}
_BUILTINS_LOADED = False


class PluginError(KeyError):
    """Unknown plugin kind/name (message carries the inventory)."""


def register(kind: str, name: str, *, replace: bool = False):
    """Decorator registering ``factory`` under (kind, name). A factory
    is any callable; ``resolve`` binds config params into it with
    functools.partial, so plain DataFrame functions register as-is."""
    if kind not in EXTENSION_POINTS:
        raise PluginError(f"unknown extension point {kind!r}; "
                          f"one of {EXTENSION_POINTS}")

    def deco(factory: Callable[..., Any]) -> Callable[..., Any]:
        key = (kind, name)
        if key in _REGISTRY and not replace:
            raise PluginError(f"{kind}:{name} already registered "
                              f"(pass replace=True to override)")
        _REGISTRY[key] = factory
        return factory

    return deco


def available(kind: str | None = None) -> dict[str, list[str]]:
    """The plugin inventory: kind → sorted names."""
    _load_builtins()
    kinds: Iterable[str] = (kind,) if kind else EXTENSION_POINTS
    return {k: sorted(n for (kk, n) in _REGISTRY if kk == k) for k in kinds}


def resolve(kind: str, name: str, **params: Any) -> Callable[..., Any]:
    """The loader: (kind, name) → callable with ``params`` bound.

    The returned callable keeps the factory's positional contract
    (e.g. every chunker is ``fn(docs)`` after binding, every extractor
    ``fn(docs)``), which is what lets pipeline configs drive
    compile_pipeline end-to-end without touching Python."""
    _load_builtins()
    try:
        factory = _REGISTRY[(kind, name)]
    except KeyError:
        inventory = available(kind).get(kind, []) if kind in EXTENSION_POINTS else []
        raise PluginError(
            f"no {kind} plugin named {name!r}; available: {inventory}"
        ) from None
    return functools.partial(factory, **params) if params else factory


def _load_builtins() -> None:
    """Populate the registry lazily (imports stay off the module-import
    path; operator modules only load when a plugin is first resolved)."""
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return
    _BUILTINS_LOADED = True

    from pyspark.sql import functions as F

    from semantik_spark.operators import bm25, chunking, extract, rerank, splade
    from semantik_spark.sources import git as git_src
    from semantik_spark.sources import imap as imap_src
    from semantik_spark.sources import local as local_src
    from semantik_spark.sources import parsers as parser_mod

    # --- connectors (reference ConnectorProtocol) ---
    register("connector", "local")(local_src.enumerate_files)
    register("connector", "git")(git_src.enumerate_repo)
    register("connector", "imap")(imap_src.enumerate_mailbox)

    # --- parsers (reference ParserProtocol; text_parser +
    # unstructured_parser builtins, here the stdlib format family) ---
    register("parser", "text")(local_src.parse_text)
    register("parser", "routed")(parser_mod.route_parsers)
    register("parser", "email")(parser_mod.parse_email)
    register("parser", "html")(parser_mod.parse_html)
    register("parser", "pdf")(parser_mod.parse_pdf)

    # --- chunkers (reference ChunkingProtocol, 6 strategies) ---
    register("chunker", "fixed")(chunking.fixed_chunks)
    register("chunker", "character")(chunking.character_chunks)
    register("chunker", "recursive")(chunking.recursive_chunks)
    register("chunker", "markdown")(chunking.markdown_chunks)
    register("chunker", "semantic")(chunking.semantic_chunks)
    register("chunker", "hierarchical")(chunking.hierarchical_chunks)
    register("chunker", "hybrid")(chunking.hybrid_chunks)

    # --- embedders (reference EmbeddingProtocol) ---
    @register("embedder", "mock_dense")
    def _mock_dense(docs, text_col: str = "text", out_col: str = "embedding"):
        from semantik_spark.functions.vectors import mock_embedding

        return docs.withColumn(out_col, mock_embedding(F.col(text_col)))

    @register("embedder", "dense_local")
    def _dense_local(docs, text_col: str = "text", out_col: str = "embedding",
                     model_name: str | None = None, batch_size: int = 32,
                     instruction: str | None = None):
        # import-gated: raises with a clear message when the model libs
        # are absent (functions/realmodels.py)
        from semantik_spark.functions.model_udfs import dense_embedding_udf
        from semantik_spark.functions.realmodels import dense_model_factory

        kwargs = {"model_name": model_name} if model_name else {}
        udf = dense_embedding_udf(dense_model_factory(**kwargs),
                                  batch_size=batch_size, instruction=instruction)
        return docs.withColumn(out_col, udf(F.col(text_col)))

    # --- sparse indexers (reference SparseIndexerProtocol:
    # bm25_sparse_indexer + splade_indexer builtins) ---
    @register("sparse_indexer", "bm25")
    def _bm25_vectors(docs, **params):
        tok = bm25.tokenize(docs)
        stats = bm25.corpus_stats(tok)
        terms = bm25.term_stats(tok, stats, **params)
        return bm25.sparse_vectors(bm25.postings(tok, terms, stats))

    register("sparse_indexer", "splade")(splade.doc_vectors)

    # --- rerankers (reference RerankerProtocol, qwen3_reranker
    # builtin); uniform contract fn(candidates, queries, docs, k) ---
    register("reranker", "mock")(rerank.rerank)

    @register("reranker", "qwen_local")
    def _qwen(candidates, queries, docs, k: int = 10,
              model_name: str | None = None, batch_size: int = 32):
        from semantik_spark.functions.model_udfs import cross_encoder_udf
        from semantik_spark.functions.realmodels import reranker_model_factory

        kwargs = {"model_name": model_name} if model_name else {}
        return rerank.rerank(
            candidates, queries, docs, k=k,
            score_fn=cross_encoder_udf(reranker_model_factory(**kwargs),
                                       batch_size=batch_size),
        )

    # --- extractors (reference ExtractorProtocol, keyword_extractor) ---
    register("extractor", "keywords")(extract.keywords)
    register("extractor", "entities")(extract.entities)


def pipeline_stage_fns(config: dict[str, dict]) -> dict[str, Callable]:
    """Bridge a JSON pipeline config to plans.dag.compile_pipeline:
    ``{"chunk": {"kind": "chunker", "name": "fixed", "params": {...}},
    "embed": {"kind": "embedder", "name": "mock_dense"}}`` becomes the
    ``stage_fns`` mapping node_type → (df, node_config) -> df, with the
    node's own config dict merged over the pipeline-level params — the
    fully config-driven P3 path (the node config wins on conflicts)."""
    fns: dict[str, Callable] = {}
    for node_type, spec in config.items():
        kind, name = spec["kind"], spec["name"]
        params = dict(spec.get("params", {}))

        def make(kind=kind, name=name, params=params):
            def stage(df, node_config):
                merged = {**params, **{k: v for k, v in (node_config or {}).items()
                                       if k not in ("kind", "name")}}
                return resolve(kind, name, **merged)(df)
            return stage

        fns[node_type] = make()
    return fns
