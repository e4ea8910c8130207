"""Iterator-form pandas_udf wrappers for the model-bound slots (M1
dense embed, M2 SPLADE encode, M4 cross-encoder rerank, M8 NER).

Reference parity:
  load-once      — providers/dense_local.py:248-352 initializes the
                   model once per process; here the factory runs once
                   per PARTITION ITERATOR (once per Python worker per
                   task), never per batch or per row.
  adaptive batch — dense_local.py:437-551: halve the batch on OOM down
                   to min_batch_size (raise if even that fails), double
                   back toward the original size after
                   ``increase_threshold`` consecutive successes.
  instruction    — dense.py:370-396: query mode prepends
                   "Instruct: {instruction}\\nQuery:{text}"; document
                   mode passes texts unchanged.

The model libraries (torch/transformers) are NOT in this image, so a
``model_factory`` is the injection point: production passes a closure
loading the real model; tests pass a fake with the same ``encode``
contract. The UDF code paths themselves are real and tested — Arrow
batch iteration, one-init-per-iterator, halving — which is exactly the
part Spark is responsible for.

Model contracts (all plain Python, list-in/list-out per batch):
  dense:  encode(texts: list[str]) -> list[list[float]]
  splade: encode(texts: list[str]) -> list[(indices, values)]
  rerank: score(pairs: list[tuple[str, str]]) -> list[float]
  ner:    extract(texts: list[str]) -> list[list[(entity_type, entity)]]
A model signals memory pressure by raising ModelOOMError (the torch
CUDA OOM is mapped onto it when torch is importable).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql.functions import pandas_udf


class ModelOOMError(RuntimeError):
    """Raised by a model to signal an out-of-memory batch."""


def _oom_types() -> tuple[type[BaseException], ...]:
    try:  # pragma: no cover - torch not present in this image
        import torch

        return (ModelOOMError, torch.cuda.OutOfMemoryError)
    except Exception:
        return (ModelOOMError,)


class AdaptiveBatcher:
    """dense_local.py's adaptive batch loop, engine-agnostic.

    run() slices ``items`` into batches of the current size, calls
    ``fn(batch)``, halves on OOM (min_batch_size floor, re-raises a
    RuntimeError below it) and doubles back toward the original size
    after ``increase_threshold`` consecutive successes. State persists
    across run() calls, like the provider's current_batch_size.
    """

    def __init__(self, batch_size: int = 32, min_batch_size: int = 1,
                 increase_threshold: int = 10) -> None:
        self.original = batch_size
        self.current = batch_size
        self.min = min_batch_size
        self.threshold = increase_threshold
        self.successes = 0
        self.oom_events = 0

    def run(self, items: list[Any], fn: Callable[[list[Any]], list[Any]]) -> list[Any]:
        out: list[Any] = []
        i = 0
        oom = _oom_types()
        while i < len(items):
            batch = items[i:i + self.current]
            try:
                res = fn(batch)
            except oom:
                self.oom_events += 1
                self.successes = 0
                if self.current <= self.min:
                    raise RuntimeError(
                        f"model OOM even at min batch size {self.min}"
                    ) from None
                self.current = max(self.min, self.current // 2)
                continue
            if len(res) != len(batch):
                raise ValueError(
                    f"model returned {len(res)} results for {len(batch)} inputs"
                )
            out.extend(res)
            i += len(batch)
            self.successes += 1
            if self.successes >= self.threshold and self.current < self.original:
                self.current = min(self.current * 2, self.original)
                self.successes = 0
        return out


def apply_instruction(texts: list[str], instruction: str | None) -> list[str]:
    """Query-mode instruction transform (dense.py:378-391)."""
    if not instruction:
        return list(texts)
    return [f"Instruct: {instruction}\nQuery:{t}" for t in texts]


def dense_embedding_udf(model_factory: Callable[[], Any], batch_size: int = 32,
                        instruction: str | None = None,
                        on_init: Callable[[], None] | None = None):
    """text column -> ARRAY<FLOAT> embedding. One factory call per
    partition iterator; Arrow batches stream through AdaptiveBatcher."""

    @pandas_udf("array<float>")
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = model_factory()
        if on_init is not None:
            on_init()
        batcher = AdaptiveBatcher(batch_size)
        for s in it:
            texts = apply_instruction([t if t is not None else "" for t in s], instruction)
            vecs = batcher.run(texts, model.encode)
            yield pd.Series([[float(x) for x in v] for v in vecs])

    return embed


def splade_encode_udf(model_factory: Callable[[], Any], batch_size: int = 32,
                      on_init: Callable[[], None] | None = None):
    """text column -> STRUCT<indices ARRAY<BIGINT>, values ARRAY<DOUBLE>>
    — the sparse-vector contract of splade_indexer.py:334-345."""

    @pandas_udf("indices array<bigint>, values array<double>")
    def encode(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        model = model_factory()
        if on_init is not None:
            on_init()
        batcher = AdaptiveBatcher(batch_size)
        for s in it:
            texts = [t if t is not None else "" for t in s]
            pairs = batcher.run(texts, model.encode)
            yield pd.DataFrame({
                "indices": [[int(i) for i in p[0]] for p in pairs],
                "values": [[float(v) for v in p[1]] for p in pairs],
            })

    return encode


def cross_encoder_udf(model_factory: Callable[[], Any], batch_size: int = 32,
                      on_init: Callable[[], None] | None = None):
    """(query_text, doc_text) columns -> DOUBLE relevance score
    (vecpipe/reranker.py:174-305's batched scoring loop)."""

    @pandas_udf("double")
    def score(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        model = model_factory()
        if on_init is not None:
            on_init()
        batcher = AdaptiveBatcher(batch_size)
        for qs, ds in it:
            pairs = list(zip([q or "" for q in qs], [d or "" for d in ds]))
            scores = batcher.run(pairs, model.score)
            yield pd.Series([float(x) for x in scores])

    return score


def ner_udf(model_factory: Callable[[], Any], batch_size: int = 32,
            on_init: Callable[[], None] | None = None):
    """text column -> ARRAY<STRUCT<entity_type STRING, entity STRING>>."""

    @pandas_udf("array<struct<entity_type:string, entity:string>>")
    def extract(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = model_factory()
        if on_init is not None:
            on_init()
        batcher = AdaptiveBatcher(batch_size)
        for s in it:
            texts = [t if t is not None else "" for t in s]
            ents = batcher.run(texts, model.extract)
            yield pd.Series([
                [(str(et), str(ev)) for et, ev in doc_ents] for doc_ents in ents
            ])

    return extract
