"""Opportunistic REAL-model factories for the M1/M2/M4 slots.

The Spark-side harness (functions.model_udfs — iterator pandas_udf,
one-init-per-worker, adaptive batching) is fully tested with fakes;
this module supplies the production closures that load actual models
WHEN the libraries are importable, and raises a clear, early error when
they are not. The sandbox image has neither torch nor transformers, so
every factory here is gated behind an availability probe and the
integration tests skip themselves — but the wiring is real: in an image
with the libs, ``real_dense_udf()(F.col("text"))`` is a drop-in for the
mock embedding column.

Reference parity:
  dense  — shared/embedding/dense.py:161-396 (sentence-transformers
           load, device pick, normalized float32 output)
  splade — vecpipe/sparse.py + shared (MLM logits →
           log(1 + relu(max over tokens)) sparse activation, the
           standard SPLADE pooling; nonzero (indices, values) contract
           of splade_indexer.py:334-345)
  rerank — vecpipe/reranker.py:174-305 (cross-encoder pair scoring)

The mock/deterministic paths stay the correctness-oracle route — real
models are floating-point and version-dependent, so they are
benchmarked, never hash-compared.
"""

from __future__ import annotations

from typing import Any

DENSE_DEFAULT = "sentence-transformers/all-MiniLM-L6-v2"
SPLADE_DEFAULT = "naver/splade-cocondenser-ensembledistil"
RERANK_DEFAULT = "cross-encoder/ms-marco-MiniLM-L-6-v2"


def sentence_transformers_available() -> bool:
    try:
        import sentence_transformers  # noqa: F401

        return True
    except ImportError:
        return False


def transformers_available() -> bool:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


def _require(probe, what: str) -> None:
    if not probe():
        raise ImportError(
            f"{what} requires torch/transformers-stack libraries that are "
            "not installed in this image; use the deterministic mock path "
            "(functions.vectors.mock_embedding / operators.splade test "
            "mode / rerank mock scorer) instead"
        )


def _pick_device() -> str:
    import torch

    return "cuda" if torch.cuda.is_available() else "cpu"


class _DenseModel:
    """encode(texts) -> list[list[float]] over a SentenceTransformer,
    normalized like the reference service (dense.py:370-396)."""

    def __init__(self, model_name: str, device: str | None) -> None:
        from sentence_transformers import SentenceTransformer

        self.model = SentenceTransformer(model_name, device=device or _pick_device())

    def encode(self, texts: list[str]) -> list[list[float]]:
        vecs = self.model.encode(
            texts, convert_to_numpy=True, normalize_embeddings=True,
            show_progress_bar=False,
        )
        return [[float(x) for x in v] for v in vecs]


class _SpladeModel:
    """encode(texts) -> list[(indices, values)]: MLM logits pooled with
    log(1 + relu(max over sequence)) — SPLADE's document activation."""

    def __init__(self, model_name: str, device: str | None, max_length: int = 256) -> None:
        import torch
        from transformers import AutoModelForMaskedLM, AutoTokenizer

        self.torch = torch
        self.device = device or _pick_device()
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForMaskedLM.from_pretrained(model_name).to(self.device).eval()
        self.max_length = max_length

    def encode(self, texts: list[str]) -> list[tuple[list[int], list[float]]]:
        torch = self.torch
        with torch.no_grad():
            toks = self.tokenizer(
                texts, padding=True, truncation=True, max_length=self.max_length,
                return_tensors="pt",
            ).to(self.device)
            logits = self.model(**toks).logits
            # mask padding before the max-pool so pad positions can't win
            mask = toks["attention_mask"].unsqueeze(-1)
            acts = torch.log1p(torch.relu(logits)) * mask
            pooled = acts.max(dim=1).values  # (batch, vocab)
            out = []
            for row in pooled:
                nz = torch.nonzero(row, as_tuple=False).squeeze(-1)
                out.append((
                    [int(i) for i in nz.tolist()],
                    [float(row[i]) for i in nz.tolist()],
                ))
            return out


class _RerankModel:
    """score(pairs) -> list[float] over a CrossEncoder
    (reranker.py:174-305's batched scoring loop)."""

    def __init__(self, model_name: str, device: str | None) -> None:
        from sentence_transformers import CrossEncoder

        self.model = CrossEncoder(model_name, device=device or _pick_device())

    def score(self, pairs: list[tuple[str, str]]) -> list[float]:
        return [float(s) for s in self.model.predict(pairs, show_progress_bar=False)]


def dense_model_factory(model_name: str = DENSE_DEFAULT,
                        device: str | None = None):
    """Closure for model_udfs.dense_embedding_udf — runs once per
    Python worker (iterator form), so the model loads once per
    executor-core, the reference's load-once contract."""
    _require(sentence_transformers_available, "dense_model_factory")
    return lambda: _DenseModel(model_name, device)


def splade_model_factory(model_name: str = SPLADE_DEFAULT,
                         device: str | None = None, max_length: int = 256):
    _require(transformers_available, "splade_model_factory")
    return lambda: _SpladeModel(model_name, device, max_length)


def reranker_model_factory(model_name: str = RERANK_DEFAULT,
                           device: str | None = None):
    _require(sentence_transformers_available, "reranker_model_factory")
    return lambda: _RerankModel(model_name, device)


def real_dense_udf(model_name: str = DENSE_DEFAULT, batch_size: int = 32,
                   instruction: str | None = None, device: str | None = None):
    """Drop-in for the mock embedding column when the libs exist:
    df.withColumn("embedding", real_dense_udf()(F.col("text")))."""
    from semantik_spark.functions.model_udfs import dense_embedding_udf

    return dense_embedding_udf(dense_model_factory(model_name, device),
                               batch_size=batch_size, instruction=instruction)


def real_splade_udf(model_name: str = SPLADE_DEFAULT, batch_size: int = 32,
                    device: str | None = None, max_length: int = 256):
    from semantik_spark.functions.model_udfs import splade_encode_udf

    return splade_encode_udf(splade_model_factory(model_name, device, max_length),
                             batch_size=batch_size)


def real_rerank_udf(model_name: str = RERANK_DEFAULT, batch_size: int = 32,
                    device: str | None = None):
    from semantik_spark.functions.model_udfs import cross_encoder_udf

    return cross_encoder_udf(reranker_model_factory(model_name, device),
                             batch_size=batch_size)


HYDE_DEFAULT = "distilgpt2"


def hyde_generator_factory(model_name: str = HYDE_DEFAULT,
                           device: str | None = None,
                           max_new_tokens: int = 64):
    """M5 slot: a real causal-LM hypothetical-document generator for
    operators.hyde.expand_queries — greedy decoding (do_sample=False)
    so expansion stays deterministic for a given model version, like
    every other oracle-adjacent path. Returns a ``generator(str) ->
    str`` callable; raises early when transformers/torch are absent
    (use hyde.deterministic_generate there)."""
    _require(transformers_available, "hyde_generator_factory")
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    dev = device or _pick_device()
    tok = AutoTokenizer.from_pretrained(model_name)
    model = AutoModelForCausalLM.from_pretrained(model_name).to(dev).eval()

    def generate(query: str) -> str:
        prompt = f"Write a short passage answering: {query}\n"
        with torch.no_grad():
            ids = tok(prompt, return_tensors="pt").to(dev)
            out = model.generate(**ids, max_new_tokens=max_new_tokens,
                                 do_sample=False,
                                 pad_token_id=tok.eos_token_id)
        text = tok.decode(out[0][ids["input_ids"].shape[1]:],
                          skip_special_tokens=True)
        return f"{query} {text.strip()}"

    return generate
