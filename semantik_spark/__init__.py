"""semantik_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference semantic-search stack
(jbmiller10/semantik), re-expressed Spark-first.

The reference is a FastAPI/Celery/Postgres/Qdrant service; this package
re-expresses *what it computes* — ingestion DAGs, chunking, BM25 sparse
indexing, dense (mock/model) embedding, hybrid RRF retrieval, reranking,
IR-metric evaluation — as declarative DataFrame programs that Catalyst
can optimize, plus the LLM-data-pipeline operators (dedup families,
similarity search, text analysis) a 100 TB training-data pipeline needs.

Layout:
  session       — tuned SparkSession builder
  config        — reference-parity constants (BM25 k1/b, stopwords, rrf_k)
  functions/    — pure Column-expression helpers (text, vectors, hashing)
  operators/    — DataFrame->DataFrame operators (bm25, search, metrics,
                  dedup, similarity, textanalysis, chunking)
  plans/        — predicate compiler + pipeline DAG validation/routing
  sources/      — file/source enumeration
  streaming/    — Structured Streaming incremental ingest + event windows
"""

__version__ = "0.1.0"
