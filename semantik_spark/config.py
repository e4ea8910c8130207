"""Reference-parity constants.

Values mirror the reference's published defaults:
  - BM25 k1/b and min token length: bm25_sparse_indexer.py:54-55
  - English stopword list (88 words): bm25_sparse_indexer.py:59-147
  - RRF constant: shared/contracts/search.py:51-55
  - rerank candidate clamp: vecpipe/qwen3_search_config.py:91-105
  - default chunk config: shared/database/models.py:261-263
"""

BM25_K1 = 1.5
BM25_B = 0.75
MIN_TOKEN_LENGTH = 2
RRF_K = 60
RERANK_CANDIDATE_MULTIPLIER = 5
RERANK_CANDIDATE_MIN = 20
RERANK_CANDIDATE_MAX = 200
DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 200
MOCK_EMBEDDING_DIM = 8  # sha256 → 32 bytes → 8 big-endian uint32 floats

# The token pattern: word chars, hyphens allowed inside words.
# Same regex dialect meaning in Java (Spark) and RE2 (DuckDB oracle).
TOKEN_PATTERN = r"\b\w+(?:-\w+)*\b"

# 88-word English stopword list, verbatim from the reference.
ENGLISH_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with", "this", "but", "they", "have",
    "had", "what", "when", "where", "who", "which", "why", "how", "all",
    "each", "every", "both", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than",
    "too", "very", "just", "can", "should", "now", "or", "if", "then",
    "also", "been", "being", "would", "could", "does", "did", "about",
    "into", "over", "after", "before", "between", "under", "again",
    "further", "once", "here", "there", "because", "while",
]

# Small per-language function-word sets for the n-gram/stopword
# language-ID heuristic (public common-word lists; the engine's
# lang-id operator is a scoring heuristic, not a model).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "pour"],
}
