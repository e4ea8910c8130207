"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The subword-tokenizer stage of a large-scale training-data pipeline
(GPT-2 / LLaMA-style corpora are tokenized with a BPE vocabulary
learned from the corpus itself; Sennrich et al. 2016 is the published
algorithm). The reference has only a chars/4 token *estimate*
(character_strategy.py:270) — learning a real subword vocabulary is an
engine-native addition in the training-prep family.

Spark-first shape (the published scalable formulation):

  word frequencies   one corpus pass, groupBy(word).sum — the ONLY
                     stage that touches the full corpus; everything
                     after runs on the distinct-word table, whose size
                     is corpus-INDEPENDENT (web-scale English ~10-100M
                     distinct words vs 100 TB of text)
  merge loop (×K)    per round: adjacent-pair counts weighted by word
                     freq (one small shuffle on the vocab table), a
                     1-row argmax collect, and a window-based greedy
                     non-overlapping merge rewrite — all on the cached
                     vocab table, never the corpus
  encoding           encode the DISTINCT words once (mapInPandas over
                     the vocab), then join token counts back to docs —
                     per-doc cost is a broadcast-able join, not a
                     Python call per document

Determinism: the argmax tie-break is (count DESC, left ASC, right ASC)
— total order, so the merge table is bit-stable across partitionings
and engines. The greedy merge applies left-to-right non-overlapping
occurrences (within a run of overlapping matches, the 1st/3rd/5th...
fire), exactly the sequential-scan semantics of the published
implementation, expressed as two window functions (running match
count → island id → even-offset filter).

At 100 TB: the corpus pass is a map-side-combined aggregation; the
K-round loop costs K tiny jobs on a cached ~10M-row table with
localCheckpoint() truncating lineage every few rounds. For a
production 50k-merge vocabulary you would batch recounts with the
pair-count-delta variant; this module implements the exact published
per-round recount, which is the oracle-verifiable formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

#: end-of-word marker appended as a final symbol (Sennrich et al. 2016)
EOW = "</w>"

#: BPE pre-tokenizer: plain lowercase ASCII words so the char split is
#: unambiguous in every engine (no combining chars / surrogate pairs)
WORD_PATTERN = "[a-z]+"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """word, freq — the corpus-pass pre-aggregation (one shuffle with
    map-side combine; the only stage whose input scales with corpus
    size)."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").cast("bigint").alias("freq"))


def _initial_state(wordfreq: DataFrame) -> DataFrame:
    """word, freq, syms — each word split into single-char symbols plus
    the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, F.lit(1)),
    )
    return wordfreq.select(
        "word", "freq", F.concat(chars, F.array(F.lit(EOW))).alias("syms")
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """left, right, cnt — adjacent-symbol pair counts weighted by word
    frequency (overlapping occurrences all count, per the published
    training count)."""
    # guard single-symbol words (fully merged, e.g. 'a</w>'): Spark's
    # sequence(0, -1) DESCENDS, so an unguarded bound would probe
    # element_at index 0; explode of the empty array drops the row
    adj = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("syms") - 2),
            lambda i: F.struct(
                F.element_at("syms", i + 1).alias("l"),
                F.element_at("syms", i + 2).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    pairs = state.select("freq", F.explode(adj).alias("p"))
    return pairs.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("freq").alias("cnt"))


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every word's symbol array with (left, right) → left+right
    merged greedily left-to-right over non-overlapping occurrences.

    Greedy non-overlap via gaps-and-islands: a position merges iff it
    matches the pair AND its offset within its maximal run of
    consecutive matching positions is even (0-based) — the window-
    function equivalent of a sequential scan."""
    w = Window.partitionBy("word").orderBy("pos")
    ex = state.select(
        "word", "freq", F.posexplode("syms").alias("pos", "sym")
    )
    ex = ex.withColumn("nxt", F.lead("sym").over(w))
    ex = ex.withColumn(
        "m", ((F.col("sym") == left) & (F.col("nxt") == right)).cast("int")
    )
    # running count of matches; for match rows this is their 1-based
    # index among matches, so pos - rnm is constant within a run
    ex = ex.withColumn("rnm", F.sum("m").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    ex = ex.withColumn("grp", F.when(F.col("m") == 1, F.col("pos") - F.col("rnm")))
    iw = Window.partitionBy("word", "grp")
    ex = ex.withColumn(
        "keep",
        (F.col("m") == 1)
        & (((F.col("rnm") - F.min("rnm").over(iw)) % 2) == 0),
    )
    ex = ex.withColumn("prev_keep", F.coalesce(F.lag("keep").over(w), F.lit(False)))
    out = ex.where(~F.col("prev_keep")).select(
        "word",
        "freq",
        "pos",
        F.when(F.col("keep"), F.lit(left + right)).otherwise(F.col("sym")).alias("out_sym"),
    )
    rebuilt = out.groupBy("word", "freq").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "out_sym"))),
            lambda s: s["out_sym"],
        ).alias("syms")
    )
    return rebuilt


def bpe_train(docs: DataFrame, num_merges: int = 8,
              text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, state)``:
      merges — merge_rank BIGINT (1-based), left_sym, right_sym,
               merged, pair_count: the learned merge table in
               application order.
      state  — word, freq, syms: the final vocab symbolization (the
               encoding of every training word under the full merge
               list).

    Each round runs one pair-count aggregation (vocab-sized shuffle),
    one 1-row argmax ``collect`` (the driver needs the winning pair to
    build the next round's plan — K rows total leave the cluster), and
    one window rewrite. ``localCheckpoint`` every round truncates the
    otherwise exponentially nesting window lineage.

    AT-SCALE LIMIT (deliberate): training is K SEQUENTIAL Spark jobs —
    merge k+1's counts depend on merge k's rewrite, so the rounds
    cannot be batched without changing the algorithm. Fine at the
    demo/oracle K=8; a production 32k-merge vocabulary would spend
    ~32k job round-trips here, which is why every production BPE
    (GPT-2, SentencePiece) trains on a word-frequency table small
    enough to fit one machine. That standard path is
    ``bpe_train_sampled`` below: same distributed corpus pass, driver-
    local merge loop on a deterministic top-N word sample, identical
    tie-breaks (equality vs this trainer on the same word table is
    test-pinned), and the unchanged DISTRIBUTED encoder.
    """
    spark = docs.sparkSession
    state = _initial_state(word_frequencies(docs, text_col))
    state = state.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        best = (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] <= 0:
            break
        l, r, cnt = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
        merges.append((rank, l, r, l + r, cnt))
        state = _apply_merge(state, l, r).localCheckpoint(eager=True)
    schema = StructType([
        StructField("merge_rank", LongType()),
        StructField("left_sym", StringType()),
        StructField("right_sym", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
    ])
    return spark.createDataFrame(merges, schema), state


def bpe_train_sampled(docs: DataFrame, num_merges: int = 8,
                      sample_words: int = 100_000,
                      text_col: str = "text") -> tuple[DataFrame, list]:
    """The PRODUCTION trainer (bpe_train docstring, at-scale note):
    word frequencies stay a distributed corpus pass, but the merge
    loop runs DRIVER-LOCAL on a deterministic sample — the
    ``sample_words`` most frequent words (ties broken by word ASC), a
    table bounded by vocabulary, not corpus, which is how GPT-2 /
    SentencePiece-class tokenizers actually train. K merges then cost
    K dict updates instead of K sequential Spark jobs.

    The local loop replays the distributed trainer's exact semantics —
    overlapping-pair counts weighted by word freq, argmax tie-break
    (count DESC, left ASC, right ASC), greedy left-to-right
    non-overlapping rewrite — so on the SAME word-frequency table the
    two produce identical merge tables (test-pinned). Encoding stays
    distributed (encode_words / bpe_token_count take the merge list
    unchanged).

    Returns ``(merges_df, merges_list)``: the same merge-table schema
    as bpe_train plus the [(left, right), ...] list the encoders
    consume.
    """
    spark = docs.sparkSession
    sampled = (
        word_frequencies(docs, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(sample_words)
        .collect()
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r["word"]) + [EOW], int(r["freq"])) for r in sampled
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt <= 0:
            break
        merges.append((rank, l, r, l + r, cnt))
        vocab = [(_greedy_merge(syms, l, r), freq) for syms, freq in vocab]
    schema = StructType([
        StructField("merge_rank", LongType()),
        StructField("left_sym", StringType()),
        StructField("right_sym", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
    ])
    return (spark.createDataFrame(merges, schema),
            [(l, r) for _, l, r, _, _ in merges])


def _greedy_merge(syms: list[str], l: str, r: str) -> list[str]:
    """Greedy left-to-right non-overlapping (l, r) → l+r rewrite — the
    sequential twin of _apply_merge's window formulation and of
    _encode_word's inner loop."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference sequential encoder: apply merges in rank order, each
    greedily left-to-right — by construction this replays training, so
    for any training word it equals the final training state."""
    syms = list(word) + [EOW]
    for l, r in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_words(words: DataFrame, merges: list[tuple[str, str]],
                 word_col: str = "word") -> DataFrame:
    """input rows + ``pieces array<string>`` — the BPE encoding of each
    distinct word, via an Arrow-batched mapInPandas (the tokenizer hot
    loop is genuinely imperative; it runs over the VOCAB, not the
    corpus, so the Python cost is corpus-size-independent)."""
    out_schema = StructType(
        list(words.schema.fields) + [StructField("pieces", ArrayType(StringType()))]
    )
    mlist = list(merges)

    def enc(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pieces"] = [_encode_word(w, mlist) for w in pdf[word_col]]
            yield pdf

    return words.mapInPandas(enc, schema=out_schema)


def bpe_token_count(docs: DataFrame, merges: list[tuple[str, str]],
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_id, n_words, n_tokens — exact BPE token counts per document:
    encode the distinct-word vocab once, then join per-word piece
    counts back to the exploded corpus (one vocab-keyed join — the
    vocab side is broadcast-able at any corpus size)."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("word"),
    )
    vocab = words.select("word").distinct()
    enc = encode_words(vocab, merges).select(
        "word", F.size("pieces").cast("bigint").alias("n_pieces")
    )
    return (
        words.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_tokens"),
        )
    )
