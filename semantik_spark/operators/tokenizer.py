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

from semantik_spark.functions.caching import checkpoint

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


def _apply_merge(state: DataFrame, left: str, right: str,
                 merged: str | None = None) -> DataFrame:
    """Rewrite every word's symbol array with (left, right) → ``merged``
    (default left+right) greedily left-to-right over non-overlapping
    occurrences.

    Greedy non-overlap via gaps-and-islands: a position merges iff it
    matches the pair AND its offset within its maximal run of
    consecutive matching positions is even (0-based) — the window-
    function equivalent of a sequential scan. ``merged`` lets WordPiece
    reuse the rewrite with its '##'-stripped join (a##b + ##c → a##bc
    is spelled left + right[2:])."""
    if merged is None:
        merged = left + right
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
        F.when(F.col("keep"), F.lit(merged)).otherwise(F.col("sym")).alias("out_sym"),
    )
    rebuilt = out.groupBy("word", "freq").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "out_sym"))),
            lambda s: s["out_sym"],
        ).alias("syms")
    )
    return rebuilt


def bpe_train(docs: DataFrame, num_merges: int = 8,
              text_col: str = "text",
              wordfreq: DataFrame | None = None) -> tuple[DataFrame, DataFrame]:
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
    # ``wordfreq``: reuse a caller-held word-frequency table instead of
    # re-running the one corpus-sized pass (see wordpiece_train)
    if wordfreq is None:
        wordfreq = word_frequencies(docs, text_col)
    state = _initial_state(wordfreq)
    state = checkpoint(state, eager=True)
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
        state = checkpoint(_apply_merge(state, l, r), eager=True)
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


# ---------------------------------------------------------------------------
# Unigram LM tokenizer (Kudo 2018, "Subword Regularization" — the
# SentencePiece unigram model). Where BPE grows a vocabulary bottom-up
# by merges, the unigram model picks, per word, the SEGMENTATION that
# maximizes the product of piece probabilities (Viterbi over the
# position lattice). This implements the seed phase of Kudo's trainer
# (substring-frequency-estimated probabilities over a bounded word
# sample — §3.2's "frequent substrings" initialization) plus the exact
# Viterbi encoder; EM refinement of the seed distribution is a
# driver-local loop over the same bounded sample (see
# unigram_em_refine).
# ---------------------------------------------------------------------------

def unigram_train(docs: DataFrame, vocab_size: int = 120,
                  max_piece_len: int = 5, sample_words: int = 1000,
                  text_col: str = "text") -> DataFrame:
    """Seed a unigram-LM piece vocabulary: every substring (length <=
    ``max_piece_len``) of the ``sample_words`` most frequent words is
    counted at every start position weighted by word frequency; the
    vocabulary keeps ALL single characters (so every word stays
    segmentable) plus the top-``vocab_size`` multi-char pieces by
    (count DESC, piece ASC). Piece cost is the negative log-prob in
    integer MICRO-NATS — floor(-ln(count/total)*1e6 + 0.5) — so
    downstream Viterbi sums are exact integer arithmetic, bit-equal in
    any engine (the repo's exact-decimal discipline, cf. nb_classify).

    Returns (piece, piece_len, count, cost_micro).

    Scale: the corpus pass is word_frequencies (one map-side-combined
    shuffle); everything after runs on the top-``sample_words`` word
    table — bounded by the sample, not the corpus, which is how
    SentencePiece actually trains (on a sampled subset). The substring
    explode is sample_words x max_piece_len x avg_len rows; the only
    global window ranks the bounded piece-count table.
    """
    wf = word_frequencies(docs, text_col)
    sampled = wf.orderBy(F.desc("freq"), F.asc("word")).limit(sample_words)
    sub = (
        sampled.select(
            "word", "freq",
            F.explode(F.array(*[F.lit(l) for l in range(1, max_piece_len + 1)]))
            .alias("l"),
        )
        .where(F.length("word") >= F.col("l"))
        .select(
            "freq",
            F.explode(
                F.expr("transform(sequence(1, length(word) - l + 1),"
                       " i -> substring(word, i, l))")
            ).alias("piece"),
        )
    )
    counts = sub.groupBy("piece").agg(F.sum("freq").cast("bigint").alias("count"))
    chars = counts.where(F.length("piece") == 1)
    w = Window.orderBy(F.desc("count"), F.asc("piece"))
    multi = (
        counts.where(F.length("piece") > 1)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= vocab_size)
        .drop("_rn")
    )
    vocab = chars.unionByName(multi)
    total = vocab.agg(F.sum("count").cast("bigint").alias("_total"))
    return (
        vocab.crossJoin(F.broadcast(total))
        .select(
            "piece",
            F.length("piece").cast("int").alias("piece_len"),
            "count",
            F.floor(
                -F.log(F.col("count").cast("double") / F.col("_total")) * 1e6
                + 0.5
            ).cast("bigint").alias("cost_micro"),
        )
    )


def unigram_encode_words(words: DataFrame, pieces: DataFrame,
                         max_piece_len: int = 5) -> DataFrame:
    """Exact Viterbi segmentation of (word, freq) rows under a piece
    cost table: per word, the minimum-total-cost split into vocabulary
    pieces (integer micro-nat costs — ties broken by shorter last
    piece, i.e. (cost ASC, backpointer-length ASC) at every position,
    a total order both engines replay).

    Returns (word, freq, encoded, n_pieces, cost_micro); words with a
    character outside the vocabulary are dropped (cannot happen for
    words drawn from the training sample — all their chars are kept).

    Scale: the cost table is vocabulary-bounded (the same bounded
    collect discipline as the IVF/PQ codebooks); the DP is an
    Arrow-batched mapInPandas over the distinct-word table — per-word
    O(len * max_piece_len) integer ops, embarrassingly parallel.
    """
    import pandas as pd

    cost_map = {r["piece"]: int(r["cost_micro"]) for r in pieces.collect()}
    bc = words.sparkSession.sparkContext.broadcast((cost_map, max_piece_len))

    def enc(batches):
        costs, maxp = bc.value
        for pdf in batches:
            out = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                best: list[int | None] = [None] * (n + 1)
                back = [0] * (n + 1)
                best[0] = 0
                for p in range(1, n + 1):
                    cands = []
                    for j in range(1, min(maxp, p) + 1):
                        prev = best[p - j]
                        c = costs.get(word[p - j:p])
                        if prev is not None and c is not None:
                            cands.append((prev + c, j))
                    if cands:
                        best[p], back[p] = min(cands)
                if n == 0 or best[n] is None:
                    continue
                segs = []
                p = n
                while p > 0:
                    j = back[p]
                    segs.append(word[p - j:p])
                    p -= j
                segs.reverse()
                out.append((word, int(freq), " ".join(segs),
                            len(segs), int(best[n])))
            yield pd.DataFrame(
                out, columns=["word", "freq", "encoded", "n_pieces",
                              "cost_micro"],
            )

    return words.mapInPandas(
        enc,
        "word string, freq bigint, encoded string, n_pieces bigint, "
        "cost_micro bigint",
    )


def unigram_em_refine(pieces: DataFrame, words: DataFrame,
                      rounds: int = 2, max_piece_len: int = 5) -> DataFrame:
    """Hard-EM refinement of the seed distribution (the Viterbi-EM
    variant of Kudo 2018 §3.2's iteration): each round re-encodes the
    bounded word sample under the current costs (E-step = Viterbi
    counts weighted by word freq) and re-estimates piece probabilities
    from usage (M-step), keeping single characters alive with their
    seed counts when unused so segmentability never breaks. Runs
    driver-local on the sample — the same bounded-table discipline as
    bpe_train_sampled; the distributed encoder consumes the refined
    table unchanged.

    Returns the refined (piece, piece_len, count, cost_micro) with
    usage-based counts.
    """
    spark = pieces.sparkSession
    cost_map = {r["piece"]: int(r["cost_micro"]) for r in pieces.collect()}
    seed_counts = {r["piece"]: int(r["count"])
                   for r in pieces.collect()}
    wrows = [(r["word"], int(r["freq"])) for r in words.collect()]

    def viterbi(word: str, costs: dict) -> list[str] | None:
        n = len(word)
        best: list[int | None] = [None] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0
        for p in range(1, n + 1):
            cands = []
            for j in range(1, min(max_piece_len, p) + 1):
                prev, c = best[p - j], costs.get(word[p - j:p])
                if prev is not None and c is not None:
                    cands.append((prev + c, j))
            if cands:
                best[p], back[p] = min(cands)
        if n == 0 or best[n] is None:
            return None
        segs, p = [], n
        while p > 0:
            segs.append(word[p - back[p]:p])
            p -= back[p]
        return segs[::-1]

    import math

    costs = dict(cost_map)
    counts = dict(seed_counts)
    for _ in range(rounds):
        usage: dict[str, int] = {}
        for word, freq in wrows:
            segs = viterbi(word, costs)
            if segs is None:
                continue
            for s in segs:
                usage[s] = usage.get(s, 0) + freq
        # M-step: usage counts; unused single chars keep seed counts so
        # every word stays segmentable (SentencePiece's char floor)
        counts = {
            p: usage.get(p, c if len(p) == 1 else 0)
            for p, c in counts.items()
        }
        counts = {p: c for p, c in counts.items() if c > 0}
        total = sum(counts.values())
        costs = {
            p: int(math.floor(-math.log(c / total) * 1e6 + 0.5))
            for p, c in counts.items()
        }
    return spark.createDataFrame(
        [(p, len(p), counts[p], costs[p]) for p in sorted(counts)],
        StructType([
            StructField("piece", StringType()),
            StructField("piece_len", LongType()),
            StructField("count", LongType()),
            StructField("cost_micro", LongType()),
        ]),
    ).withColumn("piece_len", F.col("piece_len").cast("int"))


def bpe_fertility(docs: DataFrame, merges: list[tuple[str, str]],
                  group_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """Tokenizer FERTILITY report per corpus slice — the standard
    tokenizer-evaluation metric (tokens produced per word; a vocabulary
    that fits a slice poorly shatters its words into many pieces, which
    directly inflates that slice's training cost and shrinks its
    effective context): per ``group_col``, total words, total BPE
    pieces, fertility = pieces/words, and chars-per-piece.

    All counts are exact integers (fertility is the only division, done
    once at the end) and the encode runs over the DISTINCT word vocab
    (mapInPandas, corpus-size-independent) joined back broadcast — the
    bpe_token_count shape grouped by slice instead of document.
    """
    words = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("word"),
    )
    vocab = words.select("word").distinct()
    enc = encode_words(vocab, merges).select(
        "word",
        F.size("pieces").cast("bigint").alias("n_pieces"),
        F.length("word").cast("bigint").alias("n_chars"),
    )
    return (
        words.join(F.broadcast(enc), "word")
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .select(
            F.col("grp").alias(group_col), "n_words", "n_tokens", "n_chars",
            F.round(F.col("n_tokens").cast("double") / F.col("n_words"), 6)
            .alias("fertility"),
            F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6)
            .alias("chars_per_token"),
        )
    )


# --- WordPiece (Schuster & Nakajima 2012 / BERT) ----------------------------

def _wp_initial_state(wordfreq: DataFrame) -> DataFrame:
    """word, freq, syms — WordPiece symbolization: first character
    plain, every continuation character '##'-prefixed (the BERT
    convention; no end-of-word marker)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.when(i == 1, F.substring(F.col("word"), 1, 1)).otherwise(
            F.concat(F.lit(CONT), F.substring(F.col("word"), i, F.lit(1)))
        ),
    )
    return wordfreq.select("word", "freq", chars.alias("syms"))


CONT = "##"


def _wp_merged(left: str, right: str) -> str:
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def wordpiece_train(docs: DataFrame, num_merges: int = 8,
                    text_col: str = "text",
                    wordfreq: DataFrame | None = None) -> tuple[DataFrame, DataFrame]:
    """Learn ``num_merges`` WordPiece merges. Same round structure as
    ``bpe_train`` (one pair-count aggregation, one 1-row argmax
    collect, one window rewrite per round — see its at-scale note; the
    production path is the same driver-local-loop-on-a-bounded-word-
    table pattern as ``bpe_train_sampled``), with WordPiece's TWO
    differences:

    * the winning pair maximizes the LIKELIHOOD score
      count(l,r) / (count(l)·count(r)) — merge what co-occurs more
      than chance, not what is merely frequent (count(x) = current
      total occurrences of symbol x, word-frequency weighted);
    * pieces carry the '##' continuation prefix and the merged piece
      strips the right side's: a##b + ##c → a##bc.

    The argmax evaluates the score as ONE IEEE division of exact
    BIGINTs (identical in any engine) with ties broken (left, right)
    ASC; the merge table carries the exact integer numerator
    (pair_count) and denominator (cnt_l·cnt_r) so the ranking is
    auditable without any float in the output.

    Returns (merges, state): merges — merge_rank, left_sym, right_sym,
    merged, pair_count, denom; state — word, freq, syms (the final
    training symbolization).
    """
    spark = docs.sparkSession
    # ``wordfreq``: callers that already hold the word-frequency table
    # (the one corpus-sized pass) can hand it in instead of paying a
    # second identical corpus scan
    if wordfreq is None:
        wordfreq = word_frequencies(docs, text_col)
    state = checkpoint(_wp_initial_state(wordfreq), eager=True)
    merges: list[tuple[int, str, str, str, int, int]] = []
    for rank in range(1, num_merges + 1):
        uni = (
            state.select("freq", F.explode("syms").alias("sym"))
            .groupBy("sym").agg(F.sum("freq").cast("bigint").alias("ucnt"))
        )
        pairs = _pair_counts(state)
        ul = uni.select(F.col("sym").alias("left"), F.col("ucnt").alias("cl"))
        ur = uni.select(F.col("sym").alias("right"), F.col("ucnt").alias("cr"))
        best = (
            pairs.join(ul, "left").join(ur, "right")
            # DECIMAL(38,0) before the product (the count-product
            # overflow class): two ~3e9-count symbols wrap cl*cr in
            # BIGINT (ANSI abort / legacy wrap that inflates exactly
            # the most common pairs' scores)
            .withColumn("denom", (F.col("cl").cast("decimal(38,0)")
                                  * F.col("cr").cast("decimal(38,0)")))
            .withColumn("score", F.col("cnt").cast("double")
                        / F.col("denom").cast("double"))
            .orderBy(F.desc("score"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] <= 0:
            break
        l, r = best[0]["left"], best[0]["right"]
        m = _wp_merged(l, r)
        merges.append((rank, l, r, m, int(best[0]["cnt"]), int(best[0]["denom"])))
        state = checkpoint(_apply_merge(state, l, r, merged=m), eager=True)
    schema = StructType([
        StructField("merge_rank", LongType()),
        StructField("left_sym", StringType()),
        StructField("right_sym", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
        StructField("denom", LongType()),
    ])
    return spark.createDataFrame(merges, schema), state


def wordpiece_vocab(state0_alphabet: DataFrame, merges: DataFrame) -> list[str]:
    """The serving vocabulary: every initial symbol (plain first chars
    + '##' continuations seen in training) plus every merged piece —
    bounded by |alphabet| + num_merges, a driver-side list by design
    (same contract as the BPE merge list the encoders consume)."""
    alpha = [r["sym"] for r in state0_alphabet.select(
        F.explode("syms").alias("sym")).distinct().collect()]
    merged = [r["merged"] for r in merges.select("merged").collect()]
    return sorted(set(alpha) | set(merged))


def wordpiece_encode_word(word: str, vocab: set[str]) -> list[str] | None:
    """Greedy longest-match-first (max-munch) WordPiece encoding —
    BERT's runtime tokenizer. None = unencodable ([UNK]): some suffix
    has no matching piece."""
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        j = n
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else CONT + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return None
        out.append(piece)
        i = j
    return out


def wordpiece_encode_words(words: DataFrame, vocab: list[str],
                           word_col: str = "word") -> DataFrame:
    """Distributed max-munch encode: (word, piece_index INT, piece).
    The vocab rides as a captured set inside an Arrow-batched
    mapInPandas — same shape as the BPE/unigram encoders; the per-word
    cost is O(len²) string probes against a hash set, over the VOCAB
    table, never the corpus."""
    out_schema = StructType(
        list(words.schema.fields) + [StructField("pieces", ArrayType(StringType()))]
    )
    vset = set(vocab)

    def enc(batches):
        for pdf in batches:
            pdf = pdf.copy()
            # unencodable words (a char outside the trained alphabet)
            # surface as a single [UNK] piece — a NULL array would
            # posexplode to ZERO rows, silently dropping the word from
            # every fertility/count computed over this output. Test
            # the documented None sentinel EXPLICITLY: the encoder
            # returns [] (also falsy) for an EMPTY word, which must
            # posexplode to zero rows — `or ["[UNK]"]` minted a
            # spurious [UNK] row for it while the DuckDB twin emits
            # none (ADVICE r10)
            pdf["pieces"] = [
                (lambda p: ["[UNK]"] if p is None else p)(
                    wordpiece_encode_word(w, vset))
                for w in pdf[word_col]]
            yield pdf

    return (
        words.mapInPandas(enc, schema=out_schema)
        .select(word_col, F.posexplode("pieces").alias("piece_index", "piece"))
        .withColumn("piece_index", F.col("piece_index").cast("int"))
    )
