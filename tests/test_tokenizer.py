"""BPE tokenizer training / encoding (operators/tokenizer.py).

Cross-checks the distributed trainer against an independent pure-Python
reference implementation of the published algorithm (Sennrich et al.
2016), including the canonical low/lower/newest/widest worked example.
"""

from __future__ import annotations

import collections

import pytest

from pyspark.sql import functions as F

from semantik_spark.operators.tokenizer import (EOW, bpe_token_count,
                                                bpe_train, encode_words,
                                                word_frequencies)


def _ref_bpe(word_freqs: dict[str, int], num_merges: int):
    """Independent sequential reference: dict-of-tuples state, explicit
    left-to-right greedy merge — no window functions, no Spark."""
    state = {w: tuple(list(w) + [EOW]) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        counts: collections.Counter = collections.Counter()
        for w, syms in state.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # deterministic tie-break: count DESC then (l, r) ASC
        top = max(counts.values())
        l, r = min(p for p, c in counts.items() if c == top)
        merges.append((l, r, counts[(l, r)]))
        new_state = {}
        for w, syms in state.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[w] = tuple(out)
        state = new_state
    return merges, state


SENNRICH = [
    (1, "low low low lower lower newest newest newest newest newest"),
    (2, "newest widest widest widest"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(SENNRICH, ["doc_id", "text"])


def test_word_frequencies(spark, corpus):
    wf = {r["word"]: r["freq"] for r in word_frequencies(corpus).collect()}
    assert wf == {"low": 3, "lower": 2, "newest": 6, "widest": 3}


def test_merges_match_reference(spark, corpus):
    merges_df, state = bpe_train(corpus, num_merges=6)
    got = [(r["left_sym"], r["right_sym"], r["pair_count"])
           for r in merges_df.orderBy("merge_rank").collect()]
    wf = {r["word"]: r["freq"] for r in word_frequencies(corpus).collect()}
    want, ref_state = _ref_bpe(wf, 6)
    assert got == want
    # the canonical example: 'es' family merges first (count 9)
    assert got[0][:2] == ("e", "s") and got[0][2] == 9
    spark_state = {r["word"]: tuple(r["syms"]) for r in state.collect()}
    assert spark_state == ref_state


def test_greedy_nonoverlap_on_runs(spark):
    """'aaaa' must merge to [aa, aa]; 'aaa' to [aa, a] — the 1st/3rd
    occurrence fires inside an overlapping run, never the 2nd."""
    df = spark.createDataFrame([(1, "aaaa aaa aaaa aaa")], ["doc_id", "text"])
    merges_df, state = bpe_train(df, num_merges=1)
    m = merges_df.collect()[0]
    # counts BEFORE merging count overlaps: 3+2 per word pair occurrence
    assert (m["left_sym"], m["right_sym"]) == ("a", "a")
    got = {r["word"]: tuple(r["syms"]) for r in state.collect()}
    assert got["aaaa"] == ("aa", "aa", EOW)
    assert got["aaa"] == ("aa", "a", EOW)


def test_merge_exhaustion_and_single_symbol_words(spark):
    """Fully merged 1-symbol words must not break pair counting
    (sequence(0,-1) descends in Spark — caught by edge probe), and the
    loop stops when no pairs remain rather than emitting rank rows."""
    one = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    merges, state = bpe_train(one, num_merges=5)
    got = [(r["left_sym"], r["right_sym"], r["pair_count"])
           for r in merges.orderBy("merge_rank").collect()]
    assert got == [("a", EOW, 3), ("b", EOW, 1)]
    assert {tuple(r["syms"]) for r in state.collect()} == {("a</w>",), ("b</w>",)}


def test_encoder_replays_training(spark, corpus):
    merges_df, state = bpe_train(corpus, num_merges=5)
    mlist = [(r["left_sym"], r["right_sym"])
             for r in merges_df.orderBy("merge_rank").collect()]
    wf = word_frequencies(corpus)
    enc = {r["word"]: tuple(r["pieces"])
           for r in encode_words(wf, mlist).collect()}
    final = {r["word"]: tuple(r["syms"]) for r in state.collect()}
    assert enc == final
    # unseen word still encodes (falls back to chars + learned merges)
    one = spark.createDataFrame([("lowest",)], ["word"])
    pieces = encode_words(one, mlist).collect()[0]["pieces"]
    assert "".join(pieces) == "lowest" + EOW


def test_token_count(spark, corpus):
    merges_df, _ = bpe_train(corpus, num_merges=4)
    mlist = [(r["left_sym"], r["right_sym"])
             for r in merges_df.orderBy("merge_rank").collect()]
    out = {r["doc_id"]: r for r in bpe_token_count(corpus, mlist).collect()}
    assert out[1]["n_words"] == 10 and out[2]["n_words"] == 4
    # every word is >=1 piece and tokens never exceed chars+1 per word
    for r in out.values():
        assert r["n_tokens"] >= r["n_words"]


def test_plan_shapes(spark, corpus):
    """Pair counting is a partial-aggregated shuffle (map-side combine)
    and the encode join broadcasts the vocab — no cartesian anywhere."""
    merges_df, state = bpe_train(corpus, num_merges=2)
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    mlist = [(r["left_sym"], r["right_sym"]) for r in merges_df.collect()]
    cnt = bpe_token_count(corpus, mlist)
    cplan = cnt._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in cplan
    assert "BroadcastHashJoin" in cplan


def test_sampled_trainer_equals_distributed_on_same_words(spark, corpus):
    """bpe_train_sampled (r7, the production driver-local loop): on the
    SAME word-frequency table the sampled trainer's merge table is
    bit-identical to the distributed trainer's — here with
    sample_words ≥ |vocab| so both see the full table."""
    from semantik_spark.operators.tokenizer import bpe_train_sampled

    merges_dist, _ = bpe_train(corpus, num_merges=6)
    merges_samp, mlist = bpe_train_sampled(corpus, num_merges=6,
                                           sample_words=10_000)
    norm = lambda df: [  # noqa: E731
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in df.orderBy("merge_rank").collect()]
    assert norm(merges_dist) == norm(merges_samp)
    assert mlist == [(l, r) for _, l, r, _, _ in norm(merges_samp)]


def test_sampled_trainer_equals_distributed_on_truncated_sample(spark, corpus):
    """With a HARD sample cap the local loop still matches the
    distributed trainer run over exactly the sampled words: rebuild a
    corpus whose word frequencies equal the top-N sample and compare."""
    from semantik_spark.operators.tokenizer import bpe_train_sampled

    n = 5
    top = (
        word_frequencies(corpus)
        .orderBy(F.desc("freq"), F.asc("word")).limit(n).collect()
    )
    # a corpus realizing exactly the sampled frequency table
    text = " ".join(r["word"] for r in top for _ in range(int(r["freq"])))
    sub = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges_dist, _ = bpe_train(sub, num_merges=4)
    merges_samp, _ = bpe_train_sampled(corpus, num_merges=4, sample_words=n)
    norm = lambda df: [  # noqa: E731
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in df.orderBy("merge_rank").collect()]
    assert norm(merges_dist) == norm(merges_samp)


def test_unigram_viterbi_picks_min_cost_segmentation(spark):
    """Hand-built cost table: 'abc' must segment as the single piece
    'abc' when it is cheapest, as 'ab c' when the bigram route wins,
    with (cost, backpointer-length) tie-break when routes draw."""
    from semantik_spark.operators.tokenizer import unigram_encode_words

    words = spark.createDataFrame([("abc", 4)], ["word", "freq"])

    def enc(costs):
        pieces = spark.createDataFrame(
            [(p, len(p), 1, c) for p, c in costs.items()],
            ["piece", "piece_len", "count", "cost_micro"],
        )
        return unigram_encode_words(words, pieces, max_piece_len=3).collect()[0]

    r = enc({"a": 10, "b": 10, "c": 10, "ab": 15, "abc": 20})
    assert (r["encoded"], r["n_pieces"], r["cost_micro"]) == ("abc", 1, 20)
    r = enc({"a": 10, "b": 10, "c": 10, "ab": 15, "abc": 40})
    assert (r["encoded"], r["n_pieces"], r["cost_micro"]) == ("ab c", 2, 25)
    # tie: 'ab c' (bp=1 at pos 3) vs 'a bc' (bp=2) both cost 25 ->
    # smaller last-piece length wins at position 3
    r = enc({"a": 10, "b": 10, "c": 10, "ab": 15, "bc": 15})
    assert (r["encoded"], r["cost_micro"]) == ("ab c", 25)


def test_unigram_train_keeps_chars_and_caps_multi(spark):
    """Every single character of the sample survives (segmentability
    floor); multi-char pieces are capped at vocab_size by
    (count DESC, piece ASC)."""
    from semantik_spark.operators.tokenizer import unigram_train

    docs = spark.createDataFrame(
        [(1, "zebra zebra quartz jumbo"), (2, "zebra quartz")],
        ["doc_id", "text"],
    )
    pieces = unigram_train(docs, vocab_size=3, max_piece_len=4,
                           sample_words=100)
    rows = pieces.collect()
    chars = {r["piece"] for r in rows if r["piece_len"] == 1}
    assert chars == set("zebraqutjmo")
    multi = [r for r in rows if r["piece_len"] > 1]
    assert len(multi) == 3
    # counts decrease with cost_micro increasing (shared total)
    by_cnt = sorted(rows, key=lambda r: (-r["count"], r["piece"]))
    costs = [r["cost_micro"] for r in by_cnt]
    assert costs == sorted(costs)


def test_unigram_em_refine_reinforces_used_pieces(spark):
    """One hard-EM round: pieces the Viterbi decoder actually uses gain
    count mass; unused multi-char pieces drop out; unused single chars
    keep their seed floor; every sampled word stays segmentable."""
    from semantik_spark.operators.tokenizer import (
        unigram_em_refine, unigram_encode_words, unigram_train,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [(1, "singing ringing kinging singing"), (2, "sing ring king")],
        ["doc_id", "text"],
    )
    pieces = unigram_train(docs, vocab_size=8, max_piece_len=4,
                           sample_words=100)
    words = word_frequencies(docs)
    refined = unigram_em_refine(pieces, words, rounds=2, max_piece_len=4)
    rp = {r["piece"] for r in refined.collect()}
    assert all(len(p) > 1 for p in
               {r["piece"] for r in pieces.collect()} - rp), \
        "only unused multi-char pieces may be dropped — chars survive"
    # chars all survive
    assert {r["piece"] for r in pieces.collect() if r["piece_len"] == 1} <= rp
    enc = unigram_encode_words(words, refined, max_piece_len=4)
    assert enc.count() == words.count()  # everything still segmentable


# --- WordPiece ---------------------------------------------------------------

def test_wordpiece_likelihood_beats_frequency(spark):
    """'t ##h' co-occurs 5x but t/##h are everywhere (score 1/6);
    'q ##u' co-occurs only 2x yet q never appears without u (score
    1/2, the strict corpus max) — WordPiece must merge q+##u first
    even though t+##h is more frequent. (BPE would pick the raw count
    winner.) Every other symbol is frequent enough that no
    singleton-singleton pair reaches 1/2."""
    from semantik_spark.operators.tokenizer import wordpiece_train

    docs = spark.createDataFrame(
        [(1, "the the the that them quit quay hat hot hit toy say may"),],
        ["doc_id", "text"],
    )
    merges, _ = wordpiece_train(docs, num_merges=1)
    r = merges.collect()[0]
    assert (r["left_sym"], r["right_sym"]) == ("q", "##u")
    assert r["merged"] == "qu"


def test_wordpiece_merged_strips_continuation_prefix(spark):
    """Mid-word merges keep ONE '##': ##b + ##c -> ##bc."""
    from semantik_spark.operators.tokenizer import wordpiece_train

    docs = spark.createDataFrame([(1, "xbc ybc zbc wbc")], ["doc_id", "text"])
    merges, state = wordpiece_train(docs, num_merges=1)
    r = merges.collect()[0]
    assert (r["left_sym"], r["right_sym"], r["merged"]) == ("##b", "##c", "##bc")
    syms = {tuple(x["syms"]) for x in state.collect()}
    assert ("x", "##bc") in syms


def test_wordpiece_encode_max_munch_and_unk():
    from semantik_spark.operators.tokenizer import wordpiece_encode_word

    vocab = {"a", "##b", "ab", "abc", "##c", "##bc"}
    # longest-match wins at position 0: 'abc' as one piece
    assert wordpiece_encode_word("abc", vocab) == ["abc"]
    # after consuming 'ab', continuation matching applies
    assert wordpiece_encode_word("abbc", vocab) == ["ab", "##bc"]
    # unencodable suffix -> None ([UNK])
    assert wordpiece_encode_word("abz", vocab) is None


def test_wordpiece_encode_words_matches_local(spark):
    from semantik_spark.operators.tokenizer import (wordpiece_encode_word,
                                                    wordpiece_encode_words)

    vocab = ["h", "##e", "##l", "##o", "he", "##ll", "##llo"]
    words = spark.createDataFrame([("hello",), ("he",)], ["word"])
    rows = wordpiece_encode_words(words, vocab).collect()
    got = {}
    for r in rows:
        got.setdefault(r["word"], []).append((r["piece_index"], r["piece"]))
    assert [p for _, p in sorted(got["hello"])] == wordpiece_encode_word(
        "hello", set(vocab))
    assert [p for _, p in sorted(got["he"])] == ["he"]


def test_wordpiece_unencodable_word_emits_unk(spark):
    """A word with a char outside the trained alphabet must surface as
    one [UNK] piece, not vanish from the encode output."""
    from semantik_spark.operators.tokenizer import wordpiece_encode_words

    words = spark.createDataFrame([("hello",), ("héllo",)], ["word"])
    vocab = ["h", "##e", "##l", "##o", "hello"]
    out = wordpiece_encode_words(words, vocab).collect()
    by_word: dict = {}
    for r in out:
        by_word.setdefault(r["word"], []).append(r["piece"])
    assert by_word["hello"] == ["hello"]
    assert by_word["héllo"] == ["[UNK]"]


def test_wordpiece_empty_word_emits_zero_rows(spark):
    """An EMPTY word encodes to [] (not None): it must posexplode to
    ZERO rows, matching the DuckDB twin — not a spurious [UNK] row
    (the `or ["[UNK]"]` falsy-conflation bug, ADVICE r10)."""
    from semantik_spark.operators.tokenizer import wordpiece_encode_words

    words = spark.createDataFrame([("hello",), ("",)], ["word"])
    vocab = ["h", "##e", "##l", "##o", "hello"]
    out = wordpiece_encode_words(words, vocab).collect()
    assert {r["word"] for r in out} == {"hello"}
    assert [r["piece"] for r in out if r["word"] == "hello"] == ["hello"]
