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
