"""Text-analysis operators: language ID, quality features, token counts,
fingerprints."""

from __future__ import annotations

import pytest

from semantik_spark.operators.textanalysis import (
    fingerprint,
    language_id,
    quality_features,
    repetition_features,
    token_counts,
)


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is in that garden for sure"),
            (2, "der Hund und die Katze ist von dem Haus mit für auf ein"),
            (3, "el perro y la casa de los árboles que en las por del"),
            (4, "le chien et la maison de les arbres est un une pour des"),
            (5, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "unknown"}


def test_quality_features_values(spark):
    text = "the cat sat on the mat"  # 22 chars, 6 words
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = quality_features(df).collect()[0]
    assert r["n_chars"] == 22 and r["n_words"] == 6
    assert r["avg_word_len"] == pytest.approx(22 / 6)
    assert r["punct_ratio"] == 0.0 and r["digit_ratio"] == 0.0
    # stopwords: the, on, the → 3/6
    assert r["stopword_ratio"] == pytest.approx(0.5)
    assert 0.0 <= r["quality_score"] <= 1.0


def test_quality_empty_doc_is_zeroish(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    r = quality_features(df).collect()[0]
    assert r["n_words"] == 0 and r["quality_score"] < 0.75


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! This has five tokens")], ["doc_id", "text"])
    r = token_counts(df).collect()[0]
    assert r["ws_tokens"] == 6
    assert r["re_tokens"] == 6
    assert r["est_tokens"] == -(-r["n_chars"] // 4)


def test_repetition_duplicate_lines_and_ngrams(spark):
    df = spark.createDataFrame(
        [
            (1, "same line\nsame line\nother line"),
            (2, "buy now buy now buy now"),
            (3, "all words are different here"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    r = {x["doc_id"]: x for x in repetition_features(df).collect()}
    # doc 1: 3 non-empty lines, one duplicated -> 1 - 2/3
    assert r[1]["n_lines"] == 3
    assert abs(r[1]["dup_line_frac"] - (1 - 2 / 3)) < 1e-6
    # doc 2: 2-grams = [buy now, now buy, buy now, now buy, buy now] -> 1 - 2/5
    assert abs(r[2]["dup_2gram_frac"] - (1 - 2 / 5)) < 1e-6
    assert r[2]["dup_3gram_frac"] > 0
    # doc 3: no repetition at all
    assert r[3]["dup_line_frac"] == 0.0
    assert r[3]["dup_2gram_frac"] == 0.0
    # doc 4: empty doc -> all zeros, not null/NaN
    assert r[4]["n_lines"] == 0
    assert r[4]["dup_2gram_frac"] == 0.0


def test_fingerprint_equal_for_identical_docs(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs, n=3).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


def test_curation_decision_reasons(spark):
    from semantik_spark.operators.textanalysis import curation_decision

    df = spark.createDataFrame(
        [
            (1, "short"),                                      # too_short
            (2, "the quick brown fox " * 40),                  # repetitive (dup 2-grams)
            (3, "the quick brown fox jumps over a lazy dog and keeps running "
                "through wide fields of tall green grass under an open sky"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curation_decision(df, min_chars=20).collect()}
    assert out[1]["reason"] == "too_short" and not out[1]["keep"]
    assert out[2]["reason"] == "repetitive" and not out[2]["keep"]
    assert out[3]["keep"] and out[3]["reason"] == "ok"


def test_build_vocab_order_and_ids(spark):
    from semantik_spark.operators.textanalysis import build_vocab

    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa bb dd"), (3, "aa")], ["doc_id", "text"])
    rows = build_vocab(docs, size=3).collect()
    assert [(r["term"], r["freq"], r["doc_freq"], r["vocab_id"]) for r in rows] == [
        ("aa", 4, 3, 0), ("bb", 2, 2, 1), ("cc", 1, 1, 2)]


def test_collocations_pmi_hand_computed(spark):
    import math

    from semantik_spark.operators.textanalysis import collocations

    # "new york" appears 5x; unigrams: new=5, york=5, other fillers
    docs = spark.createDataFrame(
        [(i, "new york is a big city and a busy city") for i in range(5)],
        ["doc_id", "text"])
    rows = collocations(docs, min_count=5, top_k=3).collect()
    top = rows[0]
    assert (top["word_a"], top["word_b"]) == ("new", "york")
    # totals: 50 unigrams, 45 bigrams; p(ab)=5/45, p(a)=p(b)=5/50
    expect = math.log2((5 / 45) / ((5 / 50) * (5 / 50)))
    assert abs(top["pmi"] - round(expect, 6)) < 1e-9


def test_readability_known_text(spark):
    from semantik_spark.operators.textanalysis import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, ""), (3, "Antidisestablishmentarianism notwithstanding, heterogeneous methodologies proliferate.")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # all six words are monosyllabic vowel-group-wise
    assert r1["n_syllables"] == 6
    assert r1["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 6)
    assert r1["band"] == "easy"
    assert out[2]["flesch"] is None and out[2]["band"] == "empty"
    assert out[3]["band"] in ("difficult", "very_difficult")


def test_bigram_logprob_orders_fluency(spark):
    from semantik_spark.operators.textanalysis import bigram_logprob

    # "the cat" appears 3x in-corpus; the shuffled doc uses bigrams the
    # corpus never repeats, so its conditional log-prob must be lower
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the cat ran to the mat"),
        (4, "mat the on sat cat the"),  # shuffled
        (5, "x"),                        # 1 token -> no bigrams, drops out
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert 5 not in out
    assert out[1]["n_bigrams"] == 5
    assert out[4]["avg_logprob"] < out[1]["avg_logprob"]
    assert out[4]["ppl"] > out[1]["ppl"] > 0


def test_boilerplate_per_source_threshold(spark):
    from semantik_spark.operators.textanalysis import boilerplate_stats

    footer = "All rights reserved."
    rows = (
        # source A: 4 docs, 3 share the footer (75% >= 30% → boilerplate)
        [(i, "A", f"Unique body {i}. {footer}") for i in range(3)]
        + [(3, "A", "Unique body 3. Something else.")]
        # source B: footer appears once only → NOT boilerplate for B
        + [(4, "B", f"Other text four. {footer}"), (5, "B", "Other text five. Bye.")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in boilerplate_stats(df).collect()}
    assert out[0]["n_boilerplate"] == 1 and out[0]["bp_frac"] == 0.5
    assert out[3]["n_boilerplate"] == 0
    # same sentence in B stays clean: per-source, not global
    assert out[4]["n_boilerplate"] == 0 and out[5]["n_boilerplate"] == 0


def test_gopher_rules_each_rule_fires(spark):
    from semantik_spark.operators.textanalysis import gopher_rules

    good = "the quick brown fox likes to be of use and knows that we have fun with it " * 4
    rows = [
        (1, good),                                        # passes all
        (2, "short doc"),                                 # word_count
        (3, ("a " * 60) + "the be to of and"),            # word_length (mean < 3)
        (4, good + " " + "#" * 1 + " #### " * 20),        # symbol_ratio
        (5, "\n".join(["- bullet line the be"] * 10)),    # bullet_ellipsis
        (6, good + " " + "123 456 789 " * 30),            # non_alpha
        (7, "alpha words without common glue " * 20),     # stopwords
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in gopher_rules(docs, min_words=20).collect()}
    assert out[1]["keep"] and out[1]["reason"] == "ok"
    assert out[2]["reason"] == "word_count"
    assert out[3]["reason"] == "word_length"
    assert out[4]["reason"] == "symbol_ratio"
    assert out[5]["reason"] == "bullet_ellipsis"
    assert out[6]["reason"] == "non_alpha"
    assert out[7]["reason"] == "stopwords"
    # map-only: no Exchange in the plan
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_drift_psi_detects_shift(spark):
    """PSI ~ 0 for identically-distributed halves; large for a
    vocabulary swap; every term >= 0 and total == sum of terms."""
    from pyspark.sql import functions as F

    from semantik_spark.operators.profiling import corpus_drift_psi

    same = [(i, "alpha beta gamma delta epsilon " * 3) for i in range(40)]
    docs = spark.createDataFrame(same, ["doc_id", "text"])
    out = corpus_drift_psi(docs.where(F.col("doc_id") % 2 == 0),
                           docs.where(F.col("doc_id") % 2 == 1),
                           buckets=16).collect()
    assert len(out) == 16
    total = out[0]["psi_total"]
    assert abs(total) < 1e-4  # identical distributions
    assert all(abs(r["psi_total"] - total) < 1e-12 for r in out)
    assert abs(sum(r["psi_term"] for r in out) - total) < 1e-9
    # vocabulary swap: heavy drift
    shifted = spark.createDataFrame(
        [(i, "zork quux blarg snarf wibble " * 3) for i in range(40)],
        ["doc_id", "text"])
    out2 = corpus_drift_psi(docs, shifted, buckets=16).collect()
    assert out2[0]["psi_total"] > 0.25
    for r in out2:
        assert r["psi_term"] >= 0.0


def test_token_gini_extremes(spark):
    """Uniform frequencies → Gini 0; deciles partition the vocab and
    the top decile's lorenz_share is exactly 1."""
    from semantik_spark.operators.textanalysis import token_gini

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb cc dd")], ["doc_id", "text"])
    rows = {r["decile"]: r for r in token_gini(docs, deciles=4).collect()}
    # V=4 terms, each f=2: perfectly equal -> gini = 2*S1/(V*S)-(V+1)/V
    # S1 = 2*(1+2+3+4)=20, S=8, V=4 -> 40/32 - 5/4 = 0
    assert rows[1]["gini"] == 0.0
    assert rows[4]["lorenz_share"] == 1.0
    assert sum(r["n_terms"] for r in rows.values()) == 4


def test_token_gini_concentrated(spark):
    """One whale term owning most of the mass drives Gini up and the
    bottom decile's share down."""
    from semantik_spark.operators.textanalysis import token_gini

    docs = spark.createDataFrame(
        [(1, " ".join(["whale"] * 96 + ["aa", "bb", "cc", "dd"]))],
        ["doc_id", "text"])
    rows = {r["decile"]: r for r in token_gini(docs, deciles=5).collect()}
    # V=5, S=100; f sorted asc: 1,1,1,1,96; S1=1+2+3+4+5*96=490
    # gini = 2*490/(5*100) - 6/5 = 1.96 - 1.2 = 0.76
    assert rows[1]["gini"] == 0.76
    assert rows[1]["lorenz_share"] == 0.01
    assert rows[5]["lorenz_share"] == 1.0


def test_kneser_ney_continuation_backoff(spark):
    """The KN signature: a word frequent only inside one collocation
    ('francisco' after 'san') gets a LOW continuation weight, so a doc
    using it in a fresh context scores worse under KN than a doc using
    an equally-frequent but promiscuous word. Verify the closed form
    on a tiny corpus."""
    from semantik_spark.operators.textanalysis import kneser_ney_logprob

    # corpus bigrams: 'san francisco' x3, 'the cat', 'the dog', 'the end'
    docs = spark.createDataFrame(
        [(1, "san francisco san francisco san francisco"),
         (2, "the cat the dog the end")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            kneser_ney_logprob(docs, discount=0.75).collect()}
    assert rows[1]["n_bigrams"] == 5 and rows[2]["n_bigrams"] == 5
    # bigram TYPES: san-francisco, francisco-san, the-cat, cat-the,
    # the-dog, dog-the, the-end -> N1+(..) = 7
    # hand-check P(francisco|san): c=3, ctx(san)=3, N1+(san.)=1,
    # N1+(.francisco)=1 -> (3-.75)/3 + (.75*1/3)*(1/7)
    import math
    lp = round(math.log((3 - 0.75) / 3 + (0.75 * 1 / 3) * (1 / 7)), 9)
    # P(san|francisco): c=2, ctx(francisco)=2, N1+(francisco.)=1,
    # N1+(.san)=1 -> (2-.75)/2 + (.75*1/2)*(1/7)
    lp2 = round(math.log((2 - 0.75) / 2 + (0.75 * 1 / 2) * (1 / 7)), 9)
    want = round((3 * lp + 2 * lp2) / 5, 6)
    assert rows[1]["avg_logprob"] == want


def test_good_turing_spectrum_closed_form(spark):
    """'a a a b b c': N_1=N_2=N_3=1; r* = (r+1)N_{r+1}/N_r gives 2 and
    3, NULL at the top class; tail rollup keeps full token mass and the
    r* at max_r still sees the true unbucketed next class."""
    from semantik_spark.operators.textanalysis import good_turing_spectrum

    docs = spark.createDataFrame([(1, "a a a b b c")], ["doc_id", "text"])
    rows = {r["r"]: r for r in good_turing_spectrum(docs, max_r=20).collect()}
    assert rows[1]["n_types"] == 1 and rows[1]["r_star"] == 2.0
    assert rows[2]["r_star"] == 3.0 and rows[3]["r_star"] is None
    assert rows[3]["p_class"] == 0.5

    # bucketed: r=3 ('a') rolls into the tail, but r*=3 at r=2 survives
    rows2 = {r["r"]: r for r in good_turing_spectrum(docs, max_r=2).collect()}
    assert rows2[-1]["mass"] == 3 and rows2[-1]["n_types"] == 1
    assert rows2[2]["r_star"] == 3.0

    # bigram space: 'a b' x2, 'b a', 'b c' (wrap through the sentence)
    rows3 = {r["r"]: r
             for r in good_turing_spectrum(
                 spark.createDataFrame([(1, "a b a b c")], ["doc_id", "text"]),
                 max_r=20, n=2).collect()}
    assert rows3[1]["n_types"] == 2 and rows3[2]["n_types"] == 1


def test_stupid_backoff_chain(spark):
    """Each backoff level hit exactly: a seen trigram scores c3/c12; an
    unseen trigram with seen (w2,w3) bigram scores 0.4*c23/cw2; bigram
    miss with known word backs off to 0.16*c1/N; OOV words count but
    never enter the log sum."""
    import math

    from semantik_spark.operators.textanalysis import stupid_backoff_score

    train = spark.createDataFrame(
        [(0, "a b c a b d"), (2, "c d e")], ["doc_id", "text"])
    # N=9 tokens; c3('a b c')=1, c12('a b')=2; c2('c d')=1, c1('c')=2;
    # score doc trigrams:
    #  'a b c' -> seen: 1/2
    #  'x c d' -> tri miss, bigram 'c d' seen: .4 * 1/2
    #  'c d z' -> bigram 'd z' miss, 'z' unseen -> OOV
    #  'd z e' -> bigram miss, 'e' seen -> .16 * 1/9
    score = spark.createDataFrame(
        [(1, "a b c"), (3, "x c d z e")], ["doc_id", "text"])
    rows = {r["doc_id"]: r
            for r in stupid_backoff_score(train, score).collect()}
    r1 = rows[1]
    assert (r1["n_trigrams"], r1["n_tri_hit"]) == (1, 1)
    assert r1["avg_logscore"] == round(round(math.log(0.5), 9), 6)
    r3 = rows[3]
    assert (r3["n_trigrams"], r3["n_tri_hit"], r3["n_bi_hit"],
            r3["n_uni_hit"], r3["n_oov"]) == (3, 0, 1, 1, 1)
    exp = (round(math.log(0.4 * 0.5), 9)
           + round(math.log(0.4 * 0.4 * (1 / 9)), 9)) / 2
    assert r3["avg_logscore"] == round(exp, 6)


def test_heaps_law_checkpoints(spark):
    """First-occurrence accounting: vocab_cum counts a type at its
    earliest bucket only; token mass accumulates per doc-id-range
    bucket; n-gram mode counts gram instances."""
    from semantik_spark.operators.textanalysis import heaps_law

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "a b"), (3, "d e")],
        ["doc_id", "text"])
    rows = {r["bucket"]: r for r in heaps_law(docs, buckets=4).collect()}
    assert [rows[i]["n_tokens_cum"] for i in range(4)] == [2, 4, 6, 8]
    assert [rows[i]["vocab_cum"] for i in range(4)] == [2, 3, 3, 5]

    # bigram space: doc0 grams {'a b'}, doc1 {'a c'}, doc2 {'a b'} dup
    rows2 = {r["bucket"]: r
             for r in heaps_law(docs, buckets=4, n=2).collect()}
    assert [rows2[i]["n_tokens_cum"] for i in range(4)] == [1, 2, 3, 4]
    assert [rows2[i]["vocab_cum"] for i in range(4)] == [1, 2, 2, 3]


def test_burrows_delta_groups_style(spark):
    """Docs built from the same function-word profile rank nearest:
    probe doc 0 ('the of' heavy) picks doc 2 (same style) over docs 3/4
    ('and to' heavy); zero-variance words drop out without error."""
    from semantik_spark.operators.textanalysis import burrows_delta

    style_a = "the of the of the in a x"
    style_b = "and to and to and by a y"
    docs = spark.createDataFrame(
        [(0, style_a), (2, style_a + " z"), (3, style_b),
         (4, style_b + " w")],
        ["doc_id", "text"])
    rows = burrows_delta(docs, n_words=8, probes=1, top_k=3,
                         probe_mod=100).collect()
    assert all(r["probe_id"] == 0 for r in rows)
    assert rows[0]["doc_id"] == 2 and rows[0]["rank"] == 1
    assert rows[0]["delta"] < rows[1]["delta"]
    assert {r["doc_id"] for r in rows} == {2, 3, 4}


def test_collocations_llr_prefers_attested(spark):
    """G² ranks the well-attested exclusive pair above an equally-
    exclusive hapax pair (PMI would tie them); zero-cell contingencies
    evaluate without error via the xlx(0)=0 convention."""
    from semantik_spark.operators.textanalysis import collocations_llr

    text = " ".join(["hong kong"] * 20 + ["rare pair"]
                    + ["the dog", "the cat", "a dog", "a cat"] * 5)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = collocations_llr(docs, min_count=1, top_k=10).collect()
    by = {(r["word_a"], r["word_b"]): r for r in rows}
    hk = by[("hong", "kong")]
    assert hk["n_pair"] == 20
    assert hk["llr"] > by[("rare", "pair")]["llr"]
    assert rows[0]["llr"] >= rows[-1]["llr"]
