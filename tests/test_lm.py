"""Bigram-LM scorer tests: training counts, smoothing, held-out fallbacks."""

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
    bigram_lm_scores,
    train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_counts_and_vocab(spark):
    d = _docs(spark, [(1, "a b a b c"), (2, "a b")])
    model, vocab = train_bigram_lm(d)
    counts = {(r.w1, r.w2): (r.c_big, r.c_uni) for r in model.collect()}
    # bigrams: doc1 = ab ba ab bc ; doc2 = ab
    assert counts[("a", "b")] == (3, 3)  # c_uni(a) = 3 starts, all -> b
    assert counts[("b", "a")] == (1, 2)  # b starts: ba, bc
    assert counts[("b", "c")] == (1, 2)
    assert vocab.first().v == 3


def test_scores_match_hand_computation(spark):
    d = _docs(spark, [(1, "a b a b c"), (2, "a b")])
    model, vocab = train_bigram_lm(d)
    out = {r.doc_id: r for r in bigram_lm_scores(d, model, vocab).collect()}
    V = 3
    p_ab = (3 + 1.0) / (3 + V)
    p_ba = (1 + 1.0) / (2 + V)
    p_bc = (1 + 1.0) / (2 + V)
    p6 = lambda p: round(1000000.0 * p)
    s1 = p6(p_ab) * 2 + p6(p_ba) + p6(p_bc)
    want1 = ((2 * s1 + 4) // 8) / 1000000.0  # integer half-up mean
    want2 = ((2 * p6(p_ab) + 1) // 2) / 1000000.0
    assert out[1].n_bigrams == 4 and out[1].lm_score == want1
    assert out[2].n_bigrams == 1 and out[2].lm_score == want2


def test_held_out_unseen_bigrams_smoothed(spark):
    train = _docs(spark, [(1, "a b c")])
    model, vocab = train_bigram_lm(train)
    # 'c a' unseen bigram (seen w1), 'z z' unseen w1 entirely
    held = _docs(spark, [(10, "c a"), (11, "z z")])
    out = {r.doc_id: r for r in bigram_lm_scores(held, model, vocab).collect()}
    V = 3
    # unseen bigram with unseen-start c? c never starts a bigram in train
    # -> c_uni missing -> (0+1)/(0+V)
    p6 = round(1000000.0 / V)
    want = ((2 * p6 + 1) // 2) / 1000000.0
    assert out[10].lm_score == want
    assert out[11].lm_score == want


def test_short_docs_score_zero_but_kept(spark):
    train = _docs(spark, [(1, "a b c d")])
    model, vocab = train_bigram_lm(train)
    held = _docs(spark, [(2, "single"), (3, "")])
    out = {r.doc_id: r for r in bigram_lm_scores(held, model, vocab).collect()}
    assert out[2].n_bigrams == 0 and out[2].lm_score == 0.0
    assert out[3].n_bigrams == 0 and out[3].lm_score == 0.0


def test_higher_prob_docs_score_higher(spark):
    # corpus dominated by "a b" transitions: a doc of pure "a b a b" must
    # outscore a doc of rare transitions
    train = _docs(spark, [(i, "a b " * 10) for i in range(5)] + [(99, "q r")])
    model, vocab = train_bigram_lm(train)
    held = _docs(spark, [(100, "a b a b a b"), (101, "q r q r q r")])
    out = {r.doc_id: r.lm_score for r in bigram_lm_scores(held, model, vocab).collect()}
    assert out[100] > out[101]
