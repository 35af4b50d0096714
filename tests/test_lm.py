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


# ------------------------------------------------------------------
# Interpolated Kneser-Ney + CCNet perplexity bucketing (r12; staged r13
# graded-entry differential)

def _kn(spark, docs):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        kn_lm_scores,
        train_kn_bigram_lm,
    )

    m, cx, cn, tt = train_kn_bigram_lm(docs)
    return kn_lm_scores(docs, m, cx, cn, tt)


def test_kn_scores_match_python_oracle(spark):
    """Every p6 is an exact rational, so a pure-Python integer replay of
    the joined counts must reproduce doc scores bit-for-bit."""
    import re
    from collections import Counter

    texts = {
        0: "the cat sat on the mat",
        1: "the dog sat on the log",
        2: "a cat and a dog",
        3: "xyz unknown words here",
        4: "one",
    }
    docs = _docs(spark, list(texts.items()))
    got = {
        r.doc_id: (r.n_bigrams, r.kn_score6, r.kn_score)
        for r in _kn(spark, docs).collect()
    }

    def toks(t):
        return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower()) if w]

    bigs = Counter()
    for t in texts.values():
        ws = toks(t)
        for a, b in zip(ws, ws[1:]):
            bigs[(a, b)] += 1
    cuni, n1pw, n1pd = Counter(), Counter(), Counter()
    for (a, b), c in bigs.items():
        cuni[a] += c
        n1pw[a] += 1
        n1pd[b] += 1
    T = len(bigs)

    def p6(a, b):
        if a in cuni:
            num = max(4 * bigs.get((a, b), 0) - 3, 0) * T + 3 * n1pw[a] * n1pd.get(b, 0)
            den = 4 * cuni[a] * T
            return (2 * num * 10**6 + den) // (2 * den)
        if b in n1pd:
            return (2 * n1pd[b] * 10**6 + T) // (2 * T)
        return 0

    want = {}
    for d, t in texts.items():
        ws = toks(t)
        n = max(len(ws) - 1, 0)
        s = sum(p6(a, b) for a, b in zip(ws, ws[1:]))
        s6 = (2 * s + n) // (2 * n) if n else 0
        want[d] = (n, s6, s6 / 1e6 if n else 0.0)
    assert got == want


def test_kn_distribution_sums_to_one(spark, sf_dir):
    """The KN identity, checked in EXACT rationals on real model tables:
    for every seen context w1, sum over the full continuation support of
    p_KN(w2|w1) == 1 — the discount mass handed to the interpolation
    term is exactly the mass removed from the observed bigrams."""
    from fractions import Fraction

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        train_kn_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    model, ctx, cont, totals = train_kn_bigram_lm(docs)
    c_big = {(r.w1, r.w2): r.c_big for r in model.collect()}
    cx = {r.w1: (r.c_uni, r.n1p_w1) for r in ctx.collect()}
    nd = {r.w2: r.n1p_dot for r in cont.collect()}
    T = totals.collect()[0].n1p_tot
    D = Fraction(3, 4)
    assert sum(nd.values()) == T  # continuation dist normalizes by design
    for w1, (c_uni, n1p_w1) in list(cx.items())[:40]:
        s = Fraction(0)
        for w2, n1p_dot in nd.items():
            c = c_big.get((w1, w2), 0)
            s += (
                Fraction(max(c * 4 - 3, 0), 4 * c_uni)
                + D * Fraction(n1p_w1, c_uni) * Fraction(n1p_dot, T)
            )
        assert s == 1, (w1, s)


def test_kn_unseen_context_and_token(spark):
    """Held-out scoring: an unseen context backs off to the continuation
    distribution; a fully-unseen bigram (both sides novel) contributes
    exactly 0 — held-out docs score without special-casing."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        kn_lm_scores,
        train_kn_bigram_lm,
    )

    train = _docs(spark, [(0, "the cat sat on the mat"),
                          (1, "the dog sat on the log")])
    m, cx, cn, tt = train_kn_bigram_lm(train)
    held = _docs(spark, [(10, "zzz cat"), (11, "qqq zzz")])
    got = {r.doc_id: r.kn_score6 for r in
           kn_lm_scores(held, m, cx, cn, tt).collect()}
    # ("zzz","cat"): unseen context -> p = N1+(*,cat)/N1+(*,*) = 1/8
    # (8 distinct bigram TYPES in the train pair; "cat" continues one)
    assert got[10] == 125000
    assert got[11] == 0


def test_kn_buckets_match_duckdb_replay(spark, sf_dir):
    """The staged r13 differential: the full train -> score -> bucket
    chain vs the shared engine renderer's full-SQL replay — every doc's
    exact micro-unit score AND bucket identical."""
    import duckdb

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        kn_lm_buckets_duckdb_sql,
        kn_lm_scores,
        perplexity_buckets,
        train_kn_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m, cx, cn, tt = train_kn_bigram_lm(docs)
    out = perplexity_buckets(kn_lm_scores(docs, m, cx, cn, tt))
    got = sorted(
        (r.doc_id, r.n_bigrams, r.kn_score6, r.kn_score, r.bucket)
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (int(a), int(b), int(c), float(d), e)
        for a, b, c, d, e in con.execute(kn_lm_buckets_duckdb_sql()).fetchall()
    )
    assert got == want
    # the thirds land near their targets (ties may exceed them)
    from collections import Counter

    n = len(got)
    sizes = Counter(b for *_, b in got)
    assert sizes["head"] >= n // 3
    assert sizes["tail"] >= n // 3
    assert sizes["head"] + sizes["middle"] + sizes["tail"] == n


def test_kn_bucket_order_and_plan_shape(spark, sf_dir):
    """head scores >= middle scores >= tail scores (value-based cuts),
    and the composed plan stays JVM-side: no row-at-a-time Python UDF,
    no CartesianProduct (the 1-row totals attach plans as a broadcast
    nested loop, the allowed shape)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        kn_lm_scores,
        perplexity_buckets,
        train_kn_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    m, cx, cn, tt = train_kn_bigram_lm(docs)
    out = perplexity_buckets(kn_lm_scores(docs, m, cx, cn, tt))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    by_bucket = {}
    for r in out.collect():
        by_bucket.setdefault(r.bucket, []).append(r.kn_score6)
    if "head" in by_bucket and "middle" in by_bucket:
        assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    if "middle" in by_bucket and "tail" in by_bucket:
        assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
