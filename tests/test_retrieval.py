"""BM25 + RRF fusion tests: brute-force parity on a hand-built corpus,
ranking monotonicity, fusion arithmetic, and contract invariants."""

import math

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    rrf_fuse,
)

CORPUS = [
    (0, "spark shuffle join join join"),
    (1, "spark shuffle"),
    (2, "broadcast join strategy"),
    (3, "window rank partition order"),
    (4, "spark spark spark window"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _probes(spark, rows):
    return spark.createDataFrame(rows, "query_id long, terms array<string>")


def _brute_bm25(query_terms, k1=BM25_K1, b=BM25_B, idf_form="log"):
    """Reference implementation: same formula, same micro-unit fixed point.
    idf_form mirrors bm25_topk's idf flag ("log" default, "ratio")."""
    toks = {d: t.split() for d, t in CORPUS}
    n = float(len(CORPUS))
    sum_dl = float(sum(len(t) for t in toks.values()))
    avgdl = sum_dl / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for d, t in toks.items():
        c6_sum = 0
        for term in set(query_terms):
            tf = t.count(term)
            if tf == 0:
                continue
            idf = ((n - df[term]) + 0.5) / (df[term] + 0.5)
            if idf_form == "log":
                idf = math.log(idf + 1.0)
            contrib = (idf * (tf * (k1 + 1.0))) / (
                tf + k1 * ((1.0 - b) + ((b * len(t)) / avgdl))
            )
            c6_sum += round(contrib * 1_000_000.0)
        if c6_sum:
            scores[d] = round(c6_sum / 1_000_000.0, 6)
    return scores


def test_bm25_matches_brute_force(spark):
    """Both idf forms match the brute-force reference on values and order."""
    docs = _docs(spark)
    probes = _probes(spark, [(100, ["spark", "join"])])
    for form in ("log", "ratio"):
        got = {
            r.result_id: (r.score, r.rank)
            for r in bm25_topk(docs, probes, k=10, idf=form).collect()
        }
        want = _brute_bm25(["spark", "join"], idf_form=form)
        assert set(got) == set(want), form
        for d, s in want.items():
            assert math.isclose(got[d][0], s, abs_tol=1e-9), (form, d)
        # ranks follow (score desc, id asc)
        ordered = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in ordered] == [
            d for d, (_, rk) in sorted(got.items(), key=lambda kv: kv[1][1])
        ], form


def test_bm25_idf_forms_rank_agreement(spark):
    """The log and ratio idf forms agree on per-query ranking for
    single-term queries (idf is monotone in df in both forms, so only the
    multi-term BLEND can differ — the documented deviation), and return
    the same candidate set for multi-term queries."""
    docs = _docs(spark)
    single = _probes(spark, [(0, ["spark"]), (1, ["join"]), (2, ["window"])])
    by_form = {}
    for form in ("log", "ratio"):
        rows = bm25_topk(docs, single, k=10, idf=form).collect()
        by_form[form] = sorted((r.query_id, r.rank, r.result_id) for r in rows)
    assert by_form["log"] == by_form["ratio"]

    multi = _probes(spark, [(9, ["spark", "join", "broadcast"])])
    sets = {
        form: {r.result_id for r in bm25_topk(docs, multi, k=10, idf=form).collect()}
        for form in ("log", "ratio")
    }
    assert sets["log"] == sets["ratio"]


def test_bm25_idf_invalid_raises(spark):
    import pytest

    docs = _docs(spark)
    probes = _probes(spark, [(0, ["spark"])])
    with pytest.raises(ValueError):
        bm25_topk(docs, probes, k=10, idf="bogus")


def test_bm25_rare_term_outweighs_common(spark):
    """'broadcast' appears in 1 doc, 'spark' in 3 — a one-term query for the
    rare term must score its doc above any doc scored by the common term."""
    docs = _docs(spark)
    probes = _probes(spark, [(0, ["broadcast"]), (1, ["spark"])])
    rows = bm25_topk(docs, probes, k=10).collect()
    rare = max(r.score for r in rows if r.query_id == 0)
    common = max(r.score for r in rows if r.query_id == 1)
    assert rare > common


def test_bm25_tf_saturation_and_topk(spark):
    """More occurrences of the query term rank higher (doc 0: 3x 'join'
    beats doc 2: 1x 'join'), and k truncates."""
    docs = _docs(spark)
    probes = _probes(spark, [(7, ["join"])])
    rows = sorted(
        bm25_topk(docs, probes, k=1).collect(), key=lambda r: r.rank
    )
    assert len(rows) == 1 and rows[0].result_id == 0


def test_bm25_only_matching_docs_returned(spark):
    docs = _docs(spark)
    probes = _probes(spark, [(9, ["nonexistent-term"])])
    assert bm25_topk(docs, probes, k=10).count() == 0


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "query_id long, result_id long, score double, rank int")


def test_rrf_fuse_arithmetic(spark):
    """Hand-checkable fusion: overlap sums both reciprocals, single-list
    entries contribute one, re-rank follows fused score then id."""
    a = _ranked(spark, [(1, 10, 0.9, 1), (1, 11, 0.8, 2)])
    b = _ranked(spark, [(1, 11, 0.7, 1), (1, 12, 0.6, 2)])
    got = {r.result_id: (r.score, r.rank) for r in rrf_fuse(a, b, k=10).collect()}
    assert math.isclose(got[11][0], round(1 / 62 + 1 / 61, 6), abs_tol=1e-9)
    assert math.isclose(got[10][0], round(1 / 61, 6), abs_tol=1e-9)
    assert math.isclose(got[12][0], round(1 / 62, 6), abs_tol=1e-9)
    # 11 (both lists) outranks 10 and 12; 10 (rank 1) outranks 12 (rank 2)
    assert got[11][1] == 1 and got[10][1] == 2 and got[12][1] == 3


def test_rrf_fuse_truncates_and_partitions_by_query(spark):
    a = _ranked(spark, [(q, i, 1.0 - i / 10, i) for q in (1, 2) for i in range(1, 6)])
    b = _ranked(spark, [])
    out = rrf_fuse(a, b, k=3)
    per_q = out.groupBy("query_id").count().collect()
    assert {r.query_id: r["count"] for r in per_q} == {1: 3, 2: 3}


def test_bm25_prebuilt_index_matches_inline(spark, tmp_path):
    """bm25_index persisted to parquet and reloaded produces the same
    top-k as the inline derivation — the build-once/query-many shape."""
    docs = _docs(spark)
    probes = _probes(spark, [(3, ["spark", "join", "window"])])
    inline = sorted(map(tuple, bm25_topk(docs, probes, k=10).collect()))

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.retrieval import (
        bm25_index,
    )

    idx = bm25_index(docs)
    paths = {}
    for name, df in idx.items():
        p = str(tmp_path / f"bm25_{name}")
        df.write.parquet(p)
        paths[name] = p
    reloaded = {name: spark.read.parquet(p) for name, p in paths.items()}
    from_disk = sorted(
        map(tuple, bm25_topk(None, probes, k=10, index=reloaded).collect())
    )
    assert inline == from_disk


def test_bm25_max_df_ratio_drops_stopword_terms(spark):
    """The hot-term guard: 'spark' (df 3/5 = 0.6) is dropped at ratio 0.5,
    'broadcast' (df 0.2) is kept, and kept-term scores are unchanged."""
    docs = _docs(spark)
    probes = _probes(spark, [(1, ["spark", "broadcast"])])
    exact = {
        r.result_id: r.score for r in bm25_topk(docs, probes, k=10).collect()
    }
    guarded = {
        r.result_id: r.score
        for r in bm25_topk(docs, probes, k=10, max_df_ratio=0.5).collect()
    }
    # only doc 2 contains 'broadcast'; docs matched solely via 'spark' vanish
    assert set(guarded) == {2}
    # and doc 2's score now excludes the 'spark'-less contribution it never
    # had — i.e. equals the single-term brute-force value
    want = _brute_bm25(["broadcast"])
    assert abs(guarded[2] - want[2]) < 1e-9
    # exact (unguarded) form still returned the spark-matched docs
    assert set(exact) > {2}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_plan_shape(spark):
    """Plan regressions the 100 TB story depends on: query terms and
    corpus stats arrive by broadcast (no shuffle of postings against
    them), the top-k has a partial WindowGroupLimit, and nothing
    corpus-sized goes through a cartesian product (the only BNLJ is the
    1-row stats attach)."""
    docs = _docs(spark)
    probes = _probes(spark, [(1, ["spark", "join"])])
    plan = _plan(bm25_topk(docs, probes, k=10))
    assert "WindowGroupLimit" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_rrf_plan_is_join_not_cartesian(spark):
    a = _ranked(spark, [(1, 10, 0.9, 1)])
    b = _ranked(spark, [(1, 11, 0.7, 1)])
    plan = _plan(rrf_fuse(a, b, k=5))
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower()
