"""DSIR importance resampling (operators/lm.py dsir_weights/dsir_select):
planted-domain ranking, hand-computed weights, percentile-cut selection,
and the full DuckDB replay — ``dsir_sql`` is the STAGED r10 graded-entry
oracle (two bigram LMs + exact micro-unit ratio, the bigram_lm_scores
oracle doubled)."""

import os
import sys

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (  # noqa: E402
    dsir_select,
    dsir_weights,
)

_TOKENS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


def _lm_ctes(tag: str, toks_src: str) -> str:
    """One side's bigram-LM model CTEs (cbig/cuni/vocab) from a token CTE."""
    return f"""b_{tag} AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                                 i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS bg
    FROM {toks_src} WHERE len(toks) >= 2
  )
),
cbig_{tag} AS (SELECT w1, w2, count(*)::BIGINT AS c_big FROM b_{tag} GROUP BY 1, 2),
cuni_{tag} AS (SELECT w1, sum(c_big)::BIGINT AS c_uni FROM cbig_{tag} GROUP BY 1),
v_{tag} AS (
  SELECT count(DISTINCT t)::BIGINT AS v
  FROM (SELECT unnest(toks) AS t FROM {toks_src})
)"""


def dsir_sql(raw_sql: str, target_sql: str) -> str:
    """Unabridged DSIR replay: raw-corpus bigrams scored under the
    target-trained and raw-trained LMs, exact micro-unit ratio."""
    p6 = (
        "round(1000000.0 * ((coalesce(m{t}.c_big, 0) + 1.0)"
        " / (coalesce(u{t}.c_uni, 0) + v{t}.v)))::BIGINT"
    )
    return f"""WITH rawd AS ({raw_sql}), tgtd AS ({target_sql}),
rt AS (SELECT doc_id, {_TOKENS} AS toks FROM rawd),
tt AS (SELECT doc_id, {_TOKENS} AS toks FROM tgtd),
{_lm_ctes('t', 'tt')},
{_lm_ctes('r', 'rt')},
sums AS (
  SELECT b.doc_id, count(*)::BIGINT AS n,
         sum({p6.format(t='t')})::BIGINT AS s_t,
         sum({p6.format(t='r')})::BIGINT AS s_r
  FROM b_r b
  LEFT JOIN cbig_t mt ON mt.w1 = b.w1 AND mt.w2 = b.w2
  LEFT JOIN cuni_t ut ON ut.w1 = b.w1
  CROSS JOIN v_t vt
  LEFT JOIN cbig_r mr ON mr.w1 = b.w1 AND mr.w2 = b.w2
  LEFT JOIN cuni_r ur ON ur.w1 = b.w1
  CROSS JOIN v_r vr
  GROUP BY 1
)
SELECT d.doc_id, coalesce(s.n, 0)::BIGINT AS n_bigrams,
       coalesce((2 * s.s_t * 1000000 + s.s_r) // (2 * s.s_r), 0)::BIGINT AS weight6,
       coalesce((2 * s.s_t * 1000000 + s.s_r) // (2 * s.s_r), 0) / 1000000.0 AS weight
FROM rawd d LEFT JOIN sums s ON s.doc_id = d.doc_id"""


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_domain_floats_to_top(spark):
    target = _docs(spark, [(100 + i, "alpha beta gamma alpha beta") for i in range(3)])
    raw = _docs(
        spark,
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon zeta delta"),
         (3, "beta gamma alpha beta"), (4, "eta theta iota eta")],
    )
    w = {r.doc_id: r.weight for r in dsir_weights(raw, target).collect()}
    assert min(w[1], w[3]) > max(w[2], w[4])
    kept = {r.doc_id for r in dsir_select(raw, target, keep_frac=0.5).collect()}
    assert kept == {1, 3}


def test_weights_match_duckdb_replay(documents, sf_dir):
    # raw = the fixture corpus; target = a deterministic slice of it
    raw = documents
    target = documents.filter("doc_id % 5 = 0")
    got = {
        r.doc_id: (r.n_bigrams, r.weight6, r.weight)
        for r in dsir_weights(raw, target).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = con.execute(
        dsir_sql(
            "SELECT doc_id, text FROM documents",
            "SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0",
        )
    ).fetchall()
    assert got == {int(d): (int(n), int(w6), w) for d, n, w6, w in oracle}
    assert len(got) == documents.count()


def test_hand_computed_weight(spark):
    # target: "a b" once -> cbig_t[a,b]=1, cuni_t[a]=1, v_t=2
    # raw: doc 1 = "a b"  -> cbig_r[a,b]=1, cuni_r[a]=1, v_r=2
    # p_t(a,b) = (1+1)/(1+2) = 2/3 -> p6 666667 ; p_r identical
    # weight = 666667/666667 = 1.0
    target = _docs(spark, [(10, "a b")])
    raw = _docs(spark, [(1, "a b")])
    rows = dsir_weights(raw, target).collect()
    assert [(r.doc_id, r.n_bigrams, r.weight6, r.weight) for r in rows] == [
        (1, 1, 1000000, 1.0)
    ]


def test_no_bigram_docs_weigh_zero_but_stay(spark):
    target = _docs(spark, [(10, "a b a b")])
    raw = _docs(spark, [(1, "a b"), (2, "solo"), (3, "")])
    w = {r.doc_id: (r.n_bigrams, r.weight) for r in dsir_weights(raw, target).collect()}
    assert set(w) == {1, 2, 3}
    assert w[2] == (0, 0.0) and w[3] == (0, 0.0)
    assert w[1][1] > 0.0


def test_select_keeps_boundary_ties(spark):
    # four identical docs: every weight equal -> the 75th-percentile cut
    # keeps ALL of them (fraction semantics, not exact-n)
    target = _docs(spark, [(10, "x y x y")])
    raw = _docs(spark, [(i, "x y") for i in range(4)])
    kept = dsir_select(raw, target, keep_frac=0.25).collect()
    assert len(kept) == 4
    assert set(kept[0].asDict()) == {"doc_id", "text", "weight"}


def test_broadcast_models_matches_default(spark):
    """broadcast_models=True is a pure plan hint — identical rows."""
    target = _docs(spark, [(100 + i, "alpha beta gamma alpha beta") for i in range(3)])
    raw = _docs(
        spark,
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon zeta delta"),
         (3, "beta gamma alpha beta"), (4, "eta theta iota eta")],
    )
    base = sorted(map(tuple, dsir_weights(raw, target).collect()))
    hinted = sorted(
        map(tuple, dsir_weights(raw, target, broadcast_models=True).collect())
    )
    assert base == hinted


def test_select_weight_col_collision_is_loud(spark):
    import pytest as _pytest

    target = _docs(spark, [(10, "x y x y")])
    raw = _docs(spark, [(i, "x y") for i in range(4)]).withColumn(
        "weight", F.lit(1.0)
    )
    with _pytest.raises(ValueError, match="weight"):
        dsir_select(raw, target)
    kept = dsir_select(raw, target, weight_col="dsir_weight").collect()
    assert len(kept) == 4
    assert set(kept[0].asDict()) == {"doc_id", "text", "weight", "dsir_weight"}


def test_w6_expr_survives_4_6m_bigram_scale(spark):
    """The DECIMAL(38,0) numerator: at s_t ~ 5e12 (a ~5M-bigram doc) the
    BIGINT product 2*s_t*1e6 = 1e19 would wrap negative under non-ANSI
    Spark; the shipped expression must return the exact positive ratio."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        _W6_EXPR,
    )

    s_t, s_r = 5_000_000_000_000, 4_000_000_000_000
    row = spark.createDataFrame([(s_t, s_r)], "s_t bigint, s_r bigint").select(
        F.expr(_W6_EXPR).alias("w6")
    ).collect()[0]
    assert row.w6 == 1_250_000  # ratio 1.25 in micro-units, exactly


def dsir_select_sql(raw_sql: str, target_sql: str,
                    keep_frac: float = 0.25) -> str:
    """STAGED r11 graded-entry oracle: the selection leg — exact type-7
    percentile cut on the integer micro-unit weights (quantile_cont is
    Spark percentile's DuckDB twin, the quality_cutoff precedent),
    boundary ties kept, survivors re-joined to the full doc rows."""
    return f"""WITH w AS ({dsir_sql(raw_sql, target_sql)}),
t AS (SELECT quantile_cont(weight6, {1.0 - keep_frac}) AS thr FROM w)
SELECT d.*, w.weight FROM ({raw_sql}) d JOIN w ON w.doc_id = d.doc_id, t
WHERE w.weight6 >= t.thr"""


def test_select_matches_duckdb_replay(documents, sf_dir):
    """The staged r11 differential: dsir_select vs the full-SQL replay
    (weights + percentile threshold + tie-keeping filter + doc join)."""
    target = documents.filter("doc_id % 5 = 0")
    got = sorted(
        (r.doc_id, r.text, r.weight)
        for r in dsir_select(documents, target, keep_frac=0.25).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (int(r[0]), r[1], float(r[-1]))
        for r in con.execute(
            dsir_select_sql(
                "SELECT doc_id, text FROM documents",
                "SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0",
            )
        ).fetchall()
    )
    assert got == want
    assert 0 < len(got) < documents.count()
