"""Linear quality filter (operators/classify.py): exact-integer training
parity with a pure-Python oracle, deterministic separation of a planted
low-quality class, class-balance and guard properties, and the STAGED r12
full-SQL differential (features + statically-unrolled training rounds +
final scores — the kmeans_lloyd precedent)."""

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators import (  # noqa: E402
    classify as C,
)

# The planted-twin shape and BOTH SQL renderers live in the engine
# (operators/classify.py — the stable_hash64_sql "adjacent definitions"
# convention) so this differential and the graded-entry oracle in
# __spark_entry__ can never assert different math.
SPAM = C.SPAM_SUFFIX
NEG_BASE = C.PLANTED_NEG_BASE


def _planted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return C.planted_corpus(docs)


def test_training_matches_python_oracle(spark, sf_dir):
    """The trainer's per-round arithmetic is EXACT integers, so a pure-
    Python replay over the collected feature rows must reproduce the
    weight vector bit-for-bit."""
    corpus, labels = _planted(spark, sf_dir)
    feats = C.doc_features(corpus)
    rep: dict = {}
    w6 = C.train_linear_filter(feats, labels, report=rep)

    rows = [
        (int(r.doc_id), [int(r[f"f{j}"]) for j in range(len(C.FEATURES))])
        for r in feats.collect()
    ]
    y = {int(r.doc_id): int(r.y) for r in labels.collect()}
    n_pos = sum(1 for d, _ in rows if y[d] == 1)
    n_neg = len(rows) - n_pos
    k = len(C.FEATURES)
    w = [0] * k
    thresh = C.M6 * C.M6
    viols = []
    for _ in range(C.CLS_ITERS):
        gp, gn, nv = [0] * k, [0] * k, 0
        for d, f in rows:
            dot = sum(w[j] * f[j] for j in range(k))
            if y[d] * dot < thresh:
                nv += 1
                tgt = gp if y[d] == 1 else gn
                for j in range(k):
                    tgt[j] += f[j]
        viols.append(nv)
        for j in range(k):
            step = C._trunc_div(gp[j], n_pos) - C._trunc_div(gn[j], n_neg)
            w[j] += C._trunc_div(step * C.ETA_NUM, C.ETA_DEN)
    assert w6 == w
    assert rep["violations"] == viols
    assert rep["n_pos"] == n_pos and rep["n_neg"] == n_neg


def test_planted_spam_is_separated(spark, sf_dir):
    """Deterministic, so the outcome is pinned, not just bounded: after
    CLS_ITERS balanced rounds the filter must keep essentially all clean
    docs and reject essentially all digit-spam twins."""
    corpus, labels = _planted(spark, sf_dir)
    feats = C.doc_features(corpus)
    w6 = C.train_linear_filter(feats, labels)
    out = C.linear_filter_scores(feats, w6).join(labels, "doc_id")
    agg = out.select(
        F.avg(F.when((F.col("y") == 1) == F.col("keep"), 1.0).otherwise(0.0))
        .alias("acc"),
        F.avg(F.when(F.col("y") == 1, F.col("keep").cast("double"))).alias(
            "pos_kept"
        ),
        F.avg(F.when(F.col("y") == -1, F.col("keep").cast("double"))).alias(
            "neg_kept"
        ),
    ).collect()[0]
    assert agg.acc >= 0.99, agg
    assert agg.pos_kept >= 0.99, agg
    assert agg.neg_kept <= 0.01, agg


def test_single_class_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    feats = C.doc_features(docs)
    labels = docs.select("doc_id", F.lit(1).alias("y"))
    with pytest.raises(ValueError, match="both classes"):
        C.train_linear_filter(feats, labels)


# ------------------------------------------------------------------ SQL


def _features_sql(src: str) -> str:
    """Delegates to the engine's renderer (operators/classify.py)."""
    return C.doc_features_duckdb_sql(src)


def quality_filter_sql(iters: int = C.CLS_ITERS) -> str:
    """Delegates to the engine's graded-entry renderer
    (operators/classify.py::quality_filter_duckdb_sql)."""
    return C.quality_filter_duckdb_sql(iters)


def test_quality_filter_matches_duckdb_replay(spark, sf_dir):
    """The staged r12 differential: features + trained weights + scores
    vs the fully-unrolled SQL replay — every doc's exact integer margin
    and keep decision identical."""
    corpus, labels = _planted(spark, sf_dir)
    feats = C.doc_features(corpus)
    w6 = C.train_linear_filter(feats, labels)
    got = sorted(
        (int(r.doc_id), int(r.score12), bool(r.keep))
        for r in C.linear_filter_scores(feats, w6).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (int(a), int(b), bool(c))
        for a, b, c in con.execute(quality_filter_sql()).fetchall()
    )
    assert got == want


def test_plan_shapes_no_python_udf_no_cartesian(spark, sf_dir):
    """The new operators stay JVM-side and join-shaped: no row-at-a-time
    Python UDF (BatchEvalPython) and no CartesianProduct anywhere in the
    feature build, the scoring projection, or one training round's
    aggregate (the plan-hygiene bar every registry query meets)."""
    corpus, labels = _planted(spark, sf_dir)
    feats = C.doc_features(corpus)
    plans = [
        feats._jdf.queryExecution().executedPlan().toString(),
        C.linear_filter_scores(feats, [1] * len(C.FEATURES))
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
    ]
    for p in plans:
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p


def test_invalid_label_value_raises(spark, sf_dir):
    """r12 input-contract guard: a label outside {+1, -1} (the classic 0)
    would be a perpetual margin violator feeding neither class gradient —
    the trainer must refuse it loudly."""
    corpus, labels = _planted(spark, sf_dir)
    bad = labels.withColumn(
        "y", F.when(F.col("doc_id") % 97 == 0, 0).otherwise(F.col("y"))
    )
    with pytest.raises(ValueError, match="outside"):
        C.train_linear_filter(C.doc_features(corpus), bad, iters=1)


def test_duplicate_label_rows_raise(spark, sf_dir):
    """r12 input-contract guard: duplicate doc_ids in labels fan the join
    out and double-count those documents' gradients — refuse loudly."""
    corpus, labels = _planted(spark, sf_dir)
    dup = labels.unionByName(labels.limit(3))
    with pytest.raises(ValueError, match="fanned out"):
        C.train_linear_filter(C.doc_features(corpus), dup, iters=1)


def test_gradient_bigint_bound_guard(spark, sf_dir, monkeypatch):
    """r12 overflow guard: past GRAD_SAFE_DOCS labeled docs the BIGINT
    per-class gradient sums can wrap silently. The near-overflow round is
    constructed by shrinking the bound under the fixture corpus (red),
    and the documented remediation must be named in the error; the real
    bound passes (green) — every other test in this file."""
    corpus, labels = _planted(spark, sf_dir)
    feats = C.doc_features(corpus)
    monkeypatch.setattr(C, "GRAD_SAFE_DOCS", 10)
    with pytest.raises(ValueError, match="DECIMAL\\(38,0\\)"):
        C.train_linear_filter(feats, labels, iters=1)
    assert (2**63 - 1) // C.M6 > 9_000_000_000_000  # the real bound's scale
