"""PCA reduction (operators/dimred.py): exact projection parity with a
left-to-right Python fold oracle, the DuckDB baked-literal replay
(``pca_sql`` is the STAGED r10 graded-entry oracle), recall of the
reduce-then-rerank kNN against exact, and model canonicalization pins."""

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators import (  # noqa: E402
    dimred,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (  # noqa: E402
    exact_knn,
)

OUT_DIM = 16


@pytest.fixture(scope="module")
def model(embeddings):
    return dimred.train_pca(embeddings, OUT_DIM)


def _arr(vals) -> str:
    return "[" + ",".join(repr(float(v)) for v in vals) + "]"


def pca_sql(model, dim: int = 64) -> str:
    """The staged graded-entry oracle: the identical baked-literal
    projection (center via per-index transform, one list_dot_product per
    output dim — DuckDB's accumulation order matches Spark's fold)."""
    mean, components = model
    mu = _arr(mean)
    comps = ", ".join(
        f"round(list_dot_product(c, {_arr(row)}), 6)" for row in components
    )
    return f"""
SELECT vec_id, [{comps}] AS reduced FROM (
  SELECT vec_id,
         list_transform(range(1, {dim + 1}),
                        i -> embedding[i]::DOUBLE - ({mu})[i]) AS c
  FROM embeddings
)"""


def test_projection_matches_python_fold_oracle(embeddings, model):
    mean, components = model
    got = {
        r.vec_id: list(r.reduced)
        for r in dimred.pca_project(embeddings, mean, components).collect()
    }
    for r in embeddings.collect():
        c = [float(x) - m for x, m in zip(r.embedding, mean)]
        exp = []
        for row in components:
            acc = 0.0
            for x, w in zip(c, row):  # left-to-right, the engine fold order
                acc += x * w
            exp.append(float(np.round(acc * 1e6) / 1e6))
        assert got[r.vec_id] == pytest.approx(exp, abs=0.0), r.vec_id


def test_projection_vectorized_matches_expression_twin(embeddings, model):
    """The r12 NumPy batch kernel must be BIT-identical to the
    baked-literal expression form (same float64 op order + half-up
    rounding) — the contract that lets the graded pca_* entries run the
    fast path."""
    import struct

    mean, components = model
    fast = {
        r.vec_id: list(r.reduced)
        for r in dimred.pca_project(
            embeddings, mean, components, vectorized=True
        ).collect()
    }
    expr = {
        r.vec_id: list(r.reduced)
        for r in dimred.pca_project(
            embeddings, mean, components, vectorized=False
        ).collect()
    }
    assert fast.keys() == expr.keys()
    for k in fast:
        fa = [struct.pack("d", v) for v in fast[k]]
        ea = [struct.pack("d", v) for v in expr[k]]
        assert fa == ea, k


def test_cosine6_exact_pandas_matches_expression(embeddings):
    """The r12 rerank kernel (functions.vector.cosine6_exact_pandas) must
    be bit-identical to the interpreted round(dot/(nq*nv), 6) form on
    real vector pairs."""
    import struct

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.vector import (
        cosine6_exact_pandas,
    )

    a = embeddings.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").cast("array<double>").alias("va"),
    ).filter(F.col("ia") < 60)
    b = embeddings.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").cast("array<double>").alias("vb"),
    ).filter(F.col("ib") < 60)
    pairs = a.crossJoin(b)
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    na = "sqrt(aggregate(va, 0D, (a, x) -> a + x * x))"
    nb = "sqrt(aggregate(vb, 0D, (a, x) -> a + x * x))"
    got = {
        (r.ia, r.ib): r.s
        for r in pairs.select(
            "ia", "ib", cosine6_exact_pandas(F.col("va"), F.col("vb")).alias("s")
        ).collect()
    }
    exp = {
        (r.ia, r.ib): r.s
        for r in pairs.select(
            "ia", "ib", F.expr(f"round({dot} / ({na} * {nb}), 6)").alias("s")
        ).collect()
    }
    assert got.keys() == exp.keys()
    for k in got:
        assert struct.pack("d", got[k]) == struct.pack("d", exp[k]), k


def test_projection_matches_duckdb_replay(embeddings, model, sf_dir):
    got = {
        r.vec_id: list(r.reduced)
        for r in dimred.pca_project(embeddings, *model).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    oracle = {int(v): list(red) for v, red in con.execute(pca_sql(model)).fetchall()}
    assert got == oracle


def test_pca_knn_recall_vs_exact(embeddings):
    probes = embeddings.limit(50).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    exact = {
        (r.query_id, r.result_id)
        for r in exact_knn(probes, embeddings, 10).collect()
    }
    approx = {
        (r.query_id, r.result_id)
        for r in dimred.pca_knn(
            probes, embeddings, 10, out_dim=OUT_DIM, overfetch=16
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # the fixture spectrum is near-flat (worst case for PCA: 16/64 dims
    # hold ~25% of variance) — measured 0.938 here, 0.982 at overfetch 24
    assert recall >= 0.9, recall


def test_components_ordered_and_sign_canonical(embeddings, model):
    mean, components = model
    assert len(components) == OUT_DIM and len(mean) == 64
    # largest-|entry| coordinate positive
    for row in components:
        j = int(np.argmax(np.abs(row)))
        assert row[j] > 0
    # variance along components non-increasing (computed on the same
    # deterministic sample the trainer used)
    X = np.asarray(
        [list(r.embedding) for r in embeddings.orderBy("vec_id").limit(2048).collect()],
        dtype=np.float64,
    )
    Xc = X - X.mean(axis=0)
    var = [float(((Xc @ np.asarray(row)) ** 2).sum()) for row in components]
    assert all(a >= b - 1e-6 for a, b in zip(var, var[1:])), var


def test_model_values_on_micro_grid(model):
    mean, components = model
    for v in mean + [x for row in components for x in row]:
        assert v == float(np.round(v * 1e6) / 1e6)


def test_out_dim_exceeding_input_raises(embeddings):
    with pytest.raises(ValueError):
        dimred.train_pca(embeddings, 65)


def test_pca_ivf_knn_recall_vs_exact(embeddings, model):
    """The PCAR+IVF composition (r10): reduced-space IVF candidates +
    full-dim rerank. Recall floor is looser than pca_knn's — the fixture
    spectrum is near-flat AND nprobe/n_centroids prunes 12/16 of the
    corpus — but must stay useful."""
    probes = embeddings.limit(50).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    exact = {
        (r.query_id, r.result_id)
        for r in exact_knn(probes, embeddings, 10).collect()
    }
    approx = {
        (r.query_id, r.result_id)
        for r in dimred.pca_ivf_knn(
            probes, embeddings, 10, out_dim=OUT_DIM, overfetch=16,
            n_centroids=16, nprobe=4, model=model,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_pca_ivf_persisted_matches_inline(embeddings, model, tmp_path):
    """build_pca_ivf_index + pca_ivf_knn_persisted == the inline
    composition at identical parameters (same model, same lowest-id
    reduced-space bank): the persisted path only changes the physical
    strategy (stored bank + pre-assigned cell partitions), never a row."""
    spark = embeddings.sparkSession
    path = str(tmp_path / "pca_ivf_index")
    stored = dimred.build_pca_ivf_index(
        embeddings, path, out_dim=OUT_DIM, n_centroids=16, model=model
    )
    assert stored == model
    assert dimred.load_pca_model(spark, path) == model
    probes = embeddings.limit(50).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    inline = sorted(
        map(
            tuple,
            dimred.pca_ivf_knn(
                probes, embeddings, 10, out_dim=OUT_DIM, overfetch=8,
                n_centroids=16, nprobe=4, model=model,
            ).collect(),
        )
    )
    persisted = sorted(
        map(
            tuple,
            dimred.pca_ivf_knn_persisted(
                spark, path, probes, embeddings, 10, overfetch=8, nprobe=4
            ).collect(),
        )
    )
    assert inline == persisted
    assert len(inline) == 50 * 10


def pca_ivf_sql(model, n_centroids: int = 16, nprobe: int = 4,
                k: int = 10, overfetch: int = 8, dim: int = 64,
                probe_pred: str = "vec_id < 50") -> str:
    """STAGED r11 graded-entry oracle: the PCAR+IVF composition in full
    ANSI SQL — baked-model projection of both sides, reduced-space IVF
    (lowest-id reduced bank, 6dp-cosine routing/assignment with
    cent-asc ties), per-probe candidates over own cells only, exact
    full-dim rescore of the k*overfetch survivors."""
    mean, components = model
    mu = _arr(mean)
    comps = ", ".join(
        f"round(list_dot_product(c, {_arr(row)}), 6)" for row in components
    )
    cos = lambda a, b: (  # noqa: E731
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
WITH xr AS (
  SELECT vec_id, [{comps}] AS r, v FROM (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           list_transform(range(1, {dim + 1}),
                          i -> embedding[i]::DOUBLE - ({mu})[i]) AS c
    FROM embeddings)
),
cents AS (SELECT vec_id AS cent_id, r AS cv FROM xr ORDER BY vec_id LIMIT {n_centroids}),
assigned AS (
  SELECT vec_id AS result_id, r, cell FROM (
    SELECT x.vec_id, x.r, c.cent_id AS cell,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY {cos('x.r', 'c.cv')} DESC, c.cent_id ASC) AS rnk
    FROM xr x CROSS JOIN cents c
  ) WHERE rnk = 1
),
qx AS (SELECT vec_id AS query_id, r AS qr, v AS qv FROM xr WHERE {probe_pred}),
routed AS (
  SELECT query_id, qr, cell FROM (
    SELECT q.query_id, q.qr, c.cent_id AS cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {cos('q.qr', 'c.cv')} DESC, c.cent_id ASC) AS rnk
    FROM qx q CROSS JOIN cents c
  ) WHERE rnk <= {nprobe}
),
cand AS (
  SELECT query_id, result_id FROM (
    SELECT query_id, result_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rs DESC, result_id ASC) AS rnk
    FROM (
      SELECT r.query_id, a.result_id, {cos('r.qr', 'a.r')} AS rs
      FROM routed r JOIN assigned a ON a.cell = r.cell
      WHERE a.result_id <> r.query_id
    )
  ) WHERE rnk <= {k * overfetch}
),
rescored AS (
  SELECT c.query_id, c.result_id, {cos('q.qv', 'x.v')} AS score
  FROM cand c JOIN qx q ON q.query_id = c.query_id
  JOIN xr x ON x.vec_id = c.result_id
)
SELECT query_id, result_id, score, rank FROM (
  SELECT query_id, result_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, result_id ASC) AS rank
  FROM rescored) WHERE rank <= {k}"""


def test_pca_ivf_matches_duckdb_replay(embeddings, model, sf_dir):
    """The staged r11 differential: pca_ivf_knn vs the full-SQL replay."""
    import duckdb

    probes = embeddings.filter("vec_id < 50").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    got = sorted(
        map(
            tuple,
            dimred.pca_ivf_knn(
                probes, embeddings, 10, out_dim=OUT_DIM, overfetch=8,
                n_centroids=16, nprobe=4, model=model,
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        (int(a), int(b), float(c), int(d))
        for a, b, c, d in con.execute(pca_ivf_sql(model)).fetchall()
    )
    assert got == want
    assert len(got) == 50 * 10
