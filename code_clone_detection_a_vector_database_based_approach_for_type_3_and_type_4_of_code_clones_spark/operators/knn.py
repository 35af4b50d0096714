"""kNN similarity join — the engine's core operator (SURVEY J2).

The reference issues one synchronous Qdrant ``search(collection, query,
limit=k)`` per probe inside a Python loop (bcb_utils.py:161-174,
poj_utils.py:174-180, raw client form main3.py:79-83). Here the whole probe
set joins the index in ONE set-based job; the per-query loop disappears.

Three physical strategies behind one logical contract
(query_id, result_id, score, rank; rank = 1-based, score-descending, ties by
result_id ascending, the probe row itself excluded — SURVEY P3/O1/W5):

- ``exact_knn``      pure Catalyst expressions. Broadcast the (small) probe
                     side against the index scan; cosine via higher-order
                     array functions; top-k via window. This is the
                     oracle-reproducible reference plan.
- ``exact_knn_fast`` Arrow/NumPy ``mapInPandas``: probe matrix broadcast to
                     every executor, each index partition does ONE float64
                     matmul and emits only its local top-k per query
                     (Q x k x num_partitions rows), then a final small
                     window picks the global top-k. The 100-TB-shaped plan:
                     the index NEVER shuffles, Python sees each index row
                     once, and the reduce side is O(Q*k*P), not O(Q*N).
- ``ivf_knn``        IVF-style ANN: partition the index into Voronoi cells
                     around centroids, probe only ``nprobe`` cells per query
                     — the scale path analogous to Qdrant's server-side ANN
                     index (HNSW) the reference relies on. Probe routing is
                     collected to the driver (bounded by the reference's
                     500-probe protocol).
- ``ivf_knn_join``   the probe-DISTRIBUTED IVF form: identical results to
                     ``ivf_knn``, but probes never touch the driver — cell
                     routing is a map-side expression on the probe
                     DataFrame and scoring is a cogrouped Arrow matmul per
                     cell. Use it when the probe set itself is a table
                     (e.g. every document probes for self-dedup).

Scores are rounded to ``SCORE_DECIMALS`` BEFORE ranking in every strategy so
rank order is reproducible across engines (Spark, NumPy/BLAS and DuckDB may
differ in the last ulp of a double).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, round_half_up_np

SCORE_DECIMALS = 6


# Scores are rounded to SCORE_DECIMALS before selection, so distinct scores
# differ by >= ~10^-SCORE_DECIMALS. Subtracting (id-rank * eps) with
# eps << that granularity makes a single argpartition respect the
# (score desc, id asc) contract: equal scores separate strictly by rank
# (eps*1 >> double ulp near 1.0), while distinct scores never reorder
# (eps * max_rank <= half the score gap). A plain argpartition on scores
# alone cuts ties at the kk-th rounded score arbitrarily (6-decimal
# rounding makes ties real, e.g. duplicated vectors) and can drop the row
# the global contract and the SQL oracle keep; a full argsort fixes that
# but costs O(n log n * Q) per batch — the composite keeps O(n * Q).
_SCORE_GRANULARITY = 10.0 ** (-SCORE_DECIMALS)


def _tie_eps(n: int) -> float:
    return _SCORE_GRANULARITY / (2.0 * max(n, 1))


def _topk_rows(sims: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Row indices (kk, Q) of the top-kk rows per column of ``sims`` by
    (score desc, id asc) — the same tie-break ``_ranked_topk`` applies
    globally."""
    order = np.argsort(ids, kind="stable")  # id-ascending candidate order
    rank = np.empty(len(ids), dtype=np.float64)
    rank[order] = np.arange(len(ids), dtype=np.float64)
    comp = sims - rank[:, None] * _tie_eps(len(ids))
    return np.argpartition(-comp, kk - 1, axis=0)[:kk, :]


def _topk_cols(
    scores: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k of aligned (Q, M) score/id matrices by
    (score desc, id asc); returns the compacted (Q, k) pair."""
    m = scores.shape[1]
    order = np.argsort(ids, axis=1, kind="stable")
    rank = np.empty_like(scores)
    np.put_along_axis(
        rank, order, np.broadcast_to(np.arange(m, dtype=np.float64), scores.shape), axis=1
    )
    comp = scores - rank * _tie_eps(m)
    sel = np.argpartition(-comp, k - 1, axis=1)[:, :k]
    return (
        np.take_along_axis(scores, sel, axis=1),
        np.take_along_axis(ids, sel, axis=1),
    )


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k contract: rank by rounded score desc, id asc."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("result_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "result_id", "score", "rank")
    )


def exact_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast probes x index scan.

    The probe side (the reference samples 500 queries, main.py:21) is
    explicitly broadcast, so the physical plan is BroadcastNestedLoopJoin:
    the index — the 100 TB side — streams through map tasks with NO shuffle;
    the only shuffled data is the scored candidate set entering the window.
    For very large probe sets, chunk the probes and union (each chunk stays
    under the broadcast limit) or switch to ``ivf_knn``.

    Each side's L2 norm is computed ONCE per row (a pre-join column), not
    per pair: Spark's higher-order folds are interpreted (no whole-stage
    codegen), and re-deriving both norms inside the per-pair cosine made
    the fold count 3x the dot products — measured ~3x wall-clock on a
    500 x 500 cross at 250k pairs. Values are bit-identical (same
    index-order folds, same ``dot/(nq*nx)`` division, same NULL-on-zero
    semantics), so the oracle SQL is unchanged.
    """
    from ..functions.vector import dot, l2_norm

    q = probes.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    ).withColumn("__qn", l2_norm(F.col("query_vec")))
    x = index.select(
        F.col(id_col).alias("result_id"), F.col(vec_col).alias("vec")
    ).withColumn("__xn", l2_norm(F.col("vec")))
    denom = F.col("__qn") * F.col("__xn")
    scored = (
        F.broadcast(q)
        .crossJoin(x)
        .withColumn(
            "score",
            F.round(
                F.when(denom != 0.0, dot(F.col("query_vec"), F.col("vec")) / denom),
                SCORE_DECIMALS,
            ),
        )
        .drop("__qn", "__xn")
    )
    if exclude_self:
        scored = scored.filter(F.col("result_id") != F.col("query_id"))
    return _ranked_topk(scored, k)


def exact_knn_fast(
    probes: DataFrame,
    index: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    probe_block: int = 8192,
) -> DataFrame:
    """Exact cosine top-k via one NumPy matmul per index partition.

    Produces rows identical to ``exact_knn`` (same rounding + tie-break).
    The probe matrix is collected once on the driver (Q x dim floats — 500
    probes x 1024 dims = 2 MB; bounded by the reference's own probe-sample
    design) and shipped in the UDF closure, i.e. a broadcast. Each index
    partition computes sim = Xn @ Qn.T in float64 and keeps only its local
    top-k per query, so executor->shuffle traffic is Q*k per partition
    regardless of partition size.

    Probe sets larger than ``probe_block`` are processed in BLOCKS inside
    the same single index scan: each batch is scored against one block at a
    time, so the similarity matrix is bounded at (batch x probe_block)
    doubles no matter how many probes ship — 10^6 probes against a 10k-row
    Arrow batch would otherwise allocate an 80 GB sim matrix in one go.
    Per-query results are independent, so blocking changes nothing in the
    output. (Past the closure-size ceiling — probes themselves in the GBs —
    the design switches to ``ivf_knn``, not bigger blocks.)
    """
    qrows = (
        probes.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qv"))
        .toPandas()
    )
    # any id type works: BCB uses BIGINT func ids, POJ uses STRING UUIDs
    # (SURVEY SS1.2); numeric ids stay int64 for vectorized comparisons
    id_dt = dict(index.dtypes)[id_col]
    id_np = np.int64 if id_dt in ("bigint", "int", "smallint", "tinyint") else object
    qids = qrows["qid"].to_numpy(dtype=id_np)
    if len(qids) == 0:
        # empty probe set (e.g. every corpus row was dropped upstream):
        # empty result, not a NumPy shape error. result_id takes the INDEX
        # id dtype so the empty schema agrees with the non-empty path even
        # when probe and index id types differ.
        spark = probes.sparkSession
        qid_dt0 = dict(probes.dtypes)[query_id]
        return spark.createDataFrame(
            [], f"query_id {qid_dt0}, result_id {id_dt}, score double, rank int"
        )
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in qrows["qv"]])
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0.0] = 1.0
    qn = qmat / qnorm
    nq = len(qids)
    blocks = [
        (qids[s : s + probe_block], qn[s : s + probe_block])
        for s in range(0, nq, probe_block)
    ]

    out_schema = f"query_id {id_dt}, result_id {id_dt}, score double"

    def topk_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = [
            (
                np.full((len(bq), 0), -np.inf),
                np.full((len(bq), 0), -1 if id_np is np.int64 else None, dtype=id_np),
            )
            for bq, _ in blocks
        ]
        for pdf in batches:
            ids = pdf["rid"].to_numpy(dtype=id_np)
            xmat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            xnorm = np.linalg.norm(xmat, axis=1, keepdims=True)
            xnorm[xnorm == 0.0] = 1.0
            xn = xmat / xnorm  # normalized ONCE per batch, reused per block
            for bi, (bqids, bqn) in enumerate(blocks):
                best_scores, best_ids = state[bi]
                sims = round_half_up_np(xn @ bqn.T, SCORE_DECIMALS)  # (B, Qblock)
                if exclude_self:
                    sims = np.where(ids[:, None] == bqids[None, :], -np.inf, sims)
                kk = min(k, sims.shape[0])
                # local top-k per query within this batch (id-asc tie-break)
                part = _topk_rows(sims, ids, kk)  # (kk, Qblock)
                batch_scores = np.take_along_axis(sims, part, axis=0).T
                batch_ids = ids[part].T
                best_scores = np.concatenate([best_scores, batch_scores], axis=1)
                best_ids = np.concatenate([best_ids, batch_ids], axis=1)
                if best_scores.shape[1] > 4 * k:  # compact running candidates
                    best_scores, best_ids = _topk_cols(best_scores, best_ids, k)
                state[bi] = (best_scores, best_ids)
        for (bqids, _), (best_scores, best_ids) in zip(blocks, state):
            if best_scores.shape[1]:
                if best_scores.shape[1] > k:
                    best_scores, best_ids = _topk_cols(best_scores, best_ids, k)
                qcol = np.repeat(bqids, best_scores.shape[1])
                mask = np.isfinite(best_scores.ravel())
                yield pd.DataFrame(
                    {
                        "query_id": qcol[mask],
                        "result_id": best_ids.ravel()[mask],
                        "score": best_scores.ravel()[mask],
                    }
                )

    candidates = (
        index.select(F.col(id_col).alias("rid"), F.col(vec_col).alias("v"))
        .mapInPandas(topk_partition, schema=out_schema)
    )
    return _ranked_topk(candidates, k)


def self_knn(embeddings: DataFrame, k: int, n_probes: int | None = None,
             fast: bool = False) -> DataFrame:
    """Self-join kNN over the ``embeddings`` fixture: every (or the first
    ``n_probes``) vectors probe the full table, self-excluded — the shape of
    the reference's benchmark loop (bcb_utils.py:150-176)."""
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    if n_probes is not None:
        probes = probes.filter(F.col("query_id") < n_probes)
    fn = exact_knn_fast if fast else exact_knn
    return fn(probes, embeddings, k)


def ivf_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    refine_iters: int = 0,
    refine_sample: int = 2048,
) -> DataFrame:
    """IVF (inverted-file) approximate kNN — the Spark-shaped analog of the
    ANN index Qdrant builds server-side for the reference (SURVEY SS4.1).

    Deterministic centroid choice (the ``n_centroids`` lowest-id vectors)
    keeps the operator fully SQL-replayable. ``refine_iters > 0`` runs that
    many spherical-KMeans (Lloyd, cosine-assignment) rounds on a bounded
    deterministic sample (the ``refine_sample`` lowest-id vectors, driver-
    side NumPy) starting from the same lowest-id init — better-balanced
    cells, identical plan shape, still fully deterministic (np.argmax first-
    max tie-break; empty clusters keep their previous centroid). The SQL
    oracle covers the unrefined default; the refined path is pinned by the
    recall/balance pytest. Index vectors land in the cell of their nearest
    centroid; each probe searches only its ``nprobe`` nearest cells.

    Centroids are always driver-small, so they are collected once and baked
    into the plan as literal arrays: cell assignment and probe routing are
    pure map-side expressions (struct array_max = argmax with cent_id
    tie-break) — NO shuffle, NO window. The only shuffles left are the
    cell-key join and the final top-k. At 100 TB the cell assignment is
    computed once at ingest and persisted as a partition column, so a query
    touches nprobe/n_centroids of the data — partition pruning does the rest.
    """
    assigned, routed = _ivf_assign_route(
        probes, index, n_centroids, nprobe, query_id, query_vec, id_col,
        vec_col, refine_iters, refine_sample,
    )

    # Probe routing is driver-small by design (Q x nprobe rows; the
    # reference samples 500 probes) — collect it once and ship a per-cell
    # probe matrix in the UDF closure, exactly the exact_knn_fast shape:
    # the index side NEVER shuffles, Python sees each index row once, and
    # each (batch, cell) group is scored with ONE float64 matmul instead of
    # a per-candidate-row pandas call (measured ~4x on the bench config).
    # For probe sets too large to collect, use ``ivf_knn_join`` — identical
    # results, probes stay distributed.
    routed_pdf = routed.select("query_id", "query_vec", "cell").toPandas()
    id_dt = dict(index.dtypes)[id_col]
    qid_dt = dict(probes.dtypes)[query_id]
    return _score_with_closure(
        assigned, routed_pdf, k, exclude_self, id_dt, qid_dt, probes.sparkSession
    )


def _score_with_closure(
    assigned: DataFrame,
    routed_pdf: pd.DataFrame,
    k: int,
    exclude_self: bool,
    id_dt: str,
    qid_dt: str,
    spark,
) -> DataFrame:
    """Closure-form IVF scoring: ship the (driver-small) routed probe set in
    the UDF closure and scan ``assigned`` once with a per-(batch, cell)
    matmul — the index side never shuffles."""
    id_np = np.int64 if id_dt in ("bigint", "int", "smallint", "tinyint") else object
    if len(routed_pdf) == 0:
        # result_id takes the index id dtype, mirroring out_schema below
        return spark.createDataFrame(
            [], f"query_id {qid_dt}, result_id {id_dt}, score double, rank int"
        )
    cell_probes: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for cell, grp in routed_pdf.groupby("cell"):
        qids = grp["query_id"].to_numpy(dtype=id_np)
        qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in grp["query_vec"]])
        qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
        qnorm[qnorm == 0.0] = 1.0
        cell_probes[int(cell)] = (qids, qmat / qnorm)

    out_schema = f"query_id {qid_dt}, result_id {id_dt}, score double"

    def score_cells(batches):
        for pdf in batches:
            parts = []
            for cell, grp in pdf.groupby("cell"):
                probe = cell_probes.get(int(cell))
                if probe is None:
                    continue
                qids, qn = probe
                ids = grp["result_id"].to_numpy(dtype=id_np)
                xmat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in grp["vec"]]
                )
                xnorm = np.linalg.norm(xmat, axis=1, keepdims=True)
                xnorm[xnorm == 0.0] = 1.0
                sims = round_half_up_np((xmat / xnorm) @ qn.T, SCORE_DECIMALS)  # (B, Q)
                if exclude_self:
                    sims = np.where(ids[:, None] == qids[None, :], -np.inf, sims)
                # local top-k per query within this (batch, cell) group
                # (id-asc tie-break so ties at the kk-th rounded score keep
                # the row the global contract and the SQL oracle keep)
                kk = min(k, sims.shape[0])
                sel = _topk_rows(sims, ids, kk)  # (kk, Q)
                top_scores = np.take_along_axis(sims, sel, axis=0)  # (kk, Q)
                top_ids = ids[sel]
                mask = np.isfinite(top_scores.ravel(order="F"))
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(qids, kk)[mask],
                            "result_id": top_ids.ravel(order="F")[mask],
                            "score": top_scores.ravel(order="F")[mask],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    candidates = assigned.select("result_id", "vec", "cell").mapInPandas(
        score_cells, schema=out_schema
    )
    # a probe routed to nprobe cells can see the same index row only once
    # (cells partition the index), so no dedup is needed before ranking
    return _ranked_topk(candidates, k)


def _ivf_assign_route(
    probes: DataFrame,
    index: DataFrame,
    n_centroids: int,
    nprobe: int,
    query_id: str,
    query_vec: str,
    id_col: str,
    vec_col: str,
    refine_iters: int,
    refine_sample: int,
    centroids: tuple[list[list[float]], list[int]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared IVF front end: collect the (driver-small) centroid bank, bake
    it into ONE parsed SQL expression, and return the two map-side
    DataFrames every IVF strategy builds on:

    - ``assigned``: ``(result_id, vec, cell)`` — each index row in the cell
      of its nearest centroid (cosine, smallest-cent_id tie-break);
    - ``routed``: ``(query_id, query_vec, cell)`` — each probe exploded to
      its ``nprobe`` nearest cells.

    Both are pure projections (NO shuffle, NO window, NO driver round-trip
    for the data); only the ``n_centroids`` centroid vectors are collected.
    ``centroids`` short-circuits the bank collection with a caller-trained
    ``(cent_vecs, cent_ids)``.
    """
    if centroids is not None:
        cent_vecs, cent_ids = centroids
    else:
        cent_vecs, cent_ids = _centroid_bank(
            index, n_centroids, id_col, vec_col, refine_iters, refine_sample
        )
    assigned = _assign_cells(index, cent_vecs, cent_ids, id_col, vec_col)
    routed = _route_probes(probes, cent_vecs, cent_ids, nprobe, query_id, query_vec)
    return assigned, routed


def _centroid_bank(
    index: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    refine_iters: int = 0,
    refine_sample: int = 2048,
) -> tuple[list[list[float]], list[int]]:
    """Deterministic IVF centroid bank: the ``n_centroids`` lowest-id
    vectors, optionally refined by spherical KMeans on a bounded sample.
    Returns (cent_vecs, cent_ids) — always driver-small by construction."""
    cent_rows = (
        index.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
        .collect()
    )
    cent_vecs = [[float(v) for v in r.cent_vec] for r in cent_rows]
    cent_ids = [int(r.cent_id) for r in cent_rows]
    if refine_iters > 0:
        # spherical KMeans on a bounded deterministic sample: assignment by
        # cosine (normalized argmax, first-max tie-break), mean update,
        # empty clusters keep their previous centroid — all driver-side
        # NumPy on <= refine_sample vectors, so cluster-scale cost is nil
        sample = (
            index.orderBy(F.col(id_col))
            .limit(int(refine_sample))
            .select(F.col(vec_col).alias("v"))
            .collect()
        )
        X = np.asarray([list(r.v) for r in sample], dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        C = np.asarray(cent_vecs, dtype=np.float64)
        for _ in range(refine_iters):
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
            assign = np.argmax(Xn @ Cn.T, axis=1)
            for j in range(C.shape[0]):
                members = X[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        cent_vecs = [[float(v) for v in row] for row in C]
        # cent_ids stay the ORIGINAL lowest-id vec_ids (positions are
        # unchanged by Lloyd updates), so cell identifiers are stable across
        # refined and unrefined modes: a cell-partitioned index written under
        # one mode selects the same directories under the other
    return cent_vecs, cent_ids


def _bank_exprs(
    cent_vecs: list[list[float]], cent_ids: list[int]
) -> tuple[str, str]:
    """Bake the centroid bank into ONE parsed SQL expression pair
    (sims_sql, ids_sql). Per-literal Column construction costs a py4j
    round-trip each — 1000+ lits took ~6 s of driver time to build; one
    expr parse is ms. Centroid norms accumulate left-to-right, matching the
    SQL oracle's list_dot_product accumulation order bit-for-bit."""
    import math

    cnorms = []
    for cv in cent_vecs:
        s = 0.0
        for v in cv:
            s += v * v
        cnorms.append(math.sqrt(s))

    def cos_sql(i: int) -> str:
        arr = "array(" + ",".join(repr(v) + "D" for v in cent_vecs[i]) + ")"
        dot = f"aggregate(zip_with(__vd, {arr}, (x, y) -> x * y), 0D, (a, v) -> a + v)"
        return f"round({dot} / (__vn * {cnorms[i]!r}D), {SCORE_DECIMALS})"

    sims_sql = (
        "array("
        + ",".join(
            f"struct({cos_sql(i)} as sim, {-i} as neg_idx)" for i in range(len(cent_vecs))
        )
        + ")"
    )
    ids_sql = "array(" + ",".join(f"{cid}L" for cid in cent_ids) + ")"
    return sims_sql, ids_sql


def _with_vec_prep(df: DataFrame, vcol: str) -> DataFrame:
    return df.withColumn("__vd", F.col(vcol).cast("array<double>")).withColumn(
        "__vn", F.expr("sqrt(aggregate(__vd, 0D, (a, x) -> a + x * x))")
    )


def _bank_sims_np(V, cent_vecs: list[list[float]]):
    """Rounded centroid-cosine matrix ``(n, K)`` for a float64 row-vector
    batch ``V`` — the NumPy twin of ``_bank_exprs``'s per-centroid
    expression, with the SAME float64 operation order: centroid norms
    accumulate left-to-right in plain Python (exactly the Python loop
    ``_bank_exprs`` bakes its literals from), the dot and vector-norm
    folds run per-dim in index order vectorized across rows, and the
    quotient rounds via ``round_half_up_np`` (the engine-wide vectorized
    rounding convention). Zero-norm vectors raise — the ANSI
    divide-by-zero contract of the expression form."""
    import math

    from ..functions.vector import round_half_up_np

    n, d = V.shape
    vn = np.zeros(n, dtype=np.float64)
    for j in range(d):
        vn = vn + V[:, j] * V[:, j]
    vn = np.sqrt(vn)
    if np.any(vn == 0.0):
        raise ArithmeticError(
            "DIVIDE_BY_ZERO in centroid routing (zero-norm vector)"
        )
    sims = np.empty((n, len(cent_vecs)), dtype=np.float64)
    for i, cv in enumerate(cent_vecs):
        s = 0.0
        for v in cv:
            s += v * v
        cnorm = math.sqrt(s)
        dot = np.zeros(n, dtype=np.float64)
        for j in range(d):
            dot = dot + V[:, j] * float(cv[j])
        sims[:, i] = dot / (vn * cnorm)
    return round_half_up_np(sims, SCORE_DECIMALS)


def _assign_cells(
    index: DataFrame,
    cent_vecs: list[list[float]],
    cent_ids: list[int],
    id_col: str,
    vec_col: str,
    vectorized: bool = True,
) -> DataFrame:
    """Map-side cell assignment: ``(result_id, vec, cell)`` with cell = the
    nearest centroid's cent_id (cosine, smallest-cent_id tie-break —
    struct ordering makes array_max an argmax with that tie-break).

    ``vectorized`` (default, r12): the K x dim cosine bank runs as one
    NumPy batch kernel (``_bank_sims_np`` — same float64 op order and
    rounding as the baked-literal expression, pinned bit-identical by
    tests/test_knn.py); ``np.argmax`` takes the FIRST maximum, which IS
    the struct ordering's smallest-index tie-break. The expression twin
    stays for the equivalence test. Interpreted higher-order folds cost
    ~10-100x on K x dim per row — assignment is a full-corpus pass in
    every Lloyd round and IVF build (guide §4)."""
    selected = index.select(
        F.col(id_col).alias("result_id"), F.col(vec_col).alias("vec")
    )
    if vectorized:
        from pyspark.sql.types import LongType, StructType

        out_schema = StructType(list(selected.schema.fields)).add(
            "cell", LongType()
        )
        ids_arr = np.asarray([int(c) for c in cent_ids], dtype=np.int64)

        def assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    pdf["cell"] = np.array([], dtype=np.int64)
                    yield pdf
                    continue
                from ..functions.vector import stack_vectors

                V = stack_vectors(pdf["vec"], "the index vector column")
                sims = _bank_sims_np(V, cent_vecs)
                pdf["cell"] = ids_arr[np.argmax(sims, axis=1)]
                yield pdf

        return selected.mapInPandas(assign, schema=out_schema)
    sims_sql, ids_sql = _bank_exprs(cent_vecs, cent_ids)
    return _with_vec_prep(selected, "vec").select(
        "result_id",
        "vec",
        F.expr(f"element_at({ids_sql}, -array_max({sims_sql}).neg_idx + 1)").alias("cell"),
    )


def _route_probes(
    probes: DataFrame,
    cent_vecs: list[list[float]],
    cent_ids: list[int],
    nprobe: int,
    query_id: str,
    query_vec: str,
    vectorized: bool = True,
) -> DataFrame:
    """Map-side probe routing: each probe exploded to its ``nprobe`` nearest
    cells — ``(query_id, query_vec, cell)``.

    ``vectorized`` (default, r12): the cosine bank runs as the
    ``_bank_sims_np`` NumPy kernel (bit-identical to the expression twin,
    tests/test_knn.py) and the (sim desc, index asc) ordering is a
    ``np.lexsort`` — the exact semantics of
    ``reverse(array_sort(struct(sim, neg_idx)))``. The expression twin
    stays for the equivalence test. At 10^5+ probes the interpreted
    per-row bank was ~9 s of single-core time on the bench's 100k-probe
    row (guide §4)."""
    q = probes.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    )
    if vectorized:
        from pyspark.sql.types import LongType, StructType

        out_schema = StructType(list(q.schema.fields)).add("cell", LongType())
        ids_arr = np.asarray([int(c) for c in cent_ids], dtype=np.int64)
        take = min(int(nprobe), len(cent_vecs))

        def route(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    pdf["cell"] = np.array([], dtype=np.int64)
                    yield pdf
                    continue
                from ..functions.vector import stack_vectors

                V = stack_vectors(pdf["query_vec"], "the probe vector column")
                sims = _bank_sims_np(V, cent_vecs)
                n, K = sims.shape
                idx_grid = np.broadcast_to(np.arange(K), (n, K))
                # lexsort: last key primary — sim DESC, then index ASC
                order = np.lexsort((idx_grid, -sims), axis=-1)[:, :take]
                cells = ids_arr[order]  # (n, take)
                out = pdf.iloc[np.repeat(np.arange(n), take)].reset_index(
                    drop=True
                )
                out["cell"] = cells.ravel()
                yield out

        return q.mapInPandas(route, schema=out_schema)
    sims_sql, ids_sql = _bank_exprs(cent_vecs, cent_ids)
    return _with_vec_prep(q, "query_vec").select(
        "query_id",
        "query_vec",
        F.explode(
            F.expr(
                f"transform(slice(reverse(array_sort({sims_sql})), 1, {nprobe}), "
                f"s -> element_at({ids_sql}, -s.neg_idx + 1))"
            )
        ).alias("cell"),
    )


def ivf_knn_join(
    probes: DataFrame,
    index: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    refine_iters: int = 0,
    refine_sample: int = 2048,
    index_block: int = 8192,
    max_cell: int | None = None,
    max_cell_probes: int | None = None,
    eager_guards: bool = True,
    centroids: tuple[list[list[float]], list[int]] | None = None,
) -> DataFrame:
    """Probe-DISTRIBUTED IVF kNN: row-identical to ``ivf_knn`` at the same
    parameters, with NO driver round-trip for the probes. ``centroids``
    forwards a caller-trained bank (e.g. ``cluster.kmeans_bank``, or one
    reused across searches by a long-lived service) instead of the
    lowest-id/bounded-refine default.

    ``ivf_knn`` ships the routed probe set in the UDF closure — the right
    shape for the reference's 500-probe benchmark protocol, but a hard
    driver ceiling when the probe side is itself a table (a 10^7-probe
    self-dedup pass where every document probes). This form lifts that
    ceiling:

    - probe->cell routing stays a pure map-side expression (the centroid
      bank is baked into the plan, exactly as in ``ivf_knn``);
    - scoring is ``routed cogroup assigned ON cell`` via
      ``applyInPandas``: per cell, ONE float64 matmul of that cell's probes
      against its members, blocked at ``index_block`` index rows so the sim
      matrix stays bounded regardless of cell size, emitting only the local
      top-k per probe;
    - a final window picks the global top-k from <= nprobe*k candidates
      per probe.

    Scale shape: both sides shuffle ONCE, keyed by cell — sized by the
    probe table + the touched index cells, never |Q|x|N|. Cell skew is the
    watch item: a degenerate cell lands one big cogroup group (AQE cannot
    split it). Two levers, composable: ``refine_iters`` re-balances the
    centroid bank (fixes the cause); ``max_cell`` sub-buckets any cell
    larger than that many index rows on ``pmod(hash(result_id), factor)``
    and cogroups on (cell, bucket) instead (bounds the symptom — scores
    are per-pair, each member lands in exactly one sub-bucket, and the
    final window still picks the global top-k, so results are
    row-identical; pinned by test). Probes of a split cell replicate
    ``factor`` ways — factor = ceil(|cell|/max_cell), only for oversized
    cells. Costs one extra column-pruned pass over the index for the
    per-cell counts (driver-small: <= n_centroids rows). ``ivf_cell_stats``
    is the observability side-channel.

    ``max_cell`` keys off INDEX occupancy only — the converse hot spot is
    a hot-QUERY workload where most PROBES route to one normal-sized cell
    (every query chasing the same popular document): still one cogroup
    group, one task. ``max_cell_probes`` is the symmetric guard — a cell
    whose routed-probe count exceeds it gets ``ceil(n_probes/
    max_cell_probes)`` hash sub-buckets on the query id; probes land in
    one bucket, the cell's members replicate to all of them, every
    (probe, member) pair still scored exactly once, row-identical output
    (pinned by test + the ``skew_stress.py --mode ivf-probe`` identity
    witness). Composable with ``max_cell``: a task is then bounded by
    max_cell members x max_cell_probes probes regardless of either
    flood's size.

    ``eager_guards`` (default) materializes each guard's tiny occupancy
    aggregate at construction, because its two broadcast consumers race a
    lazy persist at action time and would each re-run the counting pass
    (the ngram_jaccard_pairs lesson, 3-5x there). Pass ``False`` from
    pure plan builders that must not execute jobs while composing.
    """
    # routing is a map-side expression and inherits the PROBE frame's
    # parallelism — a degenerate input (one small parquet file, a
    # broadcast-crossJoin product) funnels the whole nprobe x n_centroids
    # cosine routing through ONE core before the cell shuffle spreads the
    # work. The cogroup shuffles both sides anyway, so redistributing a
    # under-partitioned probe table first costs one narrow exchange and
    # buys the full cluster for routing (measured 12.2 s -> ~4 s on the
    # 100k-probe bench row, where routing was 9 s single-threaded). A
    # well-partitioned probe table (the 100 TB case) skips this entirely.
    # The index side's cell ASSIGNMENT has the same hazard for a raw
    # single-file index; the persisted forms don't — assignment is paid
    # once at build_ivf_index.
    probes = _spread_if_file_bound(probes)
    index = _spread_if_file_bound(index)
    assigned, routed = _ivf_assign_route(
        probes, index, n_centroids, nprobe, query_id, query_vec, id_col,
        vec_col, refine_iters, refine_sample, centroids=centroids,
    )
    id_dt = dict(index.dtypes)[id_col]
    qid_dt = dict(probes.dtypes)[query_id]
    return _score_with_cogroup(
        routed, assigned, k, exclude_self, id_dt, qid_dt, index_block,
        max_cell=max_cell, max_cell_probes=max_cell_probes,
        eager_guards=eager_guards,
    )


def ivf_cell_stats(
    index: DataFrame,
    n_centroids: int = 16,
    max_cell: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    refine_sample: int = 2048,
) -> DataFrame:
    """Per-cell occupancy of an IVF layout — the countable side-channel of
    the ``max_cell`` skew guard (the ``bucket_stats`` analog for ANN): a
    degenerate cell (near-duplicate flood, zero-vector sink) is a loud
    data-quality signal here instead of a silent straggler stage.

    ``index`` may be a raw vector table (assignment is computed with the
    same deterministic bank as ``ivf_knn``/``ivf_knn_join``) or an
    already-assigned/persisted table carrying a ``cell`` column (e.g.
    ``spark.read.parquet(build_ivf_index_path)`` — no assignment pass).

    Output: ``cell, n_members`` (+ ``overflow``, ``split_factor`` when
    ``max_cell`` — the factor ``ivf_knn_join(max_cell=...)`` would use).
    """
    if "cell" in index.columns:
        assigned = index
    else:
        cent_vecs, cent_ids = _centroid_bank(
            index, n_centroids, id_col, vec_col, refine_iters, refine_sample
        )
        assigned = _assign_cells(index, cent_vecs, cent_ids, id_col, vec_col)
    out = assigned.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    if max_cell is not None:
        out = out.withColumn("overflow", F.col("n_members") > max_cell)
        out = out.withColumn(
            "split_factor",
            F.greatest(
                F.ceil(F.col("n_members") / F.lit(max_cell)).cast("int"), F.lit(1)
            ),
        )
    return out


def _split_oversized_cells(
    routed: DataFrame, assigned: DataFrame, max_cell: int,
    eager: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The ``max_cell`` sub-bucketing step: count cell occupancy (one
    column-pruned aggregation, <= n_centroids result rows), then give each
    oversized cell ``factor = ceil(n/max_cell)`` hash sub-buckets. Index
    rows land in exactly one sub-bucket (pmod of the id hash); probes of
    that cell replicate to all of them. Cells within bound get factor 1 —
    single bucket 0, plan unchanged up to the constant grouping key.

    The occupancy is a broadcast-joined frame, not a driver collect (a
    review finding against the first, collect-based form). ``eager``
    (default) materializes the tiny aggregate NOW: the two consumers
    (probe side, index side) become concurrent AQE broadcast jobs at
    action time, and a lazy persist loses that race — each job re-derives
    the full counting pass (the ngram_jaccard_pairs finding, measured
    3-5x there). Pass ``eager=False`` only from pure plan builders that
    must not execute anything at construction."""
    from .dedup import persist_bounded

    factors = persist_bounded(
        assigned.groupBy("cell").agg(
            F.greatest(
                F.ceil(F.count("*") / F.lit(max_cell)).cast("int"), F.lit(1)
            ).alias("__factor")
        ),
        eager=eager,
    )
    f = F.coalesce(F.col("__factor"), F.lit(1))
    assigned = (
        assigned.join(F.broadcast(factors), "cell", "left")
        .withColumn("__b", F.pmod(F.hash(F.col("result_id")), f).cast("int"))
        .drop("__factor")
    )
    # explode must stay top-level (generators can't nest in expressions);
    # sequence of ints already yields int elements
    routed = (
        routed.join(F.broadcast(factors), "cell", "left")
        .withColumn("__b", F.explode(F.sequence(F.lit(0), f - F.lit(1))))
        .drop("__factor")
    )
    return routed, assigned


def _split_hot_probe_cells(
    routed: DataFrame,
    assigned: DataFrame,
    max_cell_probes: int,
    count_from: DataFrame,
    eager: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The PROBE-side twin of ``_split_oversized_cells``: a hot-QUERY
    workload (90% of probes routing to one cell — e.g. every query
    near-duplicates one popular document) lands one giant cogroup group
    even when the index cell itself is within ``max_cell``, because that
    guard keys off index occupancy only. Here each cell whose ROUTED PROBE
    count exceeds ``max_cell_probes`` gets ``pfactor =
    ceil(n_probes/max_cell_probes)`` hash sub-buckets: probes land in
    exactly one bucket (pmod of the query-id hash), that cell's index
    members replicate to all of them. A (probe, member) pair therefore
    still meets exactly once, so results stay row-identical (pinned by
    test); replication cost is bounded because the replicated side is an
    index CELL (itself bounded by ``max_cell`` when both guards compose).

    ``count_from`` is the pre-split routed frame — when the index-side
    guard ran first, ``routed`` already carries explode-replicated rows
    (factor per oversized cell) and counting those would overestimate the
    probe flood. The occupancy is a broadcast-joined frame, never a
    driver collect; ``eager`` (default) materializes it before the two
    consumers' concurrent broadcast jobs can race a lazy persist and each
    re-derive the table-sized counting pass — see _split_oversized_cells."""
    from .dedup import persist_bounded

    pfactors = persist_bounded(
        count_from.groupBy("cell").agg(
            F.greatest(
                F.ceil(F.count("*") / F.lit(max_cell_probes)).cast("int"),
                F.lit(1),
            ).alias("__pfactor")
        ),
        eager=eager,
    )
    f = F.coalesce(F.col("__pfactor"), F.lit(1))
    routed = (
        routed.join(F.broadcast(pfactors), "cell", "left")
        .withColumn("__p", F.pmod(F.hash(F.col("query_id")), f).cast("int"))
        .drop("__pfactor")
    )
    assigned = (
        assigned.join(F.broadcast(pfactors), "cell", "left")
        .withColumn("__p", F.explode(F.sequence(F.lit(0), f - F.lit(1))))
        .drop("__pfactor")
    )
    return routed, assigned


def _score_with_cogroup(
    routed: DataFrame,
    assigned: DataFrame,
    k: int,
    exclude_self: bool,
    id_dt: str,
    qid_dt: str,
    index_block: int,
    max_cell: int | None = None,
    max_cell_probes: int | None = None,
    eager_guards: bool = True,
) -> DataFrame:
    """Cogroup-form IVF scoring: ``routed cogroup assigned ON cell``, one
    blocked matmul per cell — both sides shuffle once, nothing touches the
    driver. ``max_cell`` swaps the key to (cell, hash sub-bucket) for
    index-oversized cells; ``max_cell_probes`` adds the probe-side bucket
    for probe-flooded cells — see ``ivf_knn_join``. Composed, a task is
    bounded by max_cell members x max_cell_probes probes."""
    id_np = np.int64 if id_dt in ("bigint", "int", "smallint", "tinyint") else object
    qid_np = (
        np.int64 if qid_dt in ("bigint", "int", "smallint", "tinyint") else object
    )
    # COGROUP KEY TYPES MUST MATCH EXACTLY: routing produces BIGINT cells,
    # but a persisted index's `cell` partition column reads back INT32 —
    # and cogroup alignment hashes each side under its OWN type, silently
    # splitting the same cell value into two never-joined groups (observed
    # at 64 cells/50k rows: 26 of 64 cells misaligned -> probes of those
    # cells returned NOTHING). Comparisons/joins coerce; cogroup does not.
    routed = routed.withColumn("cell", F.col("cell").cast("bigint"))
    assigned = assigned.withColumn("cell", F.col("cell").cast("bigint"))
    out_schema = f"query_id {qid_dt}, result_id {id_dt}, score double"
    empty = pd.DataFrame({"query_id": [], "result_id": [], "score": []})

    def score_cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left: this cell's routed probes; right: this cell's index members.
        # Either side can be empty (cell with no probes / probe routed to a
        # cell that lost all members) -> no candidates from this cell.
        if not len(left) or not len(right):
            return empty
        qids = left["query_id"].to_numpy(dtype=qid_np)
        qmat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in left["query_vec"]]
        )
        qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
        qnorm[qnorm == 0.0] = 1.0
        qn = qmat / qnorm
        best_scores = np.full((len(qids), 0), -np.inf)
        best_ids = np.full(
            (len(qids), 0), -1 if id_np is np.int64 else None, dtype=id_np
        )
        for s in range(0, len(right), index_block):
            chunk = right.iloc[s : s + index_block]
            ids = chunk["result_id"].to_numpy(dtype=id_np)
            xmat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in chunk["vec"]]
            )
            xnorm = np.linalg.norm(xmat, axis=1, keepdims=True)
            xnorm[xnorm == 0.0] = 1.0
            sims = round_half_up_np((xmat / xnorm) @ qn.T, SCORE_DECIMALS)  # (B, Q)
            if exclude_self:
                sims = np.where(ids[:, None] == qids[None, :], -np.inf, sims)
            kk = min(k, sims.shape[0])
            sel = _topk_rows(sims, ids, kk)  # (kk, Q)
            best_scores = np.concatenate(
                [best_scores, np.take_along_axis(sims, sel, axis=0).T], axis=1
            )
            best_ids = np.concatenate([best_ids, ids[sel].T], axis=1)
            if best_scores.shape[1] > 4 * k:  # compact running candidates
                best_scores, best_ids = _topk_cols(best_scores, best_ids, k)
        if best_scores.shape[1] > k:
            best_scores, best_ids = _topk_cols(best_scores, best_ids, k)
        mask = np.isfinite(best_scores.ravel())
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, best_scores.shape[1])[mask],
                "result_id": best_ids.ravel()[mask],
                "score": best_scores.ravel()[mask],
            }
        )

    keys = ["cell"]
    routed_pre_split = routed
    if max_cell is not None:
        routed, assigned = _split_oversized_cells(
            routed, assigned, max_cell, eager=eager_guards
        )
        keys.append("__b")
    if max_cell_probes is not None:
        routed, assigned = _split_hot_probe_cells(
            routed, assigned, max_cell_probes, count_from=routed_pre_split,
            eager=eager_guards,
        )
        keys.append("__p")
    candidates = (
        routed.select("query_id", "query_vec", *keys)
        .groupby(*keys)
        .cogroup(assigned.select("result_id", "vec", *keys).groupby(*keys))
        .applyInPandas(score_cell, schema=out_schema)
    )
    # each probe lives in exactly one (__b-replicated, __p-assigned) group
    # per cell and the index rows it meets there are disjoint across __b —
    # so every (probe, member) pair is scored at most once and the global
    # window below is the exact top-k
    return _ranked_topk(candidates, k)


def build_ivf_index(
    index: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    refine_sample: int = 2048,
    quantize: bool = False,
    mode: str = "overwrite",
    centroids: tuple[list[list[float]], list[int]] | None = None,
) -> None:
    """Persist the IVF index: cell assignment computed ONCE at ingest and
    written as a parquet PARTITION column, the batch analog of the
    server-side ANN index build the reference delegates to Qdrant
    (main.py:59-67; upsert bcb_utils.py:117-121). Searches that route to
    ``nprobe`` cells then read nprobe/n_centroids of the files — partition
    pruning at planning time, before a single byte is scanned.

    Layout: ``{path}/cell=<cent_id>/...`` with columns ``(id_col, vec_col)``
    float32, or ``(id_col, scale float, q array<tinyint>)`` when
    ``quantize`` (int8 codes, ~4x smaller scan; dequantize is a map-side
    projection at load). The centroid bank lands at ``{path}_centroids`` so
    a later session can route probes without touching the data files.

    ``centroids`` (opt-in): a caller-trained ``(cent_vecs, cent_ids)``
    bank — e.g. ``cluster.kmeans_bank`` for FULL-CORPUS Lloyd refinement
    instead of the default bounded-sample refine (``refine_iters``), or a
    bank reused from a sibling index so two indexes share cell identity.
    """
    if centroids is not None:
        cent_vecs, cent_ids = centroids
    else:
        cent_vecs, cent_ids = _centroid_bank(
            index, n_centroids, id_col, vec_col, refine_iters, refine_sample
        )
    assigned = _assign_cells(index, cent_vecs, cent_ids, id_col, vec_col).select(
        F.col("result_id").alias(id_col), F.col("vec").alias(vec_col), "cell"
    )
    if quantize:
        from ..functions.vector import quantize_int8

        qd = quantize_int8(F.col(vec_col))
        assigned = assigned.select(
            id_col,
            qd["scale"].cast("float").alias("scale"),
            F.transform(qd["q"], lambda x: x.cast("tinyint")).alias("q"),
            "cell",
        )
    # co-locate each cell before the write: without this every input
    # partition writes a sliver into every cell directory (P x C small
    # files), and at read time file-listing overhead swamps the pruning
    # win. One exchange at build (paid once) -> one compact file per cell.
    # At larger-than-executor cells, repartition on (cell, bucket) instead.
    assigned.repartition(F.col("cell")).write.mode(mode).partitionBy(
        "cell"
    ).parquet(path)
    spark = index.sparkSession
    # footer-metadata count of what was just written (no data scan): stored
    # with the bank so later sessions' occupancy-scaled overfetch never runs
    # a per-search count job (round-6 advice)
    n_rows = spark.read.parquet(path).count()
    _write_centroid_bank(spark, path, cent_ids, cent_vecs, n_rows, mode)
    # the sidecar always OVERWRITES (even for mode="append" builds, whose
    # n_rows above is already the full post-append count): a stale sidecar
    # left by a previous index generation's upserts must never shadow the
    # rebuilt bank's count
    _write_rowcount_sidecar(spark, path, n_rows)
    _INDEX_ROWCOUNT_CACHE[path] = n_rows


def _write_centroid_bank(spark, path, cent_ids, cent_vecs, n_rows, mode="overwrite"):
    spark.createDataFrame(
        [(cid, cv, n_rows) for cid, cv in zip(cent_ids, cent_vecs)],
        "cent_id long, cent_vec array<double>, n_rows long",
    ).coalesce(1).write.mode(mode).parquet(path + "_centroids")


def _write_rowcount_sidecar(spark, path, n_rows):
    """The mutable half of the index metadata: a 1-row ``{path}_nrows``
    parquet holding the occupancy count ``suggest_overfetch`` reads.

    Split out of the centroid bank deliberately — the bank must stay
    IMMUTABLE after build because ``ingest_batch`` keys its bootstrap-vs-
    upsert replay decision on the bank's existence (a non-atomic bank
    rewrite during upsert would open a crash window where a replayed batch
    re-bootstraps and overwrites the whole index). Losing THIS file in a
    crash window only degrades the overfetch hint (readers fall back to
    the bank's build-time count), never correctness or data."""
    spark.createDataFrame(
        [(int(n_rows),)], "n_rows long"
    ).coalesce(1).write.mode("overwrite").parquet(path + "_nrows")


def _load_centroid_bank(spark, path: str) -> tuple[list[list[float]], list[int]]:
    """Load a ``build_ivf_index`` centroid bank in POSITION order (ascending
    cent_id reproduces the bank order: centroids are the lowest-id vectors
    collected id-ascending, and refinement keeps ids — see _centroid_bank)."""
    cent_rows = spark.read.parquet(path + "_centroids").orderBy("cent_id").collect()
    cent_vecs = [[float(v) for v in r.cent_vec] for r in cent_rows]
    cent_ids = [int(r.cent_id) for r in cent_rows]
    return cent_vecs, cent_ids


# public name: a long-lived query service loads the bank once at startup
# and passes it to ivf_knn_persisted(centroids=...) on every search
load_centroid_bank = _load_centroid_bank

# per-session index row counts for occupancy-scaled overfetch — resolved at
# most once per path and refreshed by build/upsert, so a long-lived query
# service never re-counts (or even re-lists) the index per search
_INDEX_ROWCOUNT_CACHE: dict = {}


def _index_row_count(spark, path: str) -> int:
    """Row count of a persisted IVF index, for ``suggest_overfetch``.
    Resolution order: session cache -> the ``{path}_nrows`` sidecar
    (refreshed by every upsert; the bank itself is immutable after build)
    -> the ``n_rows`` column stored with the centroid bank at build time
    -> (legacy banks only) ONE footer-metadata count, memoized. Never a
    per-search count job (round-6 advice: the overfetch=None default must
    not undercut the centroids fast-path of a long-lived query service)."""
    n = _INDEX_ROWCOUNT_CACHE.get(path)
    if n is None:
        from ..sources.index import index_exists

        if index_exists(spark, path + "_nrows"):
            n = int(spark.read.parquet(path + "_nrows").first()[0])
        else:
            bank = spark.read.parquet(path + "_centroids")
            if "n_rows" in bank.columns:
                n = int(bank.agg(F.max("n_rows")).first()[0])
            else:
                n = spark.read.parquet(path).count()
        _INDEX_ROWCOUNT_CACHE[path] = n
    return n


def upsert_ivf_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_new_ids: bool = False,
) -> list:
    """Incremental maintenance of a ``build_ivf_index`` table — the batch
    analog of the reference's point upsert (Qdrant ``upsert_points``,
    bcb_utils.py:117-121), with REPLACE semantics on ``id_col``.

    New vectors are assigned to cells against the STORED centroid bank
    (``{path}_centroids`` — never recomputed, so cell ids stay stable and
    existing partitions remain valid), and only the AFFECTED cell
    directories are rewritten: existing rows of those cells are read back
    (a partition-pruned scan), rows whose id is being replaced are
    anti-joined out, the union lands via dynamic partition overwrite.
    Affected cells left with ZERO surviving rows (fully drained by a
    cross-cell replacement) are deleted outright — dynamic overwrite only
    rewrites partitions present in the output, so without the explicit
    delete the stale old row would survive as a duplicate id.
    Untouched cells' files are not read, not written, not listed.

    Replace semantics require knowing which cell a replaced id's OLD row
    lives in (a re-embedded vector can migrate cells — leaving the old row
    behind would duplicate the id): a column-pruned (id, cell) scan of the
    index locates old rows of batch ids and adds their cells to the
    affected set. ``assume_new_ids=True`` skips that scan for append-only
    batches (the caller's guarantee), making the cost strictly
    O(|batch| + |affected cells|); with the scan it is
    O(|batch| + |affected cells| + index-id-column scan) — still never a
    vector-column read of untouched cells. Duplicate ids WITHIN one batch
    collapse deterministically to a single row before the write (greatest
    content hash wins), so replayed or multi-shard batches cannot
    double-insert. Quantized indexes (int8 ``build_ivf_index(quantize=True)``)
    are detected from the stored schema and the new batch is quantized with
    the same map-side projection.

    Returns the list of affected cell ids (driver-small: bounded by
    n_centroids), mostly for tests/observability.
    """
    spark = new_vectors.sparkSession
    cent_vecs, cent_ids = _load_centroid_bank(spark, path)

    # deterministic within-batch dedup: one row per id (arbitrary but
    # reproducible winner — greatest content hash, ties by rendered vector)
    w_dedup = Window.partitionBy(F.col(id_col)).orderBy(
        F.desc(F.hash(F.col(vec_col))), F.desc(F.col(vec_col).cast("string"))
    )
    new_vectors = (
        new_vectors.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    assigned = _assign_cells(new_vectors, cent_vecs, cent_ids, id_col, vec_col).select(
        F.col("result_id").alias(id_col), F.col("vec").alias(vec_col), "cell"
    )
    stored_dtypes = dict(spark.read.parquet(path).dtypes)
    if "q" in stored_dtypes:
        from ..functions.vector import quantize_int8

        qd = quantize_int8(F.col(vec_col))
        assigned = assigned.select(
            id_col,
            qd["scale"].cast("float").alias("scale"),
            F.transform(qd["q"], lambda x: x.cast("tinyint")).alias("q"),
            "cell",
        )
    elif "codes" in stored_dtypes:
        # IVFPQ layout (build_pq_index): re-encode the batch under the
        # STORED codebooks — like the stored bank, they never retrain on
        # upsert, so existing code rows stay comparable
        from .pq import load_pq_codebooks, pq_assign_pandas

        books = load_pq_codebooks(spark, path)
        codes = pq_assign_pandas(
            new_vectors, books, id_col=id_col, vec_col=vec_col
        ).select(
            F.col("vec_id").alias(id_col),
            F.transform("codes", lambda c: c.cast("tinyint")).alias("codes"),
        )
        assigned = assigned.select(id_col, "cell").join(codes, id_col).select(
            id_col, "codes", "cell"
        )
    # bounded by n_centroids, so the collect is driver-small by construction
    affected = {
        r.cell for r in assigned.select("cell").distinct().collect()
    }
    if not affected:
        return []
    if not assume_new_ids:
        # old rows of replaced ids may live in OTHER cells (cell migration):
        # locate them with a column-pruned (id, cell) scan so their cells
        # rewrite too — otherwise the stale row survives as a duplicate id
        batch_ids = assigned.select(F.col(id_col).alias("__bid")).distinct()
        old_cells = (
            spark.read.parquet(path)
            .select(id_col, "cell")
            .join(F.broadcast(batch_ids), F.col(id_col) == F.col("__bid"))
            .select("cell")
            .distinct()
            .collect()
        )
        affected |= {r.cell for r in old_cells}
    affected = sorted(affected)

    existing = spark.read.parquet(path).filter(F.col("cell").isin(affected))
    # both inputs of the arithmetic row-count update below are read BEFORE
    # the overwrite mutates the affected cells: the stored pre-upsert total
    # (sidecar/bank — no data scan) and a partition-PRUNED footer count of
    # just the affected cells. Untouched cells stay unlisted/unread, so the
    # documented O(|batch| + |affected cells|) bound holds (a full-index
    # count here would relist every cell directory per micro-batch).
    prev_rows = _index_row_count(spark, path)
    existing_cnt = existing.count()
    survivors = existing.join(
        F.broadcast(assigned.select(F.col(id_col).alias("__rid"))),
        F.col(id_col) == F.col("__rid"),
        "left_anti",
    )
    merged = survivors.select(*assigned.columns).unionByName(assigned)
    # the write target is also a read source of this plan; localCheckpoint
    # materializes the (affected-cells-only, bounded) merge result and cuts
    # the file-source lineage, so the overwrite never reads mid-rewrite
    merged = merged.localCheckpoint(eager=True)
    # dynamic partition overwrite only rewrites cells PRESENT in merged; a
    # cell fully drained by cross-cell replacement (its only rows migrated
    # elsewhere, nothing new landed) would keep its stale files and the
    # replaced id would survive as a duplicate. Record which affected cells
    # merged actually covers so the drained remainder can be deleted below.
    merged_cells = {r.cell for r in merged.select("cell").distinct().collect()}

    conf = spark.conf
    prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # one compact file per rewritten cell, same as the initial build
        merged.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(path)
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    drained = [c for c in affected if c not in merged_cells]
    if drained:
        # drop the drained partitions via the Hadoop FileSystem API (same
        # mechanism dynamic overwrite itself uses to replace directories);
        # bounded by n_centroids, so the driver loop is small by construction
        hconf = spark._jsc.hadoopConfiguration()
        Path = spark._jvm.org.apache.hadoop.fs.Path
        for c in drained:
            part = Path(f"{path}/cell={int(c)}")
            part.getFileSystem(hconf).delete(part, True)
    # refresh the occupancy count ARITHMETICALLY (total - old affected-cell
    # rows + rewritten affected-cell rows; merged is checkpointed so its
    # count is a materialized-block count, no recompute) and land it in the
    # {path}_nrows sidecar. The centroid bank is NOT rewritten: it must
    # stay immutable after build so ingest_batch's bootstrap-vs-upsert
    # replay decision (keyed on bank existence) has no crash window in
    # which a replayed batch could re-bootstrap over the whole index.
    n_rows = prev_rows - existing_cnt + merged.count()
    _write_rowcount_sidecar(spark, path, n_rows)
    _INDEX_ROWCOUNT_CACHE[path] = n_rows
    return affected


def delete_from_ivf_index(
    spark,
    path: str,
    ids,
    id_col: str = "vec_id",
) -> list:
    """Delete ids from a ``build_ivf_index`` table — the REMOVED half of
    an incremental refresh (``snapshot_diff`` routing: added/changed ->
    ``upsert_ivf_index``, removed -> here; the reference's Qdrant index
    supports point deletion the same way, bcb_utils.py:117-121 API
    family). Without it a crawl refresh leaves ghost vectors that keep
    matching queries after their documents are gone.

    Same cost contract as upsert: a column-pruned ``(id, cell)`` scan
    locates the doomed ids' cells, only those cell directories are read
    back and rewritten (survivors anti-join + dynamic partition
    overwrite), cells left empty are deleted outright, untouched cells
    are never read or listed — O(|ids| + |affected cells|). The centroid
    bank is untouched (immutable after build; deleting rows never moves
    a cell boundary) and the ``{path}_nrows`` sidecar updates
    arithmetically.

    ``ids``: a DataFrame carrying ``id_col``, or any Python iterable of
    ints (driver-bounded convenience for small deletion lists).

    Crash-replay contract (same idempotence family as upsert/ingest):
    the commit sequence is (1) dynamic partition overwrite of survivor
    cells, (2) deletion of fully-drained cell directories, (3) ``_nrows``
    sidecar rewrite — so the sidecar is written LAST and never overstates
    completion. A crash between (1) and (3) leaves ghost cells (a cell
    with zero survivors is not overwritten — dynamic overwrite only
    touches partitions it writes rows for) and/or a stale row count;
    RE-INVOKING with the same ids is the repair path: the locate scan
    re-finds the ghosts (their files still hold the doomed ids) and the
    overwrite/drain re-run is idempotent, so the TABLE is exact after the
    retry. The sidecar's arithmetic update cannot see rows the crashed
    attempt already removed from non-drained cells, so after a
    crash-then-retry it may overstate by at most that attempt's |ids| —
    acceptable because the sidecar is an overfetch-sizing HINT
    (``suggest_overfetch``), never a correctness input; rebuild it with
    ``_write_rowcount_sidecar(spark, path, read.parquet(path).count())``
    if exactness is wanted. Deleting ids absent from the index is a
    no-op (returns ``[]``).

    Returns the affected cell ids (driver-small: bounded by n_centroids).
    """
    from pyspark.sql import DataFrame as _DF

    if not isinstance(ids, _DF):
        ids = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} long"
        )
    doomed = ids.select(F.col(id_col).alias("__did")).distinct()

    affected = sorted(
        r.cell
        for r in spark.read.parquet(path)
        .select(id_col, "cell")
        .join(F.broadcast(doomed), F.col(id_col) == F.col("__did"))
        .select("cell")
        .distinct()
        .collect()
    )
    if not affected:
        return []

    existing = spark.read.parquet(path).filter(F.col("cell").isin(affected))
    prev_rows = _index_row_count(spark, path)
    existing_cnt = existing.count()
    survivors = existing.join(
        F.broadcast(doomed), F.col(id_col) == F.col("__did"), "left_anti"
    ).select(*[c for c in existing.columns])
    # write target is a read source: materialize + cut file-source lineage
    # before the overwrite (same contract as upsert)
    survivors = survivors.localCheckpoint(eager=True)
    kept_cells = {r.cell for r in survivors.select("cell").distinct().collect()}

    conf = spark.conf
    prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(path)
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    drained = [c for c in affected if c not in kept_cells]
    if drained:
        hconf = spark._jsc.hadoopConfiguration()
        Path = spark._jvm.org.apache.hadoop.fs.Path
        for c in drained:
            part = Path(f"{path}/cell={int(c)}")
            part.getFileSystem(hconf).delete(part, True)

    n_rows = prev_rows - existing_cnt + survivors.count()
    _write_rowcount_sidecar(spark, path, n_rows)
    _INDEX_ROWCOUNT_CACHE[path] = n_rows
    return affected


def _spread_if_file_bound(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to defaultParallelism ONLY when its parallelism
    is glued to a too-small file set: fewer input files than cores AND no
    Exchange anywhere in the plan. The earlier gauge —
    ``df.rdd.getNumPartitions()`` — is NOT safe here: converting an AQE
    plan to an RDD materializes its intermediate query stages, so a probe
    frame with an upstream shuffle would execute that shuffle once for
    the partition count and again for the real job. Both signals used
    instead are free: ``inputFiles()`` lists the leaf files without a
    job, and the executed-plan STRING is built, not run. A plan with an
    Exchange already runs at spark.sql.shuffle.partitions width; a
    non-file source (no input files) is left untouched."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    # only a SHUFFLE exchange re-spreads partitioning; BroadcastExchange
    # (e.g. the small side of a broadcast crossJoin) leaves the stream
    # side's file-bound partitioning untouched and must not veto the
    # repair
    if re.search(r"(?<!Broadcast)Exchange", plan):
        return df
    return df.repartition(target)


def suggest_overfetch(n_rows: int, n_centroids: int, floor: int = 4,
                      cap: int = 256) -> int:
    """Occupancy-scaled candidate over-fetch for the IVF-PQ + rerank
    composition: ``ceil(rows_per_cell / 2000)`` clamped to [floor, cap].

    The 10M-vector measurement (BASELINE.md round 6) showed overfetch is
    NOT a constant: int8 near-ties crowd the top-k as cells densify, so
    the candidate pool must scale with cell occupancy. Measured
    recall-1.000 minima on the clustered synthetic corpus: ~31k rows/cell
    needs overfetch 16 (2M receipt), ~156k rows/cell needs 64 (10M
    receipt; 16 leaves recall at 0.878). The /2000 divisor sits above
    both anchors with margin; the cap bounds the rerank's f32 working set
    at k x cap candidate rows per probe. Data with a different
    quantization-noise profile should re-anchor with an
    ``ann_recall``-style gauge rather than trust the constant.
    """
    import math

    cell = max(n_rows / max(n_centroids, 1), 1.0)
    return max(floor, min(cap, math.ceil(cell / 2000.0)))


def ivf_knn_persisted(
    spark,
    path: str,
    probes: DataFrame,
    k: int,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    quantized: bool = False,
    rerank_path: str | None = None,
    overfetch: int | None = None,
    centroids: tuple[list[list[float]], list[int]] | None = None,
) -> DataFrame:
    """Search a ``build_ivf_index`` table: route probes against the stored
    centroid bank, then scan ONLY the routed cells' partition directories
    (`PartitionFilters: cell IN (...)` in the physical plan — pruning
    happens at planning time). Scoring is the closure form (the index side
    never shuffles); for table-sized probe sets, load the index yourself
    and use ``ivf_knn_join`` over the pre-assigned ``cell`` column.

    Semantics match ``ivf_knn`` on the same centroid bank: same routing,
    rounding, tie-break — pinned by the equivalence pytest.

    ``rerank_path`` (with ``quantized=True``) is the recall repair for
    int8 at scale: the quantized index serves a cheap over-fetched
    candidate pass (``k * overfetch`` per probe), then candidates are
    re-scored at full precision against the float32 IVF index at
    ``rerank_path`` — the candidate-id set broadcasts (Q x k x overfetch
    rows) and the f32 scan is pruned to the SAME routed cells, so the
    rerank reads nprobe/n_centroids of the f32 files and never shuffles
    them. Final top-k uses the exact scores. ``overfetch=None`` (default)
    sizes the pool from the index's cell occupancy via
    ``suggest_overfetch`` — the 10M-vector measurement showed a constant
    is recall-lossy as cells densify (BASELINE.md r6: overfetch 16 left
    recall at 0.878 where 64 restored 1.000); the row count comes from
    parquet footer metadata, no data scan. This is the standard
    IVF-PQ + refine composition (quantized codes in memory, full vectors
    on disk).

    ``centroids``: a pre-loaded ``_load_centroid_bank`` result. The bank is
    tiny (n_centroids vectors) but loading it is a driver round-trip; a
    long-lived query service loads it once at startup and passes it here —
    per-search work is then one probe-routing collect plus the pruned scan.
    ``None`` (default) loads from ``{path}_centroids`` on every call.
    """
    cent_vecs, cent_ids = (
        centroids if centroids is not None else _load_centroid_bank(spark, path)
    )

    routed_pdf = _route_probes(
        probes, cent_vecs, cent_ids, nprobe, query_id, query_vec
    ).select("query_id", "query_vec", "cell").toPandas()
    needed = sorted({int(c) for c in routed_pdf["cell"]}) if len(routed_pdf) else []

    idx = spark.read.parquet(path).filter(F.col("cell").isin(needed))
    if quantized:
        from ..functions.vector import dequantize_int8

        idx = idx.select(
            id_col,
            dequantize_int8(F.col("q"), F.col("scale").cast("double")).alias(vec_col),
            "cell",
        )
    assigned = idx.select(
        F.col(id_col).alias("result_id"), F.col(vec_col).alias("vec"), "cell"
    )
    qid_dt = dict(probes.dtypes)[query_id]
    id_dt = dict(assigned.dtypes)["result_id"]
    if rerank_path is None:
        return _score_with_closure(
            assigned, routed_pdf, k, exclude_self, id_dt, qid_dt, spark
        )

    # over-fetch from the (cheap, usually quantized) candidate index, then
    # exact-rescore only the candidates against the full-precision table,
    # pruned to the same routed cells
    if overfetch is None:
        # stored/cached count (no per-search job) -> occupancy-scaled pool
        n_rows = _index_row_count(spark, path)
        overfetch = suggest_overfetch(n_rows, max(len(cent_ids), 1))
    cand = _score_with_closure(
        assigned, routed_pdf, k * overfetch, exclude_self, id_dt, qid_dt, spark
    ).select("query_id", "result_id")
    f32 = (
        spark.read.parquet(rerank_path)
        .filter(F.col("cell").isin(needed))
        .select(F.col(id_col).alias("result_id"), F.col(vec_col).alias("vec"))
    )
    q = probes.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    )
    rescored = (
        f32.join(F.broadcast(cand), "result_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "score",
            F.round(
                cosine_similarity(F.col("query_vec"), F.col("vec")),
                SCORE_DECIMALS,
            ),
        )
    )
    return _ranked_topk(rescored, k)


def ivf_knn_join_persisted(
    spark,
    path: str,
    probes: DataFrame,
    k: int,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    quantized: bool = False,
    index_block: int = 8192,
    max_cell: int | None = None,
    max_cell_probes: int | None = None,
    eager_guards: bool = True,
) -> DataFrame:
    """Table-sized probes x persisted IVF index: the full-scale composition.

    ``ivf_knn_persisted`` collects probe routing to the driver;
    ``ivf_knn_join`` recomputes cell assignment from a raw index at query
    time. This form does neither: the centroid bank loads from
    ``{path}_centroids``, probes route map-side (distributed), the index
    scan reads the PRE-ASSIGNED ``cell`` partition column (assignment paid
    once at `build_ivf_index`), and scoring is the cogrouped per-cell
    matmul. With every cell probed (the self-dedup shape) pruning doesn't
    apply — the wins are the skipped assignment pass, cell-locality, and
    no driver round-trip for any side.
    """
    # same degenerate-parallelism repair as ivf_knn_join: routing runs on
    # the probe frame's partitioning, and the cell cogroup re-shuffles
    # immediately after, so spreading a file-bound probe table is one
    # narrow exchange for full-cluster routing (AQE-safe gauge — see
    # _spread_if_file_bound)
    probes = _spread_if_file_bound(probes)
    cent_vecs, cent_ids = _load_centroid_bank(spark, path)
    routed = _route_probes(probes, cent_vecs, cent_ids, nprobe, query_id, query_vec)

    idx = spark.read.parquet(path)
    if quantized:
        from ..functions.vector import dequantize_int8

        idx = idx.select(
            id_col,
            dequantize_int8(F.col("q"), F.col("scale").cast("double")).alias(vec_col),
            "cell",
        )
    assigned = idx.select(
        F.col(id_col).alias("result_id"), F.col(vec_col).alias("vec"), "cell"
    )
    qid_dt = dict(probes.dtypes)[query_id]
    id_dt = dict(assigned.dtypes)["result_id"]
    return _score_with_cogroup(
        routed, assigned, k, exclude_self, id_dt, qid_dt, index_block,
        max_cell=max_cell, max_cell_probes=max_cell_probes,
        eager_guards=eager_guards,
    )
