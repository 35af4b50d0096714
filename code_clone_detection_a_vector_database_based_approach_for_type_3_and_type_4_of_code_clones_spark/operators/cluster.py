"""Distributed Lloyd k-means over the FULL corpus (beyond-reference
extension; BASELINE.json north star: "similarity search ... IVF ... as
the scale path").

The IVF family (operators/knn.py) refines its centroid bank by Lloyd
rounds on a bounded driver-side sample (``refine_iters`` /
``refine_sample`` — knn.py:452) — the right call when 2048 vectors
characterize the distribution. When they don't (multi-domain corpora,
long-tailed clusters), the refine itself must be distributed. This module
runs Lloyd's algorithm as pure DataFrame rounds:

- **Assignment is a map-side projection** — the K x d centroid bank is
  driver-small by definition, so it is baked into one parsed expression
  (the ``_bank_exprs`` pattern): cosine argmax, 6-decimal rounding,
  smallest-cent_id tie-break. The corpus never shuffles for assignment.
- **The update is ONE map-side-combinable aggregation per round**:
  per-cell, per-dimension sums of the 1e6-quantized components
  (``round(1e6 * x_i)`` BIGINT) plus a count — d+1 agg columns over one
  groupBy(cell), so the shuffle carries K x (d+1) partials per map task,
  not data. The driver folds K x d integers into the next bank.
- **The determinism contract is the engine-wide fixed-point convention**
  (operators/lm.py): integer sums are order-independent where double sums
  are not, and the new centroid component is the exact half-away-from-zero
  integer mean ``sign(s) * ((2|s| + n) div (2n)) / 1e6`` — so every round
  is replayable bit-for-bit by the statically-unrolled ANSI-SQL oracle
  (the ``strip_until_clean`` precedent), and centroids live on the 1e-6
  grid after the first update.

Empty cells keep their previous centroid (the knn.py:474 rule);
``cent_id``s are the ORIGINAL lowest-id seed vec_ids throughout, so a
cell-partitioned index built on a corpus-refined bank addresses the same
directories as one built on the seed bank (the knn.py cent_ids
stability note). At 100 TB each round is a linear scan: assignment rides
the same pass as the partial sums, nothing but K x d integers crosses
stages, and ``iters`` is the only cost knob.

``kmeans_lloyd`` returns the graded-entry frame
``(cent_id, cent_vec, n_members)`` — final-bank membership counts;
``kmeans_bank`` returns ``(cent_vecs, cent_ids)`` lists directly
pluggable wherever IVF accepts a centroid bank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import _assign_cells, _bank_exprs  # noqa: F401  (bank reuse)

__all__ = ["kmeans_bank", "kmeans_lloyd"]


def _mean6(s: int, n: int) -> int:
    """Exact half-away-from-zero integer mean of a 1e6-quantized sum —
    the Python driver-side fold twin of the SQL
    ``CASE WHEN s >= 0 THEN (2*s+n) div (2*n) ELSE -((-2*s+n) div (2*n))``."""
    if n == 0:
        raise ValueError("empty cell reaches _mean6")
    return (2 * s + n) // (2 * n) if s >= 0 else -((-2 * s + n) // (2 * n))


def _round_sums(
    index: DataFrame,
    cent_vecs: list[list[float]],
    cent_ids: list[int],
    id_col: str,
    vec_col: str,
    dim: int,
) -> list:
    """One Lloyd round's aggregation: per-cell (count, per-dim quantized
    sums) rows, collected (K rows x d+1 ints — driver-small)."""
    assigned = _assign_cells(index, cent_vecs, cent_ids, id_col, vec_col)
    aggs = [F.count("*").alias("n")] + [
        F.sum(
            F.round(F.element_at(F.col("vec").cast("array<double>"), i + 1) * 1e6)
            .cast("bigint")
        ).alias(f"s{i}")
        for i in range(dim)
    ]
    return assigned.groupBy("cell").agg(*aggs).collect()


def kmeans_bank(
    index: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[int]]:
    """Corpus-scale Lloyd refinement of the deterministic lowest-id seed
    bank. Returns ``(cent_vecs, cent_ids)`` after ``iters`` full-corpus
    rounds — the same shape ``_centroid_bank`` produces, so IVF
    assignment/routing composes unchanged."""
    seed = (
        index.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).cast("array<double>").alias("cent_vec"),
        )
        .collect()
    )
    cent_vecs = [[float(v) for v in r.cent_vec] for r in seed]
    cent_ids = [int(r.cent_id) for r in seed]
    dim = len(cent_vecs[0])
    for _ in range(iters):
        rows = _round_sums(index, cent_vecs, cent_ids, id_col, vec_col, dim)
        by_cell = {int(r.cell): r for r in rows}
        nxt = []
        for cid, prev in zip(cent_ids, cent_vecs):
            r = by_cell.get(cid)
            if r is None or r.n == 0:  # empty cell keeps its centroid
                nxt.append(prev)
            else:
                nxt.append(
                    [_mean6(int(r[f"s{i}"]), int(r.n)) / 1e6 for i in range(dim)]
                )
        cent_vecs = nxt
    return cent_vecs, cent_ids


def kmeans_lloyd(
    index: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full-corpus Lloyd k-means: ``iters`` update rounds, then one final
    assignment pass for membership. Returns
    ``(cent_id, cent_vec array<double>, n_members)`` — cent_vec on the
    1e-6 grid (module contract), n_members under the FINAL bank. The
    whole history is replayable by the statically-unrolled SQL oracle
    (tests/test_cluster.py, staged for a graded entry)."""
    cent_vecs, cent_ids = kmeans_bank(
        index, n_centroids=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
    )
    counts = (
        _assign_cells(index, cent_vecs, cent_ids, id_col, vec_col)
        .groupBy("cell")
        .agg(F.count("*").alias("n_members"))
    )
    spark = index.sparkSession
    bank = spark.createDataFrame(
        list(zip(cent_ids, cent_vecs)), "cent_id bigint, cent_vec array<double>"
    )
    return (
        bank.join(counts, bank.cent_id == counts.cell, "left")
        .select(
            "cent_id",
            "cent_vec",
            F.coalesce(F.col("n_members"), F.lit(0)).cast("bigint").alias("n_members"),
        )
    )
