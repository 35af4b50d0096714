"""IR-metric evaluation as set-based window/aggregation plans (SURVEY
SS2.4-2.5: A2-A6, W1-W4).

The reference computes Success@k, Precision@k, MRR and MAP@k with sequential
Python loops over each query's score-ordered result list
(bcb_utils.py:179-258, poj_utils.py:185-267). Here the whole metric suite is
ONE job over the kNN output: a window ranks, two aggregations reduce.
No driver-side loop — at 100 TB of results this is a shuffle on query_id
(already the kNN output partitioning) followed by a scalar reduce.

Relevance semantics, both reproduced exactly:
- ``mode="label"``  (POJ): a result is relevant iff it has the query's class
  label (poj_utils.py:188); AP@k normalizes by ``k`` (poj_utils.py:259 —
  nonstandard but preserved).
- ``mode="clones"`` (BCB): relevant iff result id is in the query's
  ground-truth clone array (bcb_utils.py:183); AP@k normalizes by
  ``min(|clones|, k)`` (bcb_utils.py:250, the standard form).

Precision@k keeps denominator ``k`` even though self-exclusion can leave
k-1 rows — exact reference semantics (SURVEY A5).

Determinism note: every ratio is materialized as a 10^6-scaled BIGINT
("fixed point") before any cross-row summation, so aggregate results are
bit-identical regardless of partial-aggregation order — in Spark across
partitions AND against the SQL oracle. Floating-point sums are order-
sensitive in the last ulp; summing exact integers is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000  # fixed-point scale: 6 decimal digits


def detailed_results(
    knn: DataFrame,
    labels: DataFrame,
    mode: str = "label",
    id_col: str = "vec_id",
    label_col: str = "label",
    clones_col: str = "clones",
) -> DataFrame:
    """Label each kNN result row with relevance (SURVEY P4/P5).

    Output: ``query_id, result_id, score, rank, is_clone`` — the Spark form
    of the reference's ``*_detailed_results.csv`` (bcb_utils.py:191-199).
    ``labels`` is the small id->label (or id->clones-array) side and is
    broadcast; the kNN result side never shuffles for this join.
    """
    if mode == "label":
        qlab = labels.select(
            F.col(id_col).alias("query_id"), F.col(label_col).alias("q_label")
        )
        rlab = labels.select(
            F.col(id_col).alias("result_id"), F.col(label_col).alias("r_label")
        )
        return (
            knn.join(F.broadcast(qlab), "query_id")
            .join(F.broadcast(rlab), "result_id")
            .withColumn("is_clone", F.col("q_label") == F.col("r_label"))
            .select("query_id", "result_id", "score", "rank", "is_clone")
        )
    if mode == "clones":
        gt = labels.select(
            F.col(id_col).alias("query_id"), F.col(clones_col).alias("gt_clones")
        )
        return (
            knn.join(F.broadcast(gt), "query_id")
            .withColumn("is_clone", F.array_contains("gt_clones", F.col("result_id")))
            .select("query_id", "result_id", "score", "rank", "is_clone")
        )
    raise ValueError(f"unknown relevance mode: {mode!r}")


def _score6() -> F.Column:
    """Score as an exact 10^6-scaled integer (scores are already rounded to
    6 decimals by the kNN operators)."""
    return F.round(F.col("score") * SCALE).cast("bigint")


def query_stats(detailed: DataFrame) -> DataFrame:
    """Per-query score statistics (SURVEY A2/A3; bcb_utils.py:207-215):
    average similarity over relevant vs non-relevant results (0.0 for empty
    groups, matching the reference) and both counts. Averages are computed
    over fixed-point integers for cross-engine determinism."""
    d = detailed.withColumn("score6", _score6())
    def avg6(cond):
        s = F.sum(F.when(cond, F.col("score6")))
        n = F.sum(F.when(cond, 1))
        return F.round(
            F.coalesce(s / (n.cast("double") * SCALE), F.lit(0.0)), 6
        )
    return d.groupBy("query_id").agg(
        avg6(F.col("is_clone")).alias("avg_clone_score"),
        avg6(~F.col("is_clone")).alias("avg_non_clone_score"),
        F.sum(F.when(F.col("is_clone"), 1).otherwise(0)).cast("bigint").alias("num_clones_found"),
        F.sum(F.when(~F.col("is_clone"), 1).otherwise(0)).cast("bigint").alias("num_non_clones_found"),
    )


def per_query_metrics(
    detailed: DataFrame,
    k: int,
    ap_norm: str = "k",
    gt_sizes: DataFrame | None = None,
) -> DataFrame:
    """Per-query Success@k, P@k, RR and AP@k (SURVEY A4/A5/W2/W3/W4).

    ``ap_norm="k"`` is the POJ normalization; ``ap_norm="gt"`` divides by
    ``min(|clones|, k)`` and requires ``gt_sizes(query_id, gt_size)``.

    Internal fixed-point columns (``n_rel``, ``rr6``, ``ap6``) ride along so
    ``ir_metrics`` can aggregate exactly.
    """
    w = Window.partitionBy("query_id").orderBy("rank")
    running = detailed.withColumn(
        "rel_so_far",
        F.sum(F.col("is_clone").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn(
        "prec6",
        F.when(
            F.col("is_clone"),
            F.round(F.lit(float(SCALE)) * F.col("rel_so_far") / F.col("rank")).cast(
                "bigint"
            ),
        ),
    )
    per_q = running.groupBy("query_id").agg(
        F.max(F.col("is_clone").cast("int")).alias("success"),
        F.sum(F.col("is_clone").cast("int")).cast("bigint").alias("n_rel"),
        F.coalesce(
            F.round(F.lit(float(SCALE)) / F.min(F.when(F.col("is_clone"), F.col("rank")))).cast(
                "bigint"
            ),
            F.lit(0).cast("bigint"),
        ).alias("rr6"),
        F.coalesce(F.sum("prec6"), F.lit(0).cast("bigint")).alias("ap_num6"),
    )
    if ap_norm == "k":
        per_q = per_q.withColumn(
            "ap6", F.round(F.col("ap_num6") / F.lit(k)).cast("bigint")
        )
    elif ap_norm == "gt":
        if gt_sizes is None:
            raise ValueError("ap_norm='gt' requires gt_sizes(query_id, gt_size)")
        per_q = per_q.join(F.broadcast(gt_sizes), "query_id", "left").withColumn(
            "ap6",
            F.when(
                F.coalesce(F.col("gt_size"), F.lit(0)) > 0,
                F.round(F.col("ap_num6") / F.least(F.col("gt_size"), F.lit(k))).cast(
                    "bigint"
                ),
            ).otherwise(F.lit(0).cast("bigint")),
        )
    else:
        raise ValueError(f"unknown ap_norm: {ap_norm!r}")
    return per_q.select(
        "query_id",
        "success",
        "n_rel",
        "rr6",
        "ap6",
        F.round(F.col("n_rel") / F.lit(k), 6).alias("precision_at_k"),
        F.round(F.col("rr6") / F.lit(float(SCALE)), 6).alias("reciprocal_rank"),
        F.round(F.col("ap6") / F.lit(float(SCALE)), 6).alias("ap_at_k"),
    )


def ir_metrics(
    detailed: DataFrame,
    k: int,
    ap_norm: str = "k",
    gt_sizes: DataFrame | None = None,
) -> DataFrame:
    """Global metric row: ``success_rate, mean_precision_at_k, mrr,
    map_at_k`` (bcb_utils.py:255-258; README.md:101-107) — one scalar reduce
    over exact integer carriers (order-independent, oracle-reproducible)."""
    per_q = per_query_metrics(detailed, k, ap_norm=ap_norm, gt_sizes=gt_sizes)
    n = F.count("*").cast("double")
    return per_q.agg(
        F.round(F.sum("success") / n, 6).alias("success_rate"),
        F.round(F.sum("n_rel") / (n * k), 6).alias("mean_precision_at_k"),
        F.round(F.sum("rr6") / (n * SCALE), 6).alias("mrr"),
        F.round(F.sum("ap6") / (n * SCALE), 6).alias("map_at_k"),
    )
