"""Skew-aware relational helpers (beyond-reference extension).

The reference has no skewed workloads (single-node pandas; SURVEY SS4.1
"Partitioning / shuffle: None"). At 100 TB the canonical hot-key problem is
a grouped count over a Zipf-distributed key (corpus token counts being the
textbook case): one reducer receives the head key's entire partition. Two
mitigations exist in this engine — AQE skew-join/partition splitting
(enabled in session.py) and the explicit two-stage salted aggregation here,
which works even where AQE cannot help (a single group key is ONE map-side
hash bucket regardless of how AQE splits partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_key_counts(df: DataFrame, key: Column | str,
                      salt_buckets: int = 32) -> DataFrame:
    """Count rows per key with two-stage salted aggregation.

    Stage 1 groups by (key, salt) so a hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 merges the ≤ salt_buckets partial
    counts per key. The salt is the task partition id — deterministic for a
    fixed input layout, and irrelevant to the result (it is summed out), so
    the operator stays oracle-replayable as a plain GROUP BY.

    Output: ``key, n_rows``.
    """
    keyed = df.select(F.col(key).alias("key") if isinstance(key, str) else key.alias("key"))
    salted = keyed.withColumn("_salt", F.spark_partition_id() % salt_buckets)
    partial = salted.groupBy("key", "_salt").agg(F.count("*").alias("c"))
    return partial.groupBy("key").agg(F.sum("c").cast("bigint").alias("n_rows"))


def heavy_hitters(df: DataFrame, key: Column | str, n: int = 20,
                  salt_buckets: int = 32) -> DataFrame:
    """Global top-n most frequent keys (count desc, key asc) on top of the
    salted count — plans as TakeOrderedAndProject, no full sort.

    Output: ``key, n_rows, rank``.
    """
    counts = salted_key_counts(df, key, salt_buckets)
    # rank over the already-limited 20-row result: the single-partition
    # window is trivially small; the heavy lifting happened upstream
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(n)
        .withColumn("rank", F.row_number().over(w))
    )
