"""Count-Min sketch: sublinear frequency summaries for heavy-hitter-style
questions at corpus scale (beyond-reference extension).

Spark ships ``F.count_min_sketch``, but it returns an opaque binary blob —
useless for cross-engine verification and awkward to merge outside Spark.
This formulation keeps the sketch RELATIONAL: a ``(row_i, bucket, cnt)``
table of ``d x w`` counters built with the engine-portable
``stable_hash64`` (salted per row), so it is exactly replayable in the
DuckDB oracle, mergeable across corpora by a further groupBy-sum, and
queryable with a plain join.

Scale shape: the build is explode(d) -> groupBy(row_i, bucket) with
map-side partial aggregation — the shuffle carries at most ``d x w``
counters per map partition regardless of corpus size. Estimation joins the
(tiny, broadcastable) sketch against the probe keys and takes ``min`` over
the d rows — the classic CMS upper-bound estimate (never under-counts;
over-counts by collision mass ~ N/w per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ids import stable_hash64

CMS_D = 4      # hash rows
CMS_W = 1024   # buckets per row


def _bucket_array(key: Column, d: int, w: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (stable_hash64(key, salt=f"cms{i}:") % w).alias("bucket"),
            )
            for i in range(d)
        ]
    )


def count_min_build(
    df: DataFrame, key: Column | str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Build the ``d x w`` counter table over one increment per input row.

    Output: ``row_i INT, bucket BIGINT, cnt BIGINT`` (only touched buckets
    materialize; absent buckets are implicitly zero).
    """
    k = F.col(key) if isinstance(key, str) else key
    return (
        df.select(F.explode(_bucket_array(k, d, w)).alias("b"))
        .groupBy(F.col("b.row_i").alias("row_i"), F.col("b.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-estimate the frequency of each probe key: min over the key's
    ``d`` counters (0 when a counter was never touched). The sketch side is
    at most ``d x w`` rows — broadcast it.

    Output: the probe rows + ``est BIGINT`` (>= the true count, always).
    """
    pb = probes.select(
        F.col(key), F.explode(_bucket_array(F.col(key), d, w)).alias("b")
    ).select(key, F.col("b.row_i").alias("row_i"), F.col("b.bucket").alias("bucket"))
    joined = pb.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est")
    )
