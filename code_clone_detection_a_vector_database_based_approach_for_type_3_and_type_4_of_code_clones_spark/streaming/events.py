"""Event-stream operators: tumbling-window aggregation (streaming + batch)
and gap-based sessionization.

The reference has no streaming surface (SURVEY SS2.10); these extend the
engine for the training-data-pipeline north star. The batch forms are
oracle-checked (``events_hourly``, ``sessionize`` in __spark_entry__); the
streaming form reuses the same aggregation logic under a watermark.

The events fixture stores NANOSECOND parquet timestamps; Spark 4 reads
those only as raw INT64 (``spark.sql.legacy.parquet.nanosAsLong``), so all
event-time arithmetic here is integer epoch-ns — exact, timezone-proof,
and identical in DuckDB (``epoch_ns``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NS_PER_SEC = 1_000_000_000
SESSION_GAP_NS = 30 * 60 * NS_PER_SEC  # 30-minute inactivity gap


def streaming_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window counts per event_type with late-data
    handling. Source: parquet file stream (new files picked up per
    micro-batch); event time derived from the ns-epoch column; watermark
    bounds state. Write with ``.writeStream`` + ``trigger(availableNow=True)``
    for a catch-up batch run (how the test drives it).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(events_dir)
    with_time = stream.withColumn(
        "event_time", F.timestamp_seconds(F.col("ts") / NS_PER_SEC)
    )
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_ns: int = SESSION_GAP_NS) -> DataFrame:
    """Gap-based sessionization as a window plan (the batch twin of a
    ``applyInPandasWithState`` streaming sessionizer): a new session starts
    when the gap to the previous event of the same user exceeds ``gap_ns``.
    Classic lag -> boundary flag -> running sum = session index.

    Input needs ``ts`` as epoch-ns BIGINT. Output one row per session:
    ``user_id, session_id, session_start, session_end, n_events, sum_value6``
    (epoch-ns bounds; value summed fixed-point for oracle determinism).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = events.withColumn(
        "new_session",
        F.when(
            (F.col("ts") - F.lag("ts").over(w)) > gap_ns, 1
        ).otherwise(F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("sum_value6"),
    )
