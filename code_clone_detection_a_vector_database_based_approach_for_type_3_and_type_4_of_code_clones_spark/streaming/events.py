"""Event-stream operators: tumbling-window aggregation (streaming + batch)
and gap-based sessionization.

The reference has no streaming surface (SURVEY SS2.10); these extend the
engine for the training-data-pipeline north star. The batch forms are
oracle-checked (``events_hourly``, ``sessionize`` in __spark_entry__); the
streaming form reuses the same aggregation logic under a watermark.

All event-time arithmetic here is integer epoch-MICROseconds — exact,
timezone-proof, and identical in DuckDB (``epoch_us``). Ingestion goes
through ``sources.events``, which normalizes the fixture's physical ``ts``
type (INT64-ns legacy or parquet timestamp[us]) to epoch-us BIGINT, so the
streaming and batch forms share one unit everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.events import (
    SESSION_GAP_US,
    US_PER_SEC,
    normalize_ts_micros,
    read_events_raw,
)

NS_PER_SEC = 1_000_000_000
SESSION_GAP_NS = 30 * 60 * NS_PER_SEC  # legacy-unit constant (ns twin)


def _event_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream over an events directory with ``ts`` normalized to
    epoch-us BIGINT and an ``event_time`` TIMESTAMP derived from it.

    Streaming sources need an explicit schema; we sniff it from a static
    read of the same directory (which also handles the legacy INT64-ns
    flag), so the stream accepts either physical ``ts`` type.
    """
    static_schema = read_events_raw(spark, events_dir).schema
    reader = spark.readStream.schema(static_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_ts_micros(reader.parquet(events_dir))
    return stream.withColumn("event_time", F.timestamp_micros(F.col("ts")))


def streaming_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window counts per event_type with late-data
    handling. Source: parquet file stream (new files picked up per
    micro-batch); event time derived from the normalized epoch-us column;
    watermark bounds state. Write with ``.writeStream`` +
    ``trigger(availableNow=True)`` for a catch-up batch run (how the test
    drives it).
    """
    with_time = _event_stream(spark, events_dir)
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


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    gap_us: int = SESSION_GAP_US,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming gap sessionization — the stateful twin of
    ``sessionize_batch``, built on ``applyInPandasWithState`` (the custom
    stateful-operator escape hatch for semantics Structured Streaming's
    built-in windows can't express).

    Per user (the grouping key) the state holds the one open session
    ``(start, end, n, sum_value6)``. All ticks are epoch-MICROseconds (the
    normalized ``ts`` unit). Each micro-batch's events are folded in
    event-time order: a gap larger than ``gap_us`` closes the open session
    (emitted immediately, mode append) and starts a new one. The open
    session is emitted when the event-time watermark passes its end + gap
    (``GroupStateTimeout.EventTimeTimeout``) — so results stream out as soon
    as they are final, and state is bounded by the number of users with an
    open session inside the watermark horizon, not by history.

    Output rows match ``sessionize_batch`` minus the per-user ``session_id``
    ordinal (a global ordinal is meaningless under out-of-order arrival;
    ``session_start`` orders sessions within a user).
    """
    import pandas as pd  # noqa: F401 — applyInPandasWithState ships pandas frames
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.ids import round_half_up6

    with_time = _event_stream(
        spark, events_dir, max_files_per_trigger=max_files_per_trigger
    ).withWatermark("event_time", watermark)

    out_schema = (
        "user_id long, session_start long, session_end long, "
        "n_events long, sum_value6 long"
    )
    state_schema = "start long, end long, n long, sv6 long"

    def fold_sessions(key, pdf_iter, state: GroupState):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start, end, n, sv6 = state.get
                closed.append((user_id, start, end, n, sv6))
                state.remove()
        else:
            open_s = list(state.get) if state.exists else None
            for pdf in pdf_iter:
                pdf = pdf.sort_values("ts")
                for ts, v in zip(pdf["ts"].to_numpy(), pdf["value"].to_numpy()):
                    ts = int(ts)
                    # HALF_UP to match the batch twin's F.round (Python's
                    # built-in round() is banker's and diverges on .5 ties)
                    v6 = round_half_up6(float(v))
                    if open_s is None:
                        open_s = [ts, ts, 1, v6]
                    elif ts - open_s[1] > gap_us:
                        closed.append((user_id, *open_s))
                        open_s = [ts, ts, 1, v6]
                    else:
                        open_s[1] = max(open_s[1], ts)
                        open_s[2] += 1
                        open_s[3] += v6
            if open_s is not None:
                state.update(tuple(open_s))
                # close once the watermark passes session_end + gap (ms)
                state.setTimeoutTimestamp((open_s[1] + gap_us) // 1_000 + 1)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "sum_value6"],
            )

    return with_time.groupBy("user_id").applyInPandasWithState(
        fold_sessions,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_ticks: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessionization as a window plan (the batch twin of a
    ``applyInPandasWithState`` streaming sessionizer): a new session starts
    when the gap to the previous event of the same user exceeds
    ``gap_ticks``. Classic lag -> boundary flag -> running sum = session
    index.

    Unit-agnostic: ``ts`` is any integer tick column and ``gap_ticks`` is
    expressed in the same ticks (epoch-us for fixture-derived inputs).
    Output one row per session: ``user_id, session_id, session_start,
    session_end, n_events, sum_value6`` (tick bounds; value summed
    fixed-point for oracle determinism).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = events.withColumn(
        "new_session",
        F.when(
            (F.col("ts") - F.lag("ts").over(w)) > gap_ticks, 1
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


def sessionize_batch_salted(
    events: DataFrame,
    gap_ticks: int = SESSION_GAP_US,
    bucket_ticks: int | None = None,
) -> DataFrame:
    """Skew-proof gap sessionization: identical output to
    ``sessionize_batch`` (per-user 1-based session ids ordered by start),
    with the per-user window cut down to per-(user, time-bucket).

    ``sessionize_batch``'s single window partition per user is the one
    shape AQE cannot split: a hot key (one user with 10^7 events) lands
    one task that sorts and scans alone while 31 cores idle. Salting by a
    coarse TIME BUCKET (``bucket_ticks`` >= ``gap_ticks``, default
    96 x gap = 2 days for a 30-min gap) restores parallelism:

    1. sessionize within (user, bucket) — the hot user's events spread
       over #buckets tasks;
    2. only sessions touching a bucket EDGE (start within ``gap_ticks``
       of the bucket floor, or end within ``gap_ticks`` of the ceiling)
       can merge across buckets — with ``bucket_ticks >= gap_ticks`` an
       empty intervening bucket breaks any chain, so merge candidates are
       <= 2 per (user, bucket). Re-run the same lag -> flag -> cumsum
       sessionization over just those BOUNDARY SESSIONS (a per-user window
       again, but over session summaries bounded by 2 x #buckets, never by
       events) and re-aggregate merged chains;
    3. union untouched interior sessions back in and re-number by start.

    Interval/as-of joins and top-k windows have the same hazard; this is
    the documented salting playbook (PLANS.md "Window-heavy operators")
    landed as a drop-in operator.
    """
    if bucket_ticks is None:
        bucket_ticks = 96 * gap_ticks
    if bucket_ticks < gap_ticks:
        raise ValueError("bucket_ticks must be >= gap_ticks")

    ev = events.withColumn("bucket", F.expr(f"ts div {int(bucket_ticks)}"))
    w = Window.partitionBy("user_id", "bucket").orderBy("ts")
    flagged = ev.withColumn(
        "new_session",
        F.when((F.col("ts") - F.lag("ts").over(w)) > gap_ticks, 1).otherwise(
            F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
        ),
    ).withColumn(
        "sub_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = flagged.groupBy("user_id", "bucket", "sub_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("sum_value6"),
    )
    at_edge = (
        (F.col("session_start") - F.col("bucket") * bucket_ticks) <= gap_ticks
    ) | (
        ((F.col("bucket") + 1) * bucket_ticks - F.col("session_end")) <= gap_ticks
    )
    sess = sess.withColumn("boundary", at_edge)
    interior = sess.filter(~F.col("boundary"))
    boundary = sess.filter(F.col("boundary"))

    wb = Window.partitionBy("user_id").orderBy("session_start")
    chains = boundary.withColumn(
        "new_chain",
        F.when(
            (F.col("session_start") - F.lag("session_end").over(wb)) > gap_ticks, 1
        ).otherwise(F.when(F.lag("session_end").over(wb).isNull(), 1).otherwise(0)),
    ).withColumn(
        "chain_id",
        F.sum("new_chain").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = chains.groupBy("user_id", "chain_id").agg(
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value6").alias("sum_value6"),
    )
    all_sessions = interior.select(
        "user_id", "session_start", "session_end", "n_events", "sum_value6"
    ).unionByName(
        merged.select(
            "user_id", "session_start", "session_end", "n_events", "sum_value6"
        )
    )
    # re-number to the sessionize_batch contract: 1-based per user by start.
    # This window runs over SESSION summaries (bounded per task by sessions,
    # not events) — acceptable residual; emit stable ids.
    wn = Window.partitionBy("user_id").orderBy("session_start")
    return all_sessions.withColumn(
        "session_id", F.row_number().over(wn).cast("long")
    ).select(
        "user_id", "session_id", "session_start", "session_end",
        "n_events", "sum_value6",
    )


def dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication — the streaming twin of
    ``operators.dedup.exact_duplicates`` and the ingest-idempotency analog
    of the reference's collection-exists guard (SURVEY S7, main.py:59-67).

    Content-addresses each document (sha256, the same key the batch dedup
    groups by) and keeps the FIRST arrival per hash;
    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark horizon, so state size tracks the event-time window instead
    of the whole corpus (the unbounded-state variant is a one-line swap to
    ``dropDuplicates``).

    Source schema: ``doc_id long, text string, event_ts timestamp``.
    Output: the deduplicated rows plus their ``content_hash``.
    """
    schema = "doc_id long, text string, event_ts timestamp"
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        stream.withColumn("content_hash", F.sha2(F.col("text"), 256))
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def click_purchase_join_stream(
    spark: SparkSession,
    events_dir: str,
    window_us: int = 12 * 3600 * US_PER_SEC,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked stream-stream interval self-join: each purchase paired
    with the same user's clicks in the preceding ``window_us`` — the
    streaming twin of the batch ``click_attribution`` range-frame window
    (which stays the oracle-checked form).

    Both sides carry a watermark and the join condition bounds ``c_time``
    to ``[p_time - window, p_time]`` ON THE EVENT-TIME COLUMNS — that pair
    is what lets Structured Streaming compute how long each side's state
    must be retained and evict it, so state is bounded by the watermark
    horizon + window, not by the stream's history. (An equivalent predicate
    on the integer ``ts`` columns would be correct but unprovable to the
    state manager — it would keep state forever.)

    Output: ``purchase_id, user_id, p_ts, click_id, c_ts`` (epoch-us), one
    row per qualifying (purchase, click) pair, inner join.
    """
    ev = _event_stream(spark, events_dir, max_files_per_trigger=max_files_per_trigger)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_time").alias("p_time"),
        )
        .withWatermark("p_time", watermark)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_time").alias("c_time"),
        )
        .withWatermark("c_time", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_time") >= F.col("p_time") - F.expr(f"INTERVAL {window_us} MICROSECOND"))
        & (F.col("c_time") <= F.col("p_time"))
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id", "user_id", "p_ts", "click_id", "c_ts"
    )


def streaming_hourly_distinct_registers(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    p: int | None = None,
) -> DataFrame:
    """Streaming HLL register maintenance (r11): per (hour, event_type)
    distinct-USER sketch as a watermark-bounded windowed aggregation —
    ``max`` over the portable-hash rho is associative and monotone, so
    late rows within the watermark fold into existing registers and the
    state per window is bounded at 2^p register rows regardless of event
    volume. The ESTIMATE is deliberately NOT in the stream: readers run
    ``operators.sketch.hll_estimate`` over the register sink (a cheap
    groups-sized batch query), which is the production serving shape —
    the stream maintains the sketch, queries estimate; register tables
    from different streams/shards compose via ``hll_merge``.

    The (bucket, rho) derivation is ``operators.sketch.hll_cols`` — the
    SAME expressions as the batch ``hll_build``, so stream==batch holds
    register-for-register (pinned in tests/test_streaming.py).

    Output (streaming): ``hour TIMESTAMP, event_type, bucket BIGINT,
    reg INT``.
    """
    from ..operators.sketch import HLL_P, hll_cols

    bucket, rho = hll_cols(F.col("user_id").cast("string"), p or HLL_P)
    with_time = _event_stream(spark, events_dir)
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", "1 hour"),
            F.col("event_type"),
            bucket.alias("bucket"),
        )
        .agg(F.max(rho).alias("reg"))
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "bucket",
            "reg",
        )
    )


def hourly_distinct_registers_batch(events: DataFrame,
                                    p: int | None = None) -> DataFrame:
    """Batch twin of ``streaming_hourly_distinct_registers`` over a
    ``ts``-normalized events frame (``sources.events.load_events_micros``):
    identical grouping and identical ``hll_cols`` expressions, so the two
    forms are register-identical on the same input."""
    from ..operators.sketch import HLL_P, hll_cols

    bucket, rho = hll_cols(F.col("user_id").cast("string"), p or HLL_P)
    hour = F.timestamp_micros(
        (F.col("ts") - (F.col("ts") % (3600 * US_PER_SEC))).cast("bigint")
    )
    return (
        events.select(
            hour.alias("hour"),
            "event_type",
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("hour", "event_type", "bucket")
        .agg(F.max("rho").alias("reg"))
    )


# --- streaming value-histogram maintenance (r12) ---------------------------

VHIST_GRID = 1000  # milli-unit value grid: round(value * grid) BIGINT


def value_grid_col(value_col: str = "value",
                   grid: int = VHIST_GRID):
    """The ONE value-quantization expression shared by the streaming and
    batch histogram builders (the ``hll_cols`` convention, so the two
    forms are bucket-identical): half-up rounding of ``value * grid`` to
    BIGINT — Spark's HALF_UP and DuckDB's round() agree on doubles, and
    the single multiply is correctly-rounded IEEE on both engines, so
    the quantized bucket is bit-deterministic cross-engine."""
    return F.round(F.col(value_col) * grid).cast("bigint")


def streaming_hourly_value_histogram(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    grid: int = VHIST_GRID,
) -> DataFrame:
    """Streaming value-histogram maintenance: per (hour, event_type,
    quantized value) COUNT as a watermark-bounded windowed aggregation —
    counts are associative, so late rows within the watermark fold into
    existing buckets. Like the streaming HLL registers, the QUANTILE
    extraction is deliberately not in the stream: readers run
    ``operators.sketch.vhist_quantiles`` over the histogram sink (a
    groups-sized batch query), and histograms from different
    streams/shards compose via ``vhist_merge`` (merge == rebuild EXACT).

    State per window is bounded by the value cardinality ON THE GRID —
    the knob that makes a double-valued column histogram-safe: pick the
    grid so the quantization error you accept bounds the state you hold
    (milli-units by default). Output (streaming): ``hour TIMESTAMP,
    event_type, v BIGINT, c BIGINT``.
    """
    with_time = _event_stream(spark, events_dir)
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", "1 hour"),
            F.col("event_type"),
            value_grid_col("value", grid).alias("v"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .select(F.col("window.start").alias("hour"), "event_type", "v", "c")
    )


def hourly_value_histogram_batch(events: DataFrame,
                                 grid: int = VHIST_GRID) -> DataFrame:
    """Batch twin of ``streaming_hourly_value_histogram`` over a
    ``ts``-normalized events frame: identical grouping and the identical
    ``value_grid_col`` quantization, so the two forms are
    bucket-identical on the same input (pinned in tests)."""
    hour = F.timestamp_micros(
        (F.col("ts") - (F.col("ts") % (3600 * US_PER_SEC))).cast("bigint")
    )
    return (
        events.select(
            hour.alias("hour"),
            "event_type",
            value_grid_col("value", grid).alias("v"),
        )
        .groupBy("hour", "event_type", "v")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
