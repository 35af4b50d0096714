"""Streaming + sessionization tests (engine extension; SURVEY SS2.10)."""

import shutil

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
    NS_PER_SEC,
    sessionize_batch,
    streaming_hourly_counts,
)

MIN_NS = 60 * NS_PER_SEC


def test_sessionize_golden(spark):
    # user 1: events at t=0, 10min, 50min (gap>30min splits) -> 2 sessions
    # user 2: single event -> 1 session
    rows = [
        (1, 0 * MIN_NS, 1.0),
        (1, 10 * MIN_NS, 2.0),
        (1, 50 * MIN_NS, 3.0),
        (2, 5 * MIN_NS, 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = {
        (r.user_id, r.session_id): r
        for r in sessionize_batch(ev).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11.n_events == 2
    assert s11.session_start == 0 and s11.session_end == 10 * MIN_NS
    assert s11.sum_value6 == 3_000_000
    assert out[(1, 2)].n_events == 1


def test_streaming_hourly_matches_batch(spark, tmp_path, sf_dir):
    # stream source must be a directory containing only the events files
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    agg = streaming_hourly_counts(spark, str(events_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_type, sum(n_events) AS n FROM hourly_test GROUP BY event_type"
    ).collect()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {(r.event_type, r.n) for r in got} == {(r.event_type, r.n) for r in want}
