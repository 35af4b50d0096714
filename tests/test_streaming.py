"""Streaming + sessionization tests (engine extension; SURVEY SS2.10)."""

import shutil

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
    US_PER_SEC,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
    NS_PER_SEC,
    sessionize_batch,
    streaming_hourly_counts,
)

MIN_NS = 60 * NS_PER_SEC   # tick unit the raw test fixtures are written in
MIN_US = 60 * US_PER_SEC   # tick unit the normalized pipeline operates in


def test_sessionize_golden(spark):
    # user 1: events at t=0, 10min, 50min (gap>30min splits) -> 2 sessions
    # user 2: single event -> 1 session
    rows = [
        (1, 0 * MIN_US, 1.0),
        (1, 10 * MIN_US, 2.0),
        (1, 50 * MIN_US, 3.0),
        (2, 5 * MIN_US, 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = {
        (r.user_id, r.session_id): r
        for r in sessionize_batch(ev).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11.n_events == 2
    assert s11.session_start == 0 and s11.session_end == 10 * MIN_US
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

    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {(r.event_type, r.n) for r in got} == {(r.event_type, r.n) for r in want}


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming sessionizer (applyInPandasWithState, event-time timeout)
    emits exactly the batch sessionizer's sessions, except each user's
    still-open trailing session. Three micro-batches (one file each, mtime
    ordered) exercise both closure paths: gap-closure within/across batches
    and watermark-driven timeout of an idle user's open session."""
    import os
    import time as _time

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        sessionize_stream,
    )

    HOUR_NS = 3600 * NS_PER_SEC
    HOUR_US = 3600 * US_PER_SEC
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    batches = [
        # all times offset by +1h: an event AT the initial watermark (t=0)
        # would be dropped as late. user1 opens [1h, 1h10m]; user2 [1h05m]
        [(1, HOUR_NS, 1, "a", 1.0, ""), (2, HOUR_NS + 10 * MIN_NS, 1, "a", 2.0, ""),
         (3, HOUR_NS + 5 * MIN_NS, 2, "a", 4.0, "")],
        # 1h50m closes user1's [1h,1h10m]; 11h closes [1h50m]; user2's
        # 11h05m closes [1h05m]
        [(4, HOUR_NS + 50 * MIN_NS, 1, "a", 3.0, ""), (5, 11 * HOUR_NS, 1, "a", 5.0, ""),
         (6, 11 * HOUR_NS + 5 * MIN_NS, 2, "a", 6.0, "")],
        # 21h advances the watermark to 19h -> user1's idle [11h] session
        # times out (timeout 11h30m < 19h); user2's [11h05m] gap-closes
        [(7, 21 * HOUR_NS, 2, "a", 7.0, "")],
    ]
    events_dir = tmp_path / "sessions_stream"
    events_dir.mkdir()
    now = _time.time()
    all_rows = []
    # plain parquet FILES (not Spark output dirs): the file stream source
    # lists files, and mtime order fixes micro-batch order
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, rows in enumerate(batches):
        all_rows.extend(rows)
        path = str(events_dir / f"batch-{i}.parquet")
        arrays = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(arrays[0], pa.int64()),
                    "ts": pa.array(arrays[1], pa.int64()),
                    "user_id": pa.array(arrays[2], pa.int64()),
                    "event_type": pa.array(arrays[3], pa.string()),
                    "value": pa.array(arrays[4], pa.float64()),
                    "props": pa.array(arrays[5], pa.string()),
                }
            ),
            path,
        )
        os.utime(path, (now + i, now + i))

    out = sessionize_stream(
        spark, str(events_dir), watermark="2 hours", max_files_per_trigger=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value6)
        for r in spark.sql("SELECT * FROM sessions_test").collect()
    }

    # batch twin on the same rows, normalized to the pipeline's epoch-us
    # ticks (fixtures are written ns INT64 — exercising the legacy path)
    ev = spark.createDataFrame(all_rows, schema).withColumn(
        "ts", F.expr("ts div 1000")
    )
    batch_sessions = sessionize_batch(ev).collect()
    # the stream emits every session the batch form finds EXCEPT those still
    # open at the final watermark: trailing per-user sessions whose
    # (end + gap) timeout lies beyond max(event_time) - watermark_delay
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        SESSION_GAP_US,
    )

    final_wm_us = max(r[1] for r in all_rows) // 1000 - 2 * HOUR_US
    last_start = {}
    for r in batch_sessions:
        last_start[r.user_id] = max(last_start.get(r.user_id, -1), r.session_start)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value6)
        for r in batch_sessions
        if r.session_start != last_start[r.user_id]
        or r.session_end + SESSION_GAP_US <= final_wm_us
    }
    assert got == want
    # user1's idle [11h] session was emitted by the event-time TIMEOUT path
    # (no later user1 event ever closed it by gap)
    assert (1, 11 * HOUR_US, 11 * HOUR_US, 1, 5_000_000) in got
    # user2's [21h] session is still open -> not emitted
    assert not any(r[0] == 2 and r[1] == 21 * HOUR_US for r in got)


def test_as_of_join_semantics(spark):
    """Each left row gets the latest right row at-or-before its timestamp
    (ties: right visible at equal ts, max tiebreak id wins); no prior right
    row -> NULLs."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        as_of_join,
    )

    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, 200, 5)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(50, 100, 10), (51, 100, 10), (52, 100, 15), (53, 200, 6)],
        "event_id long, user_id long, ts long",
    )
    out = {
        r.event_id: (r.right_ts, r.right_event_id)
        for r in as_of_join(
            left, right, key="user_id", right_cols=("event_id",),
            right_tiebreak="event_id",
        ).collect()
    }
    assert out[1] == (10, 51)   # equal-ts rights visible; max id 51 wins
    assert out[2] == (15, 52)   # latest at-or-before 20
    assert out[3] == (None, None)  # right row is ts=6 > 5: nothing prior


def test_dedup_stream_keeps_one_row_per_hash(spark, tmp_path):
    import datetime as dt

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        dedup_stream,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # 20 distinct texts, each arriving 3x within the watermark window
    for i in range(20):
        for rep in range(3):
            rows.append(
                (i * 100 + rep, f"document body {i}", base + dt.timedelta(minutes=rep))
            )
    docs_dir = tmp_path / "docs_stream"
    docs_dir.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, event_ts timestamp"
    ).coalesce(1).write.parquet(str(docs_dir / "b0"))

    out = dedup_stream(spark, str(docs_dir / "b0"))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT content_hash, count(*) AS n FROM dedup_test GROUP BY 1")
    rows_out = got.collect()
    assert len(rows_out) == 20          # one survivor per distinct text
    assert all(r.n == 1 for r in rows_out)
    total = spark.sql("SELECT count(*) AS n FROM dedup_test").first().n
    assert total == 20


def test_click_purchase_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval self-join (purchases x same-user clicks within
    the lookback window): under availableNow catch-up, the inner join must
    emit exactly the batch join's pairs — including equal-timestamp clicks
    (closed upper bound) and excluding ones just outside the window."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        click_purchase_join_stream,
    )

    HOUR_US = 3600 * US_PER_SEC
    W = 2 * HOUR_US  # 2h lookback for the test
    # user 1: clicks at 1h, 2h30m, purchase at 3h  -> both qualify (3h-2h=1h)
    #         click at 0h29m59.999999 is OUTSIDE [1h, 3h]
    # user 2: click exactly AT the purchase ts (closed upper bound)
    # user 3: purchase with no clicks -> inner join drops it
    rows = [
        (1, 1 * HOUR_US, 1, "click", 0.0, ""),
        (2, HOUR_US // 2 - 1, 1, "click", 0.0, ""),
        (3, 2 * HOUR_US + 30 * 60 * US_PER_SEC, 1, "click", 0.0, ""),
        (4, 3 * HOUR_US, 1, "purchase", 0.0, ""),
        (5, 5 * HOUR_US, 2, "click", 0.0, ""),
        (6, 5 * HOUR_US, 2, "purchase", 0.0, ""),
        (7, 9 * HOUR_US, 3, "purchase", 0.0, ""),
    ]
    d = tmp_path / "join_stream"
    d.mkdir()
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    out = click_purchase_join_stream(spark, str(d), window_us=W)
    q = (
        out.writeStream.format("memory")
        .queryName("cpjoin_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM cpjoin_test").collect()
    }
    want = {(4, 1), (4, 3), (6, 5)}
    assert got == want
    # sanity: outputs carry exact epoch-us integers
    r = spark.sql("SELECT * FROM cpjoin_test WHERE purchase_id = 6").first()
    assert r.p_ts == 5 * HOUR_US and r.c_ts == 5 * HOUR_US and r.user_id == 2


def test_as_of_join_tolerance(spark):
    """tolerance bounds staleness: a prior right row older than
    left_ts - tolerance must NOT attach (nulls instead); a fresh one must."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        as_of_join,
    )

    left = spark.createDataFrame(
        [(1, 100, 50), (2, 100, 200)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(90, 100, 40)], "event_id long, user_id long, ts long"
    )
    out = {
        r.event_id: (r.right_ts, r.right_event_id)
        for r in as_of_join(
            left, right, key="user_id", right_cols=("event_id",),
            right_tiebreak="event_id", tolerance=20,
        ).collect()
    }
    assert out[1] == (40, 90)        # 50-40=10 <= 20: fresh
    assert out[2] == (None, None)    # 200-40=160 > 20: stale -> nulls


def test_sessionize_salted_equals_plain_on_fixture(spark, sf_dir):
    """The skew-proof salted form must reproduce sessionize_batch exactly
    on the fixture events (all users, all sessions, ids included)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        sessionize_batch_salted,
    )

    ev = load_events_micros(spark, sf_dir).select("user_id", "ts", "value")
    a = sorted(
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events,
         r.sum_value6)
        for r in sessionize_batch(ev).collect()
    )
    b = sorted(
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events,
         r.sum_value6)
        for r in sessionize_batch_salted(ev).collect()
    )
    assert a == b


def test_sessionize_salted_merges_cross_bucket_chains(spark):
    """A single dense session spanning MANY buckets (every inter-event gap
    under the session gap, but crossing bucket edges repeatedly) must come
    back as ONE session — the boundary-session chain merge at work. A
    second user with per-bucket interior sessions keeps the non-merging
    path honest, and a third session sits exactly at a bucket edge."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        sessionize_batch_salted,
    )

    gap = 100
    bucket = 1000  # 10 events per bucket at step 90
    rows = []
    # user 1: one 50-event chain, step 90 < gap, crossing 5 bucket edges
    rows += [(1, 90 * i, 0.001) for i in range(50)]
    # user 2: an interior session per bucket (far from both edges)
    for b in range(3):
        rows += [(2, b * bucket + 450, 0.001), (2, b * bucket + 500, 0.001)]
    # user 3: two events straddling a bucket edge exactly within gap
    rows += [(3, 999, 0.001), (3, 1001, 0.001)]
    # user 3: and a separate later session
    rows += [(3, 5000, 0.001)]
    ev = spark.createDataFrame(
        [(u, t, v) for (u, t, v) in rows], "user_id long, ts long, value double"
    )
    out = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch_salted(ev, gap_ticks=gap, bucket_ticks=bucket).collect()
    }
    assert out[(1, 1)] == (0, 90 * 49, 50)
    assert sum(1 for (u, _s) in out if u == 1) == 1
    assert sum(1 for (u, _s) in out if u == 2) == 3
    assert out[(3, 1)] == (999, 1001, 2)
    assert out[(3, 2)] == (5000, 5000, 1)

    # and the plain form agrees on the same input
    plain = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(ev, gap_ticks=gap).collect()
    }
    assert plain == out


def test_index_ingest_stream_builds_then_upserts(spark, tmp_path, embeddings):
    """Streamed shards land in the SAME persisted IVF index a batch build
    would produce: the first micro-batch bootstraps the centroid bank,
    later batches upsert against it, and the final table equals the cell
    assignment of the full corpus under the stored bank."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _assign_cells,
        ivf_knn_persisted,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.index_ingest import (
        index_ingest_stream,
    )

    shards = str(tmp_path / "shards")
    # 5 ordered shards of 100 vectors (shard i = vec_id in [i*100, i*100+100))
    for i in range(5):
        embeddings.filter(
            (F.col("vec_id") >= i * 100) & (F.col("vec_id") < (i + 1) * 100)
        ).select("vec_id", "embedding").coalesce(1).write.parquet(
            f"{shards}/part{i}"
        )

    index_path = str(tmp_path / "stream_ivf")
    q = (
        index_ingest_stream(
            spark, shards + "/*", index_path, n_centroids=8,
            max_files_per_trigger=1,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored = spark.read.parquet(index_path)
    assert stored.count() == 500

    # ground truth: assign ALL vectors against the STORED centroid bank
    cents = spark.read.parquet(index_path + "_centroids").orderBy("cent_id").collect()
    cent_vecs = [[float(v) for v in r.cent_vec] for r in cents]
    cent_ids = [int(r.cent_id) for r in cents]
    want = {
        (r.result_id, r.cell): tuple(r.vec)
        for r in _assign_cells(
            embeddings, cent_vecs, cent_ids, "vec_id", "embedding"
        ).collect()
    }
    got = {
        (r.vec_id, r.cell): tuple(r.embedding) for r in stored.collect()
    }
    assert got == want

    # and the index is searchable through the normal persisted path
    probes = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert ivf_knn_persisted(spark, index_path, probes, k=5, nprobe=3).count() == 25


def test_index_ingest_bootstrap_is_crash_safe(spark, tmp_path, embeddings):
    """A crash between the data write and the centroid-bank write must not
    brick the stream: the dispatch keys on the bank (the LAST artifact),
    so a replayed first batch re-bootstraps over the half-built data dir."""
    import shutil

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.index_ingest import (
        index_ingest_stream,
    )

    shards = str(tmp_path / "shards2")
    embeddings.limit(200).select("vec_id", "embedding").coalesce(1).write.parquet(
        f"{shards}/part0"
    )
    index_path = str(tmp_path / "crash_ivf")
    # simulate the crash: data directory exists, centroid bank does not
    build_ivf_index(
        spark.read.parquet(f"{shards}/part0"), index_path, n_centroids=4
    )
    shutil.rmtree(index_path + "_centroids")

    q = (
        index_ingest_stream(spark, shards + "/*", index_path, n_centroids=4)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(index_path + "_centroids").count() == 4
    assert spark.read.parquet(index_path).count() == 200


def test_export_stream_matches_batch_and_replay_is_idempotent(
    spark, tmp_path, documents
):
    """Streamed increments land in the deterministic shard layout: the
    union over batches equals the batch exporter's assignment (a doc's
    shard never depends on WHEN it arrived), and replaying a micro-batch
    (the foreachBatch crash contract) rewrites its batch partitions
    instead of duplicating rows."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
        shard_assignment,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.export_stream import (
        export_stream,
    )

    drops = str(tmp_path / "drops")
    docs = documents.select("doc_id", "text")
    n_docs = docs.count()
    for i, pred in enumerate(
        [F.col("doc_id") % 3 == k for k in range(3)]
    ):
        docs.filter(pred).coalesce(1).write.parquet(f"{drops}/drop{i}")

    out = str(tmp_path / "stream_shards")
    q = (
        export_stream(
            spark, drops + "/*", out, n_shards=4, max_files_per_trigger=1
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.parquet(out)
    assert back.count() == n_docs
    got = {r.doc_id: int(r.shard) for r in back.select("doc_id", "shard").collect()}
    want = {r.doc_id: r.shard for r in shard_assignment(docs, 4).collect()}
    assert got == want

    # crash replay: re-run the sink with batch_id 0 and the same rows —
    # dynamic overwrite must rewrite batch=0, not append to it
    import glob

    batches = sorted(
        int(p.rsplit("=", 1)[1]) for p in glob.glob(f"{out}/batch=*")
    )
    b0_docs = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/batch={batches[0]}").select(
            "doc_id"
        ).collect()
    }
    replay = docs.filter(F.col("doc_id").isin(list(b0_docs)))
    # simulate the replay exactly as the streaming runtime does — the
    # same rows re-written under the SAME batch id (the sink body inlined;
    # foreachBatch closures aren't reachable from a built writer)
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.ids import (
        stable_hash64,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.export import (
        ORDER_SALT,
        SHARD_SALT,
    )

    (
        replay.select(
            "*",
            (stable_hash64(F.col("doc_id"), salt=SHARD_SALT) % 4).alias("shard"),
            stable_hash64(F.col("doc_id"), salt=ORDER_SALT).alias("sort_key"),
        )
        .withColumn("batch", F.lit(batches[0]))
        .repartition(4, "shard")
        .sortWithinPartitions("sort_key", "doc_id")
        .drop("sort_key")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "shard")
        .parquet(out)
    )
    back2 = spark.read.parquet(out)
    assert back2.count() == n_docs  # no duplicates after replay
    got2 = {r.doc_id: int(r.shard) for r in back2.select("doc_id", "shard").collect()}
    assert got2 == want


def test_read_shards_as_of_snapshots(spark, tmp_path, documents):
    """batch<=N is a consistent snapshot of the streamed shard layout:
    each as-of read returns exactly the docs of batches 0..N, the latest
    read equals the full corpus, and the snapshot plan prunes on the
    batch partition column."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.export_stream import (
        export_stream,
        read_shards_as_of,
    )

    drops = str(tmp_path / "drops")
    docs = documents.select("doc_id", "text")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            f"{drops}/d{i}"
        )
    out = str(tmp_path / "shards")
    q = (
        export_stream(spark, drops + "/*", out, n_shards=2,
                      max_files_per_trigger=1)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = read_shards_as_of(spark, out)
    assert full.count() == docs.count()
    batches = sorted(r.batch for r in full.select("batch").distinct().collect())
    assert len(batches) == 3
    seen_prev = -1
    for b in batches:
        snap = read_shards_as_of(spark, out, max_batch=b)
        n = snap.count()
        assert n > seen_prev        # snapshots grow monotonically
        seen_prev = n
        # snapshot == union of its own batches, nothing from the future
        assert snap.filter(F.col("batch") > b).count() == 0
    assert seen_prev == docs.count()


def test_quality_annotate_stream_matches_batch(spark, tmp_path, documents):
    """The streaming quality annotator (map-only funnel gates over a file
    stream, exactly-once parquet sink) produces the identical annotation
    the batch expressions produce — same quality/repetition/lang/token
    columns, same quality_ok flag, every doc exactly once."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        language_id,
        quality_score,
        repetition_stats,
        token_stats,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.export_stream import (
        quality_annotate_stream,
    )

    docs = documents.select("doc_id", "text")
    drops = str(tmp_path / "drops")
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(
            f"{drops}/d{i}"
        )
    out = str(tmp_path / "annotated")
    q = (
        quality_annotate_stream(spark, drops + "/*", max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.quality, r.dup_shingle_ratio, r.lang_pred, r.n_tokens,
                   r.quality_ok)
        for r in spark.read.parquet(out).collect()
    }
    rep = repetition_stats(F.col("text"))
    stats = token_stats(F.col("text"))
    want = {
        r.doc_id: (r.quality, r.dsr, r.lang_pred, r.n_tokens,
                   r.quality >= 0.25 and r.dsr <= 0.5)
        for r in docs.select(
            "doc_id",
            quality_score(F.col("text")).alias("quality"),
            rep["dup_shingle_ratio"].alias("dsr"),
            language_id(F.col("text")).alias("lang_pred"),
            stats["n_tokens"].cast("bigint").alias("n_tokens"),
        ).collect()
    }
    assert got == want


def test_read_shards_as_of_committed_only(spark, tmp_path, documents):
    """committed_only=True excludes the highest batch id present — the
    sound default while one batch may be in flight."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.export_stream import (
        export_stream,
        read_shards_as_of,
    )

    drops = str(tmp_path / "drops")
    docs = documents.select("doc_id", "text")
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(
            f"{drops}/d{i}"
        )
    out = str(tmp_path / "shards")
    q = (
        export_stream(spark, drops + "/*", out, n_shards=2,
                      max_files_per_trigger=1)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    full = read_shards_as_of(spark, out)
    safe = read_shards_as_of(spark, out, committed_only=True)
    top = full.agg(F.max("batch")).first()[0]
    assert safe.filter(F.col("batch") >= top).count() == 0
    assert safe.count() == full.filter(F.col("batch") < top).count()


def test_read_shards_as_of_commit_log(spark, tmp_path, documents):
    """checkpoint_dir consults the stream's OWN commit log instead of the
    drop-max heuristic (r5 advice finding: committed_only over-drops the
    final committed batch of a stopped stream, and returns an empty frame
    when exactly one batch exists). After a finished availableNow run,
    every batch is committed, so the commit-log snapshot == the full
    corpus — including the single-batch case committed_only gets wrong."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.export_stream import (
        export_stream,
        last_committed_batch,
        read_shards_as_of,
    )

    drops = str(tmp_path / "drops")
    docs = documents.select("doc_id", "text")
    docs.coalesce(1).write.parquet(f"{drops}/d0")  # ONE batch on disk
    out = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    q = (
        export_stream(spark, drops + "/*", out, n_shards=2)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert last_committed_batch(spark, ckpt) == 0
    # commit log: the single committed batch is IN the snapshot
    snap = read_shards_as_of(spark, out, checkpoint_dir=ckpt)
    assert snap.count() == docs.count()
    # the legacy heuristic on the same state returns an empty frame
    assert read_shards_as_of(spark, out, committed_only=True).count() == 0
    # a checkpoint with no commits yet -> empty, not a crash
    empty_ckpt = str(tmp_path / "never_ran")
    assert (
        read_shards_as_of(spark, out, checkpoint_dir=empty_ckpt).count() == 0
    )
    # racing the FIRST write: out_dir absent + nothing committed -> the
    # schema param yields the documented empty snapshot instead of a
    # PATH_NOT_FOUND crash (r6 review finding)
    ghost = read_shards_as_of(
        spark, str(tmp_path / "not_written_yet"),
        checkpoint_dir=empty_ckpt, schema="doc_id bigint, text string",
    )
    assert ghost.count() == 0
    assert set(ghost.columns) == {"doc_id", "text", "batch"}


def test_lm_score_stream_matches_batch(spark, tmp_path, documents):
    """Streaming LM scoring against a FROZEN model == the batch scorer
    over the union of increments: same n_bigrams and lm_score per doc,
    every doc exactly once, regardless of which increment carried it."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.lm import (
        bigram_lm_scores,
        train_bigram_lm,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.export_stream import (
        lm_score_stream,
    )

    docs = documents.select("doc_id", "text")
    # freeze the model on the even docs (the "training snapshot"); score
    # ALL docs as two stream increments
    model, vocab = train_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    drops = str(tmp_path / "drops")
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(
            f"{drops}/d{i}"
        )
    out = str(tmp_path / "scored")
    writer = lm_score_stream(spark, drops + "/*", model, vocab, out,
                             max_files_per_trigger=1)
    # the frozen model must be persisted by the writer builder (r7
    # ADVICE): otherwise every micro-batch re-runs the full bigram-count
    # training aggregation over the train corpus
    assert model.storageLevel.useMemory and vocab.storageLevel.useMemory
    q = (
        writer
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.n_bigrams, r.lm_score)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_bigrams, r.lm_score)
        for r in bigram_lm_scores(docs, model, vocab).collect()
    }
    assert got == want


def test_streaming_hll_registers_match_batch(spark, tmp_path, sf_dir):
    """r11 streaming HLL twin: the watermark-bounded windowed max over
    (bucket, rho) must equal the batch register build EXACTLY — register
    for register — and the batch estimate over the streamed registers
    must land inside the m=256 error envelope of the exact per-window
    distinct-user count."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        hll_estimate,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        hourly_distinct_registers_batch,
        streaming_hourly_distinct_registers,
    )

    events_dir = tmp_path / "events_hll_stream"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    regs = streaming_hourly_distinct_registers(spark, str(events_dir))
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM hll_regs_test")
    got = {
        (r.hour, r.event_type, r.bucket): r.reg for r in streamed.collect()
    }

    ev = load_events_micros(spark, sf_dir)
    want = {
        (r.hour, r.event_type, r.bucket): r.reg
        for r in hourly_distinct_registers_batch(ev).collect()
    }
    assert got == want  # register-for-register, the hll_cols shared-expr pin

    est = {
        (r.hour, r.event_type): r.est_distinct
        for r in hll_estimate(
            streamed, group_cols=("hour", "event_type")
        ).collect()
    }
    # exact per-window distinct users, computed independently
    from pyspark.sql import functions as FF

    hour = FF.timestamp_micros(
        (FF.col("ts") - (FF.col("ts") % (3600 * 1_000_000))).cast("bigint")
    )
    exact = {
        (r.hour, r.event_type): r.n
        for r in ev.select(hour.alias("hour"), "event_type", "user_id")
        .groupBy("hour", "event_type")
        .agg(FF.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / max(n, 1) < 0.25, (k, est[k], n)


def events_hourly_distinct_sql(p: int = 8) -> str:
    """STAGED r12 graded-entry oracle: per-(hour, event_type)
    distinct-user HLL over the events table (epoch_us hour bucketing) —
    rendered through the SHARED conftest hll_estimate_sql, so this and
    the hll_tokens oracle can never assert different correction math."""
    from conftest import hll_estimate_sql

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.ids import (
        stable_hash64_sql,
    )

    h = stable_hash64_sql("user_id::VARCHAR")
    hashed = (
        "SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,"
        f" event_type, {h} AS h FROM events"
    )
    return hll_estimate_sql(hashed, ["hour_epoch", "event_type"], p)


def test_events_hourly_distinct_matches_duckdb_replay(spark, sf_dir):
    """The staged r12 differential: the batch HLL register build over
    events + hll_estimate vs the full-SQL replay — per-(hour, event_type)
    registers (n_touched, reg_sum) and 6dp estimates value-identical."""
    import duckdb

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        hll_estimate,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        hourly_distinct_registers_batch,
    )

    ev = load_events_micros(spark, sf_dir)
    regs = hourly_distinct_registers_batch(ev)
    est = hll_estimate(regs, group_cols=("hour", "event_type"))
    got = sorted(
        (
            int(r.hour.timestamp()),
            r.event_type,
            r.n_touched,
            r.reg_sum,
            r.est_distinct,
        )
        for r in est.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        (int(a), b, int(c), int(d), float(e))
        for a, b, c, d, e in con.execute(events_hourly_distinct_sql()).fetchall()
    )
    assert got == want


def test_streaming_value_histogram_matches_batch(spark, tmp_path, sf_dir):
    """r12 streaming histogram twin: the watermark-bounded windowed count
    over (hour, event_type, quantized value) must equal the batch
    histogram EXACTLY — bucket for bucket (the shared value_grid_col
    expression, the hll_cols convention) — and quantiles extracted from
    the streamed histogram must match vhist_quantiles over the batch one."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        vhist_quantiles,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        hourly_value_histogram_batch,
        streaming_hourly_value_histogram,
    )

    events_dir = tmp_path / "events_vhist_stream"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")

    hist = streaming_hourly_value_histogram(spark, str(events_dir))
    q = (
        hist.writeStream.format("memory")
        .queryName("vhist_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM vhist_test")
    got = {
        (r.hour, r.event_type, r.v): r.c for r in streamed.collect()
    }
    ev = load_events_micros(spark, sf_dir)
    batch = hourly_value_histogram_batch(ev)
    want = {
        (r.hour, r.event_type, r.v): r.c for r in batch.collect()
    }
    assert got == want  # bucket-for-bucket

    qs = ((1, 2), (9, 10))
    sq = sorted(
        (r.hour, r.event_type, r.q, r.value)
        for r in vhist_quantiles(
            streamed, qs, group_cols=("hour", "event_type")
        ).collect()
    )
    bq = sorted(
        (r.hour, r.event_type, r.q, r.value)
        for r in vhist_quantiles(
            batch, qs, group_cols=("hour", "event_type")
        ).collect()
    )
    assert sq == bq and len(sq) > 0


def test_events_value_quantiles_matches_duckdb_replay(spark, sf_dir):
    """STAGED r13 differential: per-(hour, event_type) value quantiles
    from the batch histogram twin vs the shared vhist renderer's
    full-SQL replay — quantized buckets, exact rank arithmetic, and the
    fixed-order interpolation all value-identical."""
    import duckdb

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        vhist_quantiles,
        vhist_quantiles_duckdb_sql,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (
        load_events_micros,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (
        hourly_value_histogram_batch,
    )

    qs = ((1, 2), (9, 10), (99, 100))
    ev = load_events_micros(spark, sf_dir)
    hist = hourly_value_histogram_batch(ev).select(
        F.col("hour").cast("bigint").alias("hour_epoch"), "event_type", "v", "c"
    )
    got = sorted(
        (r.hour_epoch, r.event_type, r.q, r.value)
        for r in vhist_quantiles(
            hist, qs, group_cols=("hour_epoch", "event_type")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sql = vhist_quantiles_duckdb_sql(
        "SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,"
        " event_type, round(value * 1000)::BIGINT AS v3 FROM events",
        "v3",
        ("hour_epoch", "event_type"),
        qs,
    )
    want = sorted(
        (int(a), b, float(c), float(d))
        for a, b, c, d in con.execute(sql).fetchall()
    )
    assert got == want
    assert len(got) > 0
