"""Incremental near-dedup against history (streaming/dedup_history):
increments filtered against the persisted accepted-corpus band store —
rejection of history dups, within-increment resolution, greedy-prefix
chain semantics, and crash-replay idempotence."""

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.dedup_history import (
    neardup_filter_stream,
    process_increment,
    read_accepted,
)

VOCAB = [f"tok{i:03d}" for i in range(80)]


def _doc(start: int, n: int = 30) -> str:
    return " ".join(VOCAB[start : start + n])


def _distinct(i: int) -> str:
    return " ".join(f"u{i}w{j}" for j in range(30))


def _run_stream(spark, tmp_path, increments, **kwargs):
    drops = str(tmp_path / "drops")
    for i, rows in enumerate(increments):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{drops}/d{i}")
    state = str(tmp_path / "state")
    out = str(tmp_path / "accepted")
    q = (
        neardup_filter_stream(
            spark, drops + "/*", state, out, max_files_per_trigger=1, **kwargs
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return state, out


def test_history_rejection_and_within_batch_resolution(spark, tmp_path):
    """Exact-copy dups: within an increment the keeper election keeps the
    min id; across increments the history match rejects the newcomer; a
    below-threshold sibling survives both gates."""
    body = _doc(0)
    sibling = _doc(10)  # 20-token overlap -> jaccard ~0.47, below 0.8
    inc0 = [(0, body), (1, body), (2, _distinct(2)), (3, _distinct(3))]
    inc1 = [(10, body), (11, sibling), (12, _distinct(12))]
    inc2 = [(20, sibling), (21, _distinct(21))]
    state, out = _run_stream(spark, tmp_path, [inc0, inc1, inc2])

    acc = read_accepted(spark, out)
    got = {r.doc_id: r.batch for r in acc.select("doc_id", "batch").collect()}
    # 1 lost within-batch to 0; 10 and 20 rejected against history
    assert set(got) == {0, 2, 3, 11, 12, 21}
    assert got[0] == 0 and got[11] == 1 and got[21] == 2
    # the band store covers exactly the accepted docs
    band_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{state}/bands").select("doc_id").collect()
    }
    assert band_ids == set(got)


def test_greedy_prefix_chain_semantics(spark, tmp_path):
    """The documented divergence from batch component resolution: A~B and
    B~C (0.87 jaccard) but A!~C (0.75 < 0.8). Incrementally: A accepted,
    B rejected against A, C compared against the ACCEPTED set {A} only ->
    accepted. (The batch funnel's min-label would keep only A.)"""
    a, b, c = _doc(0), _doc(2), _doc(4)
    state, out = _run_stream(
        spark, tmp_path, [[(0, a)], [(1, b)], [(2, c)]]
    )
    got = {r.doc_id for r in read_accepted(spark, out).collect()}
    assert got == {0, 2}


def test_replay_is_idempotent(spark, tmp_path):
    """foreachBatch crash semantics: re-running the LAST batch id over the
    same increment must leave the accepted corpus and the band store
    byte-for-byte identical — the batch<current filter means a replay
    never sees its own half-written state and self-rejects."""
    body = _doc(0)
    inc0 = [(0, body), (1, _distinct(1))]
    inc1 = [(10, body), (11, _distinct(11))]
    state, out = _run_stream(spark, tmp_path, [inc0, inc1])

    before = sorted(
        (r.doc_id, r.text, r.batch) for r in read_accepted(spark, out).collect()
    )
    bands_before = sorted(
        map(tuple, spark.read.parquet(f"{state}/bands").collect())
    )

    replay = spark.createDataFrame(inc1, "doc_id long, text string")
    process_increment(replay, 1, state, out)

    after = sorted(
        (r.doc_id, r.text, r.batch) for r in read_accepted(spark, out).collect()
    )
    bands_after = sorted(
        map(tuple, spark.read.parquet(f"{state}/bands").collect())
    )
    assert after == before
    assert bands_after == bands_before
    # and the replayed batch still rejected the history dup
    assert {d for d, _, _ in after} == {0, 1, 11}


def test_single_increment_matches_batch_funnel(spark, tmp_path):
    """With ONE increment there is no history, so the result must equal
    the batch pipeline's own resolution (LSH -> jaccard -> keeper
    election) over the same docs."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (
        duplicate_groups,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    rows = [(0, _doc(0)), (1, _doc(0)), (2, _doc(2)), (3, _distinct(3)),
            (4, _distinct(4))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "state")
    out = str(tmp_path / "accepted")
    process_increment(docs, 0, state, out)
    got = {r.doc_id for r in read_accepted(spark, out).collect()}

    pairs = ngram_jaccard_pairs(
        docs, lsh_candidate_pairs(docs), eager_persist=False
    ).filter(F.col("jaccard") >= 0.8)
    losers = {
        r.doc_id
        for r in duplicate_groups(pairs, until_converged=True)
        .filter(~F.col("is_keeper"))
        .collect()
    }
    want = {d for d, _ in rows} - losers
    assert got == want


def test_colliding_doc_id_does_not_merge_shingle_sets(spark, tmp_path):
    """An increment that re-crawls an id already in the accepted corpus
    must verify the NEW text against the OLD text — not silently merge
    both texts' shingle sets under one pool key (round-6 advice). The
    colliding id carries a below-threshold rewrite, so a correct gate
    accepts it; the set-merge bug inflates the intersection and would
    reject it (or corrupt the reported jaccard)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.dedup_history import (
        history_rejections,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dedup import (
        minhash_bands,
    )

    old = spark.createDataFrame(
        [(1, _doc(0)), (2, _doc(40))], "doc_id long, text string"
    )
    history_bands = minhash_bands(old).withColumn("batch", F.lit(0))
    new = spark.createDataFrame(
        # id 1 re-used: ~0.47-jaccard sibling of history doc 1 (below 0.8);
        # id 3: exact copy of history doc 2 (must still be rejected)
        [(1, _doc(10)), (3, _doc(40))], "doc_id long, text string"
    )
    got = history_rejections(new, history_bands, old).collect()
    assert {(r.doc_id, r.history_doc_id) for r in got} == {(3, 2)}
    # same pair set as the collision-free baseline with a fresh id
    fresh = new.withColumn(
        "doc_id", F.when(F.col("doc_id") == 1, F.lit(99)).otherwise(F.col("doc_id"))
    )
    base = history_rejections(fresh, history_bands, old).collect()
    assert {(r.doc_id, r.history_doc_id, round(r.jaccard, 6)) for r in base} == {
        (r.doc_id, r.history_doc_id, round(r.jaccard, 6)) for r in got
    }


def test_remove_from_history_unblocks_future_neardups(spark, tmp_path):
    """Retraction semantics: after remove_from_history, a near-dup of the
    RETRACTED doc is accepted by the next increment (novel content again),
    while rejection against still-present history keeps working; the
    retracted doc is gone from the accepted store and its bands from the
    band store; untouched batch partitions are not rewritten."""
    import os

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.dedup_history import (
        remove_from_history,
    )

    body = _doc(0)
    other = _doc(40)
    state = str(tmp_path / "state")
    out = str(tmp_path / "accepted")
    inc0 = spark.createDataFrame(
        [(0, body), (1, _distinct(1))], "doc_id long, text string"
    )
    inc1 = spark.createDataFrame(
        [(10, other), (11, _distinct(11))], "doc_id long, text string"
    )
    process_increment(inc0, 0, state, out)
    process_increment(inc1, 1, state, out)

    def file_set(path):
        res = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    res[p] = os.path.getmtime(p)
        return res

    before_out = file_set(out)

    # sanity: a copy of body is rejected while doc 0 is in history
    probe = spark.createDataFrame([(20, body)], "doc_id long, text string")
    process_increment(probe, 2, state, out)
    acc = {r.doc_id for r in read_accepted(spark, out).collect()}
    assert 20 not in acc

    res = remove_from_history(spark, state, out, [0])
    assert res["doc_batches"] == [0] and res["band_batches"] == [0]
    acc = {r.doc_id: r.batch for r in read_accepted(spark, out).collect()}
    assert 0 not in acc and 1 in acc and 10 in acc
    bands = spark.read.parquet(f"{state}/bands")
    assert bands.filter(F.col("doc_id") == 0).count() == 0
    assert bands.filter(F.col("doc_id") == 10).count() > 0

    # untouched batch partitions (batch=1, batch=2) were not rewritten
    after_out = file_set(out)
    for p, mt in before_out.items():
        if "batch=0" not in p:
            assert after_out.get(p) == mt, p

    # the retracted content is novel again: the same body is now ACCEPTED
    probe2 = spark.createDataFrame([(30, body)], "doc_id long, text string")
    process_increment(probe2, 3, state, out)
    acc = {r.doc_id for r in read_accepted(spark, out).collect()}
    assert 30 in acc
    # ...and still-present history keeps rejecting its own near-dups
    probe3 = spark.createDataFrame([(40, other)], "doc_id long, text string")
    process_increment(probe3, 4, state, out)
    acc = {r.doc_id for r in read_accepted(spark, out).collect()}
    assert 40 not in acc
    # absent ids: no-op
    assert remove_from_history(spark, state, out, [999999]) == {
        "doc_batches": [], "band_batches": []
    }
