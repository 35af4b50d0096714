"""kNN similarity-join tests (SURVEY J2/P3/O1/W5)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
    exact_knn,
    exact_knn_fast,
    ivf_knn,
    self_knn,
)


def _collect_sorted(df):
    return (
        df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_fast_path_equals_expression_path(spark, embeddings):
    a = _collect_sorted(self_knn(embeddings, k=7, n_probes=30))
    b = _collect_sorted(self_knn(embeddings, k=7, n_probes=30, fast=True))
    pd.testing.assert_frame_equal(a, b)


def test_fast_path_multi_partition(spark, embeddings):
    """Partition-local top-k + global merge must equal the single-partition
    answer regardless of physical partitioning."""
    a = _collect_sorted(self_knn(embeddings, k=5, n_probes=20, fast=True))
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 20)
    b = _collect_sorted(exact_knn_fast(probes, embeddings.repartition(8), k=5))
    pd.testing.assert_frame_equal(a, b)


def test_probe_block_chunking_identical(spark, embeddings):
    """A probe set larger than ``probe_block`` must produce rows identical
    to the single-block run (blocking only bounds the per-batch sim-matrix
    size; per-query results are independent of the blocking)."""
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 150)
    one_block = _collect_sorted(exact_knn_fast(probes, embeddings, k=6))
    chunked = _collect_sorted(
        exact_knn_fast(probes, embeddings.repartition(4), k=6, probe_block=64)
    )
    pd.testing.assert_frame_equal(one_block, chunked)


def test_tied_scores_keep_lowest_ids(spark):
    """Duplicated vectors make every score tie at the rounded 6th decimal;
    the local top-k selection must keep the rows the global contract
    (score desc, result_id asc) keeps — i.e. the LOWEST ids — in both
    physical strategies, regardless of partitioning."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(60):
        v = [1.0, 2.0, 3.0] if i % 2 == 0 else [float(rng.random()) for _ in range(3)]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = spark.createDataFrame(
        [(1000, [1.0, 2.0, 3.0])], "query_id long, query_vec array<double>"
    )
    want = _collect_sorted(exact_knn(probes, emb, k=7))
    # 30 duplicates tie at score 1.0; top-7 must be the 7 smallest even ids
    assert want.result_id.tolist() == [0, 2, 4, 6, 8, 10, 12]
    for parts in (1, 8):
        got = _collect_sorted(exact_knn_fast(probes, emb.repartition(parts), k=7))
        pd.testing.assert_frame_equal(want, got)
    got_ivf = _collect_sorted(
        ivf_knn(probes, emb, k=7, n_centroids=4, nprobe=4)
    )
    pd.testing.assert_frame_equal(want, got_ivf)


def test_self_exclusion(spark, embeddings):
    r = self_knn(embeddings, k=5, n_probes=50)
    assert r.filter(F.col("query_id") == F.col("result_id")).count() == 0


def test_rank_contract(spark, embeddings):
    """Ranks are 1..k, scores non-increasing, ties broken by result_id."""
    pdf = _collect_sorted(self_knn(embeddings, k=10, n_probes=10))
    for qid, grp in pdf.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        s = grp["score"].to_numpy()
        assert (np.diff(s) <= 0).all()
        for i in range(len(grp) - 1):
            if s[i] == s[i + 1]:
                assert grp["result_id"].iloc[i] < grp["result_id"].iloc[i + 1]


def test_topk_monotone_in_k(spark, embeddings):
    """top-5 is a prefix of top-10 for every query."""
    k5 = _collect_sorted(self_knn(embeddings, k=5, n_probes=15))
    k10 = _collect_sorted(self_knn(embeddings, k=10, n_probes=15))
    k10_prefix = k10[k10["rank"] <= 5].reset_index(drop=True)
    pd.testing.assert_frame_equal(k5, k10_prefix)


def test_knn_against_numpy_bruteforce(spark, embeddings):
    """Golden check: Spark top-k == NumPy brute force on the same data."""
    pdf = embeddings.orderBy("vec_id").toPandas()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(mat @ mat.T, 6)
    np.fill_diagonal(sims, -np.inf)
    got = _collect_sorted(self_knn(embeddings, k=3, n_probes=5))
    for qid in range(5):
        order = sorted(
            range(sims.shape[1]), key=lambda j: (-sims[qid, j], j)
        )[:3]
        mine = got[got["query_id"] == qid]["result_id"].tolist()
        assert mine == [pdf["vec_id"].iloc[j] for j in order]


def test_assign_route_vectorized_match_expression_twins(spark, embeddings):
    """The r12 NumPy routing/assignment kernels must reproduce the
    baked-literal expression forms exactly — every (id, cell) row
    identical, including argmax/sort tie-breaks."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _assign_cells,
        _centroid_bank,
        _route_probes,
    )

    cv, ci = _centroid_bank(embeddings, 16, "vec_id", "embedding", 0, 2048)
    fast_assign = sorted(
        (r.result_id, r.cell)
        for r in _assign_cells(
            embeddings, cv, ci, "vec_id", "embedding", vectorized=True
        ).collect()
    )
    expr_assign = sorted(
        (r.result_id, r.cell)
        for r in _assign_cells(
            embeddings, cv, ci, "vec_id", "embedding", vectorized=False
        ).collect()
    )
    assert fast_assign == expr_assign
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    ).filter("query_id < 200")
    fast_route = sorted(
        (r.query_id, r.cell)
        for r in _route_probes(
            probes, cv, ci, 4, "query_id", "query_vec", vectorized=True
        ).collect()
    )
    expr_route = sorted(
        (r.query_id, r.cell)
        for r in _route_probes(
            probes, cv, ci, 4, "query_id", "query_vec", vectorized=False
        ).collect()
    )
    assert fast_route == expr_route


def test_ivf_recall_reasonable(spark, embeddings):
    """IVF with nprobe=4/16 cells should recover a majority of the exact
    top-10 on this fixture (sanity, not a tight bound)."""
    exact = _collect_sorted(self_knn(embeddings, k=10, n_probes=20))
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 20)
    approx = _collect_sorted(
        ivf_knn(probes, embeddings, k=10, n_centroids=16, nprobe=4)
    )
    hits = 0
    total = 0
    for qid in range(20):
        e = set(exact[exact["query_id"] == qid]["result_id"])
        a = set(approx[approx["query_id"] == qid]["result_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total > 0.3  # nprobe/n_centroids = 25% of cells searched


def test_ivf_kmeans_refinement_improves_recall(spark, embeddings):
    """refine_iters runs deterministic spherical-KMeans rounds on the
    centroid bank; at fixed nprobe the refined cells must not lose recall
    vs the lowest-id-init default (measured 0.69 -> 0.74 on this fixture)
    and the whole operator stays deterministic (same inputs, same rows)."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        exact_knn_fast,
        ivf_knn,
    )

    probes = embeddings.filter("vec_id < 30").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    e = {}
    for r in exact_knn_fast(probes, embeddings, k=10).collect():
        e.setdefault(r.query_id, set()).add(r.result_id)

    def recall(iters):
        a = {}
        for r in ivf_knn(
            probes, embeddings, k=10, n_centroids=8, nprobe=3, refine_iters=iters
        ).collect():
            a.setdefault(r.query_id, set()).add(r.result_id)
        return sum(len(e[q] & a.get(q, set())) / len(e[q]) for q in e) / len(e)

    base, refined = recall(0), recall(5)
    assert refined >= base
    assert refined >= 0.7
    # determinism: a second refined run yields identical pairs
    runs = []
    for _ in range(2):
        runs.append(
            sorted(
                (r.query_id, r.result_id, r.score, r.rank)
                for r in ivf_knn(
                    probes, embeddings, k=10, n_centroids=8, nprobe=3, refine_iters=5
                ).collect()
            )
        )
    assert runs[0] == runs[1]


def test_ivf_join_equals_closure_form(spark, embeddings):
    """ivf_knn_join (probe-distributed cogroup) must be row-identical to
    ivf_knn (driver-closure probe routing) at the same parameters — same
    centroids, routing, rounding, tie-break."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 60)
    a = _collect_sorted(ivf_knn(probes, embeddings, k=8, n_centroids=8, nprobe=3))
    b = _collect_sorted(
        ivf_knn_join(probes, embeddings, k=8, n_centroids=8, nprobe=3)
    )
    pd.testing.assert_frame_equal(a, b)


def test_ivf_join_partitioning_and_blocking_invariant(spark, embeddings):
    """Physical layout must not change results: repartitioned inputs and a
    tiny index_block (forces the blocked in-cell matmul path) produce the
    same rows."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 40)
    a = _collect_sorted(ivf_knn_join(probes, embeddings, k=5, n_centroids=8, nprobe=3))
    b = _collect_sorted(
        ivf_knn_join(
            probes.repartition(7),
            embeddings.repartition(5),
            k=5,
            n_centroids=8,
            nprobe=3,
            index_block=32,
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_ivf_join_max_cell_split_identical(spark, embeddings):
    """The max_cell skew guard: with a ~10x-oversized cell forced (2
    centroids over a 500-vector fixture -> each cell far exceeds
    max_cell=25), sub-bucketed scoring must be row-identical to the
    unsplit form — scores are per-pair, each index row lands in exactly
    one sub-bucket, the final window still takes the global top-k."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 60)
    a = _collect_sorted(
        ivf_knn_join(probes, embeddings, k=8, n_centroids=2, nprobe=2)
    )
    b = _collect_sorted(
        ivf_knn_join(
            probes, embeddings, k=8, n_centroids=2, nprobe=2, max_cell=25
        )
    )
    pd.testing.assert_frame_equal(a, b)
    # exclude_self survives the split (a probe's own row may land in any
    # sub-bucket — it must still never match itself)
    assert not any(r.query_id == r.result_id for _, r in b.iterrows())


def test_ivf_join_max_cell_noop_below_bound(spark, embeddings):
    """max_cell larger than every cell leaves results identical (single
    bucket 0 everywhere — the guard costs only the counting pass)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 30)
    a = _collect_sorted(ivf_knn_join(probes, embeddings, k=5, n_centroids=8, nprobe=3))
    b = _collect_sorted(
        ivf_knn_join(
            probes, embeddings, k=5, n_centroids=8, nprobe=3, max_cell=10**6
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_ivf_cell_stats_contract(spark, embeddings):
    """ivf_cell_stats: n_members sums to the corpus, overflow/split_factor
    mark exactly the cells a max_cell split would sub-bucket, and the
    persisted-table form (cell column present) skips assignment and
    agrees with the raw-table form."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _assign_cells,
        _centroid_bank,
        ivf_cell_stats,
    )

    stats = ivf_cell_stats(embeddings, n_centroids=4, max_cell=100).collect()
    total = embeddings.count()
    assert sum(r.n_members for r in stats) == total
    for r in stats:
        assert r.overflow == (r.n_members > 100)
        import math

        assert r.split_factor == max(1, math.ceil(r.n_members / 100))

    cv, ci = _centroid_bank(embeddings, 4, "vec_id", "embedding", 0, 2048)
    pre = _assign_cells(embeddings, cv, ci, "vec_id", "embedding").select(
        "result_id", "cell"
    )
    stats2 = {r.cell: r.n_members for r in ivf_cell_stats(pre).collect()}
    assert stats2 == {r.cell: r.n_members for r in stats}


def test_ivf_join_all_probes_no_driver_ceiling(spark, embeddings):
    """EVERY vector probes (the self-dedup shape that cannot run through the
    driver-closure path at scale); spot-check equality to the closure form
    on the full fixture probe set."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = _collect_sorted(ivf_knn(probes, embeddings, k=3, n_centroids=8, nprobe=2))
    b = _collect_sorted(
        ivf_knn_join(probes, embeddings, k=3, n_centroids=8, nprobe=2)
    )
    pd.testing.assert_frame_equal(a, b)


def test_ivf_join_refined_matches_refined_closure(spark, embeddings):
    """Under KMeans refinement both forms share centroid bank + stable cell
    ids (positions keep their original lowest-id cent_ids), so they stay
    row-identical."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 30)
    a = _collect_sorted(
        ivf_knn(probes, embeddings, k=5, n_centroids=8, nprobe=3, refine_iters=3)
    )
    b = _collect_sorted(
        ivf_knn_join(
            probes, embeddings, k=5, n_centroids=8, nprobe=3, refine_iters=3
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_persisted_ivf_matches_inline(spark, embeddings, tmp_path):
    """build_ivf_index + ivf_knn_persisted must reproduce ivf_knn exactly
    (same centroid bank -> same routing/scoring), while reading ONLY the
    routed cells' partition directories."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        ivf_knn_persisted,
    )

    path = str(tmp_path / "ivf_index")
    build_ivf_index(embeddings, path, n_centroids=8)
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 40)
    a = _collect_sorted(ivf_knn(probes, embeddings, k=6, n_centroids=8, nprobe=3))
    b = _collect_sorted(ivf_knn_persisted(spark, path, probes, k=6, nprobe=3))
    pd.testing.assert_frame_equal(a, b)
    # pruning is visible in the physical plan: partition filter on cell
    plan = ivf_knn_persisted(spark, path, probes, k=6, nprobe=3)._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan


def test_persisted_ivf_partition_pruning(spark, embeddings, tmp_path):
    """The persisted search scans only routed cells: with nprobe == 1 and a
    single probe, the scan must touch exactly one partition directory's
    rows (cells partition the index)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
    )

    path = str(tmp_path / "ivf_index2")
    build_ivf_index(embeddings, path, n_centroids=8)
    total = spark.read.parquet(path).count()
    per_cell = {
        r.cell: r.n
        for r in spark.read.parquet(path).groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert total == embeddings.count() and len(per_cell) >= 2
    # planning-time pruning: a cell filter reads only that directory
    one = min(per_cell)
    pruned = spark.read.parquet(path).filter(F.col("cell") == one)
    assert pruned.count() == per_cell[one]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_persisted_quantized_ivf_recall(spark, embeddings, tmp_path):
    """int8-quantized per-cell index (IVF-PQ-style composition): searches
    run on the dequantized projection; top-10 overlap vs the float path
    stays >= 0.8 (quantization noise only)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        ivf_knn_persisted,
    )

    fpath = str(tmp_path / "ivf_f32")
    qpath = str(tmp_path / "ivf_q8")
    build_ivf_index(embeddings, fpath, n_centroids=8)
    build_ivf_index(embeddings, qpath, n_centroids=8, quantize=True)
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 50)
    f = {}
    for r in ivf_knn_persisted(spark, fpath, probes, k=10, nprobe=3).collect():
        f.setdefault(r.query_id, set()).add(r.result_id)
    q = {}
    for r in ivf_knn_persisted(
        spark, qpath, probes, k=10, nprobe=3, quantized=True
    ).collect():
        q.setdefault(r.query_id, set()).add(r.result_id)
    recall = sum(len(f[i] & q.get(i, set())) / len(f[i]) for i in f) / len(f)
    assert recall >= 0.8, recall


def test_persisted_join_matches_closure_persisted(spark, embeddings, tmp_path):
    """ivf_knn_join_persisted (distributed probes x pre-assigned cells) must
    reproduce ivf_knn_persisted (driver-routed probes) on the same stored
    index, float and quantized."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        ivf_knn_join_persisted,
        ivf_knn_persisted,
    )

    path = str(tmp_path / "ivf_jp")
    build_ivf_index(embeddings, path, n_centroids=8)
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 40)
    a = _collect_sorted(ivf_knn_persisted(spark, path, probes, k=6, nprobe=3))
    b = _collect_sorted(
        ivf_knn_join_persisted(spark, path, probes, k=6, nprobe=3)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pq_rerank_restores_recall(spark, embeddings, tmp_path):
    """int8 over-fetch + f32 rerank: reranked top-k must be at least as
    close to the float32 result as the raw int8 top-k, and on this fixture
    restores recall to >= 0.95 (raw int8 sits lower)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        ivf_knn_persisted,
    )

    fpath = str(tmp_path / "rr_f32")
    qpath = str(tmp_path / "rr_q8")
    build_ivf_index(embeddings, fpath, n_centroids=8)
    build_ivf_index(embeddings, qpath, n_centroids=8, quantize=True)
    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 50)

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.result_id)
        return out

    f = sets(ivf_knn_persisted(spark, fpath, probes, k=10, nprobe=3))
    raw = sets(
        ivf_knn_persisted(spark, qpath, probes, k=10, nprobe=3, quantized=True)
    )
    rer = sets(
        ivf_knn_persisted(
            spark, qpath, probes, k=10, nprobe=3, quantized=True,
            rerank_path=fpath,
        )
    )

    def rec(approx):
        return sum(len(f[q] & approx.get(q, set())) / len(f[q]) for q in f) / len(f)

    assert rec(rer) >= rec(raw) - 1e-9
    assert rec(rer) >= 0.95, (rec(raw), rec(rer))


def test_upsert_ivf_index_replace_and_append(spark, embeddings, tmp_path):
    """Upsert semantics: (1) the merged table equals a from-scratch build
    over the merged corpus UNDER THE SAME CENTROID BANK (ids 0..15 are
    untouched, so both banks agree); (2) replaced ids carry the new
    vectors; (3) only affected cell directories are rewritten."""
    import os

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        ivf_knn_persisted,
        upsert_ivf_index,
    )

    base = embeddings.filter(F.col("vec_id") < 400)
    path = str(tmp_path / "ivf_up")
    build_ivf_index(base, path, n_centroids=8)

    def file_set():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = file_set()

    # batch: 50 appends (ids 400-449) + 50 replaces (ids 200-249, vectors
    # swapped for the embedding of id+250 -> genuinely different)
    appends = embeddings.filter(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 450)
    ).select("vec_id", "embedding")
    swap = embeddings.filter(
        (F.col("vec_id") >= 450) & (F.col("vec_id") < 500)
    ).select((F.col("vec_id") - 250).alias("vec_id"), "embedding")
    batch = appends.unionByName(swap)
    affected = upsert_ivf_index(batch, path)
    assert affected and len(affected) <= 8

    # ground truth: rebuild from scratch over the post-upsert corpus
    untouched = base.filter((F.col("vec_id") < 200) | (F.col("vec_id") >= 250)).select(
        "vec_id", "embedding"
    )
    merged_corpus = untouched.unionByName(batch)
    path2 = str(tmp_path / "ivf_rebuild")
    build_ivf_index(merged_corpus, path2, n_centroids=8)

    got = {
        (r.vec_id, r.cell): tuple(r.embedding)
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r.vec_id, r.cell): tuple(r.embedding)
        for r in spark.read.parquet(path2).collect()
    }
    assert got == want

    # unaffected cell files were not rewritten
    after = file_set()
    untouched_cells = [c for c in range(1000) if c not in affected]
    for p, mt in before.items():
        cell = int(p.split("cell=")[1].split("/")[0])
        if cell in untouched_cells:
            assert p in after and after[p] == mt, p

    # search over the upserted index == search over the rebuild
    probes = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = ivf_knn_persisted(spark, path, probes, k=5, nprobe=3).collect()
    b = ivf_knn_persisted(spark, path2, probes, k=5, nprobe=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_upsert_ivf_index_quantized(spark, embeddings, tmp_path):
    """Quantized indexes are detected from the stored schema; the new batch
    lands int8-coded and search still works through the dequantize load."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        ivf_knn_persisted,
        upsert_ivf_index,
    )

    base = embeddings.filter(F.col("vec_id") < 450)
    path = str(tmp_path / "ivf_q")
    build_ivf_index(base, path, n_centroids=8, quantize=True)
    batch = embeddings.filter(F.col("vec_id") >= 450).select("vec_id", "embedding")
    upsert_ivf_index(batch, path)

    stored = spark.read.parquet(path)
    assert "q" in dict(stored.dtypes) and stored.count() == 500
    probes = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_knn_persisted(spark, path, probes, k=5, nprobe=3, quantized=True)
    assert out.count() == 25


def test_upsert_ivf_index_cross_cell_replacement(spark, embeddings, tmp_path):
    """REPLACE semantics across cell migration: a replaced id whose new
    vector lands in a DIFFERENT cell must not leave its old row behind —
    the id appears exactly once afterwards, in the new cell."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _assign_cells,
        _load_centroid_bank,
        build_ivf_index,
        upsert_ivf_index,
    )

    base = embeddings.filter(F.col("vec_id") < 400).select("vec_id", "embedding")
    path = str(tmp_path / "ivf_mig")
    build_ivf_index(base, path, n_centroids=8)
    cv, ci = _load_centroid_bank(spark, path)
    cells = {
        r.result_id: r.cell
        for r in _assign_cells(base, cv, ci, "vec_id", "embedding").collect()
    }
    # find a donor whose cell differs from id 300's
    donor = next(
        i for i in range(301, 400) if cells[i] != cells[300]
    )
    donor_vec = embeddings.filter(F.col("vec_id") == donor).collect()[0].embedding
    batch = spark.createDataFrame(
        [(300, donor_vec)], "vec_id long, embedding array<float>"
    )
    affected = upsert_ivf_index(batch, path)
    assert cells[300] in affected and cells[donor] in affected  # old + new cells

    rows = spark.read.parquet(path).filter(F.col("vec_id") == 300).collect()
    assert len(rows) == 1, "stale duplicate row survived the cell migration"
    assert rows[0].cell == cells[donor]

    # the arithmetic sidecar count must track REPLACE semantics (prev -
    # old affected rows + rewritten rows = unchanged total here, since a
    # replace neither adds nor removes an id)
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _INDEX_ROWCOUNT_CACHE,
        _index_row_count,
    )

    _INDEX_ROWCOUNT_CACHE.pop(path, None)
    assert _index_row_count(spark, path) == 400

    # append-only batches may skip the old-row scan and stay correct
    batch2 = spark.createDataFrame(
        [(9000, donor_vec)], "vec_id long, embedding array<float>"
    )
    upsert_ivf_index(batch2, path, assume_new_ids=True)
    assert spark.read.parquet(path).filter(F.col("vec_id") == 9000).count() == 1
    _INDEX_ROWCOUNT_CACHE.pop(path, None)
    assert _index_row_count(spark, path) == 401


def test_upsert_ivf_index_drained_cell_deleted(spark, tmp_path):
    """A cell fully drained by a cross-cell replacement (its only row
    migrates out, nothing new lands) must not keep stale files: dynamic
    partition overwrite only rewrites partitions PRESENT in the output, so
    upsert deletes the drained directory explicitly. Regression for the
    round-4 advisor finding (stale duplicate vec_id in the old cell)."""
    import os

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        ivf_knn_persisted,
        upsert_ivf_index,
    )

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    # ids 0/1 become the two centroids (lowest-id init, no refinement);
    # every other vector hugs centroid 0 -> cell of id 1 is single-member
    rows = [(0, a), (1, b)] + [
        (i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(2, 20)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf_drain")
    build_ivf_index(base, path, n_centroids=2)

    stored = spark.read.parquet(path)
    cell_of_1 = stored.filter(F.col("vec_id") == 1).collect()[0].cell
    assert stored.filter(F.col("cell") == cell_of_1).count() == 1

    # replace id 1 with a vector that migrates to the other cell
    batch = spark.createDataFrame([(1, a)], "vec_id long, embedding array<float>")
    affected = upsert_ivf_index(batch, path)
    assert cell_of_1 in affected

    after = spark.read.parquet(path)
    rows1 = after.filter(F.col("vec_id") == 1).collect()
    assert len(rows1) == 1, "stale duplicate survived in the drained cell"
    assert rows1[0].cell != cell_of_1
    assert after.filter(F.col("cell") == cell_of_1).count() == 0
    assert not os.path.exists(os.path.join(path, f"cell={cell_of_1}"))

    # a search probing ALL cells sees the id exactly once
    probes = spark.createDataFrame(
        [(100, b)], "query_id long, query_vec array<float>"
    )
    hits = ivf_knn_persisted(spark, path, probes, k=20, nprobe=2).collect()
    assert [h.result_id for h in hits].count(1) == 1


def test_upsert_ivf_index_dedups_batch_ids(spark, embeddings, tmp_path):
    """Duplicate ids WITHIN one batch collapse to a single deterministic
    row (replayed/multi-shard batches cannot double-insert)."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        upsert_ivf_index,
    )

    base = embeddings.filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    va = embeddings.filter(F.col("vec_id") == 200).collect()[0].embedding
    vb = embeddings.filter(F.col("vec_id") == 201).collect()[0].embedding
    batch = spark.createDataFrame(
        [(500, va), (500, vb)], "vec_id long, embedding array<float>"
    )

    winners = []
    for d in ("a", "b"):
        path = str(tmp_path / f"ivf_dup_{d}")
        build_ivf_index(base, path, n_centroids=4)
        upsert_ivf_index(batch, path)
        rows = spark.read.parquet(path).filter(F.col("vec_id") == 500).collect()
        assert len(rows) == 1
        winners.append(tuple(rows[0].embedding))
    assert winners[0] == winners[1]  # deterministic winner across runs


def test_suggest_overfetch_tracks_cell_occupancy():
    """The overfetch heuristic must sit at-or-above both measured
    recall-1.000 anchors (BASELINE.md: 2M/64 cells -> 16, 10M/64 cells
    -> 64) and respect its floor/cap clamps."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        suggest_overfetch,
    )

    assert suggest_overfetch(2_000_000, 64) >= 16
    assert suggest_overfetch(10_000_000, 64) >= 64
    assert suggest_overfetch(5_000, 16) == 4       # floor at tiny scale
    assert suggest_overfetch(10**9, 64) == 256     # cap bounds the rerank set
    # monotone in occupancy: denser cells never suggest fewer candidates
    prev = 0
    for n in (10**4, 10**5, 10**6, 10**7, 10**8):
        cur = suggest_overfetch(n, 64)
        assert cur >= prev
        prev = cur


def test_index_row_count_stored_and_cached(spark, tmp_path):
    """build_ivf_index stores the row count with the centroid bank and
    the overfetch default resolves it WITHOUT a per-search count job
    (round-6 advice): after the first resolution the count comes from the
    session cache — proven by deleting the bank files and resolving
    again — and upsert refreshes the stored value."""
    import shutil

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _INDEX_ROWCOUNT_CACHE,
        _index_row_count,
        build_ivf_index,
        upsert_ivf_index,
    )

    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(200)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf")
    build_ivf_index(vecs, path, n_centroids=4)

    bank = spark.read.parquet(path + "_centroids")
    assert "n_rows" in bank.columns
    assert bank.agg(F.max("n_rows")).first()[0] == 200

    _INDEX_ROWCOUNT_CACHE.pop(path, None)
    assert _index_row_count(spark, path) == 200
    shutil.rmtree(path + "_centroids")  # cache hit needs no files at all
    assert _index_row_count(spark, path) == 200

    # restore the bank (upsert routes against it), then grow the index
    _INDEX_ROWCOUNT_CACHE.pop(path, None)
    build_ivf_index(vecs, path, n_centroids=4)
    newer = spark.createDataFrame(
        [(1000 + i, [9.0, 9.0, float(i)]) for i in range(25)],
        "vec_id long, embedding array<float>",
    )
    upsert_ivf_index(newer, path, assume_new_ids=True)
    assert _index_row_count(spark, path) == 225
    _INDEX_ROWCOUNT_CACHE.pop(path, None)
    assert _index_row_count(spark, path) == 225  # stored value, not cache


def test_upsert_leaves_centroid_bank_immutable(spark, tmp_path):
    """The crash invariant behind streaming ingest's replay decision:
    ``ingest_batch`` dispatches bootstrap-vs-upsert on the BANK's
    existence, so upsert must never rewrite ``{path}_centroids`` (a
    non-atomic overwrite would open a window where a replayed batch
    re-bootstraps over the whole index — r7 review finding). The mutable
    occupancy count lives in the ``{path}_nrows`` sidecar instead, and
    losing THAT file only degrades the overfetch hint: the resolver falls
    back to the bank's immutable build-time count."""
    import os

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _INDEX_ROWCOUNT_CACHE,
        _index_row_count,
        build_ivf_index,
        upsert_ivf_index,
    )

    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(200)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf_imm")
    build_ivf_index(vecs, path, n_centroids=4)

    def bank_state():
        d = path + "_centroids"
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in sorted(os.listdir(d))
        }

    before = bank_state()
    batch = spark.createDataFrame(
        [(1000 + i, [9.0, 9.0, float(i)]) for i in range(25)],
        "vec_id long, embedding array<float>",
    )
    upsert_ivf_index(batch, path, assume_new_ids=True)
    assert bank_state() == before, "upsert rewrote the centroid bank"

    # sidecar carries the post-upsert count; losing it falls back to the
    # bank's build-time count (stale but safe), never a crash or a scan
    # of a mutated bank
    _INDEX_ROWCOUNT_CACHE.pop(path, None)
    assert _index_row_count(spark, path) == 225
    import shutil

    shutil.rmtree(path + "_nrows")
    _INDEX_ROWCOUNT_CACHE.pop(path, None)
    assert _index_row_count(spark, path) == 200


def test_ivf_join_max_cell_probes_split_identical(spark, embeddings):
    """The PROBE-side skew guard (hot-query workload: every probe routes
    to the same few cells): max_cell_probes sub-buckets a cell's probes
    on the query-id hash and replicates that cell's members across the
    buckets — each (probe, member) pair still meets exactly once, so
    results are row-identical to the unguarded form, alone AND composed
    with the index-side max_cell guard."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 60)
    kw = dict(k=8, n_centroids=2, nprobe=2)
    a = _collect_sorted(ivf_knn_join(probes, embeddings, **kw))
    b = _collect_sorted(
        ivf_knn_join(probes, embeddings, max_cell_probes=7, **kw)
    )
    pd.testing.assert_frame_equal(a, b)
    assert not any(r.query_id == r.result_id for _, r in b.iterrows())
    # composed with the index-side guard: task bound = max_cell members x
    # max_cell_probes probes; rows must still be identical
    c = _collect_sorted(
        ivf_knn_join(
            probes, embeddings, max_cell=25, max_cell_probes=7, **kw
        )
    )
    pd.testing.assert_frame_equal(a, c)


def test_ivf_join_max_cell_probes_noop_below_bound(spark, embeddings):
    """max_cell_probes above every cell's routed-probe count is a no-op
    (single bucket 0 — the guard costs only the counting pass)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    probes = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).filter(F.col("query_id") < 30)
    a = _collect_sorted(ivf_knn_join(probes, embeddings, k=5, n_centroids=8, nprobe=3))
    b = _collect_sorted(
        ivf_knn_join(
            probes, embeddings, k=5, n_centroids=8, nprobe=3,
            max_cell_probes=10**6,
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_delete_from_ivf_index_matches_rebuild(spark, embeddings, tmp_path):
    """Delete semantics (the 'removed' half of an incremental refresh):
    (1) post-delete table equals a from-scratch build over the surviving
    corpus under the SAME centroid bank; (2) untouched cell files are not
    rewritten; (3) search never returns a deleted id and equals the
    rebuild's search; (4) the row-count sidecar updates arithmetically;
    (5) deleting absent ids is a no-op returning []."""
    import os

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _index_row_count,
        build_ivf_index,
        delete_from_ivf_index,
        ivf_knn_persisted,
    )

    base = embeddings.filter(F.col("vec_id") < 400)
    path = str(tmp_path / "ivf_del")
    build_ivf_index(base, path, n_centroids=8)

    def file_set():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = file_set()
    doomed = list(range(100, 150))
    affected = delete_from_ivf_index(spark, path, doomed)
    assert affected and len(affected) <= 8

    survivors_corpus = base.filter(
        (F.col("vec_id") < 100) | (F.col("vec_id") >= 150)
    ).select("vec_id", "embedding")
    path2 = str(tmp_path / "ivf_del_rebuild")
    build_ivf_index(survivors_corpus, path2, n_centroids=8)

    got = {
        (r.vec_id, r.cell): tuple(r.embedding)
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r.vec_id, r.cell): tuple(r.embedding)
        for r in spark.read.parquet(path2).collect()
    }
    assert got == want
    assert not any(100 <= vid < 150 for vid, _ in got)
    assert _index_row_count(spark, path) == 350

    after = file_set()
    for p, mt in before.items():
        cell = int(p.split("cell=")[1].split("/")[0])
        if cell not in affected:
            assert p in after and after[p] == mt, p

    probes = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = ivf_knn_persisted(spark, path, probes, k=5, nprobe=3).collect()
    b = ivf_knn_persisted(spark, path2, probes, k=5, nprobe=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert not any(100 <= r.result_id < 150 for r in a)

    # absent ids: no-op, nothing rewritten
    snap = file_set()
    assert delete_from_ivf_index(spark, path, range(900000, 900010)) == []
    assert file_set() == snap


def test_delete_from_ivf_index_drains_cell(spark, tmp_path):
    """Deleting a cell's only member must remove the partition directory
    (dynamic overwrite alone would leave the stale files)."""
    import os

    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        delete_from_ivf_index,
        ivf_knn_persisted,
    )

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    rows = [(0, a), (1, b)] + [
        (i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(2, 20)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf_del_drain")
    build_ivf_index(base, path, n_centroids=2)
    cell_of_1 = (
        spark.read.parquet(path).filter(F.col("vec_id") == 1).collect()[0].cell
    )

    affected = delete_from_ivf_index(spark, path, [1])
    assert affected == [cell_of_1]
    assert not os.path.exists(os.path.join(path, f"cell={cell_of_1}"))
    after = spark.read.parquet(path)
    assert after.filter(F.col("vec_id") == 1).count() == 0
    assert after.count() == 19

    probes = spark.createDataFrame(
        [(100, b)], "query_id long, query_vec array<float>"
    )
    hits = ivf_knn_persisted(spark, path, probes, k=20, nprobe=2).collect()
    assert all(h.result_id != 1 for h in hits)


def test_incremental_refresh_lifecycle(spark, documents, tmp_path):
    """The full incremental-refresh story: snapshot_diff classifies a
    crawl refresh, ONLY added+changed docs are re-embedded and upserted,
    removed docs are deleted from the index — and the refreshed index is
    row-identical to a from-scratch build over the v2 corpus (same
    centroid bank: the diff path must not disturb it)."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.embed import (
        embed_hash,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        build_ivf_index,
        delete_from_ivf_index,
        ivf_knn_persisted,
        upsert_ivf_index,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        snapshot_diff,
    )

    v1 = documents.select("doc_id", "text")
    # refresh: every 10th doc edited, every 7th (not 10th) removed, 20 added
    edited = v1.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" refreshed")).alias("text")
    )
    kept = v1.filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 7 != 0))
    added = v1.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
    )
    v2 = kept.unionByName(edited).unionByName(added)

    emb = lambda d: embed_hash(d, dim=16).select(  # noqa: E731
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    path = str(tmp_path / "ivf_refresh")
    build_ivf_index(emb(v1), path, n_centroids=4)

    diff = snapshot_diff(v1, v2).persist()
    up_ids = diff.filter(F.col("status") != "removed").select("doc_id")
    rm_ids = diff.filter(F.col("status") == "removed").select(
        F.col("doc_id").alias("vec_id")
    )
    # re-embed ONLY the refresh (the point of the diff), upsert, delete
    upsert_ivf_index(emb(v2.join(up_ids, "doc_id")), path)
    delete_from_ivf_index(spark, path, rm_ids)
    diff.unpersist()

    path2 = str(tmp_path / "ivf_refresh_rebuild")
    build_ivf_index(emb(v2), path2, n_centroids=4)
    # same bank: centroid seeds are the lowest ids, which the refresh
    # neither removed nor re-embedded differently? They MAY differ (ids
    # 0/7/10... change) — so compare by SEARCH results under each index's
    # own bank only if banks agree; assert table equality on (id, vector)
    # regardless of cell assignment instead.
    got = {
        (r.vec_id, tuple(r.embedding))
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r.vec_id, tuple(r.embedding))
        for r in spark.read.parquet(path2).collect()
    }
    assert got == want

    probes = emb(v2.filter(F.col("doc_id") % 13 == 1)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = ivf_knn_persisted(spark, path, probes, k=5, nprobe=4).collect()
    v2_ids = {r.doc_id for r in v2.select("doc_id").collect()}
    assert hits and all(h.result_id in v2_ids for h in hits)


def test_cogroup_cell_key_type_alignment_regression(spark, tmp_path):
    """r10 regression: a persisted index's `cell` partition column reads
    back INT32 while routing emits BIGINT cells — and cogroup alignment
    hashes each side under its OWN type (murmur3 of int32 != murmur3 of
    int64 for the same value), silently splitting one cell value into two
    never-joined groups. AQE partition coalescing masks it at tiny scale
    by collapsing both sides to one partition — the production-scale
    failure (26 of 64 cells dropped at 50k rows) reproduces exactly by
    disabling coalescing: 59/64 cells misalign pre-fix.
    _score_with_cogroup must normalize both key types."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _score_with_cogroup,
    )

    path = str(tmp_path / "cell_idx")
    spark.createDataFrame(
        [(1000 + c * 10 + i, [1.0, float(c + i)], c)
         for c in range(64) for i in range(3)],
        "result_id long, vec array<double>, cell long",
    ).write.partitionBy("cell").parquet(path)
    assigned = spark.read.parquet(path).select(
        "result_id", "vec", "cell"  # cell reads back INT32
    )
    assert dict(assigned.dtypes)["cell"] == "int"
    routed = spark.createDataFrame(
        [(c, [1.0, float(c)], c) for c in range(64)],
        "query_id long, query_vec array<double>, cell long",
    )
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        out = _score_with_cogroup(
            routed, assigned, k=2, exclude_self=True,
            id_dt="bigint", qid_dt="bigint", index_block=8192,
        )
        per_q = {
            r.query_id: r["count"]
            for r in out.groupBy("query_id").count().collect()
        }
    finally:
        spark.conf.set(key, prev)
    missing = 64 - len(per_q)
    assert missing == 0, f"probes lost to cogroup key misalignment: {missing}"
    assert all(v == 2 for v in per_q.values())
