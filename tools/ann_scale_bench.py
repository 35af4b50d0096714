"""ANN-at-scale measurement: the regime where the persisted, partition-pruned
IVF index WINS over exact search.

The reference's whole performance story is Qdrant's server-side ANN index
(README.md:42-45; upsert bcb_utils.py:117-121) — a query never scans the full
collection. The Spark analog is ``build_ivf_index`` (cell = parquet partition
column, computed once at ingest) + ``ivf_knn_persisted`` (probes route to
nprobe cells; the scan reads ONLY those cells' directories — planning-time
partition pruning). BASELINE.md:99-108 showed exact still beating IVF at 50k
vectors from an UNPARTITIONED scan; this harness measures the persisted path
at 200k (and any --n), where pruning pays for itself.

Corpus: deterministic clustered vectors (no RNG, batch-invariant):
    center[c][d] = sin(c*31 + d*17);  noise amplitude 0.15 via sin(i, d)
    vec[i] = center[i % n_clusters] + noise[i]
so the first ``n_clusters`` ids hit every cluster exactly once — the
lowest-id centroid init starts one-per-cluster and spherical-KMeans
refinement centers it.

Usage: python tools/ann_scale_bench.py [--n 200000] [--probes 500] [--k 10]
Writes nothing into the repo; index tables land under /tmp/ann_scale.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (  # noqa: E402
    build_ivf_index,
    exact_knn_fast,
    ivf_knn,
    ivf_knn_persisted,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (  # noqa: E402
    get_spark,
)

DIM = 64
N_CLUSTERS = 64
NOISE = 0.15


def synthesize(spark, n: int, path: str) -> None:
    d = np.arange(DIM, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            centers = np.sin(((ids % N_CLUSTERS) * 31.0)[:, None] + d[None, :] * 17.0)
            noise = NOISE * np.sin(ids[:, None] * 131.7 + d[None, :] * 79.19)
            vecs = (centers + noise).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v for v in vecs]}
            )

    (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )


def timed(fn, reps: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(reps):
        t0 = time.monotonic()
        rows = fn().count()
        best = min(best, time.monotonic() - t0)
    return round(best, 3), rows


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.result_id)
    return out


def recall(exact: dict, approx: dict) -> float:
    return round(
        sum(len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact)
        / len(exact),
        3,
    )


def dir_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return round(total / 1e6, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--probes", type=int, default=500)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/ann_scale")
    ap.add_argument("--overfetch", type=int, default=4)
    ap.add_argument(
        "--skip-inline",
        action="store_true",
        help="skip the (already-measured-losing) unpartitioned inline IVF",
    )
    ap.add_argument("--pca", action="store_true",
                    help="also build+time the PCAR+IVF composition")
    ap.add_argument("--pca-dim", type=int, default=16)
    ap.add_argument("--pca-overfetch", type=int, default=8)
    ap.add_argument("--ivfpq", action="store_true",
                    help="also build+time the persisted IVFPQ composition")
    ap.add_argument("--pq-m", type=int, default=16)
    ap.add_argument("--pq-codes", type=int, default=32)
    ap.add_argument("--pq-overfetch", type=int, default=8)
    ap.add_argument("--kmeans-centroids", action="store_true",
                    help="also build an index under full-corpus Lloyd "
                    "centroids (cluster.kmeans_bank) and receipt the "
                    "recall/balance delta vs the sample-refined bank")
    ap.add_argument(
        "--sweep-nprobe",
        default="",
        help="comma list (e.g. 4,8,16): additionally time the persisted "
        "f32 search at each nprobe, pinning the recall/latency frontier "
        "a user tunes (r6 verdict ask #7 — the 10M receipt fixed 64/4)",
    )
    args = ap.parse_args()

    spark = get_spark("ann-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(args.workdir, ignore_errors=True)

    raw_path = f"{args.workdir}/raw"
    f32_path = f"{args.workdir}/ivf_f32"
    q8_path = f"{args.workdir}/ivf_q8"

    synthesize(spark, args.n, raw_path)
    raw = spark.read.parquet(raw_path)
    stride = max(args.n // args.probes, 1)
    probes = raw.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    probes.cache().count()

    t0 = time.monotonic()
    build_ivf_index(raw, f32_path, n_centroids=N_CLUSTERS, refine_iters=5,
                    refine_sample=8192)
    build_f32 = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    build_ivf_index(raw, q8_path, n_centroids=N_CLUSTERS, refine_iters=5,
                    refine_sample=8192, quantize=True)
    build_q8 = round(time.monotonic() - t0, 1)

    results: dict[str, dict] = {}
    t, _ = timed(lambda: exact_knn_fast(probes, raw, k=args.k))
    exact_sets = topk_sets(exact_knn_fast(probes, raw, k=args.k))
    results["exact_full_scan"] = {"sec": t, "recall": 1.0}

    if not args.skip_inline:
        t, _ = timed(
            lambda: ivf_knn(probes, raw, k=args.k, n_centroids=N_CLUSTERS,
                            nprobe=args.nprobe, refine_iters=5,
                            refine_sample=8192)
        )
        results["ivf_inline_unpartitioned"] = {
            "sec": t,
            "recall": recall(
                exact_sets,
                topk_sets(
                    ivf_knn(probes, raw, k=args.k, n_centroids=N_CLUSTERS,
                            nprobe=args.nprobe, refine_iters=5,
                            refine_sample=8192)
                ),
            ),
        }

    t, _ = timed(
        lambda: ivf_knn_persisted(spark, f32_path, probes, k=args.k,
                                  nprobe=args.nprobe)
    )
    results["ivf_persisted_pruned"] = {
        "sec": t,
        "recall": recall(
            exact_sets,
            topk_sets(
                ivf_knn_persisted(spark, f32_path, probes, k=args.k,
                                  nprobe=args.nprobe)
            ),
        ),
    }

    t, _ = timed(
        lambda: ivf_knn_persisted(spark, q8_path, probes, k=args.k,
                                  nprobe=args.nprobe, quantized=True)
    )
    results["ivf_pq_persisted_pruned"] = {
        "sec": t,
        "recall": recall(
            exact_sets,
            topk_sets(
                ivf_knn_persisted(spark, q8_path, probes, k=args.k,
                                  nprobe=args.nprobe, quantized=True)
            ),
        ),
    }

    # int8 candidates + f32 rerank (cell-pruned on both passes)
    t, _ = timed(
        lambda: ivf_knn_persisted(spark, q8_path, probes, k=args.k,
                                  nprobe=args.nprobe, quantized=True,
                                  rerank_path=f32_path,
                                  overfetch=args.overfetch)
    )
    results["ivf_pq_rerank_f32"] = {
        "sec": t,
        "recall": recall(
            exact_sets,
            topk_sets(
                ivf_knn_persisted(spark, q8_path, probes, k=args.k,
                                  nprobe=args.nprobe, quantized=True,
                                  rerank_path=f32_path,
                                  overfetch=args.overfetch)
            ),
        ),
    }

    for np_s in filter(None, args.sweep_nprobe.split(",")):
        np_ = int(np_s)
        t, _ = timed(
            lambda: ivf_knn_persisted(spark, f32_path, probes, k=args.k,
                                      nprobe=np_)
        )
        results[f"ivf_persisted_nprobe{np_}"] = {
            "sec": t,
            "recall": recall(
                exact_sets,
                topk_sets(
                    ivf_knn_persisted(spark, f32_path, probes, k=args.k,
                                      nprobe=np_)
                ),
            ),
        }

    # r10: the PCAR+IVF composition — reduced-space cells (out_dim/dim
    # scan bytes + arithmetic) + full-dim rerank against the source table
    if args.pca:
        from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.dimred import (
            build_pca_ivf_index,
            pca_ivf_knn_persisted,
        )

        pca_path = f"{args.workdir}/ivf_pca"
        t0 = time.monotonic()
        build_pca_ivf_index(
            raw, pca_path, out_dim=args.pca_dim, n_centroids=N_CLUSTERS
        )
        build_pca = round(time.monotonic() - t0, 1)

        def pca_search():
            return pca_ivf_knn_persisted(
                spark, pca_path, probes, raw, args.k,
                overfetch=args.pca_overfetch, nprobe=args.nprobe,
            )

        t, _ = timed(pca_search)
        results["pca_ivf_persisted"] = {
            "sec": t,
            "recall": recall(exact_sets, topk_sets(pca_search())),
            "build_sec": build_pca,
            "out_dim": args.pca_dim,
            "overfetch": args.pca_overfetch,
            "index_mb": dir_mb(pca_path),
            "f32_index_mb": dir_mb(f32_path),
        }

    # r10: persisted IVFPQ — cell-pruned ADC over stored m-byte code rows
    # + full-dim rerank against the source table
    if args.ivfpq:
        from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.pq import (
            build_pq_index,
            pq_knn_persisted,
        )

        from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.pq import (
            train_pq_codebooks,
        )

        pq_path = f"{args.workdir}/ivfpq"
        t0 = time.monotonic()
        # refined codebooks + refined cell bank — the same training budget
        # the f32 rows get (refine_iters=5 on an 8192 sample)
        books = train_pq_codebooks(
            raw, m=args.pq_m, n_codes=args.pq_codes, iters=5, sample=8192
        )
        build_pq_index(
            raw, pq_path, m=args.pq_m, n_codes=args.pq_codes,
            n_centroids=N_CLUSTERS, codebooks=books,
            refine_iters=5, refine_sample=8192,
        )
        build_ivfpq = round(time.monotonic() - t0, 1)

        def ivfpq_search():
            return pq_knn_persisted(
                spark, pq_path, probes, raw, args.k,
                nprobe=args.nprobe, overfetch=args.pq_overfetch,
            )

        t, _ = timed(ivfpq_search)
        results["ivfpq_persisted"] = {
            "sec": t,
            "recall": recall(exact_sets, topk_sets(ivfpq_search())),
            "build_sec": build_ivfpq,
            "m": args.pq_m,
            "n_codes": args.pq_codes,
            "overfetch": args.pq_overfetch,
            "index_mb": dir_mb(pq_path),
            "f32_index_mb": dir_mb(f32_path),
        }

    # r10: full-corpus Lloyd centroids (cluster.kmeans_bank) threaded into
    # build_ivf_index — recall + cell-balance delta vs the bounded-sample
    # refine bank
    if args.kmeans_centroids:
        from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.cluster import (
            kmeans_bank,
        )
        from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
            ivf_cell_stats,
        )

        km_path = f"{args.workdir}/ivf_kmeans"
        t0 = time.monotonic()
        bank = kmeans_bank(raw, n_centroids=N_CLUSTERS, iters=2)
        train_sec = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        build_ivf_index(raw, km_path, n_centroids=N_CLUSTERS, centroids=bank)
        build_km = round(time.monotonic() - t0, 1)

        def cell_balance(path):
            occ = [
                int(r.n_members)
                for r in ivf_cell_stats(spark.read.parquet(path)).collect()
            ]
            return round(max(occ) / (sum(occ) / len(occ)), 2)

        t, _ = timed(
            lambda: ivf_knn_persisted(spark, km_path, probes, k=args.k,
                                      nprobe=args.nprobe)
        )
        results["ivf_kmeans_centroids"] = {
            "sec": t,
            "recall": recall(
                exact_sets,
                topk_sets(
                    ivf_knn_persisted(spark, km_path, probes, k=args.k,
                                      nprobe=args.nprobe)
                ),
            ),
            "train_sec": train_sec,
            "build_sec": build_km,
            "max_over_mean_cell": cell_balance(km_path),
            "sample_refine_max_over_mean_cell": cell_balance(f32_path),
        }

    # incremental maintenance: upsert a 1%-of-corpus batch (half new ids,
    # half replacements) into the persisted f32 index and compare against
    # the full-rebuild cost — the O(|batch| + |affected cells|) claim
    batch_n = max(args.n // 100, 100)
    half = batch_n // 2
    new_rows = raw.filter(F.col("vec_id") < half).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    repl_rows = raw.filter(
        (F.col("vec_id") >= half) & (F.col("vec_id") < batch_n)
    ).select("vec_id", "embedding")
    batch = new_rows.unionByName(repl_rows)
    batch.cache().count()
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        upsert_ivf_index,
    )

    t0 = time.monotonic()
    affected = upsert_ivf_index(batch, f32_path)
    upsert_sec = round(time.monotonic() - t0, 1)
    results["upsert_1pct_batch"] = {
        "sec": upsert_sec,
        "affected_cells": len(affected),
        "vs_full_rebuild_sec": build_f32,
    }

    # r8: point DELETE of a 1%-of-corpus id set (the snapshot_diff
    # 'removed' path) — same O(|ids| + |affected cells|) claim as upsert;
    # correctness witnesses: exact row-count drop, zero ghost rows
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        _index_row_count,
        delete_from_ivf_index,
    )

    del_ids = spark.range(batch_n, 2 * batch_n).select(
        F.col("id").alias("vec_id")
    )
    pre_rows = _index_row_count(spark, f32_path)
    t0 = time.monotonic()
    del_affected = delete_from_ivf_index(spark, f32_path, del_ids)
    delete_sec = round(time.monotonic() - t0, 1)
    ghost = (
        spark.read.parquet(f32_path)
        .join(F.broadcast(del_ids), "vec_id")
        .count()
    )
    results["delete_1pct_batch"] = {
        "sec": delete_sec,
        "affected_cells": len(del_affected),
        "rows_removed": pre_rows - _index_row_count(spark, f32_path),
        "ghost_rows": ghost,
        "vs_full_rebuild_sec": build_f32,
    }

    # capture the pruned physical plan (PartitionFilters on cell)
    plan = (
        ivf_knn_persisted(spark, f32_path, probes, k=args.k, nprobe=args.nprobe)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    prune_lines = [
        ln.strip()[:200] for ln in plan.splitlines() if "PartitionFilters" in ln
    ]

    print(
        json.dumps(
            {
                "n": args.n,
                "probes": args.probes,
                "k": args.k,
                "n_centroids": N_CLUSTERS,
                "nprobe": args.nprobe,
                "build_sec": {"f32": build_f32, "int8": build_q8},
                "index_mb": {
                    "raw": dir_mb(raw_path),
                    "f32": dir_mb(f32_path),
                    "int8": dir_mb(q8_path),
                },
                "queries": results,
                "partition_filters": prune_lines[:2],
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
