"""Skewed-key window stress: one user with ~10^6 events (the hot-key shape
AQE cannot split — a window partition is one task) vs the salted
sessionization form.

PLANS.md ("Window-heavy operators") names the hazard; this harness measures
it and the fix. Corpus: ``--users`` normal users x ``--per-user`` events
(uniformly spread, gap-sized jitter so sessions split), plus ONE hot user
with ``--hot`` events at 2-second spacing (one giant dense session crossing
every bucket edge — the worst case for the boundary-merge pass, and the
single-task worst case for the plain window).

Usage: python tools/skew_stress.py [--hot 1000000] [--users 2000]
Prints one JSON line with plain/salted timings on the skewed corpus and the
plain timing on the hot-free corpus (the degradation denominator).

``--mode ivf`` instead stresses the cogrouped IVF kNN join's degenerate
cell (a near-duplicate flood: ``--hot-frac`` of all vectors land in ONE
cell — one cogroup group, one task, AQE can't split it) and measures the
``max_cell`` hash-sub-bucket guard: plain vs guarded wall time plus a
row-checksum equality witness (the guard must not change a single row).

``--mode ivf-probe`` stresses the CONVERSE: a balanced index but
``--hot-frac`` of the PROBES routing to one cell (hot-query workload),
measuring the ``max_cell_probes`` probe-sub-bucket guard the same way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (  # noqa: E402
    get_spark,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.sources.events import (  # noqa: E402
    SESSION_GAP_US,
)
from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.streaming.events import (  # noqa: E402
    sessionize_batch,
    sessionize_batch_salted,
)

US = 1_000_000
DAY_US = 86_400 * US


def synthesize(spark, n_users: int, per_user: int, hot: int, path: str) -> None:
    """Deterministic event table: normal users spread over 30 days with
    ~45-min spacing (sessions split at the 30-min gap); the hot user fires
    every 2 s. No RNG — jitter via sin, batch-invariant."""

    def gen_normal(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            user = ids // per_user
            k = ids % per_user
            base = (k * 45 * 60 * US) % (30 * DAY_US)
            jitter = (np.sin(ids * 0.7318) * 10 * 60 * US).astype(np.int64)
            yield pd.DataFrame(
                {
                    "user_id": user + 1,
                    "ts": base + jitter + 30 * DAY_US,
                    "value": 0.001,
                }
            )

    def gen_hot(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "user_id": np.zeros(len(ids), dtype=np.int64),
                    "ts": 30 * DAY_US + ids * 2 * US,
                    "value": 0.001,
                }
            )

    schema = "user_id long, ts long, value double"
    normal = (
        spark.range(n_users * per_user).repartition(32).mapInPandas(gen_normal, schema)
    )
    hotdf = spark.range(hot).repartition(32).mapInPandas(gen_hot, schema)
    normal.write.mode("overwrite").parquet(f"{path}/normal")
    normal.unionByName(hotdf).write.mode("overwrite").parquet(f"{path}/skewed")


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn().count()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def synthesize_vectors(
    spark, n: int, hot_frac: float, dim: int = 16, spread_seeds: int = 0
):
    """Deterministic embedding table with a planted degenerate IVF cell:
    ``hot_frac`` of vectors hug one direction (pairwise cosine ~1 — the
    near-duplicate-flood shape), the rest spread over the unit circle in
    the first two dims. No RNG — sin/cos of the id, batch-invariant.

    ``spread_seeds``: the IVF centroid bank is the ``n_centroids``
    LOWEST-id vectors, so a table used as an INDEX must pin ids
    ``0..spread_seeds-1`` to evenly-spaced directions — otherwise the
    centroids span a ~0.044 rad arc of the 997-angle wheel and argmax-
    cosine routing collapses the "balanced" index into two half-size
    mega-cells (r7 review finding against the first form of the
    ivf-probe receipt). With seeds spread, the uniform angles bucket
    into ~equal 2*pi/spread_seeds sectors. Leave 0 for probe tables
    (probes are never centroid sources)."""
    hot_n = int(n * hot_frac)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            hot = ids < hot_n
            theta = np.where(hot, 0.0, (ids % 997) * (2 * np.pi / 997))
            if spread_seeds:
                seed = ids < spread_seeds
                theta = np.where(
                    seed, ids * (2 * np.pi / spread_seeds), theta
                )
            mat = np.zeros((len(ids), dim))
            mat[:, 0] = np.cos(theta)
            mat[:, 1] = np.sin(theta)
            # tiny deterministic jitter so hot vectors aren't bit-identical
            mat[:, 2] = 1e-3 * np.sin(ids * 0.7318)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [row.tolist() for row in mat]}
            )

    return spark.range(n).repartition(32).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def run_ivf(spark, args) -> None:
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_cell_stats,
        ivf_knn_join,
    )

    # spread_seeds pins the 8 centroid-source ids to even directions so
    # the planted flood is the ONLY degenerate cell (the rest balanced)
    emb = synthesize_vectors(spark, args.vectors, args.hot_frac, spread_seeds=8)
    emb.write.mode("overwrite").parquet(f"{args.workdir}/emb")
    emb = spark.read.parquet(f"{args.workdir}/emb")
    probes = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    kw = dict(k=10, n_centroids=8, nprobe=2)
    max_cell = args.vectors // 64

    stats = ivf_cell_stats(emb, n_centroids=8, max_cell=max_cell).collect()
    biggest = max(r.n_members for r in stats)

    plain = timed(lambda: ivf_knn_join(probes, emb, **kw), reps=args.reps)
    guarded = timed(
        lambda: ivf_knn_join(probes, emb, max_cell=max_cell, **kw),
        reps=args.reps,
    )

    def checksum(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(
                F.hash("query_id", "result_id", F.round("score", 6), "rank")
            ).alias("h"),
        ).collect()[0]

    ca = checksum(ivf_knn_join(probes, emb, **kw))
    cb = checksum(ivf_knn_join(probes, emb, max_cell=max_cell, **kw))
    print(
        json.dumps(
            {
                "mode": "ivf",
                "vectors": args.vectors,
                "hot_frac": args.hot_frac,
                "biggest_cell": biggest,
                "max_cell": max_cell,
                "overflow_cells": sum(1 for r in stats if r.overflow),
                "plain_sec": plain,
                "guarded_sec": guarded,
                "guarded_vs_plain": round(guarded / plain, 2),
                "rows_equal": (ca.n, ca.h) == (cb.n, cb.h),
                "rows": ca.n,
            }
        )
    )


def run_ivf_probe(spark, args) -> None:
    """The converse of ``run_ivf`` (r6 verdict ask): the INDEX is balanced
    — no degenerate cell — but ``--hot-frac`` of the PROBES chase one
    direction (a hot-query workload: every query near-duplicating one
    popular document), so they all route to the same cell and land in one
    cogroup group. Measures the ``max_cell_probes`` probe-sub-bucket
    guard: plain vs guarded wall time plus the row-checksum identity
    witness (the guard must not change a single row)."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_cell_stats,
        ivf_knn_join,
    )

    # balanced index: hot_frac=0 spreads members over 997 directions, and
    # spread_seeds pins the 8 centroid-source ids to even directions so
    # the members actually bucket into ~equal eighths (without it the
    # centroids huddle in a 0.044 rad arc and the "balanced" index
    # collapses into two half-size mega-cells — r7 review finding)
    emb = synthesize_vectors(spark, args.vectors, 0.0, spread_seeds=8)
    emb.write.mode("overwrite").parquet(f"{args.workdir}/emb")
    emb = spark.read.parquet(f"{args.workdir}/emb")
    # probe flood: hot_frac of probes hug direction 0 -> one routed cell
    probes = synthesize_vectors(spark, args.probes, args.hot_frac).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    probes.write.mode("overwrite").parquet(f"{args.workdir}/probes")
    probes = spark.read.parquet(f"{args.workdir}/probes")
    # index_block bounds the per-block sims matrix (block x |group probes|)
    # — the plain form's single hot group holds ~hot_frac*probes queries,
    # so an unbounded block would allocate GBs in one Python worker; the
    # same block size runs on both sides for a fair comparison
    kw = dict(k=10, n_centroids=8, nprobe=2, exclude_self=False, index_block=2048)
    max_probes = args.probes // 64

    # balance witness for the premise: with spread seeds the biggest cell
    # must hold ~1/8 of the index, so the measured effect is attributable
    # to the PROBE flood alone, not residual index skew
    stats = ivf_cell_stats(emb, n_centroids=8).collect()
    occupancy = sorted((r.n_members for r in stats), reverse=True)

    plain = timed(lambda: ivf_knn_join(probes, emb, **kw), reps=args.reps)
    guarded = timed(
        lambda: ivf_knn_join(probes, emb, max_cell_probes=max_probes, **kw),
        reps=args.reps,
    )

    def checksum(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(
                F.hash("query_id", "result_id", F.round("score", 6), "rank")
            ).alias("h"),
        ).collect()[0]

    ca = checksum(ivf_knn_join(probes, emb, **kw))
    cb = checksum(ivf_knn_join(probes, emb, max_cell_probes=max_probes, **kw))
    print(
        json.dumps(
            {
                "mode": "ivf-probe",
                "vectors": args.vectors,
                "probes": args.probes,
                "hot_frac": args.hot_frac,
                "max_cell_probes": max_probes,
                "index_cell_occupancy": occupancy,
                "plain_sec": plain,
                "guarded_sec": guarded,
                "guarded_vs_plain": round(guarded / plain, 2),
                "rows_equal": (ca.n, ca.h) == (cb.n, cb.h),
                "rows": ca.n,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("session", "ivf", "ivf-probe"), default="session"
    )
    ap.add_argument("--hot", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--per-user", type=int, default=500)
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--probes", type=int, default=200_000)
    ap.add_argument("--hot-frac", type=float, default=0.9)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/skew_stress")
    args = ap.parse_args()

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    if args.mode == "ivf":
        run_ivf(spark, args)
        return
    if args.mode == "ivf-probe":
        run_ivf_probe(spark, args)
        return
    synthesize(spark, args.users, args.per_user, args.hot, args.workdir)
    normal = spark.read.parquet(f"{args.workdir}/normal")
    skewed = spark.read.parquet(f"{args.workdir}/skewed")

    plain_normal = timed(lambda: sessionize_batch(normal))
    plain_skewed = timed(lambda: sessionize_batch(skewed))
    salted_skewed = timed(lambda: sessionize_batch_salted(skewed))
    # correctness spot-check on the skewed corpus: same session count and
    # identical hot-user session boundaries
    a = sessionize_batch(skewed)
    b = sessionize_batch_salted(skewed)
    n_a, n_b = a.count(), b.count()
    hot_a = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in a.filter(F.col("user_id") == 0).collect()
    )
    hot_b = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in b.filter(F.col("user_id") == 0).collect()
    )
    print(
        json.dumps(
            {
                "normal_rows": args.users * args.per_user,
                "hot_rows": args.hot,
                "plain_no_hot_sec": plain_normal,
                "plain_skewed_sec": plain_skewed,
                "salted_skewed_sec": salted_skewed,
                "degradation_plain": round(plain_skewed / plain_normal, 2),
                "salted_vs_plain_skewed": round(
                    salted_skewed / plain_skewed, 2
                ),
                "sessions_equal": n_a == n_b and hot_a == hot_b,
                "n_sessions": n_a,
            }
        )
    )


if __name__ == "__main__":
    main()
