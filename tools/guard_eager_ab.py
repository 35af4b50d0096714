"""A/B the skew guards' ``eager_guards`` default: with ``False`` the
guard's occupancy aggregate is a LAZY persisted frame feeding TWO
broadcast consumers (probe side, index side), and at action time the
concurrent AQE broadcast jobs race the persist — each can re-derive the
full counting pass over the table-sized routed frame. ``True`` (the
default since the r7 review) materializes the tiny aggregate once at
construction.

Reuses the ivf-probe corpus shape of tools/skew_stress.py (balanced
200k-vector index via spread seeds, 90% of probes flooding one cell) so
the counting pass is over a frame large enough for the race to show.

Usage: python tools/guard_eager_ab.py [--vectors 200000] [--probes 50000]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    from tools.skew_stress import synthesize_vectors

    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--probes", type=int, default=50_000)
    ap.add_argument("--hot-frac", type=float, default=0.9)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/guard_eager_ab")
    args = ap.parse_args()

    spark = get_spark("guard-eager-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.knn import (
        ivf_knn_join,
    )

    emb = synthesize_vectors(spark, args.vectors, 0.0, spread_seeds=8)
    emb.write.mode("overwrite").parquet(f"{args.workdir}/emb")
    emb = spark.read.parquet(f"{args.workdir}/emb")
    probes = synthesize_vectors(spark, args.probes, args.hot_frac).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    probes.write.mode("overwrite").parquet(f"{args.workdir}/probes")
    probes = spark.read.parquet(f"{args.workdir}/probes")

    kw = dict(
        k=10, n_centroids=8, nprobe=2, exclude_self=False, index_block=2048,
        max_cell_probes=args.probes // 64,
    )

    def timed(eager: bool) -> float:
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.monotonic()
            # construction + action together: eager pays the counting
            # pass up front, lazy pays it (possibly twice) at action
            ivf_knn_join(probes, emb, eager_guards=eager, **kw).count()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    lazy = timed(False)
    eager = timed(True)
    print(
        json.dumps(
            {
                "mode": "guard-eager-ab",
                "vectors": args.vectors,
                "probes": args.probes,
                "hot_frac": args.hot_frac,
                "max_cell_probes": kw["max_cell_probes"],
                "lazy_sec": lazy,
                "eager_sec": eager,
                "eager_vs_lazy": round(eager / lazy, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
