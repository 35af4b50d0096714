"""Run the reference-sized scalability sweep (SURVEY SS3.3; main3.py:98's
[1k, 5k, 10k, 20k, 50k]) on a synthesized corpus.

The parquet fixtures cap the embedding corpus at 2,000 vectors at sf0.1, so
this tool synthesizes a seeded 50k-vector corpus (dim 64, matching the
embeddings fixture) and replays ``plans.scalability.scalability_sweep`` —
the reference's ingest-time / memory / query-time protocol — at the
reference's own sizes. Prints a markdown table ready for BASELINE.md.

Usage: python tools/scalability_sweep.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N = 50_000
SEED = 20260813


def main() -> int:
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.plans.scalability import (
        scalability_sweep,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.session import (
        get_spark,
    )

    spark = get_spark("scalability-sweep")
    rng = np.random.default_rng(SEED)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(N)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # materialize once so per-size limit() slices don't re-pay row conversion
    corpus = corpus.repartition(32).cache()
    corpus.count()

    out = scalability_sweep(spark, corpus).collect()
    print("| corpus size | ingest (s) | ingest heap delta (MB) | "
          "heap used (MB) | avg query time (s, k=100, 10 probes) |")
    print("|---|---|---|---|---|")
    for r in out:
        print(
            f"| {r.size} | {r.ingest_seconds} | {r.ingest_heap_delta_mb} | "
            f"{r.heap_used_mb} | {r.avg_query_time_seconds} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
