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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--per-user", type=int, default=500)
    ap.add_argument("--workdir", default="/tmp/skew_stress")
    args = ap.parse_args()

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
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
