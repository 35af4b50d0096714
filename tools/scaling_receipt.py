"""Scaling receipt for the near-serial sub-second bench rows (r13,
round-12 verdict item 8).

At sf0.1 the headline rows `top_tokens`, `large_orders` and `ivf_knn`
scale only 1.1-1.2x from 8 to 32 cores. The r12 verdict's hypothesis:
that is an Amdahl floor of the FIXTURE (single-file parquet scans yield
one partition; per-job scheduling and probe/setup constants dominate
2k-5k-row tables), not a serial operator. This tool proves it by
deriving a K-times-larger fixture from sf0.1 (deterministic shifted
copies, written as multi-file parquet so scans get their natural
parallelism) and re-timing the same three query shapes at two core
counts.

Usage:
    python tools/scaling_receipt.py gen  [K] [out_dir]   # build fixture
    python tools/scaling_receipt.py run  [cpus] [out_dir]  # time rows

`run` prints one JSON line: {"cpus": N, "rows": {name: best_sec}}.
Run it once per core count (fresh process each, same dirs), e.g.:
    python tools/scaling_receipt.py gen 8
    python tools/scaling_receipt.py run 32
    python tools/scaling_receipt.py run 8
The fixture derivation is NOT a modification of /root/testdata (which is
read-only by contract) — it writes shifted copies under /tmp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_K = 8
DEFAULT_OUT = "/tmp/scale_fixture"
SRC = "/root/testdata/sf0.1"


def _spark(cpus: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def gen(k: int, out_dir: str) -> None:
    """K shifted copies of the sf0.1 tables the three rows read, written
    as multi-file parquet (repartition(32) — the natural file count a
    production table of this size would have)."""
    from pyspark.sql import functions as F

    spark = _spark(8, "scale_fixture_gen")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {
        # table -> (id columns to shift so copies stay key-unique)
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
        "lineitem": ("l_orderkey",),
        "orders": ("o_orderkey",),
        "customer": (),
    }
    for name, shift_cols in specs.items():
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        copies = []
        for i in range(k):
            c = src
            for col in shift_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * 100_000_000))
            copies.append(c)
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        (
            u.repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{name}.parquet")
        )
        print(f"wrote {out_dir}/{name}.parquet x{k}")
    spark.stop()


def run(cpus: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark import (
        operators as ops,
    )
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        tokens,
    )

    spark = _spark(cpus, f"scale_receipt_{cpus}c")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    emb = spark.read.parquet(f"{out_dir}/embeddings.parquet")
    li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{out_dir}/orders.parquet")
    cust = spark.read.parquet(f"{out_dir}/customer.parquet")

    # same index-build-untimed convention as bench.py's ivf_knn row
    ivf_dir = os.path.join(out_dir, "ivf_index")
    ops.build_ivf_index(emb, ivf_dir, n_centroids=16)
    centroids = ops.load_centroid_bank(spark, ivf_dir)

    def q_top_tokens():
        toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        return ops.heavy_hitters(toks, "token", n=20)

    def q_large_orders():
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 150)
        )
        return orders.join(big, F.col("o_orderkey") == F.col("l_orderkey")).join(
            cust, F.col("o_custkey") == F.col("c_custkey")
        )

    def q_ivf_knn():
        probes = emb.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ).filter(F.col("query_id") < 500)
        return ops.ivf_knn_persisted(
            spark, ivf_dir, probes, k=100, nprobe=4, centroids=centroids
        )

    rows = {
        "top_tokens": q_top_tokens,
        "large_orders": q_large_orders,
        "ivf_knn": q_ivf_knn,
    }
    # warmup (python workers / codegen), then best-of-2 per row — the
    # bench.py methodology
    for t in rows.values():
        t().count()
        break
    out = {}
    for name, build in rows.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            build().count()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"cpus": cpus, "rows": out, "fixture": out_dir}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "gen":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_K
        gen(k, sys.argv[3] if len(sys.argv) > 3 else DEFAULT_OUT)
    elif mode == "run":
        cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        run(cpus, sys.argv[3] if len(sys.argv) > 3 else DEFAULT_OUT)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
