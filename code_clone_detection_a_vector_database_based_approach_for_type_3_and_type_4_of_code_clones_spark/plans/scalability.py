"""Scalability sweep (SURVEY SS3.3 / SS2.11; reference entry point
``python main3.py --scalability_test``).

The reference measures, per corpus size in [1k, 5k, 10k, 20k, 50k]: RSS
delta around ingest and the mean wall-clock of 10 kNN searches
(main3.py:36-92 — taken as an intent spec; the script itself has latent
bugs, SURVEY SS0). Spark analog: ``limit(size)`` corpus slices (O2), timed
index build and timed top-k search collects. Memory (SURVEY B2,
record-don't-gate) is the reference's measure-around-upsert protocol
(main3.py:60-72, RSS delta) transposed to the JVM: used-heap delta across
ingest plus absolute used-heap after — best-effort (GC can make the delta
negative; the absolute column is the stable one), and a JVM heap is not
byte-comparable to the reference's pandas RSS, so these are recorded,
never gated.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.knn import exact_knn_fast

DEFAULT_SIZES = (1000, 5000, 10000, 20000, 50000)


def jvm_heap_used_mb(spark: SparkSession) -> float:
    """Best-effort current JVM used heap in MB (driver == executor JVM in
    local mode, which is where the ingest buffers live). NaN when the JVM
    gateway is unreachable."""
    try:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        return float(rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024.0)
    except Exception:  # pragma: no cover - py4j gateway unavailable
        return float("nan")


def scalability_sweep(
    spark: SparkSession,
    corpus: DataFrame,
    sizes=DEFAULT_SIZES,
    k: int = 100,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Returns ``(size, ingest_seconds, ingest_heap_delta_mb, heap_used_mb,
    avg_query_time_seconds)`` — the Spark rendering of the reference's two
    scalability CSVs (main3.py:91-92) plus its memory column (B2). Each
    slice is written-and-read back (the ingest cost is real parquet I/O,
    matching the reference's measure-around-upsert protocol), and the timed
    search is one set-based top-k of ``n_queries`` probes (B1).
    """
    import tempfile

    results = []
    for size in sizes:
        corpus_n = corpus.limit(int(size))
        with tempfile.TemporaryDirectory() as tmp:
            path = f"{tmp}/index"
            heap0 = jvm_heap_used_mb(spark)
            t0 = time.monotonic()
            corpus_n.write.mode("overwrite").parquet(path)
            ingest_s = time.monotonic() - t0
            heap1 = jvm_heap_used_mb(spark)
            index = spark.read.parquet(path)

            probes = (
                index.orderBy(id_col)
                .limit(n_queries)
                .select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
                )
            )
            t0 = time.monotonic()
            exact_knn_fast(
                probes, index, k=k, id_col=id_col, vec_col=vec_col
            ).count()
            query_s = (time.monotonic() - t0) / n_queries
        results.append(
            (
                int(size),
                round(ingest_s, 4),
                round(heap1 - heap0, 1),
                round(heap1, 1),
                round(query_s, 4),
            )
        )
    return spark.createDataFrame(
        results,
        "size long, ingest_seconds double, ingest_heap_delta_mb double, "
        "heap_used_mb double, avg_query_time_seconds double",
    )
