"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every config choice here is the one
you'd want on a 1000-executor cluster: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow for pandas-UDF transfer, and a shuffle
partition count that AQE is free to shrink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "clonespark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE enabled: coalesces post-shuffle partitions and splits skewed
      shuffle partitions at runtime — essential once key skew shows up at
      100 TB (e.g. one hot label in the relevance join).
    - Arrow enabled: all pandas UDFs (embedder, UUIDv5, fast kNN) move data
      in columnar batches instead of pickled rows.
    - Broadcast threshold left at default (10 MB); operators that KNOW a side
      is small use explicit ``broadcast()`` hints instead of relying on stats.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # one BLAS thread per Python worker: N workers already saturate the
    # cores, and nested OpenBLAS/OMP thread pools on the tiny per-batch
    # matmuls cause contention, not speedup (N workers x N BLAS threads)
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Load the driver-generated parquet fixtures as DataFrames."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
