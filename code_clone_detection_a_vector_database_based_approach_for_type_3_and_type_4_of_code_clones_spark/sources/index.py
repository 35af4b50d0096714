"""Vector-index table: the persisted Parquet table IS the index
(SURVEY S5/S7).

The reference upserts ``(id, vector, payload)`` points into a Qdrant
collection with ``max_retries=3`` and skips ingest when the collection
already exists (main.py:59-67; bcb_utils.py:76-121). Spark-side the
"collection" is a partitioned Parquet table: task retries replace the manual
retry loop, path-existence replaces ``collection_exists``, and the optional
``cell`` partition column (from ``ivf_knn``'s assignment) gives kNN queries
partition pruning — the batch analog of Qdrant's server-side ANN index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def index_exists(spark: SparkSession, path: str) -> bool:
    """S7: create-if-absent guard (``driver.collection_exists``,
    main.py:59)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def write_index(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    mode: str = "ignore",
) -> None:
    """S5: persist the vector table. ``mode="ignore"`` reproduces the
    reference's skip-if-exists ingest; ``partition_by="cell"`` (an IVF cell
    id) makes subsequent searches prune to nprobe/n_centroids of the files.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def load_index(spark: SparkSession, path: str, cells: list | None = None) -> DataFrame:
    """Load the index table; with ``cells`` the filter lands on the partition
    column and Spark prunes non-matching directories at planning time."""
    df = spark.read.parquet(path)
    if cells is not None:
        df = df.filter(F.col("cell").isin(cells))
    return df
