"""CSV sources & sinks (SURVEY S1/S6).

The reference loads BCB's ``CLONES.csv`` / ``FUNCTIONS_CLEANED.csv`` with
``pd.read_csv`` (main.py:50-55) and writes results with ``to_csv(...,
index=False)`` (main.py:85-90). Spark-side: explicit schemas (no
inferSchema scan), lower-cased canonical column names, and Catalyst pushes
the projection into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CLONES_SCHEMA = StructType(
    [
        StructField("FUNCTION_ID_ONE", LongType()),
        StructField("FUNCTION_ID_TWO", LongType()),
    ]
)

FUNCTIONS_SCHEMA = StructType(
    [
        StructField("ID", LongType()),
        StructField("NAME", StringType()),
        StructField("STARTLINE", LongType()),
        StructField("ENDLINE", LongType()),
    ]
)


def read_clones_csv(spark: SparkSession, path: str) -> DataFrame:
    """Clone-pair ground truth: only the two id columns survive the scan
    (the reference loads everything then projects, bcb_utils.py:26; here the
    projection is part of the schema so the reader never materializes the
    rest)."""
    return (
        spark.read.option("header", True)
        .schema(CLONES_SCHEMA)
        .csv(path)
        .select(
            F.col("FUNCTION_ID_ONE").alias("function_id_one"),
            F.col("FUNCTION_ID_TWO").alias("function_id_two"),
        )
        .filter(
            F.col("function_id_one").isNotNull() & F.col("function_id_two").isNotNull()
        )
    )


def read_functions_csv(spark: SparkSession, path: str) -> DataFrame:
    """Function metadata (bcb_utils.py:42, 55-59)."""
    return (
        spark.read.option("header", True)
        .schema(FUNCTIONS_SCHEMA)
        .csv(path)
        .select(
            F.col("ID").alias("id"),
            F.col("NAME").alias("name"),
            F.col("STARTLINE").alias("startline"),
            F.col("ENDLINE").alias("endline"),
        )
    )


def write_results_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Results sink (main.py:85-90). ``single_file=True`` coalesces for
    byte-parity with the reference's one-file ``to_csv``; leave False for
    large outputs so every task writes its own part."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
