import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # r13: local[8] (was local[4]) — the verify suite must complete inside
    # the driver's pytest window (VERIFY_r12 timed out); the sandbox has 32
    # cores and no test depends on task parallelism (shuffle partitions
    # stay 4). Measured: full suite 2187 s at local[4] -> see
    # OPTIMIZATION_r13.md for the local[8] closing number.
    s = (
        SparkSession.builder.master("local[8]")
        .appName("tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def hll_estimate_sql(hashed_cte: str, group_cols: list[str],
                     p: int = 8) -> str:
    """Delegates to the engine's ONE DuckDB rendering of the HLL
    register build + estimate contract
    (operators/sketch.py::hll_estimate_duckdb_sql — kept adjacent to the
    Spark definitions so they can't drift). Every pytest HLL oracle
    (test_sketch's `hll_tokens_sql`, test_streaming's
    `events_hourly_distinct_sql`) and the graded-entry oracles in
    __spark_entry__ therefore assert the same math."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
        hll_estimate_duckdb_sql,
    )

    return hll_estimate_duckdb_sql(hashed_cte, group_cols, p)
