import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
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
    """The ONE DuckDB rendering of the engine's HLL register build +
    estimate contract (operators/sketch.py hll_build/hll_estimate),
    shared by every HLL oracle (test_sketch's staged `hll_tokens_sql`,
    test_streaming's staged `events_hourly_distinct_sql`) so a change to
    the correction logic cannot leave one oracle asserting stale math.

    ``hashed_cte``: SQL producing ``group_cols..., h`` (h = the portable
    60-bit hash — render it with functions.ids.stable_hash64_sql, never a
    fresh literal). Output: ``group_cols..., n_touched, reg_sum,
    est_distinct`` (6dp)."""
    m, maxr = 1 << p, 60 - p + 1
    alpha_mm = (0.7213 / (1.0 + 1.079 / m)) * m * m  # ONE float literal:
    # DuckDB parses `0.718... * 256 * 256` as DECIMAL and overflows
    g = ", ".join(group_cols)
    est = (
        f"{alpha_mm!r} / (inv_scaled::DOUBLE / {float(1 << maxr)!r}"
        f" + ({m} - n_touched)::DOUBLE)"
    )
    return f"""
WITH hashed AS ({hashed_cte}),
regs AS (
  SELECT {g}, h % {m} AS bucket,
         max(CASE WHEN (h >> {p}) = 0 THEN {maxr}
                  ELSE {maxr} - length(bin(h >> {p})) END)::INT AS reg
  FROM hashed GROUP BY {g}, h % {m}
),
agg AS (
  SELECT {g}, count(*)::BIGINT AS n_touched,
         sum(reg)::BIGINT AS reg_sum,
         sum((1::BIGINT << ({maxr} - reg)))::BIGINT AS inv_scaled
  FROM regs GROUP BY {g}
)
SELECT {g}, n_touched, reg_sum,
       round(CASE WHEN {est} <= {2.5 * m!r} AND n_touched < {m}
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_touched)::DOUBLE)
             ELSE {est}
             END, 6) AS est_distinct
FROM agg"""
