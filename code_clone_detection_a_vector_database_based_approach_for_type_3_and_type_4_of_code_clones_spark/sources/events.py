"""Events-table ingestion: physical-type-robust event-time normalization.

The ``events`` fixture has shipped with two different physical types for its
``ts`` column across driver rounds: raw INT64 epoch-nanoseconds (readable
only via ``spark.sql.legacy.parquet.nanosAsLong``) and parquet
``timestamp[us]`` (read by Spark as TIMESTAMP_NTZ). Every event-time
consumer in the engine goes through :func:`load_events_micros`, which sniffs
the loaded schema and normalizes ``ts`` to **epoch-microseconds BIGINT** —
the precision both Spark and the DuckDB oracle (``epoch_us``) share — so
downstream arithmetic (as-of joins, window ranges, sessionization gaps,
hour buckets) is plain integer math, exact and timezone-proof.

Timezone safety: TIMESTAMP_NTZ is converted with
``timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts)`` — a
wall-clock difference of two NTZ values that never consults
``spark.sql.session.timeZone`` (casting NTZ to TIMESTAMP would reinterpret
the wall clock in the session zone and silently shift epochs on non-UTC
hosts). Verified equal to DuckDB's ``epoch_us(ts)`` on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

US_PER_SEC = 1_000_000
SESSION_GAP_US = 30 * 60 * US_PER_SEC  # 30-minute inactivity gap
HOUR_US = 3600 * US_PER_SEC

#: epoch anchor for wall-clock (NTZ) microsecond arithmetic
_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ts_micros_expr(df: DataFrame, col: str = "ts"):
    """Column expression converting ``df[col]`` to epoch-microseconds BIGINT,
    branching on the column's (already-resolved) type:

    - ``LongType``       -> raw INT64 epoch-NANOseconds (legacy fixture read
      under ``nanosAsLong``): integer ``div 1000``. Integer div, not float:
      epoch-ns (~1.7e18) exceeds double's 2^53 exact range.
    - ``TimestampNTZType`` -> tz-free wall-clock micros since the epoch.
    - ``TimestampType``    -> ``unix_micros`` (an instant; tz-free by
      definition).
    """
    dt = df.schema[col].dataType
    q = f"`{col}`"
    if isinstance(dt, LongType):
        return F.expr(f"{q} div 1000")
    if isinstance(dt, TimestampNTZType):
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {q})")
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"events column {col!r} has unsupported type {dt}; expected "
        "INT64-ns, TIMESTAMP_NTZ, or TIMESTAMP"
    )


def normalize_ts_micros(df: DataFrame, col: str = "ts") -> DataFrame:
    """Replace ``col`` with its epoch-microseconds BIGINT normalization."""
    return df.withColumn(col, ts_micros_expr(df, col).cast("long"))


def read_events_raw(spark: SparkSession, path: str) -> DataFrame:
    """Read an events parquet file/dir, tolerating the legacy INT64-ns
    physical type: if the plain read fails with Spark's specific
    TIMESTAMP(NANOS) refusal, enable ``nanosAsLong`` and retry. The flag is
    left set in that case — it must still hold at execution time for the
    ns scan, and it is a no-op for non-nanos files.

    Only the nanos refusal triggers the fallback; any other failure
    (missing path, corrupt footer, permission error) re-raises unchanged so
    the root cause is never masked and session state is never mutated as a
    side effect of an unrelated error.
    """
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # narrow below: retry iff it's the nanos refusal
        msg = str(exc)
        if "TIMESTAMP(NANOS" not in msg and "nanosAsLong" not in msg:
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def load_events_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one events-table entry point: load ``{sf_dir}/events.parquet``
    with ``ts`` normalized to epoch-microseconds BIGINT regardless of the
    fixture's physical type."""
    return normalize_ts_micros(read_events_raw(spark, f"{sf_dir}/events.parquet"))


def event_time_micros(ts_us_col: str = "ts"):
    """TIMESTAMP column (an instant) from an epoch-us BIGINT column — the
    event-time column Structured Streaming watermarks/windows operate on."""
    return F.timestamp_micros(F.col(ts_us_col))
