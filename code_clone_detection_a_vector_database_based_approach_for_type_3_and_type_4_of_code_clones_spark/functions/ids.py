"""Deterministic content-derived identifiers (SURVEY F1).

The reference assigns every corpus row a UUIDv5 — ``uuid.uuid5(NAMESPACE_DNS,
str(func_id))`` for BCB (bcb_utils.py:54) and ``uuid5(NAMESPACE_DNS,
clone_type + code_name)`` for POJ (poj_utils.py:62) — so ingest is idempotent
and ids are reproducible across runs.

Two Spark-side implementations:

- ``uuid5_udf``: bit-for-bit parity with CPython's ``uuid.uuid5`` via an
  Arrow-batched pandas UDF (SHA-1 isn't available as a Spark SQL builtin).
  Verified against ``uuid.uuid5`` in tests.
- ``content_id`` / ``stable_hash64``: pure-expression alternatives (SHA-256
  based) that stay inside whole-stage codegen AND are reproducible in ANSI
  SQL, which makes them DuckDB-oracle checkable. These are the engine's
  preferred ids for new pipelines; ``uuid5_udf`` exists for reference parity.
"""

from __future__ import annotations

import uuid
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def _uuid5_dns(name: pd.Series) -> pd.Series:
    return name.map(lambda s: None if s is None else str(uuid.uuid5(uuid.NAMESPACE_DNS, s)))


def uuid5_udf(name: Column) -> Column:
    """UUIDv5 (namespace DNS) of a string column, matching ``uuid.uuid5``."""
    return _uuid5_dns(name)


def round_half_up6(x: float) -> int:
    """``round(x * 1e6)`` with Spark's ``F.round`` semantics: HALF_UP on the
    double's shortest decimal representation (Java ``BigDecimal.valueOf``).
    Python's built-in ``round()`` is banker's rounding and diverges on .5
    ties. The float multiply happens FIRST (matching the codegen plan's
    double product), then ``Decimal(repr(p))`` reproduces Java's decimal
    view of that double exactly, so Python-side folds (streaming
    sessionizer) match their codegen batch twins bit-for-bit.
    """
    p = x * 1_000_000.0
    return int(Decimal(repr(p)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def content_id(c: Column) -> Column:
    """Deterministic 64-hex-char content id: SHA-256 of the string column.

    Oracle SQL: ``sha256(c)``.
    """
    return F.sha2(c.cast("string"), 256)


def stable_hash64(c: Column, salt: str = "") -> Column:
    """Portable unsigned 60-bit hash of a string column.

    Defined as the first 15 hex chars of SHA-256, decoded as an integer —
    identical in DuckDB as ``('0x' || substr(sha256(salt || c), 1, 15))::UBIGINT``.
    Used wherever the engine needs a hash that must agree with the SQL oracle
    (MinHash seeds, SimHash token bits, deterministic sampling). 15 hex chars
    = 60 bits, safely inside BIGINT range in both engines.
    """
    s = F.concat(F.lit(salt), c.cast("string")) if salt else c.cast("string")
    return F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("bigint")


def stable_hash64_sql(expr: str, salt: str = "") -> str:
    """The DuckDB-side rendering of ``stable_hash64`` (kept adjacent so the
    two definitions can't drift)."""
    inner = f"'{salt}' || ({expr})" if salt else f"({expr})"
    return f"('0x' || substr(sha256({inner}), 1, 15))::UBIGINT::BIGINT"
