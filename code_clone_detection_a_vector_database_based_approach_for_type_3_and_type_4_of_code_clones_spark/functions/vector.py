"""Vector math as Catalyst column expressions (SURVEY F7, J2).

The reference delegates similarity scoring to the Qdrant server (cosine
family, higher = more similar; consumed as ``result["score"]`` at
bcb_utils.py:184). Here the score is a first-class column expression built
from Spark's higher-order array functions, so it participates in whole-stage
codegen, predicate pushdown and AQE like any other expression — no Python in
the hot path.

All arithmetic is DOUBLE with left-to-right summation order so results are
bit-reproducible against the DuckDB oracle (``list_dot_product`` on
``DOUBLE[]`` uses the same index-order accumulation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Index-order dot product of two array columns (DOUBLE accumulation)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    ad = _as_double(a)
    return F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity (higher = more similar), the reference's score
    semantics (SURVEY F7). NULL-safe: zero vectors yield NULL."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a vector column — the ``--normalized`` flag of the
    reference (main.py:19). Zero vectors pass through unchanged."""
    ad = _as_double(a)
    n = l2_norm(a)
    return F.when(n != 0.0, F.transform(ad, lambda x: x / n)).otherwise(ad)
