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

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up_np(a, decimals: int = 6):
    """Half-AWAY-FROM-ZERO rounding for numpy arrays — the convention
    Spark's ``F.round`` (BigDecimal HALF_UP) and DuckDB's ``round`` apply
    to doubles. ``np.round`` is banker's half-to-even, so a cosine landing
    exactly on a .5e-6 boundary could flip a pair across a >= threshold
    between the vectorized matmul paths and their expression/oracle twins
    (round-4 advisor finding). All vectorized score paths route through
    this helper so both sides round the same direction at the boundary.
    (Last-ulp differences BEFORE rounding — numpy pairwise-accumulated
    matmul vs left-to-right expression sums — remain possible and are
    documented at the call sites; this removes the rounding-rule half of
    the divergence.)"""
    q = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * q + 0.5) / q


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def stack_vectors(values, what: str) -> np.ndarray:
    """Stack an Arrow batch's array-column values into an (n, d) float64
    matrix for the vectorized kernels. Ragged lengths or empty vectors
    make ``np.asarray`` yield an object array whose missing second axis
    surfaces as an opaque unpack/shape error deep in the kernel — the
    expression twins instead null-pad via ``zip_with``. Validate here and
    raise the engine's contract-error style, naming the offending input
    (round-12 advisor finding)."""
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in values])
    if m.dtype == object or m.ndim != 2 or (len(m) and m.shape[1] == 0):
        lens = sorted({len(v) for v in values})
        raise ValueError(
            f"vectorized kernel input contract violated: {what} must hold "
            f"fixed-length non-empty vectors within a batch (observed "
            f"lengths {lens[:8]}{'...' if len(lens) > 8 else ''})"
        )
    return m


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


def cosine_similarity_pandas(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine similarity (NumPy row-wise, float64).

    Same values as ``cosine_similarity`` (index-order double accumulation;
    any disagreement is below the engine's 6-decimal rounding). Use this on
    high-cardinality joined candidate sets: Spark's higher-order array
    functions are interpreted per row (no whole-stage codegen), which makes
    the pure-expression form ~10x slower past ~10^5 rows.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.asarray([np.asarray(v, dtype=np.float64) for v in va])
        mb = np.asarray([np.asarray(v, dtype=np.float64) for v in vb])
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
        nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
        denom = na * nb
        out = np.where(denom != 0.0, dots / np.where(denom == 0.0, 1.0, denom), np.nan)
        return pd.Series(out)

    return _cos(a, b)


def cosine6_exact_pandas(a: Column, b: Column) -> Column:
    """6dp cosine as a pandas UDF whose float64 operation order replays
    the engine's expression form ``round(dot/(nq*nv), 6)`` EXACTLY: the
    dot/norm accumulations loop dims in index order (vectorized across
    rows — bit-identical to the left-to-right ``aggregate`` folds, unlike
    ``cosine_similarity_pandas``'s einsum which may reassociate), one
    divide, ``round_half_up_np``. Zero-norm vectors raise — the ANSI
    divide-by-zero contract the expression form enforces. Use on
    high-cardinality candidate sets (interpreted higher-order functions
    cost ~10x there); r12, the _fulldim_rerank kernel."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _cos6(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        ma = stack_vectors(va, "the left (query) vector column")
        mb = stack_vectors(vb, "the right (candidate) vector column")
        if ma.shape != mb.shape:
            raise ValueError(
                "vectorized kernel input contract violated: left and right "
                f"vector columns disagree in shape ({ma.shape} vs {mb.shape})"
            )
        n, d = ma.shape
        dots = np.zeros(n, dtype=np.float64)
        na = np.zeros(n, dtype=np.float64)
        nb = np.zeros(n, dtype=np.float64)
        for j in range(d):
            dots = dots + ma[:, j] * mb[:, j]
            na = na + ma[:, j] * ma[:, j]
            nb = nb + mb[:, j] * mb[:, j]
        denom = np.sqrt(na) * np.sqrt(nb)
        if np.any(denom == 0.0):
            raise ArithmeticError(
                "DIVIDE_BY_ZERO in exact cosine rescore (zero-norm vector)"
            )
        return pd.Series(round_half_up_np(dots / denom, 6))

    return _cos6(a, b)


def cosine6_null_pandas(a: Column, b: Column) -> Column:
    """``round(cosine_similarity(a, b), 6)`` as a pandas UDF — the
    NULL-on-zero-norm twin of ``cosine6_exact_pandas`` (same left-to-right
    float64 fold order, same ``round_half_up_np``), matching the
    EXPRESSION form's ``F.when(denom != 0)`` NULL contract instead of
    raising. This is the kernel for the pair-VERIFICATION paths
    (srp_near_duplicates, embedding_near_duplicates), whose ``>=
    threshold`` filters silently drop zero-norm pairs — a raise would
    change behavior on corpora containing zero vectors. r13 (round-12
    verdict item 5): a drop-in for candidate sets large enough that
    interpreted higher-order folds dominate (crossover ~5k pairs — below
    that the Python-worker round-trip costs more than it saves)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _cos6n(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        ma = stack_vectors(va, "the left (pair doc_a) vector column")
        mb = stack_vectors(vb, "the right (pair doc_b) vector column")
        if ma.shape != mb.shape:
            raise ValueError(
                "vectorized kernel input contract violated: left and right "
                f"vector columns disagree in shape ({ma.shape} vs {mb.shape})"
            )
        n, d = ma.shape
        dots = np.zeros(n, dtype=np.float64)
        na = np.zeros(n, dtype=np.float64)
        nb = np.zeros(n, dtype=np.float64)
        for j in range(d):
            dots = dots + ma[:, j] * mb[:, j]
            na = na + ma[:, j] * ma[:, j]
            nb = nb + mb[:, j] * mb[:, j]
        denom = np.sqrt(na) * np.sqrt(nb)
        safe = np.where(denom == 0.0, 1.0, denom)
        out = round_half_up_np(dots / safe, 6)
        # NULL (not NaN) where the expression's F.when(denom != 0) yields
        # NULL — Spark treats NaN as ordered ABOVE all doubles, so a NaN
        # would survive a >= threshold filter the expression form drops
        return pd.Series(out).mask(denom == 0.0)

    return _cos6n(a, b)


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a vector column — the ``--normalized`` flag of the
    reference (main.py:19). Zero vectors pass through unchanged."""
    ad = _as_double(a)
    n = l2_norm(a)
    return F.when(n != 0.0, F.transform(ad, lambda x: x / n)).otherwise(ad)


def quantize_int8(a: Column) -> dict[str, Column]:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` in [-127, 127]. Cuts the index's vector
    memory 4x (float32 -> int8) — at 100 TB the difference between an
    in-memory ANN index and one that spills. Pure column expressions
    (double arithmetic end-to-end, so the DuckDB oracle replays it
    bit-for-bit); dequantize is ``q_i * scale``.

    Returns ``{"scale": double, "q": array<int>}`` (ints hold the [-127,127]
    codes; cast to tinyint at the storage boundary). Zero vectors get
    scale 0 and all-zero codes.
    """
    ad = _as_double(a)
    amax = F.aggregate(ad, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.when(
        amax != 0.0,
        F.transform(ad, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(ad, lambda x: F.lit(0)))
    return {"scale": scale, "q": q}


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Inverse of ``quantize_int8``: ``x_i ~ q_i * scale`` (double)."""
    return F.transform(q, lambda x: x.cast("double") * scale)
