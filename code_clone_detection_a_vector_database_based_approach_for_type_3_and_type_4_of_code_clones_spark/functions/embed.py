"""Pluggable text->vector embedders (SURVEY M1/M3).

The reference encodes with SentenceTransformers — model loaded once, batches
of 8-128, CPU or cuda:0 (bcb_utils.py:101; main.py:36; main2.py:41). Two
Spark-side implementations behind one ``embed(df, text_col, out_col)``
shape:

- ``embed_hash``: deterministic hashing-trick embedder (feature-hash token
  counts into ``dim`` buckets, +/- sign bit, L2-normalized). Pure Catalyst
  expressions — no model download, reproducible everywhere; this is the
  test/CI embedder (SURVEY SS5.2) and the oracle-checkable one.
- ``embed_sentence_transformer``: the real model via ``mapInPandas`` — the
  model loads ONCE per Python worker (module-level cache), encodes per
  Arrow batch; at scale this is one model load per executor core, the
  Spark analog of the reference's single driver-side model. Gated behind an
  import-try: sentence-transformers is not installed in this environment.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ids import stable_hash64
from .text import tokens

_ST_MODELS: dict = {}  # per-worker model cache


def hash_embedding(text: Column, dim: int = 64) -> Column:
    """Feature-hashed, L2-normalized embedding of a text column as a pure
    expression. Bucket = hash(token) mod dim; sign = next hash bit; value =
    signed token count, normalized. Deterministic across engines (portable
    stable_hash64).

    SEMANTIC REFERENCE ONLY — this bucket-major form evaluates the
    per-token SHA-256 array once PER BUCKET (higher-order lambdas re-run
    their free subexpressions per invocation, so ``hs`` is derived ``dim``
    times per row; measured ~120 s for 500 docs interpreted). Use
    ``embed_hash``, which produces bit-identical vectors token-major with
    one hash per token."""
    hs = F.transform(tokens(text), lambda t: stable_hash64(t))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.aggregate(
            hs,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc
            + F.when(h % dim == b, (F.shiftright(h, 30) % 2) * 2 - 1).otherwise(0),
        ).cast("double"),
    )
    norm = F.sqrt(F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm > 0, F.transform(counts, lambda x: x / norm)).otherwise(counts)


def embed_hash(df: DataFrame, text_col: str = "text", out_col: str = "embedding",
               dim: int = 64) -> DataFrame:
    """Hash-embed ``text_col`` into ``out_col`` with ONE sha256 per token.

    Same vectors as :func:`hash_embedding` (the counts are exact signed
    integer sums, so token-major vs bucket-major accumulation is
    value-identical; norm and normalization fold in index order as
    before), but restructured for evaluation cost:

    - the token-hash array is the aggregate SUBJECT (evaluated once per
      row), and the fold scatters each token's +/-1 into its bucket —
      ``tokens`` hashes per row instead of ``dim x tokens``;
    - counts and norm are hoisted into intermediate columns so the final
      normalize expression doesn't re-evaluate the fold 3x (the
      ``F.when`` conditions reference them more than once, which also
      keeps CollapseProject from inlining the expensive subtrees back).

    Measured: the 500-doc probe chain that took ~120 s interpreted drops
    to ~2 s; the DuckDB oracle replay (doc_knn and the e2e pipelines) is
    unchanged because the values are bit-identical.
    """
    cnt_col, nrm_col = f"__{out_col}_cnt", f"__{out_col}_nrm"
    hs = F.transform(tokens(F.col(text_col)), lambda t: stable_hash64(t))
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, h: F.transform(
            acc,
            lambda v, i: v
            + F.when(
                h % dim == i.cast("bigint"),
                ((F.shiftright(h, 30) % 2) * 2 - 1).cast("double"),
            ).otherwise(0.0),
        ),
    )
    with_counts = df.withColumn(cnt_col, counts)
    with_norm = with_counts.withColumn(
        nrm_col,
        F.sqrt(
            F.aggregate(F.col(cnt_col), F.lit(0.0), lambda a, x: a + x * x)
        ),
    )
    return with_norm.withColumn(
        out_col,
        F.when(
            F.col(nrm_col) > 0,
            F.transform(F.col(cnt_col), lambda x: x / F.col(nrm_col)),
        ).otherwise(F.col(cnt_col)),
    ).drop(cnt_col, nrm_col)


def embed_sentence_transformer(
    df: DataFrame,
    model_name: str = "all-MiniLM-L6-v2",
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 64,
    normalize: bool = False,
) -> DataFrame:
    """Real-model embedding via Arrow-batched ``mapInPandas`` (M1).

    ``normalize`` mirrors the reference's ``--normalized`` flag (main.py:19).
    Raises ImportError with a clear message when sentence-transformers is
    absent (this container does not ship it; use ``embed_hash`` for tests).
    """
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "sentence-transformers is not installed; use embed_hash() for a "
            "deterministic dependency-free embedder"
        ) from e

    other_cols = [c for c in df.columns if c != text_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in df.columns]
        + [f"`{out_col}` array<float>"]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        from sentence_transformers import SentenceTransformer

        model = _ST_MODELS.get(model_name)
        if model is None:
            model = _ST_MODELS.setdefault(model_name, SentenceTransformer(model_name))
        for pdf in batches:
            vecs = model.encode(
                pdf[text_col].tolist(),
                batch_size=batch_size,
                normalize_embeddings=normalize,
            )
            pdf = pdf.copy()
            pdf[out_col] = [v.tolist() for v in vecs]
            yield pdf

    _ = other_cols
    return df.mapInPandas(encode, schema=out_schema)
