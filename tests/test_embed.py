"""Embedder tests (SURVEY M1): deterministic hash embedder; gated real model."""

import math

import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.embed import (
    embed_hash,
    embed_sentence_transformer,
)


def test_hash_embedding_shape_and_norm(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r.embedding for r in embed_hash(df, dim=32).collect()}
    assert len(out[1]) == 32
    assert math.isclose(sum(x * x for x in out[1]) ** 0.5, 1.0, abs_tol=1e-9)
    assert out[2] == [0.0] * 32  # empty text -> zero vector, not NaN


def test_hash_embedding_deterministic(spark):
    df = spark.createDataFrame([(1, "same input text here")], "doc_id long, text string")
    a = embed_hash(df).first().embedding
    b = embed_hash(df).first().embedding
    assert a == b


def test_hash_embedding_similar_texts_close(spark, documents):
    """Same text -> identical vectors; disjoint vocab -> lower similarity."""
    df = spark.createDataFrame(
        [
            (1, "spark query engine distributed execution"),
            (2, "spark query engine distributed execution"),
            (3, "zebra quartz violin umbrella xylophone"),
        ],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: r.embedding for r in embed_hash(df).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num  # vectors are unit-norm

    assert cos(vecs[1], vecs[2]) == pytest.approx(1.0, abs=1e-9)
    assert cos(vecs[1], vecs[3]) < 0.9


def test_sentence_transformer_gated(spark):
    df = spark.createDataFrame([(1, "text")], "doc_id long, text string")
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers installed; gate not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="embed_hash"):
        embed_sentence_transformer(df)
