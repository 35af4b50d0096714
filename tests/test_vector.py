"""Vector-function unit tests (SURVEY F7)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_pandas,
    dot,
    l2_norm,
    l2_normalize,
)


def test_cosine_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first().c
    want = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert got == pytest.approx(want, abs=1e-12)


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first().c is None


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    row = df.select(
        dot(F.col("a"), F.col("a")).alias("d"), l2_norm(F.col("a")).alias("n")
    ).first()
    assert row.d == 25.0
    assert row.n == 5.0


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "a array<double>")
    rows = df.select(l2_normalize(F.col("a")).alias("v")).collect()
    assert math.isclose(sum(x * x for x in rows[0].v) ** 0.5, 1.0, abs_tol=1e-12)
    assert rows[1].v == [0.0, 0.0]  # zero vector passes through


def test_pandas_cosine_agrees_with_expression(spark, embeddings):
    pairs = (
        embeddings.limit(30)
        .select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
        .crossJoin(
            embeddings.limit(5).select(
                F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")
            )
        )
    )
    both = pairs.select(
        F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("expr"),
        F.round(cosine_similarity_pandas(F.col("va"), F.col("vb")), 6).alias("pd"),
    ).collect()
    assert all(r.expr == r.pd for r in both)
