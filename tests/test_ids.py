"""Identifier-function tests (SURVEY F1): UUIDv5 bit-parity with CPython,
portable-hash parity with its definition."""

import hashlib
import uuid

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.ids import (
    content_id,
    stable_hash64,
    uuid5_udf,
)


def test_uuid5_matches_cpython(spark):
    names = ["42", "hello world", "", "ünïcödé", "12345678901234567890"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.select("name", uuid5_udf(F.col("name")).alias("u")).collect()
    for r in rows:
        assert r.u == str(uuid.uuid5(uuid.NAMESPACE_DNS, r.name)), r.name


def test_uuid5_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "name string")
    assert df.select(uuid5_udf(F.col("name")).alias("u")).first().u is None


def test_stable_hash64_definition(spark):
    vals = ["a", "clone detection", "123"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", stable_hash64(F.col("s")).alias("h")).collect()
    for r in rows:
        want = int(hashlib.sha256(r.s.encode()).hexdigest()[:15], 16)
        assert r.h == want
        assert 0 <= r.h < 2**60


def test_content_id_is_sha256(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(content_id(F.col("s")).alias("h")).first().h
    assert got == hashlib.sha256(b"abc").hexdigest()


def test_round_half_up6_matches_spark_f_round_on_boundaries(spark):
    """The streaming sessionizer folds values in Python with round_half_up6;
    its batch twin uses F.round (Java BigDecimal HALF_UP on the double's
    shortest decimal repr). Pin bit-parity on .5 ties — where Python's
    built-in banker's round() diverges — plus sign and magnitude edges."""
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.ids import (
        round_half_up6,
    )

    vals = (
        [(i + 0.5) / 1_000_000.0 for i in range(-6, 7)]       # x.5 ties
        + [i / 1_000_000.0 for i in (-3, -1, 0, 1, 2, 3)]      # exact ints
        + [0.1234565, 0.1234575, -0.1234565, 1.9999995, 123.456789]
        + [2.5e-6, 3.5e-6, -2.5e-6, -3.5e-6]                   # banker's traps
    )
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        "v", F.round(F.col("v") * 1_000_000).cast("long").alias("r6")
    ).collect()
    for r in rows:
        assert round_half_up6(r.v) == r.r6, r.v
