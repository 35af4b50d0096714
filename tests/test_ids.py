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
