"""Count-Min sketch tests: upper-bound estimates, zero-for-absent,
mergeability by counter summation."""

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.sketch import (
    count_min_build,
    count_min_estimate,
)


def _counts(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k string")


def test_cms_estimates_upper_bound_exact(spark):
    rows = ["a"] * 7 + ["b"] * 3 + ["c"]
    df = _counts(spark, rows)
    sketch = count_min_build(df, "k")
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "k string")
    got = {r.k: r.est for r in count_min_estimate(sketch, probes, "k").collect()}
    exact = {"a": 7, "b": 3, "c": 1, "zz": 0}
    for k, n in exact.items():
        assert got[k] >= n, k            # CMS never under-counts
    # d=4, w=1024, 11 increments: collisions are absent for this input
    assert got == exact


def test_cms_merge_by_counter_sum(spark):
    """sketch(A union B) == sum of counters of sketch(A) and sketch(B) —
    the property that lets per-partition/per-corpus sketches combine with
    a plain groupBy-sum instead of a rebuild."""
    a = _counts(spark, ["x"] * 5 + ["y"])
    b = _counts(spark, ["x"] * 2 + ["z"] * 4)
    merged = (
        count_min_build(a, "k")
        .unionByName(count_min_build(b, "k"))
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    full = count_min_build(a.unionByName(b), "k")
    as_set = lambda df: {(r.row_i, r.bucket, r.cnt) for r in df.collect()}  # noqa: E731
    assert as_set(merged) == as_set(full)
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    got = {r.k: r.est for r in count_min_estimate(merged, probes, "k").collect()}
    assert got == {"x": 7, "y": 1, "z": 4}
