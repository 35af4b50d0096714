"""Bucketed-table co-location: the 100 TB playbook for repeated joins on
the same key (SURVEY SS4.1 partitioning row). Writing both sides bucketed
by the join key lets Catalyst plan a SortMergeJoin with NO Exchange —
the shuffle is paid once at write time, not per query."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/orders_b")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/lineitem_b")
        .saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = spark.table(ot)
    li = spark.table(lt)
    # disable broadcast so the join strategy choice is about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderpriority").agg(
            F.count("*").alias("n")
        )
        plan = _plan(j)
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, join_section
        # sanity: every lineitem joins exactly one order
        assert j.agg(F.sum("n")).first()[0] == spark.table(lt).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucket_pruning_on_point_lookup(spark, bucketed_tables):
    ot, _ = bucketed_tables
    o = spark.table(ot)
    key = o.select(F.min("o_orderkey")).first()[0]
    # autoBucketedScan drops bucket layout when the planner sees no join/agg
    # benefit; disable it so the point lookup can bucket-prune
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        out = o.filter(F.col("o_orderkey") == key)
        plan = _plan(out)
        # bucket pruning: only 1 of 8 buckets selected at scan time
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert out.count() >= 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
