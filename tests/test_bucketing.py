"""Bucketed co-located join: the write-once-shuffle-never-again layout.
Asserts the join plan contains NO Exchange (shuffle) on either side, and
results equal the plain join's."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from chatdata_spark.operators.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "orderkey"), "b_orders", ["orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"), "b_lineitem", ["orderkey"], 8
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """With broadcast off (at fact-to-fact scale neither side broadcasts),
    the join must be a sort-merge over matching buckets with NO shuffle
    Exchange on either side."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, lt, rt, ["orderkey"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, ["orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    want = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r.o_orderstatus, r.n) for r in got} == {(r.o_orderstatus, r.n) for r in want}


def test_bucketed_aggregation_no_shuffle(spark, bucketed_tables):
    """GroupBy on the bucket key also reuses the layout — no Exchange before
    the aggregate."""
    lt, _ = bucketed_tables
    df = spark.table(lt).groupBy("orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
