"""Distributed bloom semi-join: exactness vs plain semi-join, real
pre-shuffle selectivity, and the no-false-negative invariant."""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.operators.bloomjoin import bloom_might_contain, bloom_semi_join, build_bloom
from tests.conftest import SF_ORACLE


def test_bloom_semi_join_exact(spark):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    hot = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in bloom_semi_join(li, hot, "l_orderkey", n_bits=1 << 16)
        .select("l_orderkey", "l_linenumber").collect()
    )
    want = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.join(hot, "l_orderkey", "left_semi").select("l_orderkey", "l_linenumber").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_has_no_false_negatives_and_bounded_fpr(spark):
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    members = orders.filter(F.col("o_orderkey") % 10 == 0).select("o_orderkey")
    n_members = members.count()
    bloom = build_bloom(members, "o_orderkey", n_bits=1 << 16)
    probed = orders.withColumn(
        "hit", bloom_might_contain(bloom, "o_orderkey", 1 << 16)
    )
    # no false negatives: every member row tests positive
    missed = probed.filter((F.col("o_orderkey") % 10 == 0) & ~F.col("hit")).count()
    assert missed == 0
    # real selectivity: positives stay near the true member fraction
    positives = probed.filter("hit").count()
    total = orders.count()
    assert positives < n_members + 0.05 * total, (positives, n_members, total)


def test_bloom_prefilter_runs_before_the_join(spark):
    """The probe must sit under the join in the plan (scan-stage filter),
    not above it — that's the whole point."""
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    hot = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    plan = (
        bloom_semi_join(li, hot, "l_orderkey", n_bits=1 << 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    join_at = plan.find("Join")
    eval_at = plan.find("ArrowEvalPython")
    assert join_at != -1 and eval_at != -1 and eval_at > join_at, plan
