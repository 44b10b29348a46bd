"""Unit/plan tests for the OLAP analytics family (queries/analytics.py,
operators/grouptopk.py). Oracle equivalence runs in test_correctness via
the registry; these cover the parts an oracle can't see: salted-vs-plain
top-k equivalence, parallelism of the salted phase, and the one-Expand
rollup plan shape."""

import pytest
from pyspark.sql import functions as F

from chatdata_spark.operators.grouptopk import grouped_topk
from tests.conftest import SF_ORACLE as SF_DIR


def test_grouped_topk_salted_equals_plain(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    plain = grouped_topk(o, ["o_orderpriority"], order, k=5).collect()
    salted = grouped_topk(
        o, ["o_orderpriority"], order, k=5, salt_on="o_orderkey", n_salts=8
    ).collect()
    key = lambda r: (r["o_orderpriority"], r["rnk"])
    assert sorted(map(tuple, plain), key=lambda t: t) == sorted(map(tuple, salted), key=lambda t: t)
    # exactly k rows per group, ranks 1..k
    by_group = {}
    for r in salted:
        by_group.setdefault(r["o_orderpriority"], []).append(r["rnk"])
    for g, ranks in by_group.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], g


def test_grouped_topk_salt_spreads_work(spark):
    """The salted phase-1 window partitions on (group, salt) — its sort key
    must include the salt column so no single task sorts a whole group."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = grouped_topk(
        o, ["o_orderpriority"], [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3, salt_on="o_orderkey", n_salts=16,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # phase-1 partitioning includes the salt


def test_rollup_single_expand_single_shuffle(spark):
    from chatdata_spark.queries.analytics import rollup_revenue_levels

    df = rollup_revenue_levels(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    # one shuffle for the agg + one for the final orderBy, nothing more
    assert plan.count("Exchange") <= 2


def test_percentile_disc_values_are_data_elements(spark):
    from chatdata_spark.queries.analytics import percentile_disc_price_by_flag

    out = percentile_disc_price_by_flag(spark, SF_DIR).collect()
    prices = {
        r["l_extendedprice"]
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_extendedprice").distinct().collect()
    }
    for r in out:
        for c in ("p25", "p50", "p75", "p99"):
            assert r[c] in prices  # discrete percentile: always a real element
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p99"]
