"""Unit tests for declarative data-quality validation (beyond the sf0.01
oracle row in tests/test_correctness.py): known-violation counts on a
synthetic frame, and the one-scan plan property for row rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.operators.quality import (
    quality_report,
    referential_violations,
    row_rule_violations,
    uniqueness_violations,
)


def _frame(spark):
    rows = [
        (1, 10.0, "a@b.co"),
        (2, -3.0, None),       # range violation + null violation
        (3, 200.0, "x@y.io"),  # range violation
        (3, 5.0, "dup@k.ey"),  # duplicate id
        (4, None, "n@n.nl"),   # null amount -> range rule must NOT fire on null
    ]
    return spark.createDataFrame(rows, "id int, amount double, email string")


def test_row_rules_single_pass_counts(spark):
    df = _frame(spark)
    rep = row_rule_violations(
        df,
        {
            "amount_range": (F.col("amount") < 0) | (F.col("amount") > 100),
            "email_null": F.col("email").isNull(),
            "never_fires": F.col("id") < 0,
        },
    )
    got = {r["rule"]: r["n_violations"] for r in rep.collect()}
    assert got == {"amount_range": 2, "email_null": 1, "never_fires": 0}
    # all rules compile into ONE aggregate over ONE scan: a single
    # HashAggregate pair, no join, no union of scans
    plan = rep._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints the plan twice
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 1
    assert "Join" not in plan


def test_uniqueness_and_referential(spark):
    df = _frame(spark)
    uniq = uniqueness_violations(df, ["id"]).first()
    assert (uniq["rule"], uniq["n_violations"]) == ("unique_id", 1)

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pid int")
    ref = referential_violations(df, parent, "id", "pid").first()
    assert ref["n_violations"] == 1  # id=4 orphan


def test_quality_report_union_shape(spark):
    df = _frame(spark)
    rep = quality_report(
        [
            row_rule_violations(df, {"email_null": F.col("email").isNull()}),
            uniqueness_violations(df, ["id"]),
        ]
    )
    assert rep.columns == ["rule", "n_violations"]
    assert rep.count() == 2


def test_profile_table_approx_avoids_expand(spark):
    """distinct='approx' must fold into plain partial aggregation — no
    Expand row-multiply — while exact mode keeps one Expand; both answer
    from one scan (one Aggregate chain, no join/union of scans)."""
    from chatdata_spark.operators.profile import profile_table
    from tests.conftest import SF_ORACLE

    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    cols = ["o_custkey", "o_totalprice", "o_orderstatus"]
    exact_plan = profile_table(o, cols)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_table(o, cols, distinct="approx")._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    assert exact_plan.count("Scan parquet") == 1
    assert approx_plan.count("Scan parquet") == 1
    # approx counts are sane (within 10% on a 1.5k-row table)
    got = {r.column: r for r in profile_table(o, cols, distinct="approx").collect()}
    want = {r.column: r for r in profile_table(o, cols).collect()}
    for c in cols:
        assert abs(got[c].n_distinct - want[c].n_distinct) <= max(1, int(0.1 * want[c].n_distinct))
