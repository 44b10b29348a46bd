"""Two-pass Misra-Gries heavy hitters: exactness vs the naive groupBy,
the MG survival guarantee under a tiny counter budget, and the
broadcast-recount plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.operators.heavyhitters import heavy_hitters, token_stream
from tests.conftest import SF_ORACLE


def test_heavy_hitters_exact_vs_naive(spark):
    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    toks = token_stream(d, "text")
    got = {(r.item, r.n) for r in heavy_hitters(toks, min_count=300, k_counters=1024).collect()}
    want = {
        (r.item, r.n)
        for r in toks.groupBy("item").agg(F.count(F.lit(1)).alias("n")).filter("n >= 300").collect()
    }
    assert got == want and len(got) > 0


def test_heavy_hitters_survive_tiny_counter_budget(spark):
    """Skewed synthetic stream, k far below the vocabulary size: every
    item above the MG threshold N/(k+1) must still be found exactly."""
    rows = (
        [("hot",)] * 10000
        + [("warm",)] * 5000
        + [(f"tail{i % 200}",) for i in range(2000)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    n_total = len(rows)
    k = 16
    min_count = n_total // (k + 1) + 1  # strictly above the MG bound
    got = {(r.item, r.n) for r in heavy_hitters(df, min_count=min_count, k_counters=k).collect()}
    assert got == {("hot", 10000), ("warm", 5000)}


def test_heavy_hitters_recount_is_broadcast(spark):
    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    toks = token_stream(d, "text")
    plan = (
        heavy_hitters(toks, min_count=300, k_counters=1024)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
