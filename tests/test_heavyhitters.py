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


def test_weighted_heavy_hitters_exact_vs_naive(spark):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    rev = li.select(
        F.col("l_partkey").alias("item"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("w"),
    )
    from chatdata_spark.operators.heavyhitters import heavy_hitters_weighted

    got = {
        (r.item, r.total_weight)
        for r in heavy_hitters_weighted(rev, "item", "w", min_weight=2_000_000.0).collect()
    }
    want = {
        (r.item, r.total_weight)
        for r in rev.groupBy(F.col("item").cast("string").alias("item"))
        .agg(F.sum(F.col("w").cast("decimal(27,6)")).alias("dw"))
        .filter(F.col("dw") >= 2_000_000.0)
        .select("item", F.col("dw").cast("double").alias("total_weight"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_weighted_heavy_hitters_tiny_budget_and_null_negative_filter(spark):
    """Skewed weighted stream under a tiny counter budget: items above the
    weighted MG bound W/(k+1) survive; NULL and negative weights are
    dropped up front (a negative weight would break the survival bound)."""
    from chatdata_spark.operators.heavyhitters import heavy_hitters_weighted

    rows = (
        [("hot", 10.0)] * 1000          # mass 10,000
        + [("warm", 2.0)] * 2500        # mass 5,000
        + [(f"tail{i % 200}", 1.0) for i in range(2000)]
        + [("hot", None), ("hot", -999999.0)]  # must be ignored
    )
    df = spark.createDataFrame(rows, "item string, w double").repartition(8)
    total = 10_000 + 5_000 + 2_000
    k = 16
    min_w = total / (k + 1) + 1
    got = {(r.item, r.total_weight) for r in
           heavy_hitters_weighted(df, "item", "w", min_weight=min_w, k_counters=k).collect()}
    assert got == {("hot", 10_000.0), ("warm", 5_000.0)}


def test_heavy_hitters_non_string_item_column(spark):
    # ADVICE r6: the candidate schema is '{col} string' — a bigint hot-key
    # column must be cast up front, not crash the Arrow conversion or
    # silently miss the semi-join.
    rows = [(7,)] * 500 + [(i,) for i in range(100)]
    df = spark.createDataFrame(rows, "item long").repartition(4)
    got = {(r.item, r.n) for r in heavy_hitters(df, min_count=400, k_counters=8).collect()}
    assert got == {("7", 501)}


def test_stream_mg_merge_state_bounded_and_superset(spark, tmp_path):
    """The streamed MG summary stays <= k rows after every drain and its
    candidate set covers every item above the N/(k+1) bound regardless of
    the micro-batch split (mergeable-summaries guarantee)."""
    import pyspark.sql.functions as F

    from chatdata_spark.stores.state import VersionedParquetStore
    from chatdata_spark.streaming.incremental import stream_mg_merge

    rows = (
        [("hot",)] * 3000 + [("warm",)] * 1500
        + [(f"tail{i % 400}",) for i in range(4000)]
    )
    df = spark.createDataFrame([(i, w) for i, (w,) in enumerate(rows)], "i long, item string")
    ind, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    store = VersionedParquetStore(spark, str(tmp_path / "store"))
    k = 16
    thirds = 8500 // 3
    for lo, hi in [(0, thirds), (thirds, 2 * thirds), (2 * thirds, 10**9)]:
        df.filter((F.col("i") >= lo) & (F.col("i") < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(ind)
        stream_mg_merge(
            spark, ind, store, ckpt, lambda b: b.select("item"), "i long, item string", k=k
        )
        assert store.read().count() <= k
    cands = {r.item for r in store.read().collect()}
    # N/(k+1) = 8500/17 = 500 — hot (3000) and warm (1500) must survive
    assert {"hot", "warm"} <= cands
