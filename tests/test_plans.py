"""Physical-plan assertions: the scale properties the engine promises
(SURVEY §4) must be visible in the executed plans, not just intended.
If a refactor silently turns a pushed filter into a post-scan filter or a
broadcast join into a shuffle join, these fail."""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.functions.vector import hash_embed
from chatdata_spark.operators.knn import knn
from chatdata_spark.registry import queries
from tests.conftest import SF_ORACLE

_QS = queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_knn_plans_take_ordered_no_sort(spark):
    """Top-k must be TakeOrderedAndProject (per-partition heap), never a
    global Sort+Limit."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    p = _plan(knn(emb, "embedding", hash_embed("q", 64), k=5, id_col="vec_id"))
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # no global sort operator


def test_knn_filter_pushed_to_scan(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    df = knn(emb, "embedding", hash_embed("q", 64), k=5, where=F.col("label") > 3, id_col="vec_id")
    p = _plan(df)
    assert "PushedFilters: [IsNotNull(label), GreaterThan(label,3)]" in p


def test_q3_uses_broadcast_joins(spark):
    p = _plan(_QS["q3_shipping_priority"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in p


def test_semi_join_is_broadcast_semi(spark):
    p = _plan(_QS["semi_join_orders"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_projection_pruning_reaches_scan(spark):
    """A 2-column projection must read a 2-column schema, not the table."""
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    p = _plan(li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10))
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_ivf_search_prunes_partitions(spark, tmp_path):
    from chatdata_spark.operators.ivf import build_or_load_ivf

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    idx = build_or_load_ivf(spark, emb, str(tmp_path / "ivf"), "vec_id", "embedding", 8)
    df = idx.search(hash_embed("q", 64), k=5, n_probe=2)
    p = _plan(df)
    assert "PartitionFilters: [cluster_id" in p


def test_q1_partial_aggregation(spark):
    """GroupBy must plan partial (map-side) + final agg — the shuffle
    carries 4 groups, not 600k rows."""
    p = _plan(_QS["q1_pricing_summary"](spark, SF_ORACLE))
    assert "partial_" in p.lower() or "HashAggregate" in p
    assert p.count("HashAggregate") >= 2  # partial + final


def test_distance_expression_stays_jvm(spark):
    """The cosine distance in the kNN path must contain no Python UDF
    (BatchEvalPython / ArrowEvalPython) — JVM higher-order functions only."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    p = _plan(knn(emb, "embedding", hash_embed("q", 64), k=5, id_col="vec_id"))
    assert "EvalPython" not in p
