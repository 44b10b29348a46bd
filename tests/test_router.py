"""Transparent index routing: routed template queries equal the translated
full-scan path (full probe), prune partitions, and non-template queries
fall through untouched."""

from __future__ import annotations

import pytest

from chatdata_spark.operators.ivf import build_or_load_ivf
from chatdata_spark.plans.router import VectorQueryRouter
from chatdata_spark.plans.vector_sql import VectorSQLDialect
from tests.conftest import SF_ORACLE

SQL = """
SELECT vec_id, label FROM embeddings
PREWHERE label != 3
ORDER BY DISTANCE(embedding, NeuralArray(router test)) AS dist ASC, vec_id ASC
LIMIT 7
"""


@pytest.fixture(scope="module")
def router(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    emb.createOrReplaceTempView("embeddings")
    idx = build_or_load_ivf(
        spark, emb, str(tmp_path_factory.mktemp("ivf")), "vec_id", "embedding", n_clusters=8
    )
    dialect = VectorSQLDialect(dim=64, array_columns=("embedding",))
    return VectorQueryRouter(dialect, {"embeddings": idx})


def test_routed_equals_translated_full_scan(spark, router):
    routed = [(r.vec_id, r.label, r.dist) for r in router.execute(spark, SQL).collect()]
    unrouted = [
        (r.vec_id, r.label, r.dist)
        for r in spark.sql(router.dialect.translate(SQL)).collect()
    ]
    assert routed == unrouted
    assert len(routed) == 7
    assert all(r[1] != 3 for r in routed)


def test_routed_plan_prunes_partitions(spark, router):
    pruned = VectorQueryRouter(router.dialect, router.indexes, n_probe=2)
    df = pruned.execute(spark, SQL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster_id" in plan
    rows = df.collect()
    assert len(rows) == 7  # enough candidates even at n_probe=2


def test_non_template_falls_through(spark, router):
    df = router.execute(spark, "SELECT count() AS n FROM embeddings WHERE label = 1")
    assert df.collect()[0].n > 0


def test_unindexed_table_falls_through(spark, router):
    spark.read.parquet(f"{SF_ORACLE}/documents.parquet").createOrReplaceTempView("documents")
    df = router.execute(
        spark,
        "SELECT doc_id FROM documents ORDER BY length(text) DESC LIMIT 3",
    )
    assert df.count() == 3
