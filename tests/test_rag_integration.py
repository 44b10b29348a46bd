"""Full retrieval-pipeline integration: the reference's end-to-end story
(SURVEY §3) on our engine in one flow — ingest → validate → embed → store →
index → filtered retrieve → Document output."""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.catalog import AttributeInfo
from chatdata_spark.functions.vector import hash_embed, make_embed_text_udf
from chatdata_spark.operators.ivf import build_or_load_ivf
from chatdata_spark.plans.self_query import SelfQueryCompiler, and_, gte, in_
from chatdata_spark.sources.ingest import validate_vector_dim
from chatdata_spark.stores.state import VersionedParquetStore
from tests.conftest import SF_SMOKE

DIM = 16


def test_rag_pipeline_end_to_end(spark, tmp_path):
    # 1. ingest: raw docs → embedded, dim-validated corpus
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    embedded = docs.withColumn("vector", make_embed_text_udf(DIM)(F.col("text")))
    valid, rejected = validate_vector_dim(embedded, "vector", DIM)
    assert rejected.count() == 0

    # 2. persist as a versioned corpus table (upsert-capable)
    store = VersionedParquetStore(spark, str(tmp_path / "corpus"))
    store.write(valid)

    # 3. index build (S6 role)
    idx = build_or_load_ivf(
        spark, store.read(), str(tmp_path / "ivf"), "doc_id", "vector", n_clusters=8
    )

    # 4. self-query retrieval: NL-filter AST → Column, then ANN (§3.2)
    attrs = (AttributeInfo("n_chars", "int"), AttributeInfo("lang", "string"))
    ast = and_(gte("n_chars", 150), in_("lang", ("en", "fr")))
    where = SelfQueryCompiler(attrs).compile(ast)
    q = hash_embed("what is a merge join", DIM)
    hits = idx.search(q, k=5, n_probe=idx.n_clusters, where=where,
                      select=["doc_id", "text", "lang", "source", "n_chars"])
    rows = hits.collect()
    assert len(rows) == 5
    assert all(r.n_chars >= 150 and r.lang in ("en", "fr") for r in rows)
    dists = [r.dist for r in rows]
    assert dists == sorted(dists)

    # 5. Document projection (S9): page_content + metadata for the LLM stage
    documents = hits.select(
        F.col("text").alias("page_content"),
        F.struct("doc_id", "lang", "source", "n_chars", "dist").alias("metadata"),
    ).collect()
    assert all(d.page_content and d.metadata.doc_id is not None for d in documents)

    # 6. incremental re-ingest of an updated doc: upsert + fresh search sees it
    updated = valid.filter(F.col("doc_id") == rows[0].doc_id).withColumn(
        "text", F.lit("updated content entirely different now")
    ).withColumn("vector", make_embed_text_udf(DIM)(F.col("text")))
    store.upsert(updated, ["doc_id"], "n_chars")
    assert store.read().count() == valid.count()  # replaced, not appended


def test_embed_udf_memoized_plans_cache_equal(spark):
    """make_embed_text_udf must return the SAME UDF object per dim (the
    CacheManager plan-equality rule): a fresh @pandas_udf per call makes
    otherwise-identical plans unequal, so a persisted embed frame would
    re-compute on every invocation (r10 verdict item 5)."""
    assert make_embed_text_udf(64) is make_embed_text_udf(64)
    assert make_embed_text_udf(16) is not make_embed_text_udf(64)

    df = spark.createDataFrame([("a",), ("b",)], ["text"])
    p1 = df.withColumn("v", make_embed_text_udf(32)(F.col("text")))
    p2 = df.withColumn("v", make_embed_text_udf(32)(F.col("text")))
    # sameSemantics is exactly the CacheManager's plan-equality question
    assert p1.sameSemantics(p2)
