"""Bigram-LM perplexity scoring (operators/lmquality.py) — semantics
beyond the driver oracle (which replays training + scoring in DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_fluent_doc_scores_below_disfluent(spark):
    """A doc made of the corpus's dominant bigrams must score LOWER
    cross-entropy than a doc of bigrams seen nowhere else (the signal
    CCNet filters on)."""
    from chatdata_spark.operators.lmquality import bigram_cross_entropy

    corpus = ["the cat sat", "the cat ran", "the cat slept"] * 5 + [
        "zig boing wump",  # doc 15: hapax bigrams only
    ]
    scored = {r.doc_id: r.cross_entropy
              for r in bigram_cross_entropy(_frame(spark, corpus), "doc_id").collect()}
    assert scored[0] < scored[15]


def test_short_docs_drop_out_and_buckets_balance(spark):
    from chatdata_spark.operators.lmquality import (
        bigram_cross_entropy,
        perplexity_buckets,
    )

    corpus = ["one", ""] + ["a b c d e f"] * 9  # 2 docs with <2 tokens
    scored = bigram_cross_entropy(_frame(spark, corpus), "doc_id")
    assert scored.count() == 9
    b = perplexity_buckets(scored, "doc_id", n_buckets=3)
    sizes = {r.bucket: r.n for r in
             b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {1: 3, 2: 3, 3: 3}


def test_deterministic_across_runs(spark):
    from chatdata_spark.operators.lmquality import bigram_cross_entropy

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted((r.doc_id, r.cross_entropy)
               for r in bigram_cross_entropy(d, "doc_id").collect())
    b = sorted((r.doc_id, r.cross_entropy)
               for r in bigram_cross_entropy(d, "doc_id").collect())
    assert a == b
