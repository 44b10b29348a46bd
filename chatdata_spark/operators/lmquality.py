"""Corpus-trained bigram-LM perplexity scoring (north-star extension) —
the CCNet-style quality signal ("CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", Wenzek et al. 2020, public
method): score every document by its cross-entropy under an n-gram
language model, then bucket the corpus into head/middle/tail terciles.
CCNet uses a pretrained KenLM; weight files are absent from this
container, so the model here is trained FROM THE CORPUS ITSELF (add-1
smoothed bigram LM) — the same scoring pipeline with a self-contained
estimator, and the seam where a real KenLM would plug in is the
(w1, w2) -> logp table.

Spark-first shape (100 TB posture):
- ONE corpus pass builds the model: bigram counts (one partial-agg
  shuffle on (w1, w2)) and context counts (one on w1); the vocabulary
  size is the only driver scalar;
- scoring joins the document bigram stream against the count tables:
  the bigram table is corpus-vocabulary-sized (shuffle join, AQE
  decides), the context table is vocab-sized (broadcastable);
- determinism: per-bigram log-probs are rounded to 6 digits and summed
  as DECIMAL(18,6) (order-free exact), cross-entropy = exact-sum /
  bigram-count — bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_stream(text_col) -> Column:
    """The shared lowercase-alphanumeric token stream."""
    return F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0)


def _bigrams(ws) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (equal-length slice
    zip — no null padding)."""
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    return F.zip_with(
        F.slice(ws, 1, n1), F.slice(ws, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_cross_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document cross-entropy under the corpus-trained add-1 bigram
    LM: ``-mean(ln p(w2|w1))`` over the doc's bigrams, rounded to 6.
    ``p(w2|w1) = (c(w1,w2) + 1) / (ctx(w1) + V)`` with V the corpus
    vocabulary size. Documents with < 2 tokens carry no bigram and drop
    out (no model opinion on them). Returns (id_col, *extra_cols,
    n_bigrams, cross_entropy)."""
    from pyspark import StorageLevel

    from chatdata_spark.operators.dedup import _spread

    extra_cols = extra_cols or []
    # _spread: the bigram explode is the corpus-sized stage — a
    # 1-partition local scan would serialize it (CLAUDE.md rule)
    src = _spread(df.select(F.col(id_col), *extra_cols, F.col(text_col)))
    # Tokenize ONCE: the regex token stream feeds BOTH the vocabulary
    # aggregate and the bigram explode; without this persist each branch
    # replans the scan and regexp_extract_all runs twice over the corpus
    # text (guide §2.3 — shuffle/scan fewer bytes; same multi-consumer
    # persist convention as tfidf's tf table). The vocab collect below is
    # the action that populates it, so the bigram job reads the cache.
    toks = src.select(
        F.col(id_col), *extra_cols, token_stream(F.col(text_col)).alias("__ws")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bi = (
        toks.select(F.col(id_col), *extra_cols, F.explode(_bigrams(F.col("__ws"))).alias("p"))
        .select(id_col, *extra_cols, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # model build AND scoring read it
    )
    cb = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    ctx = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("ctx"))
    vocab = toks.select(F.explode("__ws").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    v = vocab.collect()[0]["v"]  # the only driver scalar
    # toks has exactly two consumers — the vocab collect above and bi's
    # cache fill. Materialize bi now (the returned query reads it via
    # InMemoryTableScan anyway) and drop toks: holding the full corpus
    # token arrays for the session would accumulate across invocations
    # (r11 ADVICE). unpersist() is non-cascading, so bi's cache survives.
    bi.count()
    toks.unpersist()

    logp = F.round(
        F.log((F.col("cb") + 1.0) / (F.col("ctx") + F.lit(float(v)))), 6
    )
    return (
        bi.join(cb, ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .groupBy(id_col, *extra_cols)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                (-F.sum(logp.cast("decimal(18,6)")).cast("double"))
                / F.count(F.lit(1)),
                6,
            ).alias("cross_entropy"),
        )
    )


def perplexity_buckets(
    scored: DataFrame, id_col: str, n_buckets: int = 3
) -> DataFrame:
    """CCNet's head/middle/tail split: ntile over (cross_entropy, id) —
    bucket 1 = most fluent under the model. A global sort of doc-level
    rows (corpus cardinality, not token cardinality); at extreme scale
    swap in approx-quantile cutpoints, same contract."""
    w = Window.orderBy(F.col("cross_entropy").asc(), F.col(id_col).asc())
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w))
