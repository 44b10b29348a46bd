"""DSIR-style importance resampling for training-data selection
(north-star extension; "Data Selection for Language Models via Importance
Resampling", Xie et al. 2023 — public method): score every raw document by
how much more likely its hashed n-gram profile is under a TARGET corpus
distribution than under the raw corpus distribution, then resample with
the Gumbel top-k trick so selection is probabilistic in principle yet
fully deterministic here (the Gumbel noise derives from a salted md5 of
the document key — the repo's hash-not-RNG sampling convention,
operators/sampling.py).

Model (the paper's bag-of-hashed-ngrams estimator):
- features: unigrams + bigrams of the lowercase-alphanumeric token stream
  (the tokenization shared with operators/textsearch.py), hashed into
  ``m`` buckets;
- bucket distributions: add-1-smoothed p (target) and q (raw);
- log importance weight of a doc: sum over its gram stream of
  ``ln p_b - ln q_b`` (per-bucket log-ratio);
- selection key: ``logw + Gumbel(u)`` with ``u`` a deterministic uniform
  per doc; global top-k by the key IS a weighted sample without
  replacement (Gumbel-max).

Spark-first plan shape (100 TB posture):
- gram extraction + md5 bucketing are scan-stage JVM expressions (one
  Generate per doc; md5 keeps the oracle cross-engine — swap
  ``xxhash64 % m`` in for raw throughput when no external oracle is
  needed, the bucketing contract is the only coupling);
- the bucket log-ratio table is ``m`` rows — built ENGINE-side with two
  partial-agg shuffles over the gram streams (no driver collect of
  counts; only the two stream totals come back as scalars) and
  broadcast back into the per-doc join;
- per-doc weights: one explode + broadcast join + one groupBy(doc)
  shuffle — cost linear in corpus tokens, like every text operator here;
- determinism discipline: per-bucket log-ratios are rounded to 6 digits
  and summed as DECIMAL(18,6) (order-free exact sum), so weights are
  bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chatdata_spark.operators.sampling import BUCKETS, hash_bucket


def _gram_stream(text_col) -> Column:
    """array<string> of unigrams + space-joined bigrams of the token
    stream (zip of the stream with its shift — equal-length slices, so no
    null padding)."""
    ws = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0)
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(ws, 1, n1), F.slice(ws, 2, n1), lambda a, b: F.concat_ws(" ", a, b)
    )
    return F.concat(ws, bi)


def _bucket(gram: Column, m: int) -> Column:
    """md5-prefix bucket in [0, m) — every SQL engine agrees (the
    operators/sampling.py convention)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint") % F.lit(m)
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    m: int = 256,
) -> DataFrame:
    """(id_col, logw): add-1-smoothed hashed-bigram log importance weight
    of every raw doc with at least one token. Engine-side except the two
    gram-stream totals (scalars)."""
    from pyspark import StorageLevel

    from chatdata_spark.operators.dedup import _spread

    spark = raw.sparkSession
    # _spread: the gram explode + md5 pass is the corpus-sized stage — a
    # 1-partition local scan would serialize it (CLAUDE.md rule).
    # persisted: BOTH the bucket histogram and the per-doc weight join
    # consume the raw gram stream — without the persist each consumer
    # replans the scan + explode + md5 pass (the _with_shingle_hashes
    # pattern; measured 3.0 s -> ~1 s at sf0.1)
    g_raw = (
        _spread(raw.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(_gram_stream(F.col(text_col))).alias("g"))
        .select(id_col, _bucket(F.col("g"), m).alias("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    g_tgt = (
        _spread(target.select(F.col(text_col)))
        .select(F.explode(_gram_stream(F.col(text_col))).alias("g"))
        .select(_bucket(F.col("g"), m).alias("b"))
    )

    # m-row count tables, persisted so the stream totals (tiny follow-up
    # aggs) reuse them instead of re-scanning the gram streams
    ct = g_tgt.groupBy("b").agg(F.count(F.lit(1)).alias("ct")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cr = g_raw.groupBy("b").agg(F.count(F.lit(1)).alias("cr")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tt = ct.agg(F.sum("ct")).collect()[0][0] or 0  # two scalars — the only
    rt = cr.agg(F.sum("cr")).collect()[0][0] or 0  # driver-side values
    lr = (
        spark.range(m)
        .select(F.col("id").alias("b"))
        .join(ct, "b", "left")
        .join(cr, "b", "left")
        .select(
            "b",
            F.round(
                F.log((F.coalesce("ct", F.lit(0)) + 1.0) / F.lit(float(tt + m)))
                - F.log((F.coalesce("cr", F.lit(0)) + 1.0) / F.lit(float(rt + m))),
                6,
            ).alias("lr"),
        )
    )
    return (
        g_raw.select(id_col, "b")
        .join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("lr").cast("decimal(18,6)")).cast("double").alias("logw"))
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 50,
    m: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-k selection over the importance weights: key =
    ``logw - ln(-ln(u))`` with ``u = (md5_bucket(salt||id)+0.5)/2^32`` —
    a deterministic weighted sample without replacement of size k.
    Returns raw's rows (id order tie-broken) with (logw, sel_key)."""
    w = dsir_log_weights(raw, target, id_col, text_col, m)
    u = (hash_bucket(id_col, salt) + F.lit(0.5)) / F.lit(float(BUCKETS))
    keyed = raw.join(w, id_col).withColumn(
        "sel_key", F.round(F.col("logw") + (-F.log(-F.log(u))), 6)
    )
    return keyed.orderBy(F.col("sel_key").desc(), F.col(id_col).asc()).limit(k)
