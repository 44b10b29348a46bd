"""PMI phrase mining — collocation scoring over the corpus bigram stream.

Phrase detection (word2vec's phrase pass, Mikolov et al. 2013; the
"new_york" → token merge every tokenizer pipeline runs before training)
ranks adjacent word pairs by pointwise mutual information:

    PMI(x, y) = ln( p(x,y) / (p(x) · p(y)) )
              = ln( (c_xy · N_t · N_t) / (N_b · c_x · c_y) )

with c_xy the bigram count, c_x/c_y unigram counts, N_t total tokens and
N_b total bigrams. High-PMI pairs co-occur far more than chance — the
phrases worth fusing into single tokens before BPE (operators/bpe.py
learns merges from exactly this kind of signal).

Scale shape: the corpus-sized stages are the two explodes over ONE
persisted tokenized frame (tokenize once — the substring-dedup lesson);
both groupBys are map-side combined with vocabulary-sized output. The
min_count filter prunes the bigram table BEFORE any join, and the two
unigram lookups broadcast (vocabulary ≪ corpus). N_t / N_b are 1-row
aggregates broadcast into the projection — no driver collect.

Determinism: counts are exact longs; the PMI double is ONE fixed
operand-order expression (each IEEE multiply/divide is correctly rounded,
so identical operand order ⇒ bit-identical doubles in Spark and DuckDB),
rounded to 6 — the same log-parity recipe as lmquality.py and
tfidf_top_terms.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatdata_spark.operators.lmquality import _bigrams, token_stream


def pmi_top_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Top-k adjacent word pairs by PMI among bigrams seen ≥ ``min_count``
    times → (w1, w2, cxy, pmi), ties broken on (w1, w2)."""
    from chatdata_spark.operators.dedup import _spread

    tk = (
        _spread(df.select(F.col(text_col)))
        .select(token_stream(F.col(text_col)).alias("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # unigram AND bigram pass read it
    )
    uni = tk.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    bi = (
        tk.select(F.explode(_bigrams(F.col("t"))).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    totals = (
        uni.agg(F.sum("c").alias("nt"))
        .crossJoin(bi.agg(F.sum("cxy").alias("nb")))
    )
    pmi = F.round(
        F.log(
            ((F.col("cxy").cast("double") * F.col("nt")) * F.col("nt"))
            / ((F.col("nb").cast("double") * F.col("cx")) * F.col("cy"))
        ),
        6,
    )
    return (
        bi.filter(F.col("cxy") >= min_count)
        .join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("cx"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("cy"))), "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "cxy", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )
