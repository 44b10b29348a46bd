"""Benchmark decontamination for LLM training corpora (north-star
extension; no analogue in the reference — its ingest trusts uploads,
app/backend/chat_bot/tools.py:13-50).

Flags training documents that share word-n-gram content with an evaluation
/ benchmark set (the standard "13-gram overlap" decontamination rule, cf.
the GPT-3 / PaLM data-prep appendices), so they can be dropped or audited
before training.

Scale design (the 100 TB story): the benchmark side is always tiny
relative to the corpus (benchmark suites are at most millions of n-grams),
so its distinct n-gram hash set is **broadcast** — the corpus is streamed
through one scan + one explode with a broadcast hash join, no shuffle of
corpus data, no all-pairs compare. The per-doc aggregation that follows
shuffles only (doc_id, counts) pairs with map-side partial aggregation.
N-grams travel as 64-bit xor-rotate hashes of xxhash64'd words
(operators/dedup.py:shingle_hashes_col), never as raw strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatdata_spark.operators.dedup import _with_shingle_hashes, shingle_hashes_udf


def benchmark_ngram_set(bench: DataFrame, text_col: str = "text", n: int = 13) -> DataFrame:
    """Distinct n-gram hashes of the benchmark set: one column ``sh``.
    Small by construction — safe to broadcast. Same Arrow mix as the corpus
    side (hash values must agree exactly for the overlap join)."""
    return (
        bench.select(
            F.transform(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.xxhash64(t)
            ).alias("__wh")
        )
        .select(F.explode(shingle_hashes_udf(n)(F.col("__wh"))).alias("sh"))
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per-corpus-document benchmark overlap: ``(id, n_shingles, n_hits,
    overlap_frac, contaminated)`` where ``n_hits`` counts the document's
    DISTINCT n-grams that appear anywhere in the benchmark set and
    ``contaminated = n_hits >= min_hits``.

    Exactness: counts are over n-gram *hashes*; two distinct n-grams
    collide with probability ~|grams|²/2⁶⁴ (negligible, deterministic for
    fixed data). All documents are returned (left join onto the broadcast
    set), so the caller can anti-filter in one pass.

    Short-text convention (inherited from shingle_hashes_col's padded
    floor-1 sequence): a document or benchmark line with FEWER than ``n``
    words contributes exactly one whole-text shingle — so short texts
    decontaminate on exact content match (a one-word benchmark answer
    appearing verbatim as a tiny doc IS flagged), rather than the strict
    reading where sub-n texts have no n-grams and can never match. Pinned
    by the property test in tests/test_operator_properties.py.
    """
    sig = _with_shingle_hashes(corpus, id_col, text_col, n, persist=False)
    bset = benchmark_ngram_set(bench, bench_text_col, n).withColumn("__hit", F.lit(1))
    hits = (
        sig.select("id", "sz", F.explode("shh").alias("sh"))
        .join(F.broadcast(bset), "sh", "left")
        .groupBy("id", "sz")
        .agg(F.count("__hit").alias("n_hits"))
    )
    return hits.select(
        F.col("id").alias(id_col),
        F.col("sz").alias("n_shingles"),
        "n_hits",
        F.round(F.col("n_hits") / F.col("sz").cast("double"), 6).alias("overlap_frac"),
        (F.col("n_hits") >= F.lit(min_hits)).alias("contaminated"),
    )
