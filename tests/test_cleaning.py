"""Unit tests for corpus cleaning: PII redaction, repetition signals,
decontamination, chunk dedup (beyond the sf0.01 oracle rows in
tests/test_correctness.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.functions.cleaning import (
    bigrams_col,
    duplicate_token_ratio,
    pii_counts,
    redact_pii,
)
from chatdata_spark.operators.chunks import chunk_dedup, chunk_dedup_reassemble, chunk_documents
from chatdata_spark.operators.decontam import decontaminate


def test_redact_pii_masks_every_kind(spark):
    txt = (
        "write alice.smith+x@corp.example.org or call 555-123-4567 / 555.987.6543, "
        "ssn 123-45-6789, server 192.168.0.12 done"
    )
    df = spark.createDataFrame([(txt,)], "text string")
    row = df.select(
        redact_pii("text").alias("red"), *[v.alias(k) for k, v in pii_counts("text").items()]
    ).first()
    assert row["n_email"] == 1 and row["n_ssn"] == 1
    assert row["n_phone"] == 2 and row["n_ipv4"] == 1
    for needle in ("alice", "555", "123-45", "192.168"):
        assert needle not in row["red"]
    assert row["red"].count("<PHONE>") == 2
    assert "<EMAIL>" in row["red"] and "<SSN>" in row["red"] and "<IPV4>" in row["red"]


def test_redaction_leaves_clean_text_untouched(spark):
    df = spark.createDataFrame([("plain words only here",)], "text string")
    row = df.select(redact_pii("text").alias("red")).first()
    assert row["red"] == "plain words only here"


def test_repetition_signal_exprs(spark):
    df = spark.createDataFrame([("a a a b",), ("x",)], "text string").select(
        F.split("text", " ").alias("w")
    )
    rows = df.select(
        duplicate_token_ratio("w").alias("dup"), bigrams_col("w").alias("bg")
    ).collect()
    assert rows[0]["dup"] == 0.5  # 4 tokens, 2 distinct
    assert rows[0]["bg"] == ["a a", "a a", "a b"]
    assert rows[1]["dup"] == 0.0 and rows[1]["bg"] == []


def test_decontaminate_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear in this row"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "quick brown fox jumps over")], "bench_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, n=5, min_hits=1).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[2]["overlap_frac"] == 0.0


def test_chunk_documents_shapes(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_words=2).orderBy("chunk_idx").collect()
    assert [(r["chunk_idx"], r["chunk_text"]) for r in rows] == [
        (0, "a b"), (1, "c d"), (2, "e"),
    ]


def test_chunk_dedup_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),     # chunks: "a b", "c d"
            (2, "a b x y"),     # "a b" already seen in doc 1
            (3, "a b c d"),     # fully duplicate of doc 1
        ],
        "doc_id long, text string",
    )
    kept = chunk_dedup(df, chunk_words=2).collect()
    assert {(r["doc_id"], r["chunk_text"]) for r in kept} == {
        (1, "a b"), (1, "c d"), (2, "x y"),
    }
    rebuilt = {r["doc_id"]: r for r in chunk_dedup_reassemble(df, chunk_words=2).collect()}
    assert rebuilt[1]["cleaned_text"] == "a b c d"
    assert rebuilt[2]["cleaned_text"] == "x y" and rebuilt[2]["n_chunks_kept"] == 1
    assert rebuilt[3]["cleaned_text"] == "" and rebuilt[3]["n_chunks_kept"] == 0


def test_chunk_dedup_drops_within_doc_repeats(spark):
    df = spark.createDataFrame([(7, "p q p q p q")], "doc_id long, text string")
    kept = chunk_dedup(df, chunk_words=2).collect()
    assert [(r["chunk_idx"], r["chunk_text"]) for r in kept] == [(0, "p q")]
