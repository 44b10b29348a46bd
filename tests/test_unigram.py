"""Unigram-LM tokenizer training (operators/unigram.py): distributed
hard-EM equals the sequential reference, segmentation invariants,
vocabulary composition."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from chatdata_spark.operators.unigram import (
    train_unigram_reference,
    train_unigram_vocab,
    viterbi_pieces,
)
from tests.conftest import SF_SMOKE


def test_viterbi_segmentation_properties():
    logp = {p: math.log(c) - math.log(10) for p, c in
            {"a": 2, "b": 2, "ab": 3, "ba": 1, "aba": 2}.items()}
    pieces = viterbi_pieces("ababa", logp, 3)
    assert "".join(pieces) == "ababa"
    # best path prefers high-prob multi-char pieces over char spelling
    score = sum(logp[p] for p in pieces)
    char_score = sum(logp[c] for c in "ababa")
    assert score >= char_score
    # unsegmentable chars never occur when all singles present
    assert all(p in logp for p in pieces)
    assert viterbi_pieces("", logp, 3) == []


def test_distributed_training_equals_reference(spark):
    """The Spark hard-EM (Arrow segmentation + piece aggregate per
    round) must produce the SAME integer vocabulary as the sequential
    reference — counts are order-free integer sums, Viterbi is shared."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        r.piece: r.cnt
        for r in train_unigram_vocab(
            d, "text", vocab_size=200, max_piece_len=4,
            n_candidates=1000, em_iters=2,
        ).collect()
    }
    wf = {
        r.word: r.freq
        for r in d.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
            ).alias("word")
        ).groupBy("word").count().withColumnRenamed("count", "freq").collect()
    }
    want = train_unigram_reference(
        wf, vocab_size=200, max_piece_len=4, n_candidates=1000, em_iters=2
    )
    assert got == want


def test_vocab_contains_all_single_chars_and_multichar_pieces(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = train_unigram_vocab(
        d, "text", vocab_size=200, max_piece_len=4,
        n_candidates=1000, em_iters=2,
    ).collect()
    pieces = {r.piece for r in out}
    # every char of the token stream stays segmentable
    rows = d.select(
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("w")
    ).collect()
    chars = {c for r in rows for c in r.w}
    assert chars <= pieces
    assert any(len(p) >= 2 for p in pieces)
    assert all(r.cnt > 0 for r in out)


def test_piece_counts_matches_sequential(spark):
    import math
    import re

    from chatdata_spark.operators.unigram import (
        train_unigram_reference,
        unigram_piece_counts,
        viterbi_pieces,
    )

    rows = [
        (1, "en", "the cat sat on the mat the cat"),
        (2, "en", "a cat and a mat and a hat"),
        (3, "de", "der hut der hut der hut ist gut"),
    ]
    wf: dict = {}
    for _i, _l, t in rows:
        for w in re.findall(r"[a-z0-9]+", t):
            wf[w] = wf.get(w, 0) + 1
    counts = train_unigram_reference(wf, vocab_size=30, max_piece_len=3,
                                     n_candidates=100, em_iters=2)
    total = sum(counts.values())
    logp = {p: math.log(c) - math.log(total) for p, c in counts.items()}
    exp: dict = {}
    for _i, lang, t in rows:
        for w in re.findall(r"[a-z0-9]+", t):
            exp[lang] = exp.get(lang, 0) + len(viterbi_pieces(w, logp, 3))

    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    got = {
        r["grp"]: r["total_pieces"]
        for r in unigram_piece_counts(df, "text", counts, max_piece_len=3,
                                      group_col="lang").collect()
    }
    assert got == exp
