"""BPE merge learning (operators/bpe.py) — semantics beyond the driver
oracle (which replays the full algorithm over sf0.01 in pure Python)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tiny_corpus_hand_computed(spark):
    """Hand-traced example: words {aa: 2, ab: 1}. Round 1 pairs:
    (a,a)=2, (a,</w>)=2, (b,</w>)=1 — tie at 2 broken lexicographically,
    '<' < 'a' so (a,</w>) wins. Round 2: (a,a</w>)=2 wins. Round 3: all
    pairs are hapax (< min_pair_count) — stop."""
    from chatdata_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame([(1, "aa ab"), (2, "aa")], "doc_id long, text string")
    merges = learn_bpe_merges(df, "text", n_merges=10, min_pair_count=2)
    assert merges == [("a", "</w>", 2), ("a", "a</w>", 2)]


def test_merge_list_is_prefix_stable(spark):
    """Determinism: learning n merges then m < n merges yields the same
    prefix — the argmax order cannot depend on how far the loop runs."""
    from chatdata_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the hat of the cat", "a mat and a hat",
             "the the the", "cats in hats"] * 3
        )],
        "doc_id long, text string",
    )
    long = learn_bpe_merges(df, "text", n_merges=8, min_pair_count=2)
    short = learn_bpe_merges(df, "text", n_merges=4, min_pair_count=2)
    assert long[:4] == short


def test_apply_bpe_compresses_and_roundtrips(spark):
    """Encoding invariants: applying the learned merges never increases
    the per-doc symbol count vs the unmerged character stream, and
    concatenating each word's merged symbols (dropping </w>) reconstructs
    the normalized token stream exactly — merges only ever join adjacent
    symbols of the same word."""
    from chatdata_spark.operators.bpe import END, apply_bpe, learn_bpe_merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the hat of the cat", "a mat and a hat"] * 4
        )],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(df, "text", n_merges=6, min_pair_count=2)
    assert merges
    enc = apply_bpe(df, "text", merges).select("doc_id", "text", "bpe_tokens").collect()
    for r in enc:
        import re

        words = re.findall("[a-z0-9]+", r.text.lower())
        chars_plus_markers = sum(len(w) + 1 for w in words)
        assert len(r.bpe_tokens) <= chars_plus_markers
        assert "".join(r.bpe_tokens).replace(END, " ").split() == words
