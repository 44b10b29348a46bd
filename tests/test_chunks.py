

def test_semantic_chunks_partition_words_exactly(spark):
    """Chunks partition each doc's token stream: per-doc sum of n_words
    equals the token count, start_words are the cumulative prefix, and
    every chunk holds >= 1 window."""
    import pyspark.sql.functions as F

    from chatdata_spark.operators.chunks import semantic_chunks
    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    out = semantic_chunks(d, "doc_id", "text", window_words=16).collect()
    toks = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("n"),
        ).collect()
    }
    per_doc: dict = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == {k for k, n in toks.items() if n >= 1}
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert sum(r.n_words for r in rows) == toks[doc_id]
        assert all(r.n_windows >= 1 for r in rows)
        pos = 1
        for r in rows:
            assert r.start_word == pos
            pos += r.n_words


def test_sentence_chunks_split_and_partition(spark):
    """The sentence splitter keeps punctuation with its sentence
    (lookbehind split), drops empty units, and the chunks partition the
    sentence stream exactly — the word-operator invariants in sentence
    units."""
    from chatdata_spark.operators.chunks import semantic_sentence_chunks

    rows = [
        (1, "The cat sat. The dog ran! Was it fast? It was."),
        (2, "One sentence only."),
        (3, "No terminal punctuation at all"),
        (4, ""),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = semantic_sentence_chunks(d, "doc_id", "text", window_sents=2).collect()
    per_doc: dict = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    # doc 4 is empty -> no rows; doc 3 has one unterminated "sentence"
    assert set(per_doc) == {1, 2, 3}
    assert sum(r.n_sents for r in per_doc[1]) == 4
    assert sum(r.n_sents for r in per_doc[2]) == 1
    assert sum(r.n_sents for r in per_doc[3]) == 1
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        pos = 1
        for r in rs:
            assert r.start_sent == pos
            pos += r.n_sents


def test_sentence_chunks_windows_of_two(spark):
    """4 sentences at window_sents=2 -> 2 windows total across chunks;
    abbreviation-free fixture, so the lookbehind boundary is exact."""
    from chatdata_spark.operators.chunks import semantic_sentence_chunks

    d = spark.createDataFrame(
        [(1, "Alpha beta. Gamma delta! Epsilon zeta? Eta theta.")],
        ["doc_id", "text"],
    )
    out = semantic_sentence_chunks(d, "doc_id", "text", window_sents=2).collect()
    assert sum(r.n_windows for r in out) == 2
    assert sum(r.n_sents for r in out) == 4
