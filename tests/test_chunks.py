

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
