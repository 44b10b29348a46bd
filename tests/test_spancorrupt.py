"""Span-corruption planning (operators/spancorrupt.py): walk invariants,
Spark ≡ sequential parity, corruption-rate sanity."""

from chatdata_spark.operators.spancorrupt import (
    MAX_SPAN,
    corruption_plan_py,
)


def _spans_of(doc_id, words):
    """Re-derive the full span list (the py twin only previews 3)."""
    import hashlib

    from chatdata_spark.operators.spancorrupt import START_THRESHOLD

    n = len(words)
    spans = []
    i = 0
    while i < n:
        h = int(hashlib.md5(f"sc|{doc_id}|{i}".encode()).hexdigest()[:8], 16)
        if h < START_THRESHOLD:
            ln = 1 + int(
                hashlib.md5(f"scl|{doc_id}|{i}".encode()).hexdigest()[:8], 16
            ) % MAX_SPAN
            ln = min(ln, n - i)
            spans.append((i + 1, ln))
            i += ln + 1
        else:
            i += 1
    return spans


def test_spans_never_adjacent_or_overlapping():
    words = [f"w{i}" for i in range(2000)]
    for doc_id in (1, 7, 42):
        spans = _spans_of(doc_id, words)
        assert spans, "2000 tokens at 5% start rate must produce spans"
        for (s1, l1), (s2, _l2) in zip(spans, spans[1:]):
            assert s2 > s1 + l1, "one-token gap violated"


def test_counts_consistent():
    words = [f"w{i}" for i in range(500)]
    nt, ns, nm, prev = corruption_plan_py(3, words)
    spans = _spans_of(3, words)
    assert nt == 500
    assert ns == len(spans)
    assert nm == sum(l for _s, l in spans)
    assert prev == ",".join(f"{s}:{l}" for s, l in spans[:3])


def test_corruption_rate_near_target():
    # 5% starts x mean 3 length ~ 15% masked; loose band over a large doc
    words = [f"w{i}" for i in range(20000)]
    nt, ns, nm, _ = corruption_plan_py(11, words)
    assert 0.08 < nm / nt < 0.22


def test_empty_and_tiny_docs():
    assert corruption_plan_py(1, []) == (0, 0, 0, "")
    nt, ns, nm, _ = corruption_plan_py(1, ["a"])
    assert nt == 1 and nm <= 1


def test_spark_matches_sequential(spark):
    from pyspark.sql import functions as F

    from chatdata_spark.operators.spancorrupt import span_corruption_plan

    rows = [(i, " ".join(f"tok{j}" for j in range(40 + i * 13))) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        df.select(
            "doc_id",
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0).alias("w"),
        )
        .select("doc_id", span_corruption_plan("doc_id", "w").alias("s"))
        .select("doc_id", "s.*")
        .orderBy("doc_id")
        .collect()
    )
    import re

    for r in got:
        text = next(t for i, t in rows if i == r["doc_id"])
        ws = re.findall(r"[a-z0-9]+", text.lower())
        nt, ns, nm, prev = corruption_plan_py(r["doc_id"], ws)
        assert (r["nt"], r["ns"], r["nm"], r["prev"]) == (nt, ns, nm, prev)
