"""Gopher A1.2 repetition rules (operators/repetition.py): sequential
reference semantics, union-of-spans non-double-counting, threshold
strictness, and distributed ≡ sequential parity."""

import pytest

from chatdata_spark.operators.repetition import (
    DUP_NGRAM_RULES,
    TOP_NGRAM_RULES,
    repetition_stats_py,
)


def test_reference_semantics_hand_example():
    # "a b c d e" repeated twice: every n-gram (n<=5) of the first half
    # reappears, so dup-5 marks ALL words; top-2 gram is any adjacent
    # pair with count 2 — tie broken lexicographically smallest ("a b"
    # and the wraparound "e a" both exist; smallest is "a b").
    ws = "a b c d e a b c d e".split()
    st = repetition_stats_py(ws)
    assert st["total"] == 10
    # top-2: best count is 2 ("a b","b c","c d","d e","e a") -> 2 chars * 2
    assert st["t2"] == 4
    # dup-5: "a b c d e" occurs twice (pos 0 and 5) and every other
    # 5-gram ("b c d e a" etc.) also occurs... only once each. Marked
    # positions = union of the two occurrences = all 10 words.
    assert st["d5"] == 10


def test_union_spans_no_double_count():
    # "x x x x x x": every 5-gram is "x x x x x" (2 occurrences,
    # overlapping at positions 0-4 and 1-5). Union marks all 6 words ->
    # d5 = 6, NOT 10.
    ws = ["x"] * 6
    st = repetition_stats_py(ws)
    assert st["d5"] == 6


def test_no_repetition_all_zero():
    ws = "one two three four five six seven eight nine ten".split()
    st = repetition_stats_py(ws)
    for f, _n, _p in TOP_NGRAM_RULES + DUP_NGRAM_RULES:
        assert st[f] == 0


def test_top_ngram_requires_count_two():
    # every 2-gram unique -> t2 = 0 even though a most-frequent one exists
    ws = "a b c d".split()
    assert repetition_stats_py(ws)["t2"] == 0


def test_threshold_is_strict_greater():
    # fail iff 100*num > pct*total: equality must NOT fail (pinned so the
    # oracle and any future reimplementation agree on boundaries)
    total, pct = 100, 20
    num_eq = pct * total // 100  # 20
    assert not (num_eq * 100 > total * pct)
    assert (num_eq + 1) * 100 > total * pct


def test_spark_matches_reference(spark):
    import re

    from pyspark.sql import functions as F

    from chatdata_spark.operators.repetition import (
        ngram_repetition_stats,
        repetition_fail_flags,
    )

    texts = [
        ("go stop go stop go stop go stop go stop", 1),
        ("the quick brown fox jumps over the lazy dog again and again", 2),
        ("alpha beta gamma delta epsilon alpha beta gamma delta epsilon zeta", 3),
        ("x " * 30, 4),
    ]
    df = spark.createDataFrame(
        [(i, t) for t, i in texts], "doc_id int, text string"
    )
    out = (
        df.select(
            "doc_id",
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0).alias("w"),
        )
        .select("doc_id", ngram_repetition_stats("w").alias("s"))
        .select("doc_id", "s.*")
        .orderBy("doc_id")
        .collect()
    )
    for row in out:
        t = next(t for t, i in texts if i == row["doc_id"])
        ws = re.findall(r"[a-z0-9]+", t.lower())
        exp = repetition_stats_py(ws)
        for k, v in exp.items():
            assert row[k] == v, (row["doc_id"], k, row[k], v)


def test_fail_flags_cross_multiplication(spark):
    from pyspark.sql import functions as F

    from chatdata_spark.operators.repetition import repetition_fail_flags

    # synthetic stats struct: total=100, t2=21 (fails 20%), t3=18 (equality
    # with 18% -> does NOT fail), d5=15 (equality -> no fail), d10=11 (>10%)
    df = spark.createDataFrame([(100, 21, 18, 0, 15, 0, 0, 0, 0, 11)],
                               "total long, t2 long, t3 long, t4 long, d5 long,"
                               " d6 long, d7 long, d8 long, d9 long, d10 long")
    s = df.select(F.struct(*df.columns).alias("s"))
    flags = repetition_fail_flags("s")
    row = s.select(*[v.alias(k) for k, v in flags.items()]).collect()[0]
    assert row["fail_t2"] == 1
    assert row["fail_t3"] == 0
    assert row["fail_d5"] == 0
    assert row["fail_d10"] == 1
