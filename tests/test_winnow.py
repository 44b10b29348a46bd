"""Winnowing fingerprint tests: the two Schleimer-et-al guarantees
(detection of shared runs >= w+k-1, per-window coverage), the short-doc
single-window rule, and the boilerplate df-cap — beyond the sf0.01
oracle row in tests/test_correctness.py."""

from __future__ import annotations

import random

from chatdata_spark.operators.winnow import winnow_fingerprints, winnow_pairs

K, W = 5, 4


def _rand_doc(rng, n):
    return " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))


def test_detection_guarantee_shared_run(spark):
    """Any two docs sharing a run of >= w+k-1 words must share at least one
    fingerprint hash, wherever the run sits in either doc (randomized
    placements, fixed seeds)."""
    rng = random.Random(7)
    rows = []
    for trial in range(6):
        run = _rand_doc(rng, W + K - 1)  # exactly the guarantee threshold
        a = _rand_doc(rng, rng.randrange(0, 40)) + " " + run + " " + _rand_doc(rng, rng.randrange(0, 40))
        b = _rand_doc(rng, rng.randrange(0, 40)) + " " + run + " " + _rand_doc(rng, rng.randrange(0, 40))
        rows += [(trial * 2, trial, a.strip()), (trial * 2 + 1, trial, b.strip())]
    df = spark.createDataFrame(rows, "doc_id long, trial int, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for trial in range(6):
        shared = by_doc[trial * 2] & by_doc[trial * 2 + 1]
        assert shared, f"trial {trial}: no shared fingerprint for a {W+K-1}-word shared run"


def test_coverage_every_window_has_a_selection(spark):
    """Density guarantee: every window of w consecutive gram positions
    contains at least one selected position."""
    rng = random.Random(11)
    n = 120
    df = spark.createDataFrame([(0, _rand_doc(rng, n))], "doc_id long, text string")
    pos = sorted(r["pos"] for r in winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect())
    m = n - K + 1
    sel = set(pos)
    for s in range(1, m - W + 2):
        assert any(p in sel for p in range(s, s + W)), f"window starting {s} uncovered"


def test_short_doc_single_window(spark):
    """Docs with fewer than w grams (but >= k words) yield exactly one
    fingerprint; docs with < k words yield none."""
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c")], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    assert sum(1 for r in fps if r["doc_id"] == 0) == 1  # m = 2 grams < w
    assert sum(1 for r in fps if r["doc_id"] == 1) == 0


def test_max_df_drops_boilerplate_buckets(spark):
    """A run shared by MORE than max_df docs is boilerplate: its
    fingerprints are dropped, so no pairs are reported from it — while a
    2-doc shared run still pairs."""
    rng = random.Random(13)
    boiler = _rand_doc(rng, 30)
    rows = [(i, (boiler + " " + _rand_doc(rng, 10)).strip()) for i in range(6)]
    pair_run = _rand_doc(rng, 30)
    rows += [(100, pair_run), (101, pair_run + " " + _rand_doc(rng, 5))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_pairs(df, "doc_id", "text", k=K, w=W, max_df=3, min_shared=2).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), f"boilerplate bucket leaked pairs: {pairs}"


def test_fingerprints_deterministic_across_runs(spark):
    """Same input → identical fingerprint sets (no ambient ordering or
    hash-seed dependence — the property the driver oracle relies on)."""
    rng = random.Random(17)
    df = spark.createDataFrame(
        [(i, _rand_doc(rng, 80)) for i in range(10)], "doc_id long, text string"
    )
    a = {(r["doc_id"], r["pos"], r["fp"]) for r in winnow_fingerprints(df, "doc_id", "text").collect()}
    b = {(r["doc_id"], r["pos"], r["fp"]) for r in winnow_fingerprints(df, "doc_id", "text").collect()}
    assert a == b and a
