"""SCD2 history tracking: change compression, incremental merge ≡ full
rebuild, point-in-time reads. (The driver-facing oracle comparison for
``scd2_history_events`` runs in test_correctness.py like every registered
query.)"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from chatdata_spark.operators.scd import as_of, scd2_from_changelog, scd2_merge
from tests.conftest import SF_ORACLE

SCHEMA = "k long, attr string, ts timestamp, seq long"


def t(m):
    return datetime(2024, 1, 1, m // 60, m % 60)


def test_compression_and_intervals(spark):
    log = spark.createDataFrame(
        [
            (1, "a", t(0), 0),
            (1, "a", t(10), 1),   # no-op change → compressed away
            (1, "b", t(20), 2),
            (1, "b", t(30), 3),   # no-op
            (1, "a", t(40), 4),   # flips back → new version
            (2, None, t(0), 5),   # null attr first row kept
            (2, None, t(5), 6),   # null == null (null-safe) → compressed
            (2, "x", t(9), 7),
        ],
        SCHEMA,
    )
    h = scd2_from_changelog(log, ["k"], "ts", ["attr"], order_cols=["seq"])
    rows = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in h.collect()}
    assert rows == {
        (1, "a", t(0), t(20), False),
        (1, "b", t(20), t(40), False),
        (1, "a", t(40), None, True),
        (2, None, t(0), t(9), False),
        (2, "x", t(9), None, True),
    }


def test_merge_equals_full_rebuild(spark):
    """Incremental merge over real events (two halves) ≡ one-shot build —
    and untouched keys' rows pass through the merge byte-identically."""
    from chatdata_spark.catalog import load_events

    e = (
        load_events(spark, SF_ORACLE)
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_type", "ts", "event_id")
    )
    mid = e.approxQuantile("event_id", [0.5], 0.0)[0]
    first, second = e.filter(F.col("event_id") <= mid), e.filter(F.col("event_id") > mid)

    full = scd2_from_changelog(e, ["user_id"], "ts", ["event_type"], order_cols=["event_id"])
    h1 = scd2_from_changelog(first, ["user_id"], "ts", ["event_type"], order_cols=["event_id"])
    merged = scd2_merge(h1, second, ["user_id"], "ts", ["event_type"], order_cols=["event_id"])

    cols = ["user_id", "event_type", "event_id", "valid_from", "valid_to", "is_current"]
    a = sorted(map(tuple, full.select(cols).collect()))
    b = sorted(map(tuple, merged.select(cols).collect()))
    assert a == b and len(a) > 0


def test_as_of_returns_one_version_per_key(spark):
    log = spark.createDataFrame(
        [(1, "a", t(0), 0), (1, "b", t(20), 1), (1, "c", t(40), 2), (2, "z", t(30), 3)],
        SCHEMA,
    )
    h = scd2_from_changelog(log, ["k"], "ts", ["attr"], order_cols=["seq"])
    got = {(r.k, r.attr) for r in as_of(h, t(25)).collect()}
    assert got == {(1, "b")}  # key 2 not yet born at t(25)
    got40 = {(r.k, r.attr) for r in as_of(h, t(40)).collect()}
    assert got40 == {(1, "c"), (2, "z")}  # valid_from inclusive


def test_single_shuffle_per_build(spark):
    """Both windows partition on the key → exactly one Exchange in the
    build plan (the second window reuses the first's distribution)."""
    from chatdata_spark.catalog import load_events

    e = load_events(spark, SF_ORACLE).select("user_id", "event_type", "ts", "event_id")
    h = scd2_from_changelog(e, ["user_id"], "ts", ["event_type"], order_cols=["event_id"])
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
