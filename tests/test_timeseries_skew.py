"""Hot-key skew mitigation for the window-based timeseries operators:
time-sliced salting must (a) actually split a hot key across >1 window
partition and (b) produce output identical to the unsalted plan — the
boundary merge pass is exact, not approximate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from chatdata_spark.operators.timeseries import asof_join, sessionize


def _skewed_events(spark, n_hot=2000, n_cold=10):
    """One user with 90%+ of events (monotone ts with occasional >gap
    jumps), a few cold users — the shape that serializes onto one task
    without salting."""
    rows = []
    t = 0.0
    for i in range(n_hot):
        t += 3600.0 * 3 if i % 50 == 49 else 60.0  # every 50th gap breaks a session
        rows.append(("hot", t, i))
    for u in range(n_cold):
        for i in range(20):
            rows.append((f"cold{u}", 1e6 + u * 1e5 + i * 60.0, i))
    df = spark.createDataFrame(rows, "user string, tsn double, seq int")
    return df.withColumn("ts", F.timestamp_seconds("tsn")).drop("tsn")


@pytest.fixture(scope="module")
def skewed(spark):
    return _skewed_events(spark).cache()


def test_sessionize_salted_equals_unsalted(spark, skewed):
    base = {
        (r.user, r.seq): r.session_idx
        for r in sessionize(skewed, "user", "ts", gap_minutes=30, order_tiebreak="seq").collect()
    }
    salted = {
        (r.user, r.seq): r.session_idx
        for r in sessionize(
            skewed, "user", "ts", gap_minutes=30, order_tiebreak="seq", slice_width=6 * 3600.0
        ).collect()
    }
    assert salted == base
    # the hot key really is spread over many window partitions
    n_slices = (
        skewed.filter(F.col("user") == "hot")
        .select(F.floor(F.unix_timestamp("ts") / (6 * 3600.0)))
        .distinct()
        .count()
    )
    assert n_slices > 10


def test_asof_salted_equals_unsalted(spark, skewed):
    left = skewed.select("user", "ts", "seq")
    right = (
        skewed.filter(F.col("seq") % 7 == 0)
        .select("user", "ts", (F.col("seq") * 100).alias("val"))
    )
    kw = dict(on="user", ts_col="ts", payload_cols=["val"], tie_break="val")
    base = {
        (r.user, r.seq): (r.asof_ts, r.asof_val)
        for r in asof_join(left, right, **kw).collect()
    }
    salted = {
        (r.user, r.seq): (r.asof_ts, r.asof_val)
        for r in asof_join(left, right, slice_width=6 * 3600.0, **kw).collect()
    }
    assert salted == base
    assert any(v[1] is not None for v in base.values())
    # carry-in must cross empty slices: some matches come from earlier slices
    crossed = sum(
        1
        for (u, _), (ats, _) in base.items()
        if u == "hot" and ats is not None
    )
    assert crossed > 0


def test_bounded_range_join_keyless(spark):
    """equi_keys=[]: the bounded path numbers the right side under a
    constant key (a keyless bounded interval join IS a global order
    statistic — single numbering task by construction, documented) and
    must still return exactly the nearest-N per left row."""
    from chatdata_spark.operators.timeseries import range_join

    lefts = [(i, float(10 * i), float(10 * i + 25)) for i in range(8)]
    rights = [(j, float(3 * j)) for j in range(40)]
    ldf = spark.createDataFrame(lefts, "left_id long, lo double, hi double")
    rdf = spark.createDataFrame(rights, "rid long, val double")
    got = sorted(
        (r.left_id, r.val)
        for r in range_join(
            ldf, rdf, lo_col="lo", hi_col="hi", right_val_col="val",
            max_matches_per_left=2, left_id="left_id", right_tiebreak="rid",
            keep="last",
        ).collect()
    )
    want = sorted(
        (i, v)
        for i, lo, hi in lefts
        for v in sorted([v for _, v in rights if lo <= v <= hi], reverse=True)[:2]
    )
    assert got == want
