"""fill_gaps (WITH FILL role) and locf (fill-forward) unit behavior."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from chatdata_spark.operators.timeseries import fill_gaps, locf

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_fill_gaps_densifies_and_fills(spark):
    obs = spark.createDataFrame(
        [("a", T0, 5), ("a", T0 + dt.timedelta(hours=3), 2), ("b", T0, 1)],
        "k string, bucket timestamp, n long",
    )
    dims = obs.select("k").distinct()
    out = fill_gaps(
        obs, dims, "bucket", T0, T0 + dt.timedelta(hours=3),
        "INTERVAL 1 HOUR", fill={"n": 0},
    )
    rows = {(r.k, r.bucket.hour): r.n for r in out.collect()}
    # 2 keys x 4 buckets, gaps zero-filled
    assert len(rows) == 8
    assert rows[("a", 0)] == 5 and rows[("a", 1)] == 0 and rows[("a", 3)] == 2
    assert rows[("b", 0)] == 1 and rows[("b", 2)] == 0


def test_fill_gaps_default_leaves_null(spark):
    obs = spark.createDataFrame([("a", T0, 5)], "k string, bucket timestamp, n long")
    out = fill_gaps(
        obs, obs.select("k").distinct(), "bucket",
        T0, T0 + dt.timedelta(hours=1), "INTERVAL 1 HOUR",
    )
    vals = {r.bucket.hour: r.n for r in out.collect()}
    assert vals[0] == 5 and vals[1] is None


def test_locf_carries_and_leaves_leading_nulls(spark):
    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, 10.0), ("u", 3, None), ("u", 4, None),
         ("u", 5, 20.0), ("v", 1, None)],
        "k string, i long, v double",
    )
    out = locf(df, "v", ["k"], ["i"])
    got = {(r.k, r.i): r.v_filled for r in out.collect()}
    assert got[("u", 1)] is None          # leading gap stays
    assert got[("u", 3)] == 10.0 and got[("u", 4)] == 10.0
    assert got[("u", 5)] == 20.0
    assert got[("v", 1)] is None
