"""PSI drift monitor: bin math, clamp semantics, identical-vs-shifted
behavior. (Driver-scale oracle check runs in test_correctness.py via
drift_psi_event_values.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chatdata_spark.operators.drift import bin_id, fixed_bin_edges, psi_report


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_fixed_bin_edges_math():
    assert fixed_bin_edges(0.0, 10.0, 5) == [2.0, 4.0, 6.0, 8.0]
    with pytest.raises(ValueError):
        fixed_bin_edges(1.0, 1.0, 4)


def test_bin_id_clamps_tails(spark):
    edges = fixed_bin_edges(0.0, 10.0, 5)
    df = _df(spark, [-100, 0, 1.9, 2.0, 9.9, 10, 1e9])
    got = [r.b for r in df.select(bin_id(F.col("v"), edges).alias("b")).collect()]
    # left-closed bins; out-of-range values land in the edge bins
    assert got == [0, 0, 0, 1, 4, 4, 4]


def test_psi_near_zero_for_identical_distributions(spark):
    vals = [i % 50 for i in range(2000)]
    rep = psi_report(_df(spark, vals), _df(spark, vals), "v", n_bins=10)
    total = rep.filter(F.col("bin") == -1).collect()[0]
    assert total.n_ref == total.n_cur == 2000
    assert abs(total.psi_term) < 1e-4  # smoothing only


def test_psi_flags_a_shift(spark):
    ref = [i % 50 for i in range(2000)]
    cur = [25 + (i % 50) for i in range(2000)]  # mean shift by half the range
    rep = psi_report(_df(spark, ref), _df(spark, cur), "v", n_bins=10)
    total = rep.filter(F.col("bin") == -1).collect()[0]
    assert total.psi_term > 0.25  # the "shifted" rule-of-thumb threshold


def test_explicit_edges_pin_the_bins(spark):
    ref, cur = _df(spark, range(100)), _df(spark, range(100))
    edges = fixed_bin_edges(0.0, 100.0, 4)
    rep = psi_report(ref, cur, "v", edges=edges).filter(F.col("bin") >= 0)
    rows = {r.bin: (r.n_ref, r.n_cur) for r in rep.collect()}
    assert rows == {0: (25, 25), 1: (25, 25), 2: (25, 25), 3: (25, 25)}


def test_nulls_dropped_and_empty_ref_raises(spark):
    ref = spark.createDataFrame([(1.0,), (None,)], "v double")
    cur = spark.createDataFrame([(1.5,), (None,)], "v double")
    total = psi_report(ref, cur, "v", n_bins=2).filter(F.col("bin") == -1).collect()[0]
    assert (total.n_ref, total.n_cur) == (1, 1)
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="empty reference"):
        psi_report(empty, cur, "v")
