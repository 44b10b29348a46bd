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


def test_psi_categorical_counts_and_vanished_category(spark):
    from chatdata_spark.operators.drift import psi_categorical

    ref = spark.createDataFrame([("en",)] * 6 + [("de",)] * 4, "c string")
    cur = spark.createDataFrame([("en",)] * 8 + [("fr",)] * 2, "c string")
    rep = psi_categorical(ref, cur, "c")
    rows = {r.category: (r.n_ref, r.n_cur) for r in rep.collect()}
    # de vanished, fr appeared — both participate with a zero side
    assert rows == {"en": (6, 8), "de": (4, 0), "fr": (0, 2), None: (10, 10)}
    total = [r for r in rep.collect() if r.category is None][0]
    assert total.psi_term > 0.1  # a quarter of the mass moved


def test_psi_categorical_identical_mix_is_zero(spark):
    from chatdata_spark.operators.drift import psi_categorical

    df = spark.createDataFrame([("a",), ("b",), ("b",)], "c string")
    total = [r for r in psi_categorical(df, df, "c").collect() if r.category is None][0]
    assert total.psi_term == 0.0  # p == q exactly per category
