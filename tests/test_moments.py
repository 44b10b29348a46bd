"""Exact-moment z-score monitor: merge law, boundary exactness of the
all-integer predicate, NULL handling, and the OLS trend operator.
(Driver-scale oracle checks run in test_correctness.py via
anomaly_zscore_event_values / streaming_zscore_anomaly /
trend_ols_event_values.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chatdata_spark.operators.moments import (
    count_outliers,
    exact_moments,
    merge_moments,
    zscore_report,
)
from chatdata_spark.operators.timeseries import ols_trend


def _df(spark, rows):
    return spark.createDataFrame([(g, int(v)) for g, v in rows], "g string, v long")


def test_exact_moments_values(spark):
    m = exact_moments(_df(spark, [("a", 1), ("a", 2), ("a", 3)]), ["g"], "v").collect()[0]
    assert (m.n, int(m.s1), int(m.s2)) == (3, 6, 14)


def test_merge_moments_equals_one_shot(spark):
    rows = [("a", i % 7) for i in range(50)] + [("b", i % 3) for i in range(20)]
    whole = exact_moments(_df(spark, rows), ["g"], "v")
    p1 = exact_moments(_df(spark, rows[:31]), ["g"], "v")
    p2 = exact_moments(_df(spark, rows[31:]), ["g"], "v")
    merged = merge_moments([p1, p2], ["g"])
    a = {r.g: (r.n, int(r.s1), int(r.s2)) for r in whole.collect()}
    b = {r.g: (r.n, int(r.s1), int(r.s2)) for r in merged.collect()}
    assert a == b


def test_outlier_predicate_boundary_is_exact(spark):
    # values {0 x8, 4, -4}: n=10, S1=0, S2=32 -> var = 3.2, 3*sigma =
    # sqrt(28.8) ~ 5.366; v=4 is inside. Predicate: (v*10)^2 > 9*(10*32)
    # -> 1600 > 2880 false. A float z-test would agree here, but the
    # point is the integer form: scale ALL values so the float path
    # would sit exactly on the boundary and the integer path still
    # decides exactly. {3 x9, -9}: n=10, S1=18, S2=162; v=-9:
    # lhs=(-90-18)^2=11664, rhs=9*(1620-324)=11664 -> NOT an outlier
    # (strict >): the boundary row classifies deterministically.
    df = _df(spark, [("a", 3)] * 9 + [("a", -9)])
    m = exact_moments(df, ["g"], "v")
    out = count_outliers(df, m, ["g"], "v", z=3).collect()
    assert out == []  # boundary row is exactly AT 3 sigma, not beyond
    # a single deviant among n-1 constants has z = sqrt(n-1) exactly, so
    # n=11 pushes it past 3 sigma: sqrt(10) > 3 -> an outlier, decided by
    # 14400 > 12960 in exact integers
    df2 = _df(spark, [("a", 3)] * 10 + [("a", -9)])
    m2 = exact_moments(df2, ["g"], "v")
    got = {r.g: r.n_outliers for r in count_outliers(df2, m2, ["g"], "v", z=3).collect()}
    assert got == {"a": 1}


def test_zscore_report_shape_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", 5)], "g string, v long"
    )
    rep = {r.g: r for r in zscore_report(df, ["g"], "v", scale=1).collect()}
    assert rep["a"].n == 2 and rep["a"].mean == 1.5
    assert rep["a"].n_outliers == 0 and rep["b"].n_outliers == 0
    assert rep["b"].std == 0.0


def test_ols_trend_exact_line_and_degenerate(spark):
    # y = 3x + 7 exactly -> slope 3, intercept 7, bit-exact
    pts = [("a", x, 3 * x + 7) for x in range(10)]
    # group b: all x equal -> NULL slope/intercept
    pts += [("b", 5, y) for y in (1, 2, 3)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    got = {r.g: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    assert got["a"].slope == 3.0 and got["a"].intercept == 7.0
    assert got["b"].slope is None and got["b"].intercept is None


def test_ols_trend_y_scale(spark):
    # y stored in cents: y = 250x + 100 cents -> 2.5/day, 1.0 in units
    pts = [("a", x, 250 * x + 100) for x in range(8)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    r = ols_trend(df, ["g"], "x", "y", y_scale=100).collect()[0]
    assert math.isclose(r.slope, 2.5) and math.isclose(r.intercept, 1.0)
    assert r.n == 8


def test_merge_ols_moments_equals_one_shot(spark):
    from chatdata_spark.operators.timeseries import (
        merge_ols_moments,
        ols_from_moments,
        ols_moments,
    )

    pts = [("a", x, 3 * x + 7 + (x % 2)) for x in range(40)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    whole = ols_moments(df, ["g"], "x", "y")
    p1 = ols_moments(df.filter(F.col("x") < 15), ["g"], "x", "y")
    p2 = ols_moments(df.filter(F.col("x") >= 15), ["g"], "x", "y")
    merged = merge_ols_moments([p1, p2], ["g"])
    a = whole.collect()[0]
    b = merged.collect()[0]
    assert (a.n, a.sx, a.sy, a.sxy, a.sxx) == (b.n, b.sx, b.sy, b.sxy, b.sxx)
    # and the derived stats are bit-identical through either path
    sa = ols_from_moments(whole).collect()[0]
    sb = ols_from_moments(merged).collect()[0]
    assert (sa.slope, sa.intercept) == (sb.slope, sb.intercept)


def test_constant_group_std_is_zero_not_nan(spark):
    # ex2 and mean^2 take different float paths; the clamped sqrt must
    # yield exactly 0.0 (Spark would NaN on -1ulp, DuckDB would THROW)
    df = _df(spark, [("c", 7)] * 13)
    r = zscore_report(df, ["g"], "v", scale=1).collect()[0]
    assert r.std == 0.0 and r.n_outliers == 0 and r.mean == 7.0


def test_outlier_domain_guard_raises_at_overflow_boundary(spark):
    """r8 verdict #3: beyond max(4,z^2)*n^2*s2 >= 1e37 the all-integer
    predicate would overflow DECIMAL(38,0) (Spark ANSI throw / DuckDB
    HUGEINT overflow) — the guard must raise its OWN clear error first."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from chatdata_spark.operators.moments import count_outliers, exact_moments

    # v = 1e18, n = 2 -> s2 = 2e36; 4 * 4 * 2e36 = 3.2e37 >= 1e37
    df = _df(spark, [("a", 10**18), ("a", -(10**18))])
    m = exact_moments(df, ["g"], "v")
    with pytest.raises(SparkRuntimeException, match="DECIMAL.38,0. domain"):
        count_outliers(df, m, ["g"], "v").collect()


def test_outlier_predicate_in_domain_near_guard(spark):
    """Just under the guard threshold the exact predicate must still run
    overflow-free: v ~ 1e17, n = 3 -> max(4,9)*9*s2 ~ 2.7e36 < 1e37, and
    lhs^2 ~ (2e17)^2 = 4e34 fits DECIMAL(38,0) comfortably."""
    from chatdata_spark.operators.moments import count_outliers, exact_moments

    df = _df(spark, [("a", 10**17), ("a", -(10**17)), ("a", 0)])
    m = exact_moments(df, ["g"], "v")
    rows = count_outliers(df, m, ["g"], "v").collect()
    # symmetric two-point +0 distribution: nothing beyond 3 sigma
    assert rows == [] or rows[0].n_outliers == 0
