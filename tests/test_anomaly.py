"""Median/MAD outlier flagging: index math on tiny frames, NULL handling,
exact-vs-approx agreement away from the threshold boundary. (Driver-scale
oracle check runs in test_correctness.py via anomaly_mad_event_values.)"""

from __future__ import annotations

from chatdata_spark.operators.anomaly import mad_outlier_summary, mad_outliers


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_mad_flags_the_planted_outlier(spark):
    # g=a: values 1..7 plus a wild 1000 → med is the 4th of 8 (=4.0),
    # devs {3,2,1,0,1,2,3,996} sorted {0,1,1,2,2,3,3,996} → mad = 4th = 2.0,
    # threshold 6.0 → only the 1000 row flags.
    rows = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])]
    out = {r.id: r.is_outlier for r in
           mad_outliers(_df(spark, rows), ["g"], "v", ["id"]).collect()}
    assert out == {i: (i == 7) for i in range(8)}


def test_summary_math_even_group(spark):
    rows = [("a", i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    r = mad_outlier_summary(_df(spark, rows), ["g"], "v", ["id"]).collect()[0]
    # ceil(0.5*4)=2 → med = 2nd ascending = 20; devs {10,0,10,20} sorted
    # {0,10,10,20} → mad = 2nd = 10; threshold 30 → nothing flags.
    assert (r.med, r.mad, r.n_outliers, r.n_rows) == (20.0, 10.0, 0, 4)


def test_null_values_dropped_not_flagged(spark):
    rows = [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("a", 4, None)]
    flagged = mad_outliers(_df(spark, rows), ["g"], "v", ["id"]).collect()
    assert {r.id for r in flagged} == {1, 2, 3}


def test_groups_are_independent(spark):
    rows = [("a", 1, 1.0), ("a", 2, 1.0), ("a", 3, 100.0),
            ("b", 4, 100.0), ("b", 5, 100.0), ("b", 6, 1.0)]
    out = {r.id: r.is_outlier for r in
           mad_outliers(_df(spark, rows), ["g"], "v", ["id"]).collect()}
    # each group's outlier is judged against ITS OWN median (mad=0 for both:
    # dev>0 flags) — 100 is the anomaly in a, 1 is the anomaly in b.
    assert out == {1: False, 2: False, 3: True, 4: False, 5: False, 6: True}


def test_approx_path_agrees_away_from_boundary(spark):
    # well-separated fixture: 50 inliers near 0, 3 outliers near 1000 —
    # any sane median/MAD estimate classifies identically.
    rows = [("a", i, float(i % 7)) for i in range(50)]
    rows += [("a", 100 + i, 1000.0 + i) for i in range(3)]
    df = _df(spark, rows)
    exact = {r.id: r.is_outlier for r in
             mad_outliers(df, ["g"], "v", ["id"], exact=True).collect()}
    approx = {r.id: r.is_outlier for r in
              mad_outliers(df, ["g"], "v", ["id"], exact=False).collect()}
    assert exact == approx
    assert sum(exact.values()) == 3


def test_approx_path_keeps_null_group_key(spark):
    # ADVICE r6: the approx path's equi-joins used to drop NULL-keyed
    # groups that the exact path's window PARTITION BY keeps.
    rows = [(None, i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])]
    rows += [("a", 100 + i, float(v)) for i, v in enumerate([1, 2, 3, 1000])]
    df = _df(spark, rows)
    exact = {r.id: r.is_outlier for r in
             mad_outliers(df, ["g"], "v", ["id"], exact=True).collect()}
    approx = {r.id: r.is_outlier for r in
              mad_outliers(df, ["g"], "v", ["id"], exact=False).collect()}
    assert set(approx) == set(exact) == {r[1] for r in rows}
    assert approx == exact
