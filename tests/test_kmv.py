"""KMV sketch + pairwise overlap (operators/kmv.py): estimator accuracy
on controlled overlaps, exact-mode collapse, merge property, and the
bounded plan shape (the sf0.01 oracle parity runs in
tests/test_correctness.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chatdata_spark.operators.kmv import kmv_pairwise_overlap, kmv_sketch_by_group


def _overlap_df(spark, n_a, n_b, n_shared):
    # groups a/b with n_shared common elements; element ids disjoint
    # otherwise. Shared elements are 's<i>', exclusive are 'a<i>'/'b<i>'.
    rows = [("a", f"s{i}") for i in range(n_shared)]
    rows += [("b", f"s{i}") for i in range(n_shared)]
    rows += [("a", f"a{i}") for i in range(n_a - n_shared)]
    rows += [("b", f"b{i}") for i in range(n_b - n_shared)]
    return spark.createDataFrame(rows, "g string, e string")


def _pair(spark, n_a, n_b, n_shared, k):
    sk = kmv_sketch_by_group(_overlap_df(spark, n_a, n_b, n_shared), "g", "e", k=k)
    return kmv_pairwise_overlap(sk, "g").collect()[0]


def test_exact_mode_below_k(spark):
    # both groups under k: estimates must be EXACT set arithmetic
    r = _pair(spark, 40, 30, 10, k=64)
    assert r.est_union == 60.0
    assert r.est_intersection == 10.0
    assert r.est_jaccard == round(10 / 60, 6)


def test_saturated_estimates_within_tolerance(spark):
    # 2000/2000 with 1000 shared -> union 3000, J = 1/3. k=256 gives
    # ~1/sqrt(k) ~ 6% relative error; assert a generous 4-sigma band.
    r = _pair(spark, 2000, 2000, 1000, k=256)
    assert abs(r.est_union - 3000) / 3000 < 0.25, r
    assert abs(r.est_jaccard - 1 / 3) / (1 / 3) < 0.25, r
    assert abs(r.est_intersection - 1000) / 1000 < 0.35, r


def test_disjoint_sets_estimate_zero_intersection(spark):
    r = _pair(spark, 500, 500, 0, k=64)
    assert r.est_jaccard == 0.0 and r.est_intersection == 0.0


def test_identical_sets_estimate_full_overlap(spark):
    r = _pair(spark, 300, 300, 300, k=64)
    assert r.est_jaccard == 1.0
    # intersection estimate equals union estimate exactly (j = 1)
    assert r.est_intersection == r.est_union


def test_sketch_is_mergeable(spark):
    # KMV merge property: k smallest of (A ∪ B) == k smallest of
    # (sketch(A) ∪ sketch(B)) — per-shard sketches combine exactly.
    df = _overlap_df(spark, 800, 700, 200)
    k = 32
    per_group = {r.g: r.sketch for r in kmv_sketch_by_group(df, "g", "e", k=k).collect()}
    merged_from_sketches = sorted(set(per_group["a"]) | set(per_group["b"]))[:k]
    union_sketch = kmv_sketch_by_group(
        df.select(F.lit("u").alias("g"), "e"), "g", "e", k=k
    ).collect()[0].sketch
    assert union_sketch == merged_from_sketches


def test_sketch_bounded_and_sorted(spark):
    sk = kmv_sketch_by_group(_overlap_df(spark, 500, 500, 0), "g", "e", k=16).collect()
    for r in sk:
        assert len(r.sketch) == 16
        assert r.sketch == sorted(r.sketch)
        assert r.n_distinct == 500


def test_pairwise_is_broadcast_not_cartesian(spark):
    sk = kmv_sketch_by_group(_overlap_df(spark, 100, 100, 50), "g", "e", k=16)
    plan = kmv_pairwise_overlap(sk, "g")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_sketch_single_window_exchange(spark):
    df = _overlap_df(spark, 100, 100, 50).repartition(4)
    plan = kmv_sketch_by_group(df, "g", "e", k=16)._jdf.queryExecution().executedPlan().toString()
    # row_number and count share the group-keyed exchange; distinct adds
    # one on (g, h); the final groupBy reuses the window partitioning or
    # adds at most one more — the corpus never shuffles twice.
    assert plan.count("Exchange") <= 3


def test_exactly_k_distinct_is_exact_mode(spark):
    # n == k on both sides: the sketch IS the set; strict > gating must
    # return exact arithmetic, not the estimator.
    r = _pair(spark, 64, 64, 16, k=64)
    assert r.est_union == 112.0
    assert r.est_intersection == 16.0
    assert r.est_jaccard == round(16 / 112, 6)


def test_mixed_k_sketches_combine_at_min_k(spark):
    # theta-sketch merge rule: pairwise k = least(k_a, k_b); a k=64 sketch
    # paired with a k=16 sketch behaves like a k=16 pair (no NULLs, no
    # silent mis-truncation).
    df = _overlap_df(spark, 500, 500, 250)
    a16 = kmv_sketch_by_group(df.filter("g = 'a'"), "g", "e", k=16)
    b64 = kmv_sketch_by_group(df.filter("g = 'b'"), "g", "e", k=64)
    r = kmv_pairwise_overlap(a16.unionByName(b64), "g").collect()[0]
    assert r.est_union is not None and r.est_union > 0
    assert 0.0 <= r.est_jaccard <= 1.0
    # same-data all-k=16 pair must agree exactly (identical truncation)
    r16 = kmv_pairwise_overlap(
        kmv_sketch_by_group(df, "g", "e", k=16), "g"
    ).collect()[0]
    assert (r.est_union, r.est_jaccard, r.est_intersection) == (
        r16.est_union,
        r16.est_jaccard,
        r16.est_intersection,
    )


def test_sketch_pipeline_not_recomputed_by_self_join(spark):
    # kmv_pairwise_overlap persists the s-row sketch table; the self-join
    # must read the cached relation on both sides, not re-run the window
    # pipeline twice.
    sk = kmv_sketch_by_group(_overlap_df(spark, 200, 200, 100), "g", "e", k=16)
    out = kmv_pairwise_overlap(sk, "g")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    sets=st.lists(
        st.sets(st.integers(min_value=0, max_value=400), min_size=1, max_size=50),
        min_size=2,
        max_size=4,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_mode_matches_brute_force_property(spark, sets):
    # Every group under k=64 -> exact mode everywhere: the whole overlap
    # matrix must equal brute-force set arithmetic for ANY input.
    rows = [(f"g{gi}", f"e{e}") for gi, es in enumerate(sets) for e in es]
    df = spark.createDataFrame(rows, "g string, e string")
    sk = kmv_sketch_by_group(df, "g", "e", k=64)
    got = {
        (r.group_a, r.group_b): (r.est_union, r.est_jaccard, r.est_intersection)
        for r in kmv_pairwise_overlap(sk, "g").collect()
    }
    for ai in range(len(sets)):
        for bi in range(ai + 1, len(sets)):
            a, b = sets[ai], sets[bi]
            u, i = len(a | b), len(a & b)
            assert got[(f"g{ai}", f"g{bi}")] == (
                float(u),
                round(i / u, 6),
                float(i),
            )
