"""Deterministic bottom-k-by-hash quantile sketch: merge law, rank-error
soundness vs exact quantiles, prefilter graceful degradation, and the
small-group exact-collapse property. (Driver-scale oracle check runs in
test_correctness.py via quantile_sketch_totalprice.)"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from chatdata_spark.operators.quantsketch import (
    merge_samples,
    quantile_sample,
    quantile_sketch,
    sketch_quantiles,
)
from tests.conftest import SF_ORACLE


def _orders(spark):
    return spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )


def test_small_group_collapses_to_exact(spark):
    # a group smaller than k keeps EVERY row — the sketch IS the data and
    # the estimates are the exact discrete quantiles.
    rows = [("g", i, float(v)) for i, v in enumerate(range(10, 110, 10))]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    out = quantile_sketch(df, ["g"], "v", "k", k=256).collect()[0]
    # n=10: ceil(.25*10)=3 -> 30, ceil(.5*10)=5 -> 50, ceil(.75*10)=8 -> 80,
    # ceil(.95*10)=10 -> 100
    assert (out.sample_n, out.p25, out.p50, out.p75, out.p95) == (10, 30.0, 50.0, 80.0, 100.0)


def test_merge_law_shards_equal_global(spark):
    # bottom-k over the union of per-shard bottom-k samples == bottom-k
    # over the whole table (the mergeable-sketch property).
    o = _orders(spark)
    shards = [o.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == i) for i in range(3)]
    per_shard = [
        quantile_sample(s, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=64)
        for s in shards
    ]
    merged = merge_samples(per_shard, ["o_orderpriority"], k=64)
    direct = quantile_sample(o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=64)
    a = {tuple(r) for r in merged.select("o_orderpriority", "__key").collect()}
    b = {tuple(r) for r in direct.select("o_orderpriority", "__key").collect()}
    assert a == b and len(a) > 0


def test_merge_dedups_overlapping_shards(spark):
    # overlapping shards (a re-delivered micro-batch) must not displace
    # genuine bottom-k members with duplicate keys.
    o = _orders(spark)
    half = o.filter(F.col("o_orderkey") % 2 == 0)
    per = [
        quantile_sample(s, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=64)
        for s in (o, half)  # second shard is a subset of the first
    ]
    merged = merge_samples(per, ["o_orderpriority"], k=64)
    direct = quantile_sample(o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=64)
    a = {tuple(r) for r in merged.select("o_orderpriority", "__key").collect()}
    b = {tuple(r) for r in direct.select("o_orderpriority", "__key").collect()}
    assert a == b


def test_rank_error_bound_vs_exact(spark):
    # k=256 uniform sample: every estimate's TRUE rank must be within
    # ~3/sqrt(k) (~0.19) of q — a loose 3-sigma soundness check that
    # catches an off-by-category bug without being flaky (the estimates
    # are deterministic, so this either always passes or always fails).
    o = _orders(spark)
    est = quantile_sketch(
        o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=256
    ).collect()
    for row in est:
        grp = o.filter(F.col("o_orderpriority") == row.o_orderpriority)
        n = grp.count()
        for q, v in [(0.25, row.p25), (0.5, row.p50), (0.75, row.p75), (0.95, row.p95)]:
            true_rank = grp.filter(F.col("o_totalprice") <= F.lit(v)).count() / n
            assert abs(true_rank - q) < 0.19, (row.o_orderpriority, q, true_rank)


def test_prefilter_degrades_to_bernoulli_sample(spark):
    # prefilter below the bottom-k threshold clips the sample to a pure
    # hash-Bernoulli subset — still deterministic, still the same rows a
    # direct filter yields, sample_n just drops below k.
    o = _orders(spark)
    t = int(0.001 * (1 << 32))
    clipped = quantile_sample(
        o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=256, prefilter_buckets=t
    )
    direct = quantile_sample(
        o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=10**9
    ).filter(F.col("__h") < t)
    a = {tuple(r) for r in clipped.select("o_orderpriority", "__key").collect()}
    b = {tuple(r) for r in direct.select("o_orderpriority", "__key").collect()}
    assert a == b
    est = sketch_quantiles(clipped, ["o_orderpriority"], [0.5]).collect()
    assert all(r.sample_n < 256 for r in est) and all(r.p50 is not None for r in est)


def test_safe_prefilter_preserves_bottom_k(spark):
    # a prefilter sized at >=4k/n keeps the bottom-k intact: same sample,
    # same estimates, smaller window input (the 100 TB shuffle cut).
    o = _orders(spark)
    k = 64
    n_min = min(r.n for r in o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect())
    t = int(4 * k / n_min * (1 << 32))
    with_pf = quantile_sketch(
        o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=k, prefilter_buckets=t
    )
    without = quantile_sketch(o, ["o_orderpriority"], "o_totalprice", "o_orderkey", k=k)
    assert sorted(map(tuple, with_pf.collect())) == sorted(map(tuple, without.collect()))


def test_ks_drift_identical_snapshots_zero(spark):
    from chatdata_spark.operators.quantsketch import ks_drift

    o = _orders(spark)
    r = ks_drift(o, o, "o_totalprice", "o_orderkey", k=64).collect()[0]
    assert (r.n_ref, r.n_cur, r.ks_stat) == (64, 64, 0.0)


def test_ks_drift_detects_shift(spark):
    from chatdata_spark.operators.quantsketch import ks_drift

    o = _orders(spark)
    shifted = o.withColumn("o_totalprice", F.col("o_totalprice") * 3.0)
    r = ks_drift(o, shifted, "o_totalprice", "o_orderkey", k=128).collect()[0]
    # tripling the scale moves most of the CDF mass — a large KS distance
    assert r.ks_stat > 0.4
    # statistic is a valid probability-scale distance
    assert 0.0 <= r.ks_stat <= 1.0


def test_ks_drift_exact_python_replay(spark):
    """The whole statistic replayed sequentially in Python over the same
    hash-sampled subsets — integer cross-products, one final division."""
    import hashlib

    from chatdata_spark.operators.quantsketch import ks_drift

    o = _orders(spark)
    half_a = o.filter(F.col("o_orderkey") % 2 == 0)
    half_b = o.filter(F.col("o_orderkey") % 2 == 1)
    got = ks_drift(half_a, half_b, "o_totalprice", "o_orderkey", k=100, salt="ks").collect()[0]

    def sample(df):
        rows = [(r.o_orderkey, r.o_totalprice) for r in df.collect()
                if r.o_totalprice is not None and r.o_orderkey is not None]
        hashed = sorted(
            (int(hashlib.md5(f"ks{k}".encode()).hexdigest()[:8], 16), k, v)
            for k, v in rows
        )
        return [v for _, _, v in hashed[:100]]

    sa, sb = sample(half_a), sample(half_b)
    vals = sorted(set(sa) | set(sb))
    best, tr, tc = 0, len(sa), len(sb)
    for v in vals:
        cr = sum(1 for x in sa if x <= v)
        cc = sum(1 for x in sb if x <= v)
        best = max(best, abs(cr * tc - cc * tr))
    assert (got.n_ref, got.n_cur) == (tr, tc)
    assert got.ks_stat == best / (tr * tc)


def test_exact_ceil_rank_matches_true_ceiling(spark):
    """(num·n + den−1) div den must equal exact ceil(q·n) for every n,
    including the exact-integer landings where float q·n can sit an ulp
    low (the ADVICE r7 divergence class)."""
    from fractions import Fraction

    from chatdata_spark.operators.quantsketch import exact_ceil_rank, q_fraction

    qs = [0.25, 0.5, 0.75, 0.95, 0.99, 0.01, 0.2, 0.6]
    df = spark.range(1, 1001).withColumnRenamed("id", "n")
    cols = [exact_ceil_rank(F.col("n"), q).alias(f"r{i}") for i, q in enumerate(qs)]
    rows = df.select("n", *cols).collect()
    for r in rows:
        for i, q in enumerate(qs):
            num, den = q_fraction(q)
            want = -((-num * r.n) // den)  # exact ceil(num·n/den)
            assert r[f"r{i}"] == want, (q, r.n)
            assert want == math.ceil(Fraction(num, den) * r.n)


def test_q_fraction_rejects_non_centesimal():
    import pytest

    from chatdata_spark.operators.quantsketch import q_fraction

    assert q_fraction(0.95) == (19, 20)
    assert q_fraction(0.5) == (1, 2)
    with pytest.raises(ValueError):
        q_fraction(0.333)


def test_ks_drift_grouped_matches_per_group_global(spark):
    """Grouped KS must equal running the global statistic once per group;
    a group present on one side only gets NULL ks_stat, not NaN/0."""
    from chatdata_spark.operators.quantsketch import ks_drift

    o = _orders(spark).withColumn(
        "g", (F.col("o_orderkey") % 3).cast("string")
    )
    ref = o.filter(F.col("o_orderkey") % 2 == 0)
    cur = o.filter(F.col("o_orderkey") % 2 == 1)
    got = {
        r.g: (r.n_ref, r.n_cur, r.ks_stat)
        for r in ks_drift(ref, cur, "o_totalprice", "o_orderkey",
                          k=64, salt="g", group_cols=["g"]).collect()
    }
    assert len(got) == 3
    for gval in ("0", "1", "2"):
        solo = ks_drift(
            ref.filter(F.col("g") == gval), cur.filter(F.col("g") == gval),
            "o_totalprice", "o_orderkey", k=64, salt="g",
        ).collect()[0]
        assert got[gval] == (solo.n_ref, solo.n_cur, solo.ks_stat)
    # one-sided group → NULL statistic
    lop = ks_drift(
        ref, cur.filter(F.col("g") != "2"), "o_totalprice", "o_orderkey",
        k=64, salt="g", group_cols=["g"],
    ).collect()
    row2 = next(r for r in lop if r.g == "2")
    assert row2.n_cur == 0 and row2.ks_stat is None
