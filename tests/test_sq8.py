"""SQ8 scalar quantization: encode invariants (range, constant dims,
grid round-trip error), recall of the quantized ranking vs the exact
cosine ranking, and the frozen-calibration production posture. (Driver
oracle check runs in test_correctness.py via sq8_quant_knn.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.operators.sq8 import (
    LEVELS,
    sq8_calibrate,
    sq8_code_query,
    sq8_encode,
    sq8_knn,
)
from chatdata_spark.queries.vector import DIM, Q1
from tests.conftest import SF_ORACLE


def _emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_codes_in_range_and_reconstruction_error_bounded(spark):
    emb = _emb(spark)
    los, steps = sq8_calibrate(emb, "embedding", DIM)
    enc = sq8_encode(emb, "embedding", los, steps)
    row = enc.select("embedding", "sq8_codes").first()
    assert len(row.sq8_codes) == DIM
    assert all(0 <= c <= LEVELS for c in row.sq8_codes)
    # reconstruction error per dim <= step/2 (the grid guarantee)
    for d in range(DIM):
        if steps[d] == 0.0:
            continue
        rec = los[d] + row.sq8_codes[d] * steps[d]
        assert abs(rec - float(row.embedding[d])) <= steps[d] / 2 + 1e-9


def test_constant_dimension_encodes_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 1.0]), (2, [0.5, 2.0]), (3, [0.5, 3.0])],
        "id long, v array<float>",
    )
    los, steps = sq8_calibrate(df, "v", 2)
    assert steps[0] == 0.0 and steps[1] > 0.0
    codes = {r.id: r.sq8_codes for r in sq8_encode(df, "v", los, steps).collect()}
    assert all(c[0] == 0 for c in codes.values())
    assert codes[1][1] == 0 and codes[3][1] == LEVELS


def test_quantized_ranking_recall_vs_exact(spark):
    """8-bit resolution must hold high recall against the exact cosine
    top-k on the fixture (deterministic — passes or fails forever)."""
    from chatdata_spark.functions.vector import cosine_distance

    emb = _emb(spark)
    k = 10
    got = {r.vec_id for r in sq8_knn(emb, "embedding", Q1, dim=DIM, k=k).collect()}
    exact = {
        r.vec_id
        for r in emb.select(
            "vec_id", cosine_distance("embedding", Q1).alias("d")
        )
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(k)
        .collect()
    }
    # squared-L2 over the SQ8 grid tracks L2, not cosine; on the
    # normalized-ish hash fixture the neighborhoods still align strongly
    assert len(got & exact) >= 6


def test_frozen_calibration_matches_corpus_calibration(spark):
    emb = _emb(spark)
    cal = sq8_calibrate(emb, "embedding", DIM)
    a = [tuple(r) for r in sq8_knn(emb, "embedding", Q1, dim=DIM, k=5).collect()]
    b = [
        tuple(r)
        for r in sq8_knn(emb, "embedding", Q1, dim=DIM, k=5, calibration=cal).collect()
    ]
    assert a == b


def test_query_encoding_clamps_out_of_range(spark):
    los = [0.0, 0.0]
    steps = [1.0 / LEVELS, 1.0 / LEVELS]
    assert sq8_code_query([-5.0, 5.0], los, steps) == [0, LEVELS]


def test_rerank_funnel_recall_monotone(spark):
    """Exact rerank of the SQ8 screen: recall vs the exact cosine top-k
    must be >= the pure quantized ranking's and monotone in depth."""
    from chatdata_spark.functions.vector import cosine_distance

    emb = _emb(spark)
    k = 10
    exact = {
        r.vec_id
        for r in emb.select("vec_id", cosine_distance("embedding", Q1).alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id")).limit(k).collect()
    }

    def rec(rerank):
        got = {
            r.vec_id
            for r in sq8_knn(
                emb, "embedding", Q1, dim=DIM, k=k, rerank=rerank
            ).collect()
        }
        return len(got & exact) / k

    pure = rec(None)
    r40 = rec(40)
    assert r40 >= pure
    assert rec(80) >= r40
    assert rec(80) >= 0.9  # 8-bit grid + 8x rerank recovers the exact set


def test_select_without_id_col_works(spark):
    """ADVICE r7: a `select` that omits id_col must not blow up — the
    tie-break id is carried internally and dropped from the output."""
    emb = _emb(spark)
    pure = sq8_knn(emb, "embedding", Q1, dim=DIM, k=5, select=["label"])
    rows = pure.collect()
    assert pure.columns == ["label", "sq8_dist"] and len(rows) == 5
    rr = sq8_knn(emb, "embedding", Q1, dim=DIM, k=5, select=["label"], rerank=20)
    rows2 = rr.collect()
    assert rr.columns == ["label", "dist"] and len(rows2) == 5
    # same ranking as the id-including call
    with_id = sq8_knn(emb, "embedding", Q1, dim=DIM, k=5,
                      select=["label", "vec_id"], rerank=20)
    assert [r.label for r in rows2] == [r.label for r in with_id.collect()]


def test_calibrate_matches_wide_aggregate_reference(spark):
    """r11 optimization pin: the Arrow-partial sq8_calibrate must return
    the same (los, steps) as the plain 2*dim-expression min/max aggregate
    it replaced (min/max selection is order-free; float32 -> float64 is
    exact)."""
    import numpy as np
    from pyspark.sql import functions as F

    from chatdata_spark.operators.sq8 import LEVELS, sq8_calibrate

    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows + [(999, None)], "id long, vec array<float>")

    los, steps = sq8_calibrate(df, "vec", 8)

    v = F.col("vec")
    aggs = []
    for d in range(8):
        e = F.try_element_at(v, F.lit(d + 1)).cast("double")
        aggs.append(F.min(e).alias(f"lo{d}"))
        aggs.append(F.max(e).alias(f"hi{d}"))
    row = df.filter(v.isNotNull()).agg(*aggs).collect()[0]
    for d in range(8):
        lo, hi = float(row[f"lo{d}"]), float(row[f"hi{d}"])
        assert los[d] == lo
        assert steps[d] == ((hi - lo) / LEVELS if hi > lo else 0.0)
