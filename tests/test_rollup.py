"""Incremental rollup: refresh-twice ≡ full recompute, watermark skips old
rows; clustered embedding near-dup recall vs exact."""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.catalog import load_events
from chatdata_spark.operators.rollup import IncrementalRollup
from chatdata_spark.stores.state import VersionedParquetStore
from tests.conftest import SF_ORACLE


def _make(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "rollup"))
    return IncrementalRollup(
        store,
        bucket_expr=F.date_trunc("day", F.col("ts")),
        group_cols=["event_type"],
        value_col="value",
        watermark_col="event_id",
    )


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    e = load_events(spark, SF_ORACLE)
    r = _make(spark, tmp_path)
    n1 = r.refresh(e.filter(F.col("event_id") < 5000))
    n2 = r.refresh(e)  # only event_id >= 5000 processed
    assert n1 == 5000 and n2 == e.count() - 5000
    got = {
        (row.bucket, row.event_type): (row.n, round(row.total, 6), row.vmin, row.vmax)
        for row in r.read().collect()
    }
    full = {
        (row.bucket, row.event_type): (row.n, round(row.total, 6), row.vmin, row.vmax)
        for row in e.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert got == full


def test_refresh_with_no_new_rows_is_noop(spark, tmp_path):
    e = load_events(spark, SF_ORACLE)
    r = _make(spark, tmp_path)
    r.refresh(e)
    v = r.store.current_version()
    assert r.refresh(e) == 0
    assert r.store.current_version() == v  # no new store version written


def test_clustered_near_dup_recall(spark, tmp_path):
    from chatdata_spark.operators.dedup import embedding_near_dup, embedding_near_dup_clustered
    from chatdata_spark.operators.ivf import build_or_load_ivf

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    idx = build_or_load_ivf(spark, emb, str(tmp_path / "ivf"), "vec_id", "embedding", 8)
    exact = {(r.i, r.j) for r in embedding_near_dup(emb, "vec_id", "embedding", 0.4).collect()}
    clustered = {(r.i, r.j) for r in embedding_near_dup_clustered(idx, 0.4).collect()}
    assert clustered <= exact  # soundness: never invents pairs
    recall = len(clustered) / len(exact)
    assert recall >= 0.5, f"clustered near-dup recall too low: {recall}"


def test_rollup_hll_incremental_equals_oneshot_and_error_bounded(spark, tmp_path):
    """The HLL distinct dimension merges across refreshes with NO drift:
    two-step incremental build estimates exactly the one-shot build's
    estimates (sketch union is order-independent), and the estimate is
    within 5% of the exact distinct count."""
    from chatdata_spark.catalog import load_events
    from chatdata_spark.operators.rollup import IncrementalRollup
    from chatdata_spark.stores.state import VersionedParquetStore

    e = load_events(spark, SF_ORACLE)

    def build(path, steps):
        r = IncrementalRollup(
            VersionedParquetStore(spark, path),
            bucket_expr=F.date_trunc("day", F.col("ts")),
            group_cols=["event_type"],
            value_col="value",
            watermark_col="event_id",
            distinct_col="user_id",
        )
        bounds = [e.approxQuantile("event_id", [i / steps], 0.0)[0] for i in range(1, steps)]
        for b in bounds:
            r.refresh(e.filter(F.col("event_id") <= b))
        r.refresh(e)
        return {
            (r_.bucket, r_.event_type): r_.approx_distinct
            for r_ in r.read().select("bucket", "event_type", "approx_distinct").collect()
        }

    inc = build(str(tmp_path / "inc"), 3)
    one = build(str(tmp_path / "one"), 1)
    assert inc == one

    exact = {
        (r.bucket, r.event_type): r.dv
        for r in e.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type")
        .agg(F.countDistinct("user_id").alias("dv"))
        .collect()
    }
    assert set(inc) == set(exact)
    for k, est in inc.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])
