"""Incremental time-bucket rollup (the 'hypertable rollup' custom-operator
shape): a materialized per-bucket aggregate refreshed by processing only
rows past the stored high-watermark — the batch analog of the streaming
windowed aggregation, for when the source is an append-only table rather
than a stream.

Merge rule: decomposable aggregates only (count/sum/min/max — partials
merge associatively). Refresh cost ∝ new rows + touched buckets, never the
table's history; at 100 TB that is the difference between a minutes-long
incremental job and a full recompute.

State = a VersionedParquetStore holding
``(bucket, group..., n, total, vmin, vmax)``; the high-watermark scalar
rides in the version directory's ``_META.json`` sidecar, so state and
watermark commit atomically via the store's single ``_LATEST`` pointer
swap — a crash can never leave merged state with a stale watermark (which
would re-merge and double-count rows on the next refresh)."""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatdata_spark.stores.state import VersionedParquetStore


def _encode_wm(v):
    """JSON-safe watermark encoding with a type tag so timestamp / date /
    decimal watermark columns round-trip exactly."""
    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "date", "v": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"t": "dec", "v": str(v)}
    return {"t": "raw", "v": v}


def _decode_wm(d):
    t, v = d["t"], d["v"]
    if t == "ts":
        return datetime.datetime.fromisoformat(v)
    if t == "date":
        return datetime.date.fromisoformat(v)
    if t == "dec":
        return decimal.Decimal(v)
    return v


class IncrementalRollup:
    def __init__(
        self,
        store: VersionedParquetStore,
        bucket_expr,
        group_cols: list[str],
        value_col: str,
        watermark_col: str,
        distinct_col: str | None = None,
    ) -> None:
        self.store = store
        self.bucket_expr = bucket_expr
        self.group_cols = group_cols
        self.value_col = value_col
        self.watermark_col = watermark_col
        # Optional approx-distinct dimension: state carries a mergeable
        # HyperLogLog sketch per bucket (Spark's hll_sketch_agg, ~4 KB
        # binary). COUNT(DISTINCT) is NOT decomposable — the sketch is the
        # only way a distinct count can ride an incremental rollup without
        # reprocessing history; union of sketches is order-independent, so
        # incremental refreshes estimate EXACTLY what a one-shot build
        # would (pinned in tests/test_rollup.py).
        self.distinct_col = distinct_col

    def watermark(self):
        meta = self.store.read_meta()
        return _decode_wm(meta["wm"]) if "wm" in meta else None

    def _aggregate(self, rows: DataFrame) -> DataFrame:
        v = F.col(self.value_col)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(v.cast("decimal(27,6)")).alias("total"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
        ]
        if self.distinct_col:
            aggs.append(F.expr(f"hll_sketch_agg({self.distinct_col})").alias("dv_sketch"))
        return rows.groupBy(self.bucket_expr.alias("bucket"), *self.group_cols).agg(*aggs)

    def refresh(self, source: DataFrame) -> int:
        """Process rows with watermark_col > stored watermark; merge partial
        aggregates into existing buckets. Returns rows processed."""
        wm = self.watermark()
        fresh = source if wm is None else source.filter(F.col(self.watermark_col) > wm)
        n_new = fresh.count()
        if n_new == 0:
            return 0
        partial = self._aggregate(fresh)
        if self.store.exists():
            merge_aggs = [
                F.sum("n").alias("n"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            ]
            if self.distinct_col:
                merge_aggs.append(F.expr("hll_union_agg(dv_sketch)").alias("dv_sketch"))
            merged = (
                self.store.read()
                .unionByName(partial)
                .groupBy("bucket", *self.group_cols)
                .agg(*merge_aggs)
            )
        else:
            merged = partial
        new_wm = fresh.agg(F.max(self.watermark_col)).collect()[0][0]
        self.store.write(merged, meta={"wm": _encode_wm(new_wm)})
        return n_new

    def read(self) -> DataFrame:
        out = self.store.read().withColumn("total", F.col("total").cast("double"))
        if self.distinct_col:
            out = out.withColumn(
                "approx_distinct", F.expr("hll_sketch_estimate(dv_sketch)")
            ).drop("dv_sketch")
        return out
