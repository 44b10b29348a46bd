"""Profile ONE streaming drain end-to-end (r11 verdict item 6): where do
the ~5.6 s of streaming_drift_psi go?

Replays the query body step-by-step with wall-clock marks, and captures
each StreamingQuery's recentProgress durationMs breakdown (latestOffset /
getBatch / queryPlanning / addBatch / walCommit / commitOffsets) so the
per-batch machinery cost is attributed, not guessed.

Usage: python tools/prof_streaming_drain.py  [runs at sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chatdata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_marks: list[tuple[str, float]] = []


def mark(label: str) -> None:
    _marks.append((label, time.monotonic()))


def drain_with_progress(spark, ind, store, ckpt, value_col, schema, edges):
    """stream_histogram_merge body, instrumented: returns the query's
    recentProgress list (one entry per micro-batch)."""
    from chatdata_spark.operators.drift import hist_counts

    stream = spark.readStream.schema(schema).parquet(ind)

    def apply_batch(batch_df, batch_id: int) -> None:
        t0 = time.monotonic()
        if batch_df.isEmpty():
            print(f"      [batch {batch_id}] isEmpty=True  {time.monotonic()-t0:.3f}s")
            return
        t1 = time.monotonic()
        h = hist_counts(batch_df, value_col, edges, out="n")
        if store.exists():
            applied = store.read_meta().get("last_batch")
            if applied is not None and applied >= batch_id:
                return
            merged = (
                store.read().drop("last_batch")
                .unionByName(h)
                .groupBy("bin")
                .agg(F.sum("n").alias("n"))
            )
        else:
            merged = h
        t2 = time.monotonic()
        store.write(merged, meta={"last_batch": batch_id})
        t3 = time.monotonic()
        print(
            f"      [batch {batch_id}] isEmpty={t1-t0:.3f}s plan-merge={t2-t1:.3f}s "
            f"store.write={t3-t2:.3f}s total={t3-t0:.3f}s"
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [json.loads(p.json) for p in q.recentProgress]


def main() -> None:
    t_start = time.monotonic()
    spark = get_spark(app_name="prof_streaming_drain")
    spark.sparkContext.setLogLevel("ERROR")
    mark("session up")

    from chatdata_spark.catalog import load_events
    from chatdata_spark.operators.drift import fixed_bin_edges, hist_counts, psi_from_counts
    from chatdata_spark.queries.quality import _PSI_BINS, _PSI_SPLIT
    from chatdata_spark.stores.state import VersionedParquetStore

    # warm the session the way bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    mark("warmup")

    e = load_events(spark, SF_DIR)
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    ref = e.filter(F.col("ts") < split)
    cur = e.filter(F.col("ts") >= split).select("event_id", "value")
    row = ref.filter(F.col("value").isNotNull()).agg(
        F.min(F.col("value").cast("double")).alias("lo"),
        F.max(F.col("value").cast("double")).alias("hi"),
    ).collect()[0]
    edges = fixed_bin_edges(row.lo, row.hi, _PSI_BINS)
    mark("ref min/max collect")

    root = tempfile.mkdtemp(prefix="prof_sdrift_")
    ind, ckpt = f"{root}/in", f"{root}/ck"
    os.makedirs(ind)
    store = VersionedParquetStore(spark, f"{root}/store")
    schema = "event_id long, value double"
    mid = cur.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    mark("mid percentile collect")
    cur.filter(F.col("event_id") <= mid).coalesce(1).write.mode("append").parquet(ind)
    mark("wave-1 write")
    prog1 = drain_with_progress(spark, ind, store, ckpt, "value", schema, edges)
    mark("drain 1")
    cur.filter(F.col("event_id") > mid).coalesce(1).write.mode("append").parquet(ind)
    mark("wave-2 write")
    prog2 = drain_with_progress(spark, ind, store, ckpt, "value", schema, edges)
    mark("drain 2")

    rc = hist_counts(ref, "value", edges, out="n_ref")
    cc = store.read().select("bin", F.col("n").alias("n_cur"))
    psi_from_counts(rc, cc, len(edges)).write.format("noop").mode("overwrite").save()
    mark("final psi + noop sink")

    prev = t_start
    print("\n== wall-clock marks ==")
    for label, t in _marks:
        print(f"  {t - prev:6.3f}s  {label}")
        prev = t
    print(f"  {_marks[-1][1] - t_start:6.3f}s  TOTAL")

    for tag, prog in (("drain 1", prog1), ("drain 2", prog2)):
        print(f"\n== {tag}: recentProgress durationMs ==")
        for p in prog:
            d = p.get("durationMs", {})
            print(
                f"  batch {p.get('batchId')}: rows={p.get('numInputRows')} "
                + " ".join(f"{k}={v}" for k, v in sorted(d.items()))
            )
    spark.stop()


if __name__ == "__main__":
    main()
