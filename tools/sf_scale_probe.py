"""One-off large-scale timing probe over ANY registry query (r5 verdict
item 3): bench.py's suite is pinned to HEADLINE+EXTRA, but the sf1 probe
wants a hand-picked headline set including tail queries (q18, the bounded
range join, attribution). Reuses the bench methodology: noop-sink warm
pass, min-of-N timed passes, clearCache+GC isolation between queries,
ONE JSON line on stdout.

Usage:
  SPARK_GRAFT_SF_DIR=/tmp/sf1 python tools/sf_scale_probe.py q1_pricing_summary q18_large_volume_customer ...
  (no args = the default sf1 headline set below)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the ~15 headline queries the r5 verdict named for the sf1 run
DEFAULT = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "q18_large_volume_customer",
    "knn_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_substring_spans",
    "retrieval_funnel_docs",
    "bm25_text_search",
    "hybrid_rrf_search",
    "text_profile",
    "sessionize_events",
    "asof_join_purchase_click",
    "range_join_bounded_recent_clicks",
    "attribution_time_decay",
    "knn_join_pruned",
]


def main() -> None:
    from chatdata_spark.registry import queries
    from chatdata_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    names = sys.argv[1:] or DEFAULT
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    spark = get_spark(app_name="sf_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    per_query: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(reps):
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)
        print(f"{name}: {per_query[name]}", file=sys.stderr)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    print(
        json.dumps(
            {
                "metric": "scale_probe_seconds",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
