#!/usr/bin/env python
"""Measure the all-node random-walk posture (r6 verdict item 4).

operators/graph.py::random_walks claims: per-hop cost is ONE pass over the
indexed edge table against the frontier, so walking from EVERY node (the
DeepWalk corpus posture) amortizes the per-hop edge pass that a small
frontier pays in full. This probe times the same 6-step walk corpus at
$SPARK_GRAFT_SF_DIR (default sf0.1) from three start sets:

  suppliers-only  (~1k starts at sf0.1 — the registered query's frontier)
  all nodes       (~16k starts — suppliers + customers, the DeepWalk norm)
  tiny seed set   (32 starts — the "user walks a handful of seeds" case)

If wall-clock is ~flat across start-set sizes, the per-hop edge pass
dominates and the all-node posture claim is MEASURED: corpus-scale walk
generation is the regime this operator is shaped for. If the tiny-seed
run costs nearly the all-node run, that is the documented caveat made
visible (a frontier-sized edge prune would fix it at the cost of a
per-hop semi-join — decision recorded in PLANS.md).

Prints one JSON line; run standalone (fresh JVM) for clean numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from chatdata_spark.operators.graph import random_walks  # noqa: E402
from chatdata_spark.session import get_spark  # noqa: E402


def build_graph(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return pairs, edges


def time_walks(spark, edges, starts, reps=2, prune=False) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        random_walks(
            edges, starts, steps=6, salt="walk", prune_frontier=prune
        ).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="walk_posture_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    pairs, edges = build_graph(spark, sf_dir)
    suppliers = pairs.select(F.col("s").alias("node"))
    all_nodes = suppliers.union(pairs.select(F.col("c").alias("node")))
    tiny = suppliers.distinct().orderBy("node").limit(32)
    n_sup, n_all = suppliers.distinct().count(), all_nodes.distinct().count()
    n_edges = edges.count()

    # warm: file listing + the one-time edge indexing path, untimed
    time_walks(spark, edges, tiny, reps=1)

    out = {
        "sf_dir": sf_dir,
        "n_edges": n_edges,
        "starts": {"tiny": 32, "suppliers": n_sup, "all_nodes": n_all},
        "sec": {
            "tiny": time_walks(spark, edges, tiny),
            "tiny_pruned": time_walks(spark, edges, tiny, prune=True),
            "suppliers": time_walks(spark, edges, suppliers),
            "all_nodes": time_walks(spark, edges, all_nodes),
        },
    }
    out["all_vs_suppliers_x"] = round(out["sec"]["all_nodes"] / out["sec"]["suppliers"], 2)
    out["starts_ratio_x"] = round(n_all / n_sup, 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
