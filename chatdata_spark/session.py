"""SparkSession factory.

Single place where engine-level performance knobs live so every entry point
(tests, bench, driver) gets the same tuned session:

- AQE on (runtime re-plan, skew-join handling) — the 100 TB posture.
- Arrow on — all pandas UDF exchange is Arrow-batched.
- shuffle partitions default to cores on local mode; at cluster scale callers
  override via ``shuffle_partitions`` (rule of thumb: ~2-3× total cores,
  sized so a partition stays well under executor memory).
- parquet pushdown/pruning left at defaults (on) — queries are written so
  filters and projections reach the scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "chatdata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE (r11 optimization round, measured-and-rejected):
        # spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=32m
        # (AQE runtime SMJ->shuffled-hash, guide §3.1) measured median
        # 1.03x across a 9-entry join-heavy paired subset — flat to
        # slightly worse everywhere except range_join_hotkey (0.80x);
        # at this partition size the hash-table build costs what the
        # sort saves. Left at the default (off).
        .config("spark.sql.session.timeZone", "UTC")
        # local[32] single-JVM: storage+execution share this heap; 8g made
        # persisted signature tables thrash against 32 concurrent shuffle
        # tasks (observed: cached-plan queries 3× slower under bench load).
        # The box has 128 GiB; at cluster scale executor memory governs.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
