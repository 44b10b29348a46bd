"""Sorted-layout data skipping: disjoint per-file key ranges (the parquet
equivalent of MergeTree's ORDER BY + sparse index) and scan-time pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.operators.layout import file_key_ranges, write_sorted
from tests.conftest import SF_ORACLE


def test_sorted_write_produces_disjoint_file_ranges(spark, tmp_path):
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    path = str(tmp_path / "orders_sorted")
    write_sorted(o, path, ["o_orderkey"], num_files=8)
    ranges = file_key_ranges(path, "o_orderkey")
    assert len(ranges) >= 6  # range partitioner may merge tiny buckets
    ordered = sorted(ranges)
    for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_point_lookup_reads_one_file_worth(spark, tmp_path):
    """A key-range predicate over the sorted layout must return correct
    rows; parquet stats make the scan skip non-matching files/row-groups
    (the footer ranges above are exactly what the reader consults)."""
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    path = str(tmp_path / "orders_sorted")
    write_sorted(o, path, ["o_orderkey"], num_files=8)
    sorted_tbl = spark.read.parquet(path)
    want = o.filter(F.col("o_orderkey").between(100, 120)).count()
    got = sorted_tbl.filter(F.col("o_orderkey").between(100, 120)).count()
    assert got == want
    plan = sorted_tbl.filter(F.col("o_orderkey").between(100, 120))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThanOrEqual(o_orderkey,100)" in plan
