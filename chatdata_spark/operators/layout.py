"""Sorted table layout — the MergeTree primary-key clustering parity
(`ENGINE = ReplacingMergeTree ORDER BY id`, `index_granularity = 8192`,
/root/reference/README.md:88, docs/vector-sql.md:195).

ClickHouse clusters rows by primary key and skips granules via sparse
index; parquet's equivalent is **row-group / file min-max statistics**:
write data range-partitioned + sorted on the key and every selective key
predicate prunes files (and row groups inside them) at scan time —
Catalyst's filter pushdown consumes the stats automatically.

``write_sorted``: repartitionByRange(key) → sortWithinPartitions(key) →
parquet (optionally bounded file size as the granularity knob). The result:
per-file key ranges are DISJOINT, so a point/range predicate touches
O(files-in-range), not O(all files) — verified by reading footer stats in
tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int = 8,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    out = df.repartitionByRange(num_files, *sort_cols).sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file from footer statistics —
    what the scan's file/row-group pruning consumes."""
    import os

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges
