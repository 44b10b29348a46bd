"""Count-min sketch — mergeable point-frequency estimation.

The curation pipeline's frequency questions ("how often does this URL /
n-gram / user appear across the corpus?") need exact answers only for the
heavy tail that heavyhitters.py already serves; for the POINT-QUERY case
("estimate THIS item's count without materializing the full frequency
table") the standard sketch is count-min (Cormode & Muthukrishnan 2005):
``depth`` hash rows × ``width`` counters, update = +1 at (row,
h_row(item)), estimate = min over rows. Guarantees: estimate ≥ true
count always (one-sided), and ≤ true + εN with probability 1-δ for
width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Spark-first shape: the "sketch" IS a DataFrame of (row_idx, col, cnt) —
built with one scan (explode of ``depth`` precomputed buckets per item)
and one map-side-combined groupBy whose key space is depth × width
(BOUNDED, independent of corpus size: the post-shuffle state for a
4×1024 sketch is 4096 rows no matter how many trillions of updates).
Two sketches merge by union + re-sum — the decomposable-aggregate
property that makes the sketch incremental (rollup.py pattern) and
cross-shard mergeable. Estimation joins the query items against the
sketch on (row_idx, col) — broadcast-sized by construction.

Hashing is the repo's cross-engine md5 recipe (operators/sampling.py:26):
bucket = uint32(md5(salt || row || '#' || item)) % width, bit-identical
in Spark, DuckDB, and Python, so sketches and estimates are exactly
reproducible everywhere — the oracle replays the whole sketch in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item: F.Column, row_idx: int, width: int, salt: str) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}{row_idx}#"), item.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint") % F.lit(width)


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """One occurrence per input row → sketch (row_idx, col, cnt). One scan,
    one bounded groupBy (≤ depth·width output rows). NULL items are
    excluded (md5(NULL) has no bucket; a NULL could never be estimated)."""
    cells = df.filter(F.col(item_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        _bucket(F.col(item_col), r, width, salt).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.row_idx", "cell.col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union of sketches built with the same (depth, width, salt) — counts
    add cell-wise (the mergeable-state property)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """items → (item_col, est_cnt): min over the depth cells. The sketch
    side is depth·width rows — broadcast by construction; absent cells
    count 0 (possible when estimating items never inserted)."""
    probes = items.select(item_col).distinct().select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        _bucket(F.col(item_col), r, width, salt).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(item_col, "cell.row_idx", "cell.col")
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
