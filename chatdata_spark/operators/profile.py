"""Single-pass table profiling (ANALYZE TABLE shape): per-column row/null/
distinct counts and min/max in ONE aggregation over the data (extension —
the curation-side complement of operators/quality.py's rule validation;
the reference exposes table stats only through MyScale's system tables).

Plan shape: one `agg()` carrying every per-column expression. The exact
COUNT(DISTINCT) set makes Catalyst plan a single Expand (one pass over the
input, one row-multiply per distinct-counted column) — exact and
oracle-checkable, the right default up to ~10 columns. At 100 TB switch
``distinct="approx"``: approx_count_distinct folds into the same partial
aggregation with no Expand at all (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(
    df: DataFrame, columns: list[str] | None = None, distinct: str = "exact"
) -> DataFrame:
    """One row per profiled column: (column, n, n_null, n_distinct,
    min_num, max_num, min_str, max_str). Numeric min/max surface as DOUBLE,
    string min/max as-is; other types report counts only (engines disagree
    on their string rendering, and the point of min/max is range sanity).
    ``distinct='approx'`` swaps exact distinct counts for HLL estimates
    (the 100 TB default — no Expand)."""
    if distinct == "exact":
        from chatdata_spark.operators.dedup import _spread

        # the Expand multiplies rows per distinct-counted column BEFORE the
        # partial agg — a single-partition input (local single-row-group
        # files) would run that on one core; _spread no-ops when the source
        # already has >= parallelism partitions (the cluster case). Approx
        # mode has NO Expand (HLL folds into the partial agg), so spreading
        # there is a pure extra exchange — the r4→r5 bench drift on
        # profile_orders_approx was exactly that (~80 ms at sf0.1).
        df = _spread(df)
        nd = F.count_distinct
    elif distinct == "approx":
        nd = F.approx_count_distinct
    else:
        raise ValueError(f"distinct must be 'exact' or 'approx', got {distinct!r}")
    types = dict(df.dtypes)
    cols = columns or [c for c in df.columns]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        t = types[c]
        aggs.append(F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__null_{c}"))
        aggs.append(nd(F.col(c)).alias(f"__nd_{c}"))
        if t in _NUMERIC:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
        elif t == "string":
            aggs.append(F.min(F.col(c)).alias(f"__smin_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__smax_{c}"))
    one = df.agg(*aggs)

    null_str = F.lit(None).cast("string")
    null_num = F.lit(None).cast("double")
    rows = []
    for c in cols:
        t = types[c]
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if t in _NUMERIC else null_num).alias("min_num"),
                (F.col(f"__max_{c}") if t in _NUMERIC else null_num).alias("max_num"),
                (F.col(f"__smin_{c}") if t == "string" else null_str).alias("min_str"),
                (F.col(f"__smax_{c}") if t == "string" else null_str).alias("max_str"),
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("column")
    )
