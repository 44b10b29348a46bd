"""Declarative data-quality validation (north-star extension; the
reference trusts its upload pipeline and has no dataset validation —
nearest analogue is the embed-dimension check on ingest,
app/backend/chat_bot/tools.py:51-60, covered by sources/ingest.py).

Expectations-style checks over a table, reported as one long-format
violations frame ``(rule, n_violations)``:

- **row rules** (null / range / regex / custom predicate): ALL compiled
  into a single aggregation pass — one scan regardless of rule count,
  ``sum(CASE WHEN <violation> THEN 1 END)`` per rule, unpivoted via
  ``stack``. No per-rule scans.
- **uniqueness**: one aggregate of ``count - count_distinct``.
- **referential integrity**: child anti-join parent, counted; the parent
  side carries only its key column (projection-pruned) and broadcasts
  when small.

At 100 TB the row-rule pass is a map-side partial aggregation (a few
counters per task); uniqueness shuffles one hash per key; referential
shuffles the child's key column only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_rule_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """``rules``: name → boolean Column that is True when the row VIOLATES
    the rule. Returns (rule, n_violations), one scan for all rules."""
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("bigint").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.selectExpr(f"stack({len(rules)}, {pairs}) AS (rule, n_violations)")


def uniqueness_violations(df: DataFrame, key_cols: list[str], rule: str | None = None) -> DataFrame:
    """Rows beyond the first per key: ``count(*) - count(distinct key)``."""
    name = rule or ("unique_" + "_".join(key_cols))
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return df.agg(
        (F.count(F.lit(1)) - F.countDistinct(key)).cast("bigint").alias("n_violations")
    ).select(F.lit(name).alias("rule"), "n_violations")


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, rule: str | None = None
) -> DataFrame:
    """Child rows whose key has no parent (orphans), via anti-join on the
    projection-pruned parent key."""
    name = rule or f"ref_{child_key}_in_{parent_key}"
    orphans = child.select(child_key).join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
        F.lit(name).alias("rule"), "n_violations"
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-family violation frames into one report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
