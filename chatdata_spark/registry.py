"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers a named query here
with (a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, an equivalent ANSI-SQL oracle string DuckDB runs on the
same parquet tables. ``__spark_entry__.py`` re-exports the three driver
hooks from this module.

Determinism conventions (SURVEY §5):
- every float output is produced bit-identically on both sides: money
  aggregates go through ``CAST(x AS DECIMAL(18,d))`` before SUM (exact
  decimal arithmetic in both engines) and back to DOUBLE at the end;
  distances are computed in float64 with the same operation order and
  rounded to 6 digits;
- every LIMIT/top-k query carries a full tie-break ordering;
- aggregate/computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    # str, or a zero-arg callable resolved (once) at oracle_sql() time — for
    # oracles whose literals derive from data/computation too costly at import
    oracle: str | Callable[[], str] | None
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn`` as a driver-visible query, optionally with its DuckDB
    oracle SQL. Queries with ``oracle=None`` get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        _REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects; keep cheap (no Spark work at import).
    from chatdata_spark.queries import (  # noqa: F401
        analytics,
        cleaning,
        dedup,
        dialect,
        ingest,
        mutations,
        pipeline,
        quality,
        relational,
        sampling,
        stateful,
        text,
        textsearch,
        timeseries,
        vector,
    )


# The driver's correctness harness checks exactly the FIRST 50 names returned
# by queries(). This list pins those 50 slots — rotated each round so queries
# that were driver-green twice make room for never-driver-checked ones
# (r3 swapped 21 in; r4 swapped 25; r5 swaps the 21 now-twice-green r3
# first-timers — TPC-H q7/q9/q13/q19, merge/scd2, the knn-join/maxsim/
# fuzzy/bloom joins, funnel/heavy-hitters/unigram/quantile/topk analytics,
# curation/incremental-dedup, sessionize/profile/shard/phrase — for the
# TPC-H middle q4/q6/q10/q11/q12/q14/q15/q16/q18, the streaming trio,
# the composed QA tails, and the remaining vector/join first-timers).
# Everything not listed here is registered AFTER these (in import order) and
# stays pytest-oracled (tests/test_correctness runs the full registry).
# COVERAGE.md's "driver window" column mirrors this.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- kept sentinels (twice-green; one per core family) ---
    "knn_topk", "dialect_knn", "dedup_minhash_lsh", "text_profile",
    # --- round-4 first-timers, once-green: kept for second verification ---
    # TPC-H spine
    "q2_min_cost_supplier", "q8_market_share", "q17_small_quantity_revenue",
    "q20_dominant_promo_suppliers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # analytics family (data_quality_report was r4's one red — oracle dtype
    # fixed this round, must re-verify)
    "rollup_revenue_levels", "cube_orders_status_priority",
    "window_rank_family", "percentile_disc_price_by_flag",
    "corr_quantity_price_by_flag", "data_quality_report",
    # vector family
    "ann_lsh_exact", "matryoshka_knn", "binary_quant_knn",
    "mmr_diversified_knn", "hard_negative_mining", "ann_ivf_append_search",
    # streaming + flagship + soundness-oracle upgrades
    "streaming_windowed_counts", "retrieval_funnel_docs",
    "ann_lsh_probe", "knn_join_pruned", "ann_pq_adc",
    "streaming_incremental_embed", "streaming_sessionize",
    # --- rotated IN for round 5 (first driver verification) ---
    # TPC-H middle
    "q4_order_priority", "q6_forecast_revenue", "q10_returned_items",
    "q11_important_parts", "q12_priority_by_linestatus", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q18_large_volume_customer",
    # streaming trio (foreachBatch near-dup, dropDuplicates watermark,
    # stream-stream interval join)
    "streaming_distinct_events", "streaming_near_dup_docs",
    "streaming_join_click_purchase",
    # composed QA tails
    "qa_context_assembly", "stuff_context_docs", "rerank_snippet_search",
    # vector/join first-timers
    "mmr_diversified_knn_distributed", "knn_ip",
    "bucketed_fact_join_revenue", "leakage_safe_split_docs",
    "asof_join_purchase_click_sliced",
    # round-5 addition, verified the round it ships (the r4 pattern): the
    # new substring-dedup operator family's detection query
    "dedup_substring_spans",
)

# Rotation plan for round 6 (~27 names never-driver-checked after r5 —
# incl. the r5 tail additions dimred_rp_knn / range_join_bounded_recent_clicks /
# dedup_substring_removal / dedup_components_star / curation_domain_cap /
# corpus_report_docs / ann_ivf_delete_search and the two soundness-upgraded
# HLL queries (all foreign-cwd replay-verified the round they shipped;
# see tools/driver_replay.py REPLAY_ONLY; a REPLAY_ALL sweep also ran
# green this round)
# — all pytest-oracled every round): analytics (moving_avg_user_value,
# histogram, pivot/unpivot, percentile_stats, cohort_retention,
# sliding_window), dialect_parity_extended + dialect_conditional_aggs,
# embed_documents_batch-adjacent vector tails (ann_ivf_pruned,
# vector_brute_force_scores), store_session_lifecycle, and the remaining
# cleaning/ingest seconds. Swap out slots that will then be twice-green
# (the 27 r4 names above, keeping the four sentinels and any r5
# first-timer that goes red).


def _ordered() -> dict[str, QueryDef]:
    _load_all()
    missing = [n for n in DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    out = {n: _REGISTRY[n] for n in DRIVER_WINDOW}
    out.update((k, v) for k, v in _REGISTRY.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v.fn for k, v in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for k, v in _ordered().items():
        if v.oracle is None:
            continue
        if callable(v.oracle):
            v.oracle = v.oracle()  # resolve lazily, once
        out[k] = v.oracle
    return out
