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
# (r3 swapped 21 in; r4 swapped 25; r5 swapped 21 and went 50/50; r6
# rotated the whole 28-name backlog in plus all 18 round additions and
# went 50/50 again; r7 executes the r6 verdict's plan exactly: the 18
# now-twice-green r6 additions rotate OUT, the 26-name never-driver-
# checked backlog rotates IN, and the 21 once-green r5 deferrals return
# for their second green minus one TPC-H middle deferred to r8 — 51
# names, 50 slots. r7 additions displace one TPC-H second-green each and
# ship driver-verified in-round like every addition.)
# Everything not listed here is registered AFTER these (in import order) and
# stays pytest-oracled (tests/test_correctness runs the full registry).
# COVERAGE.md's "driver window" column mirrors this.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- FIRST driver checks: the 4 r9 tail additions, the only
    # never-driver-checked names in the registry (closes the ever-checked
    # gap to 253/253) ---
    "dialect_parity_sweep7", "doc_novelty_curve", "user_rfm_features",
    "knn_batch_queries",
    # --- kept sentinels (multi-green; one per core family) ---
    "knn_topk", "dialect_knn", "dedup_minhash_lsh", "text_profile",
    # --- second greens for the 9 r9 additions (first-checked in r9) ---
    "morton3d_events_zvalues", "dialect_parity_sweep6",
    "timeseries_gap_fill", "events_locf_fill", "sq8_rerank_knn",
    "dedup_containment_pairs", "streaming_kmv_overlap",
    "token_budget_mixture", "corpus_epoch_upsample",
    # --- second greens for the 9 big-surface placeholders the r9
    # additions displaced (all once-green) ---
    "graph_pagerank_transactions", "graph_trustrank_suppliers",
    "bpe_learn_merges", "dsir_resample_docs", "dedup_substring_removal",
    "semantic_dedup_keep", "decontam_embedding",
    "rollup_incremental_refresh", "curation_select_v2",
    # --- 24 lowest-green-count backlog slots, oldest single green first
    # (the 23 surviving r1-green names + the oldest r2-green). r10
    # additions displace from the TAIL of this segment one-for-one as
    # they land (collect_list_sorted first, then bottom-up), keeping the
    # stalest r1 greens in the window ---
    "anti_join_customers", "array_contains_docs", "case_when_pivot",
    "correlated_subquery", "cube_docs", "dialect_array_functions",
    "distinct_segments", "except_users", "explode_unnest",
    "expr_filter_docs", "group_count_docs", "having_filter",
    "ilike_docs", "in_filter_parts", "json_extract_events",
    "left_join_order_counts", "monthly_order_stats", "semi_join_orders",
    "set_ops_users", "string_funcs_parts",
    # --- r10 additions (each displaced one backlog-tail name:
    # ann_ivf_merge_search displaced collect_list_sorted,
    # dedup_substring_exact_spans displaced window_top3_orders_per_cust,
    # dialect_parity_sweep8 displaced window_running_sum,
    # bitext_margin_pairs displaced window_lag_delta) ---
    "ann_ivf_merge_search", "dedup_substring_exact_spans",
    "dialect_parity_sweep8", "bitext_margin_pairs",
)

# Rotation plan for round 11: FIRST driver check for the r10 TAIL
# addition semantic_chunk_spans (registered past the cap — the r9-tail
# precedent), second greens for the 4 windowed r10 additions
# (ann_ivf_merge_search, dedup_substring_exact_spans,
# dialect_parity_sweep8, bitext_margin_pairs) and the 4 r9 tails they
# join (dialect_parity_sweep7, doc_novelty_curve, user_rfm_features,
# knn_batch_queries — all first-checked in r10), then the once-green
# backlog oldest-first: the 4 names the r10 additions displaced
# (collect_list_sorted, window_top3_orders_per_cust,
# window_running_sum, window_lag_delta), the remaining r2-greens
# (pack_documents, sample_hash_20pct, split_train_val_test,
# stratified_quota_by_lang, text_lang_distribution,
# text_quality_by_source, vector_centroids_by_label),
# data_quality_report (r5), then the r6 block. COVERAGE.md's
# green-count column is the mechanical priority order. Steady state:
# sentinels + newest additions + the lowest-green-count backlog.


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
