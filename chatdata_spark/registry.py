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
# that were driver-green twice make room for never-driver-checked ones (r3
# swapped 21: the mutation trio, rollups, q1/q3/q5, the sampling five,
# collect_list, row_to_document, and six twice-green family seconds — for
# the TPC-H join sweep, MERGE/SCD2, funnel, batch-kNN join, MaxSim, heavy
# hitters, bloom join, fuzzy join, unigram log-prob, histogram quantiles,
# salted grouped top-k, and the round-3 additions below).
# Everything not listed here is registered AFTER these (in import order) and
# stays pytest-oracled (tests/test_correctness runs the full registry).
# COVERAGE.md's "driver window" column mirrors this.
DRIVER_WINDOW: tuple[str, ...] = (
    # vector search core (S1/V1-V6/T1)
    "knn_topk", "knn_filtered", "knn_l2", "ann_ivf_full_probe",
    # dialect + self-query compilers (P2-P9, §2.9, §3.2, §4.3.3)
    "dialect_knn", "self_query_filter",
    "self_query_knn", "routed_index_knn",
    # text analysis + full-text/hybrid search family
    "text_profile", "bm25_text_search", "hybrid_rrf_search",
    # corpus cleaning family (PII / repetition / decontamination / chunk dedup)
    "pii_redaction", "text_repetition_signals", "decontam_docs",
    "chunk_dedup_docs",
    # timeseries family
    "asof_join_purchase_click", "sessionize_events",
    "range_join_click_window",
    # dedup family
    "dedup_exact", "dedup_jaccard_exact", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding", "dedup_components",
    # ClickHouse scalar parity sweeps
    "dialect_scalar_parity", "dialect_array_map",
    # ingest + multimodal
    "ingest_flatten_json", "multimodal_feature_knn",
    # representative relational operator classes
    "window_latest_event",
    # --- rotated IN for round 3 (first driver verification) ---
    # TPC-H join sweep
    "q7_volume_shipping", "q9_profit_by_nation_year",
    "q13_customer_distribution", "q19_disjunctive_pushdown",
    # mutations at history scale
    "merge_into_orders", "scd2_history_events",
    # vector/join operators
    "knn_join_exact", "maxsim_late_interaction", "fuzzy_join_part_names",
    "bloom_semi_join_lineitem",
    # analytics / text extensions
    "funnel_view_click_purchase", "heavy_hitter_tokens",
    "text_unigram_logprob", "quantile_hist_value_by_type",
    "topk_orders_per_priority",
    # round-3 additions, driver-verified the round they ship
    "curation_pipeline_docs", "dedup_incremental_batches",
    "sessionize_events_sliced", "profile_orders_stats",
    "shard_assignment_docs", "phrase_proximity_docs",
)


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
