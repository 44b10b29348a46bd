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
    # --- kept sentinels (multi-green; one per core family) ---
    "knn_topk", "dialect_knn", "dedup_minhash_lsh", "text_profile",
    # --- rotated IN for round 7: the ENTIRE never-driver-checked backlog
    # (26 names — landed past the cap in r6, full-registry pytest-oracled
    # meanwhile; first driver check now) ---
    "graph_random_walks", "graph_skipgram_pairs", "dedup_jaccard_prefix",
    "ann_ivfpq_search", "kmeans_embedding_clusters",
    "dedup_chunk_boilerplate", "cluster_balanced_sample",
    "source_overlap_kmv", "ingest_csv_typed",
    "sequence_match_click_to_purchase", "sequence_count_conversion_cycles",
    "anomaly_mad_event_values", "pca_embedding_knn",
    "mixture_temperature_sample", "graph_label_propagation",
    "drift_psi_event_values", "streaming_drift_psi",
    "ingest_orc_roundtrip", "drift_psi_lang_mix", "corpus_health_report",
    "funnel_tight_window", "text_ngram_diversity",
    "heavy_hitter_parts_weighted", "text_zipf_slope",
    "dialect_argmax_argmin", "dialect_uniq_upto",
    # --- once-green r5 first-timers, back for their second green (the
    # r6 deferral; q12_priority_by_linestatus defers to r8 — 51 names,
    # 50 slots, TPC-H middles are the lowest-risk class) ---
    "stuff_context_docs", "streaming_distinct_events",
    "streaming_join_click_purchase", "leakage_safe_split_docs",
    "asof_join_purchase_click_sliced", "qa_context_assembly",
    "rerank_snippet_search", "bucketed_fact_join_revenue",
    "streaming_near_dup_docs", "mmr_diversified_knn_distributed",
    "dedup_substring_spans",
    "knn_ip",
    # --- r7 additions, driver-verified in-round (each displaces one
    # TPC-H second green to r8 per policy: q16/q15/q14/q11/q10/q6/q4/q18) ---
    "store_kb_tool_lifecycle", "quantile_sketch_totalprice",
    "streaming_quantile_sketch", "sq8_quant_knn", "dialect_retention",
    "dialect_parity_datetime_bits", "drift_ks_event_values",
    "streaming_heavy_hitter_tokens",
)

# Rotation plan for round 8: after r7 the never-driver-checked backlog is
# ONLY the r7 additions that landed after the window filled (TWO:
# zorder_events_zvalues and streaming_heavy_hitter_revenue — the 8
# earlier r7 additions displaced a TPC-H second-green each and shipped
# driver-verified in-round; see the once-green comment above). The r8 window: 4 sentinels + any r7
# additions not yet driver-checked + the deferred TPC-H second greens
# (q12_priority_by_linestatus then the q16/q15/q14/q11/q10/q6/q4/q18 middles first) + second passes for the 26 r7
# first-timers as slots allow, largest-operator-surface first
# (graph/PCA/k-means/IVF-PQ before dialect scalars). From here the window
# is in its steady state: sentinels + newest additions + second greens.


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
