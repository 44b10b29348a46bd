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
    # --- FIRST driver check: fuzzy_name_pairs, the r11 past-the-cap tail
    # addition and the registry's only never-driver-checked name (the
    # semantic_chunk_spans precedent) ---
    "fuzzy_name_pairs",
    # --- kept sentinels (multi-green; one per core family) ---
    "knn_topk", "dialect_knn", "dedup_minhash_lsh", "text_profile",
    # --- the r11-REWRITTEN cores, ahead of backlog second-greens (r11
    # verdict item 2): their implementations changed in the optimization
    # round while they were rotated out — the driver re-verifies them
    # here. dedup_substring_{spans,removal} also carry this round's
    # bounded hot-gram count rewrite. ---
    "graph_pagerank_transactions", "graph_trustrank_suppliers",
    "kmeans_embedding_clusters", "sq8_rerank_knn",
    "dedup_substring_spans", "dedup_substring_removal",
    "lm_perplexity_buckets", "curation_pipeline_docs",
    "retrieval_funnel_docs",
    # --- second greens for the 15 r11 first-timers (semantic_chunk_spans
    # + the 14 windowed r11 additions) ---
    "semantic_chunk_spans", "dedup_minhash_autoband", "ann_opq_adc",
    "semantic_chunk_sentences", "dialect_parity_sweep9",
    "ann_ivfpq_residual_search", "pack_best_fit_docs",
    "unigram_vocab_docs", "gopher_repetition_filter",
    "unigram_encode_stats", "graph_hits_entities",
    "graph_harmonic_hyperball", "kcenter_coreset_embeddings",
    "dialect_parity_sweep10", "span_corruption_docs",
    # --- once-green backlog, oldest green first: the 12 r6 names the r11
    # additions displaced (lm_perplexity_buckets already above) ---
    "pivot_status_by_priority", "percentile_stats",
    "nb_quality_classifier", "moving_avg_customer_orders",
    "histogram_order_totalprice", "gopher_quality_filter",
    "exact_distinct_users", "embed_documents_batch",
    "domain_mixture_sample", "dimred_rp_knn", "dialect_parity_extended",
    "dialect_conditional_aggs",
    # --- next once-green r6 block, listed order (union_all_counts,
    # unpivot_part_measures, vector_brute_force_scores,
    # weighted_sample_by_length + dialect_parity_sweep5 queue for r13) ---
    "pmi_phrase_mining", "range_join_bounded_recent_clicks",
    "rollup_distinct_approx", "sliding_window_counts",
    "store_session_lifecycle", "streaming_cms_user_frequency",
    "streaming_static_dim_join", "text_fingerprint_rolling",
    "tfidf_top_terms",
)

# Rotation plan for round 13: second greens for fuzzy_name_pairs, then
# the once-green backlog oldest-first — the r6 leftovers
# (union_all_counts, unpivot_part_measures, vector_brute_force_scores,
# weighted_sample_by_length), dialect_parity_sweep5 (r9), then the
# two-green pool lowest-count-first (the r10/r11 second-green blocks
# rotate out). COVERAGE.md's green-count column is the mechanical
# priority order. Steady state: sentinels + newest additions + the
# lowest-green-count backlog.


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
