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
    # --- FIRST driver check: semantic_chunk_spans, the r10 tail addition
    # and the registry's only never-driver-checked name (closes the
    # ever-checked gap to 258/258) ---
    "semantic_chunk_spans",
    # --- kept sentinels (multi-green; one per core family) ---
    "knn_topk", "dialect_knn", "dedup_minhash_lsh", "text_profile",
    # --- second greens for the 8 r10 first-timers (4 r9 tails + 4
    # windowed r10 additions, all first-checked in r10) ---
    "dialect_parity_sweep7", "doc_novelty_curve", "user_rfm_features",
    "knn_batch_queries", "ann_ivf_merge_search",
    "dedup_substring_exact_spans", "dialect_parity_sweep8",
    "bitext_margin_pairs",
    # --- once-green backlog, oldest green first: the 3 r1-greens the
    # r10 additions displaced, the r2-greens, data_quality_report (r5) ---
    "window_lag_delta", "window_running_sum",
    "window_top3_orders_per_cust", "collect_list_sorted",
    "pack_documents", "sample_hash_20pct", "split_train_val_test",
    "stratified_quota_by_lang", "text_lang_distribution",
    "text_quality_by_source", "vector_centroids_by_label",
    "data_quality_report",
    # --- slots from the once-green r6 block (alphabetical; the
    # remaining r6 names + dialect_parity_sweep5 queue for r12). r11
    # additions displace from the TAIL of this segment one-for-one as
    # they land (pivot_status_by_priority displaced first by
    # dedup_minhash_autoband, then bottom-up) ---
    "ann_ivf_delete_search", "ann_ivf_pruned", "approx_distinct_users",
    "attribution_time_decay", "bpe_encode_token_stats",
    "cms_user_frequency", "cohort_retention_daily", "corpus_report_docs",
    "curation_domain_cap", "decontam_docs_bloom", "dedup_components_star",
    # --- r11 additions (driver-verified in-round; displaced
    # pivot_status_by_priority, percentile_stats, nb_quality_classifier,
    # moving_avg_customer_orders, lm_perplexity_buckets,
    # histogram_order_totalprice, gopher_quality_filter,
    # exact_distinct_users, embed_documents_batch,
    # domain_mixture_sample, dimred_rp_knn, dialect_parity_extended,
    # dialect_conditional_aggs, dedup_winnow_pairs from the tail) ---
    "dedup_minhash_autoband", "ann_opq_adc", "semantic_chunk_sentences",
    "dialect_parity_sweep9", "ann_ivfpq_residual_search",
    "pack_best_fit_docs", "unigram_vocab_docs", "gopher_repetition_filter",
    "unigram_encode_stats", "graph_hits_entities",
    "graph_harmonic_hyperball", "kcenter_coreset_embeddings",
    "dialect_parity_sweep10", "span_corruption_docs",
)

# Rotation plan for round 12: second greens for the 14 r11 in-window
# additions (incl. semantic_chunk_spans' would-be second), then the
# once-green backlog oldest-first — the 13 r6 names the r11 additions
# displaced from this window's tail (pivot_status_by_priority,
# percentile_stats, nb_quality_classifier, moving_avg_customer_orders,
# lm_perplexity_buckets, histogram_order_totalprice,
# gopher_quality_filter, exact_distinct_users, embed_documents_batch,
# domain_mixture_sample, dimred_rp_knn, dialect_parity_extended,
# dialect_conditional_aggs), the 13 r6 once-greens that didn't fit
# (pmi_phrase_mining, range_join_bounded_recent_clicks,
# rollup_distinct_approx, sliding_window_counts,
# store_session_lifecycle, streaming_cms_user_frequency,
# streaming_static_dim_join, text_fingerprint_rolling, tfidf_top_terms,
# union_all_counts, unpivot_part_measures, vector_brute_force_scores,
# weighted_sample_by_length), then dialect_parity_sweep5 (r9) and the
# two-green pool lowest-count-first. The past-the-cap r11 tail addition
# fuzzy_name_pairs takes a FIRST check with the r11 second greens (the
# semantic_chunk_spans precedent). COVERAGE.md's green-count column is
# the mechanical priority order. Steady state: sentinels + newest
# additions + the lowest-green-count backlog.


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
