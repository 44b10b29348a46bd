"""Driver-contract budget: the driver's correctness harness checks exactly
the first 50 names queries() yields, so the window composition is itself a
contract — pin it here so an innocent import reorder can't silently evict
a flagship operator from driver verification (round-1 failure mode)."""

from __future__ import annotations

from chatdata_spark.registry import DRIVER_WINDOW, oracle_sql, queries

DRIVER_CAP = 50

MUST_BE_DRIVER_CHECKED = {
    # the reference's core templates + every extension family's flagship
    "knn_topk", "knn_filtered", "knn_l2", "ann_ivf_full_probe",
    "dialect_knn", "self_query_knn", "routed_index_knn",
    "text_profile", "asof_join_purchase_click", "sessionize_events",
    "range_join_click_window", "sample_hash_20pct", "split_train_val_test",
    "dedup_exact", "dedup_minhash_lsh", "dedup_embedding",
    "mutation_upsert_keep_latest", "q1_pricing_summary",
    # corpus-cleaning flagships (round 2)
    "pii_redaction", "text_repetition_signals", "decontam_docs",
    "chunk_dedup_docs",
}


def test_window_is_exactly_the_first_cap_names():
    names = list(queries())
    assert len(DRIVER_WINDOW) == DRIVER_CAP
    assert len(set(DRIVER_WINDOW)) == DRIVER_CAP, "duplicate window entries"
    assert names[:DRIVER_CAP] == list(DRIVER_WINDOW)


def test_flagships_inside_window():
    assert MUST_BE_DRIVER_CHECKED <= set(DRIVER_WINDOW)


def test_window_queries_are_oracle_backed():
    # rows-only entries waste a driver-verified slot; every windowed query
    # must carry a DuckDB oracle (the strongest check the driver runs).
    oracles = oracle_sql()
    missing = [n for n in DRIVER_WINDOW if n not in oracles]
    assert not missing, f"window queries without oracle: {missing}"


def test_tail_is_deliberate():
    # everything past the cap is either redundant-with-windowed coverage or
    # rows-only by design; keep the total bounded so the registry stays
    # auditable (VERDICT r01 item 10).
    names = list(queries())
    assert len(names) <= 160
