"""Incremental minhash dedup: batches against the stored corpus must union
to exactly the one-shot full-corpus result, with prior batches contributing
stored signatures (no re-hash) and an append-only on-disk layout."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from chatdata_spark.operators.dedup import minhash_lsh_pairs
from chatdata_spark.operators.incdedup import IncrementalMinHashStore
from tests.conftest import SF_ORACLE


def _docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select("doc_id", "text")


def _pairs(df):
    return sorted((r.i, r.j, r.jaccard) for r in df.collect())


def test_incremental_batches_union_to_full_corpus(spark, tmp_path):
    d = _docs(spark)
    b1 = d.filter(F.col("doc_id") % 3 != 0)
    b2 = d.filter(F.col("doc_id") % 3 == 0)
    store = IncrementalMinHashStore(spark, str(tmp_path / "inc"))
    p1 = _pairs(store.add_batch(b1, "doc_id"))
    p2 = _pairs(store.add_batch(b2, "doc_id"))
    # batch-1 pairs are wholly within batch 1; batch-2 pairs all touch batch 2
    assert all(i % 3 != 0 and j % 3 != 0 for i, j, _ in p1)
    assert all(i % 3 == 0 or j % 3 == 0 for i, j, _ in p2)
    full = _pairs(minhash_lsh_pairs(d, "doc_id", "text"))
    assert sorted(p1 + p2) == full
    assert store.batches() == [0, 1]
    # three-batch replay on a fresh store agrees too (new x stored across 2 prior)
    b2a = d.filter(F.col("doc_id") % 3 == 0).filter(F.col("doc_id") % 2 == 0)
    b2b = d.filter(F.col("doc_id") % 3 == 0).filter(F.col("doc_id") % 2 != 0)
    s2 = IncrementalMinHashStore(spark, str(tmp_path / "inc3"))
    q = _pairs(s2.add_batch(b1, "doc_id")) + _pairs(s2.add_batch(b2a, "doc_id")) + _pairs(
        s2.add_batch(b2b, "doc_id")
    )
    assert sorted(q) == full


def test_store_layout_is_append_only_and_param_checked(spark, tmp_path):
    d = _docs(spark)
    store = IncrementalMinHashStore(spark, str(tmp_path / "inc"))
    store.add_batch(d.filter(F.col("doc_id") < 200), "doc_id").count()
    sig0 = os.path.join(str(tmp_path / "inc"), "sigs", "batch=0")
    mtimes = {f: os.path.getmtime(os.path.join(sig0, f)) for f in os.listdir(sig0)}
    store.add_batch(d.filter(F.col("doc_id") >= 200), "doc_id").count()
    # batch 0 files untouched by batch 1 (append-only, no rewrite)
    assert all(os.path.getmtime(os.path.join(sig0, f)) == m for f, m in mtimes.items())
    assert os.path.isdir(os.path.join(str(tmp_path / "inc"), "sigs", "batch=1"))
    # stored signatures carry band keys — the candidate join needs no re-hash
    stored = spark.read.parquet(sig0)
    assert {"id", "shh", "sz", "band_keys"} <= set(stored.columns)
    # reopening with different parameters must refuse
    with pytest.raises(ValueError, match="parameter"):
        IncrementalMinHashStore(spark, str(tmp_path / "inc"), num_hashes=64)


def test_direct_readd_emits_no_self_pairs(spark, tmp_path):
    """An id re-added via add_batch directly (no caller-side anti-join, the
    streaming wrapper's job) collides with its own stored signature in
    every band — the cross-batch i<j guard must drop those self-pairs."""
    d = _docs(spark).filter(F.col("doc_id") < 100)
    store = IncrementalMinHashStore(spark, str(tmp_path / "inc"))
    store.add_batch(d, "doc_id").count()
    again = _pairs(store.add_batch(d, "doc_id"))
    assert all(i != j for i, j, _ in again)
    assert all(i < j for i, j, _ in again)


def test_stage_without_commit_replays_idempotently(spark, tmp_path):
    """Crash discipline (effectively-once for sinks): a staged batch that
    never committed reuses the SAME batch id on retry and overwrites the
    same directory — no duplicate signatures, and the committed result
    equals the straight-through run."""
    d = _docs(spark)
    b1 = d.filter(F.col("doc_id") % 3 != 0)
    b2 = d.filter(F.col("doc_id") % 3 == 0)
    store = IncrementalMinHashStore(spark, str(tmp_path / "inc"))
    store.add_batch(b1, "doc_id").count()

    # first attempt: stage b2, "crash" before commit (pairs never consumed)
    bid_a, _ = store.stage_batch(b2, "doc_id")
    assert store.batches() == [0]          # nothing committed
    # retry: same batch id, idempotent overwrite, then commit
    bid_b, pairs = store.stage_batch(b2, "doc_id")
    assert bid_a == bid_b == 1
    got = _pairs(pairs)
    store.commit_batch(bid_b)
    assert store.batches() == [0, 1]
    # stored state equals the one-shot result
    full = _pairs(minhash_lsh_pairs(d, "doc_id", "text"))
    p1 = _pairs(
        IncrementalMinHashStore(spark, str(tmp_path / "fresh")).add_batch(b1, "doc_id")
    )
    assert sorted(p1 + got) == full
    # no duplicate signature rows on disk
    sigs = store._stored_sigs()
    assert sigs.count() == sigs.select("id").distinct().count() == d.count()


def test_double_stage_different_input_raises(spark, tmp_path):
    """In-process misuse guard: staging a SECOND, different batch without
    committing the first would reuse the same batch id and silently
    overwrite the first's staged signatures — must raise. Retrying the
    SAME input (crash-retry discipline) stays allowed, and committing
    clears the guard."""
    d = _docs(spark)
    b1 = d.filter(F.col("doc_id") % 3 != 0)
    b2 = d.filter(F.col("doc_id") % 3 == 0)
    store = IncrementalMinHashStore(spark, str(tmp_path / "inc"))
    bid, _ = store.stage_batch(b1, "doc_id")
    with pytest.raises(RuntimeError, match="already staged"):
        store.stage_batch(b2, "doc_id")
    # same-input retry is fine
    bid2, _ = store.stage_batch(b1, "doc_id")
    assert bid2 == bid
    store.commit_batch(bid)
    # after commit the next stage gets a fresh id
    bid3, _ = store.stage_batch(b2, "doc_id")
    assert bid3 == bid + 1
