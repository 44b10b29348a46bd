"""DSIR importance resampling (operators/dsir.py) — semantics beyond the
driver oracle (which pins cross-engine bit-equality of the full estimator):
direction of the weights, determinism, and the selection contract."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_ORACLE = "/root/testdata/sf0.01"


def test_weights_prefer_target_like_docs(spark):
    """Synthetic two-vocabulary corpus: docs drawn from the target's
    vocabulary must out-weigh docs from a disjoint vocabulary (the whole
    point of the estimator)."""
    from chatdata_spark.operators.dsir import dsir_log_weights

    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta alpha beta") for i in range(20)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zog quux blarp wibble")],
        "doc_id long, text string",
    )
    w = {r.doc_id: r.logw for r in dsir_log_weights(raw, target, "doc_id").collect()}
    assert w[1] > w[2]


def test_selection_is_deterministic_and_bounded(spark):
    from chatdata_spark.operators.dsir import dsir_resample

    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    tgt = d.filter(F.col("lang") == "en")
    a = [(r.doc_id, r.sel_key) for r in
         dsir_resample(d, tgt, "doc_id", k=50).select("doc_id", "sel_key").collect()]
    b = [(r.doc_id, r.sel_key) for r in
         dsir_resample(d, tgt, "doc_id", k=50).select("doc_id", "sel_key").collect()]
    assert a == b
    assert len(a) == 50
    assert len({x for x, _ in a}) == 50


def test_english_target_enriches_english(spark):
    """With the English slice as target, the selected sample's English
    share must exceed the corpus share — the estimator pulls toward the
    target distribution (weak inequality bound chosen well below observed
    enrichment so fixture drift can't flake it)."""
    from chatdata_spark.operators.dsir import dsir_resample

    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    tgt = d.filter(F.col("lang") == "en")
    total = d.count()
    en_total = tgt.count()
    sel = dsir_resample(d, tgt, "doc_id", k=50).select("lang").collect()
    en_sel = sum(1 for r in sel if r.lang == "en")
    assert en_sel / 50 > en_total / total
