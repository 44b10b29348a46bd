"""Unit tests for corpus cleaning: PII redaction, repetition signals,
decontamination, chunk dedup (beyond the sf0.01 oracle rows in
tests/test_correctness.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.functions.cleaning import (
    bigrams_col,
    duplicate_token_ratio,
    pii_counts,
    redact_pii,
)
from chatdata_spark.operators.chunks import chunk_dedup, chunk_dedup_reassemble, chunk_documents
from chatdata_spark.operators.decontam import decontaminate


def test_redact_pii_masks_every_kind(spark):
    txt = (
        "write alice.smith+x@corp.example.org or call 555-123-4567 / 555.987.6543, "
        "ssn 123-45-6789, server 192.168.0.12 done"
    )
    df = spark.createDataFrame([(txt,)], "text string")
    row = df.select(
        redact_pii("text").alias("red"), *[v.alias(k) for k, v in pii_counts("text").items()]
    ).first()
    assert row["n_email"] == 1 and row["n_ssn"] == 1
    assert row["n_phone"] == 2 and row["n_ipv4"] == 1
    for needle in ("alice", "555", "123-45", "192.168"):
        assert needle not in row["red"]
    assert row["red"].count("<PHONE>") == 2
    assert "<EMAIL>" in row["red"] and "<SSN>" in row["red"] and "<IPV4>" in row["red"]


def test_redaction_leaves_clean_text_untouched(spark):
    df = spark.createDataFrame([("plain words only here",)], "text string")
    row = df.select(redact_pii("text").alias("red")).first()
    assert row["red"] == "plain words only here"


def test_repetition_signal_exprs(spark):
    df = spark.createDataFrame([("a a a b",), ("x",)], "text string").select(
        F.split("text", " ").alias("w")
    )
    rows = df.select(
        duplicate_token_ratio("w").alias("dup"), bigrams_col("w").alias("bg")
    ).collect()
    assert rows[0]["dup"] == 0.5  # 4 tokens, 2 distinct
    assert rows[0]["bg"] == ["a a", "a a", "a b"]
    assert rows[1]["dup"] == 0.0 and rows[1]["bg"] == []


def test_decontaminate_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear in this row"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "quick brown fox jumps over")], "bench_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, n=5, min_hits=1).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[2]["overlap_frac"] == 0.0


def test_chunk_documents_shapes(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_words=2).orderBy("chunk_idx").collect()
    assert [(r["chunk_idx"], r["chunk_text"]) for r in rows] == [
        (0, "a b"), (1, "c d"), (2, "e"),
    ]


def test_chunk_dedup_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),     # chunks: "a b", "c d"
            (2, "a b x y"),     # "a b" already seen in doc 1
            (3, "a b c d"),     # fully duplicate of doc 1
        ],
        "doc_id long, text string",
    )
    kept = chunk_dedup(df, chunk_words=2).collect()
    assert {(r["doc_id"], r["chunk_text"]) for r in kept} == {
        (1, "a b"), (1, "c d"), (2, "x y"),
    }
    rebuilt = {r["doc_id"]: r for r in chunk_dedup_reassemble(df, chunk_words=2).collect()}
    assert rebuilt[1]["cleaned_text"] == "a b c d"
    assert rebuilt[2]["cleaned_text"] == "x y" and rebuilt[2]["n_chunks_kept"] == 1
    assert rebuilt[3]["cleaned_text"] == "" and rebuilt[3]["n_chunks_kept"] == 0


def test_chunk_dedup_drops_within_doc_repeats(spark):
    df = spark.createDataFrame([(7, "p q p q p q")], "doc_id long, text string")
    kept = chunk_dedup(df, chunk_words=2).collect()
    assert [(r["chunk_idx"], r["chunk_text"]) for r in kept] == [(0, "p q")]


def test_gopher_rule_flags_each_rule_fires(spark):
    """Hand-built docs that each violate exactly one Gopher rule; a
    compliant doc passes all five."""
    from chatdata_spark.functions.cleaning import gopher_rule_flags
    from chatdata_spark.functions.text import norm_text

    good = "the quick brown fox and the lazy dog have been with that crew " * 5  # 60 words
    short = "the and of that have with be to"  # 8 words < 50
    longwords = " ".join(["extraordinarily"] * 60) + " the of and that"  # mean len > 10
    symbols = ("the of and that have " * 12) + "# # # # # # # # # #"  # 10 '#' per 70 words
    nonalpha = ("123 456 789 000 111 222 333 444 555 666 " * 5) + "the of and that have with " * 4
    nostops = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    rows = [
        ("good", good), ("short", short), ("longwords", longwords),
        ("symbols", symbols), ("nonalpha", nonalpha), ("nostops", nostops),
    ]
    df = spark.createDataFrame(rows, "name string, text string")
    prep = df.withColumn("__norm", norm_text("text")).withColumn("__w", F.split("__norm", " "))
    flags = gopher_rule_flags(F.col("text"), F.col("__norm"), F.col("__w"))
    out = {
        r["name"]: r
        for r in prep.select("name", *[e.alias(n) for n, e in flags.items()]).collect()
    }
    assert out["good"]["keep"] == 1
    assert out["short"]["word_count_ok"] == 0 and out["short"]["keep"] == 0
    assert out["longwords"]["mean_word_len_ok"] == 0 and out["longwords"]["keep"] == 0
    assert out["symbols"]["symbol_ratio_ok"] == 0 and out["symbols"]["keep"] == 0
    # nonalpha: 50 digit tokens vs 24 alpha -> alpha fraction 24/74 < 0.8
    assert out["nonalpha"]["alpha_word_ok"] == 0
    assert out["nostops"]["stopword_ok"] == 0 and out["nostops"]["keep"] == 0


def test_gopher_nonalpha_adjacent_tokens_counted(spark):
    """The double-space pad must count ADJACENT non-alpha tokens separately
    (a plain ' [^a-z ]+ ' count over single-spaced text would miss every
    second one)."""
    from chatdata_spark.functions.cleaning import gopher_rule_flags
    from chatdata_spark.functions.text import norm_text

    # 4 adjacent digit tokens + 4 alpha words: alpha frac = 4/8 = 0.5 < 0.8
    df = spark.createDataFrame([("1 2 3 4 the of and that",)], "text string")
    prep = df.withColumn("__norm", norm_text("text")).withColumn("__w", F.split("__norm", " "))
    flags = gopher_rule_flags(F.col("text"), F.col("__norm"), F.col("__w"))
    row = prep.select(*[e.alias(n) for n, e in flags.items()]).first()
    assert row["alpha_word_ok"] == 0


def test_nb_classifier_separates_planted_vocab(spark):
    """NB trained on a corpus where the positive class has distinctive
    tokens must score held-vocabulary docs on the right side of 0, and
    the weight table must carry one row per vocabulary type."""
    from chatdata_spark.operators.classifier import nb_score, nb_train

    pos_docs = [(i, True, "quantum flux entangle " * 4) for i in range(10)]
    neg_docs = [(100 + i, False, "spam junk filler noise " * 4) for i in range(10)]
    df = spark.createDataFrame(pos_docs + neg_docs, "doc_id long, is_pos boolean, text string")
    toks = df.select(
        "doc_id", "is_pos", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    weights, priors = nb_train(toks)
    assert weights.count() == toks.select("tok").distinct().count()
    scored = {r["doc_id"]: r for r in nb_score(toks, weights, priors, ["doc_id"]).collect()}
    assert all(scored[i]["score"] > 0 and scored[i]["pred"] == 1 for i in range(10))
    assert all(scored[100 + i]["score"] < 0 and scored[100 + i]["pred"] == 0 for i in range(10))


def test_nb_classifier_balanced_prior_is_zero(spark):
    """With symmetric classes the prior log-ratio is exactly 0 and a doc
    made of equally-frequent shared vocabulary scores exactly 0 (ties in
    the integer counts cancel in the decimal sum)."""
    from chatdata_spark.operators.classifier import nb_train

    rows = [(0, True, "alpha beta"), (1, False, "alpha beta")]
    df = spark.createDataFrame(rows, "doc_id long, is_pos boolean, text string")
    toks = df.select("doc_id", "is_pos", F.explode(F.split("text", " ")).alias("tok"))
    weights, priors = nb_train(toks)
    p = priors.first()
    assert float(p["prior"]) == 0.0
    assert all(float(r["w"]) == 0.0 for r in weights.collect())


# --- embedding-space decontamination ----------------------------------------


def test_embedding_decontam_known_pairs(spark):
    """Hand-built geometry: one near-duplicate of eval vector e1, one
    anti-parallel vector (never flagged), one 45° vector that clears a 0.7
    threshold against BOTH eval vectors."""
    from chatdata_spark.operators.decontam import embedding_decontaminate

    ev = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    tr = spark.createDataFrame(
        [(10, [1.0, 0.01]), (11, [-1.0, 0.0]), (12, [0.6, 0.6])],
        "vec_id long, embedding array<float>",
    )
    rows = (
        embedding_decontaminate(tr, ev, threshold=0.7)
        .orderBy("vec_id", "eval_id")
        .collect()
    )
    assert [(r["vec_id"], r["eval_id"]) for r in rows] == [(10, 1), (12, 1), (12, 2)]
    assert rows[0]["cos_sim"] > 0.999
    # 45° pairs: cos = 0.6 / sqrt(0.72) rounded to 6
    assert abs(rows[1]["cos_sim"] - 0.707107) < 1e-9
    assert abs(rows[2]["cos_sim"] - 0.707107) < 1e-9


def test_embedding_decontam_threshold_boundary_survives_screen(spark):
    """A pair whose ROUNDED similarity lands exactly ON the threshold must
    survive: the GEMM screen's 1e-5 margin may not drop it, and the final
    filter is >= on the rounded value (oracle semantics)."""
    from chatdata_spark.operators.decontam import embedding_decontaminate

    ev = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    tr = spark.createDataFrame(
        [(10, [0.6, 0.6])], "vec_id long, embedding array<float>"
    )
    out = embedding_decontaminate(tr, ev, threshold=0.707107).collect()
    assert [(r["vec_id"], r["eval_id"]) for r in out] == [(10, 1)]


def test_embedding_decontam_eval_guard_and_udf_memo(spark):
    import numpy as np
    import pytest as _pytest

    from chatdata_spark.operators.decontam import _eval_screen_udf, embedding_decontaminate

    ev = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="max_eval"):
        embedding_decontaminate(ev, ev, threshold=0.5, max_eval=1)
    m = np.array([[1.0, 0.0], [0.0, 1.0]])
    assert _eval_screen_udf(m, 0.5) is _eval_screen_udf(m.copy(), 0.5)


def test_boilerplate_filter_drops_all_cross_doc_copies(spark):
    from chatdata_spark.operators.chunks import chunk_boilerplate_filter

    # 3-word chunks; "copy right footer" appears in docs 1 and 2 (df=2) and
    # must vanish from BOTH; each doc's unique chunk survives.
    rows = [
        (1, "copy right footer alpha beta gamma"),
        (2, "copy right footer delta epsilon zeta"),
        (3, "eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in chunk_boilerplate_filter(df, chunk_words=3, min_df=2).collect()
    }
    assert out[1].cleaned_text == "alpha beta gamma"
    assert out[2].cleaned_text == "delta epsilon zeta"
    assert (out[1].n_chunks_kept, out[1].n_chunks_removed) == (1, 1)
    assert out[3].cleaned_text == "eta theta iota" and out[3].n_chunks_removed == 0


def test_boilerplate_filter_within_doc_repeats_survive(spark):
    from chatdata_spark.operators.chunks import chunk_boilerplate_filter

    # Chunk repeated 3x in ONE doc: df=1 (document frequency, not
    # occurrence count) -> every copy survives, order preserved.
    rows = [(1, "spam ham eggs spam ham eggs spam ham eggs"), (2, "plain other words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_boilerplate_filter(df, chunk_words=3, min_df=2).collect()}
    assert out[1].cleaned_text == "spam ham eggs spam ham eggs spam ham eggs"
    assert out[1].n_chunks_removed == 0


def test_boilerplate_filter_fully_removed_doc_stays_total(spark):
    from chatdata_spark.operators.chunks import chunk_boilerplate_filter

    rows = [(1, "all shared text"), (2, "all shared text"), (3, "unique words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_boilerplate_filter(df, chunk_words=3, min_df=2).collect()}
    assert set(out) == {1, 2, 3}  # output total over input docs
    assert out[1].cleaned_text == "" and out[1].n_chunks_kept == 0
    assert out[2].cleaned_text == "" and out[3].n_chunks_kept == 1


def test_boilerplate_filter_single_window_shuffle(spark):
    from chatdata_spark.operators.chunks import chunk_boilerplate_filter

    df = spark.createDataFrame([(1, "a b c"), (2, "d e f")], "doc_id long, text string")
    plan = chunk_boilerplate_filter(df, chunk_words=3)._jdf.queryExecution().executedPlan().toString()
    # dense_rank and max share ONE digest-keyed exchange; reassembly adds
    # the doc-id agg exchange; createDataFrame contributes no shuffle.
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan


def test_boilerplate_oracle_null_text_parity(spark, tmp_path):
    # A NULL-text doc yields one NULL chunk on both engines; the oracle's
    # IS NOT DISTINCT FROM join must keep it (a plain equi-join drops NULL
    # keys and breaks the total-over-input-docs contract). End-to-end:
    # same parquet through the registry query AND its DuckDB oracle.
    import duckdb

    from chatdata_spark.registry import _REGISTRY, _load_all

    _load_all()
    rows = [(1, None), (2, "shared words here"), (3, "shared words here"), (4, None)]
    sf = str(tmp_path / "nulltext")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )
    got = sorted(
        (r.doc_id, r.n_chunks_kept, r.n_chunks_removed, r.cleaned_text)
        for r in _REGISTRY["dedup_chunk_boilerplate"].fn(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    oracle = _REGISTRY["dedup_chunk_boilerplate"].oracle
    exp = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert len(got) == len(exp) == 4  # NULL-text docs present on both sides
    # the two NULL chunks share a digest group (df=2) -> removed on both
    assert got == [tuple(e) for e in exp]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=9),
        min_size=2,
        max_size=6,
    ),
    min_df=st.integers(min_value=2, max_value=3),
)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_boilerplate_filter_matches_brute_force_property(spark, docs, min_df):
    # Tiny vocabulary forces heavy cross-doc chunk collisions; compare the
    # operator against a direct Python reimplementation of the policy.
    from collections import Counter

    from chatdata_spark.operators.chunks import chunk_boilerplate_filter

    cw = 3
    texts = [" ".join(ws) for ws in docs]

    def chunks(words):
        n = max((len(words) + cw - 1) // cw, 1)
        return [" ".join(words[i * cw : (i + 1) * cw]) for i in range(n)]

    df_count = Counter()
    for ws in docs:
        for c in set(chunks(ws)):
            df_count[c] += 1
    expected = {}
    for i, ws in enumerate(docs):
        kept = [c for c in chunks(ws) if df_count[c] < min_df]
        removed = len(chunks(ws)) - len(kept)
        expected[i] = (len(kept), removed, " ".join(kept))

    sdf = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks_kept, r.n_chunks_removed, r.cleaned_text)
        for r in chunk_boilerplate_filter(sdf, chunk_words=cw, min_df=min_df).collect()
    }
    assert got == expected
