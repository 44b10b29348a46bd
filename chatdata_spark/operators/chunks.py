"""Document chunking and chunk-level (paragraph-level) deduplication
(north-star extension). The reference chunks uploads into retriever
passages via its parse pipeline (app/backend/chat_bot/tools.py:13-50, the
NarrativeText elements ARE its chunks); this module gives the same
capability a declarative, corpus-scale form: fixed-width word chunking for
RAG/packing, plus cross-corpus dedup at chunk granularity (the
"paragraph dedup" pass of C4/RefinedWeb-style cleaning, here applied to
word-window chunks since the corpus has no line structure).

Scale design (the 100 TB story):
- chunking is a scan-stage transform + posexplode — no shuffle; chunk ids
  are (doc_id, chunk_idx), never a global sequence.
- dedup keys are sha256 digests of the chunk text (fixed-width shuffle
  key, never raw text); keep-first is one window over the digest — the
  same single-shuffle shape as operators/dedup.py:exact_dedup.
- reassembly groups by doc_id with an order-by-idx sorted aggregation —
  one shuffle on the (already fixed-width) doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 12,
) -> DataFrame:
    """Split each document into consecutive ``chunk_words``-word chunks:
    ``(id_col, chunk_idx, chunk_text)``, chunk_idx 0-based. The final
    chunk may be short; empty/blank docs produce one empty chunk.

    The word array is MATERIALIZED in its own select (referenced ≥2
    times — size + per-chunk slice — which blocks CollapseProject), so
    the split runs once per row instead of once per chunk inside the
    Generate's per-element lambda (the CLAUDE.md inlining trap; r11
    plan audit). The raw rows are spread first so the split+explode run
    post-exchange on all cores (no-op at real scale)."""
    from chatdata_spark.operators.dedup import _spread

    d = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("__w")
    )
    w = F.col("__w")
    n_chunks = F.greatest(F.ceil(F.size(w) / F.lit(chunk_words)).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(w, i * chunk_words + 1, chunk_words), " "),
    )
    return d.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 12,
) -> DataFrame:
    """Cross-corpus chunk-level dedup: chunk every document, keep the first
    occurrence of each distinct chunk (min (doc_id, chunk_idx)), drop the
    rest. Returns surviving ``(id_col, chunk_idx, chunk_text)`` rows."""
    c = chunk_documents(df, id_col, text_col, chunk_words)
    win = Window.partitionBy(F.sha2(F.col("chunk_text"), 256)).orderBy(
        F.col(id_col).asc(), F.col("chunk_idx").asc()
    )
    return (
        c.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _reassembled_text(chunk_struct):
    """array_join of ``chunk_text`` in ``chunk_idx`` order from a
    collect_list input expression; NULL-masked entries are skipped by
    collect_list, so callers pass either the bare struct or a
    ``F.when(keep, struct)`` mask. Shared by both reassembly operators so
    ordering/null fixes apply once."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(chunk_struct)),
            lambda s: s["chunk_text"],
        ),
        " ",
    )


def chunk_boilerplate_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 12,
    min_df: int = 2,
) -> DataFrame:
    """Boilerplate removal by DOCUMENT FREQUENCY: drop ALL occurrences of
    any chunk appearing in >= ``min_df`` DISTINCT documents, rebuild each
    document from the survivors. This is the C4 / RefinedWeb / CCNet
    threshold policy (Raffel et al. 2020 drop repeated three-sentence
    spans; Penedo et al. 2023 line-frequency filter) — distinct from
    ``chunk_dedup``'s keep-first: boilerplate (headers, footers, nav text)
    is noise in EVERY copy, so no occurrence survives, while a chunk
    repeated only WITHIN one document (df = 1) is untouched.

    Returns ``(id_col, n_chunks_kept int, n_chunks_removed int,
    cleaned_text)``, total over input documents.

    Scale shape: the distinct-doc count per chunk is dense_rank + max over
    the SAME sha256-digest window partition — one fixed-width shuffle, one
    evaluation, no groupBy+join-back (the CLAUDE.md double-evaluation
    trap; count(DISTINCT) over a window is unsupported, the rank pair is
    the standard exact rewrite). Reassembly is one conditional aggregation
    on the doc id (collect_list drops the NULL-masked removed chunks), so
    the whole operator is two shuffles and zero joins."""
    c = chunk_documents(df, id_col, text_col, chunk_words).withColumn(
        "__h", F.sha2(F.col("chunk_text"), 256)
    )
    ranked = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    whole = Window.partitionBy("__h")
    flagged = c.withColumn("__dr", F.dense_rank().over(ranked)).withColumn(
        "__df", F.max("__dr").over(whole)
    )
    keep = F.col("__df") < min_df
    return (
        flagged.groupBy(id_col)
        .agg(
            F.sum(keep.cast("int")).cast("int").alias("n_chunks_kept"),
            F.sum((~keep).cast("int")).cast("int").alias("n_chunks_removed"),
            _reassembled_text(
                F.when(keep, F.struct(F.col("chunk_idx"), F.col("chunk_text")))
            ).alias("cleaned_text"),
        )
    )


def chunk_dedup_reassemble(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 12,
) -> DataFrame:
    """Chunk-dedup then rebuild each document from its surviving chunks in
    chunk order: ``(id_col, n_chunks_kept, cleaned_text)``. Documents whose
    every chunk was seen earlier survive with 0 chunks and empty text (so
    the output is total over input docs — callers filter as policy)."""
    kept = chunk_dedup(df, id_col, text_col, chunk_words)
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks_kept"),
            _reassembled_text(
                F.struct(F.col("chunk_idx"), F.col("chunk_text"))
            ).alias("cleaned_text"),
        )
    )
    all_ids = df.select(F.col(id_col)).distinct()
    return (
        all_ids.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks_kept", F.lit(0)).cast("int").alias("n_chunks_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def semantic_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_words: int = 16,
    dim: int = 64,
    threshold: float = 0.0,
) -> DataFrame:
    """SEMANTIC chunking — split each document where consecutive
    pseudo-sentence embeddings stop agreeing (the embedding-drift
    "semantic chunking" method from the RAG-ingestion literature; the
    reference chunks uploads before embedding, chat_bot/tools.py:13-50 —
    this is the topic-boundary-aware upgrade of
    :func:`chunk_documents`'s fixed grid). Pseudo-sentences are
    ``window_words``-word windows (the fixture corpus carries no sentence
    punctuation; swap the window expression for a sentence splitter on
    prose corpora). A window opens a new chunk when
    ``round6(cos(prev_window, window)) < threshold``.

    Plan shape (100 TB posture): tokenize + window construction are
    scan-stage (one Generate per doc, plain-column slices); one Arrow
    embedder pass over the window texts (the V5 plumbing, deterministic
    hash stub standing in for the sentence-transformer); ONE doc-keyed
    window for lag + boundary + running chunk id (the lag vector is
    materialized in a LAYERED select so the cosine folds reference a
    column, not a repeated lag AST); one (doc, chunk) aggregate. Shuffle
    keys are (id) twice — never text volume beyond the window texts the
    embedder already carries.

    Output: (id_col, chunk_idx, start_word, n_words, n_windows) — all
    BIGINT, 1-based start_word, chunk_idx 0-based per doc. Docs with no
    tokens produce no rows. Determinism: float32 embedder output, the
    shared sequential float64 cosine folds, HALF_UP round-6 — replayed
    exactly by the registered query's driver-side oracle."""
    from chatdata_spark.operators.dedup import _spread

    W = int(window_words)
    # Spread the RAW rows before introducing the tokenize/window HOFs:
    # expressions upstream of the repartition exchange evaluate in the
    # source's partitioning — a 1-partition local scan would serialize
    # the whole per-row compute on one core (r11 profile: 2.0 of 2.7 s
    # single-threaded when the spread sat after the split). No row
    # filter anywhere: a `size(__ws) >= 1` Filter gets predicate-pushed
    # BELOW the exchange, re-evaluating the split single-threaded (and
    # twice); instead empty docs vanish at the Generate via the
    # empty-array guard in _win_texts_guarded.
    d = _spread(df.select(F.col(id_col), F.col(text_col)))
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    d = d.select(F.col(id_col).alias("__id"), ws.alias("__ws"))
    wins = d.select(
        "__id", F.size("__ws").alias("__n"),
        F.posexplode(_win_texts_guarded(W)).alias("__wi", "__wtext"),
    )
    return _drift_chunk_spans(wins, W, dim, threshold, id_col, "start_word", "n_words")


def _win_texts_guarded(W: int):
    """Window-text array over the materialized ``__ws`` column, empty
    when the doc has no units: (a) non-outer posexplode of an empty
    array emits no rows, which IS the `size >= 1` filter without a
    pushable predicate (see the spread comment above); (b) the guard
    also keeps `sequence(0, n_win - 1)` from going descending when
    n_win = 0 (sequence(0,-1) = [0,-1])."""
    n_win = F.ceil(F.size("__ws") / F.lit(W)).cast("int")
    win_texts = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.array_join(F.slice("__ws", i * W + 1, W), " "),
    )
    return F.when(F.size("__ws") >= 1, win_texts).otherwise(
        F.array().cast("array<string>")
    )


def _drift_chunk_spans(
    wins: DataFrame,
    W: int,
    dim: int,
    threshold: float,
    id_col: str,
    start_name: str,
    count_name: str,
) -> DataFrame:
    """Shared drift-scoring tail for the semantic chunkers: ``wins`` has
    (__id, __n total units, __wi window index, __wtext window text). One
    Arrow embedder pass, one doc-keyed window (layered lag-vector select
    per the inlining convention), one (doc, chunk) aggregate. Expressions
    are pinned bit-for-bit by semantic_chunk_spans' sequential replay
    oracle — any numeric change here must change the replay too."""
    from chatdata_spark.functions.vector import dot_product, vector_norm
    from chatdata_spark.functions.vector import make_embed_text_udf

    wins = wins.withColumn("__v", make_embed_text_udf(dim)(F.col("__wtext")))
    w = Window.partitionBy("__id").orderBy("__wi")
    lagged = wins.select("__id", "__n", "__wi", "__v", F.lag("__v").over(w).alias("__pv"))
    scored = lagged.select(
        "__id", "__n", "__wi", "__pv",
        F.round(
            dot_product("__pv", "__v") / (vector_norm("__pv") * vector_norm("__v")), 6
        ).alias("__sim"),
    )
    boundary = F.when(
        F.col("__pv").isNull() | (F.col("__sim") < F.lit(float(threshold))), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked = scored.withColumn("__cid", F.sum(boundary).over(run) - 1)
    return (
        chunked.groupBy("__id", "__cid")
        .agg(
            (F.min("__wi").cast("bigint") * W + 1).alias(start_name),
            F.sum(F.least(F.lit(W), F.col("__n") - F.col("__wi") * W))
            .cast("bigint")
            .alias(count_name),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__cid").cast("bigint").alias("chunk_idx"),
            start_name, count_name, "n_windows",
        )
        .orderBy(id_col, "chunk_idx")
    )


# sentence boundary: whitespace run preceded by terminal punctuation
# (Java regex lookbehind — the Spark side; replays split with python re)
SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+"


def semantic_sentence_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_sents: int = 2,
    dim: int = 64,
    threshold: float = 0.0,
) -> DataFrame:
    """:func:`semantic_chunks` with REAL sentence units — the documented
    splitter swap for prose corpora: pseudo-sentences are runs ending in
    ``.!?`` (lookbehind split, so the punctuation stays with its
    sentence), windows are ``window_sents`` consecutive sentences, and
    the drift rule/plan shape are exactly the word-window operator's
    (shared :func:`_drift_chunk_spans` tail — same embedder pass, same
    doc-keyed window, same aggregate).

    Output: (id_col, chunk_idx, start_sent, n_sents, n_windows) — start
    is 1-based in SENTENCE units. Empty/whitespace-only sentences (e.g.
    trailing punctuation) are dropped before windowing."""
    from chatdata_spark.operators.dedup import _spread

    W = int(window_sents)
    # Spread before the sentence-split HOFs + Generate-side empty guard,
    # same reasons as semantic_chunks (see comments there).
    d = _spread(df.select(F.col(id_col), F.col(text_col)))
    sents = F.filter(
        F.transform(F.split(F.col(text_col), SENTENCE_SPLIT_RE), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    d = d.select(F.col(id_col).alias("__id"), sents.alias("__ws"))
    wins = d.select(
        "__id", F.size("__ws").alias("__n"),
        F.posexplode(_win_texts_guarded(W)).alias("__wi", "__wtext"),
    )
    return _drift_chunk_spans(wins, W, dim, threshold, id_col, "start_sent", "n_sents")
