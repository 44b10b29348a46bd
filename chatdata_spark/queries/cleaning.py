"""Driver queries for corpus cleaning: PII redaction, repetition quality
signals, benchmark decontamination, chunk-level dedup (north-star
extensions; the reference's only hygiene is the upload filter,
app/backend/chat_bot/tools.py:42).

Oracle notes: PII regexes live in the Java-regex ∩ RE2 common subset so
DuckDB evaluates the identical pattern; PII text is synthesized
deterministically from doc_id on BOTH sides (the corpus itself contains
none). Ratio outputs divide the same integer operands in the same order on
both engines (bit-identical doubles) before the 6-digit round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.functions.cleaning import (
    PII_PATTERNS,
    bigrams_col,
    duplicate_token_ratio,
    pii_counts,
    redact_pii,
)
from chatdata_spark.operators.chunks import chunk_dedup_reassemble
from chatdata_spark.operators.decontam import decontaminate
from chatdata_spark.registry import query

_PAT = {name: pat for name, pat, _ in PII_PATTERNS}
_TOK = {name: token for name, _, token in PII_PATTERNS}


def _with_pii(df):
    """Deterministic PII injection keyed on doc_id (the corpus has none)."""
    did = F.col("doc_id")
    s = did.cast("string")
    return df.withColumn(
        "txt",
        F.concat(
            F.col("text"),
            F.when(did % 7 == 0, F.concat(F.lit(" mail user"), s, F.lit("@example.com ok"))).otherwise(F.lit("")),
            F.when(did % 11 == 0, F.lit(" call 555-123-4567 or 555.987.6543 now")).otherwise(F.lit("")),
            F.when(did % 13 == 0, F.lit(" ssn 123-45-6789 end")).otherwise(F.lit("")),
            F.when(did % 5 == 0, F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".7 up"))).otherwise(F.lit("")),
        ),
    )


_D_PII_TXT = """
    SELECT doc_id, text
      || CASE WHEN doc_id % 7 = 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com ok' ELSE '' END
      || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 or 555.987.6543 now' ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-6789 end' ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 up' ELSE '' END
      AS txt
    FROM documents
"""


@query(
    "pii_redaction",
    oracle=f"""
    WITH t AS ({_D_PII_TXT})
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{_PAT["email"]}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(txt, '{_PAT["ssn"]}')) AS INT) AS n_ssn,
           CAST(len(regexp_extract_all(txt, '{_PAT["phone"]}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(txt, '{_PAT["ipv4"]}')) AS INT) AS n_ipv4,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt,
               '{_PAT["email"]}', '{_TOK["email"]}', 'g'),
               '{_PAT["ssn"]}', '{_TOK["ssn"]}', 'g'),
               '{_PAT["phone"]}', '{_TOK["phone"]}', 'g'),
               '{_PAT["ipv4"]}', '{_TOK["ipv4"]}', 'g') AS red_text
    FROM t ORDER BY doc_id
    """,
)
def pii_redaction(spark, sf_dir):
    """PII scrub pass: per-kind match counts + masked text, all JVM regexp
    expressions in the scan stage (no shuffle, no Python)."""
    d = _with_pii(spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"))
    counts = pii_counts(F.col("txt"))
    return d.select(
        "doc_id",
        counts["n_email"].cast("int").alias("n_email"),
        counts["n_ssn"].cast("int").alias("n_ssn"),
        counts["n_phone"].cast("int").alias("n_phone"),
        counts["n_ipv4"].cast("int").alias("n_ipv4"),
        redact_pii(F.col("txt")).alias("red_text"),
    ).orderBy("doc_id")


@query(
    "text_repetition_signals",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents
    ),
    tw AS (
        SELECT doc_id, max(c) AS top_word_cnt FROM (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(w) AS tok FROM base) GROUP BY doc_id, tok
        ) GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id, max(c) AS top_bigram_cnt FROM (
            SELECT doc_id, b, count(*) AS c
            FROM (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                                         for i in generate_series(1, len(w)-1)]) AS b
                  FROM base WHERE len(w) >= 2)
            GROUP BY doc_id, b
        ) GROUP BY doc_id
    )
    SELECT base.doc_id,
           CAST(len(w) AS INT) AS n_words,
           ROUND((len(w) - len(list_distinct(w))) / CAST(len(w) AS DOUBLE), 6) AS dup_token_ratio,
           ROUND(top_word_cnt / CAST(len(w) AS DOUBLE), 6) AS top_word_frac,
           CASE WHEN len(w) >= 2
                THEN ROUND(COALESCE(top_bigram_cnt, 0) / CAST(len(w) - 1 AS DOUBLE), 6)
                ELSE 0.0 END AS top_bigram_frac
    FROM base JOIN tw USING (doc_id) LEFT JOIN bg USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_repetition_signals(spark, sf_dir):
    """Gopher-style repetition heuristics: duplicate-token ratio (pure HOF,
    scan stage), top-word and top-bigram fractions (explode → map-side
    partial count on (doc_id, gram) → per-doc max). No gram ever joins
    all-pairs; the shuffle key is the fixed-width (doc_id, gram) pair."""
    from chatdata_spark.operators.dedup import _spread

    base = _spread(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ).select("doc_id", F.split(F.lower("text"), r"\s+").alias("w"))
    base = base.withColumn("nw", F.size("w"))

    tw = (
        base.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_cnt"))
    )
    bg = (
        base.filter(F.col("nw") >= 2)
        .select("doc_id", F.explode(bigrams_col("w")).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_cnt"))
    )
    return (
        base.join(tw, "doc_id")
        .join(bg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("nw").cast("int").alias("n_words"),
            F.round(duplicate_token_ratio("w"), 6).alias("dup_token_ratio"),
            F.round(F.col("top_word_cnt") / F.col("nw").cast("double"), 6).alias("top_word_frac"),
            F.when(
                F.col("nw") >= 2,
                F.round(
                    F.coalesce("top_bigram_cnt", F.lit(0)) / (F.col("nw") - 1).cast("double"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "decontam_docs",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(w[i:i+4], ' ')
                              for i in generate_series(1, greatest(len(w)-4, 1))]) AS sh
        FROM w
    ),
    b AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0),
    h AS (
        SELECT s.doc_id, count(b.g) AS n_hits
        FROM (SELECT doc_id, unnest(sh) AS g FROM sh) s
        LEFT JOIN b ON s.g = b.g
        GROUP BY s.doc_id
    )
    SELECT sh.doc_id,
           CAST(len(sh.sh) AS INT) AS n_shingles,
           h.n_hits,
           ROUND(h.n_hits / CAST(len(sh.sh) AS DOUBLE), 6) AS overlap_frac,
           h.n_hits >= 1 AS contaminated
    FROM sh JOIN h USING (doc_id) ORDER BY doc_id
    """,
)
def decontam_docs(spark, sf_dir):
    """Benchmark decontamination (5-gram overlap here; 13-gram at corpus
    scale): the 'benchmark' is the doc_id % 50 == 0 slice of the corpus, so
    those docs must come back 100% contaminated and the rest report their
    true shared-n-gram fraction. Bench n-gram set is broadcast — the corpus
    is never shuffled."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    return decontaminate(d, bench, "doc_id", "text", "text", n=5, min_hits=1).orderBy("doc_id")


@query(
    "chunk_dedup_docs",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents
    ),
    c AS (
        SELECT doc_id, i AS chunk_idx,
               array_to_string(w[i*12+1:i*12+12], ' ') AS chunk_text
        FROM (SELECT doc_id, w,
                     unnest(generate_series(0, greatest(CAST(ceil(len(w)/12.0) AS INT), 1) - 1)) AS i
              FROM w)
    ),
    k AS (
        SELECT * FROM c
        QUALIFY row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) = 1
    ),
    r AS (
        SELECT doc_id, count(*) AS n_chunks_kept,
               string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS cleaned_text
        FROM k GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(r.n_chunks_kept, 0) AS INT) AS n_chunks_kept,
           COALESCE(r.cleaned_text, '') AS cleaned_text
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN r USING (doc_id) ORDER BY doc_id
    """,
)
def chunk_dedup_docs(spark, sf_dir):
    """Chunk-level (paragraph) dedup: 12-word chunks, keep first occurrence
    corpus-wide (min doc_id, chunk_idx), rebuild documents from survivors.
    Dedup shuffles on the chunk sha256 digest, never raw text."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    from chatdata_spark.operators.dedup import _spread

    return chunk_dedup_reassemble(_spread(d), "doc_id", "text", chunk_words=12).orderBy("doc_id")
