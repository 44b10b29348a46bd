"""Text-analysis functions for training-data pipelines (north-star
extension; the reference's only text processing is the ≥10-word
NarrativeText filter at upload, tools.py:42 — covered in sources/ingest.py).

Everything here is a plain Column expression (JVM-side, codegen-friendly,
no UDF): language-ID by stopword intersection, quality scoring from
length/punct/digit/stopword ratios, whitespace + BPE-ish token counting,
and content fingerprints. Deterministic by construction — the DuckDB
oracles recompute the identical arithmetic.

At 100 TB these run inside the scan stage as narrow projections: no
shuffle, no Python workers, prunable to the text column alone.
"""

from __future__ import annotations

import pandas as pd  # module-top: pandas_udf type hints resolve against it
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny fixed stopword lists — enough to separate the test corpus's languages;
# a production deployment swaps in real lists (same plan shape).
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "les", "et", "est", "pas", "pour", "dans", "une", "vous", "ce"),
    "es": ("el", "los", "que", "y", "en", "por", "para", "se", "las", "una"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")  # tie-break order

# BPE-ish tokenization: letter runs, single digits, single non-alnum marks
# (GPT-2-style pre-tokenizer shape, regex kept RE2/Java-compatible).
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"  # explicit ASCII punct — identical set in Java & RE2


def norm_text(col) -> Column:
    """Normalization convention: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def words(col) -> Column:
    return F.split(norm_text(col), " ")


def token_count_ws(col) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count_bpe(col) -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def stopword_hits(col, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the text."""
    return F.size(
        F.array_intersect(
            F.array_distinct(words(col)), F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        )
    )


def predict_lang_from_scores(scores: list[tuple[str, Column]]) -> Column:
    """Argmax with fixed tie-break priority from precomputed per-language
    score columns; 'unknown' when no score > 0. A forward CASE chain where
    branch k only requires ``s_k > 0 AND s_k >= s_j`` for every later
    language j picks exactly the earliest-priority maximum (earlier
    branches lose only when strictly beaten by a later language, whose
    branch then fires).

    Pass MATERIALIZED score columns (projected in a previous select) when
    profiling at scale — inline score expressions are re-evaluated at every
    reference in the chain (O(langs²) recomputes of split+distinct+
    intersect)."""
    expr = None
    for idx, (lang, s) in enumerate(scores):
        cond = s > 0
        for _, s_later in scores[idx + 1 :]:
            cond = cond & (s >= s_later)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def predict_lang(col) -> Column:
    """Convenience inline form of :func:`predict_lang_from_scores`."""
    return predict_lang_from_scores([(lang, stopword_hits(col, lang)) for lang in LANG_PRIORITY])


def stopword_hits_from_dwords(dwords: Column, lang: str) -> Column:
    """Stopword hits from a materialized distinct-words array column."""
    return F.size(F.array_intersect(dwords, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    removed = F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(n > 0, (n - removed) / n).otherwise(F.lit(0.0))


def digit_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    removed = F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n > 0, (n - removed) / n).otherwise(F.lit(0.0))


def stopword_ratio(col) -> Column:
    """All-language stopword tokens / total tokens (a fluency proxy)."""
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    hits = F.size(
        F.filter(words(col), lambda w: w.isin(*all_stops))
    )
    return hits / token_count_ws(col)


def quality_score(col, round_digits: int = 6) -> Column:
    """Composite quality in [0,1]:
    0.3·min(n_words/100, 1) + 0.4·min(4·stop_ratio, 1)
    + 0.2·(1-punct_ratio) + 0.1·(1-digit_ratio)
    — fixed operand order so the oracle reproduces it bit-for-bit."""
    nw = token_count_ws(col).cast("double")
    length_term = F.least(nw / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    score = (
        length_term * F.lit(0.3)
        + stop_term * F.lit(0.4)
        + (F.lit(1.0) - punct_ratio(col)) * F.lit(0.2)
        + (F.lit(1.0) - digit_ratio(col)) * F.lit(0.1)
    )
    # NULL/blank text must not score: least() IGNORES null operands
    # (least(NULL, 1.0) = 1.0), which would give empty docs a perfect score.
    return F.when(norm_text(col) != "", F.round(score, round_digits)).otherwise(F.lit(0.0))


def fingerprint_sha256(col) -> Column:
    """Content fingerprint: sha256 hex of the normalized text (the
    reference's entity_id convention, tools.py:35-37, applied to content)."""
    return F.sha2(norm_text(col), 256)


def fingerprint_rolling64(col) -> Column:
    """64-bit rolling hash over word xxhash64s (xor-rotate mix) — an
    order-sensitive structural fingerprint (word swap ⇒ different value,
    unlike the set-based MinHash). Bit-ops only: ANSI mode (Spark 4
    default) makes wrapping multiplies throw, shifts/xor can't overflow.
    Not DuckDB-reproducible (xxhash64); checked by unit tests instead of
    the oracle."""
    return F.aggregate(
        F.transform(words(col), lambda w: F.xxhash64(w)),
        F.lit(-3750763034362895579).cast("long"),  # arbitrary non-zero seed
        lambda acc, h: F.shiftleft(acc, 5)
        .bitwiseOR(F.shiftrightunsigned(acc, 59))
        .bitwiseXOR(h),
    )


def fingerprint_rolling64_md5(col) -> Column:
    """Oracle-checkable twin of :func:`fingerprint_rolling64`: the same
    rotate-xor combine over 60-bit per-word hashes parsed from md5 hex —
    md5 (unlike xxhash64) exists in DuckDB, so the whole fingerprint is
    reproducible there via HUGEINT rotate emulation + xor (the query's
    oracle SQL). Prefer the xxhash64 variant in hot paths (no hex-string
    intermediate); this one trades ~2x scan cost for a driver oracle."""
    word_h = lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        F.transform(words(col), word_h),
        F.lit(-3750763034362895579).cast("long"),  # unsigned 0xcbf29ce484222325 (FNV basis)
        lambda acc, h: F.shiftleft(acc, 5)
        .bitwiseOR(F.shiftrightunsigned(acc, 59))
        .bitwiseXOR(h),
    )


# UDF-object memoization per encoding (CacheManager plan-equality rule).
_TOKENIZER_UDFS: dict[str, object] = {}


def token_count_udf(encoding: str | None = None):
    """Real-tokenizer token counting, env-gated like the embedder/parser
    seams: when ``SPARK_GRAFT_TOKENIZER`` (or ``encoding``) names a
    tiktoken encoding AND tiktoken is importable, return an Arrow pandas
    UDF counting true BPE tokens; otherwise None — callers fall back to
    the JVM regex :func:`token_count_bpe` (the default: scan-stage, no
    Python). The closure captures only the encoding-name string; tiktoken's
    own registry caches the loaded encoding per worker process, so the
    per-batch ``get_encoding`` is a dict hit, not a reload. The UDF object
    is memoized per encoding so identical plans stay CacheManager-equal."""
    import os

    name = encoding or os.environ.get("SPARK_GRAFT_TOKENIZER")
    if not name:
        return None
    try:
        import tiktoken  # noqa: F401
    except ImportError:
        return None

    cached = _TOKENIZER_UDFS.get(name)
    if cached is not None:
        return cached

    @F.pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        import tiktoken

        enc = tiktoken.get_encoding(name)
        return pd.Series(
            [len(enc.encode(t)) if t is not None else 0 for t in texts], dtype="int32"
        )

    _TOKENIZER_UDFS[name] = _count
    return _count
