"""Corpus-cleaning functions for LLM training-data pipelines (north-star
extension; the reference's only text hygiene is the upload-time
NarrativeText/length filter, app/backend/chat_bot/tools.py:42).

Two families:

- **PII redaction** — email / US-phone / SSN / IPv4 detection and masking as
  chained ``regexp_replace`` Column expressions. Regexes are written in the
  common Java-regex ∩ RE2 subset (no backreferences, no lookaround) so the
  DuckDB oracle evaluates the *identical* pattern. Counts are taken on the
  raw text BEFORE masking.
- **Repetition signals** (Gopher-style quality heuristics) — duplicate-token
  ratio as a pure higher-order-function expression; top-word / top-bigram
  fractions as explode→count→max aggregations (see queries/cleaning.py for
  the distributed plan).

At 100 TB the redaction/ratio expressions run inside the scan stage as
narrow projections (no shuffle, no Python); the top-n-gram aggregations
shuffle on (doc_id, gram) with map-side partial counts — the gram stream is
never collected and never joins all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns in the Java ∩ RE2 common subset. Order of application matters:
# SSN (3-2-4 digits) before phone (3-3-4) before IPv4 (1-3 digit octets) —
# the groupings are digit-count-disjoint, so earlier masks never destroy a
# later pattern's match, but applying SSN/phone first keeps dotted phone
# numbers ("555.123.4567") from being half-eaten by the IPv4 rule.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IPV4>"),
)


def pii_counts(col) -> dict[str, Column]:
    """Per-kind match counts on the raw text (compute before redacting)."""
    c = F.col(col) if isinstance(col, str) else col
    return {f"n_{name}": F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def redact_pii(col) -> Column:
    """Mask every PII match with its placeholder token, in the fixed
    PII_PATTERNS order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def duplicate_token_ratio(words) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    1 - distinct/total (type-token redundancy; the scan-stage cousin of
    Gopher's duplicate-line fraction for corpora without line structure).
    0.0 for empty token arrays."""
    w = F.col(words) if isinstance(words, str) else words
    n = F.size(w)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(w))) / n.cast("double")
    ).otherwise(F.lit(0.0))


def bigrams_col(words) -> Column:
    """Adjacent word 2-grams as array<string> (empty when < 2 tokens)."""
    w = F.col(words) if isinstance(words, str) else words
    return F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# --- Gopher rules (Rae et al. 2021, appendix A1.1) -------------------------
# The published word-level document filters. Thresholds are the paper's; the
# line-level rules (bullet / ellipsis line fractions, duplicate lines) are
# omitted because the corpus fixture is single-line — duplicate-token ratio
# (above) and the substring/minhash dedup operators cover that axis.
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3  # mean word length in [3, 10]
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MAX_SYMBOL_RATIO_PCT10 = 1  # (# + …) per word ≤ 0.1  ⇔  10·sym ≤ words
GOPHER_MIN_ALPHA_WORD_PCT = 80  # ≥80% of words contain an alphabetic char
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_rule_flags(text, norm, w) -> dict[str, Column]:
    """Per-document Gopher rule flags as INT 0/1 columns, plus ``n_words``.

    ``text``/``norm``/``w`` must be already-materialized columns (raw text,
    normalized text, split word array) — layered-select convention so the
    normalize/split work isn't re-inlined per rule (CLAUDE.md).

    Every ratio threshold is evaluated by integer cross-multiplication
    (``10*symbols <= words`` instead of ``symbols/words <= 0.1``) so the
    flags are exact and the DuckDB oracle reproduces them bit-for-bit with
    no float division anywhere. The non-alpha word count uses the
    double-space pad trick: after ``replace(norm, ' ', '  ')`` every token
    owns both of its flanking spaces, so the RE2∩Java pattern
    ``' [^a-z ]+ '`` counts whole non-alphabetic tokens without
    lookaround (adjacent matches would otherwise share a space).
    """
    text = F.col(text) if isinstance(text, str) else text
    norm = F.col(norm) if isinstance(norm, str) else norm
    w = F.col(w) if isinstance(w, str) else w
    n_words = F.size(w)
    # total chars across words = len(norm) - (n_words - 1) separators
    total_wchars = F.length(norm) - (n_words - F.lit(1))
    padded = F.concat(F.lit(" "), F.regexp_replace(norm, F.lit(" "), F.lit("  ")), F.lit(" "))
    n_nonalpha = F.regexp_count(padded, F.lit(" [^a-z ]+ "))
    n_symbols = F.regexp_count(text, F.lit("#")) + F.regexp_count(text, F.lit(r"\.\.\."))
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(w), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    flags = {
        "n_words": n_words,
        "word_count_ok": (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS),
        "mean_word_len_ok": (total_wchars >= n_words * GOPHER_MIN_MEAN_WORD_LEN)
        & (total_wchars <= n_words * GOPHER_MAX_MEAN_WORD_LEN),
        "symbol_ratio_ok": n_symbols * 10 <= n_words * GOPHER_MAX_SYMBOL_RATIO_PCT10,
        "alpha_word_ok": (n_words - n_nonalpha) * 100 >= n_words * GOPHER_MIN_ALPHA_WORD_PCT,
        "stopword_ok": stop_hits >= GOPHER_MIN_STOPWORD_HITS,
    }
    out = {"n_words": n_words}
    keep = F.lit(True)
    for name, cond in flags.items():
        if name == "n_words":
            continue
        out[name] = cond.cast("int")
        keep = keep & cond
    out["keep"] = keep.cast("int")
    return out
