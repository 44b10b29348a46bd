"""Distributed quality classifiers for corpus curation.

The GPT-3 / CCNet curation recipe trains a cheap linear classifier on a
"known high quality" slice (WebText / Wikipedia) vs the raw crawl, then
keeps documents the classifier scores as high-quality (reference surface:
the curation stage the ChatData app assumes upstream of its document
store — app/backend/chat_bot/tools.py ingests already-curated text).

This module implements that step as a **multinomial Naive Bayes over
whitespace tokens**, chosen deliberately over pyspark.ml's LR/SVM because
NB's train AND score are pure relational algebra — two groupBy shuffles
plus broadcast scalars — so it inherits Catalyst optimization, scales to
a 100 TB corpus with no iterative driver loop, and is exactly
reproducible in ANSI SQL (the driver's DuckDB oracle re-derives every
weight bit-for-bit).

Determinism recipe (CLAUDE.md oracle conventions): the only libm call is
``ln``; each log-likelihood-ratio weight is computed once per vocabulary
TYPE (not per occurrence), rounded to 4 digits, cast to DECIMAL(27,6),
then decimal-summed per document — accumulation order cannot drift and a
last-ulp libm difference is absorbed by the round.

Scale shape at 100 TB:
- token→(c_pos, c_neg) histogram: ONE shuffle, map-side combined, keyed
  on the token — same cardinality as the vocabulary, not the corpus.
- class totals + vocab size + doc-count prior: one tiny aggregate that
  rides a broadcast.
- scoring: tokens join the vocabulary-sized weight table on the token
  hash (Spark broadcasts it when small; at web scale it shuffles
  vocabulary-sized, not corpus-sized), then ONE map-side-combined
  groupBy(doc) decimal sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: round() digits for per-type log weights — absorbs libm last-ulp skew
#: between the JVM and the oracle engine while keeping rank fidelity.
WEIGHT_ROUND_DIGITS = 4
#: exact accumulator type for per-document sums of rounded weights.
WEIGHT_DECIMAL = "decimal(27,6)"


def _llr_weight(c_pos: Column, c_neg: Column, t_pos: Column, t_neg: Column, v: Column) -> Column:
    """Laplace-smoothed log-likelihood-ratio weight for one token type:
    ln((c_pos+1)/(T_pos+V)) - ln((c_neg+1)/(T_neg+V)), rounded and cast
    to the exact decimal accumulator type. All operands are integer
    counts < 2^53 so the double divisions are correctly rounded and
    identical in any IEEE-754 engine."""
    lr = F.log((c_pos + F.lit(1)).cast("double") / (t_pos + v).cast("double")) - F.log(
        (c_neg + F.lit(1)).cast("double") / (t_neg + v).cast("double")
    )
    return F.round(lr, WEIGHT_ROUND_DIGITS).cast(WEIGHT_DECIMAL)


def nb_train(toks: DataFrame, tok_col: str = "tok", pos_col: str = "is_pos"):
    """Train multinomial NB from a token-occurrence stream.

    ``toks``: one row per token OCCURRENCE with a boolean ``pos_col``
    (the document's class). Returns ``(weights, priors)``:

    - ``weights``: DataFrame[tok, w DECIMAL(27,6)] — one row per
      vocabulary type (the model; vocabulary-sized, not corpus-sized).
    - ``priors``: 1-row DataFrame[prior DECIMAL(27,6), t_pos, t_neg, v]
      — the class-prior log-ratio over token mass plus the scalars, for
      callers that report model stats.

    One shuffle (the token histogram, map-side combined); the totals
    aggregate is vocabulary-sized and its scalar result broadcasts.
    """
    pos = F.col(pos_col)
    counts = toks.groupBy(tok_col).agg(
        F.sum(F.when(pos, 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(pos, 0).otherwise(1)).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        tok_col,
        _llr_weight(F.col("c_pos"), F.col("c_neg"), F.col("t_pos"), F.col("t_neg"), F.col("v")).alias("w"),
    )
    priors = totals.select(
        F.round(
            F.log(F.col("t_pos").cast("double")) - F.log(F.col("t_neg").cast("double")),
            WEIGHT_ROUND_DIGITS,
        )
        .cast(WEIGHT_DECIMAL)
        .alias("prior"),
        "t_pos",
        "t_neg",
        "v",
    )
    return weights, priors


def nb_score(toks: DataFrame, weights: DataFrame, priors: DataFrame, doc_cols: list[str], tok_col: str = "tok") -> DataFrame:
    """Score documents under a trained model: per-document exact decimal
    sum of per-occurrence weights plus the class prior, exposed as
    ``score`` (double, rounded to 6) with ``n_tokens``; ``pred`` is the
    sign. Tokens absent from the vocabulary are dropped (score 0
    contribution) — at train-on-full-corpus usage every token is in
    vocabulary, and at holdout usage dropping unseen tokens is the
    standard NB convention."""
    scored = (
        toks.join(weights, tok_col)
        .groupBy(*doc_cols)
        .agg(F.sum("w").alias("_sw"), F.count(F.lit(1)).alias("n_tokens"))
        .crossJoin(F.broadcast(priors.select("prior")))
    )
    score = F.round((F.col("_sw") + F.col("prior")).cast("double"), 6)
    return scored.select(
        *doc_cols,
        score.alias("score"),
        (score > F.lit(0.0)).cast("int").alias("pred"),
        "n_tokens",
    )
