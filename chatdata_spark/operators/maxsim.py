"""Multi-vector late-interaction retrieval (ColBERT-style MaxSim) — the
multi-vector extension of the reference's single-vector DISTANCE template
(prompts.py:31-34): score(doc, query) = Σ_i max_j cos(q_i, d_j), where a
"document" is the SET of vectors sharing a group key (chunk embeddings of
one document, frames of one video, ...).

Spark-first shape: per-row similarities to each of the q query vectors are
JVM higher-order expressions (functions/vector.py conventions — float64,
query norms folded driver-side); the max-per-query-vector and the final
sum are ONE decomposable aggregation, so the map side emits q partial
maxes per group and the only shuffle is (group_key, q doubles) — at 100 TB
the network carries a few doubles per document, never the vectors. The
row norm is materialized once in a layered select (referenced by every
query-vector term; the repeated reference also blocks CollapseProject from
re-inlining it per term).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatdata_spark.functions.vector import dot_product, vector_norm


def maxsim_scores(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    query_vecs: Sequence[Sequence[float]],
    round_digits: int = 6,
) -> DataFrame:
    """(group_col, score) for every group: Σ_i max_j cos(q_i, row_j)."""
    base = df.select(F.col(group_col), F.col(vec_col).alias("__v")).withColumn(
        "__na", vector_norm("__v")
    )
    sims = []
    for i, q in enumerate(query_vecs):
        qn = math.sqrt(sum(float(x) * float(x) for x in q))
        sims.append((dot_product("__v", q) / (F.col("__na") * F.lit(qn))).alias(f"__s{i}"))
    per_row = base.select(group_col, *sims)
    score = F.max(F.col("__s0"))
    for i in range(1, len(query_vecs)):
        score = score + F.max(F.col(f"__s{i}"))
    return per_row.groupBy(group_col).agg(F.round(score, round_digits).alias("score"))


def maxsim_topk(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k groups by late-interaction score (ties broken on the key —
    TakeOrderedAndProject, never a global sort)."""
    return (
        maxsim_scores(df, group_col, vec_col, query_vecs, round_digits)
        .orderBy(F.col("score").desc(), F.col(group_col).asc())
        .limit(int(k))
    )
