"""Maximal Marginal Relevance (MMR) diversified top-k (extension; the
LangChain retriever interface the reference builds on exposes
search_type='mmr' — build_retrievers.py:116 uses the plain similarity
retriever, this adds the diversified variant engine-side).

Two-stage shape, honest about where each part runs:
1. distributed screen: exact cosine top-``fetch_n`` (TakeOrderedAndProject
   heap — the same plan as knn), pulling ``fetch_n`` (id, vec, dist) rows
   to the driver. fetch_n is a SMALL constant (~10²) by contract: MMR
   diversifies a results page, not a corpus.
2. driver greedy: iteratively add the candidate maximizing
   ``lam·sim(q,d) − (1−lam)·max_{s∈S} sim(d,s)`` — O(fetch_n²·dim) on
   ≤100 rows, microseconds. Ties break on id, floats are numpy float64
   with fixed operation order, so the selection is deterministic and the
   oracle replays it exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatdata_spark.operators.knn import knn


def mmr_greedy(
    ids: Sequence[int],
    vecs: np.ndarray,
    qvec: Sequence[float],
    k: int,
    lam: float,
) -> list[tuple[int, float]]:
    """Deterministic greedy MMR over a candidate matrix: returns
    [(id, round6 mmr score at selection)] in selection order. Pure driver
    arithmetic — shared verbatim by the oracle builder."""
    v = np.asarray(vecs, dtype=np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    q = np.asarray(qvec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    rel = v @ q  # cosine similarity to the query
    cross = v @ v.T
    order = np.argsort(ids, kind="stable")  # tie-break domain: id ascending
    picked: list[int] = []
    out: list[tuple[int, float]] = []
    remaining = set(range(len(ids)))
    for _ in range(min(k, len(ids))):
        best, best_score = None, None
        for i in sorted(remaining, key=lambda i: ids[i]):  # id-ordered ties
            penalty = max((cross[i][j] for j in picked), default=0.0)
            score = lam * rel[i] - (1.0 - lam) * penalty
            if best_score is None or score > best_score:
                best, best_score = i, score
        picked.append(best)
        remaining.remove(best)
        out.append((int(ids[best]), float(round(best_score, 6))))
    del order
    return out


def mmr_select(
    df: DataFrame,
    vec_col: str,
    qvec: Sequence[float],
    k: int,
    id_col: str,
    fetch_n: int = 100,
    lam: float = 0.5,
) -> DataFrame:
    """Diversified top-k: exact-cosine screen to ``fetch_n`` candidates
    (distributed heap), then driver-side greedy MMR. Returns
    (id, mmr_rank, mmr_score) in selection order.

    ``fetch_n`` is a RESULTS-PAGE constant by contract — the greedy is
    O(fetch_n²·dim) on the driver, which is microseconds at 10² and a
    problem at 10⁴. The guard makes the contract explicit instead of
    letting a config change silently move corpus-scale work onto the
    driver; above it, move the greedy into a single-partition Arrow UDF
    (same math, executor-side) before raising the cap."""
    if fetch_n > 2048:
        raise ValueError(
            f"mmr_select fetch_n={fetch_n} exceeds the bounded-driver-greedy "
            "contract (≤2048); diversify a results page, or port the greedy "
            "to a single-partition Arrow UDF for larger candidate sets"
        )
    cand = knn(df, vec_col, qvec, k=fetch_n, select=[id_col, vec_col], id_col=id_col)
    rows = cand.collect()
    ids = [r[id_col] for r in rows]
    vecs = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    chosen = mmr_greedy(ids, vecs, qvec, k, lam)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, rank, score) for rank, (i, score) in enumerate(chosen)],
        f"{id_col} long, mmr_rank int, mmr_score double",
    )
