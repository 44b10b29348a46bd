"""Vector distance / embedding functions.

Replaces the reference's DB-native ``DISTANCE(column, query_vector)``
(/root/reference/app/backend/constants/prompts.py:31-34, metric per index =
Cosine, myscale_tables.py:35,63) and the prompt-level ``NeuralArray(entity)``
embedder (prompts.py:34, resolved app-side by
vector_sql_output_parser.py:6-23).

Design for scale:

- The default distance implementations are **pure Spark higher-order
  functions** (``zip_with`` + ``aggregate``): they run JVM-side with no
  Python worker, no Arrow transfer, and survive whole-stage pipelines. On a
  1000-executor cluster the distance computation stays inside the scan
  stage and feeds ``TakeOrderedAndProject`` directly — no shuffle beyond
  the final top-k reduction.
- A vectorized Arrow ``pandas_udf`` variant exists for wide vectors where
  NumPy's SIMD dot product wins over the per-element lambda; pick per
  benchmark, semantics are identical (float64 both paths).
- All arithmetic is float64 regardless of storage dtype (parquet stores
  float32) so results are oracle-stable (SURVEY §5 determinism note).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _as_double_array(v: Column | str | Sequence[float]) -> Column:
    """Coerce a column name / Column / Python vector literal to array<double>."""
    if isinstance(v, str):
        v = F.col(v)
    if isinstance(v, Column):
        return v.cast("array<double>")
    return F.array(*[F.lit(float(x)) for x in v])


def dot_product(a, b) -> Column:
    """Sum of elementwise products, JVM-side."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def vector_norm(a) -> Column:
    a = _as_double_array(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_distance(a, b) -> Column:
    """1 - cos(a, b), float64 — the reference's Cosine metric
    (myscale_tables.py:35,63; ascending = most similar first).

    When ``b`` is a Python literal vector its norm is folded driver-side —
    otherwise the plan re-aggregates the constant array per row.
    """
    if not isinstance(b, (str, Column)):
        nb = F.lit(math.sqrt(sum(float(x) * float(x) for x in b)))
    else:
        nb = vector_norm(b)
    return F.lit(1.0) - dot_product(a, b) / (vector_norm(a) * nb)


def cosine_similarity(a, b) -> Column:
    """dot(a,b) / (|a|·|b|), float64 — computed DIRECTLY (not as
    ``1 - cosine_distance``): the double subtraction ``1 - (1 - x)`` is not
    bit-exact for all x, and oracle engines (DuckDB
    ``list_cosine_similarity``) compute the direct form — same operand
    order both sides is the repo's determinism rule."""
    return dot_product(a, b) / (vector_norm(a) * vector_norm(b))


def l2_distance(a, b) -> Column:
    a, b = _as_double_array(a), _as_double_array(b)
    return F.sqrt(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x)
    )


# --- SQL-string builders (used by the Vector SQL dialect pre-pass) ----------

def vector_literal_sql(vec: Sequence[float]) -> str:
    """A float64 array literal usable inside spark.sql strings."""
    return "array(" + ",".join(repr(float(x)) for x in vec) + ")"


def cosine_distance_sql(col_expr: str, vec_expr: str, vec_norm: float | None = None) -> str:
    """Cosine distance as a pure Spark SQL expression string (JVM-side).

    Used by plans/vector_sql.py to rewrite ``DISTANCE(col, [..])`` so that
    LLM-emitted SQL never drops to a Python UDF. Pass ``vec_norm`` when the
    query vector is known driver-side so its norm is a folded constant.
    """
    a = f"CAST({col_expr} AS ARRAY<DOUBLE>)"
    b = vec_expr
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    na = f"sqrt(aggregate({a}, 0D, (acc, x) -> acc + x * x))"
    nb = repr(float(vec_norm)) if vec_norm is not None else f"sqrt(aggregate({b}, 0D, (acc, x) -> acc + x * x))"
    return f"(1.0D - {dot} / ({na} * {nb}))"


# --- Arrow-vectorized pandas UDF variants ------------------------------------

def make_cosine_distance_pandas(query_vec: Sequence[float]):
    """Arrow-batched NumPy cosine distance against a fixed query vector.

    Faster than the higher-order-function path for wide vectors (768-d):
    each Arrow batch becomes one (n, d) float64 matmul.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @F.pandas_udf(DoubleType())
    def _cos(col: pd.Series) -> pd.Series:
        m = np.array(col.tolist(), dtype=np.float64)
        dots = m @ q
        norms = np.linalg.norm(m, axis=1)
        return pd.Series(1.0 - dots / (norms * qn))

    return _cos


def cosine_distance_pandas(col, query_vec: Sequence[float]) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    return make_cosine_distance_pandas(query_vec)(col)


# --- Storage quantization -----------------------------------------------------

def with_quantized_vector(df, vec_col: str, prefix: str = "q_"):
    """Symmetric int8 quantization of a vector column: per-row
    ``scale = max|x|/127``, ``q[i] = round(x[i]/scale)`` — 4× smaller than
    float32 at ≤0.4% per-element error, the role of the reference index's
    ``fp16_storage=1`` (myscale_tables.py:35: store compressed, compute on
    reconstruction).

    Output keeps ``{prefix}scale`` as a real column — it is referenced both
    as output and inside the dequant lambda, which stops CollapseProject
    from inlining the array_max back into the per-element loop."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    out = df.withColumn(f"{prefix}scale", scale)
    return out.withColumn(
        f"{prefix}vec",
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") / F.col(f"{prefix}scale")).cast("tinyint")
        ),
    )


def dequantized(qvec_col: str, scale_col: str) -> Column:
    """Reconstruct array<double> from int8 codes + scale."""
    return F.transform(F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col))


# --- Deterministic stub embedder ---------------------------------------------

def hash_embed(text: str, dim: int = 64) -> list[float]:
    """Deterministic pseudo-embedding: sha256(text)-seeded unit vector.

    Stands in for the reference's sentence-transformer models
    (myscale_tables.py:90-92,117-120 — mpnet / instructor-xl); the models
    are not in this container and determinism is required for oracle tests
    (FIXTURES.md convention). Same text → same vector, any process.
    """
    seed = int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim)
    v = v / np.linalg.norm(v)
    return [float(x) for x in v]


# UDF-object memoization (the CacheManager plan-equality rule, project
# notes): a fresh @pandas_udf per call makes otherwise-identical plans
# unequal, so persisted frames keyed on an embed plan cache-miss on every
# invocation. Same pattern as embedders._ST_UDFS for the real-model path.
_HASH_EMBED_UDFS: dict[int, object] = {}


def make_embed_text_udf(dim: int = 64):
    """Distributed batch embedding (V5, tools.py:53-59 shape): an Arrow
    pandas UDF; a real deployment swaps ``hash_embed`` for a broadcast
    sentence-transformers model, the Spark plumbing is identical.
    Memoized per ``dim`` — repeated calls return the SAME UDF object so
    plans built by independent callers stay CacheManager-equal.

    The hashing logic is INLINED (not a call to the module-level
    ``hash_embed``): closures pickle by value, but their references to
    importable-module globals pickle by name — a ``hash_embed`` reference
    would require ``chatdata_spark`` on every Python worker's path."""
    memo = _HASH_EMBED_UDFS.get(dim)
    if memo is not None:
        return memo

    @F.pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        # Batch-buffered form of the original per-row
        # ``RandomState(seed).standard_normal(dim)`` stub — bit-identical
        # (r11 opt round, 19x on the Python side): one reused RandomState
        # re-seeded per row (``seed()`` is the same MT19937 init as the
        # constructor and resets the gauss cache), the SAME per-row
        # ``v / np.linalg.norm(v)`` division, and rows returned as float64
        # ndarray slices instead of ``[float(x) ...]`` lists — Arrow applies
        # the identical float64→float32 cast either way
        # (tests/test_vector_functions.py pins old ≡ new to the bit).
        n = len(texts)
        out = np.empty((n, dim))
        rs = np.random.RandomState(0)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.sha256((t if t is not None else "").encode("utf-8")).digest()[:4],
                "big",
            )
            rs.seed(seed)
            v = rs.standard_normal(dim)
            out[i] = v / np.linalg.norm(v)
        return pd.Series(list(out))

    _HASH_EMBED_UDFS[dim] = _embed
    return _embed


def register_vector_sql_functions(spark: SparkSession, dim: int = 64) -> None:
    """Register the Python-backed functions for spark.sql entry points.

    ``DISTANCE`` in SQL strings is handled by the dialect pre-pass via
    :func:`cosine_distance_sql` (JVM-side); these registrations add the
    embedder + a convenience cosine UDF under stable names.
    """
    spark.udf.register("embed_text", make_embed_text_udf(dim))

    @F.pandas_udf(DoubleType())
    def _cos2(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.array(a.tolist(), dtype=np.float64)
        mb = np.array(b.tolist(), dtype=np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        return pd.Series(1.0 - dots / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)))

    spark.udf.register("cosine_distance_py", _cos2)


def cosine_distance_py(a: Sequence[float], b: Sequence[float]) -> float:
    """Plain-Python reference implementation (tests / driver-side ranking)."""
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return 1.0 - dot / (na * nb)
