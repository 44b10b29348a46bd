"""Transparent DISTANCE→index routing (SURVEY §4.3.3, previously deferred):
when a Vector SQL query is the reference's kNN template over a table with a
registered IVF index, execute it through the partition-pruned index scan
instead of a full-table scan — the role of MyScale's implicit MSTG index
use, made explicit as a pre-pass router (no Catalyst extension needed: the
routing decision only requires the template's shape, which the dialect
layer already parses).

Routed shape (the myscale_without_metadata.py:19-36 template):

    SELECT <cols> FROM <indexed_table>
    [PREWHERE|WHERE <pred>]
    ORDER BY DISTANCE(<vec_col>, NeuralArray(..)|[..]) [AS alias] [ASC]
    [, <tiebreak cols>]
    LIMIT <k>

Anything else falls through to ``spark.sql(dialect.translate(sql))`` —
routing is an optimization, never a semantics change (with
``n_probe = n_clusters`` the routed result is exactly the full scan's)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chatdata_spark.operators.ivf import IVFIndex
from chatdata_spark.plans.vector_sql import VectorSQLDialect, _ch_array_literal_to_floats, _split_args, _scan_balanced

_TEMPLATE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<table>[\w.]+)\s*"
    r"(?:(?:PREWHERE|WHERE)\s+(?P<where>.+?))?\s*"
    r"ORDER\s+BY\s+DISTANCE\s*\((?P<dist_args>.+?)\)\s*(?:AS\s+(?P<alias>\w+))?\s*(?:ASC)?\s*"
    r"(?P<extra_order>,[^,]+?)?\s*"
    r"LIMIT\s+(?P<k>\d+)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


class VectorQueryRouter:
    def __init__(
        self,
        dialect: VectorSQLDialect,
        indexes: dict[str, IVFIndex],
        n_probe: int | None = None,
    ) -> None:
        self.dialect = dialect
        self.indexes = {t.lower(): idx for t, idx in indexes.items()}
        self.n_probe = n_probe

    def _query_vector(self, vec_text: str) -> list[float] | None:
        vec_text = vec_text.strip()
        m = re.match(r"NeuralArray\s*\(", vec_text, re.IGNORECASE)
        if m:
            end = _scan_balanced(vec_text, vec_text.index("(", m.end() - 1))
            inner = vec_text[vec_text.index("(", m.end() - 1) + 1 : end - 1]
            return [float(x) for x in self.dialect.embedder(inner.strip().strip("'"))]
        return _ch_array_literal_to_floats(vec_text)

    def execute(self, spark: SparkSession, ch_sql: str) -> DataFrame:
        """Route if the query matches the indexed-kNN template, else
        translate + spark.sql (same results either way)."""
        m = _TEMPLATE.match(ch_sql.strip())
        routed = None
        if m:
            idx = self.indexes.get(m.group("table").lower())
            if idx is not None:
                args = _split_args(m.group("dist_args"))
                vec = self._query_vector(args[1]) if len(args) == 2 else None
                if vec is not None and args[0].strip() == idx.vector_col:
                    routed = (idx, m, vec)
        if routed is None:
            return spark.sql(self.dialect.translate(ch_sql))

        idx, m, vec = routed
        n_probe = self.n_probe or idx.n_clusters
        where = None
        if m.group("where"):
            where = F.expr(self.dialect._rename_functions(m.group("where")))
        select_cols = [c.strip() for c in _split_args(m.group("select"))]
        alias = m.group("alias")
        out = idx.search(vec, k=int(m.group("k")), n_probe=n_probe, where=where, select=select_cols)
        if alias and alias != "dist":
            out = out.withColumnRenamed("dist", alias)
        return out
