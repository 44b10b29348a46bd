"""Self-query structured-filter compiler: filter AST → pyspark ``Column``.

The reference's second NL→query path (SURVEY §3.2): an LLM emits a
``StructuredQuery`` (LangChain universal filter AST) over the table's typed
attribute catalog, and ``MyScaleTranslator`` compiles it to a SQL WHERE
string (build_retrievers.py:48-60; grammar incl. MyScale extensions CONTAIN
and LIKE, docs/self-query.md:163-180). Here the AST compiles **directly to a
Catalyst ``Column``** — one IR less than the reference (no WHERE-string),
and the resulting filter pushes down into the parquet scan like any other
predicate.

Comparators: eq ne gt gte lt lte contain like in nin
Operators:   and or not

Attribute catalog = ``catalog.AttributeInfo``; computed attributes (the
reference exposes ``length(categories)``, myscale_tables.py:111) compile via
their SQL expression.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from chatdata_spark.catalog import AttributeInfo

FilterNode = Union["Comparison", "Operation"]


@dataclass(frozen=True)
class Comparison:
    comparator: str  # eq ne gt gte lt lte contain like in nin
    attribute: str
    value: Any


@dataclass(frozen=True)
class Operation:
    operator: str  # and or not
    arguments: tuple

    def __init__(self, operator: str, *arguments: FilterNode):
        object.__setattr__(self, "operator", operator)
        object.__setattr__(self, "arguments", tuple(arguments))


# convenience constructors (mirror the LangChain grammar names)
def eq(a, v):  # noqa: E731
    return Comparison("eq", a, v)


def ne(a, v):
    return Comparison("ne", a, v)


def gt(a, v):
    return Comparison("gt", a, v)


def gte(a, v):
    return Comparison("gte", a, v)


def lt(a, v):
    return Comparison("lt", a, v)


def lte(a, v):
    return Comparison("lte", a, v)


def contain(a, v):
    return Comparison("contain", a, v)


def like(a, v):
    return Comparison("like", a, v)


def in_(a, v):
    return Comparison("in", a, v)


def nin(a, v):
    return Comparison("nin", a, v)


def and_(*args):
    return Operation("and", *args)


def or_(*args):
    return Operation("or", *args)


def not_(arg):
    return Operation("not", arg)


class SelfQueryCompiler:
    """Compile a filter AST to a Catalyst Column against a typed attribute
    catalog. Unknown attributes / comparator-type mismatches raise — the
    explicit 'unsupported construct' error path (SURVEY §7 risks)."""

    def __init__(self, attributes: tuple[AttributeInfo, ...] | list[AttributeInfo]):
        self.attrs = {a.name: a for a in attributes}

    def _col(self, attr: AttributeInfo) -> Column:
        return F.expr(attr.sql_expr)

    def _value(self, attr: AttributeInfo, v: Any) -> Column:
        if attr.type == "timestamp":
            return F.to_timestamp(F.lit(v))
        if attr.type == "date":
            return F.to_date(F.lit(v))
        return F.lit(v)

    def compile(self, node: FilterNode) -> Column:
        if isinstance(node, Operation):
            op = node.operator.lower()
            args = [self.compile(a) for a in node.arguments]
            if op == "and":
                c = args[0]
                for a in args[1:]:
                    c = c & a
                return c
            if op == "or":
                c = args[0]
                for a in args[1:]:
                    c = c | a
                return c
            if op == "not":
                if len(args) != 1:
                    raise ValueError("not() takes exactly one argument")
                return ~args[0]
            raise ValueError(f"unsupported operator: {node.operator}")

        if not isinstance(node, Comparison):
            raise TypeError(f"unsupported node: {node!r}")
        attr = self.attrs.get(node.attribute)
        if attr is None:
            raise ValueError(
                f"unknown attribute {node.attribute!r}; allowed: {sorted(self.attrs)}"
            )
        col = self._col(attr)
        cmpr = node.comparator.lower()
        if cmpr == "contain":
            if not attr.type.startswith("list"):
                raise ValueError(f"contain requires a list attribute, got {attr.type}")
            return F.array_contains(col, node.value)
        if cmpr == "like":
            if attr.type != "string":
                raise ValueError(f"like requires a string attribute, got {attr.type}")
            return col.like(node.value)
        if cmpr == "in":
            return col.isin(list(node.value))
        if cmpr == "nin":
            return ~col.isin(list(node.value))
        v = self._value(attr, node.value)
        ops = {
            "eq": col.__eq__,
            "ne": col.__ne__,
            "gt": col.__gt__,
            "gte": col.__ge__,
            "lt": col.__lt__,
            "lte": col.__le__,
        }
        if cmpr not in ops:
            raise ValueError(f"unsupported comparator: {node.comparator}")
        return ops[cmpr](v)


def python_eval(node: FilterNode, row: dict, attrs: dict[str, AttributeInfo]) -> bool:
    """Naive row-by-row reference evaluator for property tests (SURVEY §5.3).

    ``row`` must contain computed attributes pre-evaluated under their
    attribute name. None propagates as False (SQL three-valued logic
    collapsed at the filter boundary — matches Spark's filter semantics for
    the comparator set above except ``ne`` on NULL, which both treat as
    not-matching)."""
    if isinstance(node, Operation):
        op = node.operator.lower()
        if op == "and":
            return all(python_eval(a, row, attrs) for a in node.arguments)
        if op == "or":
            return any(python_eval(a, row, attrs) for a in node.arguments)
        if op == "not":
            return not python_eval(node.arguments[0], row, attrs)
        raise ValueError(op)
    v = row.get(node.attribute)
    if v is None:
        return False
    c = node.comparator.lower()
    if c == "contain":
        return node.value in v
    if c == "like":
        import re as _re

        pat = "^" + "".join(
            ".*" if ch == "%" else "." if ch == "_" else _re.escape(ch) for ch in node.value
        ) + "$"
        return _re.match(pat, v, _re.DOTALL) is not None
    if c == "in":
        return v in node.value
    if c == "nin":
        return v not in node.value
    w = node.value
    return {
        "eq": v == w,
        "ne": v != w,
        "gt": v > w,
        "gte": v >= w,
        "lt": v < w,
        "lte": v <= w,
    }[c]
