"""Deletion-neighborhood fuzzy join: completeness for every d=1 edit kind
vs a brute-force reference, and the no-cross-product plan shape."""

from __future__ import annotations

import itertools

from chatdata_spark.operators.fuzzyjoin import fuzzy_self_join
from tests.conftest import SF_ORACLE


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


def test_fuzzy_join_complete_for_all_edit_kinds(spark):
    vals = [
        "quartz", "quartx",      # substitution
        "quart",                 # deletion
        "quartzy",               # insertion (vs quartz? no — 'quartzy' = quartz+y)
        "granite", "granit",     # deletion
        "slate", "plate",        # substitution at position 0
        "slates",                # insertion at end
        "obsidian",              # no neighbor
        "",                      # empty string edge
        "a",                     # one char (dist 1 from "")
    ]
    df = spark.createDataFrame([(v,) for v in vals], "name string")
    got = {(r.left_name, r.right_name) for r in fuzzy_self_join(df, "name").collect()}
    want = {
        (min(a, b), max(a, b))
        for a, b in itertools.combinations(set(vals), 2)
        if _lev(a, b) <= 1
    }
    assert got == want and len(want) >= 6


def test_fuzzy_join_plan_has_no_cross_product(spark):
    p = spark.read.parquet(f"{SF_ORACLE}/part.parquet")
    plan = fuzzy_self_join(p, "p_name")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
