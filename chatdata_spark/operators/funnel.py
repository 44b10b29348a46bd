"""Event-sequence analytics: funnel steps and cohort retention — the
ClickHouse ``windowFunnel`` / ``retention`` capability family
(/root/reference runs on a ClickHouse-family engine where these are
native aggregate combinators), re-expressed as plain relational plans so
Catalyst owns the physical strategy.

``funnel_steps`` uses the *earliest-entry* deterministic formulation:
t1 = first step-1 event, t_k = first step-k event after t_{k-1} within
``window`` of t1. Each stage is one filtered groupBy-min joined back on
the user key — k small shuffles on (user, timestamp) pairs, never a
per-user event collect; at 100 TB the stage frames are |users| rows, and
every join key is the same (user) hash, so AQE coalesces the exchanges.
(ClickHouse's windowFunnel scans per-user sorted arrays in memory — the
join formulation is the shuffle-native equivalent with identical results
for the earliest-entry chain.)

``cohort_retention`` buckets each user by first-seen period and counts
distinct returning users per (cohort, offset) — two aggregations, both
decomposable.

``sequence_match`` / ``sequence_count`` are the ``sequenceMatch`` /
``sequenceCount`` members of the same ClickHouse family: each event maps
to a single-character symbol, the per-user symbols are concatenated in
(ts, tie_break) order, and the ClickHouse pattern ``(?1).*(?2)`` becomes
an ordinary regex over symbols (``(?1)(?2)`` adjacency and ``[^x]*``
exclusion gaps are expressible the same way — strictly more general than
the chain-join funnel). Matching/counting is leftmost non-overlapping
(Java and RE2 agree), which with lazy gaps (``.*?``) is exactly the
greedy-earliest chain ClickHouse implements. Scale shape: ONE shuffle of
(user, 1-byte symbol, ts) rows; per-user state is bounded by that user's
event count — the same bound ClickHouse's native aggregate state carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_conds: list[Column],
    window: str = "INTERVAL 7 DAYS",
    step_gap: str | None = None,
) -> DataFrame:
    """Per-user funnel progress: (user, t1..tk, step) where step = depth
    of the earliest-entry chain completed within ``window`` of t1.
    ``step_gap`` additionally bounds EACH ADJACENT step (t_k must fall
    within ``step_gap`` of t_{k-1}) — the windowFunnel time-constraint
    mode (ClickHouse ``(?t<=N)`` between steps): a user who views, goes
    cold, and converts a week later counts for the loose funnel but not
    the tight one. Greedy-earliest like the base mode — the chain picks
    the first qualifying event per step, which is the deterministic
    semantics both engines replay."""
    u, ts = F.col(user_col), F.col(ts_col)
    stage = (
        events.filter(step_conds[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("t1"))
    )
    deadline = F.col("t1") + F.expr(window)
    for i, cond in enumerate(step_conds[1:], start=2):
        prev = F.col(f"t{i-1}")
        bound = deadline if step_gap is None else F.least(deadline, prev + F.expr(step_gap))
        nxt = (
            events.filter(cond)
            .select(u.alias(user_col), ts.alias("__ts"))
            .join(stage, user_col)
            .filter((F.col("__ts") > prev) & (F.col("__ts") <= bound))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        stage = stage.join(nxt, user_col, "left")
    k = len(step_conds)
    step = F.lit(0)
    for i in range(1, k + 1):
        step = F.when(F.col(f"t{i}").isNotNull(), i).otherwise(step)
    return stage.withColumn("step", step.cast("long"))


def event_sequence(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    symbol: Column,
    tie_break: str,
) -> DataFrame:
    """(user, seq): per-user event symbols concatenated in deterministic
    (ts, tie_break) order. ``symbol`` must evaluate to a single character;
    reserve one filler character (conventionally 'o') for events no
    pattern references, so ``[^x]*`` gap classes stay meaningful."""
    rows = events.select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        F.col(tie_break).alias("__tb"),
        symbol.alias("__sym"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("__ts", "__tb", "__sym")))
    return rows.groupBy(user_col).agg(
        F.array_join(F.transform(ordered, lambda x: x["__sym"]), "").alias("seq")
    )


def sequence_match(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    symbol: Column,
    pattern: str,
    tie_break: str,
) -> DataFrame:
    """(user, matched): does the user's ordered event-symbol string contain
    a match of ``pattern`` (regex search, not full anchor)? The
    sequenceMatch('(?1).*(?2)') equivalent is pattern '12' symbols with
    '.*' gaps — e.g. 'c[^v]*p' = click then purchase with no view between."""
    return event_sequence(events, user_col, ts_col, symbol, tie_break).select(
        user_col, F.col("seq").rlike(pattern).alias("matched")
    )


def sequence_count(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    symbol: Column,
    pattern: str,
    tie_break: str,
) -> DataFrame:
    """(user, n_matches): leftmost non-overlapping match count of
    ``pattern`` over the user's ordered symbol string — sequenceCount
    semantics when gaps are written lazily ('v.*?p': each match closes at
    the earliest completing event, then scanning resumes after it)."""
    return event_sequence(events, user_col, ts_col, symbol, tie_break).select(
        user_col,
        F.regexp_count(F.col("seq"), F.lit(pattern)).cast("long").alias("n_matches"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """(cohort_day, offset_days, n_users): distinct users from each
    first-seen-day cohort active again ``offset_days`` later (offset 0 =
    cohort size)."""
    day = F.date_trunc("day", F.col(ts_col))
    cohorts = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    return (
        events.select(F.col(user_col), day.alias("__day"))
        .distinct()
        .join(cohorts, user_col)
        .withColumn("offset_days", F.datediff(F.col("__day"), F.col("cohort_day")).cast("long"))
        .groupBy("cohort_day", "offset_days")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )
