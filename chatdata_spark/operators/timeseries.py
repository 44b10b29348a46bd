"""Time-series operators Spark lacks as built-ins: as-of join and gap
sessionization (extensions; nearest reference artifact is the epoch-float
message ordering, SURVEY §2.5/§1.3 — these are the operators an event
pipeline needs at scale).

Both are **single-shuffle window formulations** — no join explosion:

- as-of join: tag left/right rows, union, one window pass per partition key
  ordered by (ts, side) carrying the last right payload forward
  (``last(..., ignorenulls=True)``). Cost = shuffle on the key + sort
  within partition — the merge-join shape, robust to arbitrarily many
  right rows per left row (a range-condition join would explode).
- sessionize: lag + running sum of gap-breaks. One window, no join at all.

Skew: window functions hash-partition on the key alone, and AQE's skew
handling does NOT apply to window exchanges — one hot key (a user with 10⁸
events) serializes onto a single task. Both operators therefore take an
optional ``slice_width`` (seconds): the partition key becomes
(key, time-slice) so a hot key spreads over history/slice_width tasks, and
a boundary pass over the per-(key, slice) summary table (one row per
non-empty slice — trivially small) stitches results across slice edges:
the as-of carry-in for a slice is the latest right payload of any earlier
slice; a session whose first intra-slice event is within ``gap`` of the
previous slice's last event merges, with session indices shifted by the
running merged-session offset. Identical output to the unsalted path
(asserted in tests), at the cost of one extra small shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _numeric_ts(df: DataFrame, ts_col: str) -> Column:
    """Seconds-valued numeric view of a ts column for slice bucketing."""
    if dict(df.dtypes).get(ts_col, "").startswith("timestamp"):
        return F.unix_timestamp(F.col(ts_col))
    return F.col(ts_col)


# derived slice widths, keyed (input semanticHash, ts_col, floor) — the span
# scan is a bounded two-scalar agg; memoized like the jaccard stop sets so
# repeated plan constructions over the same input cost zero extra jobs.
# Same static-data assumption + FIFO bound as dedup._STOP_SETS (see the
# comment there): the key hashes the PLAN, not file contents — in-place
# rewrites under an unchanged path must clear this (or use versioned dirs).
_SLICE_WIDTHS: dict[tuple, float] = {}


def derive_slice_width(df: DataFrame, ts_col: str, floor_sec: float = 0.0) -> float:
    """``slice_width='auto'`` resolution: spread the observed time span over
    ``4 x defaultParallelism`` slices (enough slices that even a key owning
    ALL events runs as ~4 waves of parallel tasks), floored at ``floor_sec``
    (callers pass ~4x the session gap so cross-slice merges stay rare).
    One bounded min/max scan at plan-construction time, memoized per input."""
    key = (df.semanticHash(), ts_col, floor_sec)
    got = _SLICE_WIDTHS.get(key)
    if got is not None:
        return got
    tsn = _numeric_ts(df, ts_col)
    row = df.agg(F.min(tsn).alias("lo"), F.max(tsn).alias("hi")).first()
    par = df.sparkSession.sparkContext.defaultParallelism
    if row["lo"] is None:
        width = max(floor_sec, 1.0)
    else:
        span = float(row["hi"]) - float(row["lo"])
        width = max(span / max(4 * par, 1), floor_sec, 1.0)
    from chatdata_spark.operators.dedup import _memo_put

    _memo_put(_SLICE_WIDTHS, key, width)
    return width


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
    tie_break: str | None = None,
    slice_width: float | str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` and equal ``on`` key (NULLs when none).

    ``tie_break``: right column used to pick deterministically among right
    rows sharing (key, ts) — highest wins. Required for oracle-stable
    results when right timestamps can collide.

    ``slice_width`` (seconds): hot-key mitigation — window-partition on
    (key, time-slice) instead of key, then fill each slice's pre-first-match
    rows from the latest earlier-slice right payload (module docstring).
    ``"auto"`` derives the width from the observed span and parallelism
    (:func:`derive_slice_width`); ``None`` keeps the single-partition-per-key
    plan (fine when no key exceeds one task's worth of rows)."""
    rts = right_ts_col or ts_col
    payload_cols = payload_cols or [c for c in right.columns if c not in (on, rts)]

    r = right
    if tie_break is not None:
        w_dedup = Window.partitionBy(on, rts).orderBy(F.col(tie_break).desc())
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    payload = F.struct(*[F.col(c).alias(c) for c in [rts, *payload_cols]])
    r_tagged = r.select(
        F.col(on).alias("__k"),
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    unioned = l_tagged.unionByName(r_tagged.withColumn("__left", F.lit(None).cast(l_tagged.schema["__left"].dataType)))
    if slice_width == "auto":
        slice_width = derive_slice_width(unioned, "__ts")
    # right rows sort before left rows at equal ts → inclusive (<=) semantics
    if slice_width is None:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    else:
        unioned = unioned.withColumn(
            "__slice", F.floor(_numeric_ts(unioned, "__ts") / F.lit(float(slice_width))).cast("long")
        )
        w = (
            Window.partitionBy("__k", "__slice")
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = unioned.withColumn("__match0", F.last("__payload", ignorenulls=True).over(w))
        # boundary pass over the tiny per-(key, slice) summary table:
        # carry-in = latest right payload of any EARLIER slice
        right_last = (
            unioned.filter(F.col("__side") == 0)
            .groupBy("__k", "__slice")
            .agg(F.max_by("__payload", "__ts").alias("__slice_last"))
        )
        w_prev = (
            Window.partitionBy("__k")
            .orderBy("__slice")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            unioned.select("__k", "__slice")
            .distinct()
            .join(right_last, ["__k", "__slice"], "left")
            .withColumn("__carry_in", F.last("__slice_last", ignorenulls=True).over(w_prev))
            .select("__k", "__slice", "__carry_in")
        )
        carried = within.join(carry, ["__k", "__slice"]).withColumn(
            "__match", F.coalesce("__match0", "__carry_in")
        )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        F.col(f"__match.{rts}").alias(f"{prefix}{rts}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    right_val_col: str,
    equi_keys: list[str] | None = None,
    bucket_width: float = 3600.0,
    how: str = "inner",
    max_matches_per_left: int | None = None,
    left_id: str | None = None,
    right_tiebreak: str | None = None,
    keep: str = "last",
    slice_width: float | None = None,
) -> DataFrame:
    """Interval join: pairs where ``right.val ∈ [left.lo, left.hi]``
    (+ optional equi keys) via **bucketized equi-join** — the scalable
    alternative to the nested-loop plan Spark picks for raw inequality
    joins.

    Left intervals explode to the bucket ids they overlap; right rows get
    one bucket; the join is a plain hash join on (equi_keys..., bucket)
    filtered by the exact range predicate. Each qualifying pair appears
    exactly once (a right row has exactly one bucket). Cost scales with
    interval_width/bucket_width per left row instead of |L|×|R|.
    ``lo/hi/val`` are numeric (pass epoch seconds for timestamps).
    Inner semantics only — use :func:`range_join_left` for LEFT (a post-join
    range filter on an outer join would silently drop NULL matches, and
    exploded left rows would duplicate them per bucket).

    ``max_matches_per_left``: the hot-key OUTPUT bound. The plan above is
    sub-linear in its output, but a genuinely hot key makes the query's own
    output quadratic (one user on both sides of a window join: n_left ×
    n_right pairs) — at 100 TB that's a semantic hazard no partitioning
    fixes. With a bound, each left row keeps only its N nearest matches:
    ``keep='last'`` = the N largest ``right_val`` (most recent before the
    ``hi`` bound — the "latest N clicks before the purchase" semantics),
    ``keep='first'`` = the N smallest (earliest in the window). The bounded
    path never ENUMERATES the quadratic pair set (see
    :func:`_bounded_range_join`): right rows are numbered per key in
    preference order, each left row as-of-joins to its boundary number,
    and a sequence of at most N numbers equi-joins back —
    O(|L|·N + |R| log |R|) total, vs O(pairs) for any join-then-prune.
    Requires ``left_id`` (unique left row key); pass ``right_tiebreak``
    (a right column making (right_val, tiebreak) unique per key) for
    deterministic results when right values can collide. ``slice_width``
    (same units as the values) is the bounded path's hot-key knob: the
    numbering and the as-of both re-partition on (key, value-slice) with
    tiny boundary passes, so one hot key spreads over history/slice_width
    tasks instead of serializing (identical output, property-asserted)."""
    equi_keys = equi_keys or []
    if how != "inner":
        raise ValueError(f"range_join is inner-only (see range_join_left), got {how}")
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    if max_matches_per_left is not None:
        if left_id is None:
            raise ValueError("max_matches_per_left requires left_id (unique left row key)")
        return _bounded_range_join(
            left, right, lo_col, hi_col, right_val_col, equi_keys,
            max_matches_per_left, right_tiebreak, keep, slice_width,
        )

    lb = F.explode(
        F.sequence(
            F.floor(F.col(lo_col) / bucket_width).cast("long"),
            F.floor(F.col(hi_col) / bucket_width).cast("long"),
        )
    ).alias("__bucket")
    l = left.select("*", lb)
    r = right.withColumn("__bucket", F.floor(F.col(right_val_col) / bucket_width).cast("long"))
    cond = [l["__bucket"] == r["__bucket"]] + [l[k] == r[k] for k in equi_keys]
    inner = l.join(r, cond, "inner").filter(
        (r[right_val_col] >= l[lo_col]) & (r[right_val_col] <= l[hi_col])
    )
    for c in [l["__bucket"], r["__bucket"]] + [r[k] for k in equi_keys]:
        inner = inner.drop(c)
    return inner


def _bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    right_val_col: str,
    equi_keys: list[str],
    n: int,
    right_tiebreak: str | None,
    keep: str,
    slice_width: float | None = None,
) -> DataFrame:
    """Nearest-N interval join WITHOUT pair enumeration (inner semantics).

    Direction-normalized so both ``keep`` modes are "the N latest in
    preference order at or before an anchor": for ``keep='last'`` the
    preference value is ``right_val`` and the anchor is ``hi`` (far bound
    ``val >= lo`` filtered at the end); for ``keep='first'`` the value is
    ``-right_val`` and the anchor is ``-lo`` (far bound ``val <= hi``).

    1. Number right rows per key in preference order (row_number) — the
       numbering is monotone, so "the N nearest matches" are exactly a
       CONTIGUOUS number range.
    2. As-of join (operators/timeseries.py::asof_join — single-shuffle
       window merge) each left row to the HIGHEST number at-or-before its
       anchor; tie_break=number makes equal-value right rows collapse to
       the max number, which is the preferred end of the range.
    3. Explode ``sequence(max(boundary-N+1, 1), boundary)`` (≤N rows per
       left row) and hash-join back on (key, number); filter the far bound.

    Cost: O(|R| log |R|) numbering + the as-of's single union shuffle +
    an equi-join of ≤N·|L| against |R| — NEVER the pair count, so a hot
    key's quadratic true match set costs nothing beyond its share of the
    linear passes. Remaining skew point: the numbering window serializes
    one key per task (same hazard class as unsliced asof/sessionize;
    O(n log n) per key, not O(n²) — acceptable far beyond the pair
    enumeration's breaking point). With no equi keys the numbering is a
    single global task by construction — a keyless bounded interval join
    is inherently a global order statistic."""
    last = keep == "last"
    if equi_keys:
        ek = F.struct(*[F.col(k) for k in equi_keys])
    else:
        ek = F.lit(0)

    val = F.col(right_val_col)
    order = [val.asc() if last else val.desc()]
    if right_tiebreak is not None:
        tb = F.col(right_tiebreak)
        order.append(tb.asc() if last else tb.desc())
    base = right.filter(val.isNotNull()).withColumn("__ek", ek)
    if slice_width is None:
        w_num = Window.partitionBy("__ek").orderBy(*order)
        numbered = base.withColumn("__cn", F.row_number().over(w_num).cast("long"))
    else:
        # hot-key-sliced numbering (the sessionize offset pattern): local
        # row_number per (key, value-slice) + a running count of earlier
        # slices from the tiny per-(key, slice) summary. Slices follow the
        # PREFERENCE direction (vp = val or -val), so slice order ==
        # numbering order and the offset is just the earlier-slice count.
        vp0 = val if last else -val
        sliced = base.withColumn(
            "__sl", F.floor(vp0 / F.lit(float(slice_width))).cast("long")
        )
        w_local = Window.partitionBy("__ek", "__sl").orderBy(*order)
        local = sliced.withColumn("__lrn", F.row_number().over(w_local))
        counts = local.groupBy("__ek", "__sl").agg(F.count(F.lit(1)).alias("__c"))
        w_run = (
            Window.partitionBy("__ek")
            .orderBy("__sl")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = counts.withColumn(
            "__off", F.coalesce(F.sum("__c").over(w_run), F.lit(0))
        ).select("__ek", "__sl", "__off")
        numbered = (
            local.join(offs, ["__ek", "__sl"])
            .withColumn("__cn", (F.col("__off") + F.col("__lrn")).cast("long"))
            .drop("__sl", "__lrn", "__off")
        )

    vp = val if last else -val
    anchor = F.col(hi_col) if last else -F.col(lo_col)
    r_asof = numbered.select("__ek", vp.alias("__vp"), "__cn")
    l_asof = left.withColumn("__ek", ek).withColumn("__anchor", anchor)
    boundary = asof_join(
        l_asof, r_asof, on="__ek", ts_col="__anchor", right_ts_col="__vp",
        payload_cols=["__cn"], prefix="__b_", tie_break="__cn",
        slice_width=slice_width,
    )
    cn = F.col("__b___cn")
    exploded = (
        boundary.filter(cn.isNotNull())
        .withColumn(
            "__cn",
            F.explode(F.sequence(F.greatest(cn - F.lit(n - 1), F.lit(1)), cn)),
        )
        .drop("__b___vp", "__b___cn", "__anchor")
    )
    r_payload = numbered.drop(*equi_keys)
    out = exploded.join(r_payload, ["__ek", "__cn"], "inner")
    far = val >= F.col(lo_col) if last else val <= F.col(hi_col)
    return out.filter(far).drop("__ek", "__cn")


def range_join_left(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    lo_col: str,
    hi_col: str,
    right_val_col: str,
    equi_keys: list[str] | None = None,
    bucket_width: float = 3600.0,
    max_matches_per_left: int | None = None,
    right_tiebreak: str | None = None,
    keep: str = "last",
) -> DataFrame:
    """LEFT interval join: inner :func:`range_join` + anti-join restore of
    unmatched left rows (right columns NULL). ``left_id`` must be unique.
    ``max_matches_per_left`` bounds each left row to its N nearest matches
    (see :func:`range_join` — the hot-key output bound)."""
    inner = range_join(
        left, right, lo_col, hi_col, right_val_col, equi_keys, bucket_width,
        how="inner", max_matches_per_left=max_matches_per_left,
        left_id=left_id, right_tiebreak=right_tiebreak, keep=keep,
    )
    right_only = [c for c in inner.columns if c not in left.columns]
    unmatched = left.join(inner.select(left_id).distinct(), left_id, "left_anti")
    for c in right_only:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(inner.schema[c].dataType))
    return inner.unionByName(unmatched)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
    slice_width: float | str | None = None,
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``. Adds
    ``session_idx`` (0-based per user) — one window pass.

    ``slice_width`` (seconds): hot-key mitigation — sessions are computed
    per (user, time-slice), then a boundary pass over the per-slice summary
    merges sessions spanning a slice edge and shifts indices by the running
    merged-session count (module docstring). Output is identical to the
    unsalted path; pick slice_width ≫ gap so merges stay rare. ``"auto"``
    derives it from span/parallelism floored at 4x the gap
    (:func:`derive_slice_width`)."""
    gap_sec = gap_minutes * 60.0
    if slice_width == "auto":
        slice_width = derive_slice_width(df, ts_col, floor_sec=4.0 * gap_sec)
    if slice_width is None:
        order = [F.col(ts_col).asc()] + ([F.col(order_tiebreak).asc()] if order_tiebreak else [])
        w = Window.partitionBy(user_col).orderBy(*order)
        prev = F.lag(ts_col).over(w)
        is_new = F.when(
            prev.isNull() | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev) > gap_sec), 1
        ).otherwise(0)
        running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn("__new", is_new).withColumn(
            "session_idx", (F.sum("__new").over(running) - 1).cast("int")
        ).drop("__new")

    tsn = _numeric_ts(df, ts_col)
    sliced = df.withColumn("__tsn", tsn).withColumn(
        "__slice", F.floor(F.col("__tsn") / F.lit(float(slice_width))).cast("long")
    )
    order = [F.col(ts_col).asc()] + ([F.col(order_tiebreak).asc()] if order_tiebreak else [])
    w_local = Window.partitionBy(user_col, "__slice").orderBy(*order)
    prev = F.lag("__tsn").over(w_local)
    is_new = F.when(prev.isNull() | (F.col("__tsn") - prev > gap_sec), 1).otherwise(0)
    running = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = sliced.withColumn("__new", is_new).withColumn(
        "__local_idx", (F.sum("__new").over(running) - 1).cast("int")
    )
    # per-(user, slice) summary (tiny): does this slice's first session
    # continue the previous slice's last one, and how many global sessions
    # started before this slice?
    summ = local.groupBy(user_col, "__slice").agg(
        F.min("__tsn").alias("__first"),
        F.max("__tsn").alias("__last"),
        (F.max("__local_idx") + 1).alias("__n_local"),
    )
    w_s = Window.partitionBy(user_col).orderBy("__slice")
    prev_last = F.lag("__last").over(w_s)
    merged = F.when(prev_last.isNotNull() & (F.col("__first") - prev_last <= gap_sec), 1).otherwise(0)
    adj = summ.withColumn("__merged", merged).withColumn(
        "__adj", F.col("__n_local") - F.col("__merged")
    )
    offset = F.coalesce(
        F.sum("__adj").over(w_s.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    fixes = adj.withColumn("__offset", offset).select(user_col, "__slice", "__merged", "__offset")
    return (
        local.join(fixes, [user_col, "__slice"])
        .withColumn(
            "session_idx",
            (F.col("__offset") + F.col("__local_idx") - F.col("__merged")).cast("int"),
        )
        .drop("__tsn", "__slice", "__new", "__local_idx", "__merged", "__offset")
    )


def ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
    y_scale: int = 1,
) -> DataFrame:
    """(group_cols..., n, slope, intercept): per-group ordinary-least-
    squares line fit y = slope*x + intercept — the metric-trend monitor
    ("is this source's quality score drifting UP or DOWN, and how
    fast?") that pairs with the level-shift monitors (PSI/KS/MAD detect
    THAT a distribution moved; the trend says the direction and rate).

    Inputs must be INTEGER-valued columns (x: e.g. epoch days; y: e.g.
    fixed-point cents with ``y_scale`` = 100). The closed-form solution
        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2)
    is evaluated with every moment (Sx, Sy, Sxy, Sxx) an EXACT
    DECIMAL(38,0) sum — one map-side-combinable aggregate, |groups| rows
    out — and the numerator/denominator cast to float64 for ONE division
    each (y_scale folds into the denominator so outputs are in original
    y units). Two correctly-rounded ops per statistic, identical on any
    engine: the oracle replays slopes bit-exactly, the same convention
    as the KS statistic. Groups with a degenerate x spread (n*Sxx = Sx^2,
    all x equal) get NULL slope/intercept rather than a throw or an inf.

    Scale shape: the whole operator is one aggregate over the scan; no
    joins, no second pass, state is 5 numbers per group — trivially
    mergeable if maintained incrementally."""
    m = ols_moments(df, group_cols, x_col, y_col)
    return ols_from_moments(m, y_scale=y_scale)


def ols_moments(
    df: DataFrame,
    group_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
) -> DataFrame:
    """(group_cols..., n, sx, sy, sxy, sxx): the exact DECIMAL(38,0) OLS
    moment state — component-wise ADDITIVE, so shard/micro-batch states
    merge exactly (streaming/incremental.py::stream_ols_merge maintains
    this frame as 5 numbers per group forever)."""
    dec = "decimal(38,0)"
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast(dec)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast(dec)
    return (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast(dec).alias("sx"),
            F.sum(y).cast(dec).alias("sy"),
            F.sum(x * y).cast(dec).alias("sxy"),
            F.sum(x * x).cast(dec).alias("sxx"),
        )
    )


def merge_ols_moments(parts: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Component-wise addition of OLS moment states (exact)."""
    dec = "decimal(38,0)"
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        *[F.sum(c).cast(dec).alias(c) for c in ("sx", "sy", "sxy", "sxx")],
    )


def ols_from_moments(m: DataFrame, y_scale: int = 1) -> DataFrame:
    """The closed-form tail of :func:`ols_trend`, exposed so an
    externally maintained (e.g. stream-merged) moment state feeds the
    identical arithmetic."""
    dec = "decimal(38,0)"
    group_cols = [c for c in m.columns if c not in ("n", "sx", "sy", "sxy", "sxx")]
    nd = F.col("n").cast(dec)
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    icpt_num = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    den_s = (den * F.lit(int(y_scale)).cast(dec)).cast("double")
    return m.select(
        *group_cols,
        "n",
        F.when(den > 0, slope_num.cast("double") / den_s).alias("slope"),
        F.when(den > 0, icpt_num.cast("double") / den_s).alias("intercept"),
    )


def fill_gaps(
    observed: DataFrame,
    dims: DataFrame,
    bucket_col: str,
    lo,
    hi,
    step_expr: str = "INTERVAL 1 HOUR",
    fill: dict | None = None,
) -> DataFrame:
    """Dense time grid with gap filling — the ClickHouse ``ORDER BY ...
    WITH FILL FROM lo TO hi STEP step`` role (docs/vector-sql.md query
    shapes assume densified series), re-expressed relationally: generate
    the full bucket sequence once (``F.sequence`` on a single-row frame —
    no scan), cross the |dims|-row dimension frame (broadcast by size),
    left-join the observed aggregates on (dims..., bucket) and COALESCE
    the fill values in.

    ``observed``: aggregated frame keyed by dims' columns + ``bucket_col``;
    ``dims``: the distinct dimension combinations to densify (its columns
    define the join key with ``bucket_col``); ``lo``/``hi``: Column
    scalars or literals bounding the grid (inclusive); ``fill``: column →
    fill literal (unfilled columns stay NULL, the WITH FILL default).

    Scale shape: the grid is |dims| x |buckets| rows built from a 1-row
    sequence + a broadcast dim frame — the only corpus-sized work is the
    caller's aggregation; the grid join shuffles grid-sized (small)
    frames only when dims outgrow broadcast."""
    from pyspark.sql import functions as F

    spark = observed.sparkSession
    grid_row = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(lo) if not isinstance(lo, Column) else lo,
                       F.lit(hi) if not isinstance(hi, Column) else hi,
                       F.expr(step_expr))
        ).alias(bucket_col)
    )
    grid = dims.crossJoin(grid_row)
    out = grid.join(observed, [*dims.columns, bucket_col], "left")
    for c, v in (fill or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def locf(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    order_cols: list[str],
    out: str | None = None,
):
    """Last-observation-carried-forward over NULL gaps (the WITH FILL
    INTERPOLATE / sensor-backfill role): one window pass per key ordered
    by ``order_cols``, ``last(value, ignorenulls=True)`` over the
    unbounded-preceding frame. Leading NULLs (no prior observation) stay
    NULL. Returns ``df`` with the filled column appended as ``out``
    (default ``{value_col}_filled``).

    DuckDB twin: ``LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY ...
    ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)`` —
    a pure selection, so float values replay bit-exactly. Order cols
    must include a unique tiebreak or both engines' fills are
    tie-order-dependent. One shuffle on the key; the hot-key caveat and
    slice mitigation of the other window operators apply."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out or f"{value_col}_filled",
        F.last(value_col, ignorenulls=True).over(w),
    )
