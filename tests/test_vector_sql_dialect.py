"""Unit tests for the Vector SQL dialect pre-pass (string level — the
spark.sql execution path is covered by the registry queries)."""

from __future__ import annotations

import pytest

from chatdata_spark.functions.vector import hash_embed
from chatdata_spark.plans.vector_sql import (
    VectorSQLDialect,
    _split_args,
    replace_calls,
)

D = VectorSQLDialect(dim=8, array_columns=("words", "categories", "vector"))


def test_split_args_literal_aware():
    assert _split_args("a, f(b, c), 'x, y', [1, 2]") == ["a", "f(b, c)", "'x, y'", "[1, 2]"]


def test_replace_calls_nested():
    out = replace_calls("has(has(a, b), c)", "has", lambda a: f"AC({a[0]}|{a[1]})")
    assert out == "AC(AC(a|b)|c)"


def test_replace_calls_skips_string_literals():
    out = replace_calls("f(x) = 'f(y)'", "f", lambda a: f"g({a[0]})")
    assert out == "g(x) = 'f(y)'"


def test_replace_calls_escaped_quote_in_literal():
    """A backslash-escaped quote inside a literal must not desync the
    inside-a-string tracking: the f(y) inside the literal stays untouched,
    the real f(z) after it is still rewritten."""
    sql = r"SELECT 'it\'s f(y)' AS note, f(z)"
    out = replace_calls(sql, "f", lambda a: f"g({a[0]})")
    assert out == r"SELECT 'it\'s f(y)' AS note, g(z)"


def test_neural_array_splice_deterministic():
    out = D.translate("SELECT DISTANCE(vector, NeuralArray(hello world)) FROM t")
    v = hash_embed("hello world", 8)
    assert repr(float(v[0])) in out and "NeuralArray" not in out and "DISTANCE" not in out
    assert "zip_with" in out  # JVM-side expression, not a UDF


def test_prewhere_and_renames():
    out = D.translate(
        "SELECT id FROM t PREWHERE has(categories, 'cs.CV') AND length(categories) > 2 "
        "AND length(title) > 10 AND pubdate > parseDateTimeBestEffort('2018-02-01')"
    )
    assert "WHERE" in out and "PREWHERE" not in out
    assert "array_contains(categories, 'cs.CV')" in out
    assert "size(categories) > 2" in out  # array column → size
    assert "char_length(title) > 10" in out  # string column → char semantics
    assert "to_timestamp('2018-02-01')" in out


def test_order_by_alias_hoist():
    out = D.translate(
        "SELECT id, title FROM t ORDER BY DISTANCE(vector, [1.0, 0.0]) AS dist ASC LIMIT 4"
    )
    low = out.lower()
    assert " as dist, " in low.replace("\n", " ")  # hoisted into SELECT
    assert "order by dist" in low
    assert low.rstrip().endswith("limit 4")


def test_scalar_zero_arg_and_casts():
    out = D.translate("SELECT count(), toInt64(x), today(), now() FROM t")
    assert "count(*)" in out
    assert "CAST(x AS BIGINT)" in out
    assert "current_date()" in out and "current_timestamp()" in out


def test_array_map_arg_swap():
    out = D.translate("SELECT arrayMap(x -> trim(x), splitByChar(',', s)) FROM t")
    assert "transform(split(s, ','), x -> trim(x))" in out


def test_json_extract():
    out = D.translate("SELECT JSONExtractString(meta, 'title'), JSONExtractInt(meta, 'n') FROM t")
    assert "get_json_object(meta, '$.title')" in out
    assert "CAST(get_json_object(meta, '$.n') AS BIGINT)" in out


def test_select_list_rewrite():
    sql = "SELECT foo, bar, DISTANCE(vector, [1.0]) AS dist FROM t ORDER BY dist LIMIT 3"
    out = D.translate(sql, must_have_columns=["id", "title", "url"])
    head = out.split("FROM")[0]
    assert "foo" not in head and "id, title, url" in head and "AS dist" in head


def test_table_map():
    d2 = VectorSQLDialect(dim=8, table_map={"wiki.Wikipedia": "wiki_pedia"})
    out = d2.translate("SELECT id FROM wiki.Wikipedia")
    assert "FROM wiki_pedia" in out


def test_unbalanced_raises():
    with pytest.raises(ValueError):
        D.translate("SELECT has(a, b FROM t")


def test_date_and_conditional_renames():
    out = D.translate(
        "SELECT toYear(ts), toStartOfMonth(ts), multiIf(x > 1, 'a', x > 0, 'b', 'c'), intDiv(a, b) FROM t"
    )
    assert "year(ts)" in out
    assert "trunc(ts, 'month')" in out
    assert "(CASE WHEN x > 1 THEN 'a' WHEN x > 0 THEN 'b' ELSE 'c' END)" in out
    assert "(a div b)" in out


def test_r7_parity_renames_translate():
    out = D.translate(
        "SELECT arrayUniq(a), arrayFlatten(b), arrayAvg(c), trimBoth(s), "
        "rightPad(s, 8), multiSearchAny(s, kws) FROM t"
    )
    assert "size(array_distinct(a))" in out
    assert "flatten(b)" in out
    assert "aggregate(c, 0D, (acc, x) -> acc + CAST(x AS DOUBLE)) / size(c)" in out
    assert "trim(s)" in out
    assert "rpad(s, 8, ' ')" in out
    assert "exists(kws, x -> instr(s, x) > 0)" in out


def test_r7_array_difference_executes(spark):
    # semantic check, not just string rewrite: CH arrayDifference
    # [x1-x1, x2-x1, x3-x2]
    out = spark.sql(
        D.translate("SELECT arrayDifference(array(5, 9, 2)) AS d")
    ).collect()[0].d
    assert list(out) == [0, 4, -7]


def test_r7_datetime_renames_translate():
    out = D.translate(
        "SELECT toQuarter(ts), toDayOfWeek(ts), toStartOfWeek(ts), "
        "splitByString('ab', s) FROM t"
    )
    assert "quarter(ts)" in out
    assert "(((dayofweek(ts) + 5) % 7) + 1)" in out
    # default mode 0 = Sunday-start (ADVICE r7): +1day trunc −1day
    assert "(date_trunc('WEEK', (ts) + interval 1 day) - interval 1 day)" in out
    assert "split(s, concat('\\\\Q', 'ab', '\\\\E'))" in out


def test_to_start_of_week_modes():
    import pytest

    # explicit mode 1 = ISO Monday-start ≡ plain Spark WEEK truncation
    out1 = D.translate("SELECT toStartOfWeek(ts, 1) FROM t")
    assert "date_trunc('WEEK', ts)" in out1
    # explicit mode 0 ≡ the default
    out0 = D.translate("SELECT toStartOfWeek(ts, 0) FROM t")
    assert "interval 1 day" in out0
    # unsupported modes raise instead of silently dropping the argument
    with pytest.raises(ValueError, match="toStartOfWeek"):
        D.translate("SELECT toStartOfWeek(ts, 3) FROM t")


def test_to_start_of_week_sunday_semantics(spark):
    # 2024-01-10 is a Wednesday: Sunday-start week begins 2024-01-07,
    # ISO (mode 1) week begins Monday 2024-01-08.
    row = spark.sql(
        D.translate(
            "SELECT toStartOfWeek(CAST('2024-01-10 12:00:00' AS TIMESTAMP)) AS w0, "
            "toStartOfWeek(CAST('2024-01-10 12:00:00' AS TIMESTAMP), 1) AS w1"
        )
    ).collect()[0]
    assert str(row.w0) == "2024-01-07 00:00:00"
    assert str(row.w1) == "2024-01-08 00:00:00"
    # a Sunday is its own mode-0 week start
    row2 = spark.sql(
        D.translate(
            "SELECT toStartOfWeek(CAST('2024-01-07 23:59:59' AS TIMESTAMP)) AS w0"
        )
    ).collect()[0]
    assert str(row2.w0) == "2024-01-07 00:00:00"


def test_r8_sweep5_renames_translate():
    out = D.translate(
        "SELECT toYYYYMM(ts), toUnixTimestamp(ts), toMonday(ts), "
        "addDays(ts, 3), subtractHours(ts, 2), extractAll(s, '[0-9]+'), "
        "arrayEnumerate(xs), uniqExact(u), bitShiftLeft(i, 3), "
        "bitShiftRight(i, 2) FROM t"
    )
    assert "(year(ts) * 100 + month(ts))" in out
    assert "unix_timestamp(ts)" in out
    assert "to_date(date_trunc('WEEK', ts))" in out
    assert "timestampadd(DAY, 3, ts)" in out
    assert "timestampadd(HOUR, -(2), ts)" in out
    assert "regexp_extract_all(s, '[0-9]+', 0)" in out
    assert "sequence(1, size(xs))" in out
    assert "count(DISTINCT u)" in out
    assert "shiftleft(i, 3)" in out and "shiftright(i, 2)" in out


def test_r8_sweep5_executes(spark):
    # the compile-only renames (not in the parity query) execute end to end
    row = spark.sql(
        D.translate(
            "SELECT arrayEnumerate(splitByChar(',', 'a,b,c')) AS idx, "
            "uniqExact(x) AS u FROM (SELECT explode(sequence(1, 5)) AS x "
            "WHERE false OR true) GROUP BY 1"
        )
    ).collect()[0]
    assert list(row.idx) == [1, 2, 3] and row.u == 5
    row2 = spark.sql(
        D.translate(
            "SELECT toYYYYMMDD(CAST('2024-03-09 10:00:00' AS TIMESTAMP)) AS ymd, "
            "addHours(CAST('2024-03-09 23:30:00' AS TIMESTAMP), 1) AS nxt"
        )
    ).collect()[0]
    assert row2.ymd == 20240309 and str(row2.nxt) == "2024-03-10 00:30:00"


def test_r9_sweep6_renames_translate():
    out = D.translate(
        "SELECT minIf(v, c), maxIf(v, c), uniqExactIf(v, c), groupBitAnd(v), "
        "groupBitOr(v), groupBitXor(v), intDivOrZero(a, b - 1), "
        "moduloOrZero(a, b - 1), roundBankers(x, 2) FROM t"
    )
    assert "min(CASE WHEN c THEN v END)" in out
    assert "max(CASE WHEN c THEN v END)" in out
    assert "count(DISTINCT CASE WHEN c THEN v END)" in out
    assert "bit_and(v)" in out and "bit_or(v)" in out and "bit_xor(v)" in out
    # args must be re-parenthesized: `a div b - 1` would parse as
    # `(a div b) - 1` (the sweep6 first-replay bug)
    assert "(CASE WHEN (b - 1) = 0 THEN 0 ELSE (a) div (b - 1) END)" in out
    assert "(CASE WHEN (b - 1) = 0 THEN 0 ELSE (a) % (b - 1) END)" in out
    assert "bround(x, 2)" in out


def test_r9_sweep6_executes(spark):
    row = spark.sql(
        D.translate(
            "SELECT intDivOrZero(7, 0) AS d0, intDivOrZero(7, 2) AS d2, "
            "moduloOrZero(7, 0) AS m0, moduloOrZero(7, 3) AS m3, "
            "roundBankers(2.5, 0) AS rb, roundBankers(3.5, 0) AS rb2"
        )
    ).collect()[0]
    assert (row.d0, row.d2, row.m0, row.m3) == (0, 3, 0, 1)
    # half-even: 2.5 -> 2, 3.5 -> 4
    assert (row.rb, row.rb2) == (2.0, 4.0)


def test_r9_sweep7_format_date_time_translation():
    out = D.translate("SELECT formatDateTime(ts, '%Y-%m-%dT%H:%i:%S') FROM t")
    # literal letter T: Java-quoted in the pattern, then SQL-escaped when
    # spliced back into SQL text (raw 'T' made the emitted SQL unparseable)
    assert "date_format(ts, 'yyyy-MM-dd''T''HH:mm:ss')" in out
    # consecutive literal letters group into ONE quoted run ('hrs', not
    # 'h''r''s' — which java.time reads as h, ', r, ', s)
    out2 = D.translate("SELECT formatDateTime(ts, '%H hrs') FROM t")
    assert "date_format(ts, 'HH ''hrs''')" in out2
    # a literal quote in the body (SQL-escaped '') survives as the
    # java.time literal-quote, SQL-escaped: 4 quotes in the emitted text
    out3 = D.translate("SELECT formatDateTime(ts, 'o''clock %H') FROM t")
    assert "date_format(ts, '''o''''clock'' HH')" in out3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported format code %M"):
        D.translate("SELECT formatDateTime(ts, '%H:%M') FROM t")
    # %e dropped (ADVICE r9): CH space-pads day-of-month, Java does not
    with _pytest.raises(ValueError, match="unsupported format code %e"):
        D.translate("SELECT formatDateTime(ts, '%e') FROM t")
    with _pytest.raises(ValueError, match="unsupported format code %Q"):
        D.translate("SELECT formatDateTime(ts, '%Q') FROM t")
    with _pytest.raises(ValueError, match="literal format strings"):
        D.translate("SELECT formatDateTime(ts, fmtcol) FROM t")


def test_r9_sweep7_executes(spark):
    row = spark.sql(
        D.translate(
            "SELECT formatDateTime(CAST('2024-03-09 10:05:06' AS TIMESTAMP), "
            "'%F %H:%i:%S') AS s, "
            "toISOWeek(CAST('2021-01-01' AS TIMESTAMP)) AS w, "
            "toISOYear(CAST('2021-01-01' AS TIMESTAMP)) AS y, "
            "countMatches('a1b22c333', '[0-9]+') AS m, "
            "concatWithSeparator('-', 'a', 'b', 'c') AS t"
        )
    ).collect()[0]
    assert row.s == "2024-03-09 10:05:06"
    # 2021-01-01 is ISO week 53 of ISO year 2020
    assert (row.w, row.y) == (53, 2020)
    assert row.m == 3 and row.t == "a-b-c"
    # literal letters and embedded quotes must EXECUTE, not just
    # translate (the raw-quote emission parsed as containment-test-green
    # but was unparseable SQL for any alpha literal)
    row2 = spark.sql(
        D.translate(
            "SELECT formatDateTime(CAST('2024-03-09 10:05:06' AS TIMESTAMP), "
            "'%Y-%m-%dT%H:%i:%S') AS iso, "
            "formatDateTime(CAST('2024-03-09 10:05:06' AS TIMESTAMP), "
            "'%H hrs') AS hrs, "
            "formatDateTime(CAST('2024-03-09 10:05:06' AS TIMESTAMP), "
            "'o''clock %H') AS oc"
        )
    ).collect()[0]
    assert row2.iso == "2024-03-09T10:05:06"
    assert row2.hrs == "10 hrs"
    assert row2.oc == "o'clock 10"


def test_r10_sweep8_translations_execute(spark):
    """Sweep #8 renames: executed values pinned (translation-only
    containment checks miss unparseable emissions — the formatDateTime
    lesson)."""
    row = spark.sql(
        D.translate(
            "SELECT toInt32(bitCount(11)) AS b, "
            "toString(toLastDayOfMonth(toDateTime('2024-02-05 08:00:00'))) AS eom, "
            "toString(toStartOfFifteenMinutes(toDateTime('2024-03-09 10:17:33'))) AS q15, "
            "toString(toStartOfFiveMinutes(toDateTime('2024-03-09 10:17:33'))) AS q5m, "
            "substringUTF8('purchase', 2, 3) AS sub3, "
            "reverseUTF8('click') AS rev, "
            "base64Decode(base64Encode('click')) AS rt, "
            "countSubstrings('banana', 'an') AS n, "
            "arrayStringConcat(arrayCumSum(arrayPushBack(arrayPopBack("
            "arrayEnumerate(splitByChar('-', 'a-b-c'))), 9)), ',') AS cs, "
            "arrayStringConcat(arrayCompact(arrayMap(x -> intDiv(x, 2), "
            "arrayEnumerate(splitByChar('-', 'a-b-c-d')))), ',') AS cp, "
            "arrayStringConcat(arrayResize(arrayPopFront("
            "arrayEnumerate(splitByChar('-', 'a-b-c'))), 4, 7), ',') AS rz, "
            "arrayStringConcat(arrayPushFront(arrayEnumerate("
            "splitByChar('-', 'a-b')), 0), ',') AS pf"
        )
    ).collect()[0]
    assert row.b == 3  # 11 = 0b1011
    assert row.eom == "2024-02-29"  # leap year
    assert (row.q15, row.q5m) == ("2024-03-09 10:15:00", "2024-03-09 10:15:00")
    assert (row.sub3, row.rev, row.rt) == ("urc", "kcilc", "click")
    assert row.n == 2  # non-overlapping
    assert row.cs == "1,3,12"  # cumsum of [1,2,9]
    assert row.cp == "0,1,2"  # compact of [0,1,1,2]
    assert row.rz == "2,3,7,7"  # resize([2,3], 4, fill 7)
    assert row.pf == "0,1,2"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="3-arg"):
        D.translate("SELECT arrayResize(xs, 4) FROM t")


def test_quarter_hour_buckets_floor_pre_1970(spark):
    """div truncates toward zero, so pre-1970 epochs bucketed to the
    boundary AFTER the value (r10 ADVICE); pmod floors for negative
    epochs too. 1969-12-31 23:50:00 UTC = epoch -600."""
    out = D.translate(
        "SELECT toString(toStartOfFifteenMinutes(ts)) AS q15, "
        "toString(toStartOfFiveMinutes(ts)) AS q5m"
    )
    row = spark.sql(
        out + " FROM (SELECT timestamp_seconds(-600) AS ts)"
    ).collect()[0]
    assert row.q15 == "1969-12-31 23:45:00"  # floor, not 1970-01-01 00:00
    assert row.q5m == "1969-12-31 23:50:00"
    # post-1970 behavior unchanged
    row = spark.sql(
        out + " FROM (SELECT timestamp_seconds(1000) AS ts)"
    ).collect()[0]
    assert row.q15 == "1970-01-01 00:15:00"
    assert row.q5m == "1970-01-01 00:15:00"


def test_count_substrings_empty_needle_returns_zero(spark):
    """An empty needle must yield CH's defined 0, not throw ANSI
    DIVIDE_BY_ZERO mid-query (r10 ADVICE)."""
    out = D.translate(
        "SELECT countSubstrings('banana', '') AS z, "
        "countSubstrings('banana', 'an') AS n, "
        "countSubstrings('aaaa', 'aa') AS v"
    )
    row = spark.sql(out).collect()[0]
    assert (row.z, row.n, row.v) == (0, 2, 2)  # non-overlapping count


def test_array_compact_row_level_references(spark):
    """arrayCompact drops CONSECUTIVE duplicates (null-safe); the
    translation must reference the array argument only at row level
    (three slices), never inside a per-element lambda — the O(n^2)
    expression-inlining trap (r10 ADVICE)."""
    out = D.translate("SELECT arrayCompact(xs) AS c")
    # no per-element re-splice of the argument inside a lambda
    assert "try_element_at" not in out
    rows = spark.sql(
        out
        + " FROM VALUES (array(1,1,2,2,2,3,1)), (array(1)), "
        "(CAST(array() AS ARRAY<INT>)), (array(NULL, NULL, 1, NULL)) AS t(xs)"
    ).collect()
    assert [r.c for r in rows] == [[1, 2, 3, 1], [1], [], [None, 1, None]]


def test_r11_sweep10_edge_cases(spark):
    """Sweep #10's sharp edges: range's empty-case guard (Spark
    sequence(0, -1) would emit a DESCENDING [0, -1]), roundToExp2's
    bin()-length power-of-two with the x < 1 floor, roundDown's
    below-all -> array-min rule, arrayFirst/Last/FirstIndex no-match
    behavior, and the NaN-literal-equality predicates (the
    case-insensitive replace_calls self-match lesson: the translation
    must not emit isnan())."""
    out = D.translate(
        "SELECT arrayStringConcat(arrayMap(x -> toString(x), range(n)), ',') AS r, "
        "roundToExp2(n) AS e, "
        "roundDown(n, array(10, 20)) AS d, "
        "arrayFirst(x -> x > 99, array(1, 2)) AS af, "
        "arrayLast(x -> x > 99, array(1, 2)) AS al, "
        "arrayFirstIndex(x -> x > 99, array(1, 2)) AS ai, "
        "isNaN(toFloat64(n)) AS nn"
    )
    assert "isnan(" not in out.lower().replace("= double('nan')", "")
    rows = spark.sql(
        out + " FROM VALUES (0), (1), (5), (48) AS t(n)"
    ).collect()
    by_n = {r.e if r.e != 0 else 0: r for r in rows}
    got = {n: (r.r, r.e, r.d) for n, r in
           [(0, rows[0]), (1, rows[1]), (5, rows[2]), (48, rows[3])]}
    assert got[0] == ("", 0, 10)        # empty range; below-all -> min
    assert got[1] == ("0", 1, 10)
    assert got[5] == ("0,1,2,3,4", 4, 10)
    assert got[48] == (",".join(map(str, range(48))), 32, 20)
    assert rows[0].af is None and rows[0].al is None and rows[0].ai == 0
    assert rows[0].nn is False


def test_r11_sweep10_round_buckets(spark):
    """roundAge / roundDuration replicate the documented CH bucket
    tables exactly (CASE chains, pure integers)."""
    out = D.translate(
        "SELECT roundAge(a) AS ra, roundDuration(a) AS rd"
    )
    rows = spark.sql(
        out + " FROM VALUES (0), (1), (17), (18), (24), (25), (34), (35), "
        "(44), (45), (54), (55), (90), (9), (10), (29), (30), (59), (60), "
        "(36000), (99999) AS t(a)"
    ).collect()
    ages = [r.ra for r in rows]
    durs = [r.rd for r in rows]
    assert ages == [0, 17, 17, 18, 18, 25, 25, 35, 35, 45, 45, 55, 55,
                    17, 17, 25, 25, 55, 55, 55, 55]
    assert durs == [0, 1, 10, 10, 10, 10, 30, 30, 30, 30, 30, 30, 60,
                    1, 10, 10, 30, 30, 60, 36000, 36000]
