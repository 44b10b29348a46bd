"""Driver queries for the mutation conventions (SURVEY §2.8 M1/M2/M4),
expressed over the read-only driver tables by constructing the mutation
inputs in-query (the store layer itself is exercised in tests/test_stores.py
since driver queries must not write)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.catalog import load_events
from chatdata_spark.operators.upsert import delete_where, update_where, upsert
from chatdata_spark.registry import query


@query(
    "mutation_upsert_keep_latest",
    oracle="""
    WITH updates AS (
        SELECT event_id, ts + INTERVAL 1000 SECOND AS ts, user_id, event_type,
               value * 2.0 AS value, props
        FROM events WHERE event_id % 7 = 0
    ),
    unioned AS (
        SELECT event_id, ts, user_id, event_type, value, props FROM events
        UNION ALL SELECT * FROM updates
    )
    SELECT event_id, CAST(value AS DOUBLE) AS value FROM unioned
    QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) = 1
    ORDER BY event_id
    """,
)
def mutation_upsert_keep_latest(spark, sf_dir):
    """M1 eager upsert: re-insert 1/7 of events with later ts and doubled
    value — keep-latest must surface exactly the updated rows."""
    e = load_events(spark, sf_dir).select("event_id", "ts", "user_id", "event_type", "value", "props")
    updates = e.filter(F.col("event_id") % 7 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1000 SECOND")).alias("ts"),
        "user_id",
        "event_type",
        (F.col("value") * 2.0).alias("value"),
        "props",
    )
    return (
        upsert(e, updates, ["event_id"], "ts")
        .select("event_id", F.col("value").cast("double").alias("value"))
        .orderBy("event_id")
    )


@query(
    "mutation_delete_anti",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events
    WHERE NOT (event_type = 'error' OR (user_id % 10 = 3 AND value < 5.0))
    GROUP BY event_type ORDER BY event_type
    """,
)
def mutation_delete_anti(spark, sf_dir):
    """M2 delete-as-anti-filter with a compound predicate."""
    e = load_events(spark, sf_dir)
    cond = (F.col("event_type") == "error") | ((F.col("user_id") % 10 == 3) & (F.col("value") < 5.0))
    return (
        delete_where(e, cond)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "scd2_history_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER w AS rn,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, event_id, ts AS valid_from
        FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, event_id, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           (lead(valid_from) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
)
def scd2_history_events(spark, sf_dir):
    """SCD2 history build: the events changelog compressed into
    [valid_from, valid_to) validity intervals per user (consecutive
    same-event_type rows collapse; the open interval is is_current).
    Incremental merge ≡ this full rebuild is pinned in tests/test_scd.py."""
    from chatdata_spark.operators.scd import scd2_from_changelog

    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    return scd2_from_changelog(
        e, ["user_id"], "ts", ["event_type"], order_cols=["event_id"]
    ).orderBy("user_id", "valid_from", "event_id")


@query(
    "mutation_update_conditional",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000.0 THEN '0-URGENT' ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def mutation_update_conditional(spark, sf_dir):
    """M4 UPDATE ... SET ... WHERE as conditional projection
    (session_manager.py:70-78 shape)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    updated = update_where(
        o, F.col("o_totalprice") > 300000.0, {"o_orderpriority": F.lit("0-URGENT")}
    )
    return updated.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).orderBy("o_orderpriority")


@query(
    "merge_into_orders",
    oracle="""
    WITH src AS (
        SELECT o_orderkey, o_totalprice + 1000.0 AS new_price FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 50000.0 FROM orders WHERE o_orderkey % 7 = 0
    ),
    merged AS (
        SELECT t.o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.new_price ELSE t.o_totalprice END AS price
        FROM orders t LEFT JOIN src s USING (o_orderkey)
        WHERE NOT (s.o_orderkey IS NOT NULL AND t.o_orderstatus = 'F' AND t.o_orderkey % 15 = 0)
        UNION ALL
        SELECT 'N' AS o_orderstatus, s.new_price AS price
        FROM src s LEFT JOIN orders t USING (o_orderkey) WHERE t.o_orderkey IS NULL
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def merge_into_orders(spark, sf_dir):
    """Full MERGE INTO in one transform (operators/upsert.py::merge_into):
    matched-update (+1000 price on keys %5), matched-delete ('F' rows on
    keys %15), and not-matched-insert (synthetic +10M keys) — one
    full-outer shuffle, Delta/Iceberg MERGE semantics on plain parquet."""
    from chatdata_spark.operators.upsert import merge_into

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderstatus",
    )
    ins = o.filter(F.col("o_orderkey") % 7 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.lit(50000.0).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    merged = merge_into(
        o,
        upd.unionByName(ins),
        ["o_orderkey"],
        when_matched_update={"o_totalprice": F.col("__src_o_totalprice")},
        when_matched_delete=(F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 15 == 0),
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "scd2_asof_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER w AS rn,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_type, event_id, ts AS valid_from
        FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    ),
    hist AS (
        SELECT user_id, event_type, event_id, valid_from,
               lead(valid_from) OVER w2 AS valid_to
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    )
    SELECT user_id, event_type, event_id, valid_from
    FROM hist
    WHERE valid_from <= TIMESTAMP '2024-01-16 00:00:00'
      AND (valid_to IS NULL OR TIMESTAMP '2024-01-16 00:00:00' < valid_to)
    ORDER BY user_id
    """,
)
def scd2_asof_events(spark, sf_dir):
    """Point-in-time dimension read (`AS OF` / time-travel-by-VALIDITY,
    the query-side payoff of SCD2): each user's event_type version valid
    at mid-month — a PURE FILTER over the history table
    (operators/scd.py::as_of — valid_from <= T < valid_to, no shuffle,
    no window at read time; with history stored partitioned/sorted by
    key the predicate pushes to the scan). Exactly one row per user that
    has history at T, pinned by the oracle's replayed interval build."""
    from chatdata_spark.operators.scd import as_of, scd2_from_changelog

    from chatdata_spark.queries.quality import _PSI_SPLIT

    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    hist = scd2_from_changelog(
        e, ["user_id"], "ts", ["event_type"], order_cols=["event_id"]
    )
    return (
        as_of(hist, F.lit(_PSI_SPLIT).cast("timestamp"))
        .select("user_id", "event_type", "event_id", "valid_from")
        .orderBy("user_id")
    )
