"""Driver query for the data-quality validation family: row rules in one
aggregation pass + uniqueness + referential integrity, unioned into one
violations report (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.operators.quality import (
    quality_report,
    referential_violations,
    row_rule_violations,
    uniqueness_violations,
)
from chatdata_spark.registry import query


@query(
    "data_quality_report",
    oracle="""
    SELECT * FROM (
        -- CAST ... AS BIGINT: DuckDB types SUM(CASE...) as HUGEINT, which
        -- pandas materializes as float64 -> driver hash mismatch vs Spark's
        -- bigint (the only red row of round 4). COUNT branches are BIGINT
        -- already; pin the SUM branches too.
        SELECT 'li_quantity_range' AS rule,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'li_discount_range',
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.06 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'li_shipdate_null', CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'doc_text_too_short', CAST(SUM(CASE WHEN n_chars < 120 THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'unique_o_orderkey', COUNT(*) - COUNT(DISTINCT CAST(o_orderkey AS VARCHAR))
        FROM orders
        UNION ALL
        SELECT 'ref_l_orderkey_in_o_orderkey', COUNT(*)
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ) ORDER BY rule
    """,
)
def data_quality_report(spark, sf_dir):
    """Expectations-style validation: 4 row rules compiled into ONE scan
    each per table (sum-of-CASE partial aggregation), a key-uniqueness
    check, and a referential orphan count — unioned into a long-format
    (rule, n_violations) report. The range rules fire on real rows; the
    integrity rules prove zero on this dataset."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = [
        row_rule_violations(
            li,
            {
                "li_quantity_range": (F.col("l_quantity") < 1) | (F.col("l_quantity") > 45),
                "li_discount_range": (F.col("l_discount") < 0) | (F.col("l_discount") > 0.06),
                "li_shipdate_null": F.col("l_shipdate").isNull(),
            },
        ),
        row_rule_violations(d, {"doc_text_too_short": F.col("n_chars") < 120}),
        uniqueness_violations(o, ["o_orderkey"]),
        referential_violations(li, o, "l_orderkey", "o_orderkey"),
    ]
    return quality_report(parts).orderBy("rule")


@query(
    "profile_orders_stats",
    oracle="""
    SELECT * FROM (
        SELECT 'o_custkey' AS "column", COUNT(*) AS n,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_null,
               COUNT(DISTINCT o_custkey) AS n_distinct,
               CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
               CAST(MAX(o_custkey) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_orderkey', COUNT(*),
               COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END),
               COUNT(DISTINCT o_orderkey),
               CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE),
               NULL, NULL
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*),
               COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
               COUNT(DISTINCT o_orderpriority),
               NULL, NULL, MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
               COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
               COUNT(DISTINCT o_orderstatus),
               NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', COUNT(*),
               COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END),
               COUNT(DISTINCT o_totalprice),
               CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE),
               NULL, NULL
        FROM orders
    ) ORDER BY "column"
    """,
)
def profile_orders_stats(spark, sf_dir):
    """ANALYZE-style column statistics in one aggregation pass
    (operators/profile.py): counts/nulls/exact distincts plus typed
    min/max for five orders columns. The oracle is five separate scans
    stitched with UNION ALL — same numbers, quadratic the scans; the
    operator's one-Expand single pass is the scale shape."""
    from chatdata_spark.operators.profile import profile_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return profile_table(
        o, ["o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"]
    )


@query(
    "anomaly_mad_event_values",
    oracle="""
    -- window-only formulation mirroring the Spark plan (one pass, no
    -- join-back): PARTITION BY keeps a NULL group in both engines, where
    -- a USING join would silently drop it on fixture regeneration.
    WITH r AS (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT event_type, event_id, value,
               MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END)
                   OVER (PARTITION BY event_type) AS med
        FROM r
    ),
    d AS (
        SELECT event_type, event_id, med, ABS(value - med) AS dv FROM m
    ),
    r2 AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv, event_id) AS rn2,
               COUNT(*) OVER (PARTITION BY event_type) AS n2
        FROM d
    ),
    m2 AS (
        SELECT event_type, med, dv,
               MAX(CASE WHEN rn2 = CAST(CEIL(0.5 * n2) AS BIGINT) THEN dv END)
                   OVER (PARTITION BY event_type) AS mad
        FROM r2
    )
    SELECT event_type, MAX(med) AS med, MAX(mad) AS mad,
           CAST(SUM(CASE WHEN dv > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           COUNT(*) AS n_rows
    FROM m2 GROUP BY event_type ORDER BY event_type
    """,
)
def anomaly_mad_event_values(spark, sf_dir):
    """Robust per-type outlier monitor over event values: exact discrete
    median + MAD, flag |v - med| > 3*MAD, one summary row per event_type
    (operators/anomaly.py::mad_outlier_summary — the exact path; the
    approx percentile_approx path is the few-huge-groups scale escape).
    Both medians are data elements and the deviation/threshold arithmetic
    uses identical float64 operand order, so DuckDB replicates the index
    math bit-for-bit."""
    from chatdata_spark.catalog import load_events
    from chatdata_spark.operators.anomaly import mad_outlier_summary

    e = load_events(spark, sf_dir)
    return mad_outlier_summary(
        e, ["event_type"], "value", tie_cols=["event_id"], k=3.0, exact=True
    ).orderBy("event_type")


_PSI_SPLIT = "2024-01-16 00:00:00"
_PSI_BINS = 10


def _psi_oracle() -> str:
    """Lazy oracle for drift_psi_event_values: bin edges come from the
    SAME pure-Python fixed_bin_edges over the reference snapshot's exact
    min/max (fetched via DuckDB — min/max are data elements, identical in
    both engines) and are inlined as float literals, per the CLAUDE.md
    bucket-boundary convention. Proportions and (p-q)*ln(p/q) replicate
    the Spark operation order; the total row sums the rounded terms
    through DECIMAL(18,6) exactly."""
    import duckdb

    from chatdata_spark.catalog import oracle_sf_dir
    from chatdata_spark.operators.drift import fixed_bin_edges

    lo, hi = duckdb.sql(
        f"SELECT min(value), max(value) FROM read_parquet('{oracle_sf_dir()}/events.parquet') "
        f"WHERE ts < TIMESTAMP '{_PSI_SPLIT}' AND value IS NOT NULL"
    ).fetchall()[0]
    edges = fixed_bin_edges(lo, hi, _PSI_BINS)
    whens = " ".join(f"WHEN value < {e!r} THEN {i}" for i, e in enumerate(edges))
    bin_sql = f"CAST(CASE {whens} ELSE {len(edges)} END AS BIGINT)"
    b = float(len(edges) + 1)
    return f"""
    WITH r AS (
        SELECT {bin_sql} AS bin, COUNT(*) AS n_ref
        FROM events WHERE ts < TIMESTAMP '{_PSI_SPLIT}' AND value IS NOT NULL
        GROUP BY 1
    ),
    c AS (
        SELECT {bin_sql} AS bin, COUNT(*) AS n_cur
        FROM events WHERE ts >= TIMESTAMP '{_PSI_SPLIT}' AND value IS NOT NULL
        GROUP BY 1
    ),
    base AS (
        SELECT COALESCE(r.bin, c.bin) AS bin,
               COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        FROM r FULL OUTER JOIN c ON r.bin = c.bin
    ),
    tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM base),
    per_bin AS (
        SELECT bin, n_ref, n_cur,
               ROUND(((CAST(n_ref AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + {b!r})
                      - (CAST(n_cur AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + {b!r}))
                     * ln(((CAST(n_ref AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + {b!r}))
                          / ((CAST(n_cur AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + {b!r}))), 6)
                   AS psi_term
        FROM base CROSS JOIN tot
    )
    SELECT * FROM (
        SELECT bin, n_ref, n_cur, psi_term FROM per_bin
        UNION ALL
        SELECT CAST(-1 AS BIGINT), CAST(SUM(n_ref) AS BIGINT), CAST(SUM(n_cur) AS BIGINT),
               CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE)
        FROM per_bin
    ) ORDER BY bin
    """


@query("drift_psi_event_values", oracle=_psi_oracle)
def drift_psi_event_values(spark, sf_dir):
    """Population Stability Index between the first and second half-month
    of event values (operators/drift.py::psi_report): the corpus-drift
    monitor a training pipeline runs against its validated reference
    snapshot. One map-side-combined histogram per snapshot, a |bins|-row
    merge, JVM psi terms, exact-decimal total."""
    from chatdata_spark.catalog import load_events
    from chatdata_spark.operators.drift import psi_report

    e = load_events(spark, sf_dir)
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    ref = e.filter(F.col("ts") < split)
    cur = e.filter(F.col("ts") >= split)
    return psi_report(ref, cur, "value", n_bins=_PSI_BINS)


_PSI_REF_SOURCES = [f"src{i}" for i in range(10)]


def _psi_lang_oracle() -> str:
    """Lazy oracle for drift_psi_lang_mix: replicates psi_categorical's
    arithmetic with the smoothing addend (the observed category-set size)
    computed via DuckDB and inlined — same p/q/ln operation order, same
    DECIMAL(18,6)-exact total."""
    import duckdb

    from chatdata_spark.catalog import oracle_sf_dir

    refs = ", ".join(f"'{s}'" for s in _PSI_REF_SOURCES)
    # Same predicate as the operator default (categories present in
    # ref∪cur): rows with NULL source belong to NEITHER snapshot (`source
    # NOT IN (...)` is NULL-excluded in both engines), so a lang confined
    # to NULL-source rows must not inflate the smoothing denominator.
    n_smooth = duckdb.sql(
        f"SELECT COUNT(DISTINCT lang) FROM read_parquet('{oracle_sf_dir()}/documents.parquet') "
        "WHERE lang IS NOT NULL AND source IS NOT NULL"
    ).fetchall()[0][0]
    b = float(n_smooth)
    return f"""
    WITH r AS (
        SELECT lang AS category, COUNT(*) AS n_ref FROM documents
        WHERE lang IS NOT NULL AND source IN ({refs}) GROUP BY 1
    ),
    c AS (
        SELECT lang AS category, COUNT(*) AS n_cur FROM documents
        WHERE lang IS NOT NULL AND source NOT IN ({refs}) GROUP BY 1
    ),
    base AS (
        SELECT COALESCE(r.category, c.category) AS category,
               COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        FROM r FULL OUTER JOIN c ON r.category = c.category
    ),
    tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM base),
    per_cat AS (
        SELECT category, n_ref, n_cur,
               ROUND(((CAST(n_ref AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + {b!r})
                      - (CAST(n_cur AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + {b!r}))
                     * ln(((CAST(n_ref AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + {b!r}))
                          / ((CAST(n_cur AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + {b!r}))), 6)
                   AS psi_term
        FROM base CROSS JOIN tot
    )
    SELECT * FROM (
        SELECT category, n_ref, n_cur, psi_term FROM per_cat
        UNION ALL
        SELECT CAST(NULL AS VARCHAR), CAST(SUM(n_ref) AS BIGINT), CAST(SUM(n_cur) AS BIGINT),
               CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE)
        FROM per_cat
    ) ORDER BY category ASC NULLS LAST
    """


@query("drift_psi_lang_mix", oracle=_psi_lang_oracle)
def drift_psi_lang_mix(spark, sf_dir):
    """Categorical PSI (operators/drift.py::psi_categorical): language-mix
    drift between two source groups — the corpus-composition check a
    multilingual pipeline runs per crawl shard (a language whose share
    moves shows up as its smoothed (p-q)*ln(p/q) term). Exact category
    keys replace numeric binning; everything else is the numeric path's
    arithmetic."""
    from chatdata_spark.operators.drift import psi_categorical

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = d.filter(F.col("source").isin(_PSI_REF_SOURCES))
    cur = d.filter(~F.col("source").isin(_PSI_REF_SOURCES))
    return psi_categorical(ref, cur, "lang")


def _health_oracle() -> str:
    """Lazy oracle for corpus_health_report: the four component oracles
    (each already independently driver-verified) composed as subqueries
    and reshaped into the same long-format (check, value) report — so
    this verifies the COMPOSITION, not new arithmetic."""
    psi_v = _psi_oracle()
    psi_l = _psi_lang_oracle()
    return f"""
    SELECT * FROM (
        SELECT 'quality:' || rule AS "check", CAST(n_violations AS DOUBLE) AS value
        FROM (
            SELECT 'li_quantity_range' AS rule,
                   CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM lineitem
            UNION ALL
            SELECT 'doc_text_too_short', CAST(SUM(CASE WHEN n_chars < 120 THEN 1 ELSE 0 END) AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'ref_l_orderkey_in_o_orderkey', COUNT(*)
            FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        )
        UNION ALL
        SELECT 'anomaly_outliers:' || event_type, CAST(n_outliers AS DOUBLE)
        FROM (
            WITH r AS (
                SELECT event_type, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM events WHERE value IS NOT NULL
            ),
            m AS (
                SELECT event_type, event_id, value,
                       MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END)
                           OVER (PARTITION BY event_type) AS med
                FROM r
            ),
            d AS (SELECT event_type, event_id, med, ABS(value - med) AS dv FROM m),
            r2 AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv, event_id) AS rn2,
                       COUNT(*) OVER (PARTITION BY event_type) AS n2
                FROM d
            ),
            m2 AS (
                SELECT event_type, dv,
                       MAX(CASE WHEN rn2 = CAST(CEIL(0.5 * n2) AS BIGINT) THEN dv END)
                           OVER (PARTITION BY event_type) AS mad
                FROM r2
            )
            SELECT event_type,
                   CAST(SUM(CASE WHEN dv > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM m2 GROUP BY event_type
        )
        UNION ALL
        SELECT 'drift_psi:event_value', value FROM (
            SELECT psi_term AS value FROM ({psi_v}) WHERE bin = -1
        )
        UNION ALL
        SELECT 'drift_psi:lang_mix', value FROM (
            SELECT psi_term AS value FROM ({psi_l}) WHERE category IS NULL
        )
    ) ORDER BY "check"
    """


@query("corpus_health_report", oracle=_health_oracle)
def corpus_health_report(spark, sf_dir):
    """The monitoring family composed: ONE long-format (check, value)
    corpus-health report unioning declarative quality rules, per-type
    MAD outlier counts, numeric value drift, and language-mix drift —
    what a 100 TB pipeline materializes per snapshot to alert on. Every
    component is an independently driver-verified query; this verifies
    they compose (consistent schema, one union, no recomputation tricks).
    Scale shape: each branch keeps its own single-scan design; the union
    is |checks| rows."""
    from chatdata_spark.catalog import load_events
    from chatdata_spark.operators.anomaly import mad_outlier_summary
    from chatdata_spark.operators.drift import psi_categorical, psi_report
    from chatdata_spark.operators.quality import (
        quality_report,
        referential_violations,
        row_rule_violations,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = load_events(spark, sf_dir)

    rules = quality_report(
        [
            row_rule_violations(
                li,
                {"li_quantity_range": (F.col("l_quantity") < 1) | (F.col("l_quantity") > 45)},
            ),
            row_rule_violations(d, {"doc_text_too_short": F.col("n_chars") < 120}),
            referential_violations(li, o, "l_orderkey", "o_orderkey"),
        ]
    ).select(
        F.concat(F.lit("quality:"), F.col("rule")).alias("check"),
        F.col("n_violations").cast("double").alias("value"),
    )

    outliers = mad_outlier_summary(
        e, ["event_type"], "value", tie_cols=["event_id"], k=3.0
    ).select(
        F.concat(F.lit("anomaly_outliers:"), F.col("event_type")).alias("check"),
        F.col("n_outliers").cast("double").alias("value"),
    )

    split = F.lit(_PSI_SPLIT).cast("timestamp")
    psi_v = (
        psi_report(e.filter(F.col("ts") < split), e.filter(F.col("ts") >= split),
                   "value", n_bins=_PSI_BINS)
        .filter(F.col("bin") == -1)
        .select(F.lit("drift_psi:event_value").alias("check"),
                F.col("psi_term").alias("value"))
    )
    psi_l = (
        psi_categorical(
            d.filter(F.col("source").isin(_PSI_REF_SOURCES)),
            d.filter(~F.col("source").isin(_PSI_REF_SOURCES)),
            "lang",
        )
        .filter(F.col("category").isNull())
        .select(F.lit("drift_psi:lang_mix").alias("check"),
                F.col("psi_term").alias("value"))
    )
    return rules.unionByName(outliers).unionByName(psi_v).unionByName(psi_l).orderBy("check")


@query(
    "drift_ks_event_values",
    oracle=f"""
    WITH r AS (
        SELECT value AS v, event_id AS k2,
               CAST(('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        FROM events
        WHERE ts < TIMESTAMP '{_PSI_SPLIT}' AND value IS NOT NULL AND event_id IS NOT NULL
    ),
    c AS (
        SELECT value AS v, event_id AS k2,
               CAST(('0x' || substr(md5('ks' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        FROM events
        WHERE ts >= TIMESTAMP '{_PSI_SPLIT}' AND value IS NOT NULL AND event_id IS NOT NULL
    ),
    rs AS (SELECT v FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY h, k2) AS rn FROM r) WHERE rn <= 256),
    cs AS (SELECT v FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY h, k2) AS rn FROM c) WHERE rn <= 256),
    u AS (
        SELECT v, 1 AS nr, 0 AS nc FROM rs
        UNION ALL
        SELECT v, 0 AS nr, 1 AS nc FROM cs
    ),
    pv AS (SELECT v, SUM(nr) AS nr, SUM(nc) AS nc FROM u GROUP BY v),
    cum AS (
        SELECT SUM(nr) OVER (ORDER BY v) AS cr, SUM(nc) OVER (ORDER BY v) AS cc,
               SUM(nr) OVER () AS tr, SUM(nc) OVER () AS tc
        FROM pv
    )
    SELECT CAST(MAX(tr) AS BIGINT) AS n_ref, CAST(MAX(tc) AS BIGINT) AS n_cur,
           CAST(MAX(ABS(cr * tc - cc * tr)) AS DOUBLE)
               / CAST(MAX(tr) * MAX(tc) AS DOUBLE) AS ks_stat
    FROM cum
    """,
)
def drift_ks_event_values(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift between the first and second
    half-month of event values, over deterministic bottom-256-by-hash
    samples (operators/quantsketch.py::ks_drift) — the binning-free
    complement to drift_psi_event_values: PSI with frozen bins misses a
    shift confined inside one bin; KS compares full empirical CDFs. All
    arithmetic is integer until ONE final IEEE division, so the oracle
    replays the statistic bit-exactly (no decimal rounding — KS gaps are
    exact rationals where a .5 rounding tie is REAL, not measure-zero)."""
    from chatdata_spark.catalog import load_events
    from chatdata_spark.operators.quantsketch import ks_drift

    e = load_events(spark, sf_dir)
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    ref = e.filter(F.col("ts") < split)
    cur = e.filter(F.col("ts") >= split)
    return ks_drift(ref, cur, "value", "event_id", k=256, salt="ks")


@query(
    "drift_ks_by_source",
    oracle="""
    WITH base AS (
        SELECT source, n_chars AS v, doc_id AS k2, doc_id % 2 AS side,
               CAST(('0x' || substr(md5('ksrc' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        FROM documents
        WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL AND source IS NOT NULL
    ),
    rs AS (SELECT source, v FROM (
        SELECT source, v, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, k2) AS rn
        FROM base WHERE side = 0) WHERE rn <= 128),
    cs AS (SELECT source, v FROM (
        SELECT source, v, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, k2) AS rn
        FROM base WHERE side = 1) WHERE rn <= 128),
    u AS (
        SELECT source, v, 1 AS nr, 0 AS nc FROM rs
        UNION ALL
        SELECT source, v, 0 AS nr, 1 AS nc FROM cs
    ),
    pv AS (SELECT source, v, SUM(nr) AS nr, SUM(nc) AS nc FROM u GROUP BY source, v),
    cum AS (
        SELECT source,
               SUM(nr) OVER (PARTITION BY source ORDER BY v) AS cr,
               SUM(nc) OVER (PARTITION BY source ORDER BY v) AS cc,
               SUM(nr) OVER (PARTITION BY source) AS tr,
               SUM(nc) OVER (PARTITION BY source) AS tc
        FROM pv
    )
    SELECT source, CAST(MAX(tr) AS BIGINT) AS n_ref, CAST(MAX(tc) AS BIGINT) AS n_cur,
           CASE WHEN MAX(tr) > 0 AND MAX(tc) > 0 THEN
               CAST(MAX(ABS(cr * tc - cc * tr)) AS DOUBLE)
                   / CAST(MAX(tr) * MAX(tc) AS DOUBLE)
           END AS ks_stat
    FROM cum GROUP BY source ORDER BY source
    """,
)
def drift_ks_by_source(spark, sf_dir):
    """Per-group two-sample KS drift — "WHICH source drifted?" (the r7
    verdict's windowed-CDF generalization of drift_ks_event_values):
    document-length distributions of the even vs odd doc_id halves,
    compared per source over per-group deterministic bottom-128-by-hash
    samples (operators/quantsketch.py::ks_drift with group_cols). ONE
    partitioning (source) carries the sample rank, the cumulative CDFs,
    the totals and the final collapse; arithmetic stays integer until
    one final IEEE division per group, so the oracle replays every
    statistic bit-exactly. Scale shape: two k-bounded sample passes,
    then <= 2k rows per group — the per-source monitor costs the same
    two scans as the global one regardless of group count."""
    from chatdata_spark.operators.quantsketch import ks_drift

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("source").isNotNull()
    )
    ref = d.filter(F.col("doc_id") % 2 == 0)
    cur = d.filter(F.col("doc_id") % 2 == 1)
    return ks_drift(
        ref, cur, "n_chars", "doc_id", k=128, salt="ksrc", group_cols=["source"]
    ).orderBy("source")


# Shared by the batch query and streaming_zscore_anomaly (stateful.py):
# batch parity is the streaming claim, so both compare to the SAME SQL.
_ZSCORE_ORACLE = """
    WITH v AS (
        SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    m AS (
        SELECT event_type, COUNT(*) AS n, SUM(v100) AS s1, SUM(v100 * v100) AS s2
        FROM v GROUP BY 1
    ),
    o AS (
        SELECT v.event_type, COUNT(*) AS n_outliers
        FROM v JOIN m USING (event_type)
        WHERE (v.v100 * m.n - m.s1) * (v.v100 * m.n - m.s1)
              > 9 * (m.n * m.s2 - m.s1 * m.s1)
        GROUP BY 1
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           CAST(m.s1 AS DOUBLE) / CAST(m.n * 100 AS DOUBLE) AS mean,
           SQRT(GREATEST(CAST(m.s2 AS DOUBLE) / CAST(m.n * 10000 AS DOUBLE)
                - (CAST(m.s1 AS DOUBLE) / CAST(m.n * 100 AS DOUBLE))
                  * (CAST(m.s1 AS DOUBLE) / CAST(m.n * 100 AS DOUBLE)), 0.0)) AS std,
           CAST(COALESCE(o.n_outliers, 0) AS BIGINT) AS n_outliers
    FROM m LEFT JOIN o USING (event_type) ORDER BY m.event_type
"""


def _zscore_v100(df):
    from pyspark.sql import functions as F

    return (F.col("value").cast("decimal(18,2)") * F.lit(100)).cast("bigint")


@query("anomaly_zscore_event_values", oracle=_ZSCORE_ORACLE)
def anomaly_zscore_event_values(spark, sf_dir):
    """Per-type 3-sigma outlier monitor from EXACT integer moments
    (operators/moments.py): n/S1/S2 over fixed-point cents, mean/std by
    a fixed float64 op sequence, and the outlier rule decided by the
    all-integer predicate (v*n - S1)^2 > 9*(n*S2 - S1^2) — a row exactly
    ON the 3-sigma boundary classifies identically in every engine,
    which no float z-comparison can promise. The parametric complement
    to anomaly_mad_event_values (MAD is robust to the outliers it
    hunts; z-score is the cheap one-pass classic that the streaming
    twin can maintain as 3 integers per group). One aggregate + one
    broadcast-join recount pass — two scans, no corpus-sized shuffle."""
    from chatdata_spark.catalog import load_events
    from chatdata_spark.operators.moments import zscore_report

    e = load_events(spark, sf_dir).filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    return zscore_report(e, ["event_type"], _zscore_v100(e), scale=100, z=3).orderBy(
        "event_type"
    )


@query(
    "drift_embedding_centroid",
    oracle="""
    WITH c AS (
        SELECT vec_id, label, vec_id % 2 AS side, u.comp, u.dim
        FROM embeddings,
             LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS comp,
                             generate_subscripts(embedding, 1) AS dim) u
        WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    s AS (
        SELECT label, dim,
               SUM(CASE WHEN side = 0
                   THEN CAST(CAST(comp AS DECIMAL(18,9)) * 1000000000 AS BIGINT)
                   ELSE 0 END) AS sr,
               SUM(CASE WHEN side = 1
                   THEN CAST(CAST(comp AS DECIMAL(18,9)) * 1000000000 AS BIGINT)
                   ELSE 0 END) AS sc,
               SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS nr,
               SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS nc
        FROM c GROUP BY 1, 2
    ),
    g AS (
        SELECT label, MAX(nr) AS n_ref, MAX(nc) AS n_cur,
               SUM(sr * sc) AS dot, SUM(sr * sr) AS rr, SUM(sc * sc) AS cc
        FROM s GROUP BY 1
    )
    SELECT label, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           CASE WHEN rr > 0 AND cc > 0 THEN
               1.0 - CAST(dot AS DOUBLE) / (SQRT(CAST(rr AS DOUBLE)) * SQRT(CAST(cc AS DOUBLE)))
           END AS cos_shift
    FROM g ORDER BY label
    """,
)
def drift_embedding_centroid(spark, sf_dir):
    """Per-label embedding-space drift between the even and odd vec_id
    halves: cosine distance between the halves' centroid directions
    (operators/drift.py::embedding_centroid_drift) — the drift monitor
    that catches a SEMANTIC shift no scalar profile column sees. Cosine
    is scale-invariant, so the statistic is computed on the EXACT
    integer per-dimension component sums (decimal(27,9)-convention
    components scaled to fixed-point bigints): dot/norms are exact
    DECIMAL(38,0)/HUGEINT sums and only the final cast-sqrt-mul-div
    sequence is float — the oracle replays every shift bit-exactly.
    Scale shape: two posexplode aggregates (map-side combined,
    |labels|*64 cells), nothing corpus-sized after the scan."""
    from chatdata_spark.operators.drift import embedding_centroid_drift

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    ref = em.filter(F.col("vec_id") % 2 == 0)
    cur = em.filter(F.col("vec_id") % 2 == 1)
    return embedding_centroid_drift(ref, cur, ["label"], "embedding").orderBy("label")


@query(
    "embedding_norm_anomaly",
    oracle="""
    WITH c AS (
        SELECT vec_id, label,
               CAST(CAST(u.comp AS DECIMAL(18,4)) * 10000 AS BIGINT) AS c4
        FROM embeddings,
             LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS comp) u
        WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    v AS (SELECT label, vec_id, SUM(c4 * c4) AS norm2i FROM c GROUP BY 1, 2),
    m AS (
        SELECT label, COUNT(*) AS n, SUM(norm2i) AS s1,
               SUM(norm2i * norm2i) AS s2
        FROM v GROUP BY 1
    ),
    o AS (
        SELECT v.label, COUNT(*) AS n_outliers
        FROM v JOIN m USING (label)
        WHERE (v.norm2i * m.n - m.s1) * (v.norm2i * m.n - m.s1)
              > 9 * (m.n * m.s2 - m.s1 * m.s1)
        GROUP BY 1
    )
    SELECT m.label, CAST(m.n AS BIGINT) AS n,
           CAST(m.s1 AS DOUBLE) / (CAST(m.n AS DOUBLE) * 100000000.0) AS mean_norm2,
           SQRT(GREATEST(CAST(m.s2 AS DOUBLE) / (CAST(m.n AS DOUBLE) * 1e16)
                - (CAST(m.s1 AS DOUBLE) / (CAST(m.n AS DOUBLE) * 100000000.0))
                  * (CAST(m.s1 AS DOUBLE) / (CAST(m.n AS DOUBLE) * 100000000.0)),
                0.0)) AS std_norm2,
           CAST(COALESCE(o.n_outliers, 0) AS BIGINT) AS n_outliers
    FROM m LEFT JOIN o USING (label) ORDER BY m.label
    """,
)
def embedding_norm_anomaly(spark, sf_dir):
    """Embedding-corpus health: per-label squared-norm distribution +
    3-sigma outlier count — the monitor that catches degenerate vectors
    (zero/exploded norms from a bad encoder batch) that cosine-based
    checks normalize away. Composes this round's primitives: per-vector
    EXACT integer norm² (components fixed-pointed at 4 decimals — a
    monitor's resolution, keeping sum-of-squares-of-squares inside
    DECIMAL(38,0)/HUGEINT), operators/moments.py exact_moments +
    count_outliers (the all-integer boundary predicate), and the clamped
    float mean/std tail with a FLOAT denominator (n·10^8·10^8 would
    overflow the integer path; both engines run the identical
    cast-multiply sequence). Scale shape: one posexplode aggregate to
    per-vector norms, one |labels|-row moment aggregate, one broadcast
    recount — no corpus-sized join."""
    from chatdata_spark.operators.moments import count_outliers, exact_moments

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    c4 = (F.col("comp").cast("decimal(18,4)") * F.lit(10_000)).cast("decimal(38,0)")
    v = (
        em.select(
            "vec_id", "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "comp"),
        )
        .groupBy("label", "vec_id")
        .agg(F.sum(c4 * c4).cast("decimal(38,0)").alias("norm2i"))
    )
    m = exact_moments(v, ["label"], "norm2i")
    out = count_outliers(v, m, ["label"], "norm2i", z=3)
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / (nd * F.lit(1e8))
    ex2 = F.col("s2").cast("double") / (nd * F.lit(1e16))
    return (
        m.join(out, ["label"], "left")
        .select(
            "label",
            "n",
            mean.alias("mean_norm2"),
            F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0))).alias("std_norm2"),
            F.coalesce("n_outliers", F.lit(0).cast("long")).alias("n_outliers"),
        )
        .orderBy("label")
    )
