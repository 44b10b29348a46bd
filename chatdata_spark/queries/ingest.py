"""Driver queries for ingestion flatten (S3) and multimodal columns.

The ingest query builds a JSON metadata blob in-query (driver tables are
read-only) and round-trips it through the flatten path — exactly the
reference's JSON→typed-columns ingest (docs/vector-sql.md:201-216). The
multimodal query runs the stubbed decode whose arithmetic the oracle
recomputes in SQL (operators/multimodal.py constants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.operators.multimodal import (
    FEAT_MULTS,
    H_BASE,
    H_MOD,
    H_MULT,
    W_BASE,
    W_MOD,
    W_MULT,
    decode_metadata,
    docs_as_media,
    extract_features,
)
from chatdata_spark.registry import query
from chatdata_spark.sources.ingest import flatten_arxiv_metadata, validate_vector_dim


@query(
    "ingest_flatten_json",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               to_json(struct_pack(
                   title := source,
                   authors := list_transform(string_split(text, ' ')[1:3], w -> concat(' ', w, ' ')),
                   pubdate := concat('20', lpad(CAST(10 + doc_id % 14 AS VARCHAR), 2, '0'), '-03-01 00:00:00')
               )) AS metadata
        FROM documents
    )
    SELECT doc_id,
           json_extract_string(metadata, '$.title') AS title,
           array_to_string(list_transform(CAST(json_extract(metadata, '$.authors') AS VARCHAR[]),
                                          x -> trim(x)), '|') AS authors,
           CAST(json_extract_string(metadata, '$.pubdate') AS TIMESTAMP) AS pubdate
    FROM raw ORDER BY doc_id
    """,
)
def ingest_flatten_json(spark, sf_dir):
    """S3 ingest flatten round-trip: build a metadata JSON (string field,
    array field with padding whitespace, datetime string), then flatten to
    typed columns via get_json_object/from_json+trim/to_timestamp. The
    driver-facing projection joins the authors array to a '|' string (the
    driver canonicalizer can't sort list cells); the typed-array flatten
    itself is asserted in tests/test_ingest_streaming.py."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = d.select(
        "doc_id",
        F.to_json(
            F.struct(
                F.col("source").alias("title"),
                F.transform(
                    F.slice(F.split("text", " "), 1, 3), lambda w: F.concat(F.lit(" "), w, F.lit(" "))
                ).alias("authors"),
                F.concat(
                    F.lit("20"),
                    F.lpad((F.lit(10) + F.col("doc_id") % 14).cast("string"), 2, "0"),
                    F.lit("-03-01 00:00:00"),
                ).alias("pubdate"),
            )
        ).alias("metadata"),
    )
    return (
        flatten_arxiv_metadata(raw, "metadata")
        .select("doc_id", "title", F.array_join("authors", "|").alias("authors"), "pubdate")
        .orderBy("doc_id")
    )


@query(
    "ingest_validate_dim",
    oracle="""
    WITH planted AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL SELECT vec_id + 100000, embedding[1:32] FROM embeddings WHERE vec_id < 10
    )
    SELECT CAST(len(embedding) = 64 AS VARCHAR) AS valid, COUNT(*) AS n
    FROM planted GROUP BY valid ORDER BY valid
    """,
)
def ingest_validate_dim(spark, sf_dir):
    """§1.3 CHECK length(v)=DIM as ingest-time split: plant truncated
    vectors, count valid vs rejected."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    bad = (
        e.filter(F.col("vec_id") < 10)
        .select((F.col("vec_id") + 100000).alias("vec_id"), F.slice("embedding", 1, 32).alias("embedding"))
    )
    planted = e.unionByName(bad)
    valid, rejected = validate_vector_dim(planted, "embedding", 64)
    return (
        valid.withColumn("valid", F.lit("true"))
        .unionByName(rejected.withColumn("valid", F.lit("false")))
        .groupBy("valid")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("valid")
    )


@query(
    "multimodal_profile",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, encode(text) AS content,
               CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS media_type,
               octet_length(encode(text)) AS n
        FROM documents
    )
    SELECT media_type,
           COUNT(*) AS n_media,
           CAST(SUM({W_BASE} + (n * {W_MULT}) % {W_MOD}) AS BIGINT) AS total_width,
           CAST(SUM({H_BASE} + (n * {H_MULT}) % {H_MOD}) AS BIGINT) AS total_height,
           CAST(SUM(CASE WHEN media_type = 'video' THEN 1 + n % 30 ELSE 1 END) AS BIGINT) AS total_frames
    FROM media GROUP BY media_type ORDER BY media_type
    """,
)
def multimodal_profile(spark, sf_dir):
    """Multimodal decode plumbing end-to-end: binary column → mapInPandas
    metadata decode (stubbed arithmetic) → relational roll-up."""
    media = docs_as_media(spark, sf_dir)
    meta = decode_metadata(media)
    return (
        meta.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("width").cast("bigint").alias("total_width"),
            F.sum("height").cast("bigint").alias("total_height"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
        )
        .orderBy("media_type")
    )


@query(
    "multimodal_feature_knn",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, octet_length(encode(text)) AS n FROM documents
    ),
    feats AS (
        SELECT media_id,
               [{", ".join(f"CAST((n * {m}) % 1000 AS DOUBLE) / 1000.0" for m in FEAT_MULTS)}] AS f
        FROM media
    )
    SELECT media_id,
           ROUND(1.0 - list_cosine_similarity(f, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]), 6) AS dist
    FROM feats
    ORDER BY dist ASC, media_id ASC LIMIT 10
    """,
)
def multimodal_feature_knn(spark, sf_dir):
    """Extracted media features feeding the standard kNN operator — the
    'media table is just another (id, vector) table' property."""
    from chatdata_spark.operators.knn import knn

    media = docs_as_media(spark, sf_dir)
    feats = extract_features(media)
    return knn(feats, "features", [0.5] * 8, k=10, select=["media_id"], id_col="media_id")


@query(
    "ingest_csv_typed",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 19 = 0 THEN NULL ELSE doc_id % 7 END AS INT) AS qty,
           CAST(doc_id % 100 AS DOUBLE) + 0.25 AS price,
           source || ', ' || lang AS label,
           CAST(doc_id % 19 = 0 AS INT) AS is_corrupt
    FROM documents ORDER BY doc_id
    """,
)
def ingest_csv_typed(spark, sf_dir):
    """CSV ingest round-trip (sources/ingest.py::parse_csv_typed): build a
    CSV line per document in-query (driver tables are read-only) — an
    int field, a double field, and a QUOTED label containing a comma —
    with every 19th row's int field deliberately non-numeric, then parse
    with from_csv in PERMISSIVE mode. Verifies typed casting, RFC-4180
    quote handling (the comma inside the label must survive), partial
    extraction of parseable fields on bad rows, and corrupt-record
    capture. The oracle recomputes the expected typed values directly
    from the base table — an independent check of the parse, not a
    reparse."""
    from chatdata_spark.sources.ingest import parse_csv_typed

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qty_field = F.when(F.col("doc_id") % 19 == 0, F.lit("xx")).otherwise(
        (F.col("doc_id") % 7).cast("string")
    )
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(","),
        qty_field,
        F.lit(","),
        F.format_string("%d.25", (F.col("doc_id") % 100).cast("int")),
        F.lit(',"'),
        F.col("source"),
        F.lit(", "),
        F.col("lang"),
        F.lit('"'),
    )
    raw = d.select(F.col("doc_id").alias("__orig_id"), line.alias("csv_line"))
    parsed = parse_csv_typed(
        raw, "csv_line", "doc_id long, qty int, price double, label string, _corrupt string"
    )
    return parsed.select(
        "doc_id",
        "qty",
        "price",
        "label",
        F.col("_corrupt").isNotNull().cast("int").alias("is_corrupt"),
    ).orderBy("doc_id")


@query(
    "ingest_orc_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id
    """,
)
def ingest_orc_roundtrip(spark, sf_dir):
    """ORC source/sink round-trip — the S2 family's columnar-format
    breadth beyond parquet/JSON/CSV: write the documents metadata
    columns as key-sorted ORC (repartitionByRange + sortWithinPartitions,
    the same layout discipline as operators/layout.py, so ORC's built-in
    min/max indexes prune like parquet footers), read them back, and
    return the typed rows. The oracle reads the PARQUET original
    directly, so hash equality proves the ORC write+read preserved every
    value and type. Filter pushdown into the ORC scan is plan-asserted
    in tests/test_ingest.py."""
    import tempfile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="chatdata_orc_q_") + "/docs_orc"
    (
        d.repartitionByRange(4, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .orc(path)
    )
    return spark.read.orc(path).orderBy("doc_id")
