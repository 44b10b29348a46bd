"""Typed table catalog.

Port of the reference's ``TableConfig`` dataclass
(/root/reference/app/backend/types/table_config.py:8-25) plus loaders for the
driver's parquet test tables (TESTDATA.md). A table is a parquet path with a
declared schema, a designated text/vector/id column, and the typed attribute
list the self-query compiler is allowed to filter on
(/root/reference/app/backend/constants/myscale_tables.py:81-112).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class AttributeInfo:
    """A column (or computed expression) the structured-filter layer may
    reference. ``expr`` defaults to the name; computed attributes (e.g. the
    reference's ``length(categories)``, myscale_tables.py:111) set a SQL
    expression instead."""

    name: str
    type: str  # string | int | float | timestamp | date | list[string]
    description: str = ""
    expr: str | None = None

    @property
    def sql_expr(self) -> str:
        return self.expr or self.name


@dataclass(frozen=True)
class TableConfig:
    """Declarative table description (reference table_config.py:8-25)."""

    name: str
    path: str | None = None
    id_col: str = "id"
    text_col: str | None = None
    vector_col: str | None = None
    vector_dim: int | None = None
    must_have_cols: tuple[str, ...] = ()
    attributes: tuple[AttributeInfo, ...] = ()
    # upsert key for ReplacingMergeTree-style keep-latest semantics
    # (myscale_tables.py:37,65); None → append-only table.
    upsert_key: tuple[str, ...] = ()
    version_col: str | None = None
    partition_cols: tuple[str, ...] = field(default=())
    # named embedding model for text_col → vector_col (the reference's
    # per-table model binding, myscale_tables.py:90-92,117-120); resolved
    # through functions/embedders.py — the hash stub unless a real factory
    # was registered under this name.
    embed_model: str = "hash"

    def load(self, spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
        path = self.path or (f"{sf_dir}/{self.name}.parquet" if sf_dir else None)
        if path is None:
            raise ValueError(f"no path for table {self.name}")
        return spark.read.parquet(path)

    def embed_udf(self):
        """The table's embedding UDF (text → array<float>), resolved by
        model name at call time so late registration wins."""
        from chatdata_spark.functions.embedders import embedder_udf

        return embedder_udf(self.embed_model, self.vector_dim or 64)


def to_documents(
    df: DataFrame,
    text_col: str,
    must_have_cols,
    max_string_length: int | None = None,
) -> DataFrame:
    """S9 row→Document sink projection (reference
    myscale_without_metadata.py:42-48): ``page_content`` = the text column,
    ``metadata`` = the must-have columns serialized to JSON (representation-
    stable for comparisons). ``max_string_length`` mirrors the reference's
    ``SQLDatabase(..., max_string_length=1024)`` truncation
    (build_retrievers.py:109): string values longer than the limit are cut —
    applied to ``page_content`` and to string-typed metadata columns given
    by name (computed Column entries pass through untruncated)."""
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    text = F.col(text_col)
    if max_string_length is not None:
        text = F.substring(text, 1, max_string_length)
    meta = []
    for c in must_have_cols:
        if isinstance(c, str):
            col = F.col(c)
            if max_string_length is not None and dtypes.get(c) == "string":
                col = F.substring(col, 1, max_string_length).alias(c)
            meta.append(col)
        else:
            meta.append(c)
    return df.select(
        text.alias("page_content"), F.to_json(F.struct(*meta)).alias("metadata")
    )


def oracle_sf_dir() -> str:
    """The fixture dir the driver's DuckDB views read — lazy replay
    oracles (queries/vector.py ANN replays, queries/text.py BPE replay)
    must read the SAME files. ONE definition so the override knob
    (tools/driver_replay.py REPLAY_SF pairs with it for the regeneration
    dry-run) cannot drift per-module."""
    import os

    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
    rejects by default. Read nanos as long (runtime conf, works under any
    session) and convert to a microsecond timestamp with exact integer
    division — same truncation DuckDB applies reading ns→us."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Load the driver test tables as DataFrames."""
    return {
        n: (load_events(spark, sf_dir) if n == "events" else spark.read.parquet(f"{sf_dir}/{n}.parquet"))
        for n in names
    }


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register each test table as a temp view so ``spark.sql`` entry points
    (Vector SQL dialect, plain SQL) see the same names DuckDB's oracle does."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


# --- Reference-shaped table configs (SURVEY §1.2) ---------------------------

WIKIPEDIA = TableConfig(
    name="wiki_pedia",
    id_col="id",
    text_col="text",
    vector_col="emb",
    vector_dim=768,
    must_have_cols=("id", "title", "url", "text", "views"),
    attributes=(
        AttributeInfo("title", "string", "title of the wikipedia page"),
        AttributeInfo("text", "string", "paragraph text"),
        AttributeInfo("views", "float", "page view count"),
    ),
    upsert_key=("id",),
    embed_model="paraphrase-multilingual-mpnet-base-v2",  # myscale_tables.py:90-92
)

CHAT_ARXIV = TableConfig(
    name="chat_arxiv",
    id_col="id",
    text_col="abstract",
    vector_col="vector",
    vector_dim=768,
    must_have_cols=("title", "id", "categories", "abstract", "authors", "pubdate"),
    attributes=(
        AttributeInfo("pubdate", "timestamp", "publish date of the paper"),
        AttributeInfo("authors", "list[string]", "list of author names"),
        AttributeInfo("title", "string", "title of the paper"),
        AttributeInfo("categories", "list[string]", "arxiv categories"),
        AttributeInfo("length(categories)", "int", "length of categories list",
                      expr="size(categories)"),
    ),
    upsert_key=("id",),
    embed_model="hkunlp/instructor-xl",  # myscale_tables.py:117-120 (instruction prefix)
)

PRIVATE_KB = TableConfig(
    name="private_kb",
    id_col="entity_id",
    text_col="text",
    vector_col="vector",
    vector_dim=768,
    must_have_cols=("entity_id", "file_name", "text", "user_id"),
    upsert_key=("entity_id",),
    version_col="created_by",
)

SESSIONS = TableConfig(
    name="sessions",
    id_col="session_id",
    upsert_key=("session_id",),
    version_col="create_by",
)

CHAT_MEMORY = TableConfig(
    name="chat_memory",
    id_col="msg_id",
    upsert_key=("msg_id",),
    version_col="id",
    partition_cols=("session_id",),
)


def shared_cache_path(
    kind: str, sf_dir: str, suffix: str, source: str = "embeddings.parquet"
) -> str:
    """/tmp location for a one-time derived artifact (IVF/PQ layout,
    signature store) shared across sessions and rounds. The path embeds a
    fingerprint of the SOURCE parquet (size + mtime), so a regenerated
    testdata file can never silently serve a stale layout — the /tmp
    caches follow the same static-data contract as the in-process plan
    memos (operators/dedup.py:_STOP_SETS), enforced by key instead of by
    convention."""
    import hashlib
    import os

    st = os.stat(os.path.join(sf_dir, source))
    fp = hashlib.md5(f"{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:10]
    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    return f"/tmp/chatdata_spark_{kind}/{safe}_{suffix}_{fp}"
