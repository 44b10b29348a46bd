"""Reference-shaped fixture flows (FIXTURES.md canonical queries): build
wiki_pedia / chat_arxiv-shaped tables in-test (DIM=8, deterministic
hash_embed vectors per the fixture convention) and run the reference's
end-to-end retrieval shapes through our engine."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from chatdata_spark.catalog import CHAT_ARXIV, WIKIPEDIA, AttributeInfo
from chatdata_spark.functions.vector import cosine_distance_py, hash_embed
from chatdata_spark.operators.knn import knn
from chatdata_spark.plans.self_query import SelfQueryCompiler, and_, contain, gt, like
from chatdata_spark.plans.vector_sql import VectorSQLDialect

DIM = 8


@pytest.fixture(scope="module")
def arxiv(spark):
    cats = ["cs.CV", "cs.LG", "cs.CL", "stat.ML", "math.OC"]
    authors_pool = ["Geoffrey Hinton", "Ada Lovelace", "Alan Turing", "Grace Hopper", "Yann LeCun"]
    rows = []
    for i in range(200):
        cid = f"{1700 + i // 100}.{i % 100:05d}"
        n_cat = 1 + i % 4
        n_auth = 1 + i % 5
        abstract = f"paper {i} about " + ("Mutual Information " if i % 20 == 0 else "representation ") + "learning methods"
        rows.append(
            (
                abstract,
                cid,
                hash_embed(cid, DIM),
                datetime.datetime(2017 + i % 7, 1 + i % 12, 1 + i % 28),
                f"Title {i}" + (" computer" if i % 10 == 0 else ""),
                cats[i % 5 : i % 5 + n_cat] or [cats[0]],
                authors_pool[i % 5 : i % 5 + n_auth] or [authors_pool[0]],
                "",
                cats[i % 5],
            )
        )
    return spark.createDataFrame(
        rows,
        "abstract string, id string, vector array<float>, pubdate timestamp, title string, "
        "categories array<string>, authors array<string>, comment string, primary_category string",
    )


def test_fixture_1_knn_template(spark, arxiv):
    """FIXTURES canonical 1: top-10 by cosine distance, no filter — verified
    against a driver-side python ranking."""
    q = hash_embed("q1", DIM)
    got = [r.id for r in knn(arxiv, "vector", q, k=10, select=["id"], id_col="id").collect()]
    rows = arxiv.select("id", "vector").collect()
    want = [
        rid
        for rid, _ in sorted(
            ((r.id, round(cosine_distance_py(r.vector, q), 6)) for r in rows),
            key=lambda t: (t[1], t[0]),
        )[:10]
    ]
    assert got == want


def test_fixture_2_filtered_knn(spark, arxiv):
    """FIXTURES canonical 2: size(categories)>2 AND has(categories,'cs.CV')
    AND pubdate > date — the prompts.py:82/100 filter shapes."""
    q = hash_embed("q2", DIM)
    where = (
        (F.size("categories") > 2)
        & F.array_contains("categories", "cs.CV")
        & (F.col("pubdate") > F.to_timestamp(F.lit("2018-02-01")))
    )
    rows = knn(arxiv, "vector", q, k=5, where=where, select=["id", "categories", "pubdate"], id_col="id").collect()
    assert rows
    for r in rows:
        assert len(r.categories) > 2 and "cs.CV" in r.categories
        assert r.pubdate > datetime.datetime(2018, 2, 1)


def test_fixture_3_ilike_knn_via_dialect(spark, arxiv):
    """FIXTURES canonical 3: ILIKE '%mutual information%' + kNN through the
    Vector SQL dialect (prompts.py:119 example shape)."""
    arxiv.createOrReplaceTempView("chat_arxiv")
    dialect = VectorSQLDialect(dim=DIM, array_columns=("categories", "authors", "vector"))
    sql = """
    SELECT id, title, DISTANCE(vector, NeuralArray(entropy estimation)) AS dist
    FROM chat_arxiv
    WHERE abstract ILIKE '%mutual information%'
    ORDER BY dist ASC, id ASC LIMIT 4
    """
    rows = spark.sql(dialect.translate(sql)).collect()
    assert 0 < len(rows) <= 4
    ids = {r.id for r in rows}
    manual = {
        r.id for r in arxiv.filter(F.lower("abstract").contains("mutual information")).collect()
    }
    assert ids <= manual


def test_fixture_4_self_query_compile(spark, arxiv):
    """FIXTURES canonical 4 (adapted to arxiv attrs): and(contain(categories,
    'cs.LG'), gt(length(categories), 2), like(title, '%computer%'))."""
    comp = SelfQueryCompiler(CHAT_ARXIV.attributes)
    ast = and_(
        contain("categories", "cs.LG"),
        gt("length(categories)", 2),
        like("title", "%computer%"),
    )
    got = arxiv.filter(comp.compile(ast)).select("id").collect()
    want = arxiv.filter(
        F.array_contains("categories", "cs.LG") & (F.size("categories") > 2) & F.col("title").like("%computer%")
    ).select("id").collect()
    assert {r.id for r in got} == {r.id for r in want}


def test_fixture_select_rewrite_must_have(spark, arxiv):
    """P2: whatever the LLM projected is replaced by must_have_columns
    (vector_sql_output_parser.py:16-23) — the reference's guard against
    under-projection."""
    arxiv.createOrReplaceTempView("chat_arxiv")
    dialect = VectorSQLDialect(dim=DIM, array_columns=("categories", "authors", "vector"))
    sql = "SELECT comment, DISTANCE(vector, NeuralArray(x)) AS dist FROM chat_arxiv ORDER BY dist LIMIT 3"
    out = dialect.translate(sql, must_have_columns=list(CHAT_ARXIV.must_have_cols))
    df = spark.sql(out)
    assert set(CHAT_ARXIV.must_have_cols) <= set(df.columns)
    assert "dist" in df.columns
    assert df.count() == 3


def test_fixture_wiki_table_config():
    """Catalog parity: the typed attribute sets match the reference's
    AttributeInfo declarations (myscale_tables.py:81-112)."""
    assert {a.name for a in WIKIPEDIA.attributes} == {"title", "text", "views"}
    computed = {a.name: a for a in CHAT_ARXIV.attributes}["length(categories)"]
    assert computed.expr == "size(categories)"
    assert isinstance(computed, AttributeInfo)
