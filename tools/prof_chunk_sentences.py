"""Stage-level cut-point profile for semantic_chunk_sentences (r11 opt).

Times successive prefixes of the query pipeline to the noop sink in ONE
JVM (warm scan cache irrelevant: each cut recomputes from parquet; JIT
warmth shared, which is what we want for relative attribution).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from chatdata_spark.session import get_spark  # noqa: E402
from chatdata_spark.queries.cleaning import _prose_expr  # noqa: E402
from chatdata_spark.operators.chunks import (  # noqa: E402
    SENTENCE_SPLIT_RE,
    _drift_chunk_spans,
)
from chatdata_spark.operators.dedup import _spread  # noqa: E402
from chatdata_spark.functions.vector import make_embed_text_udf  # noqa: E402

spark = get_spark(app_name="prof_chunk_sentences")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]


def t(label, df, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:28s} {best:7.3f} s", file=sys.stderr)


d0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
    "doc_id", _prose_expr().alias("prose")
)
t("A prose", d0)

W = 2
sents = F.filter(
    F.transform(F.split(F.col("prose"), SENTENCE_SPLIT_RE), lambda x: F.trim(x)),
    lambda x: x != "",
)
d = d0.select(F.col("doc_id").alias("__id"), sents.alias("__ws")).filter(
    F.size("__ws") >= 1
)
t("B sentences", d)

ds = _spread(d)
n_win = F.ceil(F.size("__ws") / F.lit(W)).cast("int")
win_texts = F.transform(
    F.sequence(F.lit(0), n_win - 1),
    lambda i: F.array_join(F.slice("__ws", i * W + 1, W), " "),
)
wins = ds.select(
    "__id", F.size("__ws").alias("__n"), F.posexplode(win_texts).alias("__wi", "__wtext")
)
t("C windows", wins)

emb = wins.withColumn("__v", make_embed_text_udf(64)(F.col("__wtext")))
t("D embed", emb)

full = _drift_chunk_spans(wins, W, 64, 0.0, "doc_id", "start_sent", "n_sents")
t("E full", full)

# sentinel
knn_like = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
t("scan-only control", knn_like)
