"""IVF-style batch ANN index (SURVEY §4.3 v1) — the Spark-native stand-in
for the reference's MSTG vector index (``ALTER TABLE ... ADD VECTOR INDEX
... MSTG('metric_type=Cosine')``, myscale_tables.py:35,63;
docs/vector-sql.md:217; S6/V6).

Not a Catalyst extension: a **data layout + query convention**.

Build (one batch job, scales linearly):
  1. fit MLlib KMeans on a sample (KMeans|| init, fixed seed);
  2. assign every row its nearest centroid JVM-side via model.transform;
  3. write the table partitioned by ``cluster_id`` (+ centroid sidecar).

Search (micro-batch top-k):
  1. rank centroids against the query on the driver (n_clusters × dim
     floats — trivially small);
  2. scan only the ``n_probe`` best partitions — partition pruning on the
     directory layout means the other clusters are never read from disk;
  3. exact kNN within the probed rows (operators/knn.py).

``n_probe = n_clusters`` degrades to an exact full scan — that's the
oracle-checkable configuration; recall/latency trades via ``n_probe``
exactly like the MSTG/IVF ``nprobe`` knob. At 100 TB: cluster count ~√N
keeps partitions executor-sized; skewed clusters get split by re-running
KMeans within any partition exceeding a size cap (same layout, recursive).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chatdata_spark.operators.knn import knn


class IVFIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "ivf_meta.json")) as f:
            meta = json.load(f)
        self.id_col = meta["id_col"]
        self.vector_col = meta["vector_col"]
        self.n_clusters = meta["n_clusters"]
        self.metric = meta["metric"]
        self.centroids = np.array(meta["centroids"], dtype=np.float64)

    # -- build -----------------------------------------------------------------
    @staticmethod
    def build(
        df: DataFrame,
        path: str,
        id_col: str,
        vector_col: str,
        n_clusters: int = 16,
        sample_fraction: float = 1.0,
        seed: int = 42,
        metric: str = "cosine",
    ) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = df.withColumn("__features", array_to_vector(F.col(vector_col).cast("array<double>")))
        sample = feats if sample_fraction >= 1.0 else feats.sample(sample_fraction, seed=seed)
        model = KMeans(k=n_clusters, seed=seed, featuresCol="__features").fit(sample)
        assigned = (
            model.transform(feats)
            .withColumnRenamed("prediction", "cluster_id")
            .drop("__features")
        )
        (
            assigned.repartition("cluster_id")
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(os.path.join(path, "data"))
        )
        meta = {
            "id_col": id_col,
            "vector_col": vector_col,
            "n_clusters": n_clusters,
            "metric": metric,
            "centroids": [list(map(float, c)) for c in model.clusterCenters()],
        }
        tmp = os.path.join(path, "ivf_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "ivf_meta.json"))
        return IVFIndex(df.sparkSession, path)

    # -- incremental maintenance ------------------------------------------------
    def append(self, new_df: DataFrame) -> None:
        """Incremental index maintenance: assign new vectors to their
        nearest EXISTING centroid (same euclidean rule as the build's
        KMeans assignment) and append them to the cluster layout — new
        parquet files land inside existing ``cluster_id=`` directories, so
        searches see old+new rows with no rebuild and no rewrite of prior
        data (append-only, never read-transform-overwrite).

        Assignment is one Arrow GEMM per batch against the broadcast
        (k, d) centroid matrix — O(rows·k·d) with no shuffle before the
        partitioned write. Centroids drift as data grows; like any IVF,
        rebuild when appended volume ≫ built volume (recall soundness is
        unaffected — assignment and search use the same centroids)."""
        cents = self.centroids  # (k, d) float64
        c_sq = (cents**2).sum(axis=1)

        @F.pandas_udf("int")
        def _assign(vecs: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; row term constant per row
            d2 = -2.0 * (x @ cents.T) + c_sq[None, :]
            return pd.Series(d2.argmin(axis=1).astype("int32"))

        (
            new_df.withColumn(
                "cluster_id", _assign(F.col(self.vector_col).cast("array<double>"))
            )
            .repartition("cluster_id")
            .write.mode("append")
            .partitionBy("cluster_id")
            .parquet(os.path.join(self.path, "data"))
        )

    # -- search ----------------------------------------------------------------
    def rank_centroids(self, query_vec: Sequence[float]) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        if self.metric == "cosine":
            cn = np.linalg.norm(self.centroids, axis=1)
            sims = (self.centroids @ q) / (cn * np.linalg.norm(q))
            order = np.argsort(-sims)
        else:
            order = np.argsort(np.linalg.norm(self.centroids - q, axis=1))
        return [int(i) for i in order]

    def search(
        self,
        query_vec: Sequence[float],
        k: int = 10,
        n_probe: int = 4,
        where=None,
        select: Sequence[str] | None = None,
    ) -> DataFrame:
        probes = self.rank_centroids(query_vec)[: max(1, min(n_probe, self.n_clusters))]
        scan = self.spark.read.parquet(os.path.join(self.path, "data")).filter(
            F.col("cluster_id").isin(probes)  # partition-pruned: only probed dirs read
        )
        return knn(
            scan,
            self.vector_col,
            query_vec,
            k=k,
            where=where,
            select=select,
            metric=self.metric,
            id_col=self.id_col,
        )


def build_or_load_ivf(
    spark: SparkSession,
    source_df: DataFrame,
    path: str,
    id_col: str,
    vector_col: str,
    n_clusters: int = 16,
) -> IVFIndex:
    """Idempotent build: reuse an existing index directory (the S6 'ALTER
    TABLE ADD VECTOR INDEX' is a one-time batch job, not a per-query one)."""
    if os.path.exists(os.path.join(path, "ivf_meta.json")):
        return IVFIndex(spark, path)
    os.makedirs(path, exist_ok=True)
    return IVFIndex.build(source_df, path, id_col, vector_col, n_clusters=n_clusters)
