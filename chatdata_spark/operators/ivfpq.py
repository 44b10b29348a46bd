"""IVF-PQ composed vector index: coarse IVF routing over product-quantized
codes (north-star extension; the reference's MSTG index internally couples
graph/tree routing with compressed storage the same way —
``fp16_storage=1`` / ``disk_mode=3``, myscale_tables.py:35,63 — route
first, scan compressed, rerank survivors exactly).

Why the composition matters at 100 TB: IVF alone (operators/ivf.py) prunes
the SCAN to n_probe/n_clusters of the corpus but still reads 256-byte raw
vectors; PQ alone (operators/pq.py) compresses 32× but scans EVERY code.
IVF-PQ multiplies the two savings: the search reads only the probed
clusters' code partitions — with n_probe=4 of 1024 clusters and m=8 codes
that is ~0.1% of the bytes an exact scan touches — which is exactly the
FAISS ``IVFPQ`` architecture (Jégou et al., PAMI 2011: "Product
quantization for nearest neighbor search").

Layout: codes live NEXT TO the IVF layout, partitioned by the SAME
``cluster_id`` (``path/codes/cluster_id=N/``), so centroid ranking prunes
code partitions at the parquet-directory level — the scan never lists,
let alone reads, unprobed clusters. Two training targets: the default
quantizes the (normalized) raw vectors; ``residual=True`` quantizes
``(x_norm − centroid[cluster])`` — the FAISS IVFPQ default, a
codebook-training change, not a layout change (search builds one small
ADC table per probed cluster instead of one global table). Both compose
with the OPQ rotation (``opq_iters``). Recall at fixture scale is pinned
in tests/test_ivfpq.py.

Static-data contract: codes are derived from the IVF index's committed
data tree at build time (the shared_cache_path fingerprint ties both to
the source parquet). Mutations go through the IVF index (append/delete/
compact) and invalidate the codes — rebuild, like any secondary index.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chatdata_spark.functions.vector import cosine_distance
from chatdata_spark.operators.ivf import IVFIndex
from chatdata_spark.operators.pq import _kmeans_1d


def _centroid_lookup(ivf: IVFIndex) -> np.ndarray:
    """(max_cluster_id+1, d) lookup of the RAW IVF centroids — cluster
    ids may be non-contiguous after split/merge maintenance, so the
    lookup is id-indexed, not positional. Raw (not unit-normalized): the
    KMeans mean is the least-squares center of its members, so
    (x_norm − mean) has the minimal residual energy — projecting the
    centroid onto the sphere INCREASES it (measured on the fixture
    corpus: 0.100 mean squared reconstruction error with the raw mean
    vs 0.140 with the unit-projected centroid vs 0.107 plain — the
    near-uniform hash embeddings cap the residual gain at ~7%; on a
    properly clustered corpus the gap is ~3x, test-pinned). When the
    corpus is unit-norm (the cosine-metric convention) the raw centroid
    IS the mean of the normalized vectors."""
    cents = ivf.centroids
    ids = ivf.cluster_ids
    lut = np.zeros((max(ids) + 1, cents.shape[1]), dtype=np.float64)
    for row, cid in enumerate(ids):
        lut[cid] = cents[row]
    return lut


class IVFPQIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "ivfpq_meta.json")) as f:
            meta = json.load(f)
        self.id_col = meta["id_col"]
        self.vector_col = meta["vector_col"]
        self.m = meta["m"]
        self.dsub = meta["dsub"]
        self.ivf_path = meta["ivf_path"]
        self.codebooks = np.array(meta["codebooks"], dtype=np.float64)
        # OPQ rotation (d, d), or None for plain-PQ metas
        rot = meta.get("rotation")
        self.rotation = None if rot is None else np.array(rot, dtype=np.float64)
        # residual mode: codes quantize (x_norm - centroid[cluster])
        self.residual = bool(meta.get("residual", False))
        self.ivf = IVFIndex(spark, self.ivf_path)

    def _centroid_lookup(self) -> np.ndarray:
        return _centroid_lookup(self.ivf)

    @staticmethod
    def build(
        ivf: IVFIndex,
        path: str,
        m: int = 8,
        train_rows: int = 4096,
        iters: int = 12,
        seed: int = 42,
        opq_iters: int = 0,
        residual: bool = False,
    ) -> "IVFPQIndex":
        """Train PQ codebooks on a bounded driver-side sample of the IVF
        data (the same bounded-statistics-pass license as the IVF build
        itself), then Arrow-encode every row INSIDE its cluster partition
        and write codes partitioned by the same cluster_id. One scan, one
        partitioned write — no shuffle beyond the partitioning the IVF
        layout already established. ``opq_iters > 0`` trains an OPQ
        rotation first (operators/pq.py::opq_train) and encodes
        ``(x @ R)`` — the rotation lives entirely in the driver-side
        constants (codebooks, query table), so routing and the
        partition-pruned scan shape are untouched. ``residual=True`` is
        the FAISS IVFPQ default training target: codes quantize
        ``(x_norm − centroid[cluster])`` instead of x_norm — the
        displacement WITHIN a cluster is far smaller than the sphere, so
        the same 256-entry budget covers it much more finely (composes
        with OPQ: the rotation then trains on residuals)."""
        data = ivf.spark.read.parquet(ivf._data_path())
        cl_lut = _centroid_lookup(ivf) if residual else None
        rows = (
            data.select(ivf.vector_col, "cluster_id").limit(train_rows).collect()
        )
        sample = np.array([r[0] for r in rows], dtype=np.float64)
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        if residual:
            sample = sample - cl_lut[np.array([r[1] for r in rows], dtype=np.int64)]
        d = sample.shape[1]
        assert d % m == 0, f"dim {d} not divisible by m={m}"
        dsub = d // m
        rotation = None
        if opq_iters > 0:
            from chatdata_spark.operators.pq import opq_train

            rotation, books = opq_train(sample, m, iters=iters, seed=seed, opq_iters=opq_iters)
        else:
            books = np.stack(
                [
                    _kmeans_1d(sample[:, j * dsub : (j + 1) * dsub], 256, iters, seed + j)
                    for j in range(m)
                ]
            )
            if books.shape[1] < 256:
                pad = np.repeat(books[:, :1, :], 256 - books.shape[1], axis=1)
                books = np.concatenate([books, pad], axis=1)

        bks, mm, dd, rot, lut = books, m, dsub, rotation, cl_lut

        @F.pandas_udf("array<smallint>")
        def _encode(vecs: pd.Series, cids: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            if lut is not None:
                x = x - lut[cids.to_numpy(dtype=np.int64)]
            if rot is not None:
                x = x @ rot
            codes = np.empty((x.shape[0], mm), dtype=np.int64)
            for j in range(mm):
                sub = x[:, j * dd : (j + 1) * dd]
                cb = bks[j]
                d2 = -2.0 * (sub @ cb.T) + (cb**2).sum(axis=1)[None, :]
                codes[:, j] = d2.argmin(axis=1)
            return pd.Series([row.tolist() for row in codes])

        (
            data.select(
                F.col(ivf.id_col),
                F.col("cluster_id"),
                _encode(
                    F.col(ivf.vector_col).cast("array<float>"),
                    F.col("cluster_id").cast("long"),
                ).alias("codes"),
            )
            .repartition("cluster_id")
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(os.path.join(path, "codes"))
        )
        meta = {
            "id_col": ivf.id_col,
            "vector_col": ivf.vector_col,
            "m": m,
            "dsub": dsub,
            "ivf_path": ivf.path,
            "codebooks": [[list(map(float, c)) for c in book] for book in books],
            "rotation": None
            if rotation is None
            else [list(map(float, r)) for r in rotation],
            "residual": bool(residual),
        }
        tmp = os.path.join(path, "ivfpq_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "ivfpq_meta.json"))
        return IVFPQIndex(ivf.spark, path)

    def search(
        self,
        query_vec,
        k: int = 10,
        n_probe: int = 4,
        refine: int = 4,
        select=None,
    ) -> DataFrame:
        """Centroid-route → partition-pruned ADC code scan → exact rerank.

        1. rank centroids driver-side (a (n_clusters, d) GEMM on the
           meta constants, like IVFIndex.search);
        2. scan ONLY the probed clusters' code partitions
           (``cluster_id isin probes`` prunes parquet directories), score
           each row with m table lookups via one Arrow fancy-index pass;
        3. top ``k·refine`` by (adc, id) — a TakeOrderedAndProject heap —
           then exact cosine rerank against the raw vectors read from the
           IVF data tree pruned to the SAME probed clusters (candidates
           can only come from probed clusters, so the pruned rerank is
           exact; a full-table rerank scan would dominate the routed code
           scan's savings — measured 0.34 s → the pruned read at sf0.1),
           broadcast semi-join by id, tie-broken on id. Tombstoned ids
           (IVF deletes pending compact) are filtered from the candidate
           set, mirroring IVFIndex.search."""
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / np.linalg.norm(q)
        probes = self.ivf.rank_centroids(query_vec)[
            : max(1, min(n_probe, self.ivf.n_clusters))
        ]
        mm, dsub = self.m, self.dsub

        def _tab_for(qv: np.ndarray) -> np.ndarray:
            return np.stack(
                [
                    ((qv[j * dsub : (j + 1) * dsub][None, :] - self.codebooks[j]) ** 2).sum(
                        axis=1
                    )
                    for j in range(mm)
                ]
            )  # (m, 256)

        if self.residual:
            # per-probed-cluster tables: the code approximates the
            # residual, so the lookup target is (q − centroid[c]) —
            # n_probe × m × 256 driver-side floats, still tiny
            lut = self._centroid_lookup()
            tabs = np.zeros((max(probes) + 1, mm, 256), dtype=np.float64)
            for c in probes:
                qc = q - lut[c]
                if self.rotation is not None:
                    qc = qc @ self.rotation
                tabs[c] = _tab_for(qc)

            @F.pandas_udf("double")
            def _adc(codes: pd.Series, cids: pd.Series) -> pd.Series:
                c = np.array(codes.tolist(), dtype=np.int64)
                t = tabs[cids.to_numpy(dtype=np.int64)]  # (B, m, 256)
                return pd.Series(
                    np.take_along_axis(t, c[:, :, None], axis=2)[:, :, 0].sum(axis=1)
                )

            adc_expr = _adc("codes", F.col("cluster_id").cast("long"))
        else:
            # routing stays in the ORIGINAL space (centroids unrotated);
            # only the ADC table sees the rotated query
            qr = q if self.rotation is None else q @ self.rotation
            tab = _tab_for(qr)

            @F.pandas_udf("double")
            def _adc(codes: pd.Series) -> pd.Series:
                c = np.array(codes.tolist(), dtype=np.int64)
                return pd.Series(tab[np.arange(mm)[None, :], c].sum(axis=1))

            adc_expr = _adc("codes")

        codes = self.spark.read.parquet(os.path.join(self.path, "codes")).filter(
            F.col("cluster_id").isin(probes)
        )
        ts = self.ivf.tombstones()
        if ts is not None:
            codes = codes.join(F.broadcast(ts), self.id_col, "left_anti")
        cand = (
            codes.select(self.id_col, adc_expr.alias("__adc"))
            .orderBy(F.col("__adc").asc(), F.col(self.id_col).asc())
            .limit(int(k) * int(refine))
            .select(self.id_col)
        )
        raw = self.spark.read.parquet(self.ivf._data_path()).filter(
            F.col("cluster_id").isin(probes)  # same directory pruning as the codes
        )
        rerank = raw.join(F.broadcast(cand), self.id_col, "left_semi")
        out = rerank.withColumn(
            "dist", F.round(cosine_distance(F.col(self.vector_col), [float(v) for v in q]), 6)
        )
        cols = list(select) if select is not None else [self.id_col]
        return (
            out.orderBy(F.col("dist").asc(), F.col(self.id_col).asc())
            .limit(int(k))
            .select(*cols, "dist")
        )


def build_or_load_ivfpq(
    ivf: IVFIndex, path: str, m: int = 8, opq_iters: int = 0, residual: bool = False
) -> IVFPQIndex:
    """Idempotent build, same convention as build_or_load_ivf/pq."""
    if os.path.exists(os.path.join(path, "ivfpq_meta.json")):
        return IVFPQIndex(ivf.spark, path)
    os.makedirs(path, exist_ok=True)
    return IVFPQIndex.build(
        ivf, path, m=m, opq_iters=opq_iters, residual=residual
    )
