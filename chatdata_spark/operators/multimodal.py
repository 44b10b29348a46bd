"""Multimodal column support (north-star extension): image/audio/video as
opaque ``binary`` columns with typed metadata structs, processed by
Arrow-batched UDFs.

The decode step is a STUB: real decoders (PIL/librosa/av) are not in this
container. ``try: import PIL`` gates the real path; the fallback derives
deterministic pseudo-metadata/features from the bytes so the Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures — is real
and testable end-to-end, and the arithmetic is simple enough for the DuckDB
oracle to recompute.

Scale shape: decode/feature-extract are ``mapInPandas`` passes (one Arrow
batch of binaries in, one batch of structs/vectors out) — embarrassingly
parallel, no shuffle; downstream joins treat the media table like any
other (id, features) table, so dedup/ANN reuse the existing operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - decoders absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = "media_id bigint, content binary, media_type string"
META_SCHEMA = "media_id bigint, media_type string, width int, height int, n_frames int, n_bytes int"

# stub constants (documented so the oracle can mirror them)
W_MULT, H_MULT, W_MOD, H_MOD, W_BASE, H_BASE = 7919, 104729, 448, 448, 64, 64
FEAT_DIM, FEAT_MULTS = 8, (3, 5, 7, 11, 13, 17, 19, 23)


def decode_metadata(media_df: DataFrame, decoder=None) -> DataFrame:
    """'Decode' each binary into typed media metadata.

    ``decoder``: injectable ``(content: bytes, media_type: str) ->
    (width, height, n_frames)`` — a PIL-backed one is auto-wired when PIL
    is importable, and tests inject fakes through the same seam (the
    callable is pickled by value into the Arrow worker closure, so any
    model/library handle it captures ships with it). ``None`` without PIL
    falls back to deterministic byte-length arithmetic, keeping the
    schema/batch plumbing identical and the values oracle-recomputable."""
    if decoder is None and HAVE_PIL:  # pragma: no cover - PIL absent here

        def decoder(content: bytes, media_type: str):
            import io

            from PIL import Image

            im = Image.open(io.BytesIO(content))
            return im.width, im.height, int(getattr(im, "n_frames", 1))

    if decoder is not None:
        dec = decoder

        def gen_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                metas = [dec(bytes(c), t) for c, t in zip(pdf["content"], pdf["media_type"])]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "media_type": pdf["media_type"],
                        "width": pd.Series([m[0] for m in metas], dtype="int32"),
                        "height": pd.Series([m[1] for m in metas], dtype="int32"),
                        "n_frames": pd.Series([m[2] for m in metas], dtype="int32"),
                        "n_bytes": pdf["content"].map(len).astype("int32"),
                    }
                )

        return media_df.mapInPandas(gen_real, META_SCHEMA)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": (W_BASE + (n * W_MULT) % W_MOD).astype("int32"),
                    "height": (H_BASE + (n * H_MULT) % H_MOD).astype("int32"),
                    "n_frames": np.where(pdf["media_type"] == "video", 1 + n % 30, 1).astype("int32"),
                    "n_bytes": n.astype("int32"),
                }
            )

    return media_df.mapInPandas(gen, META_SCHEMA)


def extract_features(media_df: DataFrame, dim: int = FEAT_DIM, featurizer=None) -> DataFrame:
    """Feature vectors from binaries (the embed step of an image pipeline).

    ``featurizer``: injectable ``(content: bytes) -> list[float]`` (a model
    forward pass in deployment — captured by value into the worker
    closure). Default: dim scaled residues of the byte length — the
    (binary batch → float vector batch) contract is the real one."""
    if featurizer is not None:
        feat = featurizer

        def gen_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                feats = [[float(x) for x in feat(bytes(c))] for c in pdf["content"]]
                yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

        return media_df.mapInPandas(gen_real, "media_id bigint, features array<float>")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].map(len).astype("int64")
            feats = [
                [float((int(x) * m) % 1000) / 1000.0 for m in FEAT_MULTS[:dim]] for x in n
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media_df.mapInPandas(gen, "media_id bigint, features array<float>")


def resize_stub(media_df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: binary→binary pass-through with updated metadata
    (a real impl re-encodes pixels; the schema contract is identical)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"],
                    "media_type": pdf["media_type"],
                    "width": np.full(len(pdf), target_w, dtype="int32"),
                    "height": np.full(len(pdf), target_h, dtype="int32"),
                }
            )

    return media_df.mapInPandas(
        gen, "media_id bigint, content binary, media_type string, width int, height int"
    )


def frame_sample(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index —
    a 1→N mapInPandas expansion (the real decoder yields frame bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].map(len).astype("int64")
            rows = []
            for mid, frames in zip(pdf["media_id"], 1 + n % 30):
                for f in range(0, int(frames), every_n):
                    rows.append((int(mid), f))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx"])

    return media_df.filter(F.col("media_type") == "video").mapInPandas(
        gen, "media_id bigint, frame_idx int"
    )


def docs_as_media(spark, sf_dir: str) -> DataFrame:
    """Adapter: treat the documents table's text bytes as opaque media
    binaries (deterministic test corpus for the pipeline — real deployments
    read ``spark.read.format('binaryFile')``)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.when(F.col("doc_id") % 3 == 0, "video").otherwise("image").alias("media_type"),
    )
