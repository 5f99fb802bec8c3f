"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata (BASELINE north star).

The decode step is STUBBED (no image/audio libs in this container):
``decode_images(..., fake=True)`` produces deterministic fake features
so the Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partitioning — is real and tested; ``fake=False`` raises
``NotImplementedError`` at the exact seam where Pillow/librosa/ffmpeg
would plug in.

Scale notes: binary payloads ride in parquet as-is (no row-group
bloat if media is chunked < ~64 MB); decode is a mapInPandas stage —
embarrassingly parallel, Arrow-batched, no shuffle; frame sampling is
an explode (flatMap) whose output is repartitionable downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_TYPE",
    "attach_fake_media",
    "decode_images",
    "sample_frames",
    "resize_images",
    "audio_features",
    "write_blob_landing",
    "read_blob_landing",
]

#: typed metadata carried alongside every opaque media payload
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def write_blob_landing(
    df: DataFrame,
    blob_dir: str,
    id_col: str = "doc_id",
    payload_col: str = "text",
) -> int:
    """Executor-side blob write: one ``<id>.bin`` object per row under
    ``blob_dir``.  Writes through POSIX ``open()``, so ``blob_dir``
    must be a path every executor can mount — a shared filesystem
    (NFS/Lustre) on a cluster, a tempdir in local mode; never an
    executor-local path the driver can't list (VERDICT r01 #8).
    ``s3a://``/``hdfs://`` URIs are NOT writable from executor Python
    (no JVM gateway there) — landing blobs in an object store is the
    producer's job (assets normally already live in the bucket); this
    operator exists to materialize test corpora and round-trip the
    binaryFile ingestion path.  Returns rows written."""

    def _write(it: Iterator) -> Iterator:
        import os as _os

        import pandas as _pd

        _os.makedirs(blob_dir, exist_ok=True)
        for pdf in it:
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                data = (
                    bytes(payload)
                    if isinstance(payload, (bytes, bytearray))
                    else str(payload).encode("utf-8")
                )
                with open(_os.path.join(blob_dir, f"{key}.bin"), "wb") as fh:
                    fh.write(data)
            yield _pd.DataFrame({"n": [len(pdf)]})

    n = (
        df.select(id_col, payload_col)
        .mapInPandas(_write, "n long")
        .agg(F.sum("n"))
        .first()[0]
    )
    return int(n or 0)


def read_blob_landing(spark, blob_dir: str) -> DataFrame:
    """binaryFile ingestion of a blob landing dir: (blob_id, doc_id,
    n_bytes, content, path) — content + length arrive JVM-side, no
    Python in the read path.  ``blob_id`` is the raw object name
    (string, works for any id the producer used); ``doc_id`` is its
    numeric form (``try_cast`` → NULL for non-numeric names — join on
    blob_id in that case).  Scale: the source lists + splits files
    across executors; pair with ``pathGlobFilter``/partitioned landing
    prefixes for 10^9-object buckets."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")  # blobs only: skip markers,
        .load(blob_dir)  # _SUCCESS files, and any other bucket debris
    )
    blob_id = F.regexp_extract(F.col("path"), r"([^/]+)\.bin$", 1)
    return blobs.select(
        blob_id.alias("blob_id"),
        blob_id.try_cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
        F.col("path"),
    )


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media: payload = sha2 bytes of the id (stand-in
    for real image bytes), metadata derived from the id.  Lets every
    downstream operator run without real media libs."""
    idc = F.col(id_col)
    payload = F.sha2(idc.cast("string"), 256).cast("binary")
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        (F.pmod(idc, F.lit(64)) + 32).cast("int").alias("width"),
        (F.pmod(idc, F.lit(48)) + 24).cast("int").alias("height"),
        (F.pmod(idc, F.lit(16)) + 1).cast("int").alias("n_frames"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_images(
    df: DataFrame, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Decode/feature-extract stage over (media, media_meta).

    Arrow-batched mapInPandas; with ``fake=True`` emits deterministic
    8-dim features from the payload bytes.  ``fake=False`` is the seam
    for a real decoder (Pillow etc.) — not available in this container.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires Pillow/opencv — not present in "
            "this environment; pass fake=True for the deterministic stub"
        )

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload: bytes = row["media"]
                meta = row["media_meta"]
                digest = hashlib.sha256(payload).digest()
                feat = [b / 255.0 for b in digest[:8]]
                out.append(
                    (
                        int(row[id_col]),
                        int(meta["width"]),
                        int(meta["height"]),
                        sum(payload) / len(payload) if len(payload) else 0.0,
                        feat,
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "mean_byte", "feature"]
            )

    return df.select(id_col, "media", "media_meta").mapInPandas(
        _decode, _DECODE_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame
    index (explode of a sequence — flatMap, no shuffle)."""
    nf = F.col("media_meta")["n_frames"]
    idxs = F.filter(
        F.sequence(F.lit(0), nf - 1),
        lambda i: i % every_n == 0,
    )
    return df.select(
        F.col(id_col),
        F.explode(idxs).alias("frame_idx"),
        F.col("media"),
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META_TYPE),
    ]
)


def resize_images(
    df: DataFrame, scale: float = 0.5, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Resize stage: binary → binary with updated typed metadata.

    Arrow-batched mapInPandas; ``fake=True`` derives the resized payload
    deterministically (sha256 of payload + target dims — the stand-in
    for real pixel resampling), halving width/height.  ``fake=False`` is
    the Pillow seam.  The media column stays opaque binary end-to-end,
    so the stage chains with :func:`decode_images` unchanged.
    """
    if not fake:
        raise NotImplementedError(
            "real resize requires Pillow/opencv — not present in this "
            "environment; pass fake=True for the deterministic stub"
        )

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["media_meta"]
                w = max(int(meta["width"] * scale), 1)
                h = max(int(meta["height"] * scale), 1)
                payload: bytes = row["media"]
                new_payload = hashlib.sha256(
                    payload + f"{w}x{h}".encode()
                ).hexdigest().encode()
                out.append(
                    (
                        int(row[id_col]),
                        new_payload,
                        {
                            "format": meta["format"],
                            "width": w,
                            "height": h,
                            "n_frames": int(meta["n_frames"]),
                            "sample_rate": int(meta["sample_rate"]),
                        },
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "media", "media_meta"])

    return df.select(id_col, "media", "media_meta").mapInPandas(
        _resize, _RESIZE_SCHEMA
    )


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_energy", T.ArrayType(T.DoubleType())),
    ]
)


def audio_features(
    df: DataFrame,
    frame_size: int = 16,
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Audio feature-extract stage: framed energy over the sample stream.

    ``fake=True`` treats the payload bytes as the sample stream and
    emits per-frame mean byte energy (frame = ``frame_size`` bytes) —
    the deterministic stand-in for PCM decode + RMS frames.
    ``fake=False`` is the librosa/ffmpeg seam.
    """
    if not fake:
        raise NotImplementedError(
            "real audio decode requires librosa/ffmpeg — not present in "
            "this environment; pass fake=True for the deterministic stub"
        )

    def _frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload: bytes = row["media"]
                frames = [
                    payload[i : i + frame_size]
                    for i in range(0, len(payload), frame_size)
                ]
                energy = [sum(f) / len(f) for f in frames if len(f)]
                out.append((int(row[id_col]), len(energy), energy))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_frames", "frame_energy"]
            )

    return df.select(id_col, "media").mapInPandas(_frames, _AUDIO_SCHEMA)
