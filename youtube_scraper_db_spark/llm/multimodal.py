"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched stages.

The container has no image/audio libraries, so the decode kernels are
STUBBED (deterministic fakes clearly marked, or NotImplementedError when
``strict=True``) — but the Spark-side plumbing is real and tested: schema,
partition sizing, ``mapInPandas`` batch shape, and metadata extraction all
work exactly as they would with PIL/ffmpeg plugged into the kernel.

Scale notes: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so a partition holds a
bounded number of blobs; never groupBy a binary column (hash the bytes
first); push metadata-only predicates before any decode stage so pruning
happens on the cheap columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media-asset schema: payload + typed metadata side-car.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap a column as a media asset: payload → binary + computed metadata
    (byte length, content hash). All JVM-side expressions."""
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload.cast("binary").alias("content"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.lower(F.sha2(payload.cast("binary"), 256)).alias("sha256"),
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, float]:
    """STUB image decode: deterministic pseudo-dimensions derived from the
    content hash. Replace the body with ``PIL.Image.open(io.BytesIO(...))``
    when the imaging stack is available — the signature and batch shape are
    what a real kernel uses."""
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def decode_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Per-asset image feature extraction over ``mapInPandas`` (Arrow
    batches of blobs in, feature rows out). ``strict=True`` raises
    NotImplementedError where a real decoder belongs, proving the stub is
    never silently trusted in production paths."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401  (not in this container)

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            if strict and not have_pil:
                raise NotImplementedError(
                    "real image decode requires PIL; stub disabled in strict mode"
                )
            rows = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_luma": [r[2] for r in rows],
                }
            )

    return media.select("asset_id", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 3) -> DataFrame:
    """STUB video frame sampler: one output row per sampled frame (the
    1→N fan-out shape of real frame extraction). Frame payload hashes are
    derived deterministically from (content, frame_no); a real kernel
    would emit decoded JPEG bytes instead."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_hashes = [], [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for i in range(max_frames):
                    frame_no = i * every_n
                    # ASCII frame tag (not raw bytes) so the digest is
                    # reproducible by any engine's sha256(string) — which
                    # is what lets the registry oracle-check this kernel.
                    digest = hashlib.sha256(
                        (content or b"") + f":{frame_no}".encode()
                    ).hexdigest()
                    out_ids.append(aid)
                    out_nos.append(frame_no)
                    out_hashes.append(digest)
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_no": out_nos, "frame_sha256": out_hashes}
            )

    return media.select("asset_id", "content").mapInPandas(
        kernel, schema=FRAME_SAMPLE_SCHEMA
    )
