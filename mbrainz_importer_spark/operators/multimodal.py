"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas transforms.

The Spark-side contract is real and tested — schema, partitioning, UDF
signatures, batch shapes. The actual codecs (PIL/ffmpeg/librosa) are NOT
in this container, so decode is STUBBED: `decode_image_meta` falls back to
a deterministic fake decoder (content-hash-derived dimensions) and
`decode_image_pixels` raises NotImplementedError unless a real codec
import succeeds. Swapping in the real codec changes only the inner
function body — the distributed plumbing is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), False),
    T.StructField("mime", T.StringType(), True),
])

META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("content_md5", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

try:  # real codec gate — absent in this container by design
    from PIL import Image  # noqa: F401

    _HAS_CODEC = True
except ImportError:
    _HAS_CODEC = False


def text_as_assets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo feed: treat utf-8 text bytes as opaque binary assets. In
    production this is `spark.read.format('binaryFile')` or a parquet
    table with a binary column."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_dims(digest: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded image dimensions."""
    return 16 + int(digest[:4], 16) % 2048, 16 + int(digest[4:8], 16) % 2048


def decode_image_meta(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary content. The pandas
    iterator shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) is
    the real production plumbing; only the decode body is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["content"].map(lambda b: hashlib.md5(b).hexdigest())
            dims = digests.map(_fake_dims)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "byte_len": pdf["content"].map(len).astype("int64"),
                "content_md5": digests,
                "width": dims.map(lambda t: t[0]).astype("int32"),
                "height": dims.map(lambda t: t[1]).astype("int32"),
            })

    return assets.mapInPandas(run, schema=META_SCHEMA)


def decode_image_pixels(assets: DataFrame) -> DataFrame:
    """Real pixel decode — requires an image codec."""
    if not _HAS_CODEC:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install PIL and replace the stub body"
        )
    raise NotImplementedError("real decode path intentionally deferred")


def frame_sample_stub(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over binary content: deterministic byte-stride
    sampling standing in for video frame extraction; demonstrates the
    explode-to-frames schema (one row per sampled frame)."""
    return (
        decode_image_meta(assets)
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.col("byte_len") - 1) / every_n_bytes).cast("long"),
                )
            ).alias("frame_no"),
        )
        .withColumn("frame_no", F.col("frame_no").cast("int"))
    )
