"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode/feature libraries (PIL/ffmpeg/librosa) are not in this container,
so the *decode kernels* are stubbed deterministically — but the Spark-side
plumbing (schemas, Arrow batch shapes, mapInPandas partitioning) is real and
tested.  Swapping a stub for a real decoder changes one function body, not
the pipeline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

#: canonical multimodal asset schema: binary payload + typed metadata.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("media_type", StringType()),    # e.g. image/png
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])


def synthesize_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table (payload = hashed bytes) for tests."""
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("modality"),
        F.lit("application/octet-stream").alias("media_type"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias("payload"),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        (F.col("id") * 40 + 1000).alias("duration_ms"),
    )
    return df


try:  # decode backend gated on availability, not hard-stubbed
    from PIL import Image as _PILImage  # noqa: N811
except ImportError:
    _PILImage = None


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to a PIL Image when PIL is available;
    otherwise raise with a clear installation hint.  The Spark-side plumbing
    (binary column → mapInPandas batch → typed features) is identical either
    way — only this per-payload kernel call changes with the environment."""
    if _PILImage is None:
        raise NotImplementedError(
            "image decode requires Pillow (pip install Pillow); "
            "feature extraction runs with the digest kernel meanwhile")
    import io as _io

    return _PILImage.open(_io.BytesIO(payload))


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Decode → resize → re-encode (PNG); PIL-gated like decode_image."""
    if _PILImage is None:
        raise NotImplementedError("image resize requires Pillow")
    import io as _io

    img = _PILImage.open(_io.BytesIO(payload)).resize((width, height))
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),
    StructField("feat_dim", IntegerType()),
    StructField("feature", StringType()),   # hex digest standing in for a tensor
])


def extract_features(assets: DataFrame, batch_size: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The kernel is the real shape (Arrow batches of binary columns → feature
    rows); the per-payload transform is a deterministic digest standing in for
    a model forward pass.
    """

    def kernel(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            feats = [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "feat_dim": [32] * len(pdf),
                "feature": feats,
            })

    return assets.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (asset, frame timestamp).

    Pure ``sequence``/``explode`` — demonstrates how a 100 TB video corpus
    fans out to frame work-items without any Python in the planning path.
    """
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ms"),
        )
    )
