"""Multimodal column plumbing (SURVEY.md §7.6): image/audio/video as
opaque ``binary`` columns with typed metadata, processed in Arrow-batched
mapInPandas stages.

The Spark-side mechanics here are real and tested — schema shape,
partition-preserving batch processing, UDF signatures, deterministic
outputs. The actual media DECODING is stubbed: the runtime container has no
image/audio libraries, so ``decode_image`` raises NotImplementedError
unless a decoder is injected, and the default feature extractor computes
deterministic byte-level features (size, byte histogram entropy, simple
checksum) that stand in for real embeddings without pretending to be them.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata travelling with every media blob.
MEDIA_META_FIELDS = [
    StructField("media_type", StringType()),     # 'image' | 'audio' | 'video'
    StructField("format", StringType()),         # 'png', 'wav', ...
    StructField("width", IntegerType()),         # nullable for audio
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
]

FEATURE_FIELDS = [
    StructField("byte_entropy", DoubleType()),
    StructField("checksum", LongType()),
]


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media: the utf-8 bytes of a text column stand in
    for an encoded blob (same shape/nullability as a real corpus). Keeps
    the whole downstream path testable without media files."""
    return df.withColumn("media_bytes", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("image")
    ).withColumn("format", F.lit("fake")).withColumn(
        "n_bytes", F.octet_length(F.col("media_bytes")).cast("long")
    )


def decode_image(blob: bytes, fmt: str) -> "object":
    """Stub: real decoding needs an image library not present in this
    container. Inject a decoder into extract_features for real deployments."""
    raise NotImplementedError(
        "image decoding requires an image library (e.g. Pillow); "
        "inject `decoder=` into extract_features"
    )


def extract_features(
    df: DataFrame,
    blob_col: str = "media_bytes",
    decoder: Callable[[bytes, str], object] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow moves the blobs to Python in columnar batches (no per-row
    serialization); output schema = input + feature columns. With a real
    ``decoder`` injected, decoded frames feed the feature fn; without one,
    deterministic byte-level features are produced (decode stays stubbed).
    """
    out_schema = StructType(list(df.schema.fields) + FEATURE_FIELDS)

    # The closure must be self-contained (stdlib + numpy only): mapInPandas
    # ships it to Python workers by value, and workers may not have this
    # package on their import path.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import math as _math

        import numpy as _np

        def entropy(b: bytes) -> float:
            # Histogram entropy with a DETERMINISTIC summation contract:
            # terms accumulate in ascending byte value with libm log2, the
            # exact fold order and primitive the DuckDB oracle uses
            # (numpy's SIMD log2/pairwise sum can drift a ulp and cross
            # the 6dp rounding boundary). ≤256 terms per row.
            if not b:
                return 0.0
            arr = _np.frombuffer(b, dtype=_np.uint8)
            counts = _np.bincount(arr, minlength=256)
            n = arr.size
            acc = 0.0
            for c in counts[counts > 0]:
                p = c / n
                acc += -(p * _math.log2(p))
            return round(acc, 6)

        def checksum(b: bytes) -> int:
            # 60-bit md5 prefix — reproducible in any engine with md5
            # (DuckDB: CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)).
            return int(_hashlib.md5(b).hexdigest()[:15], 16)

        for pdf in batches:
            ent, chk = [], []
            for blob in pdf[blob_col]:
                b = bytes(blob) if blob is not None else b""
                if decoder is not None:
                    decoder(b, "fake")  # decoded object would feed real features
                ent.append(entropy(b))
                chk.append(checksum(b))
            pdf["byte_entropy"] = ent
            pdf["checksum"] = chk
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Plumbing for a resize stage: passes blobs through and records the
    requested geometry in metadata (real resize needs a decoder)."""
    return df.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))
