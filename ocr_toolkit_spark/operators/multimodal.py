"""Multimodal column plumbing: opaque `binary` media + typed metadata.

Images/audio/video ride as `binary` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The image/audio codec libraries are NOT in this
container, so the codec call itself is stubbed behind
`DETERMINISTIC_FAKE` (seed-free, content-derived — stable across runs) or
raises NotImplementedError when a real decode is demanded; everything
Spark-side — schema, batch shape, partitioning, UDF signatures — is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB: no codec libraries in this container. Produces a deterministic
    content-derived pseudo-feature so the distributed plumbing is testable.
    A real deployment swaps this single function for PIL/torchaudio/ffmpeg.
    """
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def real_decode(payload: bytes, media_type: str) -> np.ndarray:
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/torchaudio) are not installed in this "
        "environment; use the deterministic stub path"
    )


def extract_media_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """media table → per-item feature rows. One Arrow-batched stage; the
    decode call is per item (codecs are per-buffer by nature) but hashing
    and feature packing stay NumPy-vectorized."""
    decode = _decode_stub if use_stub else real_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [
                decode(p if p is not None else b"", mt)
                for p, mt in zip(payloads, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0)
                    .astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.select("media_ref", "media_type", "payload").mapInPandas(
        fn, FEATURES_SCHEMA
    )


def join_media_to_spans(extracted: DataFrame, media: DataFrame) -> DataFrame:
    """Explode image spans out of extraction output and attach media rows —
    the seam between the text pipeline and the media pipeline. Media dim is
    usually the smaller side at a given batch → broadcast hint."""
    img = (
        extracted.select("doc_id", F.explode("out_spans").alias("s"))
        .filter(F.col("s.kind") == "image")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                F.col("s.order").alias("order"))
    )
    return img.join(F.broadcast(media), "media_ref", "left")
