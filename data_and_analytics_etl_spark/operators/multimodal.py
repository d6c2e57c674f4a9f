"""Multimodal column support: opaque binary payloads + typed metadata.

Design (mandate: "treat image/audio/video as opaque binary columns with
typed metadata"):
- an asset row = (asset_id, modality, payload BINARY, meta STRUCT) —
  the schema below. Raw media travels as bytes; Spark shuffles/stores
  binary natively, so partitioning, joins and sinks all work unchanged.
- decode / feature-extract run as Arrow-batched ``mapInPandas`` stages:
  one Python process per partition, one pandas batch per Arrow chunk —
  the only sane shape for per-asset Python at scale (row-at-a-time UDFs
  are 10-100x slower).
- real codecs (PIL/librosa/av) are not in this container; the codec
  boundary is isolated in ``_decode_payload`` which raises
  ``NotImplementedError`` unless the library import succeeds, while the
  deterministic fallback feature extractor keeps the Spark-side plumbing
  (schema, batching, partitioning) fully real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StringType,
                               StructField, StructType)

#: Canonical multimodal asset schema.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),   # image|audio|video|text
    StructField("payload", BinaryType(), True),      # opaque encoded bytes
    StructField("meta", StructType([
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),       # image/video
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),  # audio
        StructField("duration_s", DoubleType(), True),  # audio/video
    ]), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("byte_entropy", DoubleType(), False),
    StructField("feat_mean", DoubleType(), False),
    StructField("feat_std", DoubleType(), False),
])


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: build an asset table from the `documents` corpus.

    Payload = utf-8 bytes of the text (a stand-in for encoded media with
    identical Spark-side behavior: opaque, variable-length, binary).
    Modality is assigned round-robin so every branch of the pipeline is
    exercised deterministically.
    """
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.when(F.col("doc_id") % 3 == 0,
                   (F.col("n_chars") % 1920).cast("long")).alias("width"),
            F.when(F.col("doc_id") % 3 == 0,
                   (F.col("n_chars") % 1080).cast("long")).alias("height"),
            F.when(F.col("doc_id") % 3 == 1, F.lit(16000).cast("long"))
             .alias("sample_rate"),
            F.when(F.col("doc_id") % 3 != 0,
                   F.round(F.col("n_chars") / 100.0, 2).cast("double"))
             .alias("duration_s"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes, modality: str):
    """Codec boundary. Real decode needs PIL/librosa/av — absent here."""
    try:
        if modality == "image":
            import PIL.Image  # noqa: F401
        elif modality in ("audio", "video"):
            import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"no codec library for modality={modality!r} in this "
            "environment; use extract_features (deterministic byte-level "
            "fallback) for pipeline plumbing")
    raise NotImplementedError("real decode path not implemented")


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset features via Arrow-batched ``mapInPandas``.

    The fallback featurizer is deterministic byte statistics (length,
    entropy, mean/std of the byte stream) so tests pin exact values; a
    real deployment swaps ``_featurize_batch``'s body for decoded-media
    features without touching the Spark plumbing around it.
    """
    import numpy as np
    import pandas as pd

    def _featurize_batch(batches: Iterator[pd.DataFrame],
                         ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, modality, payload in zip(
                    pdf["asset_id"], pdf["modality"], pdf["payload"]):
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                n = int(b.size)
                if n:
                    counts = np.bincount(b, minlength=256)
                    p = counts[counts > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                    mean, std = float(b.mean()), float(b.std())
                else:
                    entropy = mean = std = 0.0
                out.append((int(asset_id), modality, n,
                            round(entropy, 6), round(mean, 6), round(std, 6)))
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return (assets
            .select("asset_id", "modality", "payload")
            .mapInPandas(_featurize_batch, schema=FEATURE_SCHEMA))
