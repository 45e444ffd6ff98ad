"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, with decode/feature-extraction as Arrow-batched UDFs.

The container has no image/audio codecs, so the decode kernel is
STUBBED (``decode_image`` raises ``NotImplementedError``; the feature
extractor uses a deterministic md5-derived fake) — but the Spark-side
plumbing is real and tested: binary columns, schema, ``mapInPandas``
batch shape, and partitioning are exactly what a libjpeg/ffmpeg-backed
kernel would drop into.

The ``media`` corpus is derived deterministically from ``documents``
(payload = utf-8 bytes of the text), so metadata ops have a DuckDB
oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_DIM = 8

MEDIA_SCHEMA = "doc_id bigint, payload binary, mime string"
FEATURES_SCHEMA = "doc_id bigint, n_bytes int, feature array<float>"


def media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media(doc_id, payload binary, mime)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.concat(F.lit("image/"), F.col("source")).alias("mime"),
    )


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Decode stub: a real deployment plugs PIL/libjpeg here. The
    container ships no codecs, so this fails loudly instead of faking
    pixel data."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment"
    )


def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column — pure JVM expressions
    (length/md5 on binary), no Python."""
    m = media_corpus(spark, sf_dir)
    return m.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "mime",
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats, sizes = [], []
        for payload in pdf["payload"]:
            raw = bytes(payload) if payload is not None else b""
            digest = hashlib.md5(raw).digest()
            feats.append([(digest[i] - 128) / 128.0 for i in range(FEATURE_DIM)])
            sizes.append(len(raw))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "n_bytes": sizes, "feature": feats}
        )


def extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    the deterministic stand-in for a vision encoder. Only (doc_id,
    payload) cross the Arrow boundary. Returns the real
    ``array<float>`` feature column (the shape a downstream ANN stage
    consumes)."""
    m = media_corpus(spark, sf_dir).select("doc_id", "payload")
    return m.mapInPandas(_feature_batches, schema=FEATURES_SCHEMA)


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded surface for :func:`extract_features`: the float feature
    vector is re-quantized to its source bytes (feature = (b-128)/128
    is exact in float32, so ``round(x*128)+128`` recovers b exactly)
    and serialized — the driver's comparator cannot hash list cells,
    and fixed-point ints avoid cross-engine float formatting."""
    feats = extract_features(spark, sf_dir)
    quant = F.transform(
        F.col("feature"),
        lambda x: (F.round(x.cast("double") * 128) + 128).cast("int").cast("string"),
    )
    return feats.select(
        "doc_id", "n_bytes", F.concat_ws(",", quant).alias("feature_q")
    )
