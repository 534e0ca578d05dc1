"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus Arrow-batched feature extraction over
``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, Arrow
batch shape — is real and tested; the codec-dependent decode step (PIL /
ffmpeg etc. are not in this container) is STUBBED behind
``decode_payload`` which raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (payload byte
histogram) stands in so the distributed path is exercisable end-to-end.

Design for 100 TB: payloads stay in parquet binary columns (or external
object-store paths for >1 MB assets — the ``asset_uri`` column); metadata
(modality, width/height/duration, sha) is columnar and prunable, so
metadata-only queries never touch payload bytes (column pruning).  Feature
extraction is ``mapInPandas`` with bounded Arrow batches so executor
memory is payload-batch-sized, and the output is a fixed-width
``array<double>`` feature vector that flows straight into simsearch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id long, modality string, asset_uri string, payload binary, "
    "mime string, width int, height int, duration_ms int, payload_sha256 string"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = "asset_id long, modality string, n_bytes long, features array<double>"


def decode_payload(payload: bytes, modality: str, fake: bool = False) -> np.ndarray:
    """Decode one asset to a numeric array.  REAL DECODE NOT AVAILABLE in
    this container (no PIL/ffmpeg): raises unless fake=True, which returns
    the deterministic 16-bin byte histogram (density) instead."""
    if not fake:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pass fake=True "
            "for the deterministic byte-histogram stand-in"
        )
    arr = np.frombuffer(payload or b"", dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return hist.astype(np.float64) / arr.size


def synth_media(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents table:
    payload = utf-8 bytes of the text (stands in for encoded pixels).
    Demonstrates the binary-column schema + metadata columns."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.concat(F.lit("synth://"), F.col("doc_id").cast("string")).alias("asset_uri"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.col("doc_id"), F.lit(640)) + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(480)) + 48).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.sha2(F.encode(F.col("text"), "utf-8"), 256).alias("payload_sha256"),
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction: mapInPandas over (asset_id,
    modality, payload) only (column pruning keeps metadata out of the
    exchange).  Output feeds simsearch.brute_force_topk directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(p, m, fake=fake).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("asset_id", "modality", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def filter_valid_images(
    media: DataFrame, min_width: int = 100, min_height: int = 100
) -> DataFrame:
    """F13 — the reference's image validity filter
    (services/image-indexer/utils/utils.py:36-43 + main.py:143-155):
    keep assets with width and height >= 100, drop SVGs and anything from
    an 'icons' path.  Pure metadata-column predicate — payload bytes are
    never touched (column pruning), so the filter pushes into the parquet
    scan."""
    return media.filter(
        (F.col("width") >= min_width)
        & (F.col("height") >= min_height)
        & ~F.lower(F.col("asset_uri")).endswith(".svg")
        & ~F.lower(F.col("asset_uri")).contains("icons")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (explode over a sequence) — the decode itself is the stubbed
    step.  Shows the row-multiplying plan shape Catalyst handles (no data
    moves until a decoder fills frames in)."""
    dur = F.coalesce(F.col("duration_ms"), (F.pmod(F.col("asset_id"), F.lit(5)) + 1) * 1000)
    return media.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), dur - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
