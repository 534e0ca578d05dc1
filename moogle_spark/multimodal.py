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


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Pure-numpy BMP writer: (h, w, 3) uint8 RGB top-down -> 24-bit
    uncompressed BITMAPINFOHEADER bytes (bottom-up rows, BGR channel
    order, rows padded to 4 bytes — the on-disk format every BMP reader
    expects)."""
    import struct

    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + rows.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """Pure-numpy BMP reader for 24-bit uncompressed bottom-up bitmaps
    (the subset encode_bmp writes; anything else raises).  Returns
    (h, w, 3) uint8 RGB top-down."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if bpp != 24 or compression != 0 or h <= 0 or hdr_size < 40:
        raise NotImplementedError(
            f"only 24-bit uncompressed bottom-up BMPs supported (bpp={bpp}, "
            f"compression={compression}, height={h})"
        )
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # back to top-down RGB


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Pure-numpy WAV writer: int16 mono PCM, canonical 44-byte header."""
    import struct

    assert samples.dtype == np.int16
    data = samples.tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Pure-numpy WAV reader: walks RIFF chunks to the fmt and data
    chunks; returns (sample_rate, int16 samples).  Only PCM16 mono is
    supported (what encode_wav writes); anything else raises."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    off, rate, channels, bits, fmt_code = 12, None, None, None, None
    while off + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, off)
        body = off + 8
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", buf, body)
            bits = struct.unpack_from("<H", buf, body + 14)[0]
        elif cid == b"data":
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 mono supported (fmt={fmt_code}, ch={channels}, bits={bits})"
                )
            return rate, np.frombuffer(buf, dtype="<i2", count=size // 2, offset=body)
        off = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV data chunk not found")


def decode_payload(payload: bytes, modality: str, fake: bool = False) -> np.ndarray:
    """Decode one asset to a numeric array.

    REAL decode path (fake=False): pure-numpy container parsers —
    BMP (24-bit uncompressed) -> raveled RGB pixel values, WAV (PCM16
    mono) -> samples — both round-trip-exact against their encoders
    (tests/test_multimodal_streaming.py).  Codecs that genuinely need
    external libraries (JPEG/PNG/MP3/H.264 — no PIL/ffmpeg in this
    container) still raise NotImplementedError.

    fake=True keeps the deterministic 16-bin byte histogram stand-in
    (used where a fixed-width feature is wanted without decoding)."""
    if fake:
        arr = np.frombuffer(payload or b"", dtype=np.uint8)
        if arr.size == 0:
            return np.zeros(FEATURE_DIM, dtype=np.float64)
        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
        return hist.astype(np.float64) / arr.size
    head = bytes(payload[:12] if payload else b"")
    if head[:2] == b"BM":
        return decode_bmp(payload).astype(np.float64).ravel()
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return decode_wav(payload)[1].astype(np.float64)
    raise NotImplementedError(
        "unrecognized container; real decode supports BMP and WAV here — "
        "JPEG/PNG/MP3/video codecs need external libraries not present in "
        "this environment"
    )


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


def synth_encoded_media(docs: DataFrame, limit: int = 200) -> DataFrame:
    """Deterministic GENUINELY ENCODED media table: even doc_ids become
    real BMP images (pixel(y,x,c) = (id*7 + y*5 + x*3 + c*11) % 256,
    w = 8 + id%9, h = 8 + id%7), odd doc_ids real WAV audio
    (sample(i) = ((id*13 + i*7) % 65536) - 32768, n = 64 + id%50).
    The formulas are closed-form so a SQL oracle can recompute the
    decoded values WITHOUT parsing bytes — while the Spark path must
    round-trip them through the actual container encoders/decoders."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "modality": [], "payload": []}
            for a in pdf["doc_id"]:
                a = int(a)
                if a % 2 == 0:
                    w, h = 8 + a % 9, 8 + a % 7
                    y, x, c = np.meshgrid(
                        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                    )
                    px = ((a * 7 + y * 5 + x * 3 + c * 11) % 256).astype(np.uint8)
                    out["asset_id"].append(a)
                    out["modality"].append("image")
                    out["payload"].append(encode_bmp(px))
                else:
                    n = 64 + a % 50
                    i = np.arange(n)
                    s = (((a * 13 + i * 7) % 65536) - 32768).astype(np.int16)
                    out["asset_id"].append(a)
                    out["modality"].append("audio")
                    out["payload"].append(encode_wav(s))
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") <= limit)
        .mapInPandas(gen, "asset_id long, modality string, payload binary")
    )


DECODE_STATS_SCHEMA = (
    "asset_id long, modality string, width int, height int, "
    "n_vals long, sum_val long, min_val long, max_val long"
)


def decode_stats(media: DataFrame) -> DataFrame:
    """REAL-decode verification operator: parse each payload with the
    numpy container readers and emit pure-integer stats of the decoded
    values (exact — no float rounding anywhere, so a cross-engine oracle
    hash-matches bit-for-bit).  width/height are -1 for audio."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ["asset_id", "modality", "width", "height",
                    "n_vals", "sum_val", "min_val", "max_val"]}
            for a, m, p in zip(pdf["asset_id"], pdf["modality"], pdf["payload"]):
                if m == "image":
                    px = decode_bmp(p)
                    h, w, _ = px.shape
                    vals = px.astype(np.int64).ravel()
                else:
                    _, s = decode_wav(p)
                    vals = s.astype(np.int64)
                    w = h = -1
                out["asset_id"].append(int(a))
                out["modality"].append(m)
                out["width"].append(w)
                out["height"].append(h)
                out["n_vals"].append(int(vals.size))
                out["sum_val"].append(int(vals.sum()))
                # legitimately empty assets (0-sample WAV) get 0/0, not
                # a zero-size-reduction crash that kills the whole task
                out["min_val"].append(int(vals.min()) if vals.size else 0)
                out["max_val"].append(int(vals.max()) if vals.size else 0)
            yield pd.DataFrame(out)

    return media.select("asset_id", "modality", "payload").mapInPandas(
        run, DECODE_STATS_SCHEMA
    )


REAL_FEATURES_SCHEMA = (
    "asset_id long, modality string, n_vals long, features array<double>"
)


def extract_real_features(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction: parse each payload with the numpy
    container readers and emit a fixed FEATURE_DIM-bin value histogram
    (pixels over [0,256); samples shifted from [-32768,32768) to the
    same range) — a true fixed-width embedding over decoded CONTENT.
    The count column is ``n_vals`` (decoded values), deliberately NOT
    the ``n_bytes`` of extract_features' payload-byte semantics — the
    two counts differ (headers, padding, 2-byte samples) and silently
    sharing a name would mislead size-based consumers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nvals = [], []
            for m, p in zip(pdf["modality"], pdf["payload"]):
                if m == "image":
                    vals = decode_bmp(p).astype(np.float64).ravel()
                else:
                    vals = (decode_wav(p)[1].astype(np.float64) + 32768.0) / 256.0
                hist, _ = np.histogram(vals, bins=FEATURE_DIM, range=(0, 256))
                feats.append((hist / max(vals.size, 1)).tolist())
                nvals.append(int(vals.size))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_vals": nvals,
                    "features": feats,
                }
            )

    return media.select("asset_id", "modality", "payload").mapInPandas(
        run, REAL_FEATURES_SCHEMA
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
