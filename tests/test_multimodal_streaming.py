"""Multimodal binary-column plumbing + Structured Streaming analytics."""

import datetime as dt
import os

import numpy as np
import pytest

from moogle_spark.multimodal import (
    FEATURE_DIM,
    decode_payload,
    extract_features,
    frame_sample_plan,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abc"), (3, "")], "doc_id long, text string"
    )
    return synth_media(docs)


def test_decode_unknown_container_raises():
    """Real decode handles BMP/WAV; foreign codecs (JPEG etc.) still
    raise — they genuinely need libraries absent from this container."""
    with pytest.raises(NotImplementedError):
        decode_payload(b"\xff\xd8\xff\xe0 jpegish", "image")


def test_bmp_roundtrip_exact():
    from moogle_spark.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in [(5, 7), (8, 8), (3, 2)]:  # odd widths exercise row padding
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(px))
        np.testing.assert_array_equal(out, px)


def test_wav_roundtrip_exact():
    from moogle_spark.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32768, 333, dtype=np.int16)
    rate, out = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(out, s)


def test_decode_payload_real_paths():
    from moogle_spark.multimodal import encode_bmp, encode_wav

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    v = decode_payload(encode_bmp(px), "image")
    np.testing.assert_array_equal(v, np.arange(12, dtype=np.float64))
    s = np.array([1, -2, 300], dtype=np.int16)
    np.testing.assert_array_equal(
        decode_payload(encode_wav(s), "audio"), s.astype(np.float64)
    )


def test_decode_stats_distributed(spark):
    """decode_stats over genuinely encoded payloads must equal the
    closed-form pixel/sample formulas (the same invariant the driver's
    media_decode oracle checks cross-engine)."""
    from moogle_spark.multimodal import decode_stats, synth_encoded_media

    docs = spark.createDataFrame([(i,) for i in range(1, 21)], "doc_id long")
    got = decode_stats(synth_encoded_media(docs, limit=20)).toPandas().set_index("asset_id")
    for a in range(1, 21):
        if a % 2 == 0:
            w, h = 8 + a % 9, 8 + a % 7
            y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
            vals = (a * 7 + y * 5 + x * 3 + c * 11) % 256
            assert got.loc[a, "width"] == w and got.loc[a, "height"] == h
        else:
            i = np.arange(64 + a % 50)
            vals = ((a * 13 + i * 7) % 65536) - 32768
            assert got.loc[a, "width"] == -1
        assert got.loc[a, "n_vals"] == vals.size
        assert got.loc[a, "sum_val"] == int(vals.sum())
        assert got.loc[a, "min_val"] == int(vals.min())
        assert got.loc[a, "max_val"] == int(vals.max())


def test_decode_fake_histogram():
    f = decode_payload(b"hello", "image", fake=True)
    assert f.shape == (FEATURE_DIM,)
    assert f.sum() == pytest.approx(1.0)
    assert decode_payload(b"", "image", fake=True).sum() == 0.0


def test_media_schema_and_sha(spark, media):
    rows = {r["asset_id"]: r for r in media.collect()}
    assert bytes(rows[1]["payload"]) == b"hello world"
    import hashlib

    assert rows[1]["payload_sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_extract_features_distributed(spark, media):
    got = extract_features(media, fake=True).toPandas().set_index("asset_id")
    want = decode_payload(b"hello world", "image", fake=True)
    np.testing.assert_allclose(np.asarray(got.loc[1, "features"]), want)
    assert got.loc[1, "n_bytes"] == 11
    assert got.loc[3, "n_bytes"] == 0


def test_frame_sample_plan(spark, media):
    got = frame_sample_plan(media, every_ms=1000).toPandas()
    per = got.groupby("asset_id").size()
    # duration defaults to (asset_id % 5 + 1) seconds -> that many frames
    assert per[1] == 2 and per[2] == 3 and per[3] == 4


def test_streaming_counts_match_batch(spark, tmp_path):
    from moogle_spark.analytics import windowed_counts
    from moogle_spark.streaming import (
        read_query_stream,
        run_to_memory_sink,
        streaming_search_counts,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=13 * i), ["a", "b", "a"][i % 3]) for i in range(60)
    ]
    batch = spark.createDataFrame(rows, "ts timestamp, query string")
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    # two file drops = two micro-batches
    batch.limit(30).write.mode("overwrite").parquet(src + "/drop1.parquet")
    batch.subtract(batch.limit(30)).write.mode("overwrite").parquet(src + "/drop2.parquet")

    stream = read_query_stream(spark, src + "/*.parquet")
    agg = streaming_search_counts(stream, window="1 hour", watermark="2 hours")
    run_to_memory_sink(agg, "stream_counts", timeout_s=120)

    got = spark.sql("select * from stream_counts").toPandas()
    want = windowed_counts(batch, window="1 hour").toPandas()
    g = got.sort_values(["window_start", "query"]).reset_index(drop=True)
    w = want.sort_values(["window_start", "query"]).reset_index(drop=True)
    assert g[["window_start", "query", "searches"]].equals(
        w[["window_start", "query", "searches"]]
    )


def test_filter_valid_images(spark):
    """F13 (image-indexer/utils/utils.py:36-43): min-dimension gate plus
    svg/icons rejection, metadata columns only."""
    from moogle_spark.multimodal import filter_valid_images

    rows = [
        (1, "image", "a/photo.png", 200, 200),
        (2, "image", "a/tiny.png", 99, 500),
        (3, "image", "a/short.png", 500, 99),
        (4, "image", "a/logo.SVG", 300, 300),
        (5, "image", "site/icons/star.png", 300, 300),
        (6, "image", "b/ok.jpg", 100, 100),
    ]
    m = spark.createDataFrame(
        rows, "asset_id long, modality string, asset_uri string, width int, height int"
    )
    got = filter_valid_images(m).select("asset_id").toPandas()
    assert sorted(got["asset_id"]) == [1, 6]


def test_real_features_into_ann(spark):
    """decode -> fixed-width features -> ANN, no fake path anywhere: the
    real-decoded feature vectors flow into brute-force cosine top-k, and
    an asset's nearest neighbor by content histogram is itself."""
    from moogle_spark.multimodal import extract_real_features, synth_encoded_media
    from moogle_spark.simsearch import brute_force_topk

    docs = spark.createDataFrame([(i,) for i in range(1, 31)], "doc_id long")
    media = synth_encoded_media(docs, limit=30)
    feats = extract_real_features(media)
    pdf = feats.toPandas()
    assert len(pdf) == 30
    assert all(len(f) == 16 for f in pdf["features"])
    assert all(abs(sum(f) - 1.0) < 1e-9 for f in pdf["features"])  # density
    emb = feats.select(
        feats.asset_id.alias("vec_id"),
        feats.modality.alias("label"),
        feats.features.alias("embedding"),
    )
    q = [float(x) for x in pdf[pdf["asset_id"] == 2]["features"].iloc[0]]
    top = brute_force_topk(emb, q, k=3).toPandas()
    assert top.iloc[0]["vec_id"] == 2 and top.iloc[0]["cosine"] == 1.0


def test_decode_stats_empty_wav(spark):
    """A zero-sample WAV is a legal container: stats row with n_vals=0,
    no zero-size-reduction crash."""
    import pandas as pd

    from moogle_spark.multimodal import decode_stats, encode_wav

    buf = encode_wav(np.array([], dtype=np.int16))
    media = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "modality": ["audio"], "payload": [buf]}),
        "asset_id long, modality string, payload binary",
    )
    got = decode_stats(media).toPandas()
    assert got.iloc[0]["n_vals"] == 0 and got.iloc[0]["sum_val"] == 0
