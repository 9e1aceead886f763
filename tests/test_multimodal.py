"""Round-trip tests for the REAL multimodal codec kernels
(operators/multimodal.py): PNG filter+inflate+unfilter and little-endian
int16 PCM. The container/metadata kernels are covered by their
oracle-backed queries; these tests pin the byte-level codec math against
direct recomputation of the deterministic pixel/sample rules."""

from __future__ import annotations


def test_png_codec_roundtrip_exercises_all_filters(spark):
    """encode_png_pixels cycles scanline filters 0-4 (h up to 8 rows),
    and decode_png_pixel_stats must invert every one: the recovered
    channel sums must equal the pixel rule's direct computation."""
    from healthcare_etl_spark.operators.multimodal import (
        _png_pixel,
        decode_png_pixel_stats,
        encode_png_pixels,
    )

    # text lengths chosen so h = n%8+1 covers heights 1..8 (filters 0-4)
    rows = [(i, "x" * (7 + i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = decode_png_pixel_stats(encode_png_pixels(df)).toPandas()
    assert len(out) == 10
    for _, r in out.iterrows():
        mid, w, h = int(r.media_id), int(r.width), int(r.height)
        n = 7 + mid
        assert (w, h) == (n % 16 + 1, n % 8 + 1)
        exp = [0, 0, 0]
        for y in range(h):
            for x in range(w):
                px = _png_pixel(mid, x, y)
                for c in range(3):
                    exp[c] += px[c]
        assert (int(r.sum_r), int(r.sum_g), int(r.sum_b)) == tuple(exp)
        assert int(r.n_px) == w * h


def test_png_decoder_rejects_garbage_gracefully(spark):
    """Corrupt/non-PNG payloads yield NULL stats, never an exception."""
    from healthcare_etl_spark.operators.multimodal import decode_png_pixel_stats

    rows = [(1, bytearray(b"not a png")), (2, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = decode_png_pixel_stats(df).toPandas().set_index("media_id")
    assert out.loc[1].isna().all() and out.loc[2].isna().all()


def test_wav_pcm_codec_roundtrip(spark):
    """decode_wav_sample_stats must unpack the exact int16 samples
    encode_wav_pcm wrote (little-endian, interleaved channels)."""
    from healthcare_etl_spark.operators.multimodal import (
        _wav_sample,
        decode_wav_sample_stats,
        encode_wav_pcm,
    )

    rows = [(i, "y" * (20 + i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = decode_wav_sample_stats(encode_wav_pcm(df)).toPandas()
    for _, r in out.iterrows():
        mid = int(r.media_id)
        n = 20 + mid
        ns = (n % 200 + 50) * (n % 2 + 1)
        samples = [_wav_sample(mid, k) for k in range(ns)]
        assert int(r.n_samples) == ns
        assert int(r.sum_s) == sum(samples)
        assert int(r.sum_s2) == sum(s * s for s in samples)
        assert int(r.peak) == max(abs(s) for s in samples)
