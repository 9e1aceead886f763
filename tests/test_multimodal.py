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


def test_gif_lzw_bit_packing_matches_spec_hand_example():
    """[42, 42] @ min_code_size=8 must pack to exactly 00 55 A8 08 08:
    codes [CLEAR=256, 42, 42, EOI=257] at 9 bits, LSB-first — computed
    by hand from the GIF89a spec's bit-packing rules, so this anchors
    BOTH directions to the spec independent of round-trip consistency."""
    from healthcare_etl_spark.operators.multimodal import (
        gif_lzw_decode,
        gif_lzw_encode,
    )

    expected = bytes([0x00, 0x55, 0xA8, 0x08, 0x08])
    assert gif_lzw_encode(bytes([42, 42]), 8) == expected
    assert gif_lzw_decode(expected, 8) == [42, 42]


def test_gif_lzw_roundtrip_through_width_growth_and_cap():
    """Round-trip across alphabet sizes and lengths that force code
    widths 9->12 and the 4096-entry dictionary reset."""
    import random

    from healthcare_etl_spark.operators.multimodal import (
        gif_lzw_decode,
        gif_lzw_encode,
    )

    rng = random.Random(13)
    for n, alpha in [(1, 256), (17, 256), (128, 256), (3000, 4), (20000, 2), (9000, 256)]:
        data = bytes(rng.randrange(alpha) for _ in range(n))
        assert gif_lzw_decode(gif_lzw_encode(data, 8), 8) == list(data), (n, alpha)


def test_gif_decode_rejects_malformed_payloads(spark):
    from healthcare_etl_spark.operators.multimodal import decode_gif_index_stats

    rows = [
        (1, None),
        (2, b"NOTAGIF"),
        (3, b"GIF89a\x02\x00\x01\x00\x00\x00\x00"),  # no image descriptor
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pdf = decode_gif_index_stats(media).toPandas()
    assert pdf["n_px"].isna().all()


def test_gif_roundtrip_recovers_exact_indices(spark, sf_smoke):
    """End-to-end: encode real GIFs from documents, decode, and check a
    sampled doc's sums against a pure-Python regeneration of the index
    rule (independent of the oracle)."""
    from healthcare_etl_spark.operators.multimodal import (
        _gif_index,
        decode_gif_index_stats,
        encode_gif_media,
    )
    from healthcare_etl_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    pdf = decode_gif_index_stats(encode_gif_media(docs)).toPandas()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert pdf["n_px"].notna().all()
    for _, r in pdf.iterrows():
        n = len(texts[r["media_id"]].encode("utf-8"))
        w, h = n % 16 + 1, n % 8 + 1
        idx = [_gif_index(int(r["media_id"]), x, y) for y in range(h) for x in range(w)]
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_idx"] == sum(idx)
