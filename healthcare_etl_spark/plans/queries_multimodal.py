"""Multimodal-column queries (extension surface).

The metadata pass (size/checksum/type) is oracle-checked — byte-level
operations are deterministic in both engines. The decode+featurize pass
runs the real ``mapInPandas`` plumbing with a stub kernel and is checked
rows-only (its SQL mirror would just re-state the stub arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.operators.multimodal import (
    attach_media,
    decode_and_featurize,
    resize_media,
    sample_frames,
)
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table


@register(
    "q_multimodal_meta",
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
           encode(text) AS payload
    FROM documents
)
SELECT media_id, media_type,
       octet_length(payload)::BIGINT AS n_bytes,
       md5(payload::VARCHAR)         AS checksum
FROM media
""",
    description="Binary media column plumbing: typed metadata (size, md5) computed JVM-side",
    tags=("multimodal", "extension"),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, id_col="doc_id", text_col="text")
    return media.select("media_id", "media_type", "n_bytes", "checksum")


@register(
    "q_multimodal_features",
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
           octet_length(encode(text))::BIGINT AS n_bytes
    FROM documents
)
SELECT media_type,
       count(*) AS n_items,
       (round(avg((n_bytes % 997) / 997.0) * 1000000.0) / 1000000.0) AS avg_feature_norm,
       CAST(max(n_bytes % 640 + 1) AS INT) AS max_width,
       CAST(max(n_bytes % 480 + 1) AS INT) AS max_height
FROM media GROUP BY media_type
""",
    description=(
        "Decode/featurize via mapInPandas (Arrow batches) with a clearly-marked stub "
        "decode kernel — real schema/partitioning/batch plumbing, fake pixels. "
        "Oracle-checked: the stub's deterministic arithmetic is mirrored in SQL, so "
        "the Arrow round-trip itself is verified end-to-end."
    ),
    tags=("multimodal", "extension"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, id_col="doc_id", text_col="text")
    feats = decode_and_featurize(media, decode_stub=True)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        stable_round(F.avg("feature_norm"), 6).alias("avg_feature_norm"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )

@register(
    "q_multimodal_resize",
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
           octet_length(encode(text))::BIGINT AS n_bytes
    FROM documents
)
SELECT media_type,
       count(*) AS n_items,
       sum(least(n_bytes, 4096))::BIGINT AS total_bytes_out
FROM media GROUP BY media_type
""",
    description=(
        "Resize pass: binary-in/binary-out mapInPandas over Arrow batches with a "
        "stub kernel capping payloads at 64x64 bytes — the thumbnailing shape for "
        "100 TB image corpora. Oracle mirrors the deterministic byte-cap arithmetic, "
        "verifying the binary Arrow round-trip end-to-end."
    ),
    tags=("multimodal", "extension"),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, id_col="doc_id", text_col="text")
    resized = resize_media(media, target_w=64, target_h=64)
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes_out").alias("total_bytes_out"),
    )


@register(
    "q_multimodal_frames",
    oracle="""
WITH media AS (
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
           octet_length(encode(text))::BIGINT AS n_bytes
    FROM documents
),
vids AS (
    SELECT media_id, n_bytes, (n_bytes % 4 + 1)::INT AS n_frames
    FROM media WHERE media_type = 'video'
),
fr AS (
    SELECT media_id, n_frames, n_bytes,
           unnest(range(n_frames))::INT AS frame_idx
    FROM vids
)
SELECT media_id, frame_idx, n_frames,
       (round(((frame_idx * (n_bytes / 1000.0)) / n_frames) * 1000000.0) / 1000000.0)
           AS frame_ts
FROM fr
""",
    description=(
        "Video frame sampling: one row expands to n_frames rows inside a "
        "row-expanding mapInPandas (Python-side explode over Arrow batches) — how "
        "video corpora become frame datasets. Stub kernel, deterministic frame "
        "count/timestamps mirrored in SQL via unnest(range(...))."
    ),
    tags=("multimodal", "extension"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, id_col="doc_id", text_col="text")
    vids = media.filter(F.col("media_type") == "video")
    frames = sample_frames(vids, max_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        "n_frames",
        stable_round(F.col("frame_ts"), 6).alias("frame_ts"),
    )


@register(
    "q_multimodal_png_dims",
    oracle="""
SELECT doc_id AS media_id,
       'png' AS format,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height
FROM documents
""",
    description=(
        "REAL binary container round-trip (no stub arithmetic in the parse "
        "path): encode_png_media wraps each text payload in a byte-valid PNG "
        "container (signature + IHDR with correct big-endian fields and CRC-32) "
        "and parse_image_dims recovers the dimensions by actually parsing the "
        "header layout — two chained Arrow kernels, bytes never parse on the "
        "JVM. The oracle predicts the dimensions arithmetically from the text "
        "length, so a parse bug cannot hash-match."
    ),
    tags=("multimodal", "extension"),
)
def q_multimodal_png_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.multimodal import (
        encode_png_media,
        parse_image_dims,
    )

    docs = load_table(spark, sf_dir, "documents")
    return parse_image_dims(encode_png_media(docs))


@register(
    "q_multimodal_wav_meta",
    oracle="""
SELECT doc_id AS media_id,
       'wav' AS format,
       CAST(([8000, 16000, 22050, 44100, 48000])[octet_length(encode(text)) % 5 + 1] AS INT)
           AS sample_rate,
       CAST(octet_length(encode(text)) % 2 + 1 AS INT) AS channels,
       CAST(16 AS INT) AS bits_per_sample,
       CAST(octet_length(encode(text)) // ((octet_length(encode(text)) % 2 + 1) * 2) AS BIGINT)
           AS n_frames
FROM documents
""",
    description=(
        "REAL audio container round-trip: encode_wav_media wraps each text "
        "payload in a byte-valid RIFF/WAVE file (little-endian sizes, PCM fmt "
        "chunk, padded chunk walk) and parse_wav_meta recovers sample rate / "
        "channels / bit depth / frame count by actually walking the chunk "
        "list — the audio sibling of q_multimodal_png_dims. Oracle predicts "
        "every field arithmetically from the text length, so a parse bug "
        "cannot hash-match."
    ),
    tags=("multimodal", "extension"),
)
def q_multimodal_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.multimodal import encode_wav_media, parse_wav_meta

    docs = load_table(spark, sf_dir, "documents")
    return parse_wav_meta(encode_wav_media(docs))


@register(
    "q_multimodal_mp4_meta",
    oracle="""
SELECT doc_id AS media_id,
       'mp4' AS format,
       'isom' AS brand,
       CAST(([600, 1000, 12288, 24000, 90000])[octet_length(encode(text)) % 5 + 1] AS INT)
           AS timescale,
       CAST(octet_length(encode(text)) * 100 AS BIGINT) AS duration,
       CAST(octet_length(encode(text)) AS BIGINT) AS mdat_bytes
FROM documents
""",
    description=(
        "REAL video container round-trip, completing the image/audio/"
        "video triad (q_multimodal_png_dims / q_multimodal_wav_meta): "
        "encode_mp4_media writes a byte-valid ISO BMFF shell (big-endian "
        "box headers, ftyp brand, version-0 mvhd, mdat payload) and "
        "parse_mp4_meta recovers brand / timescale / duration / sample "
        "bytes by actually walking the box tree, descending into moov. "
        "The oracle predicts every parsed field arithmetically from the "
        "text length, so a parse bug cannot hash-match."
    ),
    tags=("multimodal", "extension"),
)
def q_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.multimodal import encode_mp4_media, parse_mp4_meta

    docs = load_table(spark, sf_dir, "documents")
    return parse_mp4_meta(encode_mp4_media(docs))
