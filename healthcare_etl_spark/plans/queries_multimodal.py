"""Multimodal-column queries (extension surface).

The metadata pass (size/checksum/type) is oracle-checked — byte-level
operations are deterministic in both engines. The decode+featurize pass
runs the real ``mapInPandas`` plumbing with a stub kernel and is checked
rows-only (its SQL mirror would just re-state the stub arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.operators.multimodal import attach_media, decode_and_featurize
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
