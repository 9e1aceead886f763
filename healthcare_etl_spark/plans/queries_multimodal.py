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
    description=(
        "Decode/featurize via mapInPandas (Arrow batches) with a clearly-marked stub "
        "decode kernel — real schema/partitioning/batch plumbing, fake pixels. "
        "Rows-only check; kernel determinism unit-tested."
    ),
    tags=("multimodal", "extension"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, id_col="doc_id", text_col="text")
    feats = decode_and_featurize(media, decode_stub=True)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("feature_norm"), 6).alias("avg_feature_norm"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )
