"""Training-data pipeline operators, second file (extension surface).

Continues ``queries_pipeline_ops`` (module split per the 3,500-line
hygiene bar): content-defined chunking, embedding quantization
calibration, statistical watermark screening, and exact-k reservoir
sampling — each a pure DataFrame expression program with a DuckDB
oracle mirror, shaped for the 100 TB cluster case (per-document
windows, broadcast-joined metadata aggregates, no Python in the hot
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table


def _hash31(col) -> F.Column:
    """First 8 md5 hex digits as a non-negative BIGINT — the repo's
    cross-engine deterministic hash (DuckDB mirror:
    ``('0x' || substring(md5(x), 1, 8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


@register(
    "q_cdc_chunking",
    oracle="""
WITH tok AS (
    SELECT doc_id, source, string_split(text, ' ') AS t
    FROM documents WHERE length(text) > 0
),
pos AS (
    SELECT doc_id, source, t, unnest(range(1, len(t) + 1)) AS pos FROM tok
),
r AS (
    SELECT doc_id, source, pos, t[pos] AS tok,
           concat_ws(' ',
               CASE WHEN pos >= 4 THEN t[pos - 3] END,
               CASE WHEN pos >= 3 THEN t[pos - 2] END,
               CASE WHEN pos >= 2 THEN t[pos - 1] END,
               t[pos]) AS gram
    FROM pos
),
b AS (
    SELECT doc_id, source, pos, tok,
           CASE WHEN ('0x' || substring(md5(gram), 1, 8))::BIGINT % 16 = 0
                THEN 1 ELSE 0 END AS bflag
    FROM r
),
c AS (
    SELECT doc_id, source, pos, tok,
           coalesce(sum(bflag) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
    FROM b
),
ch AS (
    SELECT doc_id, source, chunk_id,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS chash,
           count(*) AS n_toks
    FROM c GROUP BY doc_id, source, chunk_id
)
SELECT source,
       CAST(count(*) AS BIGINT)                        AS n_chunks,
       CAST(count(DISTINCT chash) AS BIGINT)           AS n_unique_chunks,
       CAST(count(*) - count(DISTINCT chash) AS BIGINT) AS dup_chunks,
       (round(avg(n_toks) * 1000000.0) / 1000000.0)    AS avg_chunk_toks
FROM ch GROUP BY source ORDER BY source
""",
    description=(
        "Content-defined chunking (LBFS rolling-window boundaries, "
        "Muthitacharoen et al. SOSP'01; FastCDC ATC'16 — word-level): a "
        "deterministic hash of the 4-token window ending at each position "
        "marks a chunk boundary when h % 16 == 0 (avg ~16-token chunks), so "
        "chunk boundaries survive insertions/deletions unlike fixed-width "
        "splitting — the storage/transfer dedup primitive. Chunks are "
        "assembled per doc with gaps-free cumulative boundary counts, hashed, "
        "and rolled up per source as a chunk-level dup census. 100 TB shape: "
        "everything is per-document windows (bounded partitions, no global "
        "sort) + one hash aggregate; chunk hashes, not texts, travel through "
        "the distinct."
    ),
    tags=("text", "dedup", "extension", "parity"),
)
def q_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    rows = docs.select(
        "doc_id", "source", F.posexplode(F.split("text", " ")).alias("p0", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("p0")
    gram = F.concat_ws(
        " ",
        F.lag("tok", 3).over(w),
        F.lag("tok", 2).over(w),
        F.lag("tok", 1).over(w),
        F.col("tok"),
    )
    flagged = rows.select(
        "doc_id",
        "source",
        "p0",
        "tok",
        (_hash31(gram) % 16 == 0).cast("long").alias("bflag"),
    )
    cum = F.coalesce(
        F.sum("bflag").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    chunked = flagged.select("doc_id", "source", "p0", "tok", cum.alias("chunk_id"))
    chunks = chunked.groupBy("doc_id", "source", "chunk_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("p0").alias("p"), F.col("tok").alias("t")))
                    ),
                    lambda x: x["t"],
                ),
                " ",
            )
        ).alias("chash"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_distinct("chash").alias("n_unique_chunks"),
            (F.count(F.lit(1)) - F.count_distinct("chash")).alias("dup_chunks"),
            stable_round(F.avg("n_toks"), 6).alias("avg_chunk_toks"),
        )
        .orderBy("source")
    )


@register(
    "q_embedding_int8_calibration",
    oracle="""
WITH pos AS (
    SELECT vec_id, embedding AS e, unnest(range(1, len(embedding) + 1)) AS d1
    FROM embeddings
),
r AS (
    SELECT vec_id, d1 - 1 AS dim, CAST(e[d1] AS DOUBLE) AS v FROM pos
),
am AS (
    SELECT dim, max(abs(v)) AS absmax FROM r GROUP BY dim
),
q AS (
    SELECT r.dim, r.v, am.absmax,
           CASE WHEN am.absmax = 0 THEN 1.0 ELSE am.absmax / 127.0 END AS scale
    FROM r JOIN am ON r.dim = am.dim
),
e AS (
    SELECT dim, absmax, scale,
           v - least(greatest(floor(v / scale + 0.5), -127.0), 127.0) * scale AS err
    FROM q
)
SELECT dim,
       (round(max(absmax) * 1000000.0) / 1000000.0)            AS absmax,
       (round(max(scale) * 100000000.0) / 100000000.0)         AS scale,
       (round(avg(err * err) * 10000000000.0) / 10000000000.0) AS mse,
       (round(max(abs(err)) * 100000000.0) / 100000000.0)      AS max_abs_err
FROM e GROUP BY dim ORDER BY dim
""",
    description=(
        "Per-dimension INT8 quantization calibration for the embedding "
        "column (absmax scaling, the LLM.int8 baseline — Dettmers et al. "
        "NeurIPS'22): scale_d = absmax_d/127, symmetric round-half-up "
        "quantize (floor(x+0.5), identical on both engines, unlike native "
        "round), report per-dim scale, MSE and max reconstruction error — "
        "the calibration table a vector store computes before quantizing a "
        "100 TB embedding corpus. Scale shape: one exploded hash aggregate "
        "for absmax (D rows), broadcast back across the corpus, one more "
        "aggregate for the error moments — no window over the data-scale "
        "frame, no Python."
    ),
    tags=("similarity", "extension", "parity"),
)
def q_embedding_int8_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select(F.col("dim").cast("long").alias("dim"), F.col("v").cast("double").alias("v"))
    absmax = rows.groupBy("dim").agg(F.max(F.abs("v")).alias("absmax"))
    scale = F.when(F.col("absmax") == 0, F.lit(1.0)).otherwise(
        F.col("absmax") / F.lit(127.0)
    )
    j = rows.join(F.broadcast(absmax), "dim").withColumn("scale", scale)
    q = F.least(
        F.greatest(F.floor(F.col("v") / F.col("scale") + F.lit(0.5)), F.lit(-127.0)),
        F.lit(127.0),
    )
    e = j.withColumn("err", F.col("v") - q * F.col("scale"))
    return (
        e.groupBy("dim")
        .agg(
            stable_round(F.max("absmax"), 6).alias("absmax"),
            stable_round(F.max("scale"), 8).alias("scale"),
            stable_round(F.avg(F.col("err") * F.col("err")), 10).alias("mse"),
            stable_round(F.max(F.abs("err")), 8).alias("max_abs_err"),
        )
        .orderBy("dim")
    )


@register(
    "q_watermark_greenlist_screen",
    oracle="""
WITH tok AS (
    SELECT doc_id, source, string_split(text, ' ') AS t
    FROM documents WHERE length(text) > 0
),
pos AS (
    SELECT doc_id, source, t, unnest(range(2, len(t) + 1)) AS pos
    FROM tok WHERE len(t) >= 2
),
g AS (
    SELECT doc_id, source,
           CASE WHEN ('0x' || substring(md5(t[pos - 1] || ' ' || t[pos]), 1, 8))::BIGINT % 2 = 0
                THEN 1 ELSE 0 END AS green
    FROM pos
),
d AS (
    SELECT doc_id, source, count(*) AS n, sum(green) AS gr
    FROM g GROUP BY doc_id, source HAVING count(*) >= 16
),
z AS (SELECT source, (2.0 * gr - n) / sqrt(n) AS z FROM d)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN z >= 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       (round(max(z) * 1000000.0) / 1000000.0) AS max_z,
       (round(avg(z) * 1000000.0) / 1000000.0) AS avg_z
FROM z GROUP BY source ORDER BY source
""",
    description=(
        "Statistical watermark screen (green-list token bias, Kirchenbauer "
        "et al. ICML'23 detection side): a deterministic hash of each "
        "(prev, token) bigram splits the vocabulary into green/red halves; "
        "an unwatermarked doc has Binomial(n, 1/2) green hits, so "
        "z = (2g - n)/sqrt(n) ~ N(0,1) and z >= 2 flags text plausibly "
        "generated WITH a green-list-boosted sampler — the provenance "
        "filter a training-data pipeline runs to keep synthetic text out "
        "of the pretraining mix. Per-source census of flagged docs plus "
        "max/avg z. 100 TB shape: per-document window for the bigram lag, "
        "two hash aggregates; the z-math never leaves codegen."
    ),
    tags=("text", "extension", "parity"),
)
def q_watermark_greenlist_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    rows = docs.select(
        "doc_id", "source", F.posexplode(F.split("text", " ")).alias("p0", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("p0")
    prev = F.lag("tok", 1).over(w)
    g = (
        rows.select(
            "doc_id",
            "source",
            prev.alias("prev"),
            F.col("tok"),
        )
        .filter(F.col("prev").isNotNull())
        .select(
            "doc_id",
            "source",
            (_hash31(F.concat_ws(" ", "prev", "tok")) % 2 == 0)
            .cast("long")
            .alias("green"),
        )
    )
    d = (
        g.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("green").alias("gr"))
        .filter(F.col("n") >= 16)
    )
    z = d.select(
        "source",
        ((F.lit(2.0) * F.col("gr") - F.col("n")) / F.sqrt("n")).alias("z"),
    )
    return (
        z.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("z") >= 2.0).cast("long")).alias("n_flagged"),
            stable_round(F.max("z"), 6).alias("max_z"),
            stable_round(F.avg("z"), 6).alias("avg_z"),
        )
        .orderBy("source")
    )


@register(
    "q_reservoir_sample_k",
    oracle="""
WITH h AS (
    SELECT lang, doc_id,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
    FROM documents
),
r AS (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
    FROM h
)
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 5 ORDER BY lang, rk
""",
    description=(
        "Exact-k-per-stratum reservoir sample (distributed formulation): "
        "rank every doc inside its language stratum by a deterministic md5 "
        "hash of its id and keep the k=5 smallest — statistically a uniform "
        "k-sample per stratum, but reproducible across engines, runs and "
        "repartitionings, unlike rand()-reservoirs. Complements "
        "q_sample_stratified (FRACTION per stratum) with the EXACT-count "
        "contract evaluation sets need. 100 TB shape: per-stratum top-k is "
        "one partial-aggregating shuffle (executors keep k-row heaps per "
        "stratum before exchanging), never a global sort."
    ),
    tags=("sampling", "extension", "parity"),
)
def q_reservoir_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hv = _hash31(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(hv.asc(), F.col("doc_id").asc())
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 5)
        .orderBy("lang", "rk")
    )


# Gopher rule parameters (Rae et al. 2021, Appendix A) adapted only in
# the stop-word list: the canonical 8 English stop words barely occur
# in the synthetic fixture vocabulary, so the list is a parameter and
# the fixture run uses function words that DO occur ('the', 'a') plus
# the canonical remainder — the rule logic (>= 2 DISTINCT stop words
# present) is unchanged.
_GOPHER_STOPWORDS = ("the", "a", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 3.0, 10.0
_GOPHER_MIN_ALPHA_FRAC = 0.80
_GOPHER_MIN_STOPWORDS = 2


@register(
    "q_gopher_rules_filter",
    oracle=f"""
WITH words AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
    FROM documents WHERE length(text) > 0
),
per_doc AS (
    SELECT doc_id, source,
           count(*) AS n_words,
           avg(length(w)) AS mwl,
           avg(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1.0 ELSE 0.0 END) AS alpha_frac,
           count(DISTINCT CASE WHEN lower(w) IN {_GOPHER_STOPWORDS!r} THEN lower(w) END) AS n_stop
    FROM words GROUP BY doc_id, source
),
flags AS (
    SELECT source,
           CASE WHEN n_words < {_GOPHER_MIN_WORDS} OR n_words > {_GOPHER_MAX_WORDS}
                THEN 1 ELSE 0 END AS f_wc,
           CASE WHEN mwl < {_GOPHER_MIN_MWL} OR mwl > {_GOPHER_MAX_MWL}
                THEN 1 ELSE 0 END AS f_mwl,
           CASE WHEN alpha_frac < {_GOPHER_MIN_ALPHA_FRAC} THEN 1 ELSE 0 END AS f_alpha,
           CASE WHEN n_stop < {_GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END AS f_stop
    FROM per_doc
)
SELECT source,
       CAST(count(*) AS BIGINT)    AS n_docs,
       CAST(sum(f_wc) AS BIGINT)   AS n_fail_wordcount,
       CAST(sum(f_mwl) AS BIGINT)  AS n_fail_meanwordlen,
       CAST(sum(f_alpha) AS BIGINT) AS n_fail_alpha,
       CAST(sum(f_stop) AS BIGINT) AS n_fail_stopwords,
       CAST(sum(CASE WHEN f_wc + f_mwl + f_alpha + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass
FROM flags GROUP BY source ORDER BY source
""",
    description=(
        "The Gopher quality-rule battery (Rae et al. 2021, Appendix A — the "
        "rule set MassiveText/RedPajama/Dolma pipelines standardized on): "
        "per document, word count within [50, 100k], mean word length "
        "within [3, 10], >= 80% of words containing an alphabetic "
        "character, and >= 2 distinct stop words present; reported as a "
        "per-source census of failures per rule plus the pass count — the "
        "audit table a curation run emits before dropping anything. 100 TB "
        "shape: one explode + one per-doc hash aggregate (all four rules "
        "fold into the same groupBy; the distinct-stopword count is a "
        "count_distinct over a CASE key, not a second pass) + one "
        "per-source rollup; every predicate is a codegen expression."
    ),
    tags=("text", "extension", "parity"),
)
def q_gopher_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    lw = F.lower("w")
    per_doc = words.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.avg(F.length("w")).alias("mwl"),
        F.avg(F.col("w").rlike("[A-Za-z]").cast("double")).alias("alpha_frac"),
        F.count_distinct(
            F.when(lw.isin(*_GOPHER_STOPWORDS), lw)
        ).alias("n_stop"),
    )
    f_wc = (
        (F.col("n_words") < _GOPHER_MIN_WORDS)
        | (F.col("n_words") > _GOPHER_MAX_WORDS)
    ).cast("long")
    f_mwl = (
        (F.col("mwl") < _GOPHER_MIN_MWL) | (F.col("mwl") > _GOPHER_MAX_MWL)
    ).cast("long")
    f_alpha = (F.col("alpha_frac") < _GOPHER_MIN_ALPHA_FRAC).cast("long")
    f_stop = (F.col("n_stop") < _GOPHER_MIN_STOPWORDS).cast("long")
    flags = per_doc.select(
        "source",
        f_wc.alias("f_wc"),
        f_mwl.alias("f_mwl"),
        f_alpha.alias("f_alpha"),
        f_stop.alias("f_stop"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_wc").alias("n_fail_wordcount"),
            F.sum("f_mwl").alias("n_fail_meanwordlen"),
            F.sum("f_alpha").alias("n_fail_alpha"),
            F.sum("f_stop").alias("n_fail_stopwords"),
            F.sum(
                (
                    F.col("f_wc") + F.col("f_mwl") + F.col("f_alpha") + F.col("f_stop")
                    == 0
                ).cast("long")
            ).alias("n_pass"),
        )
        .orderBy("source")
    )
