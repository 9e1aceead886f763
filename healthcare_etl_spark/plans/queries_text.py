"""Text-analysis queries over the ``documents`` fixture (extension).

The oracle SQL mirrors each Spark expression exactly — same regexes
(Java regex vs RE2 agree on these constructs), same fold order for the
rolling hash — so even the fingerprint is hash-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.operators.text_analysis import (
    fingerprint,
    language_id,
    quality_score,
    text_stats,
)
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table
from healthcare_etl_spark.functions.rounding import stable_round


@register(
    "q_text_stats",
    oracle=r"""
SELECT doc_id,
       length(text)                                       AS n_chars,
       len(string_split(text, ' '))                       AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))    AS n_punct,
       (round(((length(text) - (len(string_split(text, ' ')) - 1))
             / len(string_split(text, ' '))) * 1000000.0) / 1000000.0) AS avg_token_len,
       len(list_distinct(string_split(text, ' ')))        AS n_unique_tokens
FROM documents
""",
    description="Per-document structural features: chars/tokens/BPE-ish tokens/punct/uniqueness",
    tags=("text", "extension"),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text_stats(docs).drop("text")


@register(
    "q_quality_score",
    oracle=r"""
WITH feats AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS DOUBLE)                    AS n_tok,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)     AS n_uniq,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS n_punct,
           CAST(length(text) AS DOUBLE)                                    AS n_chars
    FROM documents
)
SELECT doc_id,
       (round((0.35 * least(n_tok / 100.0, 1.0)
           + 0.35 * (n_uniq / CASE WHEN n_tok > 0 THEN n_tok ELSE 1 END)
           + 0.30 * (1.0 - n_punct / CASE WHEN n_chars > 0 THEN n_chars ELSE 1 END))
           * 1000000.0) / 1000000.0) AS quality_score
FROM feats
""",
    description="Composite document quality heuristic (C4/Gopher-style filter score)",
    tags=("text", "extension"),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_score(docs).select("doc_id", "quality_score")


@register(
    "q_lang_profile",
    oracle="""
SELECT lang,
       count(*)                 AS n_docs,
       (round((avg(n_chars)) * 1000000.0) / 1000000.0)   AS avg_chars,
       (round((sum(n_chars)) * 10.0) / 10.0)   AS total_chars
FROM documents GROUP BY lang
""",
    description="Corpus language distribution (declared lang column)",
    tags=("text", "extension"),
)
def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        stable_round(F.avg("n_chars"), 6).alias("avg_chars"),
        stable_round(F.sum("n_chars").cast("double"), 1).alias("total_chars"),
    )


def _lang_id_oracle_sql() -> str:
    """DuckDB mirror of the stopword-overlap heuristic. The Python loop
    keeps the FIRST language whose score strictly exceeds all previous,
    i.e. the first maximizer in profile order — expressed as a CASE
    chain with >= against all later languages."""
    from healthcare_etl_spark.operators.text_analysis import STOPWORD_PROFILES

    langs = list(STOPWORD_PROFILES)
    scores = ",\n           ".join(
        "len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in STOPWORD_PROFILES[lang])
        + f"]))::BIGINT AS s_{lang}"
        for lang in langs
    )
    cases = []
    for i, lang in enumerate(langs):
        later = [f"s_{other}" for other in langs[i + 1 :]]
        cond = f"s_{lang} > 0"
        if later:
            cond += f" AND s_{lang} >= greatest({', '.join(later)})"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_chain = "\n           ".join(cases)
    all_scores = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
WITH toks AS (
    SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks FROM documents
),
scored AS (
    SELECT doc_id,
           {scores}
    FROM toks
)
SELECT doc_id,
       CASE {case_chain}
            ELSE 'und' END AS lang_pred,
       greatest({all_scores}, 0)::BIGINT AS lang_pred_score
FROM scored
"""


@register(
    "q_lang_id",
    oracle=_lang_id_oracle_sql(),
    description=(
        "Heuristic language-ID (stopword-overlap argmax, first-maximizer tie "
        "break) — oracle-checked with the stopword tables inlined into the SQL."
    ),
    tags=("text", "extension"),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = language_id(docs)
    return out.select(
        "doc_id", "lang_pred", F.col("lang_pred_score").cast("long").alias("lang_pred_score")
    )


@register(
    "q_fingerprint",
    oracle="""
SELECT doc_id,
       list_reduce(
           list_prepend(0::BIGINT,
               list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
           (acc, x) -> (acc * 31 + x) % 2147483647
       ) AS fingerprint
FROM documents
""",
    description=(
        "Rolling-hash document fingerprint; identical left-to-right fold in Spark "
        "(aggregate) and DuckDB (list_reduce), so value-hash-checked"
    ),
    tags=("text", "extension"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return fingerprint(docs).select("doc_id", "fingerprint")


@register(
    "q_hash_split",
    oracle="""
WITH assigned AS (
    SELECT doc_id,
           (('0x' || substring(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 2147483647) % 1000 AS bucket
    FROM documents
)
SELECT CASE WHEN bucket >= 0 AND bucket < 800 THEN 'train'
            WHEN bucket >= 800 AND bucket < 900 THEN 'val'
            WHEN bucket >= 900 AND bucket < 1000 THEN 'test'
            ELSE 'train' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM assigned GROUP BY 1
""",
    description=(
        "Deterministic train/val/test split by salted content hash — stable under "
        "re-partitioning and across engines (unlike row-order sampling); the "
        "reproducible-held-out-set primitive for training pipelines"
    ),
    tags=("text", "extension"),
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.text_analysis import hash_split

    docs = load_table(spark, sf_dir, "documents")
    assigned = hash_split(docs, key_col="doc_id")
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "q_redact_pii",
    oracle=r"""
WITH seeded AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
    FROM documents
),
red AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS redacted
    FROM seeded
)
SELECT doc_id,
       right(redacted, 48)             AS tail,
       contains(redacted, '<EMAIL>')   AS has_email,
       contains(redacted, '<PHONE>')   AS has_phone
FROM red
""",
    description=(
        "PII redaction (emails, phone-shaped numbers, SSN-shaped numbers) via "
        "chained regexp_replace — whole-stage codegen, no Python. The fixture "
        "corpus carries no organic PII, so deterministic synthetic PII is "
        "appended per doc first; every row must come back redacted. Patterns "
        "are Java-regex/RE2-portable (no backrefs or lookaround)"
    ),
    tags=("text", "extension", "parity"),
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.text_analysis import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    red = redact_pii(seeded)
    return red.select(
        "doc_id",
        F.right(F.col("redacted"), F.lit(48)).alias("tail"),
        F.col("redacted").contains("<EMAIL>").alias("has_email"),
        F.col("redacted").contains("<PHONE>").alias("has_phone"),
    )


# Shared feature fragment for the gate/funnel queries — textually
# identical to q_quality_score's features so the two stay in lockstep.
_GATE_FEATS_SQL = r"""feats AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS DOUBLE)                    AS n_tok,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)     AS n_uniq,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS n_punct,
           CAST(length(text) AS DOUBLE)                                    AS n_chars
    FROM documents
),
rules AS (
    SELECT doc_id,
           (n_tok < 5) AS r_short,
           ((round((0.35 * least(n_tok / 100.0, 1.0)
               + 0.35 * (n_uniq / CASE WHEN n_tok > 0 THEN n_tok ELSE 1 END)
               + 0.30 * (1.0 - n_punct / CASE WHEN n_chars > 0 THEN n_chars ELSE 1 END))
               * 1000000.0) / 1000000.0) < 0.5) AS r_quality,
           ((n_punct / CASE WHEN n_chars > 0 THEN n_chars ELSE 1 END) > 0.3) AS r_punct,
           ((n_uniq / CASE WHEN n_tok > 0 THEN n_tok ELSE 1 END) < 0.3) AS r_repetitive
    FROM feats
)"""


def _gate_rules(docs: DataFrame) -> DataFrame:
    """Spark mirror of ``_GATE_FEATS_SQL``'s rules CTE."""
    from healthcare_etl_spark.functions.text import punct_count, tokens

    t = F.col("text")
    toks = tokens(t)
    n_tok = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    n_punct = punct_count(t).cast("double")
    n_chars = F.length(t).cast("double")
    safe_tok = F.when(n_tok > 0, n_tok).otherwise(F.lit(1.0))
    safe_chars = F.when(n_chars > 0, n_chars).otherwise(F.lit(1.0))
    qscore = stable_round(
        F.lit(0.35) * F.least(n_tok / 100.0, F.lit(1.0))
        + F.lit(0.35) * (n_uniq / safe_tok)
        + F.lit(0.30) * (1.0 - n_punct / safe_chars),
        6,
    )
    return docs.select(
        "doc_id",
        (n_tok < 5).alias("r_short"),
        (qscore < 0.5).alias("r_quality"),
        ((n_punct / safe_chars) > 0.3).alias("r_punct"),
        ((n_uniq / safe_tok) < 0.3).alias("r_repetitive"),
    )


@register(
    "q_quality_gate",
    oracle=f"""
WITH {_GATE_FEATS_SQL}
SELECT doc_id,
       (NOT (r_short OR r_quality OR r_punct OR r_repetitive)) AS passes,
       CASE WHEN r_short THEN 'too_short'
            WHEN r_quality THEN 'low_quality'
            WHEN r_punct THEN 'symbol_soup'
            WHEN r_repetitive THEN 'repetitive'
            ELSE NULL END AS fail_reason
FROM rules
""",
    description=(
        "Per-document quality gate: ordered filter rules (too_short -> "
        "low_quality -> symbol_soup -> repetitive) with the FIRST failing "
        "rule reported as fail_reason — the keep/drop decision record a "
        "corpus-cleaning run writes next to its output for auditability. "
        "One scan, no shuffle, all codegen'd expressions."
    ),
    tags=("text", "extension", "parity"),
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    r = _gate_rules(docs)
    fail = (
        F.when(F.col("r_short"), F.lit("too_short"))
        .when(F.col("r_quality"), F.lit("low_quality"))
        .when(F.col("r_punct"), F.lit("symbol_soup"))
        .when(F.col("r_repetitive"), F.lit("repetitive"))
    )
    return r.select(
        "doc_id",
        (
            ~(F.col("r_short") | F.col("r_quality") | F.col("r_punct") | F.col("r_repetitive"))
        ).alias("passes"),
        fail.alias("fail_reason"),
    )


@register(
    "q_filter_funnel",
    oracle=f"""
WITH {_GATE_FEATS_SQL},
surv AS (
    SELECT count(*) AS n0,
           CAST(sum(CASE WHEN NOT r_short THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN NOT r_short AND NOT r_quality THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(sum(CASE WHEN NOT r_short AND NOT r_quality AND NOT r_punct THEN 1 ELSE 0 END) AS BIGINT) AS n3,
           CAST(sum(CASE WHEN NOT r_short AND NOT r_quality AND NOT r_punct AND NOT r_repetitive THEN 1 ELSE 0 END) AS BIGINT) AS n4
    FROM rules
)
SELECT stage, n_in, n_out, n_in - n_out AS dropped FROM (
    SELECT 1 AS ord, 'too_short' AS stage,  n0 AS n_in, n1 AS n_out FROM surv
    UNION ALL SELECT 2, 'low_quality', n1, n2 FROM surv
    UNION ALL SELECT 3, 'symbol_soup', n2, n3 FROM surv
    UNION ALL SELECT 4, 'repetitive',  n3, n4 FROM surv
) ORDER BY ord
""",
    description=(
        "Filter-funnel observability: per-stage in/out/dropped counts for the "
        "ordered quality gate — the attrition report every corpus-cleaning run "
        "publishes. Computed as conditional sums in ONE aggregate over one scan "
        "(no per-stage passes), then unpivoted to 4 rows."
    ),
    tags=("text", "extension", "parity"),
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    r = _gate_rules(docs)
    s1 = ~F.col("r_short")
    s2 = s1 & ~F.col("r_quality")
    s3 = s2 & ~F.col("r_punct")
    s4 = s3 & ~F.col("r_repetitive")
    agg = r.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(s1.cast("long")).alias("n1"),
        F.sum(s2.cast("long")).alias("n2"),
        F.sum(s3.cast("long")).alias("n3"),
        F.sum(s4.cast("long")).alias("n4"),
    )
    stages = agg.select(
        F.expr(
            "stack(4, "
            "1, 'too_short',  n0, n1, "
            "2, 'low_quality', n1, n2, "
            "3, 'symbol_soup', n2, n3, "
            "4, 'repetitive',  n3, n4) AS (ord, stage, n_in, n_out)"
        )
    )
    return stages.select(
        "stage", "n_in", "n_out", (F.col("n_in") - F.col("n_out")).alias("dropped")
    ).orderBy("ord")


@register(
    "q_rank_calibration",
    oracle="""
WITH ranked AS (
    SELECT doc_id, source, n_chars,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS pct
    FROM documents
)
SELECT doc_id, source, n_chars,
       (round(pct * 1000000.0) / 1000000.0)              AS pct_rank,
       CAST(least(floor(pct * 10), 9) AS BIGINT)         AS decile
FROM ranked
""",
    description=(
        "Per-source rank calibration: percent_rank of document length "
        "within its source plus the decile bucket — the rank-transform "
        "that makes a raw quality signal comparable ACROSS sources whose "
        "scales differ (a must before one global keep-threshold is "
        "applied to a heterogeneous mixture). One shuffle on source; the "
        "per-source sort is the same work a range-partitioned write "
        "would do. Total order (score, doc_id) makes ranks deterministic."
    ),
    tags=("text", "extension"),
)
def q_rank_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from healthcare_etl_spark.functions.rounding import stable_round

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        stable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.least(F.floor(F.percent_rank().over(w) * 10), F.lit(9).cast("long")).alias(
            "decile"
        ),
    )


@register(
    "q_langid_eval",
    oracle=f"""
WITH preds AS ({_lang_id_oracle_sql()}),
joined AS (
    SELECT d.lang AS gold, p.lang_pred AS pred
    FROM documents d JOIN preds p ON d.doc_id = p.doc_id
),
cells AS (
    SELECT gold, pred, CAST(count(*) AS BIGINT) AS n FROM joined GROUP BY 1, 2
),
gold_tot AS (SELECT gold, sum(n) AS n_gold FROM cells GROUP BY gold),
pred_tot AS (SELECT pred, sum(n) AS n_pred FROM cells GROUP BY pred)
SELECT c.gold, c.pred, c.n,
       (round((c.n * 1.0 / p.n_pred) * 1000000.0) / 1000000.0) AS cell_precision,
       (round((c.n * 1.0 / g.n_gold) * 1000000.0) / 1000000.0) AS cell_recall
FROM cells c
JOIN gold_tot g ON g.gold = c.gold
JOIN pred_tot p ON p.pred = c.pred
""",
    description=(
        "Classifier evaluation of the language-ID heuristic against the "
        "gold ``lang`` labels — the confusion matrix plus per-cell "
        "precision (n / column total) and recall (n / row total), i.e. "
        "the diagonal cells carry each class's precision/recall. The "
        "model-evaluation primitive every heuristic in a data pipeline "
        "should ship with: quality filters and lang-ID are classifiers, "
        "and unevaluated classifiers silently rot. Prediction + join + "
        "three class-count-sized aggregates; the fact-sized work is the "
        "one scoring pass."
    ),
    tags=("text", "extension", "evaluation"),
)
def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    docs = load_table(spark, sf_dir, "documents")
    preds = language_id(docs.select("doc_id", "text")).select("doc_id", "lang_pred")
    joined = docs.select("doc_id", F.col("lang").alias("gold")).join(preds, "doc_id")
    cells = joined.groupBy("gold", F.col("lang_pred").alias("pred")).agg(
        F.count(F.lit(1)).alias("n")
    )
    gold_tot = cells.groupBy("gold").agg(F.sum("n").alias("n_gold"))
    pred_tot = cells.groupBy("pred").agg(F.sum("n").alias("n_pred"))
    return (
        cells.join(F.broadcast(gold_tot), "gold")
        .join(F.broadcast(pred_tot), "pred")
        .select(
            "gold",
            "pred",
            "n",
            stable_round(F.col("n") * F.lit(1.0) / F.col("n_pred"), 6).alias(
                "cell_precision"
            ),
            stable_round(F.col("n") * F.lit(1.0) / F.col("n_gold"), 6).alias(
                "cell_recall"
            ),
        )
    )


@register(
    "q_langid_kappa",
    oracle=f"""
WITH preds AS ({_lang_id_oracle_sql()}),
joined AS (
    SELECT d.lang AS gold, p.lang_pred AS pred
    FROM documents d JOIN preds p ON d.doc_id = p.doc_id
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM joined),
agree AS (SELECT CAST(sum(CASE WHEN gold = pred THEN 1 ELSE 0 END) AS BIGINT) AS a FROM joined),
marg AS (
    SELECT sum(ng * np) AS chance_mass
    FROM (SELECT gold AS c, count(*) AS ng FROM joined GROUP BY gold) g
    JOIN (SELECT pred AS c, count(*) AS np FROM joined GROUP BY pred) p USING (c)
)
SELECT n, a AS n_agree,
       (round((a * 1.0 / n) * 1000000.0) / 1000000.0) AS accuracy,
       (round(((a * 1.0 / n - chance_mass * 1.0 / (n * n))
               / (1.0 - chance_mass * 1.0 / (n * n))) * 1000000.0) / 1000000.0) AS cohens_kappa
FROM tot CROSS JOIN agree CROSS JOIN marg
""",
    description=(
        "Cohen's kappa for the language-ID heuristic vs gold labels — "
        "chance-corrected agreement, the single-number eval that "
        "accuracy inflates on imbalanced classes (predicting the "
        "majority language everywhere scores high accuracy but kappa "
        "~0). Computed from exact integer marginals: observed "
        "agreement, expected chance mass = sum over classes of "
        "gold-count x pred-count, kappa = (po - pe)/(1 - pe). "
        "Class-count-sized joins; one scoring pass over the corpus."
    ),
    tags=("text", "extension", "evaluation"),
)
def q_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    docs = load_table(spark, sf_dir, "documents")
    preds = language_id(docs.select("doc_id", "text")).select("doc_id", "lang_pred")
    joined = docs.select("doc_id", F.col("lang").alias("gold")).join(preds, "doc_id")
    tot = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("gold") == F.col("lang_pred"), 1).otherwise(0)).alias("a"),
    )
    g = joined.groupBy(F.col("gold").alias("c")).agg(F.count(F.lit(1)).alias("ng"))
    p = joined.groupBy(F.col("lang_pred").alias("c")).agg(F.count(F.lit(1)).alias("np"))
    marg = g.join(p, "c").agg(F.sum(F.col("ng") * F.col("np")).alias("chance_mass"))
    po = F.col("a") * F.lit(1.0) / F.col("n")
    pe = F.col("chance_mass") * F.lit(1.0) / (F.col("n") * F.col("n"))
    return tot.crossJoin(F.broadcast(marg)).select(
        "n",
        F.col("a").alias("n_agree"),
        stable_round(po, 6).alias("accuracy"),
        stable_round((po - pe) / (F.lit(1.0) - pe), 6).alias("cohens_kappa"),
    )


@register(
    "q_quality_gains_chart",
    oracle=r"""
WITH feats AS (
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS DOUBLE)                    AS n_tok,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)     AS n_uniq,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS n_punct,
           CAST(length(text) AS DOUBLE)                                    AS n_chars
    FROM documents
),
scored AS (
    SELECT doc_id,
           CAST(lang = 'en' AS INT) AS is_target,
           (round((0.35 * least(n_tok / 100.0, 1.0)
               + 0.35 * (n_uniq / CASE WHEN n_tok > 0 THEN n_tok ELSE 1 END)
               + 0.30 * (1.0 - n_punct / CASE WHEN n_chars > 0 THEN n_chars ELSE 1 END))
               * 1000000.0) / 1000000.0) AS score
    FROM feats
),
ranked AS (
    SELECT is_target,
           ntile(10) OVER (ORDER BY score DESC, doc_id) AS decile
    FROM scored
),
per_decile AS (
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_target) AS BIGINT) AS n_target
    FROM ranked GROUP BY decile
),
tot AS (SELECT sum(n_target) AS total_target FROM per_decile)
SELECT decile, n_docs, n_target,
       (round((sum(n_target) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0 / total_target)
              * 1000000.0) / 1000000.0) AS cum_capture_rate
FROM per_decile CROSS JOIN tot
""",
    description=(
        "Gains/lift chart for the quality score as a ranker of 'en' "
        "documents: docs sorted by score into deciles (deterministic "
        "doc_id tiebreak), each decile's target count and the "
        "cumulative capture rate — the curve that tells a curation "
        "team how much of the target material the top-k% of the "
        "ranking retains (a useless ranker captures 10% per decile). "
        "The decile assignment is a two-phase bucketed rank over "
        "floor(-score*1e6/4096) value buckets (the score is 6dp-exact, "
        "so the negated-micro bucket is order-aligned) plus the "
        "closed-form ntile arithmetic from the broadcast doc count — "
        "no partitionless sort of the corpus; the gains fold is ten "
        "rows."
    ),
    tags=("text", "extension", "evaluation"),
)
def q_quality_gains_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from healthcare_etl_spark.functions.rounding import stable_round
    from healthcare_etl_spark.operators.scale import bucketed_rank, ntile_from_rank
    from healthcare_etl_spark.operators.text_analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("is_target"),
        F.col("quality_score").alias("score"),
    )
    rk = bucketed_rank(
        scored,
        buckets=[F.floor(F.col("score") * F.lit(-1000000.0) / F.lit(4096.0)).cast("long")],
        order_by=[F.desc("score"), F.asc("doc_id")],
        out_col="rk",
    )
    ndf = scored.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    ranked = rk.crossJoin(F.broadcast(ndf)).select(
        "is_target",
        ntile_from_rank(F.col("rk"), F.col("__n"), 10).alias("decile"),
    )
    per_decile = ranked.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_target").alias("n_target"),
    )
    tot = per_decile.agg(F.sum("n_target").alias("total_target"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_decile.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_docs",
            "n_target",
            stable_round(
                F.sum("n_target").over(w) * F.lit(1.0) / F.col("total_target"), 6
            ).alias("cum_capture_rate"),
        )
    )


@register(
    "q_repetition_filter",
    oracle="""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
base AS (
    SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq, t
    FROM tok WHERE len(t) >= 5
),
bg AS (
    SELECT doc_id, n_tok,
           unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
    FROM base
),
bgc AS (
    SELECT doc_id, n_tok, bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM bg GROUP BY 1, 2, 3
),
bgtop AS (
    SELECT doc_id, bigram AS top_bigram, cnt AS top_cnt, n_tok FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY cnt DESC, bigram ASC) AS rn
        FROM bgc
    ) WHERE rn = 1
),
g5 AS (
    SELECT doc_id, n_tok,
           unnest(range(1, n_tok - 3)) AS p,
           t
    FROM base
),
g5n AS (
    SELECT doc_id, n_tok, p, array_to_string(t[p:p+4], ' ') AS gram FROM g5
),
g5c AS (
    SELECT doc_id, n_tok, p,
           count(*) OVER (PARTITION BY doc_id, gram) AS cnt
    FROM g5n
),
cov AS (
    SELECT doc_id, CAST(count(DISTINCT q) AS BIGINT) AS n_cov
    FROM (
        SELECT doc_id, unnest(range(p, p + 5)) AS q
        FROM g5c WHERE cnt >= 2
    ) GROUP BY doc_id
)
SELECT b.doc_id,
       b.n_tok,
       (round(((b.n_tok - b.n_uniq) * 1.0 / b.n_tok) * 1000000.0) / 1000000.0)
           AS dup_tok_frac,
       bt.top_bigram,
       (round((bt.top_cnt * 1.0 / (b.n_tok - 1)) * 1000000.0) / 1000000.0)
           AS top_bigram_frac,
       (round((coalesce(c.n_cov, 0) * 1.0 / b.n_tok) * 1000000.0) / 1000000.0)
           AS dup_5gram_frac,
       ((b.n_tok - b.n_uniq) * 1.0 / b.n_tok <= 0.95
        AND bt.top_cnt * 1.0 / (b.n_tok - 1) <= 0.2
        AND coalesce(c.n_cov, 0) * 1.0 / b.n_tok <= 0.6) AS keep
FROM base b
JOIN bgtop bt ON bt.doc_id = b.doc_id
LEFT JOIN cov c ON c.doc_id = b.doc_id
""",
    description=(
        "Gopher-style intra-document repetition filters (Rae et al. "
        "2021 §A1.1, adapted to word level): duplicate-token fraction, "
        "the most frequent bigram's share of bigram slots, and the "
        "fraction of token positions covered by any 5-gram occurring "
        "twice or more in the same document (computed as a real "
        "interval union over occurrence positions — overlapping "
        "repeats are not double-counted). The standard template/"
        "boilerplate screens an LLM curation pipeline applies after "
        "per-doc quality scoring and before near-dup removal. All "
        "shuffles ride (doc_id) or (doc_id, gram) keys; the only "
        "windows are doc-partitioned."
    ),
    tags=("text", "extension", "quality", "corpus"),
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        toks.alias("t"),
    ).filter(F.col("n_tok") >= 5)

    bg = base.select(
        "doc_id",
        "n_tok",
        F.expr(
            "explode(transform(sequence(1, cast(n_tok - 1 as int)),"
            " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1))))"
        ).alias("bigram"),
    )
    bgc = bg.groupBy("doc_id", "n_tok", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    w_top = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("bigram"))
    bgtop = (
        bgc.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("bigram").alias("top_bigram"), F.col("cnt").alias("top_cnt"))
    )

    g5 = base.select(
        "doc_id",
        "n_tok",
        F.expr(
            "posexplode(transform(sequence(1, cast(n_tok - 4 as int)),"
            " i -> array_join(slice(t, i, 5), ' ')))"
        ).alias("p0", "gram"),
    ).select("doc_id", "n_tok", (F.col("p0") + 1).alias("p"), "gram")
    w_cnt = Window.partitionBy("doc_id", "gram")
    g5c = g5.withColumn("cnt", F.count(F.lit(1)).over(w_cnt))
    cov = (
        g5c.filter(F.col("cnt") >= 2)
        .select("doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + 4)).alias("q"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_cov"))
    )

    out = (
        base.join(bgtop, "doc_id")
        .join(cov, "doc_id", "left")
        .withColumn("n_cov", F.coalesce("n_cov", F.lit(0)))
    )
    dup = (F.col("n_tok") - F.col("n_uniq")) * F.lit(1.0) / F.col("n_tok")
    topf = F.col("top_cnt") * F.lit(1.0) / (F.col("n_tok") - 1)
    covf = F.col("n_cov") * F.lit(1.0) / F.col("n_tok")
    return out.select(
        "doc_id",
        "n_tok",
        stable_round(dup, 6).alias("dup_tok_frac"),
        "top_bigram",
        stable_round(topf, 6).alias("top_bigram_frac"),
        stable_round(covf, 6).alias("dup_5gram_frac"),
        ((dup <= 0.95) & (topf <= 0.2) & (covf <= 0.6)).alias("keep"),
    )


@register(
    "q_ngram_novelty",
    oracle="""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g8 AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 6),
                  i -> array_to_string(t[i:i+7], ' '))) AS gram
    FROM tok WHERE len(t) >= 8
),
dfreq AS (
    SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g8 GROUP BY gram
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       (round((sum(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) * 1.0 / count(*))
              * 1000000.0) / 1000000.0) AS novelty
FROM g8 g JOIN dfreq d ON d.gram = g.gram
GROUP BY g.doc_id
""",
    description=(
        "Cross-document 8-gram novelty: per document, the fraction of "
        "its (overlapping) 8-grams that appear in NO other document — "
        "the memorization/boilerplate screen that separates original "
        "text from template chaff, and the per-doc view of the corpus "
        "duplication the MinHash pipeline removes pairwise. Two "
        "shuffles: gram-keyed document-frequency aggregate, then the "
        "doc-keyed rollup of the joined instances; at 100 TB the gram "
        "key is the natural high-cardinality partitioner (no skew "
        "beyond true boilerplate grams, which AQE splits)."
    ),
    tags=("text", "extension", "corpus", "dedup"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = docs.select("doc_id", F.size(toks).alias("n_tok"), toks.alias("t")).filter(
        F.col("n_tok") >= 8
    )
    g8 = base.select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(1, cast(n_tok - 7 as int)),"
            " i -> array_join(slice(t, i, 8), ' ')))"
        ).alias("gram"),
    )
    dfreq = g8.groupBy("gram").agg(F.count_distinct("doc_id").alias("n_docs"))
    joined = g8.join(dfreq, "gram")
    novel = F.when(F.col("n_docs") == 1, 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(novel).alias("n_novel"),
        stable_round(F.sum(novel) * F.lit(1.0) / F.count(F.lit(1)), 6).alias("novelty"),
    )


@register(
    "q_readability",
    oracle="""
WITH counts AS (
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_words,
           CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
               AS n_sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
               AS n_syllables
    FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       (round((206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                       - 84.6 * (n_syllables * 1.0 / n_words))
              * 1000000.0) / 1000000.0) AS flesch
FROM counts
""",
    description=(
        "Flesch reading-ease per document from whole-doc regex counts: "
        "words (whitespace runs), sentences (terminal-punctuation "
        "runs, floored at 1), syllables approximated as vowel-group "
        "runs — the grade-level quality signal used alongside "
        "q_quality_score's ratio heuristics when curating training "
        "text (too-low reading ease flags boilerplate/legalese; "
        "too-high flags token soup). Everything is three "
        "regexp_extract_all counts in ONE codegen'd projection — no "
        "explode, no per-word shuffle, so cost is a single scan at "
        "any corpus size; the score is a fixed rational expression of "
        "exact BIGINT counts."
    ),
    tags=("text", "extension", "quality"),
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    n_sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)).cast("long"),
    )
    n_syllables = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    counts = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    return counts.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        stable_round(
            F.lit(206.835)
            - 1.015 * (F.col("n_words") * 1.0 / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables") * 1.0 / F.col("n_words")),
            6,
        ).alias("flesch"),
    )


@register(
    "q_token_fertility",
    oracle=r"""
WITH feats AS (
    SELECT lang,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS n_bpe,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT)    AS n_docs,
       CAST(sum(n_bpe) AS BIGINT)  AS n_tokens,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       (round((sum(n_bpe) * 1.0 / sum(n_words)) * 1000000.0) / 1000000.0)
           AS fertility,
       (round((sum(n_chars) * 1.0 / sum(n_bpe)) * 1000000.0) / 1000000.0)
           AS chars_per_token,
       (round((sum(n_bpe) * 1.0 / count(*)) * 1000000.0) / 1000000.0)
           AS tokens_per_doc
FROM feats
GROUP BY lang
ORDER BY lang
""",
    description=(
        "Tokenizer fertility profile per language: BPE-ish tokens per "
        "whitespace word (fertility), chars per token, and tokens per "
        "document. The standard multilingual-tokenizer health check — "
        "a language whose fertility is 2x the corpus median pays 2x "
        "the context budget for the same text, which drives vocab "
        "rebalancing decisions before a training run. One codegen'd "
        "projection + one groupBy(lang): map-side partial aggregation, "
        "no shuffle beyond the ~|langs| partials."
    ),
    tags=("text", "extension", "tokenizer"),
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    feats = docs.select(
        "lang",
        F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"))
        .cast("long")
        .alias("n_bpe"),
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bpe").cast("long").alias("n_tokens"),
            F.sum("n_words").cast("long").alias("n_words"),
            stable_round(F.sum("n_bpe") * 1.0 / F.sum("n_words"), 6).alias("fertility"),
            stable_round(F.sum("n_chars") * 1.0 / F.sum("n_bpe"), 6).alias(
                "chars_per_token"
            ),
            stable_round(F.sum("n_bpe") * 1.0 / F.count(F.lit(1)), 6).alias(
                "tokens_per_doc"
            ),
        )
        .orderBy("lang")
    )


@register(
    "q_kneser_ney_bigram",
    oracle="""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
    SELECT doc_id, t, unnest(range(1, len(t))) AS p
    FROM tk WHERE len(t) >= 2
),
bg AS (SELECT t[p] AS w1, t[p + 1] AS w2 FROM g),
cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
fwd AS (
    SELECT w1, CAST(sum(c) AS BIGINT) AS cw,
           CAST(count(*) AS BIGINT) AS n1f
    FROM cb GROUP BY w1
),
bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM cb GROUP BY w2),
tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cb),
top AS (
    SELECT w1, w2, c FROM (
        SELECT *, row_number() OVER (ORDER BY c DESC, w1, w2) AS rk FROM cb
    ) WHERE rk <= 30
)
SELECT top.w1, top.w2, top.c,
       (round((greatest(top.c - 0.75, 0.0) / cw
               + (0.75 * n1f / cw) * (n1b * 1.0 / (SELECT t FROM tt)))
              * 100000000.0) / 100000000.0) AS p_kn
FROM top JOIN fwd USING (w1) JOIN bwd USING (w2)
ORDER BY top.c DESC, top.w1, top.w2
""",
    description=(
        "Interpolated Kneser-Ney bigram probabilities (absolute "
        "discount D=0.75) for the corpus's 30 most frequent bigrams: "
        "P(w2|w1) = max(c-D,0)/c(w1) + D*N1+(w1,.)/c(w1) * "
        "N1+(.,w2)/|bigram types| — the smoothing that backs off to "
        "CONTINUATION counts (how many contexts a word follows) "
        "rather than raw frequency, which is why KN still dominates "
        "count-based LM baselines and perplexity-filter scoring. "
        "Everything is four hash aggregations over the exploded "
        "bigram stream (counts, forward/backward type counts, type "
        "total — all exact integers; the probability is one fixed "
        "float expression); the top-30 rank rides WindowGroupLimit "
        "pre-truncation. Evaluating P_KN for a doc stream is the "
        "same join shape against these count tables."
    ),
    tags=("text", "extension", "lm"),
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    g = docs.filter(F.size("t") >= 2).select(
        "t", F.explode(F.expr("sequence(1, size(t) - 1)")).alias("p")
    )
    bg = g.select(
        F.element_at("t", F.col("p")).alias("w1"),
        F.element_at("t", F.col("p") + 1).alias("w2"),
    )
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    fwd = cb.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw"), F.count(F.lit(1)).cast("long").alias("n1f")
    )
    bwd = cb.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    tt = cb.agg(F.count(F.lit(1)).cast("long").alias("t_types"))
    w = Window.orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
    top = cb.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 30)
    pkn = F.greatest(F.col("c") - 0.75, F.lit(0.0)) / F.col("cw") + (
        F.lit(0.75) * F.col("n1f") / F.col("cw")
    ) * (F.col("n1b") * 1.0 / F.col("t_types"))
    return (
        top.join(fwd, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tt))
        .select("w1", "w2", "c", stable_round(pkn, 8).alias("p_kn"))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
    )


@register(
    "q_symspell_candidates",
    oracle="""
WITH tok AS (
    SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ) WHERE length(w) BETWEEN 4 AND 12 AND regexp_matches(w, '^[a-z]+$')
    GROUP BY w
),
vocab AS (SELECT w, c FROM tok WHERE c >= 10),
typos AS (
    SELECT substr(w, 1, CAST(length(w) // 2 - 1 AS INTEGER))
           || substr(w, CAST(length(w) // 2 + 1 AS INTEGER)) AS typo
    FROM (
        SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rk
        FROM tok WHERE c >= 10
    ) WHERE rk <= 10
),
vdel AS (
    SELECT w, substr(w, 1, CAST(p - 1 AS INTEGER))
               || substr(w, CAST(p + 1 AS INTEGER)) AS d
    FROM vocab CROSS JOIN (SELECT unnest(range(1, 13)) AS p)
    WHERE p <= length(w)
    UNION ALL SELECT w, w FROM vocab
),
tdel AS (
    SELECT typo, substr(typo, 1, CAST(p - 1 AS INTEGER))
                 || substr(typo, CAST(p + 1 AS INTEGER)) AS d
    FROM typos CROSS JOIN (SELECT unnest(range(1, 13)) AS p)
    WHERE p <= length(typo)
    UNION ALL SELECT typo, typo FROM typos
),
cand AS (
    SELECT DISTINCT t.typo, v.w AS suggestion
    FROM tdel t JOIN vdel v ON t.d = v.d
    WHERE t.typo <> v.w
),
ver AS (
    SELECT cd.typo, cd.suggestion, vocab.c AS sugg_freq,
           CAST(levenshtein(cd.typo, cd.suggestion) AS BIGINT) AS dist
    FROM cand cd JOIN vocab ON vocab.w = cd.suggestion
)
SELECT typo, suggestion, sugg_freq, dist
FROM ver WHERE dist <= 1
ORDER BY typo, sugg_freq DESC, suggestion
""",
    description=(
        "SymSpell spelling-correction candidates: vocabulary words "
        "(freq >= 10) and probe typos (middle-char deletions of the 10 "
        "most frequent words) each expand to their 1-deletion "
        "neighborhoods, candidates meet on an EQUI-JOIN of deletion "
        "strings, and survivors are verified with levenshtein <= 1 — "
        "the trick that turns edit-distance search from a vocabulary "
        "scan per query into O(word-length) index lookups, which is "
        "why SymSpell-style correction runs at web-log scale. The "
        "deletion index shuffles short strings; verification touches "
        "only hash-join survivors (identical md5-free determinism on "
        "both engines — levenshtein is exact integer)."
    ),
    tags=("text", "extension", "quality"),
)
def q_symspell_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    tok = (
        docs.filter(
            F.length("w").between(4, 12) & F.col("w").rlike("^[a-z]+$")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).localCheckpoint(eager=True)
    vocab = tok.filter(F.col("c") >= 10)
    wrk = Window.orderBy(F.desc("c"), F.asc("w"))
    typos = (
        tok.filter(F.col("c") >= 10)
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= 10)
        .select(
            F.concat(
                F.expr("substr(w, 1, CAST(length(w) div 2 - 1 AS INT))"),
                F.expr("substr(w, CAST(length(w) div 2 + 1 AS INT))"),
            ).alias("typo")
        )
    )
    grid = spark.range(1, 13).select(F.col("id").alias("p"))

    def deletions(df, col):
        d = (
            df.crossJoin(F.broadcast(grid))
            .filter(F.col("p") <= F.length(col))
            .select(
                F.col(col),
                F.concat(
                    F.expr(f"substr({col}, 1, CAST(p - 1 AS INT))"),
                    F.expr(f"substr({col}, CAST(p + 1 AS INT))"),
                ).alias("d"),
            )
        )
        return d.unionAll(df.select(F.col(col), F.col(col).alias("d")))

    vdel = deletions(vocab.select("w"), "w")
    tdel = deletions(typos, "typo")
    cand = (
        tdel.join(vdel, "d")
        .filter(F.col("typo") != F.col("w"))
        .select("typo", F.col("w").alias("suggestion"))
        .distinct()
    )
    ver = cand.join(
        vocab.select(F.col("w").alias("suggestion"), F.col("c").alias("sugg_freq")),
        "suggestion",
    ).select(
        "typo",
        "suggestion",
        "sugg_freq",
        F.levenshtein("typo", "suggestion").cast("long").alias("dist"),
    )
    return ver.filter(F.col("dist") <= 1).orderBy(
        "typo", F.desc("sugg_freq"), "suggestion"
    )


# ---------------------------------------------------------------------------
# ROUGE overlap + code-switch detection (round-6 continuation-5)


@register(
    "q_rouge_overlap",
    oracle="""
WITH toks AS (
    SELECT doc_id, source, string_split(lower(text), ' ') AS w
    FROM documents
),
grams AS (
    SELECT doc_id, source,
           lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref_id,
           list_distinct(w) AS u1,
           list_distinct(list_transform(range(1, len(w)),
               i -> w[i] || ' ' || w[i + 1])) AS u2
    FROM toks
),
pairs AS (
    SELECT c.doc_id AS cand_id, r.doc_id AS ref_id,
           CAST(len(list_intersect(c.u1, r.u1)) AS BIGINT) AS n_overlap1,
           CAST(len(list_intersect(c.u2, r.u2)) AS BIGINT) AS n_overlap2,
           CAST(len(r.u1) AS BIGINT) AS n_ref1,
           CAST(len(r.u2) AS BIGINT) AS n_ref2
    FROM grams c JOIN grams r ON r.doc_id = c.ref_id
)
SELECT cand_id, ref_id, n_overlap1, n_overlap2,
       (round((n_overlap1 * 1.0 / n_ref1) * 1000000.0) / 1000000.0)
           AS rouge1_recall,
       CASE WHEN n_ref2 = 0 THEN 0.0
            ELSE (round((n_overlap2 * 1.0 / n_ref2) * 1000000.0) / 1000000.0)
       END AS rouge2_recall
FROM pairs
""",
    description=(
        "Set-based ROUGE-1/ROUGE-2 recall between adjacent same-source "
        "document pairs (the deterministic pairing stands in for any "
        "candidate/reference alignment — summarization eval, near-dup "
        "explanation, paraphrase screening): unique-unigram and unique-"
        "bigram recall of the candidate against the reference. Bigrams "
        "come from a zip of the token array with its own tail — pure "
        "expression-tree work, no explode, no shuffle beyond the "
        "adjacent-id equi-join (which at 100 TB co-partitions on "
        "doc_id just like the q_passage_dedup key join). The multiset-"
        "clipped ROUGE variant swaps list_intersect for a clipped "
        "frequency join; the set form is the standard dedup-screen "
        "approximation."
    ),
    tags=("text", "extension", "evaluation", "parity"),
)
def q_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = F.split(F.lower(F.col("text")), " ")
    n = F.size(w)
    bigrams = F.zip_with(
        F.slice(w, 1, n - 1),
        F.slice(w, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    from pyspark.sql.window import Window

    ws = Window.partitionBy("source").orderBy("doc_id")
    grams = docs.select(
        "doc_id",
        "source",
        F.array_distinct(w).alias("u1"),
        F.array_distinct(bigrams).alias("u2"),
    ).withColumn("next_id", F.lead("doc_id").over(ws))
    c = grams.select(
        F.col("doc_id").alias("cand_id"),
        F.col("next_id"),
        F.col("u1").alias("cu1"),
        F.col("u2").alias("cu2"),
    )
    r = grams.select(
        F.col("doc_id").alias("ref_id"),
        F.col("u1").alias("ru1"),
        F.col("u2").alias("ru2"),
    )
    pairs = c.join(r, F.col("ref_id") == F.col("next_id")).select(
        "cand_id",
        "ref_id",
        F.size(F.array_intersect("cu1", "ru1")).cast("long").alias("n_overlap1"),
        F.size(F.array_intersect("cu2", "ru2")).cast("long").alias("n_overlap2"),
        F.size("ru1").cast("long").alias("n_ref1"),
        F.size("ru2").cast("long").alias("n_ref2"),
    )
    return pairs.select(
        "cand_id",
        "ref_id",
        "n_overlap1",
        "n_overlap2",
        stable_round(F.col("n_overlap1") * 1.0 / F.col("n_ref1"), 6).alias(
            "rouge1_recall"
        ),
        F.when(F.col("n_ref2") == 0, F.lit(0.0))
        .otherwise(stable_round(F.col("n_overlap2") * 1.0 / F.col("n_ref2"), 6))
        .alias("rouge2_recall"),
    )


def _half_lang_sql(half_expr: str, tag: str) -> str:
    """Score/argmax SQL for one half's token list — mirrors
    operators.text_analysis.language_id's first-maximizer tie-break."""
    from healthcare_etl_spark.operators.text_analysis import STOPWORD_PROFILES

    langs = list(STOPWORD_PROFILES)
    scores = ", ".join(
        f"len(list_intersect({half_expr}, ["
        + ", ".join(f"'{w}'" for w in STOPWORD_PROFILES[lang])
        + f"]))::BIGINT AS s_{tag}_{lang}"
        for lang in langs
    )
    cases = []
    for i, lang in enumerate(langs):
        later = [f"s_{tag}_{other}" for other in langs[i + 1 :]]
        cond = f"s_{tag}_{lang} > 0"
        if later:
            cond += f" AND s_{tag}_{lang} >= greatest({', '.join(later)})"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_chain = " ".join(cases)
    return scores, f"CASE {case_chain} ELSE 'und' END"


def _code_switch_oracle() -> str:
    s1, c1 = _half_lang_sql("h1", "a")
    s2, c2 = _half_lang_sql("h2", "b")
    return f"""
WITH toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
),
halves AS (
    SELECT doc_id,
           list_distinct(w[1 : CAST(len(w) // 2 AS INTEGER)]) AS h1,
           list_distinct(w[CAST(len(w) // 2 + 1 AS INTEGER) : CAST(len(w) AS INTEGER)]) AS h2
    FROM toks
),
scored AS (
    SELECT doc_id, {s1}, {s2}
    FROM halves
),
pred AS (
    SELECT doc_id, {c1} AS lang_first, {c2} AS lang_second
    FROM scored
)
SELECT doc_id, lang_first, lang_second,
       (lang_first <> lang_second) AS is_code_switched
FROM pred
"""


def _lang_pred_col(toks):
    """First-maximizer stopword argmax over a distinct-token array column
    (the language_id loop lifted to an arbitrary Column)."""
    from healthcare_etl_spark.operators.text_analysis import STOPWORD_PROFILES

    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in STOPWORD_PROFILES:
        s = F.size(
            F.array_intersect(toks, F.array(*[F.lit(x) for x in STOPWORD_PROFILES[lang]]))
        )
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    return best_lang


@register(
    "q_code_switch_detect",
    oracle=_code_switch_oracle(),
    description=(
        "Mixed-language (code-switch) detection: each document's token "
        "stream splits at the midpoint, both halves run the stopword-"
        "argmax language ID (same profiles and first-maximizer tie-break "
        "as q_lang_id, inlined into the oracle), and a disagreement "
        "flags the document — the document-purity check that a per-doc "
        "single-label language filter (q_lang_id) cannot express, and "
        "the gate a monolingual training mix needs before trusting the "
        "lang column. Pure per-row expression trees (array slice + "
        "intersect); no shuffle at all beyond the scan."
    ),
    tags=("text", "extension", "quality", "parity"),
)
def q_code_switch_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.lower(F.col("text")), " ")
    n = F.size(w)
    h = F.floor(n / 2).cast("int")
    halves = docs.select(
        "doc_id",
        F.array_distinct(F.slice(w, 1, h)).alias("h1"),
        F.array_distinct(F.slice(w, h + 1, n - h)).alias("h2"),
    )
    pred = halves.select(
        "doc_id",
        _lang_pred_col(F.col("h1")).alias("lang_first"),
        _lang_pred_col(F.col("h2")).alias("lang_second"),
    )
    return pred.select(
        "doc_id",
        "lang_first",
        "lang_second",
        (F.col("lang_first") != F.col("lang_second")).alias("is_code_switched"),
    )


def _label_noise_oracle() -> str:
    from healthcare_etl_spark.operators.text_analysis import STOPWORD_PROFILES

    s1, c1 = _half_lang_sql("toks", "p")
    best = ", ".join(f"s_p_{lang}" for lang in STOPWORD_PROFILES)
    return f"""
WITH toks AS (
    SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS toks
    FROM documents
),
scored AS (
    SELECT doc_id, lang, {s1},
           greatest({best}, 0)::BIGINT AS best_score
    FROM toks
),
pred AS (
    SELECT doc_id, lang, best_score, {c1} AS lang_pred
    FROM scored
)
SELECT lang AS label, lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(best_score) AS BIGINT) AS max_score
FROM pred
WHERE lang_pred <> 'und' AND lang_pred <> lang AND best_score >= 1
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "q_label_noise_screen",
    oracle=_label_noise_oracle(),
    description=(
        "Label-noise screen (confident-learning-lite, Northcutt et al. "
        "2021): documents whose stored lang label disagrees with a "
        "confident stopword-argmax prediction (>=1 hit, not 'und') "
        "aggregate into a (label, predicted) disagreement matrix of "
        "relabel/review candidates — the "
        "label-quality gate a classifier training set needs before "
        "q_naive_bayes trusts the lang column as ground truth "
        "(q_langid_eval measures the model against labels; THIS query "
        "questions the labels). Pure per-row expression trees over one "
        "scan; the same scores/argmax inlined in the oracle as "
        "q_lang_id."
    ),
    tags=("text", "quality", "mlops", "extension", "parity"),
)
def q_label_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = F.array_distinct(F.split(F.lower(F.col("text")), " "))
    from healthcare_etl_spark.operators.text_analysis import STOPWORD_PROFILES

    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lg in STOPWORD_PROFILES:
        s = F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(x) for x in STOPWORD_PROFILES[lg]])
            )
        )
        better = s > best_score
        best_lang = F.when(better, F.lit(lg)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    pred = docs.select(
        F.col("lang").alias("label"),
        best_lang.alias("lang_pred"),
        F.greatest(best_score, F.lit(0)).cast("long").alias("best_score"),
    )
    flagged = pred.filter(
        (F.col("lang_pred") != "und")
        & (F.col("lang_pred") != F.col("label"))
        & (F.col("best_score") >= 1)
    )
    return (
        flagged.groupBy("label", "lang_pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("best_score").cast("long").alias("max_score"),
        )
        .orderBy("label", "lang_pred")
    )
