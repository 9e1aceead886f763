"""Analytics extension queries: outer joins, array higher-order
functions, Markov transition matrices, skew diagnostics, time-series
gap-filling, and robust (MAD) outlier detection.

These widen the relational/analytics surface beyond the reference
(reference scope is `etl_app/etl_script.py:74-119` + dashboard
aggregates `dashboard_app/app.py:45-101`); each is a pattern a
large-scale data-pipeline team reaches for daily. All are oracle-checked
against DuckDB with identical arithmetic on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "q_full_outer_join",
    oracle="""
WITH c AS (
    SELECT user_id, count(*) AS n_clicks
    FROM events WHERE event_type = 'click' GROUP BY 1
),
p AS (
    SELECT user_id, count(*) AS n_purchases
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT coalesce(c.user_id, p.user_id)  AS user_id,
       coalesce(n_clicks, 0)           AS n_clicks,
       coalesce(n_purchases, 0)        AS n_purchases,
       CASE WHEN c.user_id IS NULL THEN 'purchase_only'
            WHEN p.user_id IS NULL THEN 'click_only'
            ELSE 'both' END            AS status
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
""",
    description=(
        "FULL OUTER equi-join of two per-user aggregates (clickers vs "
        "purchasers), preserving unmatched rows on BOTH sides. Completes "
        "the join family (inner/left/semi/anti already registered). A "
        "full-outer join can never broadcast either side — the plan is "
        "the correct shuffle hash join on the coalesced key."
    ),
    tags=("relational", "extension", "parity"),
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    # Name-based join coalesces the key column (USING semantics), so the
    # output has ONE user_id populated from whichever side matched.
    joined = clicks.withColumn("c_key", F.col("user_id")).join(
        purchases.withColumn("p_key", F.col("user_id")), on="user_id", how="full_outer"
    )
    return joined.select(
        "user_id",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.when(F.col("c_key").isNull(), "purchase_only")
        .when(F.col("p_key").isNull(), "click_only")
        .otherwise("both")
        .alias("status"),
    )


@register(
    "q_higher_order_funcs",
    oracle="""
SELECT vec_id,
       len(embedding)                                            AS dim,
       len(list_filter(embedding, x -> x > 0))                   AS n_pos,
       (round((sqrt(list_reduce(
            list_prepend(CAST(0.0 AS DOUBLE),
                         list_transform(embedding,
                                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
            (acc, x) -> acc + x))) * 10000.0) / 10000.0)          AS l2_norm,
       (round((list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE))))) * 10000.0)
        / 10000.0)                                                AS max_abs
FROM embeddings
""",
    description=(
        "Array higher-order functions (transform / filter / aggregate / "
        "array_max) over the embedding column — all JVM-side codegen'd "
        "lambda expressions, zero Python. The oracle mirrors the exact "
        "left-fold summation order via DuckDB list_reduce so doubles are "
        "bit-comparable before rounding."
    ),
    tags=("functions", "extension", "parity"),
)
def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def sq(x):
        return x.cast("double") * x.cast("double")

    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > F.lit(0.0))).cast("long").alias("n_pos"),
        stable_round(
            F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + sq(x))), 4
        ).alias("l2_norm"),
        stable_round(
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))), 4
        ).alias("max_abs"),
    )


@register(
    "q_event_transitions",
    oracle="""
WITH pairs AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type, count(*) AS n
    FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       (round((n / sum(n) OVER (PARTITION BY from_type)) * 1000000.0) / 1000000.0) AS p
FROM counts
""",
    description=(
        "First-order Markov transition matrix over per-user event "
        "sequences: lead() window pairs consecutive events (one shuffle "
        "on user_id), hash-agg counts pairs, a second tiny window "
        "normalizes rows to probabilities. The per-user window partition "
        "scales with the user-id cardinality, never a global sort."
    ),
    tags=("events", "extension", "parity"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        stable_round(F.col("n") / F.sum("n").over(wf), 6).alias("p"),
    )


@register(
    "q_skew_profile",
    oracle="""
WITH counts AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
tot    AS (SELECT count(*) AS total FROM events)
SELECT user_id, n_events,
       (round((n_events / total) * 1000000.0) / 1000000.0) AS share
FROM counts, tot
ORDER BY n_events DESC, user_id
LIMIT 10
""",
    description=(
        "Key-distribution (skew) diagnostic: the 10 heaviest join/agg "
        "keys with their traffic share — the profiling step that decides "
        "whether a salted join or AQE skew handling is needed before a "
        "big shuffle. Top-k via TakeOrderedAndProject (no global sort); "
        "the grand total is a 1-row broadcast."
    ),
    tags=("diagnostics", "extension", "parity"),
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    top = counts.orderBy(F.desc("n_events"), F.asc("user_id")).limit(10)
    return top.crossJoin(F.broadcast(total)).select(
        "user_id",
        "n_events",
        stable_round(F.col("n_events") / F.col("total"), 6).alias("share"),
    )


@register(
    "q_gap_fill",
    oracle="""
WITH hourly AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
           (round((sum(value)) * 10000.0) / 10000.0) AS sum_value
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
           time_bucket(INTERVAL '1 hour', max(ts)) AS hi
    FROM events
),
grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS h FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
full_grid AS (SELECT h, event_type FROM grid CROSS JOIN types)
SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
       g.event_type,
       hourly.sum_value                    AS observed,
       coalesce(last_value(hourly.sum_value IGNORE NULLS) OVER (
            PARTITION BY g.event_type ORDER BY g.h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled,
       hourly.sum_value IS NULL            AS is_gap
FROM full_grid g
LEFT JOIN hourly ON g.h = hourly.h AND g.event_type = hourly.event_type
""",
    description=(
        "Time-series gap filling: a dense hour grid is generated from the "
        "series bounds (sequence + explode — one row of input, never a "
        "driver loop), left-joined with observed hourly sums, and gaps "
        "forward-filled with last(ignorenulls) per series. At 100 TB the "
        "per-series window partitions by series key; a composite "
        "(series, coarse-bucket) key with boundary carry is the "
        "documented path when a single series outgrows one partition."
    ),
    tags=("events", "extension", "parity"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(stable_round(F.sum("value"), 4).alias("sum_value"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    full_grid = grid.crossJoin(F.broadcast(types))
    joined = full_grid.join(hourly, ["h", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.date_format("h", _TS_FMT).alias("hour"),
        "event_type",
        F.col("sum_value").alias("observed"),
        F.coalesce(F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "filled"
        ),
        F.col("sum_value").isNull().alias("is_gap"),
    )


@register(
    "q_anomaly_mad",
    oracle="""
WITH med AS (
    SELECT event_type,
           (round((quantile_cont(value, 0.5)) * 1000000.0) / 1000000.0) AS med
    FROM events GROUP BY 1
),
mad AS (
    SELECT e.event_type, med,
           (round((quantile_cont(abs(e.value - med), 0.5)) * 1000000.0) / 1000000.0) AS mad
    FROM events e JOIN med USING (event_type)
    GROUP BY e.event_type, med
)
SELECT e.event_type,
       count(*)                                                  AS n,
       CAST(sum(CASE WHEN abs(e.value - med) > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
                                                                 AS n_outliers,
       med, mad
FROM events e JOIN mad USING (event_type)
GROUP BY e.event_type, med, mad
""",
    description=(
        "Robust outlier detection via median absolute deviation: exact "
        "grouped median, then median |x - med|, then |x - med| > 3*MAD "
        "flags — two passes over the facts with the tiny per-group stats "
        "broadcast back. med/MAD are stable-rounded BEFORE the threshold "
        "comparison so the boundary decision is bit-identical in both "
        "engines. approx_percentile swaps in as the single-pass sketch "
        "path at 100 TB (q_approx_quantiles)."
    ),
    tags=("events", "extension", "parity"),
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(stable_round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "n", "n_outliers", "med", "mad")
    )


# ---------------------------------------------------------------------------
# Sketch + iterative-graph extensions
# ---------------------------------------------------------------------------

_BLOOM_POS_SQL = (
    "(('0x' || substring(md5('bloom' || CAST(i AS VARCHAR) || ':' || g), 1, 8))::BIGINT"
    " % 8257536)"
)


@register(
    "q_bloom_decontaminate",
    oracle=f"""
WITH split AS (
    SELECT doc_id, text,
           ((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)
             % 10 = 0) AS is_test
    FROM documents
),
tok AS (SELECT doc_id, is_test, string_split(text, ' ') AS t FROM split),
grams AS (
    SELECT doc_id, is_test,
           unnest(list_transform(range(1, len(t) - 6),
                                 i -> array_to_string(t[i:i+7], ' '))) AS g
    FROM tok WHERE len(t) >= 8
),
test_grams AS (SELECT DISTINCT g FROM grams WHERE is_test),
train_grams AS (SELECT DISTINCT doc_id, g FROM grams WHERE NOT is_test),
test_cells AS (
    SELECT CAST(floor(pos / 63.0) AS BIGINT) AS word,
           (1::BIGINT << CAST(pos % 63 AS INT)) AS mask
    FROM (SELECT {_BLOOM_POS_SQL} AS pos
          FROM test_grams CROSS JOIN (SELECT unnest(range(4)) AS i))
),
sketch AS (SELECT word, bit_or(mask) AS bits FROM test_cells GROUP BY word),
probe_cells AS (
    SELECT doc_id, g,
           CAST(floor(pos / 63.0) AS BIGINT) AS word,
           (1::BIGINT << CAST(pos % 63 AS INT)) AS mask
    FROM (SELECT doc_id, g, {_BLOOM_POS_SQL} AS pos
          FROM train_grams CROSS JOIN (SELECT unnest(range(4)) AS i))
),
gram_hits AS (
    SELECT doc_id, g,
           (sum(CASE WHEN bits IS NOT NULL AND (bits & mask) = mask
                     THEN 1 ELSE 0 END) = 4) AS hit
    FROM probe_cells LEFT JOIN sketch USING (word)
    GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT)                              AS n_grams,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)  AS n_hit_grams,
       (sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0)            AS flagged
FROM gram_hits GROUP BY doc_id
""",
    description=(
        "Sketch-based train/test decontamination: the held-out split's "
        "8-gram set is compressed into a mergeable Bloom filter DataFrame "
        "(131072 words x 63 bits, k=4 salted-md5 probes), then every "
        "training document's grams are membership-tested against the "
        "BROADCAST sketch — the scale path for q_decontaminate's exact "
        "gram join: the huge training side never shuffles against the "
        "held-out set, only against a fixed-size bitmap. No false "
        "negatives (leaks cannot slip through); the deterministic false-"
        "positive arithmetic is reproduced bit-for-bit by the oracle."
    ),
    tags=("text", "extension", "sketch", "parity"),
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.sketches import bloom_build, bloom_probe
    from healthcare_etl_spark.plans.queries_pipeline_ops import _doc_hash

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    split = docs.select("doc_id", "text", ((_doc_hash() % 10) == 0).alias("is_test"))
    toks = F.split("text", " ")
    base = split.select(
        "doc_id",
        "is_test",
        F.size(toks).alias("n_tok"),
        F.posexplode(toks).alias("pos", "w"),
    ).filter(F.col("n_tok") >= 8)
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w).alias(f"w{i}") for i in range(1, 8)]
    grams = (
        base.select("doc_id", "is_test", *parts)
        .filter(F.col("w7").isNotNull())
        .select(
            "doc_id",
            "is_test",
            F.concat_ws(" ", "w", *[f"w{i}" for i in range(1, 8)]).alias("g"),
        )
        # Both the sketch build and the probe consume this subtree.
        .localCheckpoint(eager=True)
    )
    sketch = bloom_build(grams.filter(F.col("is_test")).select("g").distinct(), "g")
    train = grams.filter(~F.col("is_test")).select("doc_id", "g").distinct()
    hits = bloom_probe(train, "g", sketch, hit_col="hit")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hit_grams"),
        (F.sum(F.when(F.col("hit"), 1).otherwise(0)) > 0).alias("flagged"),
    )


def _pagerank_oracle() -> str:
    from healthcare_etl_spark.plans.queries_dedup import _jaccard_pairs_ctes

    parts = [
        f"WITH {_jaccard_pairs_ctes()},",
        """
pedges AS (
    SELECT doc_a AS u, doc_b AS v FROM jpairs
    WHERE (round(jac * 1000000.0) / 1000000.0) >= 0.5
    UNION
    SELECT doc_b AS u, doc_a AS v FROM jpairs
    WHERE (round(jac * 1000000.0) / 1000000.0) >= 0.5
),
deg AS (SELECT u, count(*) AS d FROM pedges GROUP BY u),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
    SELECT u AS node, d,
           (round((1.0 / n) * 10000000000.0) / 10000000000.0) AS rank
    FROM deg, nn
),""",
    ]
    for t in range(1, 6):
        parts.append(
            f"""
c{t} AS (
    SELECT e.v AS node, sum(r.rank / r.d) AS s
    FROM pedges e JOIN r{t - 1} r ON r.node = e.u GROUP BY e.v
),
r{t} AS (
    SELECT b.node, b.d,
           (round((0.15 / n + 0.85 * coalesce(c{t}.s, 0.0)) * 10000000000.0)
            / 10000000000.0) AS rank
    FROM r0 b LEFT JOIN c{t} USING (node), nn
),"""
        )
    body = "".join(parts).rstrip(",\n") + "\n"
    return body + "SELECT node AS doc_id, rank FROM r5"


@register(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    description=(
        "PageRank (5 damped power iterations, d=0.85) over the symmetrized "
        "near-dup pair graph — centrality scoring for picking the canonical "
        "representative of a duplicate cluster, and the second iterative-"
        "graph shape alongside connected components: per-round join + hash "
        "agg on the node id, edges checkpointed once, driver holds no row "
        "data. Per-iteration stable rounding keeps the doubles bit-equal to "
        "the unrolled-CTE oracle."
    ),
    tags=("dedup", "extension", "iterative", "parity"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import jaccard_pairs
    from healthcare_etl_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    return pagerank(pairs, iterations=5, teleport_weight=0.15).select(
        F.col("node").alias("doc_id"), "rank"
    )


@register(
    "q_interval_overlap",
    oracle="""
WITH gaps AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS is_new
    FROM events
),
sess AS (
    SELECT user_id, ts,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
    FROM gaps
),
s AS (
    SELECT user_id, session_seq, min(ts) AS t0, max(ts) AS t1, count(*) AS n_events
    FROM sess GROUP BY 1, 2
),
err AS (SELECT ts FROM events WHERE event_type = 'error')
SELECT s.user_id, s.session_seq,
       strftime(t0, '%Y-%m-%d %H:%M:%S') AS session_start,
       n_events,
       CAST(count(err.ts) AS BIGINT) AS n_errors_during
FROM s LEFT JOIN err ON err.ts >= s.t0 AND err.ts <= s.t1
GROUP BY s.user_id, s.session_seq, t0, n_events
""",
    description=(
        "Interval-overlap join: every error event (any user) landing inside "
        "each user session's [start, end] span — incident attribution over "
        "variable-length intervals. The naive form is an inequality-only "
        "join (nested loop); interval_point_join banding makes it a bucket "
        "equi-join where each point pairs with each interval exactly once. "
        "Sessions with zero errors are kept via re-join (count = 0)."
    ),
    tags=("events", "extension", "parity"),
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.rangejoin import interval_point_join
    from healthcare_etl_spark.operators.sessionize import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, key="user_id", ts="ts", gap_minutes=30.0, order_tiebreak="event_id")
    s = sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("start"),
        F.max("ts").alias("end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(F.col("ts").alias("err_ts"))
    pairs = interval_point_join(
        s, errors, start="start", end="end", point_ts="err_ts", bucket_seconds=3600.0
    )
    per = pairs.groupBy("user_id", "session_seq").agg(F.count(F.lit(1)).alias("n_err"))
    return s.join(per, ["user_id", "session_seq"], "left").select(
        "user_id",
        "session_seq",
        F.date_format("start", _TS_FMT).alias("session_start"),
        "n_events",
        F.coalesce("n_err", F.lit(0)).alias("n_errors_during"),
    )


@register(
    "q_weighted_sample",
    oracle="""
WITH pri AS (
    SELECT doc_id, n_chars,
           ((('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
            / 4294967296.0) * n_chars AS priority
    FROM documents
)
SELECT doc_id, n_chars, priority
FROM pri ORDER BY priority DESC, doc_id LIMIT 200
""",
    description=(
        "Deterministic weighted sampling: top-200 documents by "
        "hash-uniform priority u(doc) * weight (weight = n_chars), so "
        "longer documents are proportionally favored but selection stays "
        "reproducible across engines/partitionings/cluster sizes. Every "
        "arithmetic step is EXACT in doubles (dyadic md5 uniform x "
        "integer weight <= 2^53) — no transcendental functions, so no "
        "cross-engine libm last-ulp risk (the A-ES u^(1/w) form trades "
        "that exactness for strict inclusion-probability proportionality). "
        "Top-k via TakeOrderedAndProject — no global sort."
    ),
    tags=("pipeline", "extension", "parity"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    pri = docs.select(
        "doc_id",
        "n_chars",
        (((h + 1) / F.lit(4294967296.0)) * F.col("n_chars")).alias("priority"),
    )
    return pri.orderBy(F.desc("priority"), F.asc("doc_id")).limit(200)


@register(
    "q_top_p_filter",
    oracle="""
WITH t AS (
    SELECT doc_id, source, n_chars,
           sum(n_chars) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(n_chars) OVER (PARTITION BY source) AS tot,
           CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
                AS BIGINT) AS rank_in_source
    FROM documents
)
SELECT doc_id, source, n_chars, rank_in_source,
       (round((cum * 1.0 / tot) * 1000000.0) / 1000000.0) AS cum_share
FROM t
WHERE (cum - n_chars) * 10 < tot * 9
""",
    description=(
        "Top-p (nucleus) corpus filtering: per source, keep the largest "
        "documents until 90% of the source's total character mass is "
        "covered (the doc crossing the boundary is included). One shuffle "
        "on source; running + total mass share a single window partition. "
        "The keep decision is pure integer arithmetic ((cum-own)*10 < "
        "tot*9) — exact in both engines, no float boundary flake."
    ),
    tags=("pipeline", "extension", "parity"),
)
def q_top_p_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    order = [F.desc("n_chars"), F.asc("doc_id")]
    wcum = (
        Window.partitionBy("source")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("source")
    wrnk = Window.partitionBy("source").orderBy(*order)
    t = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(wcum).alias("cum"),
        F.sum("n_chars").over(wtot).alias("tot"),
        F.row_number().over(wrnk).cast("long").alias("rank_in_source"),
    )
    return t.filter((F.col("cum") - F.col("n_chars")) * 10 < F.col("tot") * 9).select(
        "doc_id",
        "source",
        "n_chars",
        "rank_in_source",
        stable_round(F.col("cum") * 1.0 / F.col("tot"), 6).alias("cum_share"),
    )


@register(
    "q_bigram_logprob",
    oracle="""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
words AS (SELECT doc_id, unnest(t) AS w FROM tok),
big AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)), i -> t[i]))   AS w1,
           unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
    FROM tok WHERE len(t) >= 2
),
ufreq AS (SELECT w, count(*) AS cu FROM words GROUP BY w),
bfreq AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2),
tot AS (SELECT count(*) AS n FROM words)
SELECT big.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       (round((avg(ln(0.9 * (cb * 1.0 / u1.cu) + 0.1 * (u2.cu * 1.0 / n))))
              * 1000000.0) / 1000000.0) AS avg_logprob
FROM big
JOIN bfreq USING (w1, w2)
JOIN ufreq u1 ON u1.w = big.w1
JOIN ufreq u2 ON u2.w = big.w2
CROSS JOIN tot
GROUP BY big.doc_id
""",
    description=(
        "Interpolated bigram LM scoring (0.9*p(w2|w1) + 0.1*p(w2)) — the "
        "step up from q_unigram_logprob toward real LM-perplexity "
        "filtering: token streams with improbable transitions score low "
        "even when every token is individually common. Bigrams come from "
        "one per-doc lead window (no self-join); the frequency tables are "
        "key-partitioned hash aggs; the corpus total stays a lazy 1-row "
        "broadcast."
    ),
    tags=("text", "extension", "parity"),
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = F.split("text", " ")
    words = docs.select("doc_id", F.posexplode(toks).alias("pos", "w"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        words.select(
            "doc_id",
            F.col("w").alias("w1"),
            F.lead("w").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    ufreq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    bfreq = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    total = words.agg(F.count(F.lit(1)).alias("n"))
    u1 = ufreq.select(F.col("w").alias("w1"), F.col("cu").alias("cu1"))
    u2 = ufreq.select(F.col("w").alias("w2"), F.col("cu").alias("cu2"))
    p = F.lit(0.9) * (F.col("cb") * 1.0 / F.col("cu1")) + F.lit(0.1) * (
        F.col("cu2") * 1.0 / F.col("n")
    )
    return (
        big.join(bfreq, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            stable_round(F.avg(F.log(p)), 6).alias("avg_logprob"),
        )
    )


@register(
    "q_token_entropy",
    oracle="""
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
tf AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
n AS (SELECT doc_id, sum(c) AS n_tok, count(*) AS n_uniq FROM tf GROUP BY doc_id)
SELECT tf.doc_id,
       CAST(any_value(n_tok) AS BIGINT)  AS n_tok,
       CAST(any_value(n_uniq) AS BIGINT) AS n_uniq,
       (round((-sum((c * 1.0 / n_tok) * ln(c * 1.0 / n_tok))) * 1000000.0)
        / 1000000.0) AS entropy
FROM tf JOIN n USING (doc_id)
GROUP BY tf.doc_id
""",
    description=(
        "Per-document Shannon token entropy (nats): low entropy = "
        "repetitive/templated text, the information-theoretic complement "
        "of q_repetition_quality's top-token fraction. Two key-partitioned "
        "hash aggs (doc+token term frequency, then per-doc fold) — the "
        "same two-level shape, no windows, no Python."
    ),
    tags=("text", "extension", "parity"),
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    n = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"), F.count(F.lit(1)).alias("n_uniq")
    )
    frac = F.col("c") * 1.0 / F.col("n_tok")
    return (
        tf.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.any_value("n_tok").alias("n_tok"),
            F.any_value("n_uniq").alias("n_uniq"),
            stable_round(-F.sum(frac * F.log(frac)), 6).alias("entropy"),
        )
    )


@register(
    "q_table_diff",
    oracle="""
WITH h AS (
    SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status,
           (('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 1000)
               AS hh
    FROM orders
),
a AS (
    SELECT k, CASE WHEN hh % 7 = 0 THEN price + 1.5 ELSE price END AS price, status
    FROM h WHERE hh % 13 <> 0
),
b AS (SELECT k, price, status FROM h WHERE hh % 11 <> 0),
d AS (
    SELECT CASE WHEN b.k IS NULL THEN 'added'
                WHEN a.k IS NULL THEN 'removed'
                WHEN a.price <> b.price OR a.status <> b.status THEN 'changed'
                ELSE 'same' END AS category
    FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT category, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY category
""",
    description=(
        "Snapshot reconciliation (table diff / CDC derivation): current vs "
        "prior snapshot full-outer-joined on the key, each row classified "
        "added/removed/changed/same — the audit every incremental pipeline "
        "runs before promoting a snapshot. The two snapshots here are "
        "deterministic hash-derived views of `orders` so the oracle "
        "reproduces them exactly. At scale both sides bucket by the key so "
        "the diff join is exchange-free; the comparison itself is one "
        "shuffle + hash agg, no driver data."
    ),
    tags=("relational", "extension", "parity"),
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    hh = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    h = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        hh.alias("hh"),
    )
    a = h.filter(F.col("hh") % 13 != 0).select(
        "k",
        F.when(F.col("hh") % 7 == 0, F.col("price") + 1.5).otherwise(F.col("price")).alias("price"),
        "status",
    )
    b = h.filter(F.col("hh") % 11 != 0).select("k", "price", "status")
    d = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer").select(
        F.when(F.col("b.k").isNull(), "added")
        .when(F.col("a.k").isNull(), "removed")
        .when(
            (F.col("a.price") != F.col("b.price")) | (F.col("a.status") != F.col("b.status")),
            "changed",
        )
        .otherwise("same")
        .alias("category")
    )
    return d.groupBy("category").agg(F.count(F.lit(1)).alias("n"))


def _bfs_oracle() -> str:
    from healthcare_etl_spark.plans.queries_dedup import _jaccard_pairs_ctes

    return f"""
WITH RECURSIVE {_jaccard_pairs_ctes()},
pairs AS (
    SELECT doc_a, doc_b FROM jpairs
    WHERE (round(jac * 1000000.0) / 1000000.0) >= 0.5
),
bedges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
bnodes AS (SELECT DISTINCT src AS node FROM bedges),
seeds AS (
    SELECT node FROM bnodes
    WHERE (('0x' || substring(md5(CAST(node AS VARCHAR)), 1, 8))::BIGINT % 5) = 0
),
reach(node, hops) AS (
    SELECT node, 0 FROM seeds
    UNION
    SELECT e.dst, r.hops + 1
    FROM reach r JOIN bedges e ON e.src = r.node
    WHERE r.hops < 20
)
SELECT node AS doc_id, CAST(min(hops) AS BIGINT) AS hops
FROM reach GROUP BY node
"""


@register(
    "q_graph_bfs",
    oracle=_bfs_oracle(),
    description=(
        "Multi-source BFS (minimum hop distance from a hash-chosen seed "
        "set) over the near-dup graph — the third iterative-graph shape "
        "after connected components and PageRank: per-round frontier "
        "join + anti-join against settled labels, so each node is "
        "expanded once and total work is O(edges) regardless of round "
        "count. Hop caps mirror the oracle's recursion bound (20 ≫ any "
        "near-dup component's diameter)."
    ),
    tags=("dedup", "extension", "iterative", "parity"),
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import jaccard_pairs
    from healthcare_etl_spark.operators.graph import bfs_hops

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    nodes = (
        pairs.select(F.col("doc_a").alias("node"))
        .union(pairs.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    h = (
        F.conv(F.substring(F.md5(F.col("node").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 5
    )
    seeds = nodes.filter(h == 0)
    return bfs_hops(pairs, seeds, max_iter=20).select(
        F.col("node").alias("doc_id"), "hops"
    )


@register(
    "q_source_overlap",
    oracle="""
WITH st AS (
    SELECT DISTINCT source, w
    FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
),
sz AS (SELECT source, count(*) AS n FROM st GROUP BY source),
common AS (
    SELECT x.source AS source_a, y.source AS source_b, count(*) AS n_common
    FROM st x JOIN st y ON x.w = y.w AND x.source < y.source
    GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       (round((n_common * 1.0 / (sa.n + sb.n - n_common)) * 1000000.0) / 1000000.0)
           AS jaccard
FROM common
JOIN sz sa ON sa.source = source_a
JOIN sz sb ON sb.source = source_b
""",
    description=(
        "Pairwise vocabulary overlap (token-set Jaccard) between corpus "
        "sources — the mixture-analysis view that tells a data team which "
        "sources are near-redundant before weighting them. Inverted-index "
        "self-join on the token (same shape as document-level "
        "jaccard_pairs, one granularity up); the per-source size table is "
        "a broadcast dimension. Hot tokens shared by all sources bound the "
        "per-key fanout at (n_sources choose 2), not at document counts."
    ),
    tags=("text", "extension", "parity"),
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # Three consumers (sizes + both join sides): materialize the distinct
    # source-token set once instead of re-tokenizing per branch (staging
    # table / reliable checkpoint on a real cluster).
    st = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    x = st.select(F.col("source").alias("source_a"), "w")
    y = st.select(F.col("source").alias("source_b"), "w")
    common = (
        x.join(y, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            stable_round(
                F.col("n_common") * 1.0 / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
    )


_CHUNK_LEN = 64
_CHUNK_STRIDE = 48


@register(
    "q_doc_chunks",
    oracle=f"""
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
c AS (
    SELECT doc_id, n_tok,
           unnest(range(0, greatest(n_tok - {_CHUNK_LEN} + {_CHUNK_STRIDE}, 1),
                        {_CHUNK_STRIDE})) AS start_tok
    FROM t
)
SELECT doc_id,
       CAST(start_tok // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT)                    AS start_tok,
       CAST(least(start_tok + {_CHUNK_LEN}, n_tok) AS BIGINT) AS end_tok,
       CAST(least(start_tok + {_CHUNK_LEN}, n_tok) - start_tok AS BIGINT) AS chunk_len
FROM c
""",
    description=(
        "Overlapping sliding-window document chunking (RAG / embedding "
        f"prep): {_CHUNK_LEN}-token chunks at stride {_CHUNK_STRIDE} "
        "(16-token overlap), emitted as (doc_id, chunk_idx, token span) "
        "rows via sequence + explode — a narrow per-row expansion, no "
        "shuffle at all until a downstream consumer groups. Every doc "
        "yields >= 1 chunk (short docs produce one truncated chunk); the "
        "chunk count per doc is ceil-div arithmetic, identical in both "
        "engines as integer ops."
    ),
    tags=("text", "extension", "parity"),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_tok") - _CHUNK_LEN + _CHUNK_STRIDE - 1, F.lit(0)),
        F.lit(_CHUNK_STRIDE),
    )
    c = t.select("doc_id", "n_tok", F.explode(starts).alias("start_tok"))
    end = F.least(F.col("start_tok") + _CHUNK_LEN, F.col("n_tok"))
    return c.select(
        "doc_id",
        F.floor(F.col("start_tok") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - F.col("start_tok")).cast("long").alias("chunk_len"),
    )


@register(
    "q_compaction_plan",
    oracle="""
WITH f AS (
    SELECT source, doc_id, n_chars,
           sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
    FROM documents
)
SELECT source,
       CAST((cum - n_chars) // 2048 AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT)         AS n_files,
       CAST(sum(n_chars) AS BIGINT)     AS total_bytes,
       min(doc_id)                      AS first_doc,
       max(doc_id)                      AS last_doc
FROM f
GROUP BY source, bin_id
""",
    description=(
        "Small-file compaction planning (the OPTIMIZE/bin-pack maintenance "
        "job every parquet lake needs): files ordered by id within their "
        "table partition, sequential-fill assignment to ~2048-byte output "
        "groups via a running-size window — each file lands in the group its "
        "start offset falls into, so group totals stay within one file of "
        "target. ONE shuffle total: the window clusters by source and the "
        "follow-up group-by (source, bin) reuses that partitioning (source "
        "alone already co-locates every finer key). Pure integer arithmetic, "
        "hash-exact oracle."
    ),
    tags=("analytics", "extension", "lakehouse"),
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = docs.select("source", "doc_id", "n_chars").withColumn(
        "cum", F.sum("n_chars").over(w)
    )
    return (
        planned.withColumn("bin_id", F.expr("(cum - n_chars) div 2048"))
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "q_autocorr",
    oracle="""
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1
),
lagged AS (
    SELECT cnt,
           lag(cnt, 1) OVER (ORDER BY day) AS l1,
           lag(cnt, 2) OVER (ORDER BY day) AS l2,
           lag(cnt, 3) OVER (ORDER BY day) AS l3
    FROM daily
),
stacked AS (
    SELECT 1 AS lag, cnt AS x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
    UNION ALL
    SELECT 2, cnt, l2 FROM lagged WHERE l2 IS NOT NULL
    UNION ALL
    SELECT 3, cnt, l3 FROM lagged WHERE l3 IS NOT NULL
),
m AS (
    SELECT lag, CAST(count(*) AS BIGINT) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM stacked GROUP BY lag
)
SELECT lag, n,
       (round(((n * sxy - sx * sy) /
               (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1000000.0) / 1000000.0)
           AS autocorr
FROM m
""",
    description=(
        "Lag-1/2/3 autocorrelation of the daily event count — the "
        "seasonality diagnostic behind anomaly baselines and traffic "
        "forecasts. The raw table collapses to one integer per day in a "
        "distributed aggregate FIRST; the lag window then runs over that "
        "tiny daily series (inherently ordered, dozens of rows — the "
        "single-partition sort is on the aggregate, never the events). "
        "Pearson r is computed from exact integer moment sums, so the "
        "only float ops are the final fixed-order expression: hash-exact "
        "cross-engine."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cnt",
        F.lag("cnt", 1).over(w).alias("l1"),
        F.lag("cnt", 2).over(w).alias("l2"),
        F.lag("cnt", 3).over(w).alias("l3"),
    )
    stacked = lagged.select(
        F.expr("stack(3, 1, cnt, l1, 2, cnt, l2, 3, cnt, l3) AS (lag, x, y)")
    ).filter(F.col("y").isNotNull())
    m = stacked.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        "lag", "n", stable_round(num / den, 6).alias("autocorr")
    )


@register(
    "q_winsorized_mean",
    oracle="""
WITH b AS (
    SELECT event_type,
           (round(quantile_cont(value, 0.05) * 1000000.0) / 1000000.0) AS p05,
           (round(quantile_cont(value, 0.95) * 1000000.0) / 1000000.0) AS p95
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       b.p05, b.p95,
       (round(avg(least(greatest(e.value, b.p05), b.p95)) * 1000000.0) / 1000000.0)
           AS winsorized_mean,
       (round(avg(e.value) * 1000000.0) / 1000000.0) AS raw_mean
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type, b.p05, b.p95
""",
    description=(
        "Winsorized (p05/p95-clipped) mean per event type — the robust-"
        "aggregation step that keeps a handful of corrupt meters from "
        "skewing a 100 TB metric. Two passes over the fact table: exact "
        "grouped percentiles (distributed sort-based aggregate), then the "
        "5-row bounds table broadcast back for the clipped mean — no "
        "row-level sort, no collect. Bounds are stable-rounded BEFORE "
        "clipping so boundary rows clip identically on both engines."
    ),
    tags=("analytics", "extension", "cleaning"),
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.05)"), 6).alias("p05"),
        stable_round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )
    clipped = events.join(F.broadcast(bounds), "event_type")
    return clipped.groupBy("event_type", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(
            F.avg(F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))), 6
        ).alias("winsorized_mean"),
        stable_round(F.avg("value"), 6).alias("raw_mean"),
    ).select("event_type", "n", "p05", "p95", "winsorized_mean", "raw_mean")


@register(
    "q_psi_drift",
    oracle="""
WITH b AS (
    SELECT event_type,
           CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref' ELSE 'cur' END AS period,
           least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket
    FROM events
),
counts AS (
    SELECT event_type, period, bucket, count(*) AS n
    FROM b GROUP BY 1, 2, 3
),
grid AS (
    SELECT DISTINCT c.event_type, g.bucket, p.period
    FROM counts c
    CROSS JOIN range(10) g(bucket)
    CROSS JOIN (VALUES ('ref'), ('cur')) p(period)
),
filled AS (
    SELECT g.event_type, g.bucket, g.period, coalesce(c.n, 0) AS n
    FROM grid g LEFT JOIN counts c
      ON c.event_type = g.event_type AND c.bucket = g.bucket AND c.period = g.period
),
tot AS (
    SELECT event_type, period, sum(n) AS tot_n FROM filled GROUP BY 1, 2
),
props AS (
    SELECT f.event_type, f.bucket,
           max(CASE WHEN f.period = 'ref'
               THEN (f.n + 1.0) / (t.tot_n + 10.0) END) AS p,
           max(CASE WHEN f.period = 'cur'
               THEN (f.n + 1.0) / (t.tot_n + 10.0) END) AS q
    FROM filled f JOIN tot t ON t.event_type = f.event_type AND t.period = f.period
    GROUP BY 1, 2
)
SELECT event_type,
       (round(sum((p - q) * ln(p / q)) * 1000000.0) / 1000000.0) AS psi
FROM props GROUP BY event_type
""",
    description=(
        "Population Stability Index per event type between the first and "
        "second half of the month — the drift monitor ML platforms run "
        "on every feature: bucket the value distribution identically in "
        "both periods (10 fixed-width buckets, Laplace-smoothed so empty "
        "buckets stay finite), PSI = sum (p-q)ln(p/q). One distributed "
        "count aggregate over the facts; the bucket grid (types x 10 x 2) "
        "is dimension-sized, so densification and the PSI fold are "
        "broadcast-scale work. PSI > 0.25 conventionally flags "
        "actionable drift."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "ref")
        .otherwise("cur")
        .alias("period"),
        F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9).cast("long")).alias(
            "bucket"
        ),
    )
    counts = b.groupBy("event_type", "period", "bucket").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").alias("bucket")))
        .crossJoin(spark.createDataFrame([("ref",), ("cur",)], ["period"]))
    )
    filled = grid.join(counts, ["event_type", "bucket", "period"], "left").select(
        "event_type", "bucket", "period", F.coalesce("n", F.lit(0)).alias("n")
    )
    tot = filled.groupBy("event_type", "period").agg(F.sum("n").alias("tot_n"))
    props = (
        filled.join(tot, ["event_type", "period"])
        .groupBy("event_type", "bucket")
        .agg(
            F.max(
                F.when(
                    F.col("period") == "ref",
                    (F.col("n") + F.lit(1.0)) / (F.col("tot_n") + F.lit(10.0)),
                )
            ).alias("p"),
            F.max(
                F.when(
                    F.col("period") == "cur",
                    (F.col("n") + F.lit(1.0)) / (F.col("tot_n") + F.lit(10.0)),
                )
            ).alias("q"),
        )
    )
    return props.groupBy("event_type").agg(
        stable_round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi")
    )


@register(
    "q_ks_drift",
    oracle="""
WITH g AS (
    SELECT event_type, value,
           CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
           CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
    FROM events GROUP BY 1, 2
),
c AS (
    SELECT event_type,
           sum(n_ref) OVER (PARTITION BY event_type ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
           sum(n_cur) OVER (PARTITION BY event_type ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cur,
           sum(n_ref) OVER (PARTITION BY event_type) AS tot_ref,
           sum(n_cur) OVER (PARTITION BY event_type) AS tot_cur
    FROM g
)
SELECT event_type,
       CAST(max(tot_ref) AS BIGINT) AS n_ref,
       CAST(max(tot_cur) AS BIGINT) AS n_cur,
       (round(max(abs(cum_ref * 1.0 / tot_ref - cum_cur * 1.0 / tot_cur))
              * 1000000.0) / 1000000.0) AS ks_stat
FROM c GROUP BY event_type
""",
    description=(
        "Exact two-sample Kolmogorov-Smirnov drift statistic per event "
        "type between the first and second half of the month — the "
        "nonparametric complement to q_psi_drift (no binning choice, "
        "sensitive to any distributional change). The KS statistic is the "
        "max gap between the two empirical CDFs, which only changes at "
        "sample points, so pre-aggregating to per-distinct-value step "
        "counts makes it exact: one hash aggregate on (type, value), then "
        "running sums over the ordered distinct values in the same "
        "event_type window partition (cum and total share one shuffle). "
        "The per-row CDF gap is a pure double expression; max() is "
        "order-independent, so both engines agree bit-for-bit after "
        "stable rounding."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    g = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(is_ref, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(is_ref, 0).otherwise(1)).alias("n_cur"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("n_ref").over(w_run).alias("cum_ref"),
        F.sum("n_cur").over(w_run).alias("cum_cur"),
        F.sum("n_ref").over(w_all).alias("tot_ref"),
        F.sum("n_cur").over(w_all).alias("tot_cur"),
    )
    gap = F.abs(
        F.col("cum_ref") * F.lit(1.0) / F.col("tot_ref")
        - F.col("cum_cur") * F.lit(1.0) / F.col("tot_cur")
    )
    return c.groupBy("event_type").agg(
        F.max("tot_ref").alias("n_ref"),
        F.max("tot_cur").alias("n_cur"),
        stable_round(F.max(gap), 6).alias("ks_stat"),
    )


@register(
    "q_equidepth_histogram",
    oracle="""
WITH r AS (
    SELECT event_type, value,
           ntile(8) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bucket
    FROM events
)
SELECT event_type,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       (round(min(value) * 1000000.0) / 1000000.0) AS lo,
       (round(max(value) * 1000000.0) / 1000000.0) AS hi
FROM r GROUP BY 1, 2
""",
    description=(
        "Equi-depth (equal-frequency) histogram of the value distribution "
        "per event type — the optimizer-statistics / quantile-sketch "
        "complement to q_value_histogram's fixed-width buckets: 8 ntile "
        "buckets each holding ~1/8 of the rows, reported with exact "
        "bounds and counts. ntile's deterministic fill rule (earlier "
        "buckets take the remainder) plus a unique (value, event_id) sort "
        "key makes the bucketing identical across engines. The window and "
        "the rollup share one shuffle on event_type."
    ),
    tags=("analytics", "extension"),
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select("event_type", "value", F.ntile(8).over(w).alias("bucket"))
    return r.groupBy("event_type", F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(F.min("value"), 6).alias("lo"),
        stable_round(F.max("value"), 6).alias("hi"),
    )


@register(
    "q_null_safe_join",
    oracle="""
WITH a AS (
    SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k,
           count(*) AS n_a
    FROM events GROUP BY 1
),
b AS (
    SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM events GROUP BY 1
)
SELECT a.k AS event_key, a.n_a, b.n_big
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    description=(
        "Null-safe equi-join semantics pin (Spark <=> / SQL IS NOT "
        "DISTINCT FROM): the NULL group (here the 'error' type mapped to "
        "NULL) JOINS to itself instead of silently dropping — standard "
        "equality would lose it, the classic silent-row-loss bug when "
        "joining on nullable keys. Spark plans <=> as a normal hash join "
        "(null-safe keys still hash-partition), so the shape is "
        "identical to a plain equi-join at scale."
    ),
    tags=("relational", "extension", "parity"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("event_type")
    )
    a = ev.select(k.alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("n_a"))
    b = (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("n_big"))
    )
    bb = b.select(F.col("k").alias("k_b"), "n_big")
    return a.join(bb, a["k"].eqNullSafe(bb["k_b"])).select(
        F.col("k").alias("event_key"), "n_a", "n_big"
    )


@register(
    "q_union_by_name",
    oracle="""
SELECT event_key, n_events, sum_value, n_users FROM (
    SELECT event_type AS event_key,
           CAST(count(*) AS BIGINT) AS n_events,
           (round(sum(value) * 10000.0) / 10000.0) AS sum_value,
           CAST(NULL AS BIGINT) AS n_users
    FROM events WHERE event_type IN ('click', 'view')
    GROUP BY 1
    UNION ALL BY NAME
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           event_type AS event_key,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
)
""",
    description=(
        "Schema-drift union (unionByName with allowMissingColumns — "
        "DuckDB UNION ALL BY NAME): two producer schemas with different "
        "column ORDER and a column present on only one side combine by "
        "NAME, missing columns null-filled. Positional UNION would "
        "silently misalign columns — the schema-evolution hazard every "
        "multi-producer ingest hits. Pure metadata operation: no shuffle "
        "beyond each side's own aggregate."
    ),
    tags=("relational", "extension", "parity"),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    side_a = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.col("event_type").alias("event_key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    side_b = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy(F.col("event_type").alias("event_key"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return side_a.unionByName(side_b, allowMissingColumns=True).select(
        "event_key", "n_events", "sum_value", "n_users"
    )


@register(
    "q_ab_test_ztest",
    oracle="""
WITH assign AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0)
               AS in_a,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY user_id
),
arms AS (
    SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)                 AS n_a,
           CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT)             AS n_b,
           CAST(sum(CASE WHEN in_a THEN converted ELSE 0 END) AS BIGINT)         AS conv_a,
           CAST(sum(CASE WHEN NOT in_a THEN converted ELSE 0 END) AS BIGINT)     AS conv_b
    FROM assign
)
SELECT n_a, n_b, conv_a, conv_b,
       (round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) * 1000000.0) / 1000000.0) AS rate_diff,
       (round(((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
               / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                      * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b))) * 1000000.0) / 1000000.0) AS z_score
FROM arms
""",
    description=(
        "A/B experiment readout with a pooled two-proportion z-test: "
        "(conversion = any purchase over 150, non-degenerate at every SF) "
        "users assigned to arms by the cross-engine md5 hash (the same "
        "deterministic-assignment discipline as q_hash_split — rand() "
        "assignment is neither reproducible nor repartition-stable), "
        "conversion = any purchase event, z = (pA-pB)/sqrt(p_pool(1-"
        "p_pool)(1/nA+1/nB)). |z| > 1.96 is the conventional 95% "
        "significance call. One per-user aggregate then a 1-row fold — "
        "the per-user shuffle is the only data-sized stage."
    ),
    tags=("analytics", "extension", "parity"),
)
def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    in_a = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted"),
        F.first(in_a).alias("in_a"),
    )
    arms = assign.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("converted")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(~F.col("in_a"), F.col("converted")).otherwise(0)).alias("conv_b"),
    )
    pa = F.col("conv_a") * F.lit(1.0) / F.col("n_a")
    pb = F.col("conv_b") * F.lit(1.0) / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) * F.lit(1.0) / (F.col("n_a") + F.col("n_b"))
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        stable_round(pa - pb, 6).alias("rate_diff"),
        stable_round(
            (pa - pb)
            / F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))),
            6,
        ).alias("z_score"),
    )


@register(
    "q_id_gap_detection",
    oracle="""
WITH kept AS (
    SELECT event_id FROM events WHERE event_type <> 'error'
),
seq AS (
    SELECT event_id,
           lag(event_id) OVER (ORDER BY event_id) AS prev_id
    FROM kept
)
SELECT prev_id + 1 AS gap_start,
       event_id - 1 AS gap_end,
       CAST(event_id - prev_id - 1 AS BIGINT) AS n_missing
FROM seq
WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
""",
    description=(
        "Sequence-gap detection over a monotonic id column (ingestion "
        "monitoring: find dropped ranges after a lossy stage — here the "
        "'error' rows stand in for lost messages, so the gaps are "
        "nonzero and the oracle discriminates). The global lag() is "
        "computed as a two-phase bucketed carry (bucketed_prefix with "
        "agg='max' over 4096-id buckets: within-bucket exclusive "
        "prefix-max partitioned BY bucket + a bucket-count-sized "
        "prefix over the bucket maxima, broadcast back) — since "
        "event_id is the order key, the exclusive prefix-max IS "
        "lag(event_id), with no single-partition sort of the fact "
        "table. Emits one row PER GAP RANGE (start, end, count), not "
        "per missing id — the report stays gap-count-sized however "
        "wide the holes are."
    ),
    tags=("analytics", "extension", "quality"),
)
def q_id_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_prefix

    ev = load_table(spark, sf_dir, "events")
    kept = ev.filter(F.col("event_type") != "error").select("event_id")
    seq = bucketed_prefix(
        kept,
        buckets=[F.expr("event_id div 4096")],
        order_by=[F.asc("event_id")],
        value=F.col("event_id"),
        agg="max",
        exclusive=True,
        out_col="prev_id",
    )
    return seq.filter(
        F.col("prev_id").isNotNull() & (F.col("event_id") - F.col("prev_id") > 1)
    ).select(
        (F.col("prev_id") + 1).alias("gap_start"),
        (F.col("event_id") - 1).alias("gap_end"),
        (F.col("event_id") - F.col("prev_id") - 1).alias("n_missing"),
    )


@register(
    "q_benford_audit",
    oracle="""
WITH digits AS (
    SELECT event_type,
           -- floor() explicitly: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
           CAST(substring(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
    FROM events WHERE value >= 1
),
counts AS (
    SELECT event_type, d, count(*) AS n FROM digits GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(n) AS tot_n FROM counts GROUP BY 1),
expected AS (SELECT i AS d, log10(1.0 + 1.0 / i) AS p FROM range(1, 10) t(i))
SELECT c.event_type,
       c.d,
       CAST(c.n AS BIGINT) AS n,
       (round((c.n * 1.0 / t.tot_n) * 1000000.0) / 1000000.0) AS observed_p,
       (round(e.p * 1000000.0) / 1000000.0) AS benford_p,
       (round(((c.n * 1.0 / t.tot_n - e.p) * (c.n * 1.0 / t.tot_n - e.p) / e.p)
              * 1000000.0) / 1000000.0) AS chi2_term
FROM counts c
JOIN tot t ON t.event_type = c.event_type
JOIN expected e ON e.d = c.d
""",
    description=(
        "Benford's-law first-digit audit per event type — the forensic "
        "data-quality screen for fabricated or truncated numeric "
        "columns: observed first-significant-digit frequencies vs the "
        "log10(1+1/d) expectation, with per-digit chi-square terms "
        "(naturally-spread data roughly conforms; uniform synthetic "
        "data, capped fields, or invented figures deviate hard). One "
        "conditional-aggregate pass; the digit grid (types x 9) is "
        "dimension-sized, the expectation table is generated, not "
        "stored."
    ),
    tags=("analytics", "extension", "quality"),
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    digits = ev.filter(F.col("value") >= 1).select(
        "event_type",
        F.substring(F.floor("value").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("d"),
    )
    counts = digits.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("event_type").agg(F.sum("n").alias("tot_n"))
    expected = spark.range(1, 10).select(
        F.col("id").alias("e_d"),
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("id")).alias("p"),
    )
    obs = F.col("n") * F.lit(1.0) / F.col("tot_n")
    return (
        counts.join(tot, "event_type")
        .join(F.broadcast(expected), counts["d"] == expected["e_d"])
        .select(
            "event_type",
            "d",
            "n",
            stable_round(obs, 6).alias("observed_p"),
            stable_round(F.col("p"), 6).alias("benford_p"),
            stable_round((obs - F.col("p")) * (obs - F.col("p")) / F.col("p"), 6).alias(
                "chi2_term"
            ),
        )
    )


@register(
    "q_decimal_money_agg",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR) AS revenue,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                * CAST(1.0 AS DECIMAL(4, 2))
                - CAST(l_discount AS DECIMAL(18, 6))
                  * CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR) AS discounted,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    description=(
        "Exact-DECIMAL money aggregation semantics pin: revenue summed "
        "as DECIMAL(18,2) — both engines do EXACT fixed-point "
        "accumulation here, so the results compare as strings with NO "
        "stable_round bridge at all (contrast every double aggregate in "
        "this repo). The discipline financial pipelines need: double "
        "summation of money drifts with partition order; decimal "
        "doesn't. Results are cast to VARCHAR so the driver hash "
        "compares the exact decimal rendering, not a re-parsed float."
    ),
    tags=("agg", "extension", "parity"),
)
def q_decimal_money_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("revenue"),
        F.sum(price * F.lit(1.0).cast("decimal(4,2)") - disc * price)
        .cast("string")
        .alias("discounted"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_dod_growth",
    oracle="""
WITH daily AS (
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           (round(sum(value) * 10000.0) / 10000.0) AS revenue
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
)
SELECT day, n_events, revenue,
       (round((revenue - lag(revenue) OVER (ORDER BY day))
              / lag(revenue) OVER (ORDER BY day) * 1000000.0) / 1000000.0)
           AS dod_growth
FROM daily
""",
    description=(
        "Day-over-day growth of purchase revenue — the KPI-dashboard "
        "staple: aggregate-FIRST (the fact shuffle produces a "
        "days-sized series), then lag()/division over the tiny daily "
        "frame, so the trend window costs nothing at any fact scale. "
        "First day's growth is NULL by construction (no prior period), "
        "pinned identically in both engines."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_dod_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_round(F.sum("value"), 4).alias("revenue"),
        )
    )
    w = Window.orderBy("day")
    prev = F.lag("revenue").over(w)
    return daily.select(
        "day",
        "n_events",
        "revenue",
        stable_round((F.col("revenue") - prev) / prev, 6).alias("dod_growth"),
    )


@register(
    "q_incremental_agg_merge",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       (round(sum(value) * 10000.0) / 10000.0) AS sum_value,
       (round(min(value) * 1000000.0) / 1000000.0) AS min_value,
       (round(max(value) * 1000000.0) / 1000000.0) AS max_value,
       (round((sum(value) / count(*)) * 1000000.0) / 1000000.0) AS avg_value
FROM events
""" + "GROUP BY event_type",
    description=(
        "Incremental view maintenance by partial-aggregate merge: the "
        "'materialized' aggregate over days 1-29 and the new day-30 "
        "delta are aggregated SEPARATELY and merged with the mergeable-"
        "state algebra (counts/sums add, min/min, max/max; avg derived "
        "from merged sum/count — never averaged averages). The oracle "
        "aggregates the WHOLE table directly, so the hash match proves "
        "merge == recompute exactly — the contract that lets a daily "
        "pipeline maintain year-scale aggregates by touching only the "
        "new partition. Both inputs partial-aggregate map-side; the "
        "merge itself is group-count-sized."
    ),
    tags=("analytics", "extension", "agg"),
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-30").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "event_type",
        "n",
        stable_round(F.col("s"), 4).alias("sum_value"),
        stable_round(F.col("mn"), 6).alias("min_value"),
        stable_round(F.col("mx"), 6).alias("max_value"),
        stable_round(F.col("s") / F.col("n"), 6).alias("avg_value"),
    )


@register(
    "q_nested_struct_agg",
    oracle="""
WITH nested AS (
    SELECT l_orderkey,
           list(struct_pack(ln := l_linenumber, qty := l_quantity)
                ORDER BY l_linenumber, l_quantity) AS lines
    FROM lineitem
    GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(lines[1].ln AS BIGINT) AS first_ln,
       (round(list_reduce(list_prepend(0.0::DOUBLE,
                list_transform(lines, s -> s.qty::DOUBLE)), (acc, x) -> acc + x)
              * 10000.0) / 10000.0) AS total_qty
FROM nested
WHERE l_orderkey % 100 = 0
""",
    description=(
        "Nested complex-type analytics: each order's line items collect "
        "into an ORDERED array of structs (sort_array over "
        "struct(linenumber, qty) — unordered collect_list is "
        "nondeterministic under parallelism), then per-order metrics "
        "compute FROM the nested value with higher-order functions "
        "(element access into struct fields, a strict left-to-right "
        "aggregate fold mirrored by DuckDB list_reduce). The "
        "denormalize-then-analyze pattern document stores and export "
        "schemas need; one shuffle on the nesting key."
    ),
    tags=("analytics", "extension", "nested"),
)
def q_nested_struct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("lines")
        )
        .filter(F.col("l_orderkey") % 100 == 0)
    )
    total = F.aggregate(
        F.transform("lines", lambda s: s["qty"].cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return nested.select(
        "l_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.element_at("lines", 1)["ln"].cast("long").alias("first_ln"),
        stable_round(total, 4).alias("total_qty"),
    )


@register(
    "q_rfm_segmentation",
    oracle="""
WITH per_user AS (
    SELECT user_id,
           CAST(epoch_us(TIMESTAMP '2024-01-31' - max(ts)) // 86400000000 AS BIGINT)
               AS recency_days,
           CAST(count(*) AS BIGINT) AS frequency,
           (round(sum(value) * 10000.0) / 10000.0) AS monetary
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
),
scored AS (
    SELECT *,
           ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
           ntile(4) OVER (ORDER BY frequency DESC, user_id)   AS f_score,
           ntile(4) OVER (ORDER BY monetary DESC, user_id)    AS m_score
    FROM per_user
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       (round(avg(monetary) * 1000000.0) / 1000000.0) AS avg_monetary
FROM scored
GROUP BY 1, 2, 3
""",
    description=(
        "RFM customer segmentation — the marketing-analytics classic: "
        "per-user Recency (days since last purchase, exact integer "
        "division of µs), Frequency, Monetary from one purchase-scan "
        "aggregate, each quartile-scored with ntile semantics "
        "(deterministic user_id tiebreak so the binning is cross-engine "
        "identical; score 1 = best on every axis), rolled up to segment "
        "sizes and average spend. Each ntile is computed WITHOUT a "
        "global-sort window: a two-phase bucketed rank per axis "
        "(bucketed_rank over order-aligned buckets — exact recency/"
        "negated-frequency values sub-bucketed by user_id, a floor "
        "value-range bucket for monetary) plus the closed-form ntile "
        "arithmetic tile(rk, n) from the broadcast scalar user count. "
        "Bit-identical to ntile(4) because the order is total; no "
        "single-partition stage at ANY user count."
    ),
    tags=("analytics", "extension"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round
    from healthcare_etl_spark.operators.scale import bucketed_rank

    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-31").cast("timestamp")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            ((F.unix_micros(anchor) - F.unix_micros(F.max("ts"))) / F.lit(86_400_000_000))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            stable_round(F.sum("value"), 4).alias("monetary"),
        )
    )
    ranked = bucketed_rank(
        per_user,
        buckets=[F.col("recency_days"), F.expr("user_id div 4096")],
        order_by=[F.asc("recency_days"), F.asc("user_id")],
        out_col="rk_r",
    )
    ranked = bucketed_rank(
        ranked,
        buckets=[-F.col("frequency"), F.expr("user_id div 4096")],
        order_by=[F.desc("frequency"), F.asc("user_id")],
        out_col="rk_f",
    )
    # monetary is a range bucket (floor of the negated 4dp-exact cents /
    # 4096), so no user_id sub-bucket — a tiebreak sub-bucket is only
    # order-aligned when the leading bucket key pins the exact value.
    ranked = bucketed_rank(
        ranked,
        buckets=[F.floor(F.col("monetary") * F.lit(-10000.0) / F.lit(4096.0)).cast("long")],
        order_by=[F.desc("monetary"), F.asc("user_id")],
        out_col="rk_m",
    )
    from healthcare_etl_spark.operators.scale import ntile_from_rank

    ntot = per_user.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    scored = ranked.crossJoin(F.broadcast(ntot))
    n = F.col("__n")
    return scored.groupBy(
        ntile_from_rank(F.col("rk_r"), n, 4).alias("r_score"),
        ntile_from_rank(F.col("rk_f"), n, 4).alias("f_score"),
        ntile_from_rank(F.col("rk_m"), n, 4).alias("m_score"),
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        stable_round(F.avg("monetary"), 6).alias("avg_monetary"),
    )


@register(
    "q_burstiness_fano",
    oracle="""
WITH daily AS (
    SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
moments AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_days,
           sum(n)     AS s1,
           sum(n * n) AS s2
    FROM daily GROUP BY user_id
)
SELECT user_id, n_days,
       (round((s1 * 1.0 / n_days) * 1000000.0) / 1000000.0) AS mean_daily,
       (round(((s2 * 1.0 / n_days - (s1 * 1.0 / n_days) * (s1 * 1.0 / n_days))
               / (s1 * 1.0 / n_days)) * 1000000.0) / 1000000.0) AS fano
FROM moments WHERE n_days > 1 AND s1 > 0
""",
    description=(
        "Per-user burstiness via the Fano factor (variance-to-mean "
        "ratio of daily event counts): ~1 = Poisson-like steady "
        "activity, >1 = bursty (bot bursts, batch imports), <1 = "
        "metronomic (schedulers) — the behavioral-signature statistic "
        "fraud and bot detection start from. Exact integer moment sums "
        "(s1, s2) from two stacked aggregates; the variance is computed "
        "population-style from the moments in one fixed expression, so "
        "both engines agree after stable rounding."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1") * F.lit(1.0) / F.col("n_days")
    return m.filter((F.col("n_days") > 1) & (F.col("s1") > 0)).select(
        "user_id",
        "n_days",
        stable_round(mean, 6).alias("mean_daily"),
        stable_round(
            (F.col("s2") * F.lit(1.0) / F.col("n_days") - mean * mean) / mean, 6
        ).alias("fano"),
    )


@register(
    "q_share_of_total",
    oracle="""
WITH daily AS (
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           event_type,
           (round(sum(value) * 10000.0) / 10000.0) AS revenue
    FROM events GROUP BY 1, 2
)
SELECT day, event_type, revenue,
       (round((revenue / sum(revenue) OVER (PARTITION BY day)) * 1000000.0) / 1000000.0)
           AS share_of_day,
       (round((revenue / sum(revenue) OVER ()) * 1000000.0) / 1000000.0)
           AS share_of_total
FROM daily
""",
    description=(
        "Share-of-parent contribution margins (the '% of total' every "
        "BI tile needs): each (day, type) cell's share of its day and "
        "of the whole period, via window sums OVER the aggregated "
        "days x types grid — the grid is dimension-sized, so the "
        "keyless total window is metadata-scale here (aggregate-first "
        "discipline; running these windows over raw facts would be the "
        "scale sin). Shares divide stable-rounded revenues, fixed "
        "expression order both engines."
    ),
    tags=("analytics", "extension"),
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(stable_round(F.sum("value"), 4).alias("revenue"))
    w_day = Window.partitionBy("day")
    w_all = Window.partitionBy()
    return daily.select(
        "day",
        "event_type",
        "revenue",
        stable_round(F.col("revenue") / F.sum("revenue").over(w_day), 6).alias(
            "share_of_day"
        ),
        stable_round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_of_total"
        ),
    )


@register(
    "q_event_type_correlation",
    oracle="""
WITH daily AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_days,
           sum(a.n)        AS sa,  sum(b.n)        AS sb,
           sum(a.n * a.n)  AS saa, sum(b.n * b.n)  AS sbb,
           sum(a.n * b.n)  AS sab
    FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, n_days,
       (round(((n_days * sab - sa * sb) * 1.0
               / (sqrt(n_days * saa - sa * sa) * sqrt(n_days * sbb - sb * sb)))
              * 1000000.0) / 1000000.0) AS pearson_r
FROM pairs
""",
    description=(
        "Pairwise Pearson correlation between event types' daily-count "
        "series (do errors spike with traffic? are purchases coupled "
        "to clicks?) — computed from EXACT integer moment sums (sa, "
        "saa, sab are BIGINTs, so the only float work is the final "
        "fixed-order formula; engine-native corr() would accumulate "
        "doubles in engine-specific order). The self-join runs on the "
        "days x types grid, not the fact table — aggregate-first keeps "
        "the correlation matrix metadata-scale at any fact volume."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_event_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    a = daily.select(F.col("day").alias("d_a"), F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    b = daily.select(F.col("day").alias("d_b"), F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    pairs = (
        a.join(b, (a["d_a"] == b["d_b"]) & (a["type_a"] < b["type_b"]))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("na").alias("sa"),
            F.sum("nb").alias("sb"),
            F.sum(F.col("na") * F.col("na")).alias("saa"),
            F.sum(F.col("nb") * F.col("nb")).alias("sbb"),
            F.sum(F.col("na") * F.col("nb")).alias("sab"),
        )
    )
    num = (F.col("n_days") * F.col("sab") - F.col("sa") * F.col("sb")) * F.lit(1.0)
    den = F.sqrt(F.col("n_days") * F.col("saa") - F.col("sa") * F.col("sa")) * F.sqrt(
        F.col("n_days") * F.col("sbb") - F.col("sb") * F.col("sb")
    )
    return pairs.select(
        "type_a", "type_b", "n_days", stable_round(num / den, 6).alias("pearson_r")
    )


@register(
    "q_recursive_balance",
    oracle="""
WITH RECURSIVE raw AS (
    SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day, sum(value) AS sv
    FROM events GROUP BY 1, 2
),
deltas AS (
    SELECT event_type, day,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS idx,
           (round((sv - avg(sv) OVER (PARTITION BY event_type)) * 10000.0) / 10000.0) AS delta
    FROM raw
),
bal AS (
    SELECT event_type, idx, day, delta,
           (round(greatest(0.0, delta) * 10000.0) / 10000.0) AS balance
    FROM deltas WHERE idx = 1
    UNION ALL
    SELECT d.event_type, d.idx, d.day, d.delta,
           (round(greatest(0.0, b.balance + d.delta) * 10000.0) / 10000.0)
    FROM bal b JOIN deltas d ON d.event_type = b.event_type AND d.idx = b.idx + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, delta, balance FROM bal
""",
    description=(
        "Zero-clamped running balance via Spark 4's native WITH "
        "RECURSIVE — the recurrence balance[d] = max(0, balance[d-1] + "
        "delta[d]) is NON-ASSOCIATIVE (the clamp), so no window frame "
        "or prefix-sum trick can express it; it traditionally forces a "
        "UDF loop. The engine's UNION-ALL-only recursion is exactly "
        "right here because the per-(type, day-index) chain is acyclic "
        "and linear — one row per step, depth = number of days (see "
        "operators/graph.py for why the same feature canNOT do cyclic "
        "closure). Deltas are each type's daily revenue centered on its "
        "own mean (so the clamp actually engages at every scale "
        "factor), and every step re-rounds identically on both engines, "
        "so the chain stays bit-stable however deep. The recursion runs "
        "over the days x types grid — dimension-sized; the fact shuffle "
        "happens once, before the recursion."
    ),
    tags=("analytics", "extension", "timeseries", "recursive"),
)
def q_recursive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.sum("value").alias("sv")
    )
    deltas = raw.select(
        "event_type",
        "day",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("idx"),
        (
            F.round(
                (F.col("sv") - F.avg("sv").over(Window.partitionBy("event_type")))
                * 10000.0
            )
            / 10000.0
        ).alias("delta"),
    )
    deltas.createOrReplaceTempView("v_bal_deltas")
    return spark.sql(
        """
WITH RECURSIVE bal AS (
    SELECT event_type, idx, day, delta,
           (round(greatest(0.0, delta) * 10000.0) / 10000.0) AS balance
    FROM v_bal_deltas WHERE idx = 1
    UNION ALL
    SELECT d.event_type, d.idx, d.day, d.delta,
           (round(greatest(0.0, b.balance + d.delta) * 10000.0) / 10000.0)
    FROM bal b JOIN v_bal_deltas d
      ON d.event_type = b.event_type AND d.idx = b.idx + 1
)
SELECT event_type, date_format(day, 'yyyy-MM-dd') AS day, delta, balance FROM bal
"""
    )


@register(
    "q_rate_wilson_ci",
    oracle="""
WITH arms AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS BIGINT) AS k
    FROM events GROUP BY event_type
)
SELECT event_type, n, k,
       (round((k * 1.0 / n) * 1000000.0) / 1000000.0) AS rate,
       (round(((k * 1.0 / n + 1.9208 / n
                - 1.96 * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n + 0.9604 / (n * n)))
               / (1.0 + 3.8416 / n)) * 1000000.0) / 1000000.0) AS wilson_lo,
       (round(((k * 1.0 / n + 1.9208 / n
                + 1.96 * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n + 0.9604 / (n * n)))
               / (1.0 + 3.8416 / n)) * 1000000.0) / 1000000.0) AS wilson_hi
FROM arms
""",
    description=(
        "Per-type rate with the Wilson 95% score interval — the "
        "binomial CI that behaves at extreme rates and small n (the "
        "naive Wald interval collapses to zero width at p=0/1, the "
        "classic dashboard lie). Constants are z=1.96 expansions "
        "(z^2=3.8416, z^2/2=1.9208, z^2/4=0.9604) written identically "
        "in both engines so the fixed-order double expression matches "
        "after stable rounding. One partial-aggregated scan; the CI "
        "math runs on the types-sized aggregate."
    ),
    tags=("analytics", "extension", "parity"),
)
def q_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    arms = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") > 150, 1).otherwise(0)).alias("k"),
    )
    p = F.col("k") * F.lit(1.0) / F.col("n")
    half = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / F.col("n") + F.lit(0.9604) / (F.col("n") * F.col("n"))
    )
    denom = F.lit(1.0) + F.lit(3.8416) / F.col("n")
    center = p + F.lit(1.9208) / F.col("n")
    return arms.select(
        "event_type",
        "n",
        "k",
        stable_round(p, 6).alias("rate"),
        stable_round((center - half) / denom, 6).alias("wilson_lo"),
        stable_round((center + half) / denom, 6).alias("wilson_hi"),
    )


@register(
    "q_gini_concentration",
    oracle="""
WITH per_user AS (
    SELECT user_id, sum(value) AS x
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
),
ranked AS (
    SELECT x,
           CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i,
           CAST(count(*) OVER () AS BIGINT) AS n,
           sum(x) OVER () AS tot
    FROM per_user
)
SELECT CAST(max(n) AS BIGINT) AS n_users,
       (round((2.0 * sum(i * x) / (max(n) * max(tot))
               - (max(n) + 1.0) / max(n)) * 1000000.0) / 1000000.0) AS gini
FROM ranked
""",
    description=(
        "Gini coefficient of per-user purchase revenue — the "
        "concentration index (0 = perfectly even, ->1 = one whale) "
        "used for revenue-concentration risk and for data-mixture "
        "skew (how concentrated is a corpus across sources/authors). "
        "Computed from the rank formulation G = 2*sum(i*x_i)/(n*sum(x))"
        " - (n+1)/n over the users-sized aggregate. The global rank is "
        "a two-phase bucketed carry (bucketed_rank: within-bucket "
        "row_number partitioned by floor(x/64) value buckets + a "
        "bucket-count-sized offset prefix, broadcast back) — no "
        "single-partition sort at ANY user count; n and sum(x) fold in "
        "the same final aggregate instead of global-frame windows. The "
        "i*x products sum in any order identically after stable "
        "rounding because i and the per-user sums are exact before the "
        "final double fold."
    ),
    tags=("analytics", "extension"),
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round
    from healthcare_etl_spark.operators.scale import bucketed_rank

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("x"))
    )
    ranked = bucketed_rank(
        per_user,
        buckets=[F.floor(F.col("x") / F.lit(64.0)).cast("long")],
        order_by=[F.asc("x"), F.asc("user_id")],
        out_col="i",
    )
    n = F.count(F.lit(1)).cast("long")
    return ranked.agg(
        n.alias("n_users"),
        stable_round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("x")) / (n * F.sum("x"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


@register(
    "q_ewma_smoothing",
    oracle="""
WITH RECURSIVE raw AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           (round(sum(value) * 10000.0) / 10000.0) AS x
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
idxd AS (
    SELECT day, x,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
    FROM raw
),
ewma AS (
    SELECT idx, day, x, x AS s FROM idxd WHERE idx = 1
    UNION ALL
    SELECT d.idx, d.day, d.x,
           (round((0.3 * d.x + 0.7 * e.s) * 10000.0) / 10000.0)
    FROM ewma e JOIN idxd d ON d.idx = e.idx + 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, x AS revenue, s AS ewma
FROM ewma
""",
    description=(
        "Exponentially-weighted moving average of daily revenue "
        "(alpha=0.3) via native WITH RECURSIVE — the smoothing/"
        "forecast-baseline primitive. EWMA is a LINEAR recurrence, so "
        "unlike q_recursive_balance's clamp it has a closed form, but "
        "the recursive statement is the numerically honest one: each "
        "step re-rounds to 4dp identically on both engines, so the "
        "chain cannot drift however long the series. Recursion depth = "
        "days; all data-sized work happens in the one aggregate "
        "producing the daily series."
    ),
    tags=("analytics", "extension", "timeseries", "recursive"),
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg((F.round(F.sum("value") * 10000.0) / 10000.0).alias("x"))
    )
    idxd = raw.select(
        "day", "x", F.row_number().over(Window.orderBy("day")).cast("long").alias("idx")
    )
    idxd.createOrReplaceTempView("v_ewma_daily")
    return spark.sql(
        """
WITH RECURSIVE ewma AS (
    SELECT idx, day, x, x AS s FROM v_ewma_daily WHERE idx = 1
    UNION ALL
    SELECT d.idx, d.day, d.x,
           (round((0.3 * d.x + 0.7 * e.s) * 10000.0) / 10000.0)
    FROM ewma e JOIN v_ewma_daily d ON d.idx = e.idx + 1
)
SELECT date_format(day, 'yyyy-MM-dd') AS day, x AS revenue, s AS ewma
FROM ewma
"""
    )


@register(
    "q_weekly_churn",
    oracle="""
WITH weekly AS (
    SELECT DISTINCT user_id,
           CAST((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 604800000000 AS BIGINT)
               AS week
    FROM events
),
pairs AS (
    SELECT a.week AS week, a.user_id,
           (b.user_id IS NOT NULL) AS retained
    FROM weekly a
    LEFT JOIN weekly b ON b.user_id = a.user_id AND b.week = a.week + 1
    WHERE a.week < (SELECT max(week) FROM weekly)
)
SELECT week,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN retained THEN 0 ELSE 1 END) AS BIGINT) AS n_churned,
       (round((sum(CASE WHEN retained THEN 0 ELSE 1 END) * 1.0 / count(*))
              * 1000000.0) / 1000000.0) AS churn_rate
FROM pairs GROUP BY week
""",
    description=(
        "Weekly churn: users active in week W with NO activity in week "
        "W+1 (exact integer-µs week bucketing from a fixed epoch "
        "anchor, so week edges are engine-identical) — the retention "
        "complement to q_cohort_retention's triangle view, shaped as a "
        "self-join of the distinct-reduced (user, week) activity set "
        "(never the raw facts) with a left-join null-probe for the "
        "following week; the final week is excluded since its future "
        "is unobserved."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01").cast("timestamp")
    weekly = ev.select(
        "user_id",
        ((F.unix_micros("ts") - F.unix_micros(anchor)) / F.lit(604_800_000_000))
        .cast("long")
        .alias("week"),
    ).distinct()
    max_week = weekly.agg(F.max("week").alias("mw"))
    b = weekly.select(F.col("user_id").alias("u_b"), F.col("week").alias("w_b"))
    pairs = (
        weekly.crossJoin(F.broadcast(max_week))
        .filter(F.col("week") < F.col("mw"))
        .join(
            b,
            (F.col("user_id") == F.col("u_b")) & (F.col("w_b") == F.col("week") + 1),
            "left",
        )
        .select("week", "user_id", F.col("u_b").isNotNull().alias("retained"))
    )
    churned = (~F.col("retained")).cast("long")
    return pairs.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(churned).alias("n_churned"),
        stable_round(F.sum(churned) * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
            "churn_rate"
        ),
    )


@register(
    "q_max_drawdown",
    oracle="""
WITH daily AS (
    SELECT event_type,
           time_bucket(INTERVAL '1 day', ts) AS day,
           (round(sum(value) * 10000.0) / 10000.0) AS x
    FROM events GROUP BY 1, 2
),
peaks AS (
    SELECT event_type, day, x,
           max(x) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
    FROM daily
)
SELECT event_type,
       (round(max((peak - x) / peak) * 1000000.0) / 1000000.0) AS max_drawdown,
       (round(max(peak) * 10000.0) / 10000.0) AS peak_value
FROM peaks GROUP BY event_type
""",
    description=(
        "Maximum drawdown of each type's daily-revenue series — the "
        "worst relative drop from the running peak, the risk metric "
        "finance and SLO dashboards share. Running max IS associative "
        "(unlike q_recursive_balance's clamp), so a prefix-max window "
        "over the days-sized aggregate suffices — no recursion; the "
        "per-row (peak-x)/peak ratios and the final max are order-"
        "independent doubles."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        (F.round(F.sum("value") * 10000.0) / 10000.0).alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaks = daily.select(
        "event_type", "x", F.max("x").over(w).alias("peak")
    )
    return peaks.groupBy("event_type").agg(
        stable_round(
            F.max((F.col("peak") - F.col("x")) / F.col("peak")), 6
        ).alias("max_drawdown"),
        stable_round(F.max("peak"), 4).alias("peak_value"),
    )


@register(
    "q_event_streaks",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
           CAST(row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS BIGINT) AS rn_t
    FROM events
),
islands AS (
    SELECT user_id, event_type, rn - rn_t AS island,
           CAST(count(*) AS BIGINT) AS streak_len
    FROM seq GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(max(streak_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       (round(avg(streak_len) * 1000000.0) / 1000000.0) AS avg_streak
FROM islands GROUP BY event_type
""",
    description=(
        "Consecutive same-type event streaks per user via the gaps-and-"
        "islands rn-difference trick: two row_numbers (global per user, "
        "and per (user, type)) differ by a constant exactly within a "
        "run of identical types, so the difference IS the island id — "
        "no self-join, no recursion, just two windows sharing the "
        "user_id shuffle plus a rollup. Streak analysis feeds retry-"
        "storm detection (error streaks) and engagement scoring "
        "(consecutive-activity runs)."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_ut = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w_u).cast("long").alias("rn"),
        F.row_number().over(w_ut).cast("long").alias("rn_t"),
    )
    islands = seq.groupBy(
        "user_id", "event_type", (F.col("rn") - F.col("rn_t")).alias("island")
    ).agg(F.count(F.lit(1)).alias("streak_len"))
    return islands.groupBy("event_type").agg(
        F.max("streak_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        stable_round(F.avg("streak_len"), 6).alias("avg_streak"),
    )


@register(
    "q_cohort_ltv",
    oracle="""
WITH firsts AS (
    SELECT user_id, min(time_bucket(INTERVAL '1 day', ts)) AS cohort_day
    FROM events GROUP BY user_id
),
rev AS (
    SELECT f.cohort_day,
           CAST(epoch_us(time_bucket(INTERVAL '1 day', e.ts) - f.cohort_day)
                // 86400000000 AS BIGINT) AS age_days,
           e.value
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    WHERE e.event_type = 'purchase'
),
cohort_sizes AS (
    SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users FROM firsts GROUP BY 1
),
daily_rev AS (
    SELECT cohort_day, age_days,
           (round(sum(value) * 10000.0) / 10000.0) AS rev
    FROM rev GROUP BY 1, 2
),
cum AS (
    SELECT cohort_day, age_days,
           (round(sum(rev) OVER (PARTITION BY cohort_day ORDER BY age_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000.0) / 10000.0)
               AS cum_rev
    FROM daily_rev
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       c.age_days,
       s.n_users,
       (round((c.cum_rev / s.n_users) * 1000000.0) / 1000000.0) AS ltv_per_user
FROM cum c JOIN cohort_sizes s ON s.cohort_day = c.cohort_day
WHERE c.age_days <= 7
""",
    description=(
        "Cohort LTV curve: cumulative purchase revenue per user by "
        "cohort age (first 7 days) — the payback/LTV ribbon next to "
        "q_cohort_retention's active-count triangle. Ages computed in "
        "exact integer days from the cohort anchor; daily revenue "
        "stable-rounds BEFORE the cumulative window so the running sums "
        "add identical values on both engines, and the per-user "
        "division happens on the cohort-grid-sized frame. The only "
        "fact-sized work is the cohort-anchor join (per-user table, "
        "never broadcastable at scale) and the revenue aggregate."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_day",
            (
                (
                    F.unix_micros(F.date_trunc("day", "ts"))
                    - F.unix_micros("cohort_day")
                )
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("age_days"),
            "value",
        )
    )
    sizes = firsts.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_users"))
    daily_rev = rev.groupBy("cohort_day", "age_days").agg(
        (F.round(F.sum("value") * 10000.0) / 10000.0).alias("rev")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily_rev.select(
        "cohort_day",
        "age_days",
        (F.round(F.sum("rev").over(w) * 10000.0) / 10000.0).alias("cum_rev"),
    )
    return (
        cum.filter(F.col("age_days") <= 7)
        .join(sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "age_days",
            "n_users",
            stable_round(F.col("cum_rev") / F.col("n_users"), 6).alias("ltv_per_user"),
        )
    )


@register(
    "q_welch_ttest",
    oracle="""
WITH assign AS (
    SELECT value,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0)
               AS in_a
    FROM events WHERE event_type = 'purchase'
),
arms AS (
    SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           sum(CASE WHEN in_a THEN value ELSE 0.0 END) AS sa,
           sum(CASE WHEN NOT in_a THEN value ELSE 0.0 END) AS sb,
           sum(CASE WHEN in_a THEN value * value ELSE 0.0 END) AS saa,
           sum(CASE WHEN NOT in_a THEN value * value ELSE 0.0 END) AS sbb
    FROM assign
)
SELECT n_a, n_b,
       (round((sa / n_a) * 1000000.0) / 1000000.0) AS mean_a,
       (round((sb / n_b) * 1000000.0) / 1000000.0) AS mean_b,
       (round(((sa / n_a - sb / n_b)
               / sqrt((saa / n_a - (sa / n_a) * (sa / n_a)) / (n_a - 1)
                      + (sbb / n_b - (sb / n_b) * (sb / n_b)) / (n_b - 1)))
              * 10000.0) / 10000.0) AS welch_t
FROM arms
""",
    description=(
        "Welch's unequal-variance t statistic for mean purchase value "
        "between the hash-assigned A/B arms — the means complement to "
        "q_ab_test_ztest's proportions: t = (mA - mB) / sqrt(vA/nA + "
        "vB/nB) with variances from one conditional-moment pass "
        "(sample variance via moments over n-1). The statistic rounds "
        "at 4dp: the moment sums are double folds over ~n rows, and "
        "the variance difference cancellation costs ~2 digits of the "
        "6dp budget — the rate/means columns keep 6dp. One partial-"
        "aggregated scan; the t math runs on a 1-row frame."
    ),
    tags=("analytics", "extension", "parity"),
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    in_a = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    arms = ev.select("value", in_a.alias("in_a")).agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("value")).otherwise(0.0)).alias("sa"),
        F.sum(F.when(~F.col("in_a"), F.col("value")).otherwise(0.0)).alias("sb"),
        F.sum(F.when(F.col("in_a"), F.col("value") * F.col("value")).otherwise(0.0)).alias("saa"),
        F.sum(F.when(~F.col("in_a"), F.col("value") * F.col("value")).otherwise(0.0)).alias("sbb"),
    )
    ma = F.col("sa") / F.col("n_a")
    mb = F.col("sb") / F.col("n_b")
    va = (F.col("saa") / F.col("n_a") - ma * ma) / (F.col("n_a") - 1)
    vb = (F.col("sbb") / F.col("n_b") - mb * mb) / (F.col("n_b") - 1)
    return arms.select(
        "n_a",
        "n_b",
        stable_round(ma, 6).alias("mean_a"),
        stable_round(mb, 6).alias("mean_b"),
        stable_round((ma - mb) / F.sqrt(va + vb), 4).alias("welch_t"),
    )


@register(
    "q_chi2_independence",
    oracle="""
WITH cells AS (
    SELECT event_type, dayofweek(ts) AS wd, CAST(count(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
),
margins AS (
    SELECT c.event_type, c.wd, c.o,
           sum(c.o) OVER (PARTITION BY c.event_type) AS row_tot,
           sum(c.o) OVER (PARTITION BY c.wd) AS col_tot,
           sum(c.o) OVER () AS n
    FROM cells c
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       (round(sum((o - row_tot * col_tot * 1.0 / n) * (o - row_tot * col_tot * 1.0 / n)
                  / (row_tot * col_tot * 1.0 / n)) * 1000000.0) / 1000000.0) AS chi2,
       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT wd) - 1) AS BIGINT) AS dof
FROM margins
""",
    description=(
        "Chi-square test of independence between event type and "
        "weekday — does traffic mix shift by day of week? Expected "
        "cell counts from exact integer margins (row x column / total, "
        "all BIGINT window sums over the contingency-table-sized "
        "grid), chi2 folded in one fixed expression with degrees of "
        "freedom alongside. The contingency table is types x 7 — every "
        "window here is metadata-scale; the one fact-sized stage is "
        "the cell-count aggregate."
    ),
    tags=("analytics", "extension", "parity"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("wd")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = cells.select(
        "event_type",
        "wd",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("wd")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") * F.lit(1.0) / F.col("n")
    return margins.agg(
        F.count(F.lit(1)).alias("n_cells"),
        stable_round(F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp), 6).alias(
            "chi2"
        ),
        (
            (F.count_distinct("event_type") - 1) * (F.count_distinct("wd") - 1)
        ).cast("long").alias("dof"),
    )


@register(
    "q_tail_latency_heatmap",
    oracle="""
SELECT CAST(dayofweek(ts) AS BIGINT) AS weekday,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.95) AS p95,
       quantile_disc(value, 0.99) AS p99
FROM events
GROUP BY 1, 2
""",
    description=(
        "Tail-percentile heatmap feeder: p50/p95/p99 of the value "
        "distribution per (weekday, hour) cell — the ops-dashboard grid "
        "that localizes tail regressions to load patterns (weekday "
        "peaks vs weekend nights). Discrete percentiles return observed "
        "values, so the whole grid is bit-exact with no rounding "
        "bridge; one partial-aggregated scan into a 7x24-cell result. "
        "Exact per-cell percentiles sort within cells — at 100 TB the "
        "approx_percentile sketch is the drop-in (q_approx_quantiles)."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_tail_latency_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("weekday"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
    )


@register(
    "q_error_budget_burn",
    oracle="""
WITH daily AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
    FROM events GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       n_total, n_err,
       (round((n_err * 1.0 / n_total) * 1000000.0) / 1000000.0) AS error_rate,
       (round(((n_err * 1.0 / n_total) / 0.05) * 1000000.0) / 1000000.0) AS burn_rate,
       (round((sum(n_err) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0
               / (0.05 * sum(n_total) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
              * 1000000.0) / 1000000.0) AS cum_budget_consumed
FROM daily
""",
    description=(
        "SRE error-budget burn-down against a 95% SLO: daily error "
        "rate, burn rate (rate / budget — >1 means burning faster than "
        "the budget allows), and the cumulative fraction of the "
        "month-to-date budget consumed (errors-to-date / 5% of "
        "requests-to-date) — the paging signal behind multiwindow "
        "burn-rate alerts. One daily aggregate; the running-budget "
        "windows ride the days-sized series, and every ratio is a "
        "fixed-order expression over exact integer counts."
    ),
    tags=("analytics", "extension", "timeseries", "quality"),
)
def q_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.rounding import stable_round

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_err"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rate = F.col("n_err") * F.lit(1.0) / F.col("n_total")
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_total",
        "n_err",
        stable_round(rate, 6).alias("error_rate"),
        stable_round(rate / F.lit(0.05), 6).alias("burn_rate"),
        stable_round(
            F.sum("n_err").over(w) * F.lit(1.0)
            / (F.lit(0.05) * F.sum("n_total").over(w)),
            6,
        ).alias("cum_budget_consumed"),
    )


@register(
    "q_salted_join",
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT)                   AS n_events,
       (round(sum(e.value) * 1000000.0) / 1000000.0) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    description=(
        "Salted skew-join: the mitigation for what q_skew_profile "
        "diagnoses. The fact side gets a deterministic per-row salt "
        "(xxhash64 of event_id mod 8), the 8x-exploded dim joins on "
        "(key, salt), so each heavy-hitter user spreads over 8 shuffle "
        "partitions instead of funneling one straggler. Result is "
        "bit-identical to the plain join (oracle IS the unsalted SQL); "
        "a unit test also pins salted == unsalted row-for-row."
    ),
    tags=("analytics", "extension", "scale", "parity"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.relational import salted_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(ev, cust, "user_id", "c_custkey", n_salts=8, salt_source="event_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        stable_round(F.sum("value"), 6).alias("total_value"),
    )


# Zelen & Severo 26.2.17 rational tail approximation of the standard
# normal CDF (|error| < 7.5e-8) — pure arithmetic + exp, so both engines
# evaluate the identical formula; results are 6dp-rounded to absorb
# cross-libm exp() ulp drift. Inlined as literals on both sides.
_BH_ALPHA = 0.05
_PHI_CONSTS = (0.2316419, 0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_SQRT_2PI = 2.5066282746310002


def _tail_p_sql(az: str) -> str:
    b0, b1, b2, b3, b4, b5 = _PHI_CONSTS
    t = f"(1.0 / (1.0 + {b0} * {az}))"
    poly = f"({t} * ({b1} + {t} * ({b2} + {t} * ({b3} + {t} * ({b4} + {t} * {b5})))))"
    pdf = f"(exp(-({az}) * ({az}) / 2.0) / {_SQRT_2PI})"
    return f"least(1.0, 2.0 * {pdf} * {poly})"


@register(
    "q_bh_fdr",
    oracle=f"""
WITH g AS (
    SELECT count(*) AS n, sum(value) AS s, sum(value * value) AS ss FROM events
),
gm AS (
    SELECT (round((s / n) * 1000000.0) / 1000000.0) AS gmean,
           (round(sqrt((ss - s * s / n) / n) * 1000000.0) / 1000000.0) AS gstd
    FROM g
),
cells AS (
    SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS weekday,
           CAST(count(*) AS BIGINT) AS n,
           (round((sum(value) / count(*)) * 1000000.0) / 1000000.0) AS cmean
    FROM events GROUP BY 1, 2
),
zs AS (
    SELECT event_type, weekday, n,
           (round(((cmean - gmean) / (gstd / sqrt(n))) * 1000000.0) / 1000000.0) AS z
    FROM cells, gm
),
ps AS (
    SELECT event_type, weekday, n, z,
           (round({_tail_p_sql("abs(z)")} * 1000000.0) / 1000000.0) AS p
    FROM zs
),
ranked AS (
    SELECT *, CAST(row_number() OVER (ORDER BY p ASC, event_type ASC, weekday ASC) AS BIGINT) AS rnk,
           CAST(count(*) OVER () AS BIGINT) AS m
    FROM ps
)
SELECT event_type, weekday, n, z, p, rnk,
       (rnk <= coalesce(max(CASE WHEN p <= {_BH_ALPHA} * rnk / m THEN rnk END) OVER (), 0))
         AS rejected
FROM ranked
""",
    description=(
        "Benjamini-Hochberg FDR screen over the (event_type x weekday) "
        "grid: per-cell one-sample z-tests of mean value vs the corpus "
        "mean, normal-tail p-values via the Zelen-Severo rational "
        "approximation (identical literals both engines, 6dp-rounded to "
        "absorb libm exp drift), then the step-up procedure — rank "
        "p ascending, reject through the largest rank with "
        "p <= alpha*rank/m. The multiple-testing guard the per-test "
        "family (Welch t, chi-square, z-test) needs before anyone acts "
        "on 35 simultaneous hypotheses. The global window runs over m = "
        "#tests rows (post-aggregation), never the event table."
    ),
    tags=("analytics", "extension", "stats", "parity"),
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bh_fdr(load_table(spark, sf_dir, "events"))


def bh_fdr(ev: DataFrame) -> DataFrame:
    b0, b1, b2, b3, b4, b5 = _PHI_CONSTS
    g = ev.agg(
        F.count(F.lit(1)).alias("gn"), F.sum("value").alias("s"), F.sum(F.col("value") * F.col("value")).alias("ss")
    ).select(
        stable_round(F.col("s") / F.col("gn"), 6).alias("gmean"),
        stable_round(F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("gn")) / F.col("gn")), 6).alias("gstd"),
    )
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("weekday")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(F.sum("value") / F.count(F.lit(1)), 6).alias("cmean"),
    )
    zs = cells.crossJoin(F.broadcast(g)).select(
        "event_type",
        "weekday",
        "n",
        stable_round((F.col("cmean") - F.col("gmean")) / (F.col("gstd") / F.sqrt("n")), 6).alias("z"),
    )
    az = F.abs(F.col("z"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(b0) * az)
    poly = t * (F.lit(b1) + t * (F.lit(b2) + t * (F.lit(b3) + t * (F.lit(b4) + t * F.lit(b5)))))
    pdf = F.exp(-az * az / F.lit(2.0)) / F.lit(_SQRT_2PI)
    ps = zs.withColumn("p", stable_round(F.least(F.lit(1.0), F.lit(2.0) * pdf * poly), 6))
    wr = Window.orderBy(F.asc("p"), F.asc("event_type"), F.asc("weekday"))
    wall = Window.partitionBy()
    ranked = ps.withColumn("rnk", F.row_number().over(wr).cast("long")).withColumn(
        "m", F.count(F.lit(1)).over(wall).cast("long")
    )
    kmax = F.coalesce(
        F.max(
            F.when(F.col("p") <= F.lit(_BH_ALPHA) * F.col("rnk") / F.col("m"), F.col("rnk"))
        ).over(wall),
        F.lit(0).cast("long"),
    )
    return ranked.select(
        "event_type", "weekday", "n", "z", "p", "rnk", (F.col("rnk") <= kmax).alias("rejected")
    )


@register(
    "q_holt_smoothing",
    oracle="""
WITH RECURSIVE raw AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           (round(sum(value) * 10000.0) / 10000.0) AS x
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
idxd AS (
    SELECT day, x,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
    FROM raw
),
holt AS (
    SELECT a.idx, a.day, a.x, a.x AS l, (b2.x - a.x) AS b
    FROM idxd a JOIN idxd b2 ON a.idx = 1 AND b2.idx = 2
    UNION ALL
    SELECT d.idx, d.day, d.x,
           (round((0.5 * d.x + 0.5 * (h.l + h.b)) * 10000.0) / 10000.0),
           (round((0.3 * ((round((0.5 * d.x + 0.5 * (h.l + h.b)) * 10000.0) / 10000.0) - h.l)
                   + 0.7 * h.b) * 10000.0) / 10000.0)
    FROM holt h JOIN idxd d ON d.idx = h.idx + 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, x AS revenue, l AS level, b AS trend,
       l + b AS forecast_next
FROM holt
""",
    description=(
        "Holt's double exponential smoothing (level alpha=0.5 + trend "
        "beta=0.3) of daily revenue via native WITH RECURSIVE — the "
        "trend-aware upgrade of q_ewma_smoothing, with the classic "
        "b1 = x2 - x1 initialization and the one-step-ahead forecast "
        "l+b per day. The trend update references the JUST-updated "
        "level, so the rounded level expression is inlined twice, "
        "identically on both engines — each step re-rounds to 4dp so "
        "the chain cannot drift however long the series. Recursion "
        "depth = days; all data-sized work is the one daily aggregate."
    ),
    tags=("analytics", "extension", "timeseries", "recursive"),
)
def q_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg((F.round(F.sum("value") * 10000.0) / 10000.0).alias("x"))
    )
    idxd = raw.select(
        "day", "x", F.row_number().over(Window.orderBy("day")).cast("long").alias("idx")
    )
    idxd.createOrReplaceTempView("v_holt_daily")
    return spark.sql(
        """
WITH RECURSIVE holt AS (
    SELECT a.idx, a.day, a.x, a.x AS l, (b2.x - a.x) AS b
    FROM v_holt_daily a JOIN v_holt_daily b2 ON a.idx = 1 AND b2.idx = 2
    UNION ALL
    SELECT d.idx, d.day, d.x,
           (round((0.5 * d.x + 0.5 * (h.l + h.b)) * 10000.0) / 10000.0),
           (round((0.3 * ((round((0.5 * d.x + 0.5 * (h.l + h.b)) * 10000.0) / 10000.0) - h.l)
                   + 0.7 * h.b) * 10000.0) / 10000.0)
    FROM holt h JOIN v_holt_daily d ON d.idx = h.idx + 1
)
SELECT date_format(day, 'yyyy-MM-dd') AS day, x AS revenue, l AS level, b AS trend,
       l + b AS forecast_next
FROM holt
"""
    )


@register(
    "q_kaplan_meier",
    oracle="""
WITH RECURSIVE f AS (
    SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY user_id
),
p AS (
    SELECT user_id, min(epoch_us(ts)) AS p_us
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
subj AS (
    SELECT f.user_id,
           CASE WHEN p.p_us IS NOT NULL
                     AND (p.p_us - f.first_us) // 3600000000 <= 60
                THEN (p.p_us - f.first_us) // 3600000000 ELSE 60 END AS dur,
           (p.p_us IS NOT NULL AND (p.p_us - f.first_us) // 3600000000 <= 60) AS event
    FROM f LEFT JOIN p ON f.user_id = p.user_id
),
tbl AS (
    SELECT CAST(dur AS BIGINT) AS dur,
           CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c
    FROM subj GROUP BY 1
),
idxd AS (
    SELECT dur, d, c,
           CAST(row_number() OVER (ORDER BY dur) AS BIGINT) AS idx,
           CAST(sum(d + c) OVER () - coalesce(sum(d + c) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
    FROM tbl
),
km AS (
    SELECT idx, dur, d, c, n_risk,
           (round((1.0 - d * 1.0 / n_risk) * 1000000.0) / 1000000.0) AS s
    FROM idxd WHERE idx = 1
    UNION ALL
    SELECT i.idx, i.dur, i.d, i.c, i.n_risk,
           (round((k.s * (1.0 - i.d * 1.0 / i.n_risk)) * 1000000.0) / 1000000.0)
    FROM km k JOIN idxd i ON i.idx = k.idx + 1
)
SELECT dur AS hours, n_risk, d AS n_converted, c AS n_censored, s AS survival
FROM km
""",
    description=(
        "Kaplan-Meier estimator of time-to-first-purchase (whole hours "
        "from each user's first event, exact integer-us arithmetic) with "
        "administrative right-censoring at a 60 h follow-up horizon — "
        "users not converting within the horizon are censored AT 60 h, "
        "the setup where naive mean-delay is biased and KM is the "
        "correct curve (survival here = P(not yet purchased)). "
        "n-at-risk via one running-sum window over the <=61-row duration "
        "table; the survival product S(t) = prod(1 - d/n) runs as a "
        "WITH RECURSIVE chain with per-step 6dp re-round (cross-engine "
        "drift-proof, like the EWMA/Holt chains). All data-sized work is "
        "two per-user aggregates; everything after is O(#durations)."
    ),
    tags=("analytics", "extension", "stats", "recursive"),
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("first_us"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    delay_h = F.floor((F.col("p_us") - F.col("first_us")) / F.lit(3600000000))
    is_event = F.col("p_us").isNotNull() & (delay_h <= 60)
    subj = f.join(p, "user_id", "left").select(
        F.when(is_event, delay_h).otherwise(F.lit(60)).cast("long").alias("dur"),
        is_event.alias("event"),
    )
    return kaplan_meier_curve(subj)


def kaplan_meier_curve(subj: DataFrame) -> DataFrame:
    """KM table from per-subject (dur BIGINT, event BOOLEAN) rows:
    (hours, n_risk, n_converted, n_censored, survival)."""
    tbl = subj.groupBy("dur").agg(
        F.sum(F.when(F.col("event"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("event"), 0).otherwise(1)).cast("long").alias("c"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    idxd = tbl.select(
        "dur",
        "d",
        "c",
        F.row_number().over(Window.orderBy("dur")).cast("long").alias("idx"),
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    idxd.createOrReplaceTempView("v_km_idxd")
    return subj.sparkSession.sql(
        """
WITH RECURSIVE km AS (
    SELECT idx, dur, d, c, n_risk,
           (round((1.0D - d * 1.0D / n_risk) * 1000000.0D) / 1000000.0D) AS s
    FROM v_km_idxd WHERE idx = 1
    UNION ALL
    SELECT i.idx, i.dur, i.d, i.c, i.n_risk,
           (round((k.s * (1.0D - i.d * 1.0D / i.n_risk)) * 1000000.0D) / 1000000.0D)
    FROM km k JOIN v_km_idxd i ON i.idx = k.idx + 1
)
SELECT dur AS hours, n_risk, d AS n_converted, c AS n_censored, s AS survival
FROM km
"""
    )


def ridge_2f(
    df: DataFrame,
    *,
    group_col: str,
    x1: F.Column,
    x2: F.Column,
    y: F.Column,
    lam: float = 1.0,
) -> DataFrame:
    """Ridge-regularized two-feature linear regression per group, solved
    in closed form from ONE moment aggregate (9 sums) — the multivariate
    upgrade of q_grouped_ols. Centered normal equations with +lam on the
    diagonal; the 2x2 solve is exact arithmetic on 6dp-rounded moments,
    so results are engine-identical. No iteration, no driver math: the
    data-sized work is a single partial-aggregated groupBy.
    """
    rows = df.select(
        F.col(group_col).alias("g"), x1.alias("x1"), x2.alias("x2"), y.alias("y")
    )
    m = rows.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    r6 = lambda c: stable_round(c, 6)  # noqa: E731
    cm = m.select(
        "g",
        "n",
        r6(F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("c11"),
        r6(F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("c12"),
        r6(F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("c22"),
        r6(F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")).alias("c1y"),
        r6(F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")).alias("c2y"),
        r6(F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
        r6(F.col("s1") / F.col("n")).alias("m1"),
        r6(F.col("s2") / F.col("n")).alias("m2"),
        r6(F.col("sy") / F.col("n")).alias("my"),
    )
    det = (F.col("c11") + F.lit(lam)) * (F.col("c22") + F.lit(lam)) - F.col("c12") * F.col("c12")
    b1 = ((F.col("c22") + F.lit(lam)) * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = ((F.col("c11") + F.lit(lam)) * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    sse = (
        F.col("cyy")
        - F.lit(2.0) * (b1 * F.col("c1y") + b2 * F.col("c2y"))
        + (b1 * b1 * F.col("c11") + F.lit(2.0) * b1 * b2 * F.col("c12") + b2 * b2 * F.col("c22"))
    )
    return cm.select(
        F.col("g").alias(group_col),
        "n",
        r6(b1).alias("beta_x1"),
        r6(b2).alias("beta_x2"),
        r6(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2")).alias("intercept"),
        r6(F.lit(1.0) - sse / F.col("cyy")).alias("r2"),
    )


@register(
    "q_ridge_regression",
    oracle="""
WITH m AS (
    SELECT event_type AS g, count(*) AS n,
           sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
           sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
           sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
    FROM (
        SELECT event_type,
               CAST(hour(ts) AS DOUBLE) AS x1,
               CAST(dayofweek(ts) AS DOUBLE) AS x2,
               value AS y
        FROM events
    ) GROUP BY 1
),
cm AS (
    SELECT g, CAST(n AS BIGINT) AS n,
           (round((s11 - s1 * s1 / n) * 1000000.0) / 1000000.0) AS c11,
           (round((s12 - s1 * s2 / n) * 1000000.0) / 1000000.0) AS c12,
           (round((s22 - s2 * s2 / n) * 1000000.0) / 1000000.0) AS c22,
           (round((s1y - s1 * sy / n) * 1000000.0) / 1000000.0) AS c1y,
           (round((s2y - s2 * sy / n) * 1000000.0) / 1000000.0) AS c2y,
           (round((syy - sy * sy / n) * 1000000.0) / 1000000.0) AS cyy,
           (round((s1 / n) * 1000000.0) / 1000000.0) AS m1,
           (round((s2 / n) * 1000000.0) / 1000000.0) AS m2,
           (round((sy / n) * 1000000.0) / 1000000.0) AS my
    FROM m
),
sol AS (
    SELECT *,
           ((c22 + 1.0) * c1y - c12 * c2y)
             / ((c11 + 1.0) * (c22 + 1.0) - c12 * c12) AS b1,
           ((c11 + 1.0) * c2y - c12 * c1y)
             / ((c11 + 1.0) * (c22 + 1.0) - c12 * c12) AS b2
    FROM cm
)
SELECT g AS event_type, n,
       (round(b1 * 1000000.0) / 1000000.0) AS beta_x1,
       (round(b2 * 1000000.0) / 1000000.0) AS beta_x2,
       (round((my - b1 * m1 - b2 * m2) * 1000000.0) / 1000000.0) AS intercept,
       (round((1.0 - (cyy - 2.0 * (b1 * c1y + b2 * c2y)
                      + (b1 * b1 * c11 + 2.0 * b1 * b2 * c12 + b2 * b2 * c22)) / cyy)
              * 1000000.0) / 1000000.0) AS r2
FROM sol
""",
    description=(
        "Ridge-regularized two-feature regression per event type "
        "(value ~ hour-of-day + weekday, lambda=1): centered normal "
        "equations from ONE 10-sum moment aggregate, exact closed-form "
        "2x2 solve, plus moment-derived R^2 — the multivariate upgrade "
        "of q_grouped_ols, still zero iteration and zero driver math. "
        "Moments 6dp-rounded before the solve so both engines run "
        "identical arithmetic."
    ),
    tags=("analytics", "extension", "stats", "parity"),
)
def q_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ridge_2f(
        ev,
        group_col="event_type",
        x1=F.hour("ts").cast("double"),
        x2=(F.dayofweek("ts") - 1).cast("double"),
        y=F.col("value"),
        lam=1.0,
    )


@register(
    "q_pivot_wide",
    oracle="""
WITH daily AS (
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           event_type,
           sum(CAST(round(value * 100) AS BIGINT)) AS rev_cents
    FROM events GROUP BY 1, 2
)
SELECT day,
       CAST(coalesce(max(CASE WHEN event_type = 'click'    THEN rev_cents END), 0) AS BIGINT) AS click_cents,
       CAST(coalesce(max(CASE WHEN event_type = 'error'    THEN rev_cents END), 0) AS BIGINT) AS error_cents,
       CAST(coalesce(max(CASE WHEN event_type = 'purchase' THEN rev_cents END), 0) AS BIGINT) AS purchase_cents,
       CAST(coalesce(max(CASE WHEN event_type = 'signup'   THEN rev_cents END), 0) AS BIGINT) AS signup_cents,
       CAST(coalesce(max(CASE WHEN event_type = 'view'     THEN rev_cents END), 0) AS BIGINT) AS view_cents
FROM daily GROUP BY day
""",
    description=(
        "Wide PIVOT (long -> columns), the reshape inverse of "
        "q_unpivot: daily exact-cents revenue per event type spread "
        "into one column per type via Spark's native pivot with an "
        "EXPLICIT value list — never the two-pass values-discovery "
        "form, which runs an extra distinct job and breaks plan "
        "caching at 100 TB. One partial-aggregated shuffle on (day, "
        "type), then the pivot rides the days-sized frame."
    ),
    tags=("analytics", "extension", "relational"),
)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    types = ["click", "error", "purchase", "signup", "view"]
    wide = daily.groupBy("day").pivot("event_type", types).agg(F.max("rev_cents"))
    return wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"{t}_cents") for t in types],
    )


@register(
    "q_interpolate_linear",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           sum(CAST(round(value * 100) AS BIGINT)) AS rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
grid AS (
    -- DuckDB range() is end-exclusive; pad one day to match Spark's
    -- inclusive sequence(d0, d1)
    SELECT CAST(unnest(range(CAST(d0 AS TIMESTAMP),
                             CAST(d1 AS TIMESTAMP) + INTERVAL '1 day',
                             INTERVAL '1 day')) AS DATE) AS day
    FROM bounds
),
joined AS (
    SELECT g.day, d.rev_cents FROM grid g LEFT JOIN daily d ON d.day = g.day
),
bracketed AS (
    SELECT day, rev_cents,
           max(CASE WHEN rev_cents IS NOT NULL THEN day END)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
           last_value(rev_cents IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
           first_value(rev_cents IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
           min(CASE WHEN rev_cents IS NOT NULL THEN day END)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
    FROM joined
)
SELECT CAST(day AS VARCHAR) AS day,
       (rev_cents IS NOT NULL) AS observed,
       (round((CASE
           WHEN rev_cents IS NOT NULL THEN rev_cents / 100.0
           WHEN prev_val IS NULL THEN next_val / 100.0
           WHEN next_val IS NULL THEN prev_val / 100.0
           ELSE (prev_val
                 + (next_val - prev_val)
                   * date_diff('day', prev_day, day)
                   * 1.0 / date_diff('day', prev_day, next_day)) / 100.0
       END) * 1000000.0) / 1000000.0) AS revenue
FROM bracketed
""",
    description=(
        "Linear interpolation over calendar gaps in the daily purchase "
        "series — the numeric upgrade of q_gap_fill's previous-value "
        "carry: missing days get the straight line between the "
        "bracketing observed days ((next-prev) * elapsed/gap), edges "
        "clamp to the nearest observation. Built from the generated "
        "calendar grid + two IGNORE NULLS window carries (forward "
        "last_value, backward first_value) over the days-sized frame; "
        "interpolation arithmetic stays in exact cents until the one "
        "rounded division."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    joined = grid.join(daily, "day", "left")
    w_b = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_f = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_day = F.when(F.col("rev_cents").isNotNull(), F.col("day"))
    bracketed = joined.select(
        "day",
        "rev_cents",
        F.max(obs_day).over(w_b).alias("prev_day"),
        F.last("rev_cents", ignorenulls=True).over(w_b).alias("prev_val"),
        F.first("rev_cents", ignorenulls=True).over(w_f).alias("next_val"),
        F.min(obs_day).over(w_f).alias("next_day"),
    )
    interp = (
        F.when(F.col("rev_cents").isNotNull(), F.col("rev_cents") / 100.0)
        .when(F.col("prev_val").isNull(), F.col("next_val") / 100.0)
        .when(F.col("next_val").isNull(), F.col("prev_val") / 100.0)
        .otherwise(
            (
                F.col("prev_val")
                + (F.col("next_val") - F.col("prev_val"))
                * F.datediff("day", "prev_day")
                * F.lit(1.0)
                / F.datediff("next_day", "prev_day")
            )
            / 100.0
        )
    )
    return bracketed.select(
        F.col("day").cast("string").alias("day"),
        F.col("rev_cents").isNotNull().alias("observed"),
        stable_round(interp, 6).alias("revenue"),
    )


@register(
    "q_iqr_outliers",
    oracle="""
WITH cents AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
h AS (
    SELECT event_type, v, CAST(count(*) AS BIGINT) AS t
    FROM cents GROUP BY 1, 2
),
tot AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n FROM h GROUP BY 1),
cum AS (
    SELECT h.event_type, h.v, h.t, tt.n,
           sum(h.t) OVER (PARTITION BY h.event_type ORDER BY h.v) AS c
    FROM h JOIN tot tt ON tt.event_type = h.event_type
),
quart AS (
    SELECT event_type, max(n) AS n,
           min(CASE WHEN c >= ceil(n * 0.25) THEN v END) AS q1,
           min(CASE WHEN c >= ceil(n * 0.75) THEN v END) AS q3
    FROM cum GROUP BY event_type
),
fence AS (
    SELECT event_type, n, q1, q3,
           q1 - 1.5 * (q3 - q1) AS lo,
           q3 + 1.5 * (q3 - q1) AS hi
    FROM quart
)
SELECT f.event_type, f.n,
       (round((f.q1 / 100.0) * 1000000.0) / 1000000.0) AS q1,
       (round((f.q3 / 100.0) * 1000000.0) / 1000000.0) AS q3,
       CAST(coalesce(sum(CASE WHEN h.v < f.lo OR h.v > f.hi THEN h.t END), 0) AS BIGINT)
           AS n_outliers,
       (round((coalesce(sum(CASE WHEN h.v < f.lo OR h.v > f.hi THEN h.t END), 0)
               * 1.0 / f.n) * 1000000.0) / 1000000.0) AS outlier_share
FROM fence f JOIN h ON h.event_type = f.event_type
GROUP BY f.event_type, f.n, f.q1, f.q3
""",
    description=(
        "Tukey IQR outlier screen per event type with EXACT quartiles "
        "and no data-scale sort: values collapse to an exact-cents "
        "histogram (group by type x cent-value), quartiles are order "
        "statistics read off the cumulative histogram (first value "
        "whose running count reaches ceil(0.25n)/ceil(0.75n) — the "
        "discrete 'lower' quantile, so both engines agree with zero "
        "interpolation), fences at 1.5 IQR, and the outlier count is a "
        "conditional re-aggregation of the same histogram. The only "
        "window rides distinct (type, cent) rows — bounded by the value "
        "range, not the row count — making this the grouped-quantile "
        "pattern that replaces per-row ntile/percent_rank at 100 TB. "
        "Complements q_anomaly_mad (robust center) and "
        "q_winsorized_mean (trimming) in the outlier toolkit."
    ),
    tags=("analytics", "extension", "quality", "stats"),
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    h = cents.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("t"))
    tot = h.groupBy("event_type").agg(F.sum("t").alias("n"))
    w = Window.partitionBy("event_type").orderBy("v")
    cum = h.join(tot, "event_type").withColumn("c", F.sum("t").over(w))
    quart = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("c") >= F.ceil(F.col("n") * 0.25), F.col("v"))).alias("q1"),
        F.min(F.when(F.col("c") >= F.ceil(F.col("n") * 0.75), F.col("v"))).alias("q3"),
    )
    fence = quart.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    out = F.when((F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi")), F.col("t"))
    return (
        h.join(F.broadcast(fence), "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(
            F.coalesce(F.sum(out), F.lit(0)).alias("n_outliers"),
            stable_round(
                F.coalesce(F.sum(out), F.lit(0)) * F.lit(1.0) / F.col("n"), 6
            ).alias("outlier_share"),
        )
        .select(
            "event_type",
            "n",
            stable_round(F.col("q1") / 100.0, 6).alias("q1"),
            stable_round(F.col("q3") / 100.0, 6).alias("q3"),
            "n_outliers",
            "outlier_share",
        )
    )


@register(
    "q_cramers_v",
    oracle="""
WITH obs AS (
    SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS wd,
           CAST(count(*) AS BIGINT) AS o
    FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
ct AS (SELECT wd, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
chi AS (
    SELECT sum((o.o - rt.r * 1.0 * ct.c / n.n) * (o.o - rt.r * 1.0 * ct.c / n.n)
               / (rt.r * 1.0 * ct.c / n.n)) AS chi2,
           max(n.n) AS n,
           CAST(count(DISTINCT o.event_type) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o.wd) AS BIGINT) AS n_cols
    FROM obs o
    JOIN rt ON rt.event_type = o.event_type
    JOIN ct ON ct.wd = o.wd
    CROSS JOIN n
)
SELECT n, n_rows, n_cols,
       (round(chi2 * 1000000.0) / 1000000.0) AS chi2,
       (round(sqrt(chi2 / (n * least(n_rows - 1, n_cols - 1))) * 1000000.0) / 1000000.0)
           AS cramers_v
FROM chi
""",
    description=(
        "Cramer's V effect size for the event_type x weekday "
        "association — the magnitude companion to q_chi2_independence's "
        "test statistic (chi-square grows with n and always "
        "'significant' at 100 TB; V = sqrt(chi2 / (n * min(r-1, c-1))) "
        "is the scale-free number a practitioner actually reads). Same "
        "one-pass contingency build (types x 7 grid); the V fold is one "
        "row."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts")).cast("long").alias("wd")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("wd").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    e = F.col("r") * F.lit(1.0) * F.col("c") / F.col("n")
    chi = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "wd")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
            F.max("n").alias("n"),
            F.count_distinct("event_type").alias("n_rows"),
            F.count_distinct("wd").alias("n_cols"),
        )
    )
    return chi.select(
        "n",
        "n_rows",
        "n_cols",
        stable_round(F.col("chi2"), 6).alias("chi2"),
        stable_round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "q_stl_decompose",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
tr AS (
    SELECT day, cents,
           CASE WHEN count(*) OVER w = 7
                THEN (round((avg(cents * 1.0) OVER w) * 1000000.0) / 1000000.0)
           END AS trend
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
    SELECT CAST(dayofweek(day) AS BIGINT) AS wd,
           (round(avg(cents - trend) * 1000000.0) / 1000000.0) AS seasonal
    FROM tr WHERE trend IS NOT NULL
    GROUP BY 1
)
SELECT CAST(t.day AS VARCHAR) AS day,
       (round((t.cents / 100.0) * 1000000.0) / 1000000.0) AS revenue,
       (round((t.trend / 100.0) * 1000000.0) / 1000000.0) AS trend,
       (round((s.seasonal / 100.0) * 1000000.0) / 1000000.0) AS seasonal,
       (round(((t.cents - t.trend - s.seasonal) / 100.0) * 1000000.0) / 1000000.0)
           AS residual
FROM tr t JOIN seas s ON s.wd = CAST(dayofweek(t.day) AS BIGINT)
WHERE t.trend IS NOT NULL
""",
    description=(
        "STL-lite seasonal decomposition of daily purchase revenue: "
        "trend = centered 7-day moving average (emitted only where the "
        "full week exists, so edges don't bias), weekday seasonal = "
        "mean detrended value per day-of-week, residual = the "
        "remainder — the decomposition behind 'is Monday always like "
        "this, or is something wrong?' and the preprocessing step for "
        "q_seasonal_anomaly-style alerting. Revenue stays exact cents "
        "until the rounded divisions; all windows ride the days-sized "
        "series; the 7-class seasonal table broadcasts back."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "cents",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            stable_round(F.avg(F.col("cents") * F.lit(1.0)).over(w), 6),
        ).alias("trend"),
    )
    # Spark dayofweek == DuckDB dayofweek + 1; label only feeds the
    # self-join, so the offset cancels as long as BOTH sides are
    # consistent within themselves.
    seas = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy(F.dayofweek("day").cast("long").alias("wd"))
        .agg(stable_round(F.avg(F.col("cents") - F.col("trend")), 6).alias("seasonal"))
    )
    out = (
        tr.filter(F.col("trend").isNotNull())
        .withColumn("wd", F.dayofweek("day").cast("long"))
        .join(F.broadcast(seas), "wd")
    )
    return out.select(
        F.col("day").cast("string").alias("day"),
        stable_round(F.col("cents") / 100.0, 6).alias("revenue"),
        stable_round(F.col("trend") / 100.0, 6).alias("trend"),
        stable_round(F.col("seasonal") / 100.0, 6).alias("seasonal"),
        stable_round(
            (F.col("cents") - F.col("trend") - F.col("seasonal")) / 100.0, 6
        ).alias("residual"),
    )


@register(
    "q_kendall_tau",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS rev_cents,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM events GROUP BY 1
),
pairs AS (
    SELECT CAST(sum(CASE WHEN (a.rev_cents - b.rev_cents)
                           * (a.active_users - b.active_users) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(sum(CASE WHEN (a.rev_cents - b.rev_cents)
                           * (a.active_users - b.active_users) < 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(sum(CASE WHEN a.rev_cents = b.rev_cents
                          AND a.active_users <> b.active_users
                    THEN 1 ELSE 0 END) AS BIGINT) AS tx,
           CAST(sum(CASE WHEN a.active_users = b.active_users
                          AND a.rev_cents <> b.rev_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS ty,
           CAST(sum(CASE WHEN a.rev_cents = b.rev_cents
                          AND a.active_users = b.active_users
                    THEN 1 ELSE 0 END) AS BIGINT) AS txy,
           CAST(count(*) AS BIGINT) AS n0
    FROM daily a JOIN daily b ON a.day < b.day
)
SELECT n0 AS n_pairs, c AS concordant, d AS discordant, tx, ty,
       (round(((c - d) * 1.0 / sqrt((n0 - tx - txy) * 1.0 * (n0 - ty - txy)))
              * 1000000.0) / 1000000.0) AS tau_b
FROM pairs
""",
    description=(
        "Kendall's tau-b rank correlation between daily revenue and "
        "daily active users: exact concordant/discordant/tied pair "
        "counts with the tie-corrected denominator — the "
        "outlier-immune alternative to q_spearman_corr (tau's bounded "
        "influence function tolerates the heavy-tailed revenue days "
        "that distort rank-transform-then-Pearson). Data-scale work is "
        "ONE partial-aggregated daily rollup (exact cents, exact "
        "distinct users); the O(days^2) pair join rides the "
        "days-sized aggregate — metadata, not data (a year is ~66k "
        "pairs) — and every count is an exact BIGINT, so tau-b is a "
        "single rounded double expression identical on both engines."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("rev_cents"),
        F.count_distinct("user_id").cast("long").alias("active_users"),
    )
    a = daily.select(
        F.col("day").alias("day_a"),
        F.col("rev_cents").alias("xa"),
        F.col("active_users").alias("ya"),
    )
    b = daily.select(
        F.col("day").alias("day_b"),
        F.col("rev_cents").alias("xb"),
        F.col("active_users").alias("yb"),
    )
    dx, dy = F.col("xa") - F.col("xb"), F.col("ya") - F.col("yb")
    p = (
        a.join(b, F.col("day_a") < F.col("day_b"))
        .agg(
            F.sum(F.when(dx * dy > 0, 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when(dx * dy < 0, 1).otherwise(0)).cast("long").alias("d"),
            F.sum(F.when((dx == 0) & (dy != 0), 1).otherwise(0))
            .cast("long")
            .alias("tx"),
            F.sum(F.when((dy == 0) & (dx != 0), 1).otherwise(0))
            .cast("long")
            .alias("ty"),
            F.sum(F.when((dx == 0) & (dy == 0), 1).otherwise(0))
            .cast("long")
            .alias("txy"),
            F.count(F.lit(1)).cast("long").alias("n0"),
        )
    )
    c, d, tx, ty, txy, n0 = (F.col(x) for x in ["c", "d", "tx", "ty", "txy", "n0"])
    tau = (c - d) * 1.0 / F.sqrt((n0 - tx - txy) * 1.0 * (n0 - ty - txy))
    return p.select(
        n0.alias("n_pairs"),
        c.alias("concordant"),
        d.alias("discordant"),
        "tx",
        "ty",
        stable_round(tau, 6).alias("tau_b"),
    )


@register(
    "q_ljung_box",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
idx AS (
    SELECT row_number() OVER (ORDER BY day) AS i, cents FROM daily
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
    FROM idx
),
dev AS (
    SELECT i, (cents - s * 1.0 / n) AS dv FROM idx CROSS JOIN stats
),
den AS (
    SELECT CAST(sum(CAST(round(dv * dv) AS BIGINT)) AS BIGINT) AS den_q FROM dev
),
lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
num AS (
    SELECT l.lag,
           CAST(coalesce(sum(CAST(round(a.dv * b.dv) AS BIGINT)), 0) AS BIGINT)
               AS num_q
    FROM lags l
    LEFT JOIN dev a ON TRUE
    JOIN dev b ON b.i = a.i - l.lag
    GROUP BY 1
),
rho AS (
    SELECT lag, (num_q * 1.0 / den_q) AS r, n
    FROM num CROSS JOIN den CROSS JOIN stats
),
terms AS (
    SELECT lag, r, n,
           CAST(round((r * r / (n - lag)) * 1000000000000.0) AS BIGINT) AS tq
    FROM rho
)
SELECT lag,
       (round(r * 1000000.0) / 1000000.0) AS rho,
       (round((n * (n + 2.0)
               * (sum(tq) OVER (ORDER BY lag) / 1000000000000.0))
              * 1000000.0) / 1000000.0) AS q_stat
FROM terms
""",
    description=(
        "Ljung-Box portmanteau white-noise test on daily purchase "
        "revenue: autocorrelations rho_1..rho_7 and the cumulative "
        "Q statistic n(n+2) * sum(rho_k^2 / (n-k)) — the 'is there any "
        "structure left?' gate run on forecast residuals "
        "(q_seasonal_naive_backtest, q_holt_smoothing) before trusting "
        "a model, and on raw series before bothering to model at all. "
        "The series is exact integer cents; deviations share one "
        "exact-rational mean (s/n); every sum that crosses rows — "
        "lagged products, squared deviations, the Q accumulation — is "
        "quantized to BIGINT first, so addition order can't move a "
        "bit on either engine. All windows ride the days-sized "
        "aggregate; the one data-scale pass is the daily rollup."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "cents"
    )
    stats = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    dev = idx.crossJoin(F.broadcast(stats)).select(
        "i", "n", (F.col("cents") - F.col("s") * 1.0 / F.col("n")).alias("dv")
    )
    den = dev.agg(
        F.sum(F.round(F.col("dv") * F.col("dv")).cast("long"))
        .cast("long")
        .alias("den_q")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("lag"))
    a = dev.select("i", "n", F.col("dv").alias("dva"))
    b = dev.select(F.col("i").alias("ib"), F.col("dv").alias("dvb"))
    num = (
        lags.join(a, F.lit(True), "left")
        .join(b, F.col("ib") == F.col("i") - F.col("lag"))
        .groupBy("lag")
        .agg(
            F.max("n").alias("n"),
            F.coalesce(
                F.sum(F.round(F.col("dva") * F.col("dvb")).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias("num_q"),
        )
    )
    rho = num.crossJoin(F.broadcast(den)).select(
        "lag", "n", (F.col("num_q") * 1.0 / F.col("den_q")).alias("r")
    )
    terms = rho.select(
        "lag",
        "n",
        "r",
        F.round((F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))) * 1e12)
        .cast("long")
        .alias("tq"),
    )
    wcum = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return terms.select(
        "lag",
        stable_round(F.col("r"), 6).alias("rho"),
        stable_round(
            F.col("n")
            * (F.col("n") + 2.0)
            * (F.sum("tq").over(wcum) / 1e12),
            6,
        ).alias("q_stat"),
    )


@register(
    "q_nelson_aalen",
    oracle="""
WITH f AS (
    SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY user_id
),
p AS (
    SELECT user_id, min(epoch_us(ts)) AS p_us
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
subj AS (
    SELECT f.user_id,
           CASE WHEN p.p_us IS NOT NULL
                     AND (p.p_us - f.first_us) // 3600000000 <= 60
                THEN (p.p_us - f.first_us) // 3600000000 ELSE 60 END AS dur,
           (p.p_us IS NOT NULL AND (p.p_us - f.first_us) // 3600000000 <= 60) AS event
    FROM f LEFT JOIN p ON f.user_id = p.user_id
),
tbl AS (
    SELECT CAST(dur AS BIGINT) AS dur,
           CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c
    FROM subj GROUP BY 1
),
idxd AS (
    SELECT dur, d, c,
           CAST(sum(d + c) OVER () - coalesce(sum(d + c) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
    FROM tbl
),
haz AS (
    SELECT dur, d, c, n_risk,
           CAST(round((d * 1.0 / n_risk) * 10000000000.0) AS BIGINT) AS hq
    FROM idxd
)
SELECT dur AS hours, n_risk, d AS n_events, c AS n_censored,
       (round((hq / 10000000000.0) * 1000000.0) / 1000000.0) AS hazard_step,
       (round((CAST(sum(hq) OVER (ORDER BY dur) AS BIGINT) / 10000000000.0)
              * 1000000.0) / 1000000.0) AS cum_hazard,
       (round(exp(-(CAST(sum(hq) OVER (ORDER BY dur) AS BIGINT)
                    / 10000000000.0)) * 1000000.0) / 1000000.0)
           AS survival_fh
FROM haz
""",
    description=(
        "Nelson-Aalen cumulative hazard of time-to-first-purchase "
        "(same subjects, censoring-at-60h, and duration table as "
        "q_kaplan_meier): H(t) = sum of d/n_risk over event times "
        "<= t, plus the Fleming-Harrington survival exp(-H) — the "
        "additive twin of KM's product, preferred for small risk sets "
        "and as the input to hazard-ratio eyeballing. Unlike KM's "
        "recursive product (which needs the WITH RECURSIVE chain), NA "
        "is a plain cumulative SUM, so the per-time hazard increments "
        "quantize to BIGINT at 1e-10 and one ordered window over the "
        "<=61-row duration table accumulates them exactly — no "
        "recursion, no float-order sensitivity, nothing data-scale "
        "after the two per-user aggregates."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("first_us"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    delay_h = F.floor((F.col("p_us") - F.col("first_us")) / F.lit(3600000000))
    is_event = F.col("p_us").isNotNull() & (delay_h <= 60)
    subj = f.join(p, "user_id", "left").select(
        F.when(is_event, delay_h).otherwise(F.lit(60)).cast("long").alias("dur"),
        is_event.alias("event"),
    )
    tbl = subj.groupBy("dur").agg(
        F.sum(F.when(F.col("event"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("event"), 0).otherwise(1)).cast("long").alias("c"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    idxd = tbl.select(
        "dur",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    haz = idxd.withColumn(
        "hq",
        F.round((F.col("d") * 1.0 / F.col("n_risk")) * 10000000000.0).cast("long"),
    )
    wcum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("hq").over(wcum).cast("long")
    return haz.select(
        F.col("dur").alias("hours"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        stable_round(F.col("hq") / 10000000000.0, 6).alias("hazard_step"),
        stable_round(cum / 10000000000.0, 6).alias("cum_hazard"),
        stable_round(F.exp(-(cum / 10000000000.0)), 6).alias("survival_fh"),
    )


@register(
    "q_ntile_percent_rank",
    oracle="""
WITH ranked AS (
    SELECT c_custkey, c_acctbal,
           CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS decile,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pr
    FROM customer
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       (round(min(c_acctbal) * 1000000.0) / 1000000.0) AS lo_bal,
       (round(max(c_acctbal) * 1000000.0) / 1000000.0) AS hi_bal,
       (round((CAST(sum(CAST(round(pr * 10000000000.0) AS BIGINT)) AS BIGINT)
               / 10000000000.0 / count(*)) * 1000000.0) / 1000000.0)
           AS mean_percent_rank
FROM ranked GROUP BY decile
""",
    description=(
        "Decile banding of customers by account balance: ntile(10) + "
        "percent_rank over a total order (balance, then key — ties "
        "MUST break deterministically or the band edges wander across "
        "engines), rolled up to per-decile count/bounds/mean-rank — "
        "the segmentation primitive behind lift tables, spend bands, "
        "and 'top decile' reporting (q_window_analytics exercises the "
        "same ranking functions row-wise; this adds the banded rollup "
        "consumers actually read). NO single-partition sort: the "
        "global rank is the two-phase bucketed carry (per-cents-bucket "
        "local ranks + broadcast bucket offsets — bucketed_rank), and "
        "ntile/percent_rank are closed-form arithmetic on that rank "
        "(ntile_from_rank is bit-identical to ANSI ntile), so the "
        "plan stays distributed at any scale while the oracle keeps "
        "the textbook window form. percent_rank values are exact rationals, "
        "quantized to BIGINT before the per-decile mean."
    ),
    tags=("analytics", "extension", "window"),
)
def q_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank, ntile_from_rank

    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    # two-phase bucketed global rank (no single-partition sort): the
    # cents bucket lexicographically coarsens (c_acctbal, c_custkey)
    rk = bucketed_rank(
        cust.select("c_acctbal", "c_custkey"),
        buckets=[F.floor(F.col("c_acctbal") * 100 / 4096).cast("long")],
        order_by=[F.asc("c_acctbal"), F.asc("c_custkey")],
        out_col="rk",
    )
    ranked = rk.select(
        "c_acctbal",
        ntile_from_rank(F.col("rk"), F.lit(n).cast("long"), 10).alias("decile"),
        ((F.col("rk") - 1) * 1.0 / F.lit(float(n - 1))).alias("pr"),
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        stable_round(F.min("c_acctbal"), 6).alias("lo_bal"),
        stable_round(F.max("c_acctbal"), 6).alias("hi_bal"),
        stable_round(
            F.sum(F.round(F.col("pr") * 10000000000.0).cast("long")).cast("long")
            / 10000000000.0
            / F.count(F.lit(1)),
            6,
        ).alias("mean_percent_rank"),
    )


@register(
    "q_brown_forsythe",
    oracle="""
WITH v AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
med AS (
    SELECT event_type, quantile_cont(cents, 0.5) AS med FROM v GROUP BY 1
),
z AS (
    SELECT v.event_type, abs(v.cents - m.med) AS z
    FROM v JOIN med m ON m.event_type = v.event_type
),
g AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(CAST(round(z * 2.0) AS BIGINT)) AS BIGINT) AS sh,
           CAST(sum(CAST(round(z * z * 4.0) AS BIGINT)) AS BIGINT) AS sq
    FROM z GROUP BY 1
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(n_g) AS BIGINT) AS n,
           CAST(sum(sh) AS BIGINT) AS sh_tot,
           CAST(sum(CAST(round((sh / 2.0) * (sh / 2.0) / n_g * 10000.0)
                         AS BIGINT)) AS BIGINT) AS s2nq,
           CAST(sum(sq) AS BIGINT) AS sq_tot
    FROM g
)
SELECT k AS n_groups, n AS n_total,
       (round((((s2nq / 10000.0) - (sh_tot / 2.0) * (sh_tot / 2.0) / n)
               / (k - 1.0))
              / (((sq_tot / 4.0) - (s2nq / 10000.0)) / (n - k * 1.0))
              * 1000000.0) / 1000000.0) AS bf_stat
FROM m
""",
    description=(
        "Brown-Forsythe (median-based Levene) test for homogeneity of "
        "variances of event value across event types — the assumption "
        "gate run BEFORE q_anova_f (ANOVA's F is anti-conservative "
        "under unequal variances; BF's median centering keeps the "
        "gate itself robust to the heavy tails that cause the "
        "problem). |x - group median| carries exact half-cent "
        "granularity, so per-element squares are exact doubles; every "
        "cross-row sum (incl. the per-group s^2/n fold) quantizes to BIGINT before "
        "aggregation (sum order can't move a bit), and the F ratio is "
        "one rounded expression of those integers. Two partial-"
        "aggregated passes (medians, then moments); the per-group "
        "sum-of-squares fold rides the k-row group table."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    med = v.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("cents") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.round(F.col("z") * 2.0).cast("long")).cast("long").alias("sh"),
        F.sum(F.round(F.col("z") * F.col("z") * 4.0).cast("long"))
        .cast("long")
        .alias("sq"),
    )
    m = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("sh").cast("long").alias("sh_tot"),
        F.sum(
            F.round((F.col("sh") / 2.0) * (F.col("sh") / 2.0) / F.col("n_g") * 10000.0)
            .cast("long")
        )
        .cast("long")
        .alias("s2nq"),
        F.sum("sq").cast("long").alias("sq_tot"),
    )
    k, n = F.col("k"), F.col("n")
    s2n = F.col("s2nq") / 10000.0
    ssb = (s2n - (F.col("sh_tot") / 2.0) * (F.col("sh_tot") / 2.0) / n) / (k - 1.0)
    ssw = ((F.col("sq_tot") / 4.0) - s2n) / (n - k * 1.0)
    return m.select(
        k.alias("n_groups"),
        n.alias("n_total"),
        stable_round(ssb / ssw, 6).alias("bf_stat"),
    )


@register(
    "q_regression_diagnostics",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
),
idx AS (
    SELECT day, cents,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
    FROM daily
),
mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(i) AS BIGINT) AS sx,
           CAST(sum(i * i) AS BIGINT) AS sxx,
           CAST(sum(cents) AS BIGINT) AS sy,
           CAST(sum(i * cents) AS BIGINT) AS sxy
    FROM idx
),
fit AS (
    SELECT n, sx, sxx, sy, sxy,
           ((n * 1.0 * sxy - sx * 1.0 * sy) / (n * 1.0 * sxx - sx * 1.0 * sx)) AS beta,
           (sxx - sx * 1.0 / n * sx) AS sxx_c
    FROM mom
),
resid AS (
    SELECT x.day, x.i, x.cents, f.n, f.beta, f.sxx_c,
           (x.cents - ((f.sy * 1.0 / f.n - f.beta * f.sx / f.n) + f.beta * x.i))
               AS r,
           (1.0 / f.n + (x.i - f.sx * 1.0 / f.n) * (x.i - f.sx * 1.0 / f.n) / f.sxx_c)
               AS h
    FROM idx x CROSS JOIN fit f
),
mse AS (
    SELECT CAST(sum(CAST(round(r * r * 10000.0) AS BIGINT)) AS BIGINT) AS ssq
    FROM resid
)
SELECT CAST(x.day AS VARCHAR) AS day,
       (round((x.cents / 100.0) * 1000000.0) / 1000000.0) AS revenue,
       (round((x.r / 100.0) * 1000000.0) / 1000000.0) AS residual,
       (round(x.h * 1000000.0) / 1000000.0) AS leverage,
       (round(((x.r * x.r / (2.0 * ((m.ssq / 10000.0) / (x.n - 2))))
               * (x.h / ((1.0 - x.h) * (1.0 - x.h))))
              * 1000000.0) / 1000000.0) AS cooks_d
FROM resid x CROSS JOIN mse m
""",
    description=(
        "OLS influence diagnostics for the daily-revenue trend line: "
        "per-day residual, leverage h_i = 1/n + (x-xbar)^2/Sxx, and "
        "Cook's distance — which days are DRIVING the fitted trend "
        "(quarter-end spikes with high leverage can manufacture a "
        "slope that q_theil_sen would shrug off; Cook's D > 4/n is "
        "the classic referral threshold, and this query is how you "
        "find the days to investigate before trusting any trend "
        "readout). Moments are exact BIGINTs (integer day index x "
        "integer cents); beta/residual/leverage are fixed double "
        "expressions of them; the one cross-row float sum (SSE for "
        "the MSE) quantizes residual squares to BIGINT at 1e-4 "
        "first. Everything after the daily rollup rides the "
        "days-sized series."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_regression_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("cents")
    )
    idx = daily.select(
        "day", "cents", F.row_number().over(Window.orderBy("day")).cast("long").alias("i")
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("i").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "sxy"])
    fit = mom.select(
        "n", "sx", "sy",
        ((n * 1.0 * sxy - sx * 1.0 * sy) / (n * 1.0 * sxx - sx * 1.0 * sx)).alias(
            "beta"
        ),
        (sxx - sx * 1.0 / n * sx).alias("sxx_c"),
    )
    x = idx.crossJoin(F.broadcast(fit))
    r = F.col("cents") - (
        (F.col("sy") * 1.0 / F.col("n") - F.col("beta") * F.col("sx") / F.col("n"))
        + F.col("beta") * F.col("i")
    )
    h = (
        F.lit(1.0) / F.col("n")
        + (F.col("i") - F.col("sx") * 1.0 / F.col("n"))
        * (F.col("i") - F.col("sx") * 1.0 / F.col("n"))
        / F.col("sxx_c")
    )
    resid = x.select(
        "day", "cents", "n", r.alias("r"), h.alias("h")
    )
    mse = resid.agg(
        F.sum(F.round(F.col("r") * F.col("r") * 10000.0).cast("long"))
        .cast("long")
        .alias("ssq")
    )
    out = resid.crossJoin(F.broadcast(mse))
    mse_c = (F.col("ssq") / 10000.0) / (F.col("n") - 2)
    return out.select(
        F.col("day").cast("string").alias("day"),
        stable_round(F.col("cents") / 100.0, 6).alias("revenue"),
        stable_round(F.col("r") / 100.0, 6).alias("residual"),
        stable_round(F.col("h"), 6).alias("leverage"),
        stable_round(
            (F.col("r") * F.col("r") / (2.0 * mse_c))
            * (F.col("h") / ((F.lit(1.0) - F.col("h")) * (F.lit(1.0) - F.col("h")))),
            6,
        ).alias("cooks_d"),
    )


@register(
    "q_simpson_paradox",
    oracle="""
WITH t0 AS (SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS start_us FROM events),
u AS (
    SELECT e.user_id,
           CAST(((min(epoch_us(e.ts)) - t.start_us)
                 // 604800000000) AS BIGINT) AS cohort_week,
           CAST(sum(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN e.event_type = 'purchase'
                THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM events e CROSS JOIN t0 t
    GROUP BY e.user_id, t.start_us
),
strata AS (
    SELECT CAST(cohort_week AS VARCHAR) AS stratum, x, y FROM u
    UNION ALL
    SELECT 'overall', x, y FROM u
),
mom AS (
    SELECT stratum,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
    FROM strata GROUP BY 1
)
SELECT stratum, n,
       (round(((n * 1.0 * sxy - sx * 1.0 * sy)
               / (n * 1.0 * sxx - sx * 1.0 * sx)) * 1000000.0) / 1000000.0)
           AS slope_cents_per_click,
       CASE WHEN (n * 1.0 * sxy - sx * 1.0 * sy) > 0 THEN 'positive'
            WHEN (n * 1.0 * sxy - sx * 1.0 * sy) < 0 THEN 'negative'
            ELSE 'flat' END AS direction
FROM mom
WHERE (n * 1.0 * sxx - sx * 1.0 * sx) <> 0
""",
    description=(
        "Simpson's-paradox screen: the OLS slope of per-user spend on "
        "click count, fit overall AND within each signup-week cohort "
        "stratum — when the overall direction disagrees with (most) "
        "strata, the aggregate relationship is confounded by cohort "
        "mix and any 'clicks drive revenue' readout from the pooled "
        "data is wrong (the aggregation trap q_psm_match and "
        "q_cuped_adjustment exist to avoid). One per-user pass, one "
        "moment aggregate over the doubled (stratum + overall) long "
        "form — all exact BIGINTs, slope is a single rounded "
        "division; the sign comes from the exact integer-valued "
        "numerator so the direction label can never drift."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_simpson_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(F.unix_micros("ts")).cast("long").alias("start_us"))
    u = (
        ev.crossJoin(F.broadcast(t0))
        .groupBy("user_id", "start_us")
        .agg(
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            F.floor(
                (F.col("first_us") - F.col("start_us")) / F.lit(604800000000)
            )
            .cast("long")
            .alias("cohort_week"),
            "x",
            "y",
        )
    )
    strata = u.select(
        F.col("cohort_week").cast("string").alias("stratum"), "x", "y"
    ).unionAll(u.select(F.lit("overall").alias("stratum"), "x", "y"))
    mom = strata.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ["n", "sx", "sy", "sxx", "sxy"])
    num = n * 1.0 * sxy - sx * 1.0 * sy
    den = n * 1.0 * sxx - sx * 1.0 * sx
    return (
        mom.filter(den != 0)
        .select(
            "stratum",
            "n",
            stable_round(num / den, 6).alias("slope_cents_per_click"),
            F.when(num > 0, F.lit("positive"))
            .when(num < 0, F.lit("negative"))
            .otherwise(F.lit("flat"))
            .alias("direction"),
        )
    )


@register(
    "q_durbin_watson",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
),
idx AS (
    SELECT day, cents,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
    FROM daily
),
mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(i) AS BIGINT) AS sx,
           CAST(sum(i * i) AS BIGINT) AS sxx,
           CAST(sum(cents) AS BIGINT) AS sy,
           CAST(sum(i * cents) AS BIGINT) AS sxy
    FROM idx
),
resid AS (
    SELECT x.i,
           (x.cents - ((m.sy * 1.0 / m.n
                        - ((m.n * 1.0 * m.sxy - m.sx * 1.0 * m.sy)
                           / (m.n * 1.0 * m.sxx - m.sx * 1.0 * m.sx))
                          * m.sx / m.n)
                       + ((m.n * 1.0 * m.sxy - m.sx * 1.0 * m.sy)
                          / (m.n * 1.0 * m.sxx - m.sx * 1.0 * m.sx)) * x.i))
               AS r
    FROM idx x CROSS JOIN mom m
),
q AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(r * r * 10000.0) AS BIGINT)) AS BIGINT) AS ssq,
           CAST(coalesce(sum(CAST(round((r - rl) * (r - rl) * 10000.0) AS BIGINT)), 0)
                AS BIGINT) AS sdq
    FROM (SELECT r, lag(r) OVER (ORDER BY i) AS rl FROM resid)
)
SELECT n AS n_days,
       (round((sdq * 1.0 / ssq) * 1000000.0) / 1000000.0) AS dw_stat,
       CASE WHEN sdq * 1.0 / ssq < 1.5 THEN 'positive_autocorr'
            WHEN sdq * 1.0 / ssq > 2.5 THEN 'negative_autocorr'
            ELSE 'no_evidence' END AS verdict
FROM q
""",
    description=(
        "Durbin-Watson test on the daily-revenue OLS trend residuals: "
        "DW = sum((r_t - r_{t-1})^2) / sum(r_t^2) — the serial-"
        "correlation gate that says whether the trend line's standard "
        "errors (and q_regression_diagnostics' Cook's distances) can "
        "be believed, since autocorrelated residuals make OLS "
        "uncertainty wildly optimistic (DW~2 = independent, <1.5 = "
        "positive autocorrelation -> model the seasonality first, see "
        "q_stl_decompose / q_ljung_box which test the raw series; "
        "this tests what's LEFT after the trend). Residuals are fixed "
        "double expressions of exact-BIGINT moments; both quadratic-"
        "form sums quantize to BIGINT at 1e-4 before aggregation, so "
        "no float order exists; everything after the daily rollup "
        "rides the days-sized series."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("cents")
    )
    idx = daily.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("i").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("sxy"),
    )
    x = idx.crossJoin(F.broadcast(mom))
    n, sx, sxx, sy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "sxy"])
    beta = (n * 1.0 * sxy - sx * 1.0 * sy) / (n * 1.0 * sxx - sx * 1.0 * sx)
    r = F.col("cents") - ((sy * 1.0 / n - beta * sx / n) + beta * F.col("i"))
    resid = x.select("i", r.alias("r"))
    lagged = resid.select(
        "r", F.lag("r").over(Window.orderBy("i")).alias("rl")
    )
    q = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("r") * F.col("r") * 10000.0).cast("long"))
        .cast("long")
        .alias("ssq"),
        F.coalesce(
            F.sum(
                F.round(
                    (F.col("r") - F.col("rl")) * (F.col("r") - F.col("rl")) * 10000.0
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sdq"),
    )
    dw = F.col("sdq") * 1.0 / F.col("ssq")
    return q.select(
        F.col("n").alias("n_days"),
        stable_round(dw, 6).alias("dw_stat"),
        F.when(dw < 1.5, F.lit("positive_autocorr"))
        .when(dw > 2.5, F.lit("negative_autocorr"))
        .otherwise(F.lit("no_evidence"))
        .alias("verdict"),
    )


@register(
    "q_capture_recapture",
    oracle="""
WITH t0 AS (SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS start_us FROM events),
marks AS (
    SELECT e.user_id,
           max(CASE WHEN epoch_us(e.ts) <  t.start_us + 1209600000000
                    THEN 1 ELSE 0 END) AS in_s1,
           max(CASE WHEN epoch_us(e.ts) >= t.start_us + 1209600000000
                    THEN 1 ELSE 0 END) AS in_s2
    FROM events e CROSS JOIN t0 t
    GROUP BY e.user_id
),
counts AS (
    SELECT CAST(sum(in_s1) AS BIGINT) AS n1,
           CAST(sum(in_s2) AS BIGINT) AS n2,
           CAST(sum(CASE WHEN in_s1 = 1 AND in_s2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS observed
    FROM marks
)
SELECT n1 AS n_first_period, n2 AS n_second_period, m AS n_both, observed,
       (round(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0) * 1000000.0)
        / 1000000.0) AS chapman_estimate,
       (round(sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m * 1.0) * (n2 - m * 1.0)
                   / ((m + 1.0) * (m + 1.0) * (m + 2.0))) * 1000000.0)
        / 1000000.0) AS std_error
FROM counts
""",
    description=(
        "Chapman capture-recapture estimate of the TOTAL user "
        "population from two observation windows (first vs second "
        "fortnight from corpus start): users seen in each period are "
        "a 'capture', the overlap is the 'recapture', and N-hat = "
        "(n1+1)(n2+1)/(m+1) - 1 estimates how many users exist "
        "INCLUDING the never-observed — the ecology estimator data "
        "teams reuse to size true dedup-cluster populations, total "
        "crawlable documents, or market reach from partial logs, "
        "where 'distinct users observed' (q_count_distinct) is only "
        "a floor. One per-user flag aggregate; the estimate and its "
        "hypergeometric standard error are single rounded "
        "expressions of four exact BIGINTs."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(F.unix_micros("ts")).cast("long").alias("start_us"))
    cut = F.col("start_us") + F.lit(1209600000000)
    marks = (
        ev.crossJoin(F.broadcast(t0))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.unix_micros("ts") < cut, 1).otherwise(0)).alias("in_s1"),
            F.max(F.when(F.unix_micros("ts") >= cut, 1).otherwise(0)).alias("in_s2"),
        )
    )
    counts = marks.agg(
        F.sum("in_s1").cast("long").alias("n1"),
        F.sum("in_s2").cast("long").alias("n2"),
        F.sum(F.when((F.col("in_s1") == 1) & (F.col("in_s2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("m"),
        F.count(F.lit(1)).cast("long").alias("observed"),
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    nhat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    se = F.sqrt(
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - m * 1.0)
        * (n2 - m * 1.0)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    return counts.select(
        n1.alias("n_first_period"),
        n2.alias("n_second_period"),
        m.alias("n_both"),
        "observed",
        stable_round(nhat, 6).alias("chapman_estimate"),
        stable_round(se, 6).alias("std_error"),
    )


@register(
    "q_partial_corr",
    oracle="""
WITH u AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS z,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM events GROUP BY user_id
),
mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(z) AS BIGINT) AS sz,
           CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
           CAST(sum(z * z) AS BIGINT) AS szz,
           CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * z) AS BIGINT) AS sxz,
           CAST(sum(y * z) AS BIGINT) AS syz
    FROM u
),
r AS (
    SELECT n,
           ((n * 1.0 * sxy - sx * 1.0 * sy)
            / sqrt((n * 1.0 * sxx - sx * 1.0 * sx) * (n * 1.0 * syy - sy * 1.0 * sy))) AS rxy,
           ((n * 1.0 * sxz - sx * 1.0 * sz)
            / sqrt((n * 1.0 * sxx - sx * 1.0 * sx) * (n * 1.0 * szz - sz * 1.0 * sz))) AS rxz,
           ((n * 1.0 * syz - sy * 1.0 * sz)
            / sqrt((n * 1.0 * syy - sy * 1.0 * sy) * (n * 1.0 * szz - sz * 1.0 * sz))) AS ryz
    FROM mom
)
SELECT n AS n_users,
       (round(rxy * 1000000.0) / 1000000.0) AS corr_clicks_spend,
       (round(rxz * 1000000.0) / 1000000.0) AS corr_clicks_views,
       (round(ryz * 1000000.0) / 1000000.0) AS corr_views_spend,
       (round(((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)))
              * 1000000.0) / 1000000.0) AS partial_corr_given_views
FROM r
""",
    description=(
        "Partial correlation of clicks and spend CONTROLLING for view "
        "volume: r_xy.z = (r_xy - r_xz r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)) "
        "— the one-number answer to 'do clicks relate to spend beyond "
        "both just tracking overall activity?', the correlation-world "
        "sibling of q_simpson_paradox's stratified slopes and the "
        "cheapest confounder screen before reaching for q_psm_match. "
        "All three pairwise correlations come from ONE partial-"
        "aggregated 10-sum exact-BIGINT moment pass; the partial "
        "coefficient is a fixed double expression of those moments, "
        "so nothing floats across rows anywhere."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("z"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    mom = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("syz"),
    )
    n = F.col("n")
    sx, sy, sz = F.col("sx"), F.col("sy"), F.col("sz")
    sxx, syy, szz = F.col("sxx"), F.col("syy"), F.col("szz")
    sxy, sxz, syz = F.col("sxy"), F.col("sxz"), F.col("syz")
    rxy = (n * 1.0 * sxy - sx * 1.0 * sy) / F.sqrt(
        (n * 1.0 * sxx - sx * 1.0 * sx) * (n * 1.0 * syy - sy * 1.0 * sy)
    )
    rxz = (n * 1.0 * sxz - sx * 1.0 * sz) / F.sqrt(
        (n * 1.0 * sxx - sx * 1.0 * sx) * (n * 1.0 * szz - sz * 1.0 * sz)
    )
    ryz = (n * 1.0 * syz - sy * 1.0 * sz) / F.sqrt(
        (n * 1.0 * syy - sy * 1.0 * sy) * (n * 1.0 * szz - sz * 1.0 * sz)
    )
    partial = (rxy - rxz * ryz) / F.sqrt(
        (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
    )
    return mom.select(
        n.alias("n_users"),
        stable_round(rxy, 6).alias("corr_clicks_spend"),
        stable_round(rxz, 6).alias("corr_clicks_views"),
        stable_round(ryz, 6).alias("corr_views_spend"),
        stable_round(partial, 6).alias("partial_corr_given_views"),
    )


@register(
    "q_jackknife_se",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
    FROM daily
),
terms AS (
    SELECT d.cents, m.n, m.s,
           CAST(round(((m.s - m.n * 1.0 * d.cents) / 10000.0)
                      * ((m.s - m.n * 1.0 * d.cents) / 10000.0)) AS BIGINT) AS tq
    FROM daily d CROSS JOIN m
),
q AS (
    SELECT n, s, CAST(sum(tq) AS BIGINT) AS sumq FROM terms GROUP BY n, s
)
SELECT n AS n_days,
       (round((s * 1.0 / n / 100.0) * 1000000.0) / 1000000.0) AS mean_daily_revenue,
       (round((sqrt(((n - 1.0) / n) * sumq * 100000000.0)
               / (n * 1.0 * (n - 1)) / 100.0) * 1000000.0) / 1000000.0)
           AS jackknife_se
FROM q
""",
    description=(
        "Delete-one-day jackknife standard error for mean daily "
        "revenue: each replicate drops one day, and the classic "
        "identity theta_i - theta_bar = (S - n*x_i)/(n(n-1)) turns "
        "the whole estimator into integer arithmetic — no RNG, no "
        "resample draws, which is the jackknife's advantage over "
        "q_bootstrap_ci when determinism or a closed audit trail "
        "matters (and its limitation: linear-statistic variances "
        "only). Per-replicate squared deviations are computed at "
        "1e-4-cent scale and quantized to BIGINT before the sum "
        "(raw squares exceed double's 2^53 exact-integer range), so "
        "the SE is a single rounded expression of exact integers; "
        "everything after the daily rollup rides the days-sized "
        "series."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("cents")
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    t = daily.crossJoin(F.broadcast(m))
    dev = (F.col("s") - F.col("n") * 1.0 * F.col("cents")) / 10000.0
    terms = t.select(
        "n", "s", F.round(dev * dev).cast("long").alias("tq")
    )
    q = terms.groupBy("n", "s").agg(F.sum("tq").cast("long").alias("sumq"))
    n, s, sumq = F.col("n"), F.col("s"), F.col("sumq")
    se = (
        F.sqrt(((n - 1.0) / n) * sumq * 100000000.0)
        / (n * 1.0 * (n - 1))
        / 100.0
    )
    return q.select(
        n.alias("n_days"),
        stable_round(s * 1.0 / n / 100.0, 6).alias("mean_daily_revenue"),
        stable_round(se, 6).alias("jackknife_se"),
    )


@register(
    "q_mann_kendall",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
),
pairs AS (
    SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                         WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM daily a JOIN daily b ON a.day < b.day
),
ties AS (
    SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
    FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY cents)
    WHERE t > 1
),
n_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
SELECT n.n AS n_days, p.s AS s_statistic,
       (round(((n.n * (n.n - 1.0) * (2.0 * n.n + 5.0) - t.tie_term) / 18.0)
              * 1000000.0) / 1000000.0) AS variance,
       (round((CASE WHEN p.s > 0 THEN (p.s - 1.0)
                    WHEN p.s < 0 THEN (p.s + 1.0) ELSE 0.0 END
               / sqrt((n.n * (n.n - 1.0) * (2.0 * n.n + 5.0) - t.tie_term) / 18.0))
              * 1000000.0) / 1000000.0) AS z_score,
       CASE WHEN p.s > 0 THEN 'increasing'
            WHEN p.s < 0 THEN 'decreasing' ELSE 'no_trend' END AS direction
FROM pairs p CROSS JOIN ties t CROSS JOIN n_tot n
""",
    description=(
        "Mann-Kendall monotonic-trend test on daily revenue: S = sum "
        "of pairwise signs with the tie-corrected variance "
        "n(n-1)(2n+5)/18 and continuity-corrected z — the "
        "nonparametric significance verdict that pairs with "
        "q_theil_sen's slope estimate (Sen tells you HOW steep, MK "
        "tells you whether a monotone trend exists at all, immune to "
        "the spike days that fool an OLS-slope t-test). S and the tie "
        "term are exact BIGINTs; the O(days^2) sign pairs ride the "
        "days-sized aggregate (metadata at any corpus size); z is one "
        "rounded expression."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("cents")
    )
    a = daily.select(F.col("day").alias("da"), F.col("cents").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("cents").alias("xb"))
    pairs = a.join(F.broadcast(b), F.col("da") < F.col("db")).agg(
        F.sum(
            F.when(F.col("xb") > F.col("xa"), 1)
            .when(F.col("xb") < F.col("xa"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n_tot = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = pairs.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(n_tot))
    n, s, tt = F.col("n"), F.col("s"), F.col("tie_term")
    var = (n * (n - 1.0) * (2.0 * n + 5.0) - tt) / 18.0
    z = (
        F.when(s > 0, s - 1.0).when(s < 0, s + 1.0).otherwise(F.lit(0.0))
    ) / F.sqrt(var)
    return out.select(
        n.alias("n_days"),
        s.alias("s_statistic"),
        stable_round(var, 6).alias("variance"),
        stable_round(z, 6).alias("z_score"),
        F.when(s > 0, F.lit("increasing"))
        .when(s < 0, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("direction"),
    )


@register(
    "q_survival_rmst",
    oracle="""
WITH RECURSIVE f AS (
    SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY user_id
),
p AS (
    SELECT user_id, min(epoch_us(ts)) AS p_us
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
subj AS (
    SELECT f.user_id,
           CASE WHEN p.p_us IS NOT NULL
                     AND (p.p_us - f.first_us) // 3600000000 <= 60
                THEN (p.p_us - f.first_us) // 3600000000 ELSE 60 END AS dur,
           (p.p_us IS NOT NULL AND (p.p_us - f.first_us) // 3600000000 <= 60) AS event
    FROM f LEFT JOIN p ON f.user_id = p.user_id
),
tbl AS (
    SELECT CAST(dur AS BIGINT) AS dur,
           CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS c
    FROM subj GROUP BY 1
),
idxd AS (
    SELECT dur, d, c,
           CAST(row_number() OVER (ORDER BY dur) AS BIGINT) AS idx,
           CAST(sum(d + c) OVER () - coalesce(sum(d + c) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
    FROM tbl
),
km AS (
    SELECT idx, dur, n_risk,
           (round((1.0 - d * 1.0 / n_risk) * 1000000.0) / 1000000.0) AS s
    FROM idxd WHERE idx = 1
    UNION ALL
    SELECT i.idx, i.dur, i.n_risk,
           (round((k.s * (1.0 - i.d * 1.0 / i.n_risk)) * 1000000.0) / 1000000.0)
    FROM km k JOIN idxd i ON i.idx = k.idx + 1
),
seg AS (
    SELECT s, (coalesce(lead(dur) OVER (ORDER BY dur), 60) - dur) AS gap
    FROM km
),
first_seg AS (SELECT CAST(min(dur) AS BIGINT) AS d0 FROM km),
q AS (
    SELECT CAST(sum(CAST(round(s * gap * 1000000.0) AS BIGINT)) AS BIGINT) AS sq
    FROM seg
)
SELECT CAST(60 AS BIGINT) AS horizon_hours,
       (round(((f.d0 * 1000000 + q.sq) / 1000000.0) * 1000000.0) / 1000000.0)
           AS rmst_hours,
       (round((1.0 - (f.d0 * 1000000 + q.sq) / 1000000.0 / 60.0) * 1000000.0)
        / 1000000.0) AS mean_fraction_converted_weighted
FROM q CROSS JOIN first_seg f
""",
    description=(
        "Restricted mean survival time to the 60 h horizon: the area "
        "under q_kaplan_meier's step curve — 'the average user spends "
        "RMST hours un-converted in their first 60 h', the "
        "interpretable single number clinicians and growth teams "
        "quote when median time-to-event is undefined (here survival "
        "never crosses 0.5). Step segments are S(t_i) x gap with "
        "S=1 before the first event time; each segment quantizes to "
        "BIGINT at 1e-6 before summing, the KM chain itself is the "
        "same per-step-rounded recursion the KM query value-checks, "
        "and every window rides the <=61-row duration table."
    ),
    tags=("analytics", "extension", "stats", "recursive"),
)
def q_survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("first_us"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    delay_h = F.floor((F.col("p_us") - F.col("first_us")) / F.lit(3600000000))
    is_event = F.col("p_us").isNotNull() & (delay_h <= 60)
    subj = f.join(p, "user_id", "left").select(
        F.when(is_event, delay_h).otherwise(F.lit(60)).cast("long").alias("dur"),
        is_event.alias("event"),
    )
    km = kaplan_meier_curve(subj).select(
        F.col("hours").alias("dur"), F.col("survival").alias("s")
    )
    wl = Window.orderBy("dur")
    seg = km.select(
        "s",
        (F.coalesce(F.lead("dur").over(wl), F.lit(60)) - F.col("dur")).alias("gap"),
    )
    q = seg.agg(
        F.sum(F.round(F.col("s") * F.col("gap") * 1000000.0).cast("long"))
        .cast("long")
        .alias("sq")
    )
    first_seg = km.agg(F.min("dur").cast("long").alias("d0"))
    out = q.crossJoin(F.broadcast(first_seg))
    rmst = (F.col("d0") * 1000000 + F.col("sq")) / 1000000.0
    return out.select(
        F.lit(60).cast("long").alias("horizon_hours"),
        stable_round(rmst, 6).alias("rmst_hours"),
        stable_round(F.lit(1.0) - rmst / 60.0, 6).alias(
            "mean_fraction_converted_weighted"
        ),
    )


@register(
    "q_seasonality_strength",
    oracle="""
WITH daily AS (
    SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
tr AS (
    SELECT day, cents,
           CASE WHEN count(*) OVER w = 7
                THEN (round((avg(cents * 1.0) OVER w) * 1000000.0) / 1000000.0)
           END AS trend
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
    SELECT CAST(dayofweek(day) AS BIGINT) AS wd,
           (round(avg(cents - trend) * 1000000.0) / 1000000.0) AS seasonal
    FROM tr WHERE trend IS NOT NULL
    GROUP BY 1
),
parts AS (
    SELECT t.cents, t.trend, s.seasonal,
           (t.cents - t.trend - s.seasonal) AS resid,
           (t.cents - s.seasonal) AS deseason
    FROM tr t JOIN seas s ON s.wd = CAST(dayofweek(t.day) AS BIGINT)
    WHERE t.trend IS NOT NULL
),
mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(resid) AS BIGINT)) AS BIGINT) AS sr,
           CAST(sum(CAST(round(resid * resid / 10000.0) AS BIGINT)) AS BIGINT) AS srr,
           CAST(sum(CAST(round(seasonal + resid) AS BIGINT)) AS BIGINT) AS ss,
           CAST(sum(CAST(round((seasonal + resid) * (seasonal + resid) / 10000.0)
                         AS BIGINT)) AS BIGINT) AS sss,
           CAST(sum(CAST(round(deseason) AS BIGINT)) AS BIGINT) AS sd,
           CAST(sum(CAST(round(deseason * deseason / 10000.0) AS BIGINT)) AS BIGINT)
               AS sdd
    FROM parts
)
SELECT n AS n_days,
       (round(greatest(0.0, 1.0 - ((srr / n * 1.0 - (sr * 1.0 / n) * (sr * 1.0 / n)
                                     / 10000.0))
                             / ((sss / n * 1.0 - (ss * 1.0 / n) * (ss * 1.0 / n)
                                 / 10000.0))) * 1000000.0) / 1000000.0)
           AS seasonality_strength,
       (round(greatest(0.0, 1.0 - ((srr / n * 1.0 - (sr * 1.0 / n) * (sr * 1.0 / n)
                                     / 10000.0))
                             / ((sdd / n * 1.0 - (sd * 1.0 / n) * (sd * 1.0 / n)
                                 / 10000.0))) * 1000000.0) / 1000000.0)
           AS trend_strength
FROM mom
""",
    description=(
        "Hyndman-style seasonality and trend STRENGTH from the STL "
        "parts (q_stl_decompose's trend/seasonal/residual): F_s = "
        "max(0, 1 - Var(resid)/Var(seasonal+resid)) and F_t likewise "
        "against the deseasonalized series — the 0-to-1 scores that "
        "rank thousands of series by 'how seasonal / how trended' "
        "before anyone picks a model per series (feature-izing "
        "decomposition is how forecast fleets triage). All cross-row "
        "sums are BIGINT-quantized (values at cent scale, squares at "
        "1e-4 cent^2) so the variances are exact-integer moment "
        "arithmetic; the one data-scale pass is the daily rollup."
    ),
    tags=("analytics", "extension", "timeseries", "stats"),
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "cents",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            stable_round(F.avg(F.col("cents") * F.lit(1.0)).over(w), 6),
        ).alias("trend"),
    )
    seas = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy(F.dayofweek("day").cast("long").alias("wd"))
        .agg(stable_round(F.avg(F.col("cents") - F.col("trend")), 6).alias("seasonal"))
    )
    parts = (
        tr.filter(F.col("trend").isNotNull())
        .withColumn("wd", F.dayofweek("day").cast("long"))
        .join(F.broadcast(seas), "wd")
        .select(
            (F.col("cents") - F.col("trend") - F.col("seasonal")).alias("resid"),
            (F.col("cents") - F.col("seasonal")).alias("deseason"),
            "seasonal",
        )
    )
    resid = F.col("resid")
    sr_part = F.col("seasonal") + resid
    deseason = F.col("deseason")
    mom = parts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(resid).cast("long")).cast("long").alias("sr"),
        F.sum(F.round(resid * resid / 10000.0).cast("long")).cast("long").alias("srr"),
        F.sum(F.round(sr_part).cast("long")).cast("long").alias("ss"),
        F.sum(F.round(sr_part * sr_part / 10000.0).cast("long"))
        .cast("long")
        .alias("sss"),
        F.sum(F.round(deseason).cast("long")).cast("long").alias("sd"),
        F.sum(F.round(deseason * deseason / 10000.0).cast("long"))
        .cast("long")
        .alias("sdd"),
    )
    n = F.col("n")

    def var_of(sq, s1):
        return sq / n * 1.0 - (s1 * 1.0 / n) * (s1 * 1.0 / n) / 10000.0

    vr = var_of(F.col("srr"), F.col("sr"))
    vs = var_of(F.col("sss"), F.col("ss"))
    vd = var_of(F.col("sdd"), F.col("sd"))
    return mom.select(
        n.alias("n_days"),
        stable_round(F.greatest(F.lit(0.0), F.lit(1.0) - vr / vs), 6).alias(
            "seasonality_strength"
        ),
        stable_round(F.greatest(F.lit(0.0), F.lit(1.0) - vr / vd), 6).alias(
            "trend_strength"
        ),
    )


@register(
    "q_pareto_skyline",
    oracle="""
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice
      AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p.p_retailprice
""",
    description=(
        "Skyline (Pareto frontier) over parts: cheaper-is-better price "
        "vs bigger-is-better size — the classic dominance operator "
        "relational engines bolt on (Borzsony et al. 2001), returning "
        "every part no other part dominates on BOTH axes. Oracle keeps "
        "the textbook NOT EXISTS; the Spark plan is the scale form: a "
        "sort-free two-pass prune — the running best-size-so-far in "
        "price order (a bucketed carry over the DISTINCT-price table, "
        "never a partitionless row window) kills everything strictly "
        "dominated, then exact dominance is checked only among "
        "survivors (the frontier, typically miniscule vs the input) "
        "via a broadcast self-join. At 100x: frontier size grows "
        "~log-linearly for independent dims, so the quadratic step "
        "stays broadcast-sized; the documented fallback for adversarial "
        "(anti-correlated) data is grid-partitioned skylines merged "
        "hierarchically."
    ),
    tags=("analytics", "extension", "extra-relational"),
)
def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_prefix

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("long").alias("p_size")
    )
    # Phase 1: prune everything strictly below the best size seen at a
    # strictly lower price (cheap dominance filter, removes the bulk).
    grp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("best_sz"))
    carried = bucketed_prefix(
        grp,
        buckets=[F.expr("CAST(p_retailprice AS BIGINT) div 64")],
        order_by=[F.asc("p_retailprice")],
        value=F.col("best_sz"),
        agg="max",
        exclusive=True,
        out_col="best_before",
    )
    pruned = (
        p.join(F.broadcast(carried.select("p_retailprice", "best_before")), "p_retailprice")
        .filter(F.col("best_before").isNull() | (F.col("p_size") >= F.col("best_before")))
        .select("p_partkey", "p_retailprice", "p_size")
    )
    # Phase 2: exact dominance among the surviving near-frontier rows.
    cand = pruned.select(
        F.col("p_partkey").alias("qk"),
        F.col("p_retailprice").alias("qp"),
        F.col("p_size").alias("qs"),
    )
    dominated = (
        pruned.join(
            F.broadcast(cand),
            (F.col("qp") <= F.col("p_retailprice"))
            & (F.col("qs") >= F.col("p_size"))
            & ((F.col("qp") < F.col("p_retailprice")) | (F.col("qs") > F.col("p_size"))),
            "left_semi",
        )
    )
    return pruned.exceptAll(dominated).orderBy("p_retailprice")


@register(
    "q_spc_control_chart",
    oracle="""
WITH daily AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(round(sum(value) * 100.0) AS BIGINT) AS xc
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
wk AS (
    SELECT CAST(floor((epoch(day) / 86400 + 4) / 7) AS BIGINT) AS week,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(xc) AS BIGINT) AS s1,
           CAST(max(xc) - min(xc) AS BIGINT) AS rng
    FROM daily GROUP BY 1
),
full_wk AS (SELECT * FROM wk WHERE n = 7),
lim AS (
    SELECT CAST(count(*) AS BIGINT) AS n_weeks,
           (sum(s1) * 1.0 / sum(n) / 100.0) AS xbar,
           (sum(rng) * 1.0 / count(*) / 100.0) AS rbar
    FROM full_wk
)
SELECT w.week,
       (round((w.s1 * 1.0 / w.n / 100.0) * 1000000.0) / 1000000.0) AS week_mean,
       (round((w.rng / 100.0) * 1000000.0) / 1000000.0) AS week_range,
       (round((l.xbar + 0.419 * l.rbar) * 1000000.0) / 1000000.0) AS ucl,
       (round((l.xbar - 0.419 * l.rbar) * 1000000.0) / 1000000.0) AS lcl,
       (w.s1 * 1.0 / w.n / 100.0 > l.xbar + 0.419 * l.rbar
        OR w.s1 * 1.0 / w.n / 100.0 < l.xbar - 0.419 * l.rbar) AS out_of_control
FROM full_wk w CROSS JOIN lim l
ORDER BY w.week
""",
    description=(
        "Statistical process control: X-bar/R chart of daily purchase "
        "revenue in weekly subgroups (ISO-aligned epoch weeks, "
        "complete weeks only) — centerline = grand mean, control "
        "limits xbar +/- A2*Rbar with the standard n=7 constant "
        "A2=0.419, flagging Western-Electric rule-1 violations. The "
        "manufacturing-style complement to q_cusum_changepoint / "
        "q_page_hinkley: those detect a persistent shift as fast as "
        "possible, the control chart certifies week-grain stability "
        "with distribution-free limits. All moments fold as integer "
        "cents (subgroup range = max - min commutes with cents), so "
        "both engines emit identical limits; day/week tables are "
        "horizon-bounded."
    ),
    tags=("analytics", "extension", "timeseries", "quality"),
)
def q_spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value") * 100.0).cast("long").alias("xc"))
    )
    wk = (
        daily.select(
            F.floor((F.unix_date(F.col("day").cast("date")) + 4) / 7)
            .cast("long")
            .alias("week"),
            "xc",
        )
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xc").cast("long").alias("s1"),
            (F.max("xc") - F.min("xc")).cast("long").alias("rng"),
        )
        .filter(F.col("n") == 7)
    )
    lim = wk.agg(
        (F.sum("s1") * 1.0 / F.sum("n") / 100.0).alias("xbar"),
        (F.sum("rng") * 1.0 / F.count(F.lit(1)) / 100.0).alias("rbar"),
    )
    w = wk.crossJoin(F.broadcast(lim))
    mean = F.col("s1") * 1.0 / F.col("n") / 100.0
    ucl = F.col("xbar") + 0.419 * F.col("rbar")
    lcl = F.col("xbar") - 0.419 * F.col("rbar")
    return w.select(
        "week",
        stable_round(mean, 6).alias("week_mean"),
        stable_round(F.col("rng") / 100.0, 6).alias("week_range"),
        stable_round(ucl, 6).alias("ucl"),
        stable_round(lcl, 6).alias("lcl"),
        ((mean > ucl) | (mean < lcl)).alias("out_of_control"),
    ).orderBy("week")


@register(
    "q_srm_check",
    oracle="""
WITH u AS (
    SELECT user_id, (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0) AS in_a
    FROM events GROUP BY user_id, 2
),
m AS (
    SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
    FROM u
)
SELECT n_a, n_b,
       (round(((n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b)) * 1000000.0)
        / 1000000.0) AS chi2,
       ((n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b) > 3.841458820694124)
           AS srm_flag
FROM m
""",
    description=(
        "Sample-ratio mismatch (SRM) check for the deterministic A/B "
        "split: chi-square goodness-of-fit of the observed arm counts "
        "against the designed 50/50 allocation (chi2 = (n_a-n_b)^2/n "
        "for two equal cells), flagged at the 95% critical value "
        "3.8415 — the FIRST gate every experimentation platform runs "
        "before any effect readout, since a mismatched ratio "
        "invalidates q_ab_test_ztest/q_cuped/q_mann_whitney "
        "downstream no matter how significant they look. One per-user "
        "distinct pass and a 2-cell aggregate; exact integer counts, "
        "one final float division."
    ),
    tags=("analytics", "extension", "stats", "governance"),
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.plans.queries_stats2 import _arm_a

    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id", _arm_a().alias("in_a")).distinct()
    m = u.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("n_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    chi2 = (na - nb) * (na - nb) * 1.0 / (na + nb)
    return m.select(
        na,
        nb,
        stable_round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(3.841458820694124)).alias("srm_flag"),
    )


def _hw_step_sql() -> str:
    """Generated recursive step for additive Holt-Winters (period 7,
    alpha=0.4 beta=0.2 gamma=0.3): every update re-rounds to 4dp and the
    just-updated level expression is inlined wherever the classic
    formulation references it, identically on both engines (the same
    inline-the-rounded-expression discipline as q_holt_smoothing)."""
    r4 = lambda e: f"(round(({e}) * 10000.0) / 10000.0)"  # noqa: E731
    jj = "(CAST((d.idx - 1) % 7 AS BIGINT) + 1)"
    jn = "(CAST(d.idx % 7 AS BIGINT) + 1)"
    s_cur = "CASE " + " ".join(
        f"WHEN {jj} = {j} THEN h.s{j}" for j in range(1, 8)
    ) + " END"
    lnew = r4(f"0.4 * (d.x - ({s_cur})) + 0.6 * (h.l + h.b)")
    bnew = r4(f"0.2 * (({lnew}) - h.l) + 0.8 * h.b")
    s_cols = ",\n           ".join(
        f"CASE WHEN {jj} = {j} THEN "
        + r4(f"0.3 * (d.x - ({lnew})) + 0.7 * h.s{j}")
        + f" ELSE h.s{j} END"
        for j in range(1, 8)
    )
    s_next = "CASE " + " ".join(
        f"WHEN {jn} = {j} THEN h.s{j}" for j in range(1, 8)
    ) + " END"
    fc = r4(f"({lnew}) + ({bnew}) + ({s_next})")
    season = r4(f"0.3 * (d.x - ({lnew})) + 0.7 * ({s_cur})")
    return f"""    SELECT d.idx, d.day, d.x,
           {lnew},
           {bnew},
           {s_cols},
           {season},
           {fc}
"""


def _hw_init_sql() -> str:
    r4 = lambda e: f"(round(({e}) * 10000.0) / 10000.0)"  # noqa: E731
    s_init = ",\n           ".join(
        r4(f"(SELECT x FROM idxd WHERE idx = {j})"
           f" - (SELECT avg(x) FROM idxd WHERE idx <= 7)")
        + f" AS s{j}"
        for j in range(1, 8)
    )
    return f"""    SELECT CAST(7 AS BIGINT) AS idx,
           CAST(NULL AS TIMESTAMP) AS day, CAST(NULL AS DOUBLE) AS x,
           {r4('(SELECT avg(x) FROM idxd WHERE idx <= 7)')} AS l,
           {r4('((SELECT avg(x) FROM idxd WHERE idx BETWEEN 8 AND 14)'
               ' - (SELECT avg(x) FROM idxd WHERE idx <= 7)) / 7.0')} AS b,
           {s_init},
           CAST(NULL AS DOUBLE) AS season, CAST(NULL AS DOUBLE) AS fc
"""


_HW_RECURSION = f"""hw AS (
{_hw_init_sql()}
    UNION ALL
{_hw_step_sql()}
    FROM hw h JOIN idxd d ON d.idx = h.idx + 1
)"""


@register(
    "q_holt_winters",
    oracle=f"""
WITH RECURSIVE raw AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           (round(sum(value) * 10000.0) / 10000.0) AS x
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
idxd AS (
    SELECT day, x,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
    FROM raw
),
{_HW_RECURSION}
SELECT strftime(day, '%Y-%m-%d') AS day, x AS revenue, l AS level, b AS trend,
       season AS seasonal, fc AS forecast_next
FROM hw WHERE idx >= 8
""",
    description=(
        "Additive Holt-Winters triple exponential smoothing of daily "
        "revenue with weekly (period-7) seasonality (alpha=0.4, "
        "beta=0.2, gamma=0.3): level/trend initialized from the first "
        "two weeks' means, seasonal indices from week-1 deviations, "
        "then the classic three coupled updates per day — the "
        "seasonal completion of the smoothing family (EWMA -> Holt -> "
        "HW), i.e. the model that stops flagging every weekend dip as "
        "an anomaly. The 7 seasonal slots ride the recursion as 7 "
        "columns updated by weekday CASE (no arrays, so the same "
        "WITH RECURSIVE runs verbatim on both engines); the rounded "
        "new-level expression is inlined into the trend/seasonal/"
        "forecast updates exactly as written in the oracle, and every "
        "state re-rounds to 4dp per step, so the chains cannot "
        "diverge. Recursion depth = days; data-sized work is the one "
        "daily aggregate."
    ),
    tags=("analytics", "extension", "timeseries", "recursive"),
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg((F.round(F.sum("value") * 10000.0) / 10000.0).alias("x"))
    )
    idxd = raw.select(
        "day", "x", F.row_number().over(Window.orderBy("day")).cast("long").alias("idx")
    )
    idxd.createOrReplaceTempView("v_hw_daily")
    return spark.sql(
        f"""
WITH RECURSIVE idxd AS (SELECT * FROM v_hw_daily),
{_HW_RECURSION}
SELECT date_format(day, 'yyyy-MM-dd') AS day, x AS revenue, l AS level,
       b AS trend, season AS seasonal, fc AS forecast_next
FROM hw WHERE idx >= 8
"""
    )


@register(
    "q_price_elasticity",
    oracle="""
WITH pts AS (
    SELECT CAST(round(ln(l_extendedprice) * 1000000.0) AS BIGINT) AS x,
           CAST(round(ln(l_quantity) * 1000000.0) AS BIGINT) AS y
    FROM lineitem WHERE l_extendedprice > 0 AND l_quantity > 0
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM pts
),
fit AS (
    SELECT n, sx, sy,
           (round((CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                   / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                  * 1000000.0) / 1000000.0) AS slope,
           (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)) AS numd,
           (CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) AS dend,
           (CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) AS tssd
    FROM m
)
SELECT n AS n_lines,
       slope AS elasticity,
       (round(((sy - slope * sx) / (n * 1000000.0)) * 1000000.0) / 1000000.0)
           AS intercept_ln_qty,
       (round(((numd * numd) / (dend * tssd)) * 1000000.0) / 1000000.0) AS r2
FROM fit
""",
    description=(
        "Price elasticity of demand: log-log OLS of quantity on price "
        "over lineitems (elasticity = d ln(qty) / d ln(price)) with "
        "the fit's r^2 — the canonical retail-economics regression, "
        "and the log-transformed member of the OLS family "
        "(q_grouped_ols / q_regression_diagnostics fit raw scales). "
        "Determinism contract for the float logs: each per-row ln is "
        "quantized to a 1e-6-unit BIGINT at the scan, so every moment "
        "(including the cross products, folded as DECIMAL(38)/"
        "HUGEINT — BIGINT would overflow at ~1e19 with 1e13-unit "
        "sums) is EXACT integer arithmetic; floats reappear only in "
        "the final three divisions, and the intercept reuses the "
        "already-rounded slope so both engines compose identically. "
        "One scan, one 6-moment partial-aggregated fold."
    ),
    tags=("analytics", "extension", "stats", "tpch"),
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_extendedprice") > 0) & (F.col("l_quantity") > 0)
    )
    pts = li.select(
        F.round(F.log("l_extendedprice") * 1000000.0).cast("long").alias("x"),
        F.round(F.log("l_quantity") * 1000000.0).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    )
    n = F.col("n")
    nd = n.cast(dec)
    numd = (nd * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)).cast(
        "double"
    )
    dend = (nd * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)).cast(
        "double"
    )
    tssd = (nd * F.col("syy") - F.col("sy").cast(dec) * F.col("sy").cast(dec)).cast(
        "double"
    )
    slope = stable_round(numd / dend, 6)
    return m.select(
        n.alias("n_lines"),
        slope.alias("elasticity"),
        stable_round(
            (F.col("sy") - slope * F.col("sx")) / (n * 1000000.0), 6
        ).alias("intercept_ln_qty"),
        stable_round((numd * numd) / (dend * tssd), 6).alias("r2"),
    )


@register(
    "q_pruning_stats",
    oracle="""
WITH files AS (
    SELECT event_id // 4096 AS file_id,
           min(ts) AS mn, max(ts) AS mx,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events GROUP BY 1
),
pred AS (
    SELECT TIMESTAMP '2024-01-08 00:00:00' AS lo,
           TIMESTAMP '2024-01-15 00:00:00' AS hi
),
j AS (
    SELECT f.file_id, f.n_rows,
           (f.mx < p.lo OR f.mn >= p.hi) AS prunable,
           CAST(epoch_us(f.mx) - epoch_us(f.mn) AS BIGINT) AS span_us
    FROM files f CROSS JOIN pred p
)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN prunable THEN 1 ELSE 0 END) AS BIGINT) AS n_prunable,
       (round((sum(CASE WHEN prunable THEN 1 ELSE 0 END) * 1.0 / count(*))
              * 1000000.0) / 1000000.0) AS prune_ratio,
       CAST(sum(CASE WHEN prunable THEN 0 ELSE n_rows END) AS BIGINT)
           AS rows_scanned,
       CAST(sum(n_rows) AS BIGINT) AS rows_total,
       (round((avg(span_us) / 86400000000.0) * 1000000.0) / 1000000.0)
           AS avg_file_span_days
FROM j
""",
    description=(
        "Data-skipping audit: model 4096-row event_id ranges as files, "
        "compute each file's ts min/max 'zone map', and measure how "
        "many a one-week time predicate could prune and how many rows "
        "the survivors force the scan to read — the layout-"
        "introspection companion to q_zorder_key (which proposes a "
        "better clustering key) and q_compaction_plan (which fixes "
        "file sizes): THIS query quantifies why the current "
        "insertion-ordered layout scans everything (wide per-file ts "
        "spans = useless zone maps) before you pay for a rewrite. "
        "One grouped min/max pass; everything downstream is "
        "file-count-sized."
    ),
    tags=("analytics", "extension", "quality", "storage"),
)
def q_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(F.expr("event_id div 4096").alias("file_id")).agg(
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    lo = F.lit("2024-01-08 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp")
    j = files.select(
        "n_rows",
        ((F.col("mx") < lo) | (F.col("mn") >= hi)).alias("prunable"),
        (F.unix_micros("mx") - F.unix_micros("mn")).cast("long").alias("span_us"),
    )
    pr = F.sum(F.when(F.col("prunable"), 1).otherwise(0))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        pr.cast("long").alias("n_prunable"),
        stable_round(pr * 1.0 / F.count(F.lit(1)), 6).alias("prune_ratio"),
        F.sum(F.when(F.col("prunable"), 0).otherwise(F.col("n_rows")))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        stable_round(F.avg("span_us") / 86400000000.0, 6).alias(
            "avg_file_span_days"
        ),
    )


@register(
    "q_lorenz_curve",
    oracle="""
WITH u AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS v
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT v, CAST(row_number() OVER (ORDER BY v, user_id) AS BIGINT) AS rk,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM u
),
tiled AS (
    SELECT v,
           CASE WHEN rk <= (n % 10) * ((n // 10) + 1)
                THEN CAST((rk - 1) // ((n // 10) + 1) AS BIGINT) + 1
                ELSE (n % 10) + CAST((rk - 1 - (n % 10) * ((n // 10) + 1))
                                     // greatest(n // 10, 1) AS BIGINT) + 1
           END AS decile
    FROM ranked
),
agg AS (
    SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(v) AS BIGINT) AS cents
    FROM tiled GROUP BY decile
),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM agg)
SELECT a.decile, a.n_users,
       (round((a.cents * 1.0 / tot.t) * 1000000.0) / 1000000.0) AS revenue_share,
       (round((sum(a.cents) OVER (ORDER BY a.decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0 / tot.t)
              * 1000000.0) / 1000000.0) AS lorenz_cum_share
FROM agg a CROSS JOIN tot
ORDER BY a.decile
""",
    description=(
        "Lorenz curve of per-user purchase revenue: users ranked "
        "ascending by spend, split into ANSI-ntile deciles, each "
        "decile's revenue share and the cumulative (Lorenz) share — "
        "the curve whose area deficit q_gini_concentration summarizes "
        "to one number; this query keeps the shape ('the bottom 50% "
        "of users hold 4% of revenue') that the scalar hides. The "
        "global rank is a two-phase bucketed carry (bucketed_rank "
        "over 4096-cent value buckets, ntile derived arithmetically "
        "via ntile_from_rank — no partitionless window anywhere); "
        "integer cents fold exactly and the only keyless window left "
        "is the 10-row decile prefix."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank, ntile_from_rank

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("v")
    )
    ranked = bucketed_rank(
        u,
        buckets=[F.expr("v div 4096")],
        order_by=[F.asc("v"), F.asc("user_id")],
        out_col="rk",
    )
    n_total = u.count()
    tiled = ranked.select(
        "v",
        ntile_from_rank(F.col("rk"), F.lit(n_total), 10).alias("decile"),
    )
    agg = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("v").cast("long").alias("cents"),
    )
    tot = agg.agg(F.sum("cents").alias("t"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            stable_round(F.col("cents") * 1.0 / F.col("t"), 6).alias(
                "revenue_share"
            ),
            stable_round(F.sum("cents").over(w) * 1.0 / F.col("t"), 6).alias(
                "lorenz_cum_share"
            ),
        )
        .orderBy("decile")
    )


@register(
    "q_quantile_treatment_effect",
    oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS v
    FROM events GROUP BY user_id
),
qa AS (
    SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
    FROM u WHERE in_a
),
qb AS (
    SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
    FROM u WHERE NOT in_a
)
SELECT CAST((i + 1) * 10 AS BIGINT) AS pct,
       (qa.qs[i + 1] / 100.0) AS q_a,
       (qb.qs[i + 1] / 100.0) AS q_b,
       ((qa.qs[i + 1] - qb.qs[i + 1]) / 100.0) AS qte
FROM qa CROSS JOIN qb CROSS JOIN range(9) t(i)
ORDER BY pct
""",
    description=(
        "Quantile treatment effects: per-arm discrete deciles "
        "(percentile_disc — an actual observed value, bit-exact "
        "cross-engine with no rounding bridge) of per-user purchase "
        "value and their A-B gaps — the distributional readout the "
        "mean-based q_ab_test_ztest cannot give: a treatment that "
        "lifts the p90 while flattening the median shows a near-zero "
        "average effect but a very nonuniform QTE profile. Exact "
        "per-group percentiles sort within arm (two groups); the "
        "sketch path at 100x is approx_percentile per arm. Integer "
        "cents in, dollars out; the 9-row decile frame is metadata."
    ),
    tags=("analytics", "extension", "stats", "causal"),
)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.plans.queries_stats2 import _arm_a

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.first(_arm_a()).alias("in_a"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("v"),
    )
    pcts = [i / 10.0 for i in range(1, 10)]

    def deciles(cond, out):
        return u.filter(cond).agg(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)"
                    )
                    for p in pcts
                ]
            ).alias(out)
        )

    qa = deciles(F.col("in_a"), "qsa")
    qb = deciles(~F.col("in_a"), "qsb")
    j = qa.crossJoin(F.broadcast(qb)).select(
        F.posexplode(F.arrays_zip("qsa", "qsb")).alias("i", "z")
    )
    return j.select(
        ((F.col("i") + 1) * 10).cast("long").alias("pct"),
        (F.col("z.qsa") / 100.0).alias("q_a"),
        (F.col("z.qsb") / 100.0).alias("q_b"),
        ((F.col("z.qsa") - F.col("z.qsb")) / 100.0).alias("qte"),
    ).orderBy("pct")


@register(
    "q_abc_analysis",
    oracle="""
WITH pr AS (
    SELECT l_partkey AS pk,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem GROUP BY 1
),
ranked AS (
    SELECT pk, cents,
           CAST(sum(cents) OVER (ORDER BY cents DESC, pk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cents,
           CAST(sum(cents) OVER () AS BIGINT) AS tot
    FROM pr
),
classed AS (
    SELECT pk, cents,
           CASE WHEN cum_cents * 1.0 / tot <= 0.8 THEN 'A'
                WHEN cum_cents * 1.0 / tot <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       (round((count(*) * 1.0 / (SELECT count(*) FROM pr)) * 1000000.0)
        / 1000000.0) AS part_share,
       (round((sum(cents) * 1.0 / (SELECT sum(cents) FROM pr)) * 1000000.0)
        / 1000000.0) AS revenue_share
FROM classed GROUP BY abc_class ORDER BY abc_class
""",
    description=(
        "ABC (Pareto) inventory classification: parts ranked by "
        "revenue, class A = the head covering 80% of cumulative "
        "revenue, B to 95%, C the tail — the operations-standard "
        "segmentation ('2% of SKUs carry 80% of revenue, manage them "
        "differently'), the item-side counterpart to the user-side "
        "q_lorenz_curve. Revenue folds as exact integer cents; the "
        "cumulative rides the part-grain table (at 100x parts the "
        "same two-phase bucketed carry as q_lorenz_curve applies — "
        "the fixture's 200-2k parts make the single window frame "
        "metadata-scale here, and the oracle pins identical "
        "semantics). Output is the 3-row class summary."
    ),
    tags=("analytics", "extension", "tpch"),
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_prefix

    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        ).alias("cents")
    )
    carried = bucketed_prefix(
        pr,
        buckets=[F.expr("(-cents) div 1048576")],
        order_by=[F.desc("cents"), F.asc("pk")],
        value=F.col("cents"),
        agg="sum",
        exclusive=False,
        out_col="cum_cents",
    )
    tot_df = pr.agg(
        F.sum("cents").alias("tot"), F.count(F.lit(1)).alias("n_tot")
    )
    share = F.col("cum_cents") * 1.0 / F.col("tot")
    classed = carried.crossJoin(F.broadcast(tot_df)).select(
        "cents",
        "n_tot",
        "tot",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            stable_round(F.count(F.lit(1)) * 1.0 / F.max("n_tot"), 6).alias(
                "part_share"
            ),
            stable_round(F.sum("cents") * 1.0 / F.max("tot"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc_class")
    )


@register(
    "q_peak_detection",
    oracle="""
WITH daily AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(round(sum(value) * 100.0) AS BIGINT) AS xc
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
nb AS (
    SELECT day, xc,
           lag(xc) OVER w AS prv,
           lead(xc) OVER w AS nxt,
           CAST(min(xc) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                AS BIGINT) AS local_min
    FROM daily
    WINDOW w AS (ORDER BY day)
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       (xc / 100.0) AS revenue,
       ((xc - local_min) / 100.0) AS prominence
FROM nb
WHERE prv IS NOT NULL AND nxt IS NOT NULL
  AND xc > prv AND xc >= nxt
  AND (xc - local_min) * 10 >= xc
ORDER BY day
""",
    description=(
        "Peak detection on daily revenue: strict local maxima "
        "(greater than yesterday, at least tomorrow — the asymmetric "
        "tie rule makes plateau edges deterministic) with a "
        "prominence filter (peak must rise >= 10% of its own height "
        "above the +-3-day local minimum), returning each peak day "
        "and its prominence — the event-marking companion to the "
        "drift/changepoint family: CUSUM finds sustained level "
        "shifts, THIS finds the one-day spikes (launch days, "
        "incidents) that level-shift detectors deliberately ignore. "
        "Integer-cent comparisons only — no floats until the output "
        "divisions; windows ride the horizon-bounded day table."
    ),
    tags=("analytics", "extension", "timeseries"),
)
def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value") * 100.0).cast("long").alias("xc"))
    )
    w = Window.orderBy("day")
    nb = daily.select(
        "day",
        "xc",
        F.lag("xc").over(w).alias("prv"),
        F.lead("xc").over(w).alias("nxt"),
        F.min("xc").over(w.rowsBetween(-3, 3)).cast("long").alias("local_min"),
    )
    return (
        nb.filter(
            F.col("prv").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("xc") > F.col("prv"))
            & (F.col("xc") >= F.col("nxt"))
            & ((F.col("xc") - F.col("local_min")) * 10 >= F.col("xc"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.col("xc") / 100.0).alias("revenue"),
            ((F.col("xc") - F.col("local_min")) / 100.0).alias("prominence"),
        )
        .orderBy("day")
    )


@register(
    "q_heavy_hitters_2phase",
    oracle="""
WITH cnt AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(user_id % 16 AS BIGINT) AS bucket
    FROM events GROUP BY user_id
),
local AS (
    SELECT user_id, cnt, bucket,
           row_number() OVER (PARTITION BY bucket
                              ORDER BY cnt DESC, user_id ASC) AS lrk
    FROM cnt
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS BIGINT) AS rank,
       user_id, cnt, bucket
FROM local WHERE lrk <= 10
ORDER BY cnt DESC, user_id ASC
LIMIT 10
""",
    description=(
        "EXACT distributed top-k heavy hitters by the two-phase "
        "local-top-k -> merge pattern: partition the key space by "
        "hash(key) % B, take the per-bucket top-k with a PARTITIONED "
        "window (never a global sort of the data), then merge the "
        "<= B*k candidates in a metadata-scale final rank. Because "
        "buckets partition the KEY space (not the row space), every "
        "global top-k member is its bucket's local top-k member, so "
        "the result is exact — this is the shape that replaces "
        "ORDER BY count DESC LIMIT k when the group cardinality is "
        "billions: the only global operation touches B*k rows. "
        "Extension beyond the reference (etl_script.py:74-119 has "
        "only whole-table aggregates)."
    ),
    tags=("analytics", "extension", "scale-pattern"),
)
def q_heavy_hitters_2phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("bucket", (F.col("user_id") % 16).cast("long"))
    )
    w_local = Window.partitionBy("bucket").orderBy(F.desc("cnt"), F.asc("user_id"))
    cand = (
        cnt.select("user_id", "cnt", "bucket", F.row_number().over(w_local).alias("lrk"))
        .filter(F.col("lrk") <= 10)
        .drop("lrk")
    )
    w_merge = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    return (
        cand.select(F.row_number().over(w_merge).cast("long").alias("rank"), "*")
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
    )


_LRU_TRACE = 15000
_LRU_BLK = 256


@register(
    "q_lru_miss_curve",
    oracle=f"""
WITH tr AS (
    SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS pos,
           o_custkey % 512 AS k
    FROM orders
),
t AS (SELECT pos, k FROM tr WHERE pos <= {_LRU_TRACE}),
pv AS (SELECT pos, k,
              lag(pos) OVER (PARTITION BY k ORDER BY pos) AS prevp
       FROM t),
a AS (SELECT pos, prevp FROM pv WHERE prevp IS NOT NULL),
b AS (SELECT pos, coalesce(prevp, 0) AS bp FROM pv),
cnt AS (
    SELECT a.pos AS apos, CAST(count(*) AS BIGINT) AS c
    FROM a JOIN b ON b.pos > a.prevp AND b.pos < a.pos AND b.bp <= a.prevp
    GROUP BY 1
),
rd AS (
    SELECT a.pos, 1 + coalesce(c, 0) AS d
    FROM a LEFT JOIN cnt ON cnt.apos = a.pos
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_trace FROM t),
grid AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512]) AS cache_size)
SELECT CAST(g.cache_size AS BIGINT) AS cache_size,
       CAST(count(*) FILTER (WHERE rd.d <= g.cache_size) AS BIGINT) AS n_hits,
       (round((count(*) FILTER (WHERE rd.d <= g.cache_size) * 1.0
               / (SELECT n_trace FROM n)) * 1000000.0) / 1000000.0) AS hit_ratio
FROM grid g CROSS JOIN rd
GROUP BY 1
ORDER BY 1
""",
    description=(
        "LRU miss-ratio curve by exact reuse (stack) distance over the "
        "order-arrival access trace (key = o_custkey mod 512, first "
        "15000 accesses): hit_ratio(C) for every power-of-two cache "
        "size in one pass, the Mattson MRC that sizes caches before "
        "buying memory. Reuse distance d(i) = 1 + |distinct keys in "
        "(prev(i), i)|, computed WITHOUT the naive O(n*gap) distinct "
        "scan via the first-occurrence identity: a key occupies the "
        "interval iff its first access j there has prevpos(j) <= "
        "prev(i) — a 2-D dominance count expressed as a block-banded "
        "equi-join (access intervals exploded to pos-div-256 blocks "
        "joined to position rows, never a cartesian). The global trace "
        "position is bucketed_rank's two-phase carry (order-month "
        "buckets); the trace cap bounds the join at sum-of-gaps rows; "
        "the production path shards the trace per epoch and merges "
        "histograms (MRCs are additive across shards)."
    ),
    tags=("analytics", "extension", "scale-pattern", "systems"),
)
def q_lru_miss_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank

    blk = _LRU_BLK
    orders = load_table(spark, sf_dir, "orders")
    tr = bucketed_rank(
        orders.select("o_orderdate", "o_orderkey", "o_custkey"),
        buckets=[F.date_trunc("month", "o_orderdate")],
        order_by=[F.asc("o_orderdate"), F.asc("o_orderkey")],
        out_col="pos",
    )
    t = (
        tr.filter(F.col("pos") <= _LRU_TRACE)
        .select("pos", (F.col("o_custkey") % 512).alias("k"))
    )
    pv = t.select(
        "pos",
        "k",
        F.lag("pos").over(Window.partitionBy("k").orderBy("pos")).alias("prevp"),
    )
    a = pv.filter(F.col("prevp").isNotNull()).select("pos", "prevp")
    b = pv.select(
        F.col("pos").alias("bpos"),
        F.coalesce("prevp", F.lit(0)).alias("bp"),
        F.expr(f"pos div {blk}").alias("blkid"),
    )
    a_blocks = a.filter(F.col("pos") - F.col("prevp") >= 2).select(
        "pos",
        "prevp",
        F.explode(
            F.expr(f"sequence((prevp + 1) div {blk}, (pos - 1) div {blk})")
        ).alias("blkid"),
    )
    cnt = (
        a_blocks.join(b, "blkid")
        .filter(
            (F.col("bpos") > F.col("prevp"))
            & (F.col("bpos") < F.col("pos"))
            & (F.col("bp") <= F.col("prevp"))
        )
        .groupBy("pos")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rd = a.join(cnt, "pos", "left").select(
        "pos", (F.lit(1) + F.coalesce("c", F.lit(0))).alias("d")
    )
    n = t.agg(F.count(F.lit(1)).cast("long").alias("n_trace"))
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(1 << i) for i in range(10)])).alias("cs")
    ).select(F.col("cs").cast("long").alias("cache_size"))
    hits = (
        grid.crossJoin(rd)
        .groupBy("cache_size")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("cache_size"), 1).otherwise(0))
            .cast("long")
            .alias("n_hits")
        )
    )
    return (
        hits.crossJoin(F.broadcast(n))
        .select(
            "cache_size",
            "n_hits",
            stable_round(F.col("n_hits") * 1.0 / F.col("n_trace"), 6).alias(
                "hit_ratio"
            ),
        )
        .orderBy("cache_size")
    )


_CH_P = 2_147_483_647
_CH_MD5 = f"(('0x' || substring(md5({{x}}), 1, 8))::BIGINT % {_CH_P})"


@register(
    "q_consistent_hash_balance",
    oracle=f"""
WITH ring AS (
    SELECT s, v,
           {_CH_MD5.format(x="'ring:' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)")}
               AS rp
    FROM (SELECT unnest(range(8)) AS s)
    CROSS JOIN (SELECT unnest(range(16)) AS v)
),
kh AS (
    SELECT user_id,
           {_CH_MD5.format(x="'key:' || CAST(user_id AS VARCHAR)")} AS h
    FROM (SELECT DISTINCT user_id FROM events)
),
asg AS (
    SELECT user_id,
           CAST(min((((rp - h) % {_CH_P} + {_CH_P}) % {_CH_P}) * 1000 + s)
                % 1000 AS BIGINT) AS sid,
           CAST(min(CASE WHEN s <> 0
                    THEN (((rp - h) % {_CH_P} + {_CH_P}) % {_CH_P}) * 1000 + s
                    END) % 1000 AS BIGINT) AS sid2
    FROM kh CROSS JOIN ring GROUP BY user_id
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM asg),
per AS (
    SELECT sid AS server_id,
           CAST(count(*) AS BIGINT) AS n_before FROM asg GROUP BY 1
),
aft AS (
    SELECT sid2 AS server_id,
           CAST(count(*) AS BIGINT) AS n_after FROM asg GROUP BY 1
),
gained AS (
    SELECT sid2 AS server_id, CAST(count(*) AS BIGINT) AS n_gained
    FROM asg WHERE sid <> sid2 GROUP BY 1
)
SELECT p.server_id,
       p.n_before,
       coalesce(a.n_after, 0) AS n_after,
       coalesce(g.n_gained, 0) AS n_gained,
       (round((p.n_before * 1.0 / (SELECT n_keys FROM n)) * 1000000.0)
        / 1000000.0) AS share_before
FROM per p
LEFT JOIN aft a ON a.server_id = p.server_id
LEFT JOIN gained g ON g.server_id = p.server_id
ORDER BY p.server_id
""",
    description=(
        "Consistent-hash ring balance audit: 8 servers x 16 virtual "
        "nodes on a 31-bit md5 ring, every distinct user key assigned "
        "to the clockwise-nearest vnode (argmin of ring distance, "
        "encoded dist*1000+server into ONE integer MIN so ties are "
        "deterministic on both engines), then server 0 is removed and "
        "keys reassigned. Verifies the two properties that make "
        "consistent hashing the shard router for distributed caches/ "
        "stores: vnode-smoothed load spread (share_before per server) "
        "and minimal disruption — only server 0's keys move "
        "(n_gained sums to exactly server 0's n_before; every other "
        "server's assignment is unchanged). The ring is a 128-row "
        "broadcast; keys stream through one codegen'd cross-product "
        "aggregate — no shuffle beyond the per-key min."
    ),
    tags=("analytics", "extension", "systems"),
)
def q_consistent_hash_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import md5_hash31

    p = _CH_P
    spark_dp = spark.range(8).select(F.col("id").alias("s"))
    ring = (
        spark_dp.crossJoin(spark.range(16).select(F.col("id").alias("v")))
        .select(
            "s",
            "v",
            md5_hash31(
                F.concat(
                    F.lit("ring:"),
                    F.col("s").cast("string"),
                    F.lit(":"),
                    F.col("v").cast("string"),
                )
            ).alias("rp"),
        )
    )
    keys = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            md5_hash31(
                F.concat(F.lit("key:"), F.col("user_id").cast("string"))
            ).alias("h"),
        )
    )
    dist = ((F.col("rp") - F.col("h")) % p + p) % p
    enc = dist * 1000 + F.col("s")
    asg = (
        keys.crossJoin(F.broadcast(ring))
        .groupBy("user_id")
        .agg(
            (F.min(enc) % 1000).cast("long").alias("sid"),
            (F.min(F.when(F.col("s") != 0, enc)) % 1000).cast("long").alias("sid2"),
        )
    )
    n = asg.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    per = asg.groupBy(F.col("sid").alias("server_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    aft = asg.groupBy(F.col("sid2").alias("server_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_after")
    )
    gained = (
        asg.filter(F.col("sid") != F.col("sid2"))
        .groupBy(F.col("sid2").alias("server_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_gained"))
    )
    return (
        per.join(aft, "server_id", "left")
        .join(gained, "server_id", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "server_id",
            "n_before",
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            F.coalesce("n_gained", F.lit(0)).cast("long").alias("n_gained"),
            stable_round(F.col("n_before") * 1.0 / F.col("n_keys"), 6).alias(
                "share_before"
            ),
        )
        .orderBy("server_id")
    )


@register(
    "q_salted_distinct_agg",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description=(
        "Salted two-phase distinct-count for skewed group keys: "
        "events has only ~5 event_type values, so a naive "
        "count(DISTINCT user_id) GROUP BY event_type funnels every "
        "row of a hot key through one reduce task. Phase 1 groups by "
        "(event_type, user_id mod 32) — distinct users split "
        "DISJOINTLY across salts, so each salt's local distinct is "
        "exact and 32 tasks share one hot key's work; phase 2 sums "
        "the 5x32 partial counts (metadata-scale). Identical result "
        "to the naive form (the oracle IS the naive form), 32x the "
        "parallelism on the hot path — the pattern behind every "
        "billion-row count-distinct dashboard query. Counts and cent "
        "sums fold alongside in the same two phases."
    ),
    tags=("analytics", "extension", "scale-pattern"),
)
def q_salted_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.select(
            "event_type",
            (F.col("user_id") % 32).alias("salt"),
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "salt")
        .agg(
            F.countDistinct("user_id").cast("long").alias("pu"),
            F.count(F.lit(1)).cast("long").alias("pn"),
            F.sum("cents").cast("long").alias("pc"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pu").cast("long").alias("n_users"),
            F.sum("pn").cast("long").alias("n_events"),
            F.sum("pc").cast("long").alias("total_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "q_kmv_distinct",
    oracle=f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
    SELECT event_type, user_id,
           {_CH_MD5.format(x="'kmv:' || CAST(user_id AS VARCHAR)")} AS hv
    FROM du
),
rk AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv, user_id) AS r
    FROM h
),
kth AS (
    SELECT event_type, max(CASE WHEN r = 256 THEN hv END) AS hk,
           CAST(count(*) AS BIGINT) AS n_seen
    FROM rk WHERE r <= 256 GROUP BY event_type
),
ex AS (
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
    FROM events GROUP BY event_type
)
SELECT ex.event_type, n_exact,
       CAST(CASE WHEN hk IS NULL THEN n_seen
            ELSE CAST(round(255.0 * {_CH_P} / hk) AS BIGINT) END AS BIGINT)
           AS n_est,
       (round((abs(CASE WHEN hk IS NULL THEN n_seen
                   ELSE CAST(round(255.0 * {_CH_P} / hk) AS BIGINT) END - n_exact)
               * 1.0 / n_exact) * 1000000.0) / 1000000.0) AS rel_err
FROM ex JOIN kth ON ex.event_type = kth.event_type
ORDER BY ex.event_type
""",
    description=(
        "KMV (k-minimum-values, k=256) distinct-count sketch per event "
        "type, with exact count and relative error alongside: estimate "
        "= (k-1) * HASH_SPACE / h_(k) from the k smallest 31-bit md5 "
        "hashes. The ORACLE-CHECKABLE distinct sketch — unlike HLL's "
        "opaque register blob, a KMV synopsis is just k ordered "
        "integers, so DuckDB reproduces it bit-for-bit, and it is "
        "MERGEABLE (union = merge the min-k sets and re-truncate; "
        "intersection cardinalities come from the same synopses via "
        "Jaccard — neither is possible with exact distinct partials). "
        "Per-type min-k rides the WindowGroupLimit pre-truncation: "
        "every input partition is cut to its local 256 smallest before "
        "the per-type merge, so the shuffle carries k rows per "
        "(partition x type) no matter how many billions of rows a hot "
        "type has. Exact fallback when a type has < k distinct keys."
    ),
    tags=("analytics", "extension", "sketch", "scale-pattern"),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import md5_hash31

    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        "user_id",
        md5_hash31(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))).alias(
            "hv"
        ),
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("hv"), F.asc("user_id"))
    rk = h.select("event_type", "hv", F.row_number().over(w).alias("r")).filter(
        F.col("r") <= 256
    )
    kth = rk.groupBy("event_type").agg(
        F.max(F.when(F.col("r") == 256, F.col("hv"))).alias("hk"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    est = F.when(F.col("hk").isNull(), F.col("n_seen")).otherwise(
        F.round(F.lit(255.0) * _CH_P / F.col("hk")).cast("long")
    )
    return (
        ex.join(kth, "event_type")
        .select(
            "event_type",
            "n_exact",
            est.cast("long").alias("n_est"),
            stable_round(
                F.abs(est - F.col("n_exact")) * 1.0 / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


@register(
    "q_hits_scores",
    oracle="""
WITH pe AS MATERIALIZED (
    SELECT DISTINCT o_custkey AS c, l_suppkey AS s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
te AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM pe),
a1 AS (
    SELECT s, CAST(count(*) AS BIGINT) AS indeg,
           CAST(round(count(*) * 10000000000.0 / (SELECT tot FROM te))
                AS BIGINT) AS ai
    FROM pe GROUP BY s
),
h1 AS (
    SELECT c, CAST(sum(ai) AS BIGINT) AS hi
    FROM pe JOIN a1 USING (s) GROUP BY c
),
nh AS (SELECT CAST(sum(hi) AS BIGINT) AS nrm FROM h1),
h1n AS (
    SELECT c, CAST(round(hi * 10000000000.0 / (SELECT nrm FROM nh))
                   AS BIGINT) AS hn
    FROM h1
),
a2 AS (
    SELECT s, CAST(sum(hn) AS BIGINT) AS a2i
    FROM pe JOIN h1n USING (c) GROUP BY s
),
na AS (SELECT CAST(sum(a2i) AS BIGINT) AS nrm FROM a2)
SELECT a2.s AS supp_id, a1.indeg,
       (round((a2i * 1.0 / (SELECT nrm FROM na)) * 100000000.0)
        / 100000000.0) AS authority
FROM a2 JOIN a1 ON a1.s = a2.s
ORDER BY supp_id
""",
    description=(
        "HITS authority scores over the bipartite customer->supplier "
        "purchase graph (2 power rounds: authority <- hub mass <- "
        "authority, L1-normalized each round): suppliers bought by "
        "customers who buy from other authoritative suppliers — the "
        "mutual-reinforcement centrality that plain in-degree misses. "
        "Every iterate is held as EXACT integer deci-nano mass "
        "(normalize = one deterministic rounded division per node; "
        "propagate = BIGINT sums over the edge join), so unlike "
        "float-state power iterations there is NO summation-order "
        "surface at all. Per round: one equi-join edge pass + one hash "
        "agg on the node id, the distributed shape every "
        "graph-centrality engine runs; edges would be bucketed by "
        "join side at cluster scale."
    ),
    tags=("analytics", "extension", "graph"),
)
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pe = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    ).localCheckpoint(eager=True)
    te = pe.agg(F.count(F.lit(1)).cast("long").alias("tot"))
    a1 = (
        pe.groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("indeg"))
        .crossJoin(F.broadcast(te))
        .select(
            "s",
            "indeg",
            F.round(F.col("indeg") * 10000000000.0 / F.col("tot"))
            .cast("long")
            .alias("ai"),
        )
    )
    h1 = pe.join(a1.select("s", "ai"), "s").groupBy("c").agg(
        F.sum("ai").cast("long").alias("hi")
    )
    nh = h1.agg(F.sum("hi").cast("long").alias("nrm"))
    h1n = h1.crossJoin(F.broadcast(nh)).select(
        "c",
        F.round(F.col("hi") * 10000000000.0 / F.col("nrm")).cast("long").alias("hn"),
    )
    a2 = pe.join(h1n, "c").groupBy("s").agg(F.sum("hn").cast("long").alias("a2i"))
    na = a2.agg(F.sum("a2i").cast("long").alias("nrm"))
    return (
        a2.join(a1.select("s", "indeg"), "s")
        .crossJoin(F.broadcast(na))
        .select(
            F.col("s").alias("supp_id"),
            "indeg",
            stable_round(F.col("a2i") * 1.0 / F.col("nrm"), 8).alias("authority"),
        )
        .orderBy("supp_id")
    )


@register(
    "q_retention_halflife",
    oracle="""
WITH fu AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM fu),
act AS (
    SELECT DISTINCT e.user_id,
           datediff('day', d0, CAST(ts AS DATE)) AS k
    FROM events e JOIN fu USING (user_id)
),
ck AS (
    SELECT k, CAST(count(*) AS BIGINT) AS c
    FROM act WHERE k BETWEEN 1 AND 14 GROUP BY k
),
y AS (
    SELECT CAST(k AS BIGINT) AS k,
           CAST(round(ln(c * 1.0 / (SELECT nu FROM n)) * 1000000000.0)
                AS BIGINT) AS yq
    FROM ck WHERE c > 0
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(k) AS BIGINT) AS sx,
           CAST(sum(yq) AS BIGINT) AS sy, CAST(sum(k * k) AS BIGINT) AS sxx,
           CAST(sum(k * yq) AS BIGINT) AS sxy
    FROM y
)
SELECT (SELECT nu FROM n) AS n_users, nn AS n_days_fit,
       (round((((nn * sxy - sx * sy) * 1.0 / (nn * sxx - sx * sx))
               / 1000000000.0) * 1000000.0) / 1000000.0) AS slope_per_day,
       (round((-693147180.5599453
               / ((nn * sxy - sx * sy) * 1.0 / (nn * sxx - sx * sx)))
              * 1000000.0) / 1000000.0) AS halflife_days
FROM s
""",
    description=(
        "Retention half-life by exponential-decay fit: pooled day-k "
        "retention p_k = |users active on day first_day+k| / |users| "
        "for k=1..14, log-linear OLS ln(p_k) = a + b*k, half-life = "
        "-ln2/b — the single number product teams quote from a "
        "retention curve, and the decay model capacity forecasts "
        "plug into. Per-row ln(p_k) is quantized to integer "
        "nano-units so the 14-point OLS moments fold exactly "
        "(the q_price_elasticity discipline); -ln2 enters as one "
        "literal on both engines (never recomputed). Two hash aggs "
        "over events + a distinct on (user, day-offset): every stage "
        "is key-partitioned."
    ),
    tags=("analytics", "extension", "growth"),
)
def q_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fu = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    n = fu.agg(F.count(F.lit(1)).cast("long").alias("nu"))
    act = (
        ev.join(fu, "user_id")
        .select("user_id", F.datediff(F.to_date("ts"), F.col("d0")).alias("k"))
        .distinct()
    )
    ck = (
        act.filter(F.col("k").between(1, 14))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    y = (
        ck.filter(F.col("c") > 0)
        .crossJoin(F.broadcast(n))
        .select(
            F.col("k").cast("long").alias("k"),
            F.round(F.log(F.col("c") * 1.0 / F.col("nu")) * 1000000000.0)
            .cast("long")
            .alias("yq"),
        )
    )
    s = y.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("k").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sxx"),
        F.sum(F.col("k") * F.col("yq")).cast("long").alias("sxy"),
    )
    slope_q = (F.col("nn") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / (
        F.col("nn") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        s.crossJoin(F.broadcast(n))
        .select(
            F.col("nu").alias("n_users"),
            F.col("nn").alias("n_days_fit"),
            stable_round(slope_q / 1000000000.0, 6).alias("slope_per_day"),
            stable_round(F.lit(-693147180.5599453) / slope_q, 6).alias(
                "halflife_days"
            ),
        )
    )


@register(
    "q_join_size_estimate",
    oracle=f"""
WITH c1 AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n1
    FROM events WHERE event_type = 'click' GROUP BY 1
),
c2 AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n2
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
ex AS (
    SELECT CAST(sum(n1 * n2) AS BIGINT) AS exact_size
    FROM c1 JOIN c2 USING (user_id)
),
uni AS (
    SELECT user_id FROM c1 UNION SELECT user_id FROM c2
),
h AS (
    SELECT user_id,
           {_CH_MD5.format(x="'jse:' || CAST(user_id AS VARCHAR)")} AS hv,
           row_number() OVER (
               ORDER BY {_CH_MD5.format(x="'jse:' || CAST(user_id AS VARCHAR)")},
                        user_id) AS r
    FROM uni
),
syn AS (SELECT user_id, hv, r FROM h WHERE r <= 128),
kth AS (
    SELECT max(CASE WHEN r = 128 THEN hv END) AS hk,
           CAST(count(*) AS BIGINT) AS n_seen
    FROM syn
),
mass AS (
    SELECT CAST(sum(coalesce(n1, 0) * coalesce(n2, 0)) AS BIGINT) AS m
    FROM syn
    LEFT JOIN c1 USING (user_id)
    LEFT JOIN c2 USING (user_id)
)
SELECT exact_size,
       CAST(CASE WHEN hk IS NULL THEN (SELECT m FROM mass)
            ELSE CAST(round((127.0 * {_CH_P} / hk) / 128.0
                            * (SELECT m FROM mass)) AS BIGINT) END AS BIGINT)
           AS est_size,
       (round((abs(CASE WHEN hk IS NULL THEN (SELECT m FROM mass)
                   ELSE CAST(round((127.0 * {_CH_P} / hk) / 128.0
                                   * (SELECT m FROM mass)) AS BIGINT) END
                   - exact_size) * 1.0 / exact_size) * 1000000.0) / 1000000.0)
           AS rel_err
FROM ex CROSS JOIN kth
""",
    description=(
        "Sketch-based equi-join cardinality estimation: |clicks JOIN "
        "purchases ON user_id| = sum_k c1(k)*c2(k), estimated from a "
        "128-key KMV synopsis of the key UNION — per-synopsis-key "
        "frequency products scaled by D_est/k, with D_est from the "
        "same synopsis. The statistic a cost-based optimizer (or an "
        "AQE-style runtime re-planner) needs BEFORE running a join "
        "that might explode; the synopsis is mergeable across "
        "partitions and tables, costs one WindowGroupLimit-truncated "
        "min-k per side, and the estimate is one 128-row join against "
        "the per-key count tables. Exact answer computed alongside "
        "with the relative error — deterministic md5 hashing makes "
        "the whole sketch oracle-checkable."
    ),
    tags=("analytics", "extension", "sketch", "scale-pattern"),
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import md5_hash31

    ev = load_table(spark, sf_dir, "events")
    c1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n1"))
    )
    c2 = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
    )
    ex = c1.join(c2, "user_id").agg(
        F.sum(F.col("n1") * F.col("n2")).cast("long").alias("exact_size")
    )
    uni = c1.select("user_id").union(c2.select("user_id")).distinct()
    hv = md5_hash31(F.concat(F.lit("jse:"), F.col("user_id").cast("string")))
    w = Window.orderBy(hv, F.col("user_id"))
    syn = (
        uni.select("user_id", hv.alias("hv"), F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= 128)
    )
    kth = syn.agg(
        F.max(F.when(F.col("r") == 128, F.col("hv"))).alias("hk"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )
    mass = (
        syn.join(c1, "user_id", "left")
        .join(c2, "user_id", "left")
        .agg(
            F.sum(F.coalesce("n1", F.lit(0)) * F.coalesce("n2", F.lit(0)))
            .cast("long")
            .alias("m")
        )
    )
    est = F.when(F.col("hk").isNull(), F.col("m")).otherwise(
        F.round((F.lit(127.0) * _CH_P / F.col("hk")) / 128.0 * F.col("m")).cast("long")
    )
    return (
        ex.crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(mass))
        .select(
            "exact_size",
            est.cast("long").alias("est_size"),
            stable_round(
                F.abs(est - F.col("exact_size")) * 1.0 / F.col("exact_size"), 6
            ).alias("rel_err"),
        )
    )


@register(
    "q_fagin_ta_audit",
    oracle="""
WITH pu AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS clicks,
           CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS cents
    FROM events GROUP BY user_id
),
sc AS (SELECT user_id, clicks, cents, 1000 * clicks + cents AS s FROM pu),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM sc),
ra AS (
    SELECT user_id, clicks,
           row_number() OVER (ORDER BY clicks DESC, user_id) AS rk_a
    FROM sc
),
rb AS (
    SELECT user_id, cents,
           row_number() OVER (ORDER BY cents DESC, user_id) AS rk_b
    FROM sc
),
top10 AS (
    SELECT user_id, s FROM (
        SELECT user_id, s, row_number() OVER (ORDER BY s DESC, user_id) AS r
        FROM sc
    ) WHERE r <= 10
),
s10 AS (SELECT CAST(min(s) AS BIGINT) AS v FROM top10),
dmin AS (
    SELECT t.user_id, least(ra.rk_a, rb.rk_b) AS d
    FROM top10 t JOIN ra ON ra.user_id = t.user_id
                 JOIN rb ON rb.user_id = t.user_id
),
dcover AS (SELECT CAST(max(d) AS BIGINT) AS v FROM dmin),
thr AS (
    SELECT ra.rk_a AS d, 1000 * ra.clicks + rb.cents AS t
    FROM ra JOIN rb ON ra.rk_a = rb.rk_b
),
dthr AS (
    SELECT CAST(min(d) AS BIGINT) AS v FROM thr
    WHERE t <= (SELECT v FROM s10)
)
SELECT (SELECT n_users FROM n) AS n_users,
       (SELECT v FROM s10) AS s10,
       CAST(greatest((SELECT v FROM dcover),
                     coalesce((SELECT v FROM dthr), (SELECT n_users FROM n)))
            AS BIGINT) AS d_star,
       (round((greatest((SELECT v FROM dcover),
                        coalesce((SELECT v FROM dthr),
                                 (SELECT n_users FROM n)))
               * 1.0 / (SELECT n_users FROM n)) * 1000000.0) / 1000000.0)
           AS frac_scanned
""",
    description=(
        "Fagin threshold-algorithm (TA) early-termination audit for "
        "rank aggregation: combined score s = 1000*clicks + "
        "purchase-cents over two sorted access lists (clicks-ranked, "
        "spend-ranked). TA stops at the first depth d where the "
        "threshold T(d) = 1000*clicks@d + cents@d falls to the 10th-"
        "best seen score; this query computes that exact stop depth "
        "d* = max(depth covering the true top-10, min d with T(d) <= "
        "s10) and the scanned fraction — the audit that justifies "
        "serving top-k from per-feature sorted indexes instead of "
        "scoring every entity. Both global ranks ride WindowGroupLimit "
        "/ bucketed forms; the threshold curve is an equi-join of the "
        "two rank tables on depth. Monotonicity of T and s10-seen "
        "makes the closed form equal to the sequential TA's stop."
    ),
    tags=("analytics", "extension", "systems", "retrieval"),
)
def q_fagin_ta_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank

    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("cents"),
    )
    sc = pu.select(
        "user_id", "clicks", "cents", (1000 * F.col("clicks") + F.col("cents")).alias("s")
    ).localCheckpoint(eager=True)
    n = sc.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    ra = bucketed_rank(
        sc.select("user_id", "clicks"),
        buckets=[F.expr("-(clicks div 64)")],
        order_by=[F.desc("clicks"), F.asc("user_id")],
        out_col="rk_a",
    )
    rb = bucketed_rank(
        sc.select("user_id", "cents"),
        buckets=[F.expr("-(cents div 4096)")],
        order_by=[F.desc("cents"), F.asc("user_id")],
        out_col="rk_b",
    )
    w10 = Window.orderBy(F.desc("s"), F.asc("user_id"))
    top10 = (
        sc.select("user_id", "s", F.row_number().over(w10).alias("r"))
        .filter(F.col("r") <= 10)
        .select("user_id", "s")
    )
    s10 = top10.agg(F.min("s").cast("long").alias("s10"))
    dcover = (
        top10.join(ra.select("user_id", "rk_a"), "user_id")
        .join(rb.select("user_id", "rk_b"), "user_id")
        .agg(F.max(F.least("rk_a", "rk_b")).cast("long").alias("dcover"))
    )
    thr = ra.select(F.col("rk_a").alias("d"), "clicks").join(
        rb.select(F.col("rk_b").alias("d"), "cents"), "d"
    )
    dthr = (
        thr.crossJoin(F.broadcast(s10))
        .filter(1000 * F.col("clicks") + F.col("cents") <= F.col("s10"))
        .agg(F.min("d").cast("long").alias("dthr"))
    )
    d_star = F.greatest(
        F.col("dcover"), F.coalesce(F.col("dthr"), F.col("n_users"))
    ).cast("long")
    return (
        n.crossJoin(F.broadcast(s10))
        .crossJoin(F.broadcast(dcover))
        .crossJoin(F.broadcast(dthr))
        .select(
            "n_users",
            "s10",
            d_star.alias("d_star"),
            stable_round(d_star * 1.0 / F.col("n_users"), 6).alias("frac_scanned"),
        )
    )


@register(
    "q_importance_sampling_audit",
    oracle=f"""
WITH s AS (
    SELECT event_type, value,
           CASE WHEN event_type = 'error' THEN 1
                WHEN {_CH_MD5.format(x="'samp:' || CAST(event_id AS VARCHAR)")}
                     % 64 = 0 THEN 64
                ELSE 0 END AS w
    FROM events
),
est AS (
    SELECT CAST(count(*) FILTER (WHERE w > 0) AS BIGINT) AS n_kept,
           CAST(sum(w) AS BIGINT) AS est_total,
           CAST(sum(CASE WHEN event_type = 'error' THEN w ELSE 0 END)
                AS BIGINT) AS est_errors,
           CAST(sum(w * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS est_cents
    FROM s
),
ex AS (
    SELECT CAST(count(*) AS BIGINT) AS true_total,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS true_errors,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS true_cents
    FROM events
)
SELECT n_kept, est_total, true_total, est_errors, true_errors,
       (round((abs(est_total - true_total) * 1.0 / true_total) * 1000000.0)
        / 1000000.0) AS total_rel_err,
       (round((abs(est_cents - true_cents) * 1.0 / true_cents) * 1000000.0)
        / 1000000.0) AS cents_rel_err
FROM est CROSS JOIN ex
""",
    description=(
        "Tail-importance-sampled telemetry with exact Horvitz-Thompson "
        "reweighting: error events keep weight 1 (100% sampled), "
        "everything else is hash-sampled at 1/64 with weight 64, and "
        "the reweighted totals/error-counts/revenue are compared to "
        "the exact answers. THE pattern for high-volume event "
        "pipelines — rare events (errors, conversions) survive "
        "exactly, the bulk shrinks 64x, and every downstream "
        "aggregate stays unbiased by construction (est_errors == "
        "true_errors ALWAYS, totals within sampling error, audited "
        "here as rel-err columns). Deterministic md5 sampling makes "
        "the sample reproducible and join-stable across tables "
        "sampled on the same key."
    ),
    tags=("analytics", "extension", "scale-pattern", "sampling"),
)
def q_importance_sampling_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import md5_hash31

    ev = load_table(spark, sf_dir, "events")
    h = md5_hash31(F.concat(F.lit("samp:"), F.col("event_id").cast("string")))
    w = (
        F.when(F.col("event_type") == "error", 1)
        .when(h % 64 == 0, 64)
        .otherwise(0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    s = ev.select("event_type", cents.alias("cents"), w.alias("w"))
    est = s.agg(
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum("w").cast("long").alias("est_total"),
        F.sum(F.when(F.col("event_type") == "error", F.col("w")).otherwise(0))
        .cast("long")
        .alias("est_errors"),
        F.sum(F.col("w") * F.col("cents")).cast("long").alias("est_cents"),
    )
    ex = ev.agg(
        F.count(F.lit(1)).cast("long").alias("true_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("true_errors"),
        F.sum(cents).cast("long").alias("true_cents"),
    )
    return est.crossJoin(F.broadcast(ex)).select(
        "n_kept",
        "est_total",
        "true_total",
        "est_errors",
        "true_errors",
        stable_round(
            F.abs(F.col("est_total") - F.col("true_total")) * 1.0 / F.col("true_total"),
            6,
        ).alias("total_rel_err"),
        stable_round(
            F.abs(F.col("est_cents") - F.col("true_cents")) * 1.0 / F.col("true_cents"),
            6,
        ).alias("cents_rel_err"),
    )


@register(
    "q_forecast_reconciliation",
    oracle="""
WITH rev AS (
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST((year(o.o_orderdate) - 1995) * 12 + month(o.o_orderdate)
                AS BIGINT) AS m,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2, 3
),
hz AS (SELECT CAST(max(m) + 1 AS BIGINT) AS h FROM rev),
nfit AS (
    SELECT nation, region,
           CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS sx,
           CAST(sum(cents) AS BIGINT) AS sy, CAST(sum(m * m) AS BIGINT) AS sxx,
           CAST(sum(m * cents) AS BIGINT) AS sxy
    FROM rev GROUP BY 1, 2
),
nfc AS (
    SELECT nation, region,
           CAST(round((((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
                       * (SELECT h FROM hz)
                       + (sy - sx * ((n * sxy - sx * sy) * 1.0
                                     / (n * sxx - sx * sx))) / n)
                      ) AS BIGINT) AS fq
    FROM nfit
),
rrev AS (
    SELECT region, m, CAST(sum(cents) AS BIGINT) AS cents
    FROM rev GROUP BY 1, 2
),
rfit AS (
    SELECT region,
           CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS sx,
           CAST(sum(cents) AS BIGINT) AS sy, CAST(sum(m * m) AS BIGINT) AS sxx,
           CAST(sum(m * cents) AS BIGINT) AS sxy
    FROM rrev GROUP BY 1
),
rfc AS (
    SELECT region,
           CAST(round((((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
                       * (SELECT h FROM hz)
                       + (sy - sx * ((n * sxy - sx * sy) * 1.0
                                     / (n * sxx - sx * sx))) / n)
                      ) AS BIGINT) AS rfq
    FROM rfit
),
tot AS (
    SELECT region, CAST(sum(fq) AS BIGINT) AS sum_fq FROM nfc GROUP BY region
)
SELECT nfc.nation, nfc.region,
       (round((nfc.fq / 100.0) * 1000000.0) / 1000000.0) AS base_forecast,
       (round((rfc.rfq / 100.0) * 1000000.0) / 1000000.0) AS region_forecast,
       (round((nfc.fq * (rfc.rfq * 1.0 / tot.sum_fq) / 100.0) * 1000000.0)
        / 1000000.0) AS reconciled_forecast
FROM nfc
JOIN rfc ON rfc.region = nfc.region
JOIN tot ON tot.region = nfc.region
ORDER BY nfc.region, nfc.nation
""",
    description=(
        "Hierarchical forecast reconciliation (top-down proportional): "
        "per-nation monthly-revenue OLS trend forecasts for the next "
        "month, an independent region-level fit, and nation forecasts "
        "rescaled by region_forecast / sum(nation forecasts) so the "
        "hierarchy ADDS UP — the coherence constraint every "
        "planning/finance rollup demands and which independently "
        "fitted group forecasts always violate. Every OLS moment is "
        "an exact BIGINT cent fold per group; forecasts are quantized "
        "to integer cents before the region sums so the rescaling "
        "ratio is a float of exact integers. One revenue aggregate + "
        "two group fits + one broadcast-sized reconciliation join — "
        "group-count-scale everywhere after the first shuffle."
    ),
    tags=("analytics", "extension", "timeseries", "forecast"),
)
def q_forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")
            )
            .cast("long")
            .alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    ).localCheckpoint(eager=True)
    hz = rev.agg((F.max("m") + 1).cast("long").alias("h"))

    def ols_forecast(df, keys):
        fit = df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("m").cast("long").alias("sx"),
            F.sum("cents").cast("long").alias("sy"),
            F.sum(F.col("m") * F.col("m")).cast("long").alias("sxx"),
            F.sum(F.col("m") * F.col("cents")).cast("long").alias("sxy"),
        )
        slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        fc = F.round(
            slope * F.col("h") + (F.col("sy") - F.col("sx") * slope) / F.col("n")
        ).cast("long")
        return fit.crossJoin(F.broadcast(hz)).select(*keys, fc.alias("fq"))

    nfc = ols_forecast(rev, ["nation", "region"])
    rrev = rev.groupBy("region", "m").agg(F.sum("cents").cast("long").alias("cents"))
    rfc = ols_forecast(rrev, ["region"]).withColumnRenamed("fq", "rfq")
    tot = nfc.groupBy("region").agg(F.sum("fq").cast("long").alias("sum_fq"))
    return (
        nfc.join(F.broadcast(rfc), "region")
        .join(F.broadcast(tot), "region")
        .select(
            "nation",
            "region",
            stable_round(F.col("fq") / 100.0, 6).alias("base_forecast"),
            stable_round(F.col("rfq") / 100.0, 6).alias("region_forecast"),
            stable_round(
                F.col("fq") * (F.col("rfq") * 1.0 / F.col("sum_fq")) / 100.0, 6
            ).alias("reconciled_forecast"),
        )
        .orderBy("region", "nation")
    )


@register(
    "q_maxmin_fairshare",
    oracle="""
WITH u AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS d
    FROM events GROUP BY user_id
),
pos AS (SELECT d FROM u WHERE d > 0),
n AS (
    SELECT CAST(count(*) AS BIGINT) AS nu, CAST(sum(d) AS BIGINT) AS total,
           CAST(sum(d) // 2 AS BIGINT) AS budget
    FROM pos
),
g AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM pos GROUP BY d),
pre AS (
    SELECT d, cnt,
           CAST(coalesce(sum(d * cnt) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS sx,
           CAST(coalesce(sum(cnt) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cx
    FROM g
),
vstar AS (
    SELECT min(d) AS v FROM pre CROSS JOIN n
    WHERE sx + (nu - cx) * d >= budget
),
sol AS (
    SELECT p.sx, p.cx FROM pre p JOIN vstar ON p.d = vstar.v
)
SELECT nu AS n_users, total AS total_demand_cents, budget AS budget_cents,
       (round(((budget - sx) * 1.0 / (nu - cx) / 100.0) * 1000000.0)
        / 1000000.0) AS water_level,
       cx AS n_fully_satisfied,
       CAST(nu - cx AS BIGINT) AS n_capped
FROM n CROSS JOIN sol
""",
    description=(
        "Max-min fair allocation (water-filling) of a spend budget "
        "(50% of total demand) across users: the unique level L with "
        "sum(min(demand_i, L)) = budget — every demand below L fully "
        "satisfied, everyone else capped at L — the allocation rule "
        "behind fair queuing, rate limiting, and quota splitting. "
        "The crossing point comes from exclusive prefix sums over the "
        "DISTINCT demand values (two-phase bucketed carry on the "
        "Spark side, so no data-scale single-partition sort), then L "
        "is one exact division (budget - S_below)/(n - C_below). "
        "Integer cents throughout; monotonicity of the water function "
        "makes min(v | g(v) >= B) the exact crossing bracket."
    ),
    tags=("analytics", "extension", "systems", "scale-pattern"),
)
def q_maxmin_fairshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_prefix

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("d")
    )
    pos = u.filter(F.col("d") > 0).select("d")
    n = pos.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("d").cast("long").alias("total"),
        F.expr("sum(d) div 2").cast("long").alias("budget"),
    )
    g = pos.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pre = bucketed_prefix(
        g,
        buckets=[F.expr("d div 4096")],
        order_by=[F.asc("d")],
        value=F.col("d") * F.col("cnt"),
        agg="sum",
        exclusive=True,
        out_col="sx",
    )
    pre = bucketed_prefix(
        pre,
        buckets=[F.expr("d div 4096")],
        order_by=[F.asc("d")],
        value=F.col("cnt"),
        agg="sum",
        exclusive=True,
        out_col="cx",
    )
    pre = pre.crossJoin(F.broadcast(n))
    vstar = pre.filter(
        F.col("sx") + (F.col("nu") - F.col("cx")) * F.col("d") >= F.col("budget")
    ).agg(F.min("d").alias("v"))
    sol = pre.join(F.broadcast(vstar), pre.d == F.col("v")).select("sx", "cx")
    level = (F.col("budget") - F.col("sx")) * 1.0 / (F.col("nu") - F.col("cx")) / 100.0
    return (
        n.crossJoin(F.broadcast(sol))
        .select(
            F.col("nu").alias("n_users"),
            F.col("total").alias("total_demand_cents"),
            F.col("budget").alias("budget_cents"),
            stable_round(level, 6).alias("water_level"),
            F.col("cx").alias("n_fully_satisfied"),
            (F.col("nu") - F.col("cx")).cast("long").alias("n_capped"),
        )
    )


@register(
    "q_price_index",
    oracle="""
WITH pq AS (
    SELECT l_partkey AS pk, CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                           AS DOUBLE)
                      / sum(CAST(round(l_quantity) AS BIGINT))) AS BIGINT) AS p,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
base AS (SELECT pk, p AS p0, q AS q0 FROM pq WHERE yr = 1995),
cur AS (SELECT pk, yr, p, q FROM pq WHERE yr > 1995),
j AS (
    SELECT cur.yr, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cur.p * base.q0) AS BIGINT) AS l_num,
           CAST(sum(base.p0 * base.q0) AS BIGINT) AS l_den,
           CAST(sum(cur.p * cur.q) AS BIGINT) AS p_num,
           CAST(sum(base.p0 * cur.q) AS BIGINT) AS p_den
    FROM cur JOIN base ON base.pk = cur.pk
    GROUP BY 1
)
SELECT yr AS year, n_parts,
       (round((l_num * 1.0 / l_den) * 1000000.0) / 1000000.0) AS laspeyres,
       (round((p_num * 1.0 / p_den) * 1000000.0) / 1000000.0) AS paasche,
       (round(sqrt((l_num * 1.0 / l_den) * (p_num * 1.0 / p_den))
              * 1000000.0) / 1000000.0) AS fisher
FROM j
ORDER BY yr
""",
    description=(
        "Index-number price measurement over the order history: "
        "Laspeyres (base-1995 quantity weights), Paasche (current "
        "weights) and Fisher ideal (their geometric mean) for every "
        "year vs the 1995 base, over parts traded in both periods — "
        "the CPI/deflator machinery, and the canonical demonstration "
        "of substitution bias (Laspeyres >= Fisher >= Paasche when "
        "buyers shift away from price risers). Per-(part, year) unit "
        "prices are quantized to integer cents-per-unit, so every "
        "index numerator/denominator folds as an exact BIGINT "
        "price*quantity mass; each index is one float division. One "
        "aggregate + one self-join on part id — group-scale "
        "everywhere after the first shuffle."
    ),
    tags=("analytics", "extension", "econometrics"),
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    pq = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / F.sum(F.round("l_quantity").cast("long"))
            )
            .cast("long")
            .alias("p"),
            F.sum(F.round("l_quantity").cast("long")).cast("long").alias("q"),
        )
    ).localCheckpoint(eager=True)
    base = pq.filter(F.col("yr") == 1995).select(
        "pk", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    cur = pq.filter(F.col("yr") > 1995)
    j = (
        cur.join(base, "pk")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum(F.col("p") * F.col("q0")).cast("long").alias("l_num"),
            F.sum(F.col("p0") * F.col("q0")).cast("long").alias("l_den"),
            F.sum(F.col("p") * F.col("q")).cast("long").alias("p_num"),
            F.sum(F.col("p0") * F.col("q")).cast("long").alias("p_den"),
        )
    )
    lasp = F.col("l_num") * 1.0 / F.col("l_den")
    paas = F.col("p_num") * 1.0 / F.col("p_den")
    return j.select(
        F.col("yr").alias("year"),
        "n_parts",
        stable_round(lasp, 6).alias("laspeyres"),
        stable_round(paas, 6).alias("paasche"),
        stable_round(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).orderBy("year")


@register(
    "q_join_strategy_advisor",
    oracle="""
WITH sides AS (
    SELECT 'customer' AS rel, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(8 + 8 + strlen(c_name) + strlen(c_mktsegment)
                    + 8) AS BIGINT) AS est_bytes
    FROM customer
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT),
           CAST(sum(8 + 8 + strlen(o_orderstatus) + 8 + 8
                    + strlen(o_orderpriority)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem', CAST(count(*) AS BIGINT),
           CAST(sum(8 * 8 + strlen(l_returnflag)
                    + strlen(l_linestatus)) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'nation', CAST(count(*) AS BIGINT),
           CAST(sum(8 + strlen(n_name) + 8) AS BIGINT)
    FROM nation
)
SELECT rel, n_rows, est_bytes,
       (round((est_bytes / 1048576.0) * 1000000.0) / 1000000.0) AS est_mib,
       CASE WHEN est_bytes < 10485760 THEN 'broadcast'
            ELSE 'shuffle' END AS join_strategy,
       CAST(greatest(1, CAST(ceil(est_bytes / 134217728.0) AS BIGINT))
            AS BIGINT) AS suggested_shuffle_partitions
FROM sides
ORDER BY rel
""",
    description=(
        "Join-strategy advisor from MEASURED relation statistics: "
        "exact row counts and serialized-width estimates (fixed-width "
        "columns at 8 bytes + octet_length of every string column) "
        "for the four join-graph relations, with the decision a "
        "cost-based planner makes from them — broadcast below the "
        "10 MiB threshold (nation, customer at small SF), shuffle "
        "with ~128 MiB-target partition counts otherwise. This is "
        "the pre-flight audit that catches the classic plan bug of "
        "broadcasting a 'dimension' that grew into a fact: the "
        "advisor reads the DATA, not the table name. One aggregate "
        "per relation, unioned — embarrassingly parallel; the same "
        "statistics drive AQE, and at 100 TB this runs on parquet "
        "footer stats plus a row-width sample instead of a full scan."
    ),
    tags=("analytics", "extension", "systems", "scale-pattern"),
)
def q_join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation")

    def side(df, rel, width):
        return df.agg(
            F.lit(rel).alias("rel"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(width).cast("long").alias("est_bytes"),
        )

    sides = (
        side(
            cust,
            "customer",
            F.lit(8 + 8)
            + F.octet_length("c_name")
            + F.octet_length("c_mktsegment")
            + F.lit(8),
        )
        .unionAll(
            side(
                orders,
                "orders",
                F.lit(8 + 8)
                + F.octet_length("o_orderstatus")
                + F.lit(8 + 8)
                + F.octet_length("o_orderpriority"),
            )
        )
        .unionAll(
            side(
                li,
                "lineitem",
                F.lit(8 * 8)
                + F.octet_length("l_returnflag")
                + F.octet_length("l_linestatus"),
            )
        )
        .unionAll(
            side(nat, "nation", F.lit(8) + F.octet_length("n_name") + F.lit(8))
        )
    )
    return sides.select(
        "rel",
        "n_rows",
        "est_bytes",
        stable_round(F.col("est_bytes") / 1048576.0, 6).alias("est_mib"),
        F.when(F.col("est_bytes") < 10485760, "broadcast")
        .otherwise("shuffle")
        .alias("join_strategy"),
        F.greatest(
            F.lit(1), F.ceil(F.col("est_bytes") / 134217728.0).cast("long")
        )
        .cast("long")
        .alias("suggested_shuffle_partitions"),
    ).orderBy("rel")


@register(
    "q_kmv_set_algebra",
    oracle=f"""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
ex AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
           (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb,
           (SELECT CAST(count(*) AS BIGINT) FROM a
             WHERE user_id IN (SELECT user_id FROM b)) AS ni
),
ha AS (
    SELECT user_id, {_CH_MD5.format(x="'kmvs:' || CAST(user_id AS VARCHAR)")} AS hv
    FROM a
),
hb AS (
    SELECT user_id, {_CH_MD5.format(x="'kmvs:' || CAST(user_id AS VARCHAR)")} AS hv
    FROM b
),
sa AS (
    SELECT user_id, hv FROM
    (SELECT user_id, hv, row_number() OVER (ORDER BY hv, user_id) AS r FROM ha)
    WHERE r <= 128
),
sb AS (
    SELECT user_id, hv FROM
    (SELECT user_id, hv, row_number() OVER (ORDER BY hv, user_id) AS r FROM hb)
    WHERE r <= 128
),
un AS (
    SELECT user_id, hv FROM (
        SELECT user_id, hv,
               row_number() OVER (ORDER BY hv, user_id) AS r
        FROM (SELECT user_id, hv FROM sa UNION SELECT user_id, hv FROM sb)
    ) WHERE r <= 128
),
kth AS (SELECT CAST(max(hv) AS BIGINT) AS hk,
               CAST(count(*) AS BIGINT) AS k FROM un),
jacc AS (
    SELECT CAST(count(*) AS BIGINT) AS shared
    FROM un WHERE user_id IN (SELECT user_id FROM sa)
              AND user_id IN (SELECT user_id FROM sb)
),
est AS (
    SELECT CASE WHEN k < 128 THEN k * 1.0
           ELSE (k - 1.0) * {_CH_P} / hk END AS d_union,
           shared * 1.0 / k AS jac
    FROM kth CROSS JOIN jacc
)
SELECT ex.na AS exact_a, ex.nb AS exact_b, ex.ni AS exact_intersection,
       CAST(ex.na + ex.nb - ex.ni AS BIGINT) AS exact_union,
       CAST(round(d_union) AS BIGINT) AS est_union,
       CAST(round(d_union * jac) AS BIGINT) AS est_intersection,
       (round(jac * 1000000.0) / 1000000.0) AS est_jaccard
FROM ex CROSS JOIN est
""",
    description=(
        "KMV synopsis set algebra: union cardinality from the merged "
        "min-128 synopsis ((k-1)*H/h_k), Jaccard from the shared "
        "fraction WITHIN the merged synopsis, and intersection = "
        "jaccard * union — the estimates exact distinct partials "
        "cannot give you (distinct counts don't compose across sets; "
        "KMV synopses do, by merge-and-retruncate). Exact answers "
        "computed alongside. This is how audience-overlap and "
        "cross-table distinct dashboards run at warehouse scale: "
        "128 BIGINTs per set, any boolean algebra after the fact. "
        "Deterministic md5 hashing keeps the whole synopsis "
        "oracle-checkable; min-k sides ride WindowGroupLimit."
    ),
    tags=("analytics", "extension", "sketch", "scale-pattern"),
)
def q_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import md5_hash31

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    ex = (
        a.agg(F.count(F.lit(1)).cast("long").alias("na"))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).cast("long").alias("nb"))))
        .crossJoin(
            F.broadcast(
                a.join(b, "user_id", "left_semi").agg(
                    F.count(F.lit(1)).cast("long").alias("ni")
                )
            )
        )
    )
    hv = md5_hash31(F.concat(F.lit("kmvs:"), F.col("user_id").cast("string")))

    def synopsis(df):
        w = Window.orderBy(F.asc("hv"), F.asc("user_id"))
        return (
            df.select("user_id", hv.alias("hv"))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 128)
            .select("user_id", "hv")
        )

    sa = synopsis(a).localCheckpoint(eager=True)
    sb = synopsis(b).localCheckpoint(eager=True)
    wu = Window.orderBy(F.asc("hv"), F.asc("user_id"))
    un = (
        sa.union(sb)
        .distinct()
        .withColumn("r", F.row_number().over(wu))
        .filter(F.col("r") <= 128)
        .select("user_id", "hv")
    ).localCheckpoint(eager=True)
    kth = un.agg(
        F.max("hv").cast("long").alias("hk"), F.count(F.lit(1)).cast("long").alias("k")
    )
    jacc = (
        un.join(sa.select("user_id"), "user_id", "left_semi")
        .join(sb.select("user_id"), "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    d_union = F.when(F.col("k") < 128, F.col("k") * 1.0).otherwise(
        (F.col("k") - 1.0) * 2147483647 / F.col("hk")
    )
    jac = F.col("shared") * 1.0 / F.col("k")
    return (
        ex.crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(jacc))
        .select(
            F.col("na").alias("exact_a"),
            F.col("nb").alias("exact_b"),
            F.col("ni").alias("exact_intersection"),
            (F.col("na") + F.col("nb") - F.col("ni")).cast("long").alias("exact_union"),
            F.round(d_union).cast("long").alias("est_union"),
            F.round(d_union * jac).cast("long").alias("est_intersection"),
            stable_round(jac, 6).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Round-6 continuation-5: weighted median + duplicate-charge screen


@register(
    "q_weighted_median",
    oracle="""
WITH pts AS (
    SELECT l_returnflag AS flag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
           CAST(l_quantity AS BIGINT) AS w
    FROM lineitem
),
grp AS (
    SELECT flag, c, CAST(sum(w) AS BIGINT) AS w
    FROM pts GROUP BY flag, c
),
cum AS (
    SELECT flag, c, w,
           CAST(sum(w) OVER (PARTITION BY flag ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cw,
           CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
    FROM grp
)
SELECT flag AS l_returnflag, tw AS total_qty,
       (round((CAST(min(CASE WHEN 2 * cw >= tw THEN c END) AS DOUBLE) / 100.0)
              * 1000000.0) / 1000000.0) AS weighted_median_price
FROM cum GROUP BY flag, tw
ORDER BY flag
""",
    description=(
        "Quantity-weighted median unit price per return flag (lower "
        "weighted median: smallest price whose cumulative quantity "
        "reaches half the total) — the volume-representative 'typical "
        "price' that q_group_median's row-weighted median misstates "
        "when big orders cluster at different price points. The "
        "cumulative weight rides the distinct-cents table PARTITIONED "
        "by group (value-domain-bounded frames, fully distributed); "
        "all arithmetic is exact integers until the final cents->"
        "dollars division."
    ),
    tags=("agg", "analytics", "extension", "parity"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    grp = pts.groupBy("flag", "c").agg(F.sum("w").cast("long").alias("w"))
    wc = (
        Window.partitionBy("flag")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("flag")
    cum = grp.select(
        "flag",
        "c",
        F.sum("w").over(wc).cast("long").alias("cw"),
        F.sum("w").over(wt).cast("long").alias("tw"),
    )
    return (
        cum.groupBy("flag", "tw")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("c"))).alias("med_c")
        )
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("tw").alias("total_qty"),
            stable_round(F.col("med_c").cast("double") / 100.0, 6).alias(
                "weighted_median_price"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_duplicate_charge_screen",
    oracle="""
WITH p AS (
    SELECT event_id, user_id, ts, CAST(round(value) AS BIGINT) AS d
    FROM events WHERE event_type = 'purchase'
),
pairs AS (
    SELECT a.user_id, a.d AS amount_dollars,
           a.event_id AS first_id, b.event_id AS second_id,
           CAST(abs(epoch_us(a.ts) - epoch_us(b.ts)) // 60000000 AS BIGINT)
               AS gap_minutes
    FROM p a JOIN p b
      ON a.user_id = b.user_id AND a.d = b.d AND a.event_id < b.event_id
    WHERE abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 86400000000
)
SELECT user_id, amount_dollars, first_id, second_id, gap_minutes
FROM pairs
ORDER BY user_id, amount_dollars, first_id, second_id
""",
    description=(
        "Duplicate-charge screen: purchase pairs from the SAME user for "
        "the SAME whole-dollar amount within 24 hours — the classic "
        "double-billing / retry-storm fraud-ops query, complementing "
        "q_trailing_hour_sum's velocity feature with an exact pair-"
        "level explanation. The self-join is an equi-join on the "
        "(user, amount) composite key — candidate fanout is bounded by "
        "per-key purchase counts, never an all-pairs product — with "
        "the time band as a post-join filter; at 100 TB both sides "
        "co-partition on the same key."
    ),
    tags=("analytics", "quality", "extension", "parity"),
)
def q_duplicate_charge_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.col("value")).cast("long").alias("d"),
        )
    )
    a = p.select(
        F.col("user_id"),
        F.col("d"),
        F.col("event_id").alias("first_id"),
        F.col("ts").alias("ts_a"),
    )
    b = p.select(
        F.col("user_id"),
        F.col("d"),
        F.col("event_id").alias("second_id"),
        F.col("ts").alias("ts_b"),
    )
    gap_us = F.abs(F.unix_micros("ts_a") - F.unix_micros("ts_b"))
    pairs = (
        a.join(b, ["user_id", "d"])
        .filter(F.col("first_id") < F.col("second_id"))
        .filter(gap_us <= 86400000000)
        .select(
            "user_id",
            F.col("d").alias("amount_dollars"),
            "first_id",
            "second_id",
            F.floor(gap_us / 60000000).cast("long").alias("gap_minutes"),
        )
    )
    return pairs.orderBy("user_id", "amount_dollars", "first_id", "second_id")


_SEGMIG_CUT = "2024-01-16"


@register(
    "q_segment_migration",
    oracle=f"""
WITH u AS (
    SELECT user_id,
           CAST(count(CASE WHEN CAST(ts AS DATE) < DATE '{_SEGMIG_CUT}'
                           THEN 1 END) AS BIGINT) AS x_pre,
           CAST(count(CASE WHEN CAST(ts AS DATE) >= DATE '{_SEGMIG_CUT}'
                           THEN 1 END) AS BIGINT) AS x_post
    FROM events GROUP BY user_id
),
act AS (SELECT * FROM u WHERE x_pre > 0 AND x_post > 0),
tiled AS (
    SELECT user_id,
           CAST(ntile(3) OVER (ORDER BY x_pre, user_id) AS BIGINT) AS seg_pre,
           CAST(ntile(3) OVER (ORDER BY x_post, user_id) AS BIGINT) AS seg_post
    FROM act
),
mat AS (
    SELECT seg_pre, seg_post, CAST(count(*) AS BIGINT) AS n_users
    FROM tiled GROUP BY 1, 2
),
rowtot AS (
    SELECT seg_pre, CAST(sum(n_users) AS BIGINT) AS row_n FROM mat GROUP BY 1
)
SELECT m.seg_pre, m.seg_post, m.n_users,
       (round((m.n_users * 1.0 / r.row_n) * 1000000.0) / 1000000.0) AS row_share,
       (m.seg_pre = m.seg_post) AS retained_segment
FROM mat m JOIN rowtot r ON m.seg_pre = r.seg_pre
ORDER BY m.seg_pre, m.seg_post
""",
    description=(
        "Activity-segment migration matrix: users active in BOTH month "
        "halves get an activity tercile per half (low/mid/high) and the "
        "3x3 transition matrix shows who climbed, who churned toward "
        "low, and the diagonal retention share — the segment-dynamics "
        "view behind q_rfm_segmentation's static snapshot and "
        "q_weekly_churn's binary cut. Both tercile assignments ride the "
        "bucketed_rank + closed-form ntile carry (no global sort); the "
        "matrix itself is a 9-row aggregate."
    ),
    tags=("analytics", "extension", "parity"),
)
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank, ntile_from_rank

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_SEGMIG_CUT).cast("date")
    pre = F.to_date("ts") < cut
    u = ev.groupBy("user_id").agg(
        F.count(F.when(pre, 1)).cast("long").alias("x_pre"),
        F.count(F.when(~pre, 1)).cast("long").alias("x_post"),
    )
    act = u.filter((F.col("x_pre") > 0) & (F.col("x_post") > 0)).localCheckpoint(
        eager=True
    )
    n = act.agg(F.count(F.lit(1)).cast("long").alias("nu"))
    r_pre = bucketed_rank(
        act,
        buckets=[F.col("x_pre")],
        order_by=[F.col("x_pre"), F.col("user_id")],
        out_col="rn_pre",
    ).select("user_id", "rn_pre")
    r_post = bucketed_rank(
        act,
        buckets=[F.col("x_post")],
        order_by=[F.col("x_post"), F.col("user_id")],
        out_col="rn_post",
    ).select("user_id", "rn_post")
    tiled = (
        r_pre.join(r_post, "user_id")
        .crossJoin(F.broadcast(n))
        .select(
            ntile_from_rank(F.col("rn_pre"), F.col("nu"), 3).alias("seg_pre"),
            ntile_from_rank(F.col("rn_post"), F.col("nu"), 3).alias("seg_post"),
        )
    )
    mat = tiled.groupBy("seg_pre", "seg_post").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rowtot = mat.groupBy("seg_pre").agg(F.sum("n_users").cast("long").alias("row_n"))
    return (
        mat.join(F.broadcast(rowtot), "seg_pre")
        .select(
            "seg_pre",
            "seg_post",
            "n_users",
            stable_round(F.col("n_users") * 1.0 / F.col("row_n"), 6).alias(
                "row_share"
            ),
            (F.col("seg_pre") == F.col("seg_post")).alias("retained_segment"),
        )
        .orderBy("seg_pre", "seg_post")
    )


@register(
    "q_lognormal_fit",
    oracle="""
WITH u AS (
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend_c
    FROM events GROUP BY user_id
),
pts AS (
    SELECT spend_c,
           CAST(round(ln(spend_c) * 1000000.0) AS BIGINT) AS lx
    FROM u WHERE spend_c > 0
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(lx) AS BIGINT) AS s1,
           sum(CAST(lx AS HUGEINT) * lx) AS s2,
           CAST(sum(spend_c) AS BIGINT) AS sc
    FROM pts
),
fit AS (
    SELECT n, sc,
           ((CAST(s1 AS DOUBLE) / n) / 1000000.0) AS mu,
           (sqrt(CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / (n * (n - 1.0))) / 1000000.0) AS sigma
    FROM m
)
SELECT n AS n_users,
       (round(mu * 1000000.0) / 1000000.0) AS mu_log,
       (round(sigma * 1000000.0) / 1000000.0) AS sigma_log,
       (round((exp(mu) / 100.0) * 1000000.0) / 1000000.0) AS implied_median,
       (round((exp(mu + sigma * sigma / 2.0) / 100.0) * 1000000.0) / 1000000.0)
           AS implied_mean,
       (round((CAST(sc AS DOUBLE) / n / 100.0) * 1000000.0) / 1000000.0)
           AS actual_mean
FROM fit
""",
    description=(
        "Lognormal fit of per-user total spend (the canonical heavy-"
        "tailed spend model): mu/sigma from exact moments of 1e-6-"
        "quantized log-cents, with the implied median exp(mu) and "
        "implied mean exp(mu + sigma^2/2) reported NEXT TO the exact "
        "actual mean — the gap between implied and actual mean is the "
        "immediate lognormality diagnostic (a perfect fit matches; "
        "heavier tails overshoot). Completes the parametric-fit family "
        "(gamma, Weibull, Gumbel, negbin, Zipf, Hill). One grouped "
        "pass + one 4-moment fold."
    ),
    tags=("stats", "extension", "parity"),
)
def q_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("spend_c")
        )
        .filter(F.col("spend_c") > 0)
    )
    pts = u.select(
        "spend_c", F.round(F.log("spend_c") * 1000000.0).cast("long").alias("lx")
    )
    dec = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").cast("long").alias("s1"),
        F.sum(F.col("lx").cast(dec) * F.col("lx").cast(dec)).alias("s2"),
        F.sum("spend_c").cast("long").alias("sc"),
    )
    n = F.col("n")
    mu = (F.col("s1").cast("double") / n) / 1000000.0
    sigma = (
        F.sqrt(
            (n.cast(dec) * F.col("s2") - F.col("s1").cast(dec) * F.col("s1").cast(dec)).cast(
                "double"
            )
            / (n * (n - 1.0))
        )
        / 1000000.0
    )
    return m.select(
        n.alias("n_users"),
        stable_round(mu, 6).alias("mu_log"),
        stable_round(sigma, 6).alias("sigma_log"),
        stable_round(F.exp(mu) / 100.0, 6).alias("implied_median"),
        stable_round(F.exp(mu + sigma * sigma / 2.0) / 100.0, 6).alias(
            "implied_mean"
        ),
        stable_round(F.col("sc").cast("double") / n / 100.0, 6).alias("actual_mean"),
    )
