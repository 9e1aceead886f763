"""Evaluation / experimentation / monitoring / governance queries:
time-constrained funnels, distribution drift (Jensen-Shannon), resampled
uncertainty (bootstrap / permutation), sequential and variance-reduced
experiment readouts (Haybittle-Peto, CUPED, power analysis,
Mann-Whitney), offline change-point localization (CUSUM), forecast
backtesting, corpus laws (Zipf / Heaps), in-engine classification
(IRLS logistic + calibration ECE), sketch evaluation (CMS), Markov
chain analysis, attribution (Shapley), watermark lateness auditing, and
privacy/erasure governance (k-anonymity, GDPR delete plans).

These extend the analytics families (queries_analytics / queries_corpus)
with the operations an ML-platform team runs AROUND a pipeline — scoring
it, monitoring it, and certifying its outputs — rather than inside it.
Reference scope for parity context is `etl_app/etl_script.py:74-119`;
everything here is extension surface. All queries are oracle-checked
against DuckDB with identical arithmetic on both sides; randomized
procedures (bootstrap resamples, permutation shuffles, experiment arms)
use counter-based md5 randomness so both engines draw the exact same
realizations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table


@register(
    "q_window_funnel",
    oracle="""
WITH s1 AS (
    SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
                  OVER (PARTITION BY user_id) AS t1
    FROM events
),
s2 AS (
    SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1
                        AND ts <= t1 + INTERVAL 7 DAY THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
    FROM s1
),
s3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                        AND ts <= t1 + INTERVAL 7 DAY THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
    FROM s2
)
SELECT count(DISTINCT user_id)                                        AS n_users,
       count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END)      AS n_depth1,
       count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END)      AS n_depth2,
       count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END)      AS n_depth3,
       (round((count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) * 1.0 /
               count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END)) * 1000000.0)
        / 1000000.0)                                                  AS depth2_rate,
       (round((count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) * 1.0 /
               count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END)) * 1000000.0)
        / 1000000.0)                                                  AS depth3_rate
FROM s3
""",
    description=(
        "Time-CONSTRAINED strict funnel (ClickHouse windowFunnel "
        "semantics): signup -> view -> purchase must all land inside a "
        "7-day window ANCHORED at the user's first signup — the variant "
        "q_funnel_steps deliberately leaves unbounded. Same "
        "self-join-free shape: one shuffle clusters each user's events, "
        "stacked window-mins resolve step times (each conditioned on "
        "following the previous step AND fitting the anchor window), one "
        "global aggregate counts survivors per depth. Funnel depth adds "
        "window-min columns, never joins, so the plan stays one "
        "data-sized exchange at any depth."
    ),
    tags=("events", "extension"),
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    horizon = F.col("t1") + F.expr("INTERVAL 7 DAYS")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "view")
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= horizon),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= horizon),
                F.col("ts"),
            )
        ).over(w),
    )
    n1 = F.count_distinct(F.when(F.col("t1").isNotNull(), F.col("user_id")))
    n2 = F.count_distinct(F.when(F.col("t2").isNotNull(), F.col("user_id")))
    n3 = F.count_distinct(F.when(F.col("t3").isNotNull(), F.col("user_id")))
    return s3.agg(
        F.count_distinct("user_id").alias("n_users"),
        n1.alias("n_depth1"),
        n2.alias("n_depth2"),
        n3.alias("n_depth3"),
        stable_round(n2 / n1, 6).alias("depth2_rate"),
        stable_round(n3 / n2, 6).alias("depth3_rate"),
    )


@register(
    "q_js_divergence",
    oracle="""
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
counts AS (
    SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2
),
vocab  AS (SELECT w, CAST(sum(n) AS BIGINT) AS m FROM counts GROUP BY w),
vsize  AS (SELECT CAST(count(*) AS BIGINT) AS v,
                  CAST(sum(m) AS BIGINT) AS tot_all FROM vocab),
totals AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM counts GROUP BY source),
grid AS (
    SELECT t.source, vb.w,
           (coalesce(c.n, 0) + 1.0) / (t.tot + vs.v)  AS p,
           (vb.m + 1.0) / (vs.tot_all + vs.v)         AS q
    FROM totals t
    CROSS JOIN vocab vb
    CROSS JOIN vsize vs
    LEFT JOIN counts c ON c.source = t.source AND c.w = vb.w
)
SELECT source,
       (round((0.5 * sum(p * ln(2.0 * p / (p + q))) +
               0.5 * sum(q * ln(2.0 * q / (p + q)))) * 1000000.0)
        / 1000000.0) AS jsd_nats
FROM grid
GROUP BY source
""",
    description=(
        "Jensen-Shannon divergence of each source's unigram distribution "
        "from the CORPUS distribution (Laplace-smoothed over the shared "
        "vocabulary) — the symmetric, bounded ([0, ln 2]) drift score "
        "that complements q_source_kl_divergence's asymmetric pairwise "
        "view: one number per source, stable when a token is absent on "
        "either side, and O(sources x vocab) instead of O(sources^2 x "
        "vocab). Everything reduces on (source, token) counts; the "
        "corpus marginal is the token-level rollup of the same counts, "
        "so the corpus is never re-tokenized."
    ),
    tags=("text", "extension", "corpus"),
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    counts = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n"))
    vocab = counts.groupBy("w").agg(F.sum("n").alias("m"))
    vsize = vocab.agg(
        F.count(F.lit(1)).alias("v"), F.sum("m").alias("tot_all")
    )
    totals = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    grid = (
        totals.crossJoin(vocab)
        .crossJoin(F.broadcast(vsize))
        .join(counts, ["source", "w"], "left")
        .select(
            "source",
            "w",
            ((F.coalesce("n", F.lit(0)) + F.lit(1.0)) / (F.col("tot") + F.col("v"))).alias("p"),
            ((F.col("m") + F.lit(1.0)) / (F.col("tot_all") + F.col("v"))).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    return grid.groupBy("source").agg(
        stable_round(
            F.lit(0.5) * F.sum(p * F.log(F.lit(2.0) * p / (p + q)))
            + F.lit(0.5) * F.sum(q * F.log(F.lit(2.0) * q / (p + q))),
            6,
        ).alias("jsd_nats")
    )


# Poisson(1) CDF thresholds for the deterministic bootstrap: identical
# literals on both engines so the drawn weight is bit-identical.
_POIS1_CDF = (0.36787944, 0.73575888, 0.91969860, 0.98101184, 0.99634015)


def _pois1_sql(u: str) -> str:
    c0, c1, c2, c3, c4 = _POIS1_CDF
    return (
        f"CASE WHEN {u} < {c0} THEN 0 WHEN {u} < {c1} THEN 1 "
        f"WHEN {u} < {c2} THEN 2 WHEN {u} < {c3} THEN 3 "
        f"WHEN {u} < {c4} THEN 4 ELSE 5 END"
    )


@register(
    "q_bootstrap_ci",
    oracle=f"""
WITH daily AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
grid AS (
    SELECT d.day, d.rev_cents, t.b,
           ((('0x' || substring(md5(d.day || ':' || CAST(t.b AS VARCHAR)), 1, 8))::BIGINT
             % 1000000) / 1000000.0) AS u
    FROM daily d CROSS JOIN (SELECT unnest(range(200)) AS b) t
),
boots AS (
    SELECT b,
           CAST(sum({_pois1_sql('u')} * rev_cents) AS BIGINT) AS wsum,
           CAST(sum({_pois1_sql('u')}) AS BIGINT)             AS w
    FROM grid GROUP BY b
),
means AS (
    SELECT (round((wsum / (100.0 * w)) * 1000000.0) / 1000000.0) AS mean_b
    FROM boots WHERE w > 0
),
ranked AS (
    SELECT mean_b, row_number() OVER (ORDER BY mean_b) AS rn,
           count(*) OVER () AS nb
    FROM means
),
pt AS (
    SELECT (round((sum(rev_cents) / (100.0 * count(*))) * 1000000.0) / 1000000.0)
               AS mean_daily_revenue
    FROM daily
)
SELECT pt.mean_daily_revenue,
       max(CASE WHEN rn = greatest(1, CAST(round(0.025 * nb) AS BIGINT))
                THEN mean_b END) AS ci_lo,
       max(CASE WHEN rn = CAST(round(0.975 * nb) AS BIGINT)
                THEN mean_b END) AS ci_hi,
       CAST(max(nb) AS BIGINT)   AS n_boot
FROM ranked CROSS JOIN pt
GROUP BY pt.mean_daily_revenue
""",
    description=(
        "Deterministic Poisson bootstrap 95% CI for mean daily purchase "
        "revenue — the uncertainty band a metrics report should carry "
        "and a point estimate cannot. Classic bootstrap resampling is "
        "irreproducible across engines; here each (day, replicate) draws "
        "its Poisson(1) resample weight from a counter-based md5 uniform "
        "(the q_hash_split bridge), so DuckDB and Spark materialize THE "
        "SAME 200 resamples and the CI matches hash-exact. Daily revenue "
        "is exact integer cents, each replicate mean is one rounded "
        "division, and the CI bounds are order-statistic selections at "
        "positions round(0.025*nb)/round(0.975*nb) of the SURVIVING "
        "replicate count — no floating accumulation anywhere "
        "an engine could reorder. The grid is days x B (replicate-"
        "parallel, partial-aggregated); the day-level pre-aggregate is "
        "the only data-sized pass."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    )
    c0, c1, c2, c3, c4 = _POIS1_CDF
    u = F.col("u")
    pois_w = (
        F.when(u < c0, 0)
        .when(u < c1, 1)
        .when(u < c2, 2)
        .when(u < c3, 3)
        .when(u < c4, 4)
        .otherwise(5)
    )
    grid = (
        daily.select(
            "day",
            "rev_cents",
            F.explode(F.sequence(F.lit(0), F.lit(199))).alias("b"),
        )
        .withColumn(
            "u",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("day"), F.col("b").cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 1000000
            )
            / 1000000.0,
        )
        .withColumn("w", pois_w)
    )
    boots = grid.groupBy("b").agg(
        F.sum(F.col("w") * F.col("rev_cents")).alias("wsum"),
        F.sum("w").alias("w"),
    )
    means = boots.filter(F.col("w") > 0).select(
        stable_round(F.col("wsum") / (F.lit(100.0) * F.col("w")), 6).alias("mean_b")
    )
    # B = 200 rows: the keyless rank window runs over the replicate
    # table, never the data.
    wr = Window.orderBy("mean_b")
    ranked = means.select(
        "mean_b",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
    )
    pt = daily.agg(
        stable_round(F.sum("rev_cents") / (F.lit(100.0) * F.count(F.lit(1))), 6).alias(
            "mean_daily_revenue"
        )
    )
    # CI positions derive from the SURVIVING replicate count nb (a
    # replicate can draw all-zero Poisson weights and be dropped), so
    # the quantile selection stays 2.5%/97.5% instead of silently
    # shifting when nb < 200.
    rn_lo = F.greatest(F.lit(1).cast("long"), F.round(F.lit(0.025) * F.col("nb")).cast("long"))
    rn_hi = F.round(F.lit(0.975) * F.col("nb")).cast("long")
    return (
        ranked.crossJoin(F.broadcast(pt))
        .groupBy("mean_daily_revenue")
        .agg(
            F.max(F.when(F.col("rn") == rn_lo, F.col("mean_b"))).alias("ci_lo"),
            F.max(F.when(F.col("rn") == rn_hi, F.col("mean_b"))).alias("ci_hi"),
            F.max("nb").alias("n_boot"),
        )
        .select("mean_daily_revenue", "ci_lo", "ci_hi", "n_boot")
    )


@register(
    "q_cusum_changepoint",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev_cents) AS BIGINT) AS t FROM daily
),
curve AS (
    SELECT day,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT)             AS idx,
           CAST(sum(rev_cents) OVER (ORDER BY day) AS BIGINT)           AS cum,
           n, t
    FROM daily CROSS JOIN tot
),
stat AS (
    SELECT day, idx, cum, n, t, CAST(n * cum - idx * t AS BIGINT) AS s
    FROM curve
),
best AS (
    SELECT * FROM stat ORDER BY abs(s) DESC, day ASC LIMIT 1
)
SELECT CAST(day AS VARCHAR) AS changepoint_day,
       s                    AS cusum_stat,
       (round((cum / (100.0 * idx)) * 1000000.0) / 1000000.0) AS mean_before,
       CASE WHEN n > idx
            THEN (round(((t - cum) / (100.0 * (n - idx))) * 1000000.0) / 1000000.0)
       END                  AS mean_after
FROM best
""",
    description=(
        "Offline CUSUM change-point localization over the daily purchase "
        "revenue series — where did the level shift? The statistic is "
        "kept INTEGER-exact by clearing the mean-subtraction denominator: "
        "S_d = N*cumsum_d - d*Total in BIGINT cents (argmax |S| is "
        "invariant to the scaling), so both engines agree bit-for-bit "
        "with no per-step re-rounding recursion. One data-sized pass "
        "builds the daily aggregate; the cumulative window and the "
        "argmax ride the days-sized series (metadata scale — at 100 TB "
        "the series is still one row per day). Complements "
        "q_seasonal_anomaly (which flags days) by localizing the single "
        "strongest regime shift with before/after level estimates."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("rev_cents").alias("t")
    )
    # Days-sized series: the keyless windows run over one row per day.
    wo = Window.orderBy("day")
    curve = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "day",
            F.row_number().over(wo).cast("long").alias("idx"),
            F.sum("rev_cents").over(wo).alias("cum"),
            "n",
            "t",
        )
        .withColumn("s", F.col("n") * F.col("cum") - F.col("idx") * F.col("t"))
    )
    best = curve.orderBy(F.abs(F.col("s")).desc(), F.col("day").asc()).limit(1)
    return best.select(
        F.col("day").cast("string").alias("changepoint_day"),
        F.col("s").alias("cusum_stat"),
        stable_round(F.col("cum") / (F.lit(100.0) * F.col("idx")), 6).alias("mean_before"),
        F.when(
            F.col("n") > F.col("idx"),
            stable_round(
                (F.col("t") - F.col("cum")) / (F.lit(100.0) * (F.col("n") - F.col("idx"))), 6
            ),
        ).alias("mean_after"),
    )


@register(
    "q_seasonal_naive_backtest",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
lagged AS (
    SELECT day, rev_cents,
           lag(rev_cents, 7) OVER (ORDER BY day) AS f_snaive,
           lag(rev_cents, 1) OVER (ORDER BY day) AS f_naive
    FROM daily
),
eval AS (SELECT * FROM lagged WHERE f_snaive IS NOT NULL),
folds AS (
    SELECT CAST(count(*) AS BIGINT)                        AS n_eval_days,
           CAST(sum(abs(rev_cents - f_snaive)) AS BIGINT)  AS sae_s,
           CAST(sum(abs(rev_cents - f_naive)) AS BIGINT)   AS sae_n,
           sum(2.0 * abs(rev_cents - f_snaive) / (abs(rev_cents) + abs(f_snaive)))
               AS smape_sum_s,
           sum(2.0 * abs(rev_cents - f_naive) / (abs(rev_cents) + abs(f_naive)))
               AS smape_sum_n
    FROM eval
)
SELECT n_eval_days,
       (round((sae_s / (100.0 * n_eval_days)) * 1000000.0) / 1000000.0) AS mae_snaive,
       (round((sae_n / (100.0 * n_eval_days)) * 1000000.0) / 1000000.0) AS mae_naive,
       (round((smape_sum_s / n_eval_days) * 1000000.0) / 1000000.0)     AS smape_snaive,
       (round((smape_sum_n / n_eval_days) * 1000000.0) / 1000000.0)     AS smape_naive,
       CASE WHEN sae_s < sae_n THEN 'seasonal_naive'
            WHEN sae_s > sae_n THEN 'naive' ELSE 'tie' END              AS mae_winner
FROM folds
""",
    description=(
        "Rolling-origin backtest of the two canonical forecast baselines "
        "— seasonal-naive (same weekday last week) vs naive (yesterday) "
        "— over daily purchase revenue: MAE and sMAPE per model plus the "
        "winner. This is the acceptance gate the EWMA/Holt smoothers "
        "(q_ewma_smoothing / q_holt_smoothing) should have to beat "
        "before anyone ships a fancier model. The winner is decided on "
        "exact INTEGER absolute-error sums in cents (no float "
        "comparison); sMAPE terms are fixed-expression rationals of "
        "integers folded once. One data-sized pass; lags and folds ride "
        "the days-sized series."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    )
    wo = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "rev_cents",
        F.lag("rev_cents", 7).over(wo).alias("f_snaive"),
        F.lag("rev_cents", 1).over(wo).alias("f_naive"),
    ).filter(F.col("f_snaive").isNotNull())
    r = F.col("rev_cents")
    folds = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_days"),
        F.sum(F.abs(r - F.col("f_snaive"))).alias("sae_s"),
        F.sum(F.abs(r - F.col("f_naive"))).alias("sae_n"),
        F.sum(
            F.lit(2.0) * F.abs(r - F.col("f_snaive")) / (F.abs(r) + F.abs(F.col("f_snaive")))
        ).alias("smape_sum_s"),
        F.sum(
            F.lit(2.0) * F.abs(r - F.col("f_naive")) / (F.abs(r) + F.abs(F.col("f_naive")))
        ).alias("smape_sum_n"),
    )
    n = F.col("n_eval_days")
    return folds.select(
        "n_eval_days",
        stable_round(F.col("sae_s") / (F.lit(100.0) * n), 6).alias("mae_snaive"),
        stable_round(F.col("sae_n") / (F.lit(100.0) * n), 6).alias("mae_naive"),
        stable_round(F.col("smape_sum_s") / n, 6).alias("smape_snaive"),
        stable_round(F.col("smape_sum_n") / n, 6).alias("smape_naive"),
        F.when(F.col("sae_s") < F.col("sae_n"), F.lit("seasonal_naive"))
        .when(F.col("sae_s") > F.col("sae_n"), F.lit("naive"))
        .otherwise(F.lit("tie"))
        .alias("mae_winner"),
    )


@register(
    "q_kanonymity_audit",
    oracle="""
WITH cells AS (
    SELECT event_type,
           CAST(dayofweek(ts) AS BIGINT)               AS wd,
           CAST(floor(value / 10.0) AS BIGINT)         AS value_band,
           CAST(count(DISTINCT user_id) AS BIGINT)     AS k,
           CAST(count(*) AS BIGINT)                    AS n_events
    FROM events
    GROUP BY 1, 2, 3
),
classed AS (
    SELECT CASE WHEN k >= 5 THEN '5+' ELSE CAST(k AS VARCHAR) END AS k_class,
           (k < 5)                                                AS at_risk,
           n_events
    FROM cells
),
hist AS (
    SELECT k_class, at_risk,
           CAST(count(*) AS BIGINT)      AS n_groups,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM classed GROUP BY 1, 2
)
SELECT k_class, at_risk, n_groups, n_events,
       (round((n_events * 1.0 / sum(n_events) OVER ()) * 1000000.0) / 1000000.0)
           AS event_share
FROM hist
""",
    description=(
        "k-anonymity audit over the quasi-identifier tuple (event_type, "
        "weekday, value decile-band): how many QI cells isolate fewer "
        "than k=5 distinct users, and what share of event rows sits in "
        "those re-identifiable cells. The governance complement to "
        "q_redact_pii — redaction handles direct identifiers, this "
        "quantifies indirect linkage risk before a dataset is released "
        "for training. One data-sized partial-aggregated pass builds the "
        "QI cells; the class histogram and the share window run over the "
        "handful of k-classes (the only keyless window is 6 rows)."
    ),
    tags=("quality", "extension", "governance"),
)
def q_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("wd"),
        F.floor(F.col("value") / 10.0).cast("long").alias("value_band"),
    ).agg(
        F.count_distinct("user_id").alias("k"),
        F.count(F.lit(1)).alias("n_events"),
    )
    classed = cells.select(
        F.when(F.col("k") >= 5, F.lit("5+"))
        .otherwise(F.col("k").cast("string"))
        .alias("k_class"),
        (F.col("k") < 5).alias("at_risk"),
        "n_events",
    )
    hist = classed.groupBy("k_class", "at_risk").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_events").alias("n_events"),
    )
    return hist.select(
        "k_class",
        "at_risk",
        "n_groups",
        "n_events",
        stable_round(
            F.col("n_events") / F.sum("n_events").over(Window.partitionBy()), 6
        ).alias("event_share"),
    )


@register(
    "q_zipf_fit",
    oracle="""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
counts AS (
    SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
),
top AS (SELECT w, n FROM counts ORDER BY n DESC, w LIMIT 1000),
ranked AS (
    SELECT n, CAST(row_number() OVER (ORDER BY n DESC, w) AS BIGINT) AS r FROM top
),
pts AS (
    SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM ranked
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
           sum(x * x) AS sxx, sum(y * y) AS syy
    FROM pts
)
SELECT k AS n_terms,
       (round(((k * sxy - sx * sy) / (k * sxx - sx * sx)) * 1000000.0) / 1000000.0)
           AS zipf_slope,
       (round(((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k) * 1000000.0)
        / 1000000.0) AS log_intercept,
       (round((((k * sxy - sx * sy) * (k * sxy - sx * sy)) /
               ((k * sxx - sx * sx) * (k * syy - sy * sy))) * 1000000.0) / 1000000.0)
           AS r2
FROM m
""",
    description=(
        "Zipf's-law fit over the corpus token distribution: log-log OLS "
        "of frequency against rank for the top-1000 terms (slope ~ -1 "
        "for natural language; a flat slope flags synthetic/templated "
        "corpora, a cliff flags boilerplate). The corpus-law diagnostic "
        "next to q_token_entropy's per-doc view. The top-1000 cut is a "
        "distributed TakeOrderedAndProject with a total tie-break order "
        "(count desc, token asc) — the rank window then runs over 1000 "
        "rows, never the vocab; the OLS fold is the q_grouped_ols "
        "closed form over exact ln() points."
    ),
    tags=("text", "extension", "corpus"),
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("w").asc()).limit(1000)
    ranked = top.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("w").asc()))
        .cast("long")
        .alias("r"),
    )
    pts = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return m.select(
        k.alias("n_terms"),
        stable_round(slope, 6).alias("zipf_slope"),
        stable_round((sy - slope * sx) / k, 6).alias("log_intercept"),
        stable_round(
            ((k * sxy - sx * sy) * (k * sxy - sx * sy))
            / ((k * sxx - sx * sx) * (k * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "q_gdpr_delete_plan",
    oracle="""
WITH flagged AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                      % 100) < 5 THEN 1 ELSE 0 END AS del
    FROM events
),
parts AS (
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(del) AS BIGINT) AS n_delete
    FROM flagged GROUP BY 1
)
SELECT day, n_rows, n_delete,
       CAST(n_rows - n_delete AS BIGINT) AS n_kept,
       (round((n_delete * 1.0 / n_rows) * 1000000.0) / 1000000.0) AS delete_share,
       CASE WHEN n_delete = 0 THEN 'untouched' ELSE 'rewrite' END AS action
FROM parts
""",
    description=(
        "Right-to-be-forgotten delete plan (GDPR erasure): given a "
        "tombstone set (here the deterministic md5 5% of users standing "
        "in for the legal request list — at scale the list broadcast-"
        "anti-joins the fact table), compute per day-partition how many "
        "rows die, how many survive, and whether the partition needs a "
        "rewrite at all. Copy-on-write erasure costs one full rewrite "
        "of every TOUCHED partition — this manifest is what bounds the "
        "job before it runs, the erasure sibling of q_compaction_plan's "
        "bin-packing. One partial-aggregated pass; output is "
        "partition-count sized."
    ),
    tags=("quality", "extension", "governance"),
)
def q_gdpr_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tomb = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 100
        < 5
    )
    parts = ev.groupBy(F.col("ts").cast("date").cast("string").alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(tomb, 1).otherwise(0)).alias("n_delete"),
    )
    return parts.select(
        "day",
        "n_rows",
        "n_delete",
        (F.col("n_rows") - F.col("n_delete")).alias("n_kept"),
        stable_round(F.col("n_delete") / F.col("n_rows"), 6).alias("delete_share"),
        F.when(F.col("n_delete") == 0, F.lit("untouched"))
        .otherwise(F.lit("rewrite"))
        .alias("action"),
    )


@register(
    "q_power_analysis",
    oracle="""
WITH u AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY 1
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n_users, CAST(sum(conv) AS BIGINT) AS n_conv FROM u
),
calc AS (
    SELECT n_users, n_conv,
           (n_conv * 1.0 / n_users)       AS p1,
           (n_conv * 1.0 / n_users) * 1.1 AS p2
    FROM s
),
need AS (
    SELECT n_users, p1, p2,
           CAST(ceil(((1.959964 + 0.841621) * (1.959964 + 0.841621)) *
                     (p1 * (1 - p1) + p2 * (1 - p2)) /
                     ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm
    FROM calc
)
SELECT n_users,
       (round(p1 * 1000000.0) / 1000000.0) AS p_baseline,
       (round(p2 * 1000000.0) / 1000000.0) AS p_target,
       n_per_arm,
       CAST(2 * n_per_arm AS BIGINT)       AS n_total_required,
       (n_users >= 2 * n_per_arm)          AS feasible
FROM need
""",
    description=(
        "A/B pre-experiment power analysis: the sample size per arm "
        "needed to detect a +10% relative lift on the observed baseline "
        "conversion (same conversion definition as q_ab_test_ztest) at "
        "alpha=0.05 two-sided / 80% power — the go/no-go check that "
        "should run BEFORE the experiment the z-test reads out. Baseline "
        "comes from one per-user partial-aggregated pass; the formula is "
        "a fixed closed-form expression of two exact integer counts, so "
        "both engines agree bit-for-bit through the ceil()."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("conv")
    )
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
    )
    p1 = F.col("n_conv") / F.col("n_users")
    p2 = p1 * F.lit(1.1)
    za_zb = F.lit(1.959964 + 0.841621)
    n_per_arm = F.ceil(
        za_zb * za_zb * (p1 * (1 - p1) + p2 * (1 - p2)) / ((p2 - p1) * (p2 - p1))
    ).cast("long")
    return s.select(
        "n_users",
        stable_round(p1, 6).alias("p_baseline"),
        stable_round(p2, 6).alias("p_target"),
        n_per_arm.alias("n_per_arm"),
        (F.lit(2) * n_per_arm).cast("long").alias("n_total_required"),
        (F.col("n_users") >= F.lit(2) * n_per_arm).alias("feasible"),
    )


@register(
    "q_embedding_dim_audit",
    oracle="""
WITH grid AS (
    SELECT r.i AS dim, CAST(embedding[r.i] AS DOUBLE) AS x
    FROM embeddings e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) r
),
m AS (
    SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
           sum(x) AS sx, sum(x * x) AS sxx
    FROM grid GROUP BY 1
)
SELECT dim, n,
       (round((sx / n) * 1000000.0) / 1000000.0)                     AS mean_x,
       (round((sxx / n - (sx / n) * (sx / n)) * 1000000.0) / 1000000.0) AS var_x,
       (abs(sx / n) > 0.05 OR (sxx / n - (sx / n) * (sx / n)) < 0.008) AS anisotropy_flag
FROM m
""",
    description=(
        "Per-dimension embedding-space audit: coordinate mean and "
        "variance across the corpus, flagging dominant axes (|mean| > "
        "0.05 — the representation has a preferred direction) and dead/"
        "collapsed axes (variance < 0.008 vs the isotropic 1/64 = "
        "0.0156) — the dimension-collapse failure mode that silently "
        "destroys ANN recall and which the centroid-level "
        "q_embedding_drift cannot see. One posexplode partial-aggregated "
        "pass; output is dimensionality-sized (64 rows). The flag "
        "thresholds are fixed literals over identically-computed "
        "moments, so the booleans cannot drift between engines."
    ),
    tags=("similarity", "extension", "quality"),
)
def q_embedding_dim_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    grid = emb.select(F.posexplode("embedding").alias("pos", "xf")).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    m = grid.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mean * mean
    return m.select(
        "dim",
        "n",
        stable_round(mean, 6).alias("mean_x"),
        stable_round(var, 6).alias("var_x"),
        ((F.abs(mean) > 0.05) | (var < 0.008)).alias("anisotropy_flag"),
    )


def _logistic_features_sql() -> str:
    return """
SELECT CAST(ln(1.0 + sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)) AS DOUBLE) AS x1,
       CAST(ln(1.0 + sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)) AS DOUBLE)  AS x2,
       max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END)        AS y
FROM events GROUP BY user_id
""".strip()


def _register_logistic() -> None:
    from healthcare_etl_spark.operators.logistic import irls_oracle_sql, logistic_irls

    @register(
        "q_logistic_regression",
        oracle=irls_oracle_sql(_logistic_features_sql(), rounds=4),
        description=(
            "In-engine logistic regression by IRLS (4 rounds): "
            "P(conversion) ~ sigmoid(b0 + b1*ln(1+clicks) + "
            "b2*ln(1+views)) at user level, reporting coefficients, "
            "final log-likelihood and training accuracy — the "
            "classification member of the in-plan ML family "
            "(q_ridge_regression / q_kmeans_clusters / q_pca_projection "
            "/ q_nb_lang_confusion). Every round is ONE map-side-"
            "combined moment pass (9 Gram sums + 3 RHS) followed by a "
            "closed-form 3x3 Cramer solve; the 3-coefficient state "
            "crosses the driver as rounded doubles, k-means-centroid "
            "style — nothing data-sized ever leaves the executors. "
            "Moments and coefficients are 6dp-rounded each round, and "
            "the oracle unrolls the identical arithmetic per round, so "
            "both engines step through bit-identical model states."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_logistic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        features = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        )
        # 4 IRLS rounds re-scan this users-sized frame; persist so the
        # event-level shuffle is paid once, not five times.
        features = features.persist()
        try:
            return logistic_irls(features, rounds=4)
        finally:
            # Lazy result: unpersist AFTER the plan is built is safe —
            # blocks are dropped when the caller's action completes.
            features.unpersist()


_register_logistic()


@register(
    "q_watermark_audit",
    oracle="""
WITH o AS (
    SELECT event_id, epoch_us(ts) AS tu FROM events
),
wm AS (
    SELECT tu,
           max(tu) OVER (ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wmb
    FROM o
),
fl AS (
    SELECT tu // 300000000 AS win,
           CASE WHEN wmb IS NOT NULL AND wmb - tu > 600000000 THEN 1 ELSE 0 END AS late
    FROM wm
)
SELECT CAST(win AS BIGINT)                                    AS win_id,
       CAST(make_timestamp(CAST(win * 300000000 AS BIGINT)) AS VARCHAR) AS win_start,
       CAST(count(*) AS BIGINT)                               AS n_rows,
       CAST(sum(late) AS BIGINT)                              AS n_late,
       (round((sum(late) * 1.0 / count(*)) * 1000000.0) / 1000000.0) AS late_share
FROM fl GROUP BY 1, 2
""",
    description=(
        "Watermark lateness audit: for each 5-minute event-time window, "
        "how many rows WOULD a streaming job with a 10-minute watermark "
        "drop, given the observed arrival order (event_id as the arrival "
        "proxy)? The batch pre-flight that sizes withWatermark() before "
        "the q_stream_tumbling job ships. The running 'max event time "
        "seen so far' is a GLOBAL exclusive prefix-max, computed WITHOUT "
        "a single-partition sort: phase 1 takes each 4096-row arrival "
        "bucket's max (partial agg) and its within-bucket exclusive "
        "running max (window partitioned BY bucket — distributed); "
        "phase 2 prefix-maxes the bucket maxima (a bucket-count-sized "
        "frame, data/4096 — recurse the same trick for another 4096x if "
        "that ever matters) and broadcast-joins them back; each row's "
        "watermark = max(bucket-prefix, within-bucket prefix). Same "
        "two-phase carry the bucketed as-of join uses."
    ),
    tags=("events", "extension", "streaming-adjacent"),
)
def q_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.unix_micros("ts").alias("tu"),
        F.expr("event_id div 4096").alias("bkt"),
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows = base.withColumn("m_in", F.max("tu").over(w_in))
    bstats = base.groupBy("bkt").agg(F.max("tu").alias("bmax"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bprev = bstats.select("bkt", F.max("bmax").over(w_b).alias("bprev"))
    joined = rows.join(F.broadcast(bprev), "bkt")
    wmb = F.greatest(F.coalesce("m_in", F.lit(-1)), F.coalesce("bprev", F.lit(-1)))
    flagged = joined.select(
        F.expr("tu div 300000000").alias("win"),
        F.when((wmb >= 0) & (wmb - F.col("tu") > 600000000), 1).otherwise(0).alias("late"),
    )
    return flagged.groupBy("win").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("late").alias("n_late"),
        stable_round(F.sum("late") / F.count(F.lit(1)), 6).alias("late_share"),
    ).select(
        F.col("win").alias("win_id"),
        F.timestamp_micros(F.col("win") * 300000000).cast("string").alias("win_start"),
        "n_rows",
        "n_late",
        "late_share",
    )


def _markov_oracle_sql(rounds: int = 12) -> str:
    """Unrolled power-iteration mirror of q_markov_stationary: the
    transition matrix CTE, a uniform start vector over observed states,
    and per-round (vector x matrix) folds with 6dp re-rounding so the
    iterate matches the Spark driver-side chain bit-for-bit."""
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    parts = [
        """pairs AS (
    SELECT event_type AS f,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
    FROM events
)""",
        """cnt AS (
    SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM pairs WHERE t IS NOT NULL GROUP BY 1, 2
)""",
        """tot AS (SELECT f, CAST(sum(n) AS BIGINT) AS tn FROM cnt GROUP BY 1)""",
        f"""p AS (
    SELECT c.f, c.t, {r6('c.n * 1.0 / tot.tn')} AS p FROM cnt c JOIN tot ON c.f = tot.f
)""",
        # canonical state set: UNION of sources and targets, so a state
        # seen only as a target (or only as a source) still gets a row
        # on both engines (emitting 0.0 when unreached)
        """states AS (SELECT f AS s FROM cnt UNION SELECT t FROM cnt)""",
        """k AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM states)""",
        f"""v_0 AS (SELECT s, {r6('1.0 / kk')} AS v FROM states CROSS JOIN k)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""v_{r} AS (
    SELECT st.s, {r6('coalesce(sum(v.v * p.p), 0.0)')} AS v
    FROM states st
    LEFT JOIN p ON p.t = st.s
    LEFT JOIN v_{r - 1} v ON v.s = p.f
    GROUP BY st.s
)"""
        )
    joined = ",\n".join(parts)
    return f"""WITH {joined}
SELECT s AS state, v AS stationary_p FROM v_{rounds}
"""


def _markov_round6(x: float) -> float:
    """Half-away-from-zero 6dp rounding matching stable_round / DuckDB
    round() (Python's built-in round is banker's and would diverge)."""
    import math

    return math.copysign(math.floor(abs(x) * 1000000.0 + 0.5), x) / 1000000.0


@register(
    "q_markov_stationary",
    oracle=_markov_oracle_sql(12),
    description=(
        "Stationary distribution of the event-type Markov chain (where "
        "does a user's session flow settle?) by 12 power-iteration "
        "rounds over the transition matrix q_event_transitions "
        "estimates. The data-sized work is ONE lead()-window pass "
        "counting transitions; the matrix itself is |types|^2 = 25 "
        "numbers, so the iteration rides the driver exactly like the "
        "k-means centroid state — collecting it is metadata, not data. "
        "Matrix entries and every iterate are 6dp-rounded (sums taken "
        "in sorted-state order) so the chain is bit-identical to the "
        "oracle's unrolled vector-times-matrix CTEs."
    ),
    tags=("events", "extension", "analytics"),
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(w).alias("t"),
    ).filter(F.col("t").isNotNull())
    cnt = pairs.groupBy("f", "t").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("f").agg(F.sum("n").alias("tn"))
    prob = (
        cnt.join(tot, "f")
        .select("f", "t", stable_round(F.col("n") * 1.0 / F.col("tn"), 6).alias("p"))
    )
    # |types|^2 matrix: collecting it is metadata-scale, like k-means
    # centroids; the power iteration never touches the data again.
    # States = UNION of sources and targets (same canonical set as the
    # oracle), so sink-only states get a 0.0 row instead of vanishing.
    mat: dict[str, dict[str, float]] = {}
    seen: set[str] = set()
    for r in prob.collect():
        mat.setdefault(r["f"], {})[r["t"]] = r["p"]
        seen.add(r["f"])
        seen.add(r["t"])
    states = sorted(seen)
    v = {s: _markov_round6(1.0 / len(states)) for s in states}
    for _ in range(12):
        nxt: dict[str, float] = {}
        for s in states:
            acc = 0.0
            for f in states:
                acc += v.get(f, 0.0) * mat.get(f, {}).get(s, 0.0)
            nxt[s] = _markov_round6(acc)
        v = nxt
    out = [(s, float(v[s])) for s in states]
    return spark.createDataFrame(out, "state string, stationary_p double")


def _association_rules_cte() -> str:
    from healthcare_etl_spark.plans.queries_events import _SESSION_CTE

    return f"""
WITH {_SESSION_CTE},
types AS (
    SELECT DISTINCT user_id, session_seq, event_type FROM sess
),
n_sess AS (
    SELECT CAST(count(DISTINCT (user_id, session_seq)) AS BIGINT) AS total FROM sess
),
item AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_i FROM types GROUP BY 1
),
pair AS (
    SELECT a.event_type AS antecedent, b.event_type AS consequent,
           CAST(count(*) AS BIGINT) AS n_ab
    FROM types a
    JOIN types b ON a.user_id = b.user_id AND a.session_seq = b.session_seq
                AND a.event_type <> b.event_type
    GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, p.n_ab,
       (round((p.n_ab * 1.0 / ia.n_i) * 1000000.0) / 1000000.0) AS confidence,
       (round((p.n_ab * 1.0 * ns.total / (ia.n_i * ic.n_i)) * 1000000.0) / 1000000.0)
           AS lift
FROM pair p
JOIN item ia ON ia.event_type = p.antecedent
JOIN item ic ON ic.event_type = p.consequent
CROSS JOIN n_sess ns
"""


def _register_association_rules() -> None:
    @register(
        "q_association_rules",
        oracle=_association_rules_cte(),
        description=(
            "Directed association rules A -> B over session baskets "
            "with confidence and lift — the scoring pass that completes "
            "q_session_cooccurrence's a-priori candidate generation "
            "(co-occurrence gives support; rules need the per-item "
            "marginals too). The pair join runs on the distinct-reduced "
            "(session, type) sets, the item marginals are a types-sized "
            "broadcast, and lift's session total is a 1-row broadcast — "
            "so the only data-sized exchange is the sessionize shuffle "
            "the session CTE already pays."
        ),
        tags=("events", "extension", "analytics"),
    )
    def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.sessionize import sessionize

        ev = load_table(spark, sf_dir, "events")
        sess = sessionize(
            ev, key="user_id", ts="ts", gap_minutes=30.0, order_tiebreak="event_id"
        )
        types = sess.select("user_id", "session_seq", "event_type").distinct()
        n_sess = (
            sess.select("user_id", "session_seq")
            .distinct()
            .agg(F.count(F.lit(1)).alias("total"))
        )
        item = types.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_i"))
        a = types.select("user_id", "session_seq", F.col("event_type").alias("antecedent"))
        b = types.select(
            F.col("user_id").alias("u_b"),
            F.col("session_seq").alias("s_b"),
            F.col("event_type").alias("consequent"),
        )
        pair = (
            a.join(
                b,
                (a["user_id"] == b["u_b"])
                & (a["session_seq"] == b["s_b"])
                & (a["antecedent"] != b["consequent"]),
            )
            .groupBy("antecedent", "consequent")
            .agg(F.count(F.lit(1)).alias("n_ab"))
        )
        ia = item.select(F.col("event_type").alias("antecedent"), F.col("n_i").alias("n_a"))
        ic = item.select(F.col("event_type").alias("consequent"), F.col("n_i").alias("n_c"))
        return (
            pair.join(F.broadcast(ia), "antecedent")
            .join(F.broadcast(ic), "consequent")
            .crossJoin(F.broadcast(n_sess))
            .select(
                "antecedent",
                "consequent",
                "n_ab",
                stable_round(F.col("n_ab") * 1.0 / F.col("n_a"), 6).alias("confidence"),
                stable_round(
                    F.col("n_ab") * 1.0 * F.col("total") / (F.col("n_a") * F.col("n_c")), 6
                ).alias("lift"),
            )
        )


_register_association_rules()


def _shapley_oracle() -> str:
    from healthcare_etl_spark.plans.queries_events import _SESSION_CTE

    v = lambda c, vv, s: (  # noqa: E731
        f"coalesce(max(CASE WHEN has_c = {c} AND has_v = {vv} AND has_s = {s} "
        f"THEN rate END), 0.0)"
    )
    return f"""
WITH {_SESSION_CTE},
flags AS (
    SELECT user_id, session_seq,
           max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)    AS has_c,
           max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)     AS has_v,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)   AS has_s,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM sess GROUP BY 1, 2
),
combos AS (
    SELECT has_c, has_v, has_s,
           CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS nc,
           (round((sum(conv) * 1.0 / count(*)) * 1000000.0) / 1000000.0) AS rate
    FROM flags GROUP BY 1, 2, 3
),
pv AS (
    SELECT CAST(sum(n) AS BIGINT) AS n_sessions,
           CAST(sum(nc) AS BIGINT) AS n_converted,
           {v(0, 0, 0)} AS v000, {v(1, 0, 0)} AS v100,
           {v(0, 1, 0)} AS v010, {v(0, 0, 1)} AS v001,
           {v(1, 1, 0)} AS v110, {v(1, 0, 1)} AS v101,
           {v(0, 1, 1)} AS v011, {v(1, 1, 1)} AS v111
    FROM combos
)
SELECT n_sessions, n_converted,
       (round(((1.0 / 3.0) * (v100 - v000) + (1.0 / 6.0) * (v110 - v010)
             + (1.0 / 6.0) * (v101 - v001) + (1.0 / 3.0) * (v111 - v011))
             * 1000000.0) / 1000000.0) AS shapley_click,
       (round(((1.0 / 3.0) * (v010 - v000) + (1.0 / 6.0) * (v110 - v100)
             + (1.0 / 6.0) * (v011 - v001) + (1.0 / 3.0) * (v111 - v101))
             * 1000000.0) / 1000000.0) AS shapley_view,
       (round(((1.0 / 3.0) * (v001 - v000) + (1.0 / 6.0) * (v101 - v100)
             + (1.0 / 6.0) * (v011 - v010) + (1.0 / 3.0) * (v111 - v110))
             * 1000000.0) / 1000000.0) AS shapley_signup
FROM pv
"""


def _register_shapley() -> None:
    @register(
        "q_shapley_attribution",
        oracle=_shapley_oracle(),
        description=(
            "Shapley-value channel attribution over session baskets — "
            "the game-theoretic upgrade of q_attribution_last_touch / "
            "q_attribution_linear: the characteristic function is the "
            "conversion rate of sessions with each exact exposure "
            "subset of {click, view, signup}, and each channel's "
            "Shapley value is the closed-form weighted sum of its "
            "marginal contributions over the 2^3 subsets (weights "
            "1/3, 1/6, 1/6, 1/3). One sessionize shuffle -> one "
            "sessions-sized flag aggregate -> an 8-row subset table -> "
            "fixed literal arithmetic; channel count grows the subset "
            "table 2^n but the data-sized work not at all."
        ),
        tags=("events", "extension", "analytics"),
    )
    def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.sessionize import sessionize

        ev = load_table(spark, sf_dir, "events")
        sess = sessionize(
            ev, key="user_id", ts="ts", gap_minutes=30.0, order_tiebreak="event_id"
        )
        has = lambda t: F.max(  # noqa: E731
            F.when(F.col("event_type") == t, 1).otherwise(0)
        )
        flags = sess.groupBy("user_id", "session_seq").agg(
            has("click").alias("has_c"),
            has("view").alias("has_v"),
            has("signup").alias("has_s"),
            has("purchase").alias("conv"),
        )
        combos = flags.groupBy("has_c", "has_v", "has_s").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("conv").alias("nc"),
            stable_round(F.sum("conv") * 1.0 / F.count(F.lit(1)), 6).alias("rate"),
        )
        vv = lambda c, v, s: F.coalesce(  # noqa: E731
            F.max(
                F.when(
                    (F.col("has_c") == c) & (F.col("has_v") == v) & (F.col("has_s") == s),
                    F.col("rate"),
                )
            ),
            F.lit(0.0),
        )
        pv = combos.agg(
            F.sum("n").alias("n_sessions"),
            F.sum("nc").alias("n_converted"),
            vv(0, 0, 0).alias("v000"), vv(1, 0, 0).alias("v100"),
            vv(0, 1, 0).alias("v010"), vv(0, 0, 1).alias("v001"),
            vv(1, 1, 0).alias("v110"), vv(1, 0, 1).alias("v101"),
            vv(0, 1, 1).alias("v011"), vv(1, 1, 1).alias("v111"),
        )
        third, sixth = F.lit(1.0 / 3.0), F.lit(1.0 / 6.0)
        c = F.col
        return pv.select(
            "n_sessions",
            "n_converted",
            stable_round(
                third * (c("v100") - c("v000")) + sixth * (c("v110") - c("v010"))
                + sixth * (c("v101") - c("v001")) + third * (c("v111") - c("v011")),
                6,
            ).alias("shapley_click"),
            stable_round(
                third * (c("v010") - c("v000")) + sixth * (c("v110") - c("v100"))
                + sixth * (c("v011") - c("v001")) + third * (c("v111") - c("v101")),
                6,
            ).alias("shapley_view"),
            stable_round(
                third * (c("v001") - c("v000")) + sixth * (c("v101") - c("v100"))
                + sixth * (c("v011") - c("v010")) + third * (c("v111") - c("v110")),
                6,
            ).alias("shapley_signup"),
        )


_register_shapley()


def _ece_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    return f"""WITH {joined},
scored AS (
    SELECT y, (1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))) AS p
    FROM feat CROSS JOIN {final} b
),
bins AS (
    SELECT least(CAST(floor(p * 10.0) AS BIGINT), 9) AS bin, p, y FROM scored
),
stats AS (
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           {r6('sum(p) / count(*)')} AS mean_p,
           {r6('sum(y) * 1.0 / count(*)')} AS conv_rate
    FROM bins GROUP BY bin
),
weighted AS (
    SELECT bin, n, mean_p, conv_rate,
           {r6('abs(conv_rate - mean_p)')} AS gap,
           (n * 1.0 / sum(n) OVER ()) AS wgt
    FROM stats
)
SELECT bin, n, mean_p, conv_rate, gap,
       {r6('sum(wgt * gap) OVER ()')} AS ece
FROM weighted
"""


def _register_calibration_ece() -> None:
    @register(
        "q_calibration_ece",
        oracle=_ece_oracle(),
        description=(
            "Reliability diagram + expected calibration error for the "
            "IRLS logistic model (q_logistic_regression): fitted "
            "probabilities fall into 10 bins, each bin reports its "
            "mean predicted p vs its realized conversion rate, and ECE "
            "folds the bin-weighted gaps — the standard answer to 'is "
            "0.7 from this model actually 70%?' that accuracy cannot "
            "give. The fit reuses logistic_fit (4 moment passes); the "
            "scoring pass is one more scan binned by a fixed literal "
            "rule; the ECE window rides the 10-row bin table. Gaps and "
            "ECE are computed from the 6dp-rounded bin statistics, so "
            "both engines fold identical numbers."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        features = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(features, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            bins = features.select(
                F.least(F.floor(p * 10.0).cast("long"), F.lit(9)).alias("bin"),
                p.alias("p"),
                F.col("y"),
            )
            stats = bins.groupBy("bin").agg(
                F.count(F.lit(1)).alias("n"),
                stable_round(F.sum("p") / F.count(F.lit(1)), 6).alias("mean_p"),
                stable_round(F.sum("y") * 1.0 / F.count(F.lit(1)), 6).alias("conv_rate"),
            )
            w_all = Window.partitionBy()
            gap = F.abs(F.col("conv_rate") - F.col("mean_p"))
            weighted = stats.select(
                "bin",
                "n",
                "mean_p",
                "conv_rate",
                stable_round(gap, 6).alias("gap"),
                (F.col("n") * 1.0 / F.sum("n").over(w_all)).alias("wgt"),
            )
            return weighted.select(
                "bin",
                "n",
                "mean_p",
                "conv_rate",
                "gap",
                stable_round(F.sum(F.col("wgt") * F.col("gap")).over(w_all), 6).alias("ece"),
            )
        finally:
            features.unpersist()


_register_calibration_ece()


@register(
    "q_cms_eval",
    oracle="""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
exact AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
cells AS (
    SELECT i, bucket, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(range(4)) AS i, w FROM tok
    ) t, LATERAL (SELECT (('0x' || substring(md5('cms' || CAST(i AS VARCHAR) || ':' || w), 1, 8))::BIGINT % 1024) AS bucket)
    GROUP BY i, bucket
),
probe_cells AS (
    SELECT e.w, e.n, g.i,
           (('0x' || substring(md5('cms' || CAST(g.i AS VARCHAR) || ':' || e.w), 1, 8))::BIGINT % 1024) AS bucket
    FROM exact e CROSS JOIN (SELECT unnest(range(4)) AS i) g
),
est AS (
    SELECT w, max(n) AS n, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
    FROM probe_cells LEFT JOIN cells USING (i, bucket)
    GROUP BY w
),
err AS (SELECT n, est, CAST(est - n AS BIGINT) AS over_err FROM est)
SELECT CAST(count(*) AS BIGINT)                                   AS n_tokens,
       CAST(sum(CASE WHEN over_err = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       (round((sum(CASE WHEN over_err = 0 THEN 1 ELSE 0 END) * 1.0 / count(*))
              * 1000000.0) / 1000000.0)                           AS exact_share,
       (round((sum(over_err) * 1.0 / count(*)) * 1000000.0) / 1000000.0)
                                                                  AS mean_overestimate,
       CAST(max(over_err) AS BIGINT)                              AS max_overestimate,
       CAST(min(over_err) AS BIGINT)                              AS min_overestimate
FROM err
""",
    description=(
        "Count-min sketch accuracy evaluation against exact token "
        "counts — the third member of the sketch-eval family "
        "(q_minhash_eval for Jaccard banding, q_ann_recall_eval for "
        "LSH): every vocab term is probed through the same 4x1024 "
        "salted-md5 sketch q_cms_counts builds, and the overestimate "
        "distribution (CMS never underestimates — min_overestimate "
        "must be 0) tells you whether the width fits the vocab before "
        "anyone trusts the estimates. Sketch build is the one "
        "data-sized pass; probing is vocab x depth against the "
        "broadcast 4096-cell sketch; errors are exact BIGINTs."
    ),
    tags=("text", "extension", "sketch"),
)
def q_cms_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    exact = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))

    def bucket(col, i_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cms"), i_col.cast("string"), F.lit(":"), col)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1024
        )

    cells = (
        toks.select(
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"), F.col("w")
        )
        .select("i", bucket(F.col("w"), F.col("i")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe_cells = exact.select(
        "w", "n", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    ).select("w", "n", "i", bucket(F.col("w"), F.col("i")).alias("bucket"))
    est = (
        probe_cells.join(F.broadcast(cells), ["i", "bucket"], "left")
        .groupBy("w")
        .agg(
            F.max("n").alias("n"),
            F.min(F.coalesce("c", F.lit(0))).alias("est"),
        )
    )
    err = est.select("n", "est", (F.col("est") - F.col("n")).alias("over_err"))
    exact_ind = F.when(F.col("over_err") == 0, 1).otherwise(0)
    return err.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(exact_ind).alias("n_exact"),
        stable_round(F.sum(exact_ind) * 1.0 / F.count(F.lit(1)), 6).alias("exact_share"),
        stable_round(F.sum("over_err") * 1.0 / F.count(F.lit(1)), 6).alias(
            "mean_overestimate"
        ),
        F.max("over_err").alias("max_overestimate"),
        F.min("over_err").alias("min_overestimate"),
    )


@register(
    "q_sequential_ab_monitor",
    oracle="""
WITH users AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a,
           min(CAST(ts AS DATE)) AS u_day,
           min(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN CAST(ts AS DATE) END) AS c_day
    FROM events GROUP BY user_id
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
enter AS (
    SELECT u_day AS day,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ea,
           CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS eb
    FROM users GROUP BY 1
),
convd AS (
    SELECT c_day AS day,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
    FROM users WHERE c_day IS NOT NULL GROUP BY 1
),
cum AS (
    SELECT d.day,
           CAST(sum(coalesce(e.ea, 0)) OVER (ORDER BY d.day) AS BIGINT) AS n_a,
           CAST(sum(coalesce(e.eb, 0)) OVER (ORDER BY d.day) AS BIGINT) AS n_b,
           CAST(sum(coalesce(c.ca, 0)) OVER (ORDER BY d.day) AS BIGINT) AS conv_a,
           CAST(sum(coalesce(c.cb, 0)) OVER (ORDER BY d.day) AS BIGINT) AS conv_b
    FROM days d
    LEFT JOIN enter e ON e.day = d.day
    LEFT JOIN convd c ON c.day = d.day
),
zed AS (
    SELECT CAST(day AS VARCHAR) AS day, n_a, n_b, conv_a, conv_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
                     AND conv_a + conv_b < n_a + n_b
                THEN (round(((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                      / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                             * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                             * (1.0 / n_a + 1.0 / n_b))) * 1000000.0) / 1000000.0)
           END AS z_score
    FROM cum
)
SELECT day, n_a, n_b, conv_a, conv_b, z_score,
       coalesce(abs(z_score) > 2.797, FALSE) AS boundary_crossed
FROM zed
""",
    description=(
        "Sequential A/B monitoring (Haybittle-Peto rule): the pooled "
        "two-proportion z-statistic recomputed on each day's CUMULATIVE "
        "experiment state — users enter at their first event, convert "
        "at their first qualifying purchase — with interim looks "
        "flagged only past the conservative |z| > 2.797 boundary "
        "(peeking at the q_ab_test_ztest statistic daily at 1.96 "
        "inflates false positives severalfold). One per-user pass "
        "derives entry/conversion days, two day-keyed aggregates give "
        "daily increments, and the cumulative windows ride the "
        "days-sized calendar — the data is never rescanned per look, "
        "which is what makes daily monitoring affordable at 100 TB."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_sequential_ab_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    users = ev.groupBy("user_id").agg(
        F.first(in_a).alias("in_a"),
        F.min(F.col("ts").cast("date")).alias("u_day"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                F.col("ts").cast("date"),
            )
        ).alias("c_day"),
    )
    days = ev.select(F.col("ts").cast("date").alias("day")).distinct()
    enter = users.groupBy(F.col("u_day").alias("day")).agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ea"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("eb"),
    )
    convd = (
        users.filter(F.col("c_day").isNotNull())
        .groupBy(F.col("c_day").alias("day"))
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("cb"),
        )
    )
    wo = Window.orderBy("day")
    cum = (
        days.join(enter, "day", "left")
        .join(convd, "day", "left")
        .select(
            "day",
            F.sum(F.coalesce("ea", F.lit(0))).over(wo).alias("n_a"),
            F.sum(F.coalesce("eb", F.lit(0))).over(wo).alias("n_b"),
            F.sum(F.coalesce("ca", F.lit(0))).over(wo).alias("conv_a"),
            F.sum(F.coalesce("cb", F.lit(0))).over(wo).alias("conv_b"),
        )
    )
    na, nb = F.col("n_a"), F.col("n_b")
    ca, cb = F.col("conv_a"), F.col("conv_b")
    pooled = (ca + cb) * 1.0 / (na + nb)
    z = stable_round(
        (ca * 1.0 / na - cb * 1.0 / nb)
        / F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)),
        6,
    )
    zed = cum.select(
        F.col("day").cast("string").alias("day"),
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.when(
            (na > 0) & (nb > 0) & (ca + cb > 0) & (ca + cb < na + nb), z
        ).alias("z_score"),
    )
    return zed.withColumn(
        "boundary_crossed", F.coalesce(F.abs(F.col("z_score")) > 2.797, F.lit(False))
    )


@register(
    "q_permutation_test",
    oracle="""
WITH uv AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS v_cents,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a
    FROM events GROUP BY user_id
),
obs AS (
    SELECT (round((sum(CASE WHEN in_a THEN v_cents ELSE 0 END) * 1.0
                   / (100.0 * sum(CASE WHEN in_a THEN 1 ELSE 0 END))
                 - sum(CASE WHEN NOT in_a THEN v_cents ELSE 0 END) * 1.0
                   / (100.0 * sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END)))
                 * 1000000.0) / 1000000.0) AS d_obs
    FROM uv
),
grid AS (
    SELECT u.v_cents, t.b,
           (('0x' || substring(md5('perm' || CAST(t.b AS VARCHAR) || ':'
                                    || CAST(u.user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS pa
    FROM uv u CROSS JOIN (SELECT unnest(range(200)) AS b) t
),
perms AS (
    SELECT b,
           (round((sum(CASE WHEN pa THEN v_cents ELSE 0 END) * 1.0
                   / (100.0 * sum(CASE WHEN pa THEN 1 ELSE 0 END))
                 - sum(CASE WHEN NOT pa THEN v_cents ELSE 0 END) * 1.0
                   / (100.0 * sum(CASE WHEN NOT pa THEN 1 ELSE 0 END)))
                 * 1000000.0) / 1000000.0) AS d_b
    FROM grid GROUP BY b
)
SELECT max(o.d_obs)                                                AS observed_diff,
       CAST(count(*) AS BIGINT)                                    AS n_perms,
       CAST(sum(CASE WHEN abs(p.d_b) >= abs(o.d_obs) THEN 1 ELSE 0 END) AS BIGINT)
                                                                   AS n_as_extreme,
       (round(((1.0 + sum(CASE WHEN abs(p.d_b) >= abs(o.d_obs) THEN 1 ELSE 0 END))
               / (1.0 + count(*))) * 1000000.0) / 1000000.0)       AS p_value
FROM perms p CROSS JOIN obs o
""",
    description=(
        "Permutation test for the arm difference in mean per-user "
        "purchase value — the nonparametric companion to "
        "q_ab_test_ztest for metrics too skewed for a z approximation. "
        "Classic permutation is irreproducible across engines; here "
        "each of the 200 label shuffles draws its arm reassignment "
        "from a counter-based md5 bit (the q_bootstrap_ci discipline), "
        "so both engines evaluate THE SAME permutations: per-user "
        "value is exact integer cents, each permuted mean-difference "
        "is BIGINT sums and one rounded division, and the p-value is "
        "the add-one-smoothed exceedance count. The grid is users x B "
        "(partial-aggregated); at 100 TB you'd sample users first — "
        "the permutation mechanics are unchanged."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    uv = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("v_cents"),
        F.first(in_a).alias("in_a"),
    )
    def mean_diff(flag):
        sa = F.sum(F.when(flag, F.col("v_cents")).otherwise(0)) * 1.0
        na = F.sum(F.when(flag, 1).otherwise(0))
        sb = F.sum(F.when(~flag, F.col("v_cents")).otherwise(0)) * 1.0
        nb = F.sum(F.when(~flag, 1).otherwise(0))
        return stable_round(sa / (F.lit(100.0) * na) - sb / (F.lit(100.0) * nb), 6)

    obs = uv.agg(mean_diff(F.col("in_a")).alias("d_obs"))
    grid = uv.select(
        "user_id",
        "v_cents",
        F.explode(F.sequence(F.lit(0), F.lit(199))).alias("b"),
    ).withColumn(
        "pa",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
    )
    perms = grid.groupBy("b").agg(mean_diff(F.col("pa")).alias("d_b"))
    extreme = F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    return perms.crossJoin(F.broadcast(obs)).agg(
        F.max("d_obs").alias("observed_diff"),
        F.count(F.lit(1)).alias("n_perms"),
        F.sum(extreme).alias("n_as_extreme"),
        stable_round(
            (F.lit(1.0) + F.sum(extreme)) / (F.lit(1.0) + F.count(F.lit(1))), 6
        ).alias("p_value"),
    )


@register(
    "q_unpivot",
    oracle="""
WITH daily AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           event_type,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM events
    WHERE event_type IN ('click', 'view', 'signup', 'purchase', 'error')
    GROUP BY 1, 2
)
SELECT day, event_type, rev_cents FROM daily
""",
    description=(
        "Unpivot / melt (the inverse of q_pivot, closing the reshape "
        "pair): the day x event-type revenue matrix is built wide with "
        "pivot(), then melted back to long (day, event_type, rev_cents) "
        "rows with the native unpivot operator, dropping the NULL "
        "cells pivot manufactured for absent combinations. The oracle "
        "is the direct long-form aggregate the round-trip must "
        "reproduce exactly — integer-cent values make the equality "
        "bit-for-bit. Both reshapes are projections around ONE "
        "day-keyed partial aggregate; unpivot itself is a generator "
        "expression, no shuffle."
    ),
    tags=("relational", "extension"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "signup", "purchase", "error"]
    wide = (
        ev.filter(F.col("event_type").isin(types))
        .groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .pivot("event_type", types)
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
    )
    long = wide.unpivot("day", types, "event_type", "rev_cents")
    return long.filter(F.col("rev_cents").isNotNull())


@register(
    "q_cuped_adjustment",
    oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a,
           CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-08' THEN 1 ELSE 0 END)
                AS BIGINT) AS x,
           CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-08'
                          AND event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS y_cents
    FROM events GROUP BY user_id
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y_cents) AS BIGINT) AS sy,
           CAST(sum(x * y_cents) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y_cents * y_cents) AS BIGINT) AS syy,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN in_a THEN x ELSE 0 END) AS BIGINT) AS sx_a,
           CAST(sum(CASE WHEN in_a THEN y_cents ELSE 0 END) AS BIGINT) AS sy_a,
           CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN NOT in_a THEN x ELSE 0 END) AS BIGINT) AS sx_b,
           CAST(sum(CASE WHEN NOT in_a THEN y_cents ELSE 0 END) AS BIGINT) AS sy_b
    FROM u
),
calc AS (
    SELECT n, n_a, n_b,
           (round(((sxy * 1.0 * n - sx * 1.0 * sy)
                   / (sxx * 1.0 * n - sx * 1.0 * sx)) * 1000000.0) / 1000000.0)
               AS theta_cents,
           (round((((sxy * 1.0 * n - sx * 1.0 * sy) * (sxy * 1.0 * n - sx * 1.0 * sy))
                   / ((sxx * 1.0 * n - sx * 1.0 * sx) * (syy * 1.0 * n - sy * 1.0 * sy)))
                  * 1000000.0) / 1000000.0) AS var_reduction,
           (round((sy_a / (100.0 * n_a) - sy_b / (100.0 * n_b)) * 1000000.0) / 1000000.0)
               AS raw_diff,
           (round((sx_a * 1.0 / n_a - sx_b * 1.0 / n_b) * 1000000.0) / 1000000.0)
               AS x_diff
    FROM m
)
SELECT n AS n_users, n_a, n_b, theta_cents, var_reduction, raw_diff,
       (round((raw_diff - theta_cents * x_diff / 100.0) * 1000000.0) / 1000000.0)
           AS adjusted_diff
FROM calc
""",
    description=(
        "CUPED variance-reduction readout: the arm difference in "
        "post-period revenue is adjusted by theta x the pre-period "
        "activity difference (theta = pooled cov(y,x)/var(x); pre = "
        "week 1, post = rest), with the achievable variance reduction "
        "rho^2 — the industry-standard trick that makes the same "
        "experiment decidable with ~(1-rho^2)x the traffic, sitting "
        "between q_ab_test_ztest (readout) and q_power_analysis "
        "(sizing). One per-user pass then ONE pooled+per-arm moment "
        "aggregate; every moment is an exact BIGINT (counts x integer "
        "cents), floats appear only in the final rounded divisions, so "
        "parity is bit-exact with no resampling at all."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    pre = F.col("ts").cast("date") < F.lit("2024-01-08").cast("date")
    u = ev.groupBy("user_id").agg(
        F.first(in_a).alias("in_a"),
        F.sum(F.when(pre, 1).otherwise(0)).alias("x"),
        F.sum(
            F.when(
                (~pre) & (F.col("event_type") == "purchase"),
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("y_cents"),
    )
    x, y = F.col("x"), F.col("y_cents")
    a = F.col("in_a")
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(F.when(a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(a, x).otherwise(0)).alias("sx_a"),
        F.sum(F.when(a, y).otherwise(0)).alias("sy_a"),
        F.sum(F.when(~a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~a, x).otherwise(0)).alias("sx_b"),
        F.sum(F.when(~a, y).otherwise(0)).alias("sy_b"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cnum = sxy * 1.0 * n - sx * 1.0 * sy
    cden = sxx * 1.0 * n - sx * 1.0 * sx
    calc = m.select(
        n.alias("n_users"),
        F.col("n_a"),
        F.col("n_b"),
        stable_round(cnum / cden, 6).alias("theta_cents"),
        stable_round(
            (cnum * cnum) / (cden * (syy * 1.0 * n - sy * 1.0 * sy)), 6
        ).alias("var_reduction"),
        stable_round(
            F.col("sy_a") / (F.lit(100.0) * F.col("n_a"))
            - F.col("sy_b") / (F.lit(100.0) * F.col("n_b")),
            6,
        ).alias("raw_diff"),
        stable_round(
            F.col("sx_a") * 1.0 / F.col("n_a") - F.col("sx_b") * 1.0 / F.col("n_b"), 6
        ).alias("x_diff"),
    )
    return calc.select(
        "n_users",
        "n_a",
        "n_b",
        "theta_cents",
        "var_reduction",
        "raw_diff",
        stable_round(
            F.col("raw_diff") - F.col("theta_cents") * F.col("x_diff") / 100.0, 6
        ).alias("adjusted_diff"),
    )


@register(
    "q_mann_whitney",
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
grp AS (
    SELECT v, CAST(count(*) AS BIGINT) AS t,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS t_a
    FROM u GROUP BY v
),
ranked AS (
    SELECT v, t, t_a,
           CAST(coalesce(sum(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
    FROM grp
),
m AS (
    SELECT CAST(sum(t) AS BIGINT)                          AS n,
           CAST(sum(t_a) AS BIGINT)                        AS n_a,
           CAST(sum(t - t_a) AS BIGINT)                    AS n_b,
           CAST(sum(t_a * (2 * cb + t + 1)) AS BIGINT)     AS rank2_a,
           CAST(sum(t * t * t - t) AS BIGINT)              AS tie_sum
    FROM ranked
),
calc AS (
    SELECT n, n_a, n_b,
           ((rank2_a - n_a * (n_a + 1)) / 2.0) AS u_a,
           (n_a * 1.0 * n_b / 2.0)             AS mean_u,
           ((n_a * 1.0 * n_b / 12.0)
            * ((n + 1.0) - tie_sum / (n * 1.0 * (n - 1.0)))) AS var_u
    FROM m
)
SELECT n_a, n_b, u_a, mean_u,
       (round(((u_a - mean_u) / sqrt(var_u)) * 1000000.0) / 1000000.0) AS z_score,
       (round((((u_a - mean_u) / sqrt(var_u)) / sqrt(n * 1.0)) * 1000000.0) / 1000000.0)
           AS effect_r
FROM calc
""",
    description=(
        "Mann-Whitney U test for the arm difference in per-user "
        "purchase value — the rank-based member of the testing family "
        "(Welch assumes near-normal means, the permutation test buys "
        "exactness with 200x compute; U is the one-pass nonparametric "
        "standard). Rank arithmetic is EXACT: ranks live as doubled "
        "integers (2 x average rank = 2 x cum-before + t + 1), the "
        "tie-corrected variance uses the integer sum of t^3 - t, and "
        "floats appear only in the final z/effect-size divisions. The "
        "cum-before prefix rides the DISTINCT-value table (never the "
        "user rows) AND is a two-phase bucketed carry (bucketed_prefix "
        "over 4096-cent value buckets), so it stays distributed even "
        "when the distinct-value count grows with the data."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    u = ev.groupBy("user_id").agg(
        F.first(in_a).alias("in_a"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("v"),
    )
    grp = u.groupBy("v").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("t_a"),
    )
    from healthcare_etl_spark.operators.scale import bucketed_prefix

    ranked = bucketed_prefix(
        grp,
        buckets=[F.expr("v div 4096")],
        order_by=[F.asc("v")],
        value=F.col("t"),
        agg="sum",
        exclusive=True,
        out_col="cb",
    )
    t, ta, cb = F.col("t"), F.col("t_a"), F.col("cb")
    m = ranked.agg(
        F.sum(t).alias("n"),
        F.sum(ta).alias("n_a"),
        F.sum(t - ta).alias("n_b"),
        F.sum(ta * (2 * cb + t + 1)).alias("rank2_a"),
        F.sum(t * t * t - t).alias("tie_sum"),
    )
    n, na, nb = F.col("n"), F.col("n_a"), F.col("n_b")
    u_a = (F.col("rank2_a") - na * (na + 1)) / 2.0
    mean_u = na * 1.0 * nb / 2.0
    var_u = (na * 1.0 * nb / 12.0) * (
        (n + 1.0) - F.col("tie_sum") / (n * 1.0 * (n - 1.0))
    )
    z = (u_a - mean_u) / F.sqrt(var_u)
    return m.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        u_a.alias("u_a"),
        mean_u.alias("mean_u"),
        stable_round(z, 6).alias("z_score"),
        stable_round(z / F.sqrt(n * 1.0), 6).alias("effect_r"),
    )


@register(
    "q_heaps_fit",
    oracle="""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per_doc AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY 1
),
first_occ AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new
    FROM (SELECT w, min(doc_id) AS doc_id FROM tok GROUP BY w)
    GROUP BY doc_id
),
curve AS (
    SELECT p.doc_id,
           CAST(sum(p.n_tokens) OVER (ORDER BY p.doc_id) AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(f.n_new, 0)) OVER (ORDER BY p.doc_id) AS BIGINT) AS cum_vocab
    FROM per_doc p LEFT JOIN first_occ f ON f.doc_id = p.doc_id
),
pts AS (
    SELECT ln(CAST(cum_tokens AS DOUBLE)) AS x, ln(CAST(cum_vocab AS DOUBLE)) AS y
    FROM curve
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
           sum(x * x) AS sxx, sum(y * y) AS syy
    FROM pts
)
SELECT k AS n_docs,
       (round(((k * sxy - sx * sy) / (k * sxx - sx * sx)) * 1000000.0) / 1000000.0)
           AS heaps_beta,
       (round(((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k) * 1000000.0)
        / 1000000.0) AS log_k,
       (round((((k * sxy - sx * sy) * (k * sxy - sx * sy)) /
               ((k * sxx - sx * sx) * (k * syy - sy * sy))) * 1000000.0) / 1000000.0)
           AS r2
FROM m
""",
    description=(
        "Heaps'-law fit (V = K * N^beta): log-log OLS of cumulative "
        "vocabulary size against cumulative token count along the "
        "doc_id-ordered corpus prefix — Zipf's sibling law, and the "
        "curve that predicts how much NEW vocabulary another 10x of "
        "data will buy (beta ~ 0.4-0.6 for natural text; beta near 0 "
        "means the corpus has saturated — more data, no new words). "
        "Each token's first-occurrence doc is one groupBy min; the "
        "prefix curve is two exact-BIGINT cumulative sums computed with "
        "the two-phase bucketed carry (within-bucket windows "
        "partitioned by the 4096-doc bucket + an exclusive prefix over "
        "the bucket-count-sized totals, broadcast back) — NEVER a "
        "keyless single-partition window over the docs table; the OLS "
        "fold is the shared closed form. (At 100 TB also sample "
        "log-spaced checkpoint docs — the fit needs ~100 curve points.)"
    ),
    tags=("text", "extension", "corpus"),
)
def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    first_occ = (
        tok.groupBy("w")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    docrow = per_doc.join(first_occ, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        F.expr("doc_id div 4096").alias("bkt"),
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = docrow.select(
        "doc_id",
        "bkt",
        F.sum("n_tokens").over(w_in).alias("in_tok"),
        F.sum("n_new").over(w_in).alias("in_new"),
    )
    bstats = docrow.groupBy("bkt").agg(
        F.sum("n_tokens").alias("btok"), F.sum("n_new").alias("bnew")
    )
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bprev = bstats.select(
        "bkt",
        F.coalesce(F.sum("btok").over(w_b), F.lit(0)).alias("ptok"),
        F.coalesce(F.sum("bnew").over(w_b), F.lit(0)).alias("pnew"),
    )
    curve = within.join(F.broadcast(bprev), "bkt").select(
        "doc_id",
        (F.col("in_tok") + F.col("ptok")).alias("cum_tokens"),
        (F.col("in_new") + F.col("pnew")).alias("cum_vocab"),
    )
    pts = curve.select(
        F.log(F.col("cum_tokens").cast("double")).alias("x"),
        F.log(F.col("cum_vocab").cast("double")).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return m.select(
        k.alias("n_docs"),
        stable_round(slope, 6).alias("heaps_beta"),
        stable_round((sy - slope * sx) / k, 6).alias("log_k"),
        stable_round(
            ((k * sxy - sx * sy) * (k * sxy - sx * sy))
            / ((k * sxx - sx * sx) * (k * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "q_theil_sen",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
idxd AS (
    SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx, rev FROM daily
),
slopes AS (
    SELECT (b.rev - a.rev) * 1.0 / (b.idx - a.idx) AS s
    FROM idxd a JOIN idxd b ON a.idx < b.idx
),
sel AS (
    SELECT s, row_number() OVER (ORDER BY s) AS rn, count(*) OVER () AS m FROM slopes
),
sen AS (SELECT s AS slope FROM sel WHERE rn = (m + 1) // 2),
resid AS (
    SELECT i.rev - sen.slope * i.idx AS r FROM idxd i CROSS JOIN sen
),
rsel AS (
    SELECT r, row_number() OVER (ORDER BY r) AS rn, count(*) OVER () AS n FROM resid
),
icpt AS (SELECT r AS intercept FROM rsel WHERE rn = (n + 1) // 2)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM idxd)   AS n_days,
       (SELECT CAST(count(*) AS BIGINT) FROM slopes) AS n_pairs,
       (round((sen.slope / 100.0) * 1000000.0) / 1000000.0)      AS sen_slope_per_day,
       (round((icpt.intercept / 100.0) * 1000000.0) / 1000000.0) AS sen_intercept
FROM sen CROSS JOIN icpt
""",
    description=(
        "Theil-Sen robust trend of daily purchase revenue: the median "
        "of all pairwise slopes plus the median-residual intercept — "
        "up to ~29% outlier days cannot move it, where q_grouped_ols' "
        "least-squares line chases every spike. Slopes are single "
        "divisions of exact integer cents (bit-identical across "
        "engines), and both medians are ORDER-STATISTIC selections "
        "(lower median by row position), so nothing is ever "
        "accumulated in floating point. The pair join and its rank "
        "window ride the days-sized series squared (~days^2/2 rows — "
        "still metadata at any corpus size: a year is 66k pairs)."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev"))
    )
    idxd = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("idx"), "rev"
    )
    a = idxd.select(F.col("idx").alias("ia"), F.col("rev").alias("ra"))
    b = idxd.select(F.col("idx").alias("ib"), F.col("rev").alias("rb"))
    # broadcast hint: the windowed days frame has no size estimate, so
    # without it the inequality self-join degrades to CartesianProduct
    slopes = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        ((F.col("rb") - F.col("ra")) * 1.0 / (F.col("ib") - F.col("ia"))).alias("s")
    )
    wsel = Window.orderBy("s")
    sel = slopes.select(
        "s",
        F.row_number().over(wsel).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    sen = sel.filter(F.col("rn") == F.floor((F.col("m") + 1) / 2)).select(
        F.col("s").alias("slope")
    )
    resid = idxd.crossJoin(F.broadcast(sen)).select(
        (F.col("rev") - F.col("slope") * F.col("idx")).alias("r")
    )
    wr = Window.orderBy("r")
    rsel = resid.select(
        "r",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    icpt = rsel.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2)).select(
        F.col("r").alias("intercept")
    )
    n_days = idxd.agg(F.count(F.lit(1)).alias("n_days"))
    n_pairs = slopes.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        sen.crossJoin(F.broadcast(icpt))
        .crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(n_pairs))
        .select(
            "n_days",
            "n_pairs",
            stable_round(F.col("slope") / 100.0, 6).alias("sen_slope_per_day"),
            stable_round(F.col("intercept") / 100.0, 6).alias("sen_intercept"),
        )
    )


def _isotonic_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    return f"""WITH {joined},
scored AS (
    SELECT y, (1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))) AS p
    FROM feat CROSS JOIN {final} b
),
bins AS (
    SELECT least(CAST(floor(p * 10.0) AS BIGINT), 9) AS bin,
           CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS c
    FROM scored GROUP BY 1
),
iv AS (
    SELECT j.bin AS j, k.bin AS k,
           (sum(m.c) * 1.0 / sum(m.n)) AS mean_jk
    FROM bins j JOIN bins k ON j.bin <= k.bin
    JOIN bins m ON m.bin >= j.bin AND m.bin <= k.bin
    GROUP BY 1, 2
),
inner_ AS (
    SELECT iv.j, i.bin AS i, min(iv.mean_jk) AS mn
    FROM iv JOIN bins i ON iv.j <= i.bin AND iv.k >= i.bin
    GROUP BY 1, 2
),
iso AS (SELECT i AS bin, max(mn) AS iso_raw FROM inner_ GROUP BY i)
SELECT b.bin, b.n,
       {r6('b.c * 1.0 / b.n')} AS conv_rate,
       {r6('iso.iso_raw')}     AS iso_rate
FROM bins b JOIN iso ON iso.bin = b.bin
"""


def _register_isotonic() -> None:
    @register(
        "q_isotonic_calibration",
        oracle=_isotonic_oracle(),
        description=(
            "Isotonic calibration of the IRLS model's probability bins "
            "— the FIX for what q_calibration_ece diagnoses: the "
            "monotone-nondecreasing rate curve closest (weighted least "
            "squares) to the raw per-bin conversion rates, computed by "
            "the closed-form minimax identity iso_i = max_(j<=i) "
            "min_(k>=i) mean(conv over bins j..k) — equivalent to "
            "pool-adjacent-violators but expressible as three joins "
            "over the <=10-row bin table, no iteration. Interval means "
            "are single divisions of exact BIGINT sums (identical "
            "rationals give identical doubles on both engines), so the "
            "min/max lattice is bit-deterministic. The data-sized work "
            "is the same fit + one binned scan as the ECE query."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        features = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(features, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            bins = (
                features.select(
                    F.least(F.floor(p * 10.0).cast("long"), F.lit(9)).alias("bin"),
                    F.col("y"),
                )
                .groupBy("bin")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("c"))
            )
            j = bins.select(F.col("bin").alias("j"))
            k = bins.select(F.col("bin").alias("k"))
            mbl = bins.select(
                F.col("bin").alias("mb"), F.col("n").alias("mn_"), F.col("c").alias("mc")
            )
            iv = (
                j.join(k, F.col("j") <= F.col("k"))
                .join(mbl, (F.col("mb") >= F.col("j")) & (F.col("mb") <= F.col("k")))
                .groupBy("j", "k")
                .agg((F.sum("mc") * 1.0 / F.sum("mn_")).alias("mean_jk"))
            )
            i_tbl = bins.select(F.col("bin").alias("i"))
            inner = (
                iv.join(i_tbl, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
                .groupBy("j", "i")
                .agg(F.min("mean_jk").alias("mn"))
            )
            iso = inner.groupBy(F.col("i").alias("bin")).agg(F.max("mn").alias("iso_raw"))
            return (
                bins.join(iso, "bin")
                .select(
                    "bin",
                    "n",
                    stable_round(F.col("c") * 1.0 / F.col("n"), 6).alias("conv_rate"),
                    stable_round(F.col("iso_raw"), 6).alias("iso_rate"),
                )
            )
        finally:
            features.unpersist()


_register_isotonic()


_TRIGRAM_QUERY = "table scan"
_TRIGRAMS = [_TRIGRAM_QUERY[i : i + 3] for i in range(len(_TRIGRAM_QUERY) - 2)]


def _trigram_oracle() -> str:
    tg_list = ", ".join(f"'{g}'" for g in _TRIGRAMS)
    return f"""
WITH doc_grams AS (
    -- range cap 4096 >> max fixture doc length (577 chars); the Spark
    -- side uses the true length, so the cap only needs to dominate it
    SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 3) AS g
    FROM documents, (SELECT unnest(range(1, 4096)) AS i)
    WHERE i <= len(text) - 2
),
qgrams AS (SELECT unnest([{tg_list}]) AS g),
cand AS (
    SELECT doc_id FROM doc_grams JOIN qgrams USING (g)
    GROUP BY doc_id HAVING count(DISTINCT g) = {len(_TRIGRAMS)}
)
SELECT d.doc_id, d.source, d.n_chars
FROM cand JOIN documents d USING (doc_id)
WHERE contains(d.text, '{_TRIGRAM_QUERY}')
""".strip()


def _register_trigram_search() -> None:
    @register(
        "q_trigram_search",
        oracle=_trigram_oracle(),
        description=(
            "Substring search through a trigram inverted index "
            "(pg_trgm-style): the query phrase's character trigrams "
            "prune the corpus to docs containing ALL of them (an "
            "equi-join + counting HAVING against the distinct "
            "doc-trigram index), and only the surviving candidates pay "
            "the contains() verify — at 100 TB the index join replaces "
            "the full-scan LIKE '%...%' that no column pruning can "
            "save. The same block-then-verify contract as the MinHash "
            "and fuzzy-pair pipelines, applied to substring match; the "
            "trigram index is buildable once and reusable across "
            "queries."
        ),
        tags=("text", "extension", "search"),
    )
    def q_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        doc_grams = (
            docs.select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1)))
                ).alias("i"),
                "text",
            )
            .filter(F.col("i") <= F.length("text") - 2)
            .select("doc_id", F.expr("substring(text, i, 3)").alias("g"))
            .distinct()
        )
        qgrams = spark.createDataFrame([(g,) for g in _TRIGRAMS], ["g"])
        cand = (
            doc_grams.join(F.broadcast(qgrams), "g")
            .groupBy("doc_id")
            .agg(F.count_distinct("g").alias("hits"))
            .filter(F.col("hits") == len(_TRIGRAMS))
            .select("doc_id")
        )
        return (
            cand.join(docs, "doc_id")
            .filter(F.expr(f"instr(text, '{_TRIGRAM_QUERY}') > 0"))
            .select("doc_id", "source", "n_chars")
        )


_register_trigram_search()


@register(
    "q_anova_f",
    oracle="""
WITH v AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
),
g AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(c) AS BIGINT) AS s_g, CAST(sum(c * c) AS BIGINT) AS ss_g
    FROM v GROUP BY 1
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(n_g) AS BIGINT) AS n,
           CAST(sum(s_g) AS BIGINT) AS s,
           CAST(sum(ss_g) AS BIGINT) AS ss,
           sum(s_g * 1.0 * s_g / n_g) AS q
    FROM g
),
calc AS (
    SELECT k, n,
           (q - s * 1.0 * s / n)  AS ssb,
           (ss - q)               AS ssw,
           (ss - s * 1.0 * s / n) AS sst
    FROM m
)
SELECT k AS n_groups, n AS n_rows,
       (round(((ssb / (k - 1)) / (ssw / (n - k))) * 1000000.0) / 1000000.0) AS f_stat,
       (round((ssb / sst) * 1000000.0) / 1000000.0)                         AS eta_squared
FROM calc
""",
    description=(
        "One-way ANOVA of event value across the five event types: the "
        "F statistic and the eta-squared effect size — the k-group "
        "generalization of q_welch_ttest (is ANY type's mean value "
        "different, and how much of the variance does type explain?). "
        "Sums of squares come from ONE partial-aggregated integer-cent "
        "moment pass (n, sum, sum-of-squares per group, all BIGINT); "
        "the only floating step is the 5-row between-group fold and "
        "the final scale-invariant ratios, so the statistic is stable "
        "to 6dp at any data size."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("c").alias("s_g"),
        F.sum(F.col("c") * F.col("c")).alias("ss_g"),
    )
    m = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(F.col("s_g") * 1.0 * F.col("s_g") / F.col("n_g")).alias("q"),
    )
    k, n, s, ss, q = F.col("k"), F.col("n"), F.col("s"), F.col("ss"), F.col("q")
    ssb = q - s * 1.0 * s / n
    ssw = ss - q
    sst = ss - s * 1.0 * s / n
    return m.select(
        k.alias("n_groups"),
        n.alias("n_rows"),
        stable_round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
        stable_round(ssb / sst, 6).alias("eta_squared"),
    )


@register(
    "q_table_checksum",
    oracle="""
WITH h AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           ('0x' || substring(md5(
                CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR) || '|'
                || event_type || '|' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
                || '|' || CAST(epoch_us(ts) AS VARCHAR)
            ), 1, 15))::BIGINT AS rh
    FROM events
)
SELECT day,
       CAST(count(*) AS BIGINT)            AS n_rows,
       CAST(bit_xor(rh) AS BIGINT)         AS xor_checksum,
       CAST(sum(rh % 1000000007) AS BIGINT) AS sum_checksum
FROM h GROUP BY day
""",
    description=(
        "Order-independent per-partition table checksums (the "
        "pt-table-checksum / replication-validation primitive): each "
        "row hashes its canonical business key + payload (doubles as "
        "exact integer cents, timestamps as epoch-us — never "
        "engine-formatted strings) into a 60-bit md5 prefix, and each "
        "day-partition folds them with BOTH xor (order- and "
        "partition-independent, but blind to paired duplicates) and a "
        "modular sum (catches what xor misses). Constant-size output "
        "per partition makes cross-replica comparison a metadata "
        "exchange, where q_table_diff's row-level anti-joins are the "
        "drill-down once a partition disagrees. One partial-aggregated "
        "pass, no shuffle wider than the day key."
    ),
    tags=("quality", "extension", "lakehouse"),
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.round(F.col("value") * 100).cast("long").cast("string"),
        F.unix_micros("ts").cast("string"),
    )
    h = ev.select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long").alias("rh"),
    )
    return h.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(rh)").cast("long").alias("xor_checksum"),
        F.sum(F.col("rh") % 1000000007).alias("sum_checksum"),
    )


def _ppr_oracle(rounds: int = 5) -> str:
    from healthcare_etl_spark.plans.queries_dedup import _jaccard_pairs_ctes

    r10 = lambda e: f"(round(({e}) * 10000000000.0) / 10000000000.0)"  # noqa: E731
    tel = "CASE WHEN b.is_seed AND b.ns > 0 THEN 1.0 / b.ns ELSE 0.0 END"
    parts = [
        f"WITH {_jaccard_pairs_ctes()},",
        f"""
pedges AS (
    SELECT doc_a AS u, doc_b AS v FROM jpairs
    WHERE (round(jac * 1000000.0) / 1000000.0) >= 0.5
    UNION
    SELECT doc_b AS u, doc_a AS v FROM jpairs
    WHERE (round(jac * 1000000.0) / 1000000.0) >= 0.5
),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM pedges GROUP BY u),
marked AS (
    SELECT deg.u AS node, deg.d,
           (dd.source = 'src0') AS is_seed
    FROM deg JOIN documents dd ON dd.doc_id = deg.u
),
nsz AS (
    SELECT CAST(sum(CASE WHEN is_seed THEN 1 ELSE 0 END) AS BIGINT) AS ns FROM marked
),
base AS (SELECT m.node, m.d, m.is_seed, nsz.ns FROM marked m CROSS JOIN nsz),
r0 AS (
    SELECT b.node, b.d, {r10(tel)} AS rank FROM base b
),""",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""
c{t} AS (
    SELECT e.v AS node, sum(r.rank / r.d) AS s
    FROM pedges e JOIN r{t - 1} r ON r.node = e.u GROUP BY e.v
),
r{t} AS (
    SELECT b.node, b.d,
           {r10(f"0.15 * ({tel}) + 0.85 * coalesce(c{t}.s, 0.0)")} AS rank
    FROM base b LEFT JOIN c{t} USING (node)
),"""
        )
    body = "".join(parts).rstrip(",\n") + "\n"
    return body + f"SELECT node AS doc_id, rank AS ppr_rank FROM r{rounds}"


def _register_ppr() -> None:
    @register(
        "q_personalized_pagerank",
        oracle=_ppr_oracle(5),
        description=(
            "Personalized PageRank over the near-dup graph, teleporting "
            "to the src0 seed documents (5 damped rounds, d=0.85): rank "
            "becomes graph proximity TO the seed set — the similar-item "
            "/ 'more like these' recommendation primitive, where "
            "q_pagerank's uniform teleport measures global centrality. "
            "Same iterative-join discipline (edges checkpointed once, "
            "one node-id shuffle per round, per-round 10dp stable "
            "rounding = bit-identical to the unrolled-CTE oracle); the "
            "seed indicator rides the loop-invariant base relation, so "
            "personalization costs nothing extra per round."
        ),
        tags=("dedup", "extension", "iterative", "graph"),
    )
    def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.dedup import jaccard_pairs
        from healthcare_etl_spark.operators.graph import personalized_pagerank

        docs = load_table(spark, sf_dir, "documents")
        pairs = jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
        seeds = docs.filter(F.col("source") == "src0").select(
            F.col("doc_id").alias("node")
        )
        return personalized_pagerank(pairs, seeds, iterations=5, teleport_weight=0.15).select(
            F.col("node").alias("doc_id"), F.col("rank").alias("ppr_rank")
        )


_register_ppr()


def _roc_auc_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
scored AS (
    SELECT y,
           (round((1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))) * 1000000.0)
            / 1000000.0) AS p
    FROM feat CROSS JOIN {final} b
),
grp AS (
    SELECT p, CAST(count(*) AS BIGINT) AS t,
           CAST(sum(y) AS BIGINT) AS t_pos
    FROM scored GROUP BY p
),
ranked AS (
    SELECT p, t, t_pos,
           CAST(coalesce(sum(t) OVER (ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
    FROM grp
),
m AS (
    SELECT CAST(sum(t_pos) AS BIGINT)                    AS n_pos,
           CAST(sum(t - t_pos) AS BIGINT)                AS n_neg,
           CAST(sum(t_pos * (2 * cb + t + 1)) AS BIGINT) AS rank2_pos
    FROM ranked
)
SELECT n_pos, n_neg,
       (round((((rank2_pos - n_pos * (n_pos + 1)) / 2.0) / (n_pos * 1.0 * n_neg))
              * 1000000.0) / 1000000.0) AS auc,
       (round((2.0 * (((rank2_pos - n_pos * (n_pos + 1)) / 2.0) / (n_pos * 1.0 * n_neg))
               - 1.0) * 1000000.0) / 1000000.0) AS gini_coefficient
FROM m
""".strip()


def _register_roc_auc() -> None:
    @register(
        "q_roc_auc",
        oracle=_roc_auc_oracle(),
        description=(
            "ROC-AUC of the IRLS model via the rank formulation (AUC = "
            "Mann-Whitney U of the positive class's scores, "
            "tie-corrected with average ranks) — the threshold-free "
            "discrimination metric next to q_calibration_ece's "
            "calibration view; plus the Gini coefficient 2*AUC-1. "
            "Scores are 6dp-rounded BEFORE ranking so the distinct-"
            "score table is bounded (<=10^6 keys at any corpus size), "
            "and even that bounded table never single-partition-sorts: "
            "the cumulative count rides the two-phase bucketed carry "
            "(operators/scale.bucketed_prefix over micro-prob div-4096 "
            "buckets, <=245-row summary prefix); ranks are the "
            "exact doubled-integer trick from q_mann_whitney, so AUC "
            "is one rounded division of BIGINTs."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        features = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            from healthcare_etl_spark.operators.scale import bucketed_prefix

            b0, b1, b2 = logistic_fit(features, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            # Integer micro-prob key: pm/1e6 is exactly the oracle's
            # 6dp-rounded p (injective), so grouping by pm == grouping
            # by p while the bucket key stays integral.
            pm = F.round(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))) * 1000000.0
            ).cast("long")
            grp = features.select(pm.alias("pm"), "y").groupBy("pm").agg(
                F.count(F.lit(1)).alias("t"), F.sum("y").alias("t_pos")
            )
            ranked = bucketed_prefix(
                grp,
                buckets=[F.expr("pm div 4096")],
                order_by=[F.col("pm")],
                value=F.col("t"),
                agg="sum",
                exclusive=True,
                out_col="cb",
            ).select("t", "t_pos", F.col("cb").cast("long").alias("cb"))
            t, tp, cb = F.col("t"), F.col("t_pos"), F.col("cb")
            m = ranked.agg(
                F.sum(tp).alias("n_pos"),
                F.sum(t - tp).alias("n_neg"),
                F.sum(tp * (2 * cb + t + 1)).alias("rank2_pos"),
            )
            npos, nneg = F.col("n_pos"), F.col("n_neg")
            auc = ((F.col("rank2_pos") - npos * (npos + 1)) / 2.0) / (npos * 1.0 * nneg)
            return m.select(
                npos.alias("n_pos"),
                nneg.alias("n_neg"),
                stable_round(auc, 6).alias("auc"),
                stable_round(2.0 * auc - 1.0, 6).alias("gini_coefficient"),
            )
        finally:
            features.unpersist()


_register_roc_auc()


_SWEEP_THRESHOLDS = [i / 20.0 for i in range(1, 20)]


def _threshold_sweep_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    thr_list = ", ".join(str(t) for t in _SWEEP_THRESHOLDS)
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    return f"""WITH {joined},
scored AS (
    SELECT y, (1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))) AS p
    FROM feat CROSS JOIN {final} b
),
grid AS (
    SELECT s.y, s.p, t.thr
    FROM scored s CROSS JOIN
         (SELECT CAST(unnest([{thr_list}]) AS DOUBLE) AS thr) t
),
counts AS (
    SELECT thr,
           CAST(sum(CASE WHEN p > thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN p > thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN p <= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN p <= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM grid GROUP BY thr
)
SELECT thr, tp, fp, fn, tn,
       {r6('2.0 * tp / (2.0 * tp + fp + fn)')}                        AS f1,
       {r6('tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp) - 1.0')}      AS youden_j
FROM counts
""".strip()


def _register_threshold_sweep() -> None:
    @register(
        "q_threshold_sweep",
        oracle=_threshold_sweep_oracle(),
        description=(
            "Classification threshold sweep for the IRLS model: the "
            "confusion matrix, F1 and Youden's J at 19 evenly-spaced "
            "cutoffs — the operating-point selection step between "
            "q_roc_auc (threshold-free discrimination) and deployment "
            "(one threshold must be picked). All counts are exact "
            "integers from ONE partial-aggregated pass over the "
            "users x 19 grid (the thresholds are literal doubles "
            "identical on both engines); the metrics are fixed rational "
            "expressions of those counts."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        features = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(features, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            grid = features.select(
                "y",
                p.alias("p"),
                F.explode(F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS])).alias("thr"),
            )
            pos = F.col("p") > F.col("thr")
            y1 = F.col("y") == 1
            counts = grid.groupBy("thr").agg(
                F.sum(F.when(pos & y1, 1).otherwise(0)).alias("tp"),
                F.sum(F.when(pos & ~y1, 1).otherwise(0)).alias("fp"),
                F.sum(F.when(~pos & y1, 1).otherwise(0)).alias("fn"),
                F.sum(F.when(~pos & ~y1, 1).otherwise(0)).alias("tn"),
            )
            tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
            return counts.select(
                "thr",
                "tp",
                "fp",
                "fn",
                "tn",
                stable_round(2.0 * tp / (2.0 * tp + fp + fn), 6).alias("f1"),
                stable_round(
                    tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp) - 1.0, 6
                ).alias("youden_j"),
            )
        finally:
            features.unpersist()


_register_threshold_sweep()


@register(
    "q_ab_srm_check",
    oracle="""
WITH assigned AS (
    SELECT DISTINCT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2) = 0 AS in_a
    FROM events
),
counts AS (
    SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
    FROM assigned
)
SELECT n_a, n_b,
       (round(((n_a - (n_a + n_b) * 0.5) * (n_a - (n_a + n_b) * 0.5)
               / ((n_a + n_b) * 0.5)
             + (n_b - (n_a + n_b) * 0.5) * (n_b - (n_a + n_b) * 0.5)
               / ((n_a + n_b) * 0.5)) * 1000000.0) / 1000000.0) AS chi2,
       ((n_a - (n_a + n_b) * 0.5) * (n_a - (n_a + n_b) * 0.5)
          / ((n_a + n_b) * 0.5)
        + (n_b - (n_a + n_b) * 0.5) * (n_b - (n_a + n_b) * 0.5)
          / ((n_a + n_b) * 0.5)) > 3.841 AS srm_flag
FROM counts
""",
    description=(
        "Sample-ratio-mismatch guardrail for the md5 50/50 experiment "
        "assignment every A/B query in this repo shares: one-degree "
        "chi-square of observed arm sizes against the expected 50/50, "
        "flagged at the 0.05 critical value (3.841). The FIRST check an "
        "experimentation platform runs — a failed SRM invalidates every "
        "downstream test (z, Welch, Mann-Whitney, CUPED) regardless of "
        "p-value. One distinct-user aggregate; the chi-square is a "
        "1-row fold."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    assigned = ev.select("user_id", in_a.alias("in_a")).distinct()
    counts = assigned.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("n_b"),
    )
    exp = (F.col("n_a") + F.col("n_b")) * F.lit(0.5)
    chi2 = (F.col("n_a") - exp) * (F.col("n_a") - exp) / exp + (
        F.col("n_b") - exp
    ) * (F.col("n_b") - exp) / exp
    return counts.select(
        "n_a",
        "n_b",
        stable_round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(3.841)).alias("srm_flag"),
    )


@register(
    "q_spearman_corr",
    oracle="""
WITH u AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
    FROM events GROUP BY user_id
),
hx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS t FROM u GROUP BY x),
rx AS (
    SELECT v,
           2 * CAST(coalesce(sum(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             + t + 1 AS r2
    FROM hx
),
hy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS t FROM u GROUP BY y),
ry AS (
    SELECT v,
           2 * CAST(coalesce(sum(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             + t + 1 AS r2
    FROM hy
),
j AS (
    SELECT rx.r2 AS a, ry.r2 AS b
    FROM u JOIN rx ON rx.v = u.x JOIN ry ON ry.v = u.y
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
           CAST(sum(a * b) AS BIGINT) AS sab,
           CAST(sum(a * a) AS BIGINT) AS saa,
           CAST(sum(b * b) AS BIGINT) AS sbb
    FROM j
)
SELECT n AS n_users,
       (round(((n * sab - sa * sb)
               / sqrt((n * saa - sa * sa) * 1.0 * (n * sbb - sb * sb)))
              * 1000000.0) / 1000000.0) AS spearman_rho
FROM m
""",
    description=(
        "Spearman rank correlation between per-user click and purchase "
        "counts — the monotone-association complement to the Pearson "
        "q_event_type_correlation (robust to the heavy-tailed count "
        "distributions engagement metrics actually have). Tie handling "
        "is EXACT via the doubled-average-rank trick shared with "
        "q_mann_whitney / q_roc_auc: per distinct value, 2*avg_rank = "
        "2*cum_before + t + 1 stays an integer, so every moment "
        "(Σa, Σab, Σa²) folds in BIGINT and rho is one final float "
        "expression (correlation is scale-invariant, so doubling "
        "cancels). The rank prefixes ride the DISTINCT-count tables, "
        "never user rows; at 100x user counts the same two-phase "
        "bucketed carry as q_mann_whitney applies (the distinct-count "
        "frames here are activity-bounded, i.e. max events per user). "
        "BIGINT moments hold to ~1e5 users per the 4n^3 bound; the "
        "DECIMAL(38) swap is the documented scale path."
    ),
    tags=("analytics", "extension", "stats"),
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    )

    def rank2(col: str):
        h = u.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("t"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return h.select(
            "v",
            (2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + 1).alias("r2"),
        )

    rx = rank2("x").select(F.col("v").alias("x"), F.col("r2").alias("a"))
    ry = rank2("y").select(F.col("v").alias("y"), F.col("r2").alias("b"))
    j = u.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    n, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    num = n * F.col("sab") - sa * sb
    den = F.sqrt((n * F.col("saa") - sa * sa) * F.lit(1.0) * (n * F.col("sbb") - sb * sb))
    return m.select(
        n.alias("n_users"),
        stable_round(num / den, 6).alias("spearman_rho"),
    )


def _pr_auc_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
scored AS (
    SELECT y,
           (round((1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))) * 1000000.0)
            / 1000000.0) AS p
    FROM feat CROSS JOIN {final} b
),
grp AS (
    SELECT p, CAST(count(*) AS BIGINT) AS t, CAST(sum(y) AS BIGINT) AS tp
    FROM scored GROUP BY p
),
cum AS (
    SELECT p, t, tp,
           CAST(sum(t)  OVER (ORDER BY p DESC) AS BIGINT) AS cum_n,
           CAST(sum(tp) OVER (ORDER BY p DESC) AS BIGINT) AS cum_tp
    FROM grp
),
terms AS (
    SELECT tp, cum_n, cum_tp,
           CAST(round(tp * cum_tp * 10000000000.0 / cum_n) AS BIGINT) AS tq
    FROM cum
),
m AS (
    SELECT CAST(sum(tp) AS BIGINT) AS n_pos,
           CAST(sum(tq) AS BIGINT) AS ap_q
    FROM terms
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM scored)
SELECT n_pos,
       (n_all - n_pos) AS n_neg,
       (round((ap_q / 10000000000.0 / n_pos) * 1000000.0) / 1000000.0)
           AS average_precision,
       (round((n_pos * 1.0 / n_all) * 1000000.0) / 1000000.0) AS prevalence
FROM m CROSS JOIN tot
""".strip()


def _register_pr_auc() -> None:
    @register(
        "q_pr_auc",
        oracle=_pr_auc_oracle(),
        description=(
            "Precision-recall AUC (average precision, tie-grouped step "
            "form) of the IRLS model: AP = sum over descending score "
            "groups of tp_g * precision-at-group-end / n_pos — the "
            "metric that stays honest under class imbalance where "
            "q_roc_auc saturates (a 0.1% positive rate makes almost "
            "any ranker look ROC-great; AP compares against the "
            "prevalence baseline reported alongside). Scores are "
            "6dp-rounded BEFORE grouping so the distinct-score table "
            "is bounded, and the descending cumulative rides the "
            "two-phase bucketed carry ((-pm) div 4096 buckets — no "
            "single-partition sort even over the bounded table); "
            "precisions are exact BIGINT ratios, and per-group terms "
            "are quantized to BIGINT at 1e-10 before the final sum — "
            "no float accumulation order anywhere."
        ),
        tags=("analytics", "extension", "stats", "ml", "evaluation"),
    )
    def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        features = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(features, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            # Integer micro-prob key (pm/1e6 == the oracle's 6dp p,
            # injective), grouped once; the descending cumulative rides
            # the two-phase bucketed carry: (-pm) div 4096 is a monotone
            # coarsening of pm DESC (truncating div is monotone), so
            # in-bucket inclusive windows are fully partitioned and the
            # keyless prefix only ever sees the <=245-row bucket summary.
            pm = F.round(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))) * 1000000.0
            ).cast("long")
            scored = features.select(pm.alias("pm"), "y")
            grp = scored.groupBy("pm").agg(
                F.count(F.lit(1)).alias("t"), F.sum("y").alias("tp")
            )
            bkt = grp.withColumn("bkt", F.expr("(-pm) div 4096"))
            w_in = (
                Window.partitionBy("bkt")
                .orderBy(F.desc("pm"))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            rows = bkt.withColumn("cin_n", F.sum("t").over(w_in)).withColumn(
                "cin_tp", F.sum("tp").over(w_in)
            )
            btot = bkt.groupBy("bkt").agg(
                F.sum("t").alias("bv_n"), F.sum("tp").alias("bv_tp")
            )
            w_b = Window.orderBy("bkt").rowsBetween(
                Window.unboundedPreceding, -1
            )
            bprev = btot.select(
                "bkt",
                F.sum("bv_n").over(w_b).alias("prev_n"),
                F.sum("bv_tp").over(w_b).alias("prev_tp"),
            )
            cum = rows.join(F.broadcast(bprev), "bkt").select(
                "tp",
                (F.col("cin_n") + F.coalesce(F.col("prev_n"), F.lit(0)))
                .cast("long")
                .alias("cum_n"),
                (F.col("cin_tp") + F.coalesce(F.col("prev_tp"), F.lit(0)))
                .cast("long")
                .alias("cum_tp"),
            )
            terms = cum.select(
                "tp",
                F.round(
                    F.col("tp") * F.col("cum_tp") * 10000000000.0 / F.col("cum_n")
                )
                .cast("long")
                .alias("tq"),
            )
            n_all = scored.count()
            m = terms.agg(
                F.sum("tp").cast("long").alias("n_pos"),
                F.sum("tq").cast("long").alias("ap_q"),
            )
            return m.select(
                F.col("n_pos"),
                (F.lit(n_all) - F.col("n_pos")).cast("long").alias("n_neg"),
                stable_round(
                    F.col("ap_q") / 10000000000.0 / F.col("n_pos"), 6
                ).alias("average_precision"),
                stable_round(F.col("n_pos") * 1.0 / F.lit(n_all), 6).alias(
                    "prevalence"
                ),
            )
        finally:
            features.unpersist()


_register_pr_auc()


def _psm_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
feat_u AS (
    SELECT user_id,
           CAST(ln(1.0 + sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)) AS DOUBLE) AS x1,
           CAST(ln(1.0 + sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)) AS DOUBLE)  AS x2,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END)        AS y,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS spend_cents
    FROM events GROUP BY user_id
),
scored AS (
    SELECT user_id, y, spend_cents,
           (round((1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))) * 1000000.0)
            / 1000000.0) AS p
    FROM feat_u CROSS JOIN {final} b
),
t AS (SELECT user_id, p, spend_cents,
             CAST(floor(p / 0.02) AS BIGINT) AS bkt FROM scored WHERE y = 1),
c AS (SELECT user_id, p, spend_cents,
             CAST(floor(p / 0.02) AS BIGINT) AS bkt FROM scored WHERE y = 0),
cand AS (
    SELECT t.user_id AS t_id, t.spend_cents AS t_spend,
           c.user_id AS c_id, c.spend_cents AS c_spend,
           abs(c.p - t.p) AS dist
    FROM t
    JOIN (SELECT CAST(unnest([-1, 0, 1]) AS BIGINT) AS off) o ON TRUE
    JOIN c ON c.bkt = t.bkt + o.off AND abs(c.p - t.p) <= 0.02
),
best AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY t_id
                   ORDER BY dist ASC, c_id ASC) AS rn
        FROM cand
    ) WHERE rn = 1
),
counts AS (SELECT CAST(count(*) AS BIGINT) AS n_treated FROM t)
SELECT n_treated,
       CAST(count(*) AS BIGINT) AS n_matched,
       (round((sum(t_spend - c_spend) / 100.0 / count(*)) * 1000000.0)
        / 1000000.0) AS att_dollars,
       (round((sum(t_spend) / 100.0 / count(*)) * 1000000.0) / 1000000.0)
           AS matched_treated_mean,
       (round((sum(c_spend) / 100.0 / count(*)) * 1000000.0) / 1000000.0)
           AS matched_control_mean
FROM best CROSS JOIN counts
GROUP BY n_treated
""".strip()


def _register_psm_match() -> None:
    @register(
        "q_psm_match",
        oracle=_psm_oracle(),
        description=(
            "Propensity-score matching ATT: treated users (any "
            "purchase > 150) match their nearest-propensity control "
            "within a 0.02 caliper (with replacement, ties to the "
            "smallest user id), estimating the treatment effect on "
            "total spend — the observational-causal complement to the "
            "randomized q_ab_test_ztest/q_cuped_adjustment family, for "
            "when assignment wasn't randomized. Propensity is the IRLS "
            "model's 6dp score; candidate generation is a BANDED "
            "equi-join on floor(p/0.02) buckets +-1 (bucket width = "
            "caliper, so the 3-bucket probe provably covers the "
            "caliper) — never treated x control; with-replacement "
            "matching keeps every match decision independent, so the "
            "argmin is one rank-limit window, fully parallel. Outcomes "
            "stay exact integer cents until the final rounded "
            "divisions."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_psm_match(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("spend_cents"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(feat.select("x1", "x2", "y"), rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            scored = feat.select(
                "user_id",
                "y",
                "spend_cents",
                stable_round(F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)), 6).alias("p"),
            ).withColumn("bkt", F.floor(F.col("p") / 0.02).cast("long"))
            t = scored.filter(F.col("y") == 1).select(
                F.col("user_id").alias("t_id"),
                F.col("p").alias("tp"),
                F.col("spend_cents").alias("t_spend"),
                F.col("bkt").alias("t_bkt"),
            )
            c = scored.filter(F.col("y") == 0).select(
                F.col("user_id").alias("c_id"),
                F.col("p").alias("cp"),
                F.col("spend_cents").alias("c_spend"),
                F.col("bkt").alias("c_bkt"),
            )
            offs = spark.range(-1, 2).select(F.col("id").cast("long").alias("off"))
            cand = (
                t.crossJoin(F.broadcast(offs))
                .join(
                    c,
                    (F.col("c_bkt") == F.col("t_bkt") + F.col("off"))
                    & (F.abs(F.col("cp") - F.col("tp")) <= 0.02),
                )
                .select(
                    "t_id",
                    "t_spend",
                    "c_id",
                    "c_spend",
                    F.abs(F.col("cp") - F.col("tp")).alias("dist"),
                )
            )
            wm = Window.partitionBy("t_id").orderBy(F.asc("dist"), F.asc("c_id"))
            best = cand.withColumn("rn", F.row_number().over(wm)).filter(
                F.col("rn") == 1
            )
            n_treated = t.count()
            m = best.agg(
                F.count(F.lit(1)).cast("long").alias("n_matched"),
                F.sum(F.col("t_spend") - F.col("c_spend")).alias("d_cents"),
                F.sum("t_spend").alias("ts"),
                F.sum("c_spend").alias("cs"),
            )
            return m.select(
                F.lit(n_treated).cast("long").alias("n_treated"),
                "n_matched",
                stable_round(
                    F.col("d_cents") / 100.0 / F.col("n_matched"), 6
                ).alias("att_dollars"),
                stable_round(F.col("ts") / 100.0 / F.col("n_matched"), 6).alias(
                    "matched_treated_mean"
                ),
                stable_round(F.col("cs") / 100.0 / F.col("n_matched"), 6).alias(
                    "matched_control_mean"
                ),
            )
        finally:
            feat.unpersist()


_register_psm_match()


def _register_dp_histogram() -> None:
    _P = 2147483647

    @register(
        "q_dp_histogram",
        oracle=f"""
WITH counts AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
),
noise AS (
    SELECT event_type, n,
           (((('0x' || substring(md5('dp-v1:' || event_type), 1, 8))::BIGINT % {_P})
             + 0.5) / {_P}.0 - 0.5) AS t
    FROM counts
)
SELECT event_type,
       n AS true_count,
       (round((n + (-1.0) * CASE WHEN t >= 0 THEN 1.0 ELSE -1.0 END
               * ln(1.0 - 2.0 * abs(t))) * 1000000.0) / 1000000.0)
           AS noisy_count,
       CAST(1.0 AS DOUBLE) AS epsilon
FROM noise
""",
        description=(
            "Differentially-private histogram (Laplace mechanism, "
            "epsilon=1, sensitivity 1) over event-type counts: each "
            "exact count gets Laplace(1/eps) noise drawn by inverse-"
            "CDF from a counter-based md5 uniform keyed on the "
            "histogram cell — the release primitive for sharing "
            "aggregate stats about a corpus without exposing any "
            "single contributor, next to q_kanonymity_audit and "
            "q_gdpr_delete_plan in the governance family. Counter-"
            "based noise (same discipline as the bootstrap/permutation "
            "queries) makes the draw reproducible AND shardable: no "
            "RNG state crosses partitions, so the noised rollup is one "
            "partial aggregate plus a per-row expression at any scale. "
            "The uniform is offset by +0.5/P so |u-0.5| < 0.5 strictly "
            "and ln(1-2|t|) can never hit ln(0). true_count is emitted "
            "for the parity check; a production release drops it."
        ),
        tags=("analytics", "extension", "governance"),
    )
    def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit("dp-v1:"), F.col("event_type"))), 1, 8),
            16,
            10,
        ).cast("long") % _P
        t = (h + 0.5) / float(_P) - 0.5
        lap = (
            F.lit(-1.0)
            * F.when(t >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
            * F.log(F.lit(1.0) - 2.0 * F.abs(t))
        )
        return counts.select(
            "event_type",
            F.col("n").alias("true_count"),
            stable_round(F.col("n") + lap, 6).alias("noisy_count"),
            F.lit(1.0).alias("epsilon"),
        )


_register_dp_histogram()


def _register_covariate_balance() -> None:
    @register(
        "q_covariate_balance",
        oracle="""
WITH feat AS (
    SELECT user_id,
           CAST(round(ln(1.0 + sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END))
                      * 1000000.0) AS BIGINT) AS x1q,
           CAST(round(ln(1.0 + sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END))
                      * 1000000.0) AS BIGINT) AS x2q,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS y
    FROM events GROUP BY user_id
),
long AS (
    SELECT y, 'x1_log_clicks' AS covariate, x1q AS xq FROM feat
    UNION ALL
    SELECT y, 'x2_log_views' AS covariate, x2q AS xq FROM feat
),
m AS (
    SELECT covariate,
           CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)        AS nt,
           CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)        AS nc,
           CAST(sum(CASE WHEN y = 1 THEN xq ELSE 0 END) AS BIGINT)       AS st,
           CAST(sum(CASE WHEN y = 0 THEN xq ELSE 0 END) AS BIGINT)       AS sc,
           CAST(sum(CASE WHEN y = 1 THEN xq * xq ELSE 0 END) AS BIGINT)  AS sst,
           CAST(sum(CASE WHEN y = 0 THEN xq * xq ELSE 0 END) AS BIGINT)  AS ssc
    FROM long GROUP BY covariate
)
SELECT covariate, nt AS n_treated, nc AS n_control,
       (round((st / 1000000.0 / nt) * 1000000.0) / 1000000.0) AS mean_treated,
       (round((sc / 1000000.0 / nc) * 1000000.0) / 1000000.0) AS mean_control,
       (round(((st * 1.0 / nt - sc * 1.0 / nc)
               / sqrt((((sst - st * 1.0 / nt * st) / (nt - 1))
                       + ((ssc - sc * 1.0 / nc * sc) / (nc - 1))) / 2.0))
              * 1000000.0) / 1000000.0) AS smd
FROM m
""",
        description=(
            "Covariate balance (standardized mean difference) between "
            "the treated and control groups of q_psm_match, per "
            "model covariate — the 'Table 1' diagnostic that says "
            "whether matching is even needed (|SMD| > 0.1 = "
            "imbalanced) and, re-run on the matched sample, whether it "
            "worked. Covariates are quantized to integer micro-units "
            "at the per-user aggregate, so group means and variances "
            "are exact-BIGINT moment arithmetic (one partial-"
            "aggregated pass over the two-covariate long form) and "
            "the pooled-SD SMD is a single rounded double expression. "
            "Note the quantized-x1*x1 sums stay < 2^63 up to ~1e5 "
            "users per group; past that, re-center before squaring."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.round(
                F.log(
                    F.lit(1.0)
                    + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("x1q"),
            F.round(
                F.log(
                    F.lit(1.0)
                    + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("x2q"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        )
        long = feat.select(
            "y", F.lit("x1_log_clicks").alias("covariate"), F.col("x1q").alias("xq")
        ).unionAll(
            feat.select(
                "y", F.lit("x2_log_views").alias("covariate"), F.col("x2q").alias("xq")
            )
        )
        y, xq = F.col("y"), F.col("xq")
        m = long.groupBy("covariate").agg(
            F.sum(F.when(y == 1, 1).otherwise(0)).cast("long").alias("nt"),
            F.sum(F.when(y == 0, 1).otherwise(0)).cast("long").alias("nc"),
            F.sum(F.when(y == 1, xq).otherwise(0)).cast("long").alias("st"),
            F.sum(F.when(y == 0, xq).otherwise(0)).cast("long").alias("sc"),
            F.sum(F.when(y == 1, xq * xq).otherwise(0)).cast("long").alias("sst"),
            F.sum(F.when(y == 0, xq * xq).otherwise(0)).cast("long").alias("ssc"),
        )
        nt, nc, st, sc, sst, ssc = (
            F.col(x) for x in ["nt", "nc", "st", "sc", "sst", "ssc"]
        )
        vt = (sst - st * 1.0 / nt * st) / (nt - 1)
        vc = (ssc - sc * 1.0 / nc * sc) / (nc - 1)
        smd = (st * 1.0 / nt - sc * 1.0 / nc) / F.sqrt((vt + vc) / 2.0)
        return m.select(
            "covariate",
            nt.alias("n_treated"),
            nc.alias("n_control"),
            stable_round(st / 1000000.0 / nt, 6).alias("mean_treated"),
            stable_round(sc / 1000000.0 / nc, 6).alias("mean_control"),
            stable_round(smd, 6).alias("smd"),
        )


_register_covariate_balance()


def _register_eb_ctr_shrinkage() -> None:
    @register(
        "q_eb_ctr_shrinkage",
        oracle="""
WITH per_user AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END) AS BIGINT) AS impressions
    FROM events GROUP BY user_id
),
gl AS (
    SELECT CAST(sum(clicks) AS BIGINT) AS gc, CAST(sum(impressions) AS BIGINT) AS gi
    FROM per_user
)
SELECT user_id, clicks, impressions,
       CASE WHEN impressions = 0 THEN CAST(NULL AS DOUBLE)
            ELSE (round((clicks * 1.0 / impressions) * 1000000.0) / 1000000.0)
       END AS raw_ctr,
       (round(((clicks + (gc * 1.0 / gi) * 20.0) / (impressions + 20.0))
              * 1000000.0) / 1000000.0) AS shrunk_ctr
FROM per_user CROSS JOIN gl
""",
        description=(
            "Empirical-Bayes CTR shrinkage: each user's click-through "
            "rate pulled toward the global prior with pseudo-count "
            "strength 20 (Beta(p0*s, (1-p0)*s) posterior mean) — the "
            "low-evidence-rate stabilizer used wherever a per-entity "
            "rate feeds ranking or features (a 1/1 user must not beat "
            "a 95/100 user), complementing q_target_encode_loo "
            "(leakage control) and q_rate_wilson_ci (uncertainty "
            "bounds) as the third classic rate treatment. One partial-"
            "aggregated per-user pass; the global prior is a 1-row "
            "broadcast; counts are exact BIGINTs so both rates are "
            "single rounded divisions."
        ),
        tags=("analytics", "extension", "ml-prep"),
    )
    def q_eb_ctr_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        per_user = ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("clicks"),
            F.sum(
                F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
            )
            .cast("long")
            .alias("impressions"),
        )
        gl = per_user.agg(
            F.sum("clicks").cast("long").alias("gc"),
            F.sum("impressions").cast("long").alias("gi"),
        )
        out = per_user.crossJoin(F.broadcast(gl))
        prior = F.col("gc") * 1.0 / F.col("gi")
        return out.select(
            "user_id",
            "clicks",
            "impressions",
            F.when(F.col("impressions") == 0, F.lit(None).cast("double"))
            .otherwise(stable_round(F.col("clicks") * 1.0 / F.col("impressions"), 6))
            .alias("raw_ctr"),
            stable_round(
                (F.col("clicks") + prior * 20.0) / (F.col("impressions") + 20.0), 6
            ).alias("shrunk_ctr"),
        )


_register_eb_ctr_shrinkage()


_PD_GRID = [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5]


def _partial_dependence_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    grid = ", ".join(str(g) for g in _PD_GRID)
    return f"""WITH {joined},
grid AS (SELECT CAST(unnest([{grid}]) AS DOUBLE) AS g),
pd AS (
    SELECT g.g,
           CAST(round((1.0 / (1.0 + exp(-(b.b0 + b.b1 * g.g + b.b2 * f.x2))))
                      * 10000000000.0) AS BIGINT) AS pq
    FROM feat f CROSS JOIN grid g CROSS JOIN {final} b
)
SELECT g AS x1_log_clicks,
       CAST(count(*) AS BIGINT) AS n_profiles,
       (round((CAST(sum(pq) AS BIGINT) / 10000000000.0 / count(*))
              * 1000000.0) / 1000000.0) AS mean_p
FROM pd GROUP BY g
""".strip()


def _register_partial_dependence() -> None:
    @register(
        "q_partial_dependence",
        oracle=_partial_dependence_oracle(),
        description=(
            "Partial-dependence curve of the IRLS model on "
            "x1=ln(1+clicks): for each of 10 grid values, x1 is forced "
            "to the grid point for EVERY user profile (x2 kept as "
            "observed) and the predicted conversion probability is "
            "averaged — the model-explainability view that shows what "
            "the classifier actually learned about click volume, "
            "marginalized over the real covariate distribution "
            "(q_shapley_attribution explains channels; this explains "
            "the model). One users x 10 grid cross join, partial-"
            "aggregated per grid point; per-profile sigmoids quantize "
            "to BIGINT at 1e-10 before the mean, so no float sum "
            "order exists on either engine."
        ),
        tags=("analytics", "extension", "ml", "evaluation"),
    )
    def q_partial_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(feat, rounds=4)
            grid = spark.createDataFrame(
                [(g,) for g in _PD_GRID], "g double"
            )
            eta = F.lit(b0) + F.lit(b1) * F.col("g") + F.lit(b2) * F.col("x2")
            pq = F.round(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))) * 10000000000.0
            ).cast("long")
            pd = feat.crossJoin(F.broadcast(grid)).select(
                F.col("g"), pq.alias("pq")
            )
            return pd.groupBy(F.col("g").alias("x1_log_clicks")).agg(
                F.count(F.lit(1)).cast("long").alias("n_profiles"),
                stable_round(
                    F.sum("pq").cast("long") / 10000000000.0 / F.count(F.lit(1)), 6
                ).alias("mean_p"),
            )
        finally:
            feat.unpersist()


_register_partial_dependence()


def _permutation_importance_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
feat_u AS (
    SELECT user_id,
           CAST(ln(1.0 + sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)) AS DOUBLE) AS x1,
           CAST(ln(1.0 + sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)) AS DOUBLE)  AS x2,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END)        AS y
    FROM events GROUP BY user_id
),
keyed AS (
    SELECT *,
           CAST(row_number() OVER (ORDER BY
               ('0x' || substring(md5('pi:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT,
               user_id) AS BIGINT) AS rk,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM feat_u
),
shuf AS (
    SELECT a.user_id, a.x1, a.x2, a.y,
           b1.x1 AS x1_perm, b2.x2 AS x2_perm
    FROM keyed a
    JOIN keyed b1 ON b1.rk = (a.rk % a.n) + 1
    JOIN keyed b2 ON b2.rk = (a.rk % a.n) + 1
),
acc AS (
    SELECT
      CAST(sum(CASE WHEN (CASE WHEN 1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))
                               > 0.5 THEN 1 ELSE 0 END) = y THEN 1 ELSE 0 END) AS BIGINT) AS base_ok,
      CAST(sum(CASE WHEN (CASE WHEN 1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1_perm + b.b2 * x2)))
                               > 0.5 THEN 1 ELSE 0 END) = y THEN 1 ELSE 0 END) AS BIGINT) AS x1_ok,
      CAST(sum(CASE WHEN (CASE WHEN 1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2_perm)))
                               > 0.5 THEN 1 ELSE 0 END) = y THEN 1 ELSE 0 END) AS BIGINT) AS x2_ok,
      CAST(count(*) AS BIGINT) AS n
    FROM shuf CROSS JOIN {final} b
)
SELECT f AS feature, base_acc, perm_acc, importance FROM (
    SELECT 'x1_log_clicks' AS f,
           (round((base_ok * 1.0 / n) * 1000000.0) / 1000000.0) AS base_acc,
           (round((x1_ok * 1.0 / n) * 1000000.0) / 1000000.0)   AS perm_acc,
           (round(((base_ok - x1_ok) * 1.0 / n) * 1000000.0) / 1000000.0) AS importance
    FROM acc
    UNION ALL
    SELECT 'x2_log_views',
           (round((base_ok * 1.0 / n) * 1000000.0) / 1000000.0),
           (round((x2_ok * 1.0 / n) * 1000000.0) / 1000000.0),
           (round(((base_ok - x2_ok) * 1.0 / n) * 1000000.0) / 1000000.0)
    FROM acc
)
""".strip()


def _register_permutation_importance() -> None:
    @register(
        "q_permutation_importance",
        oracle=_permutation_importance_oracle(),
        description=(
            "Permutation feature importance for the IRLS model: each "
            "feature column is permuted by a deterministic md5-keyed "
            "cyclic shift (rank users by content hash, take the next "
            "user's value — a true permutation, reproducible on any "
            "engine/partitioning, no RNG state) and the drop in "
            "training accuracy is the importance — the model-agnostic "
            "'which signals does the model actually lean on' readout "
            "next to q_partial_dependence's shape view. Accuracy "
            "deltas are exact BIGINT hit-counts from ONE pass over "
            "the shifted frame; the shift itself is a two-phase "
            "bucketed global rank (bucketed_rank — no single-partition "
            "sort) plus an equi-join on adjacent ranks, fully "
            "distributed over the users-sized aggregate."
        ),
        tags=("analytics", "extension", "ml", "evaluation"),
    )
    def q_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(feat, rounds=4)
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("pi:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            from healthcare_etl_spark.operators.scale import bucketed_rank

            n_users = feat.count()
            # two-phase bucketed global rank over (hash, user_id) — the
            # permutation pairing needs a total order but never a
            # single-partition sort; hash div 2^20 coarsens the order
            keyed = bucketed_rank(
                feat.select("user_id", "x1", "x2", "y", h.alias("hk")),
                buckets=[F.expr("hk div 1048576")],
                order_by=[F.asc("hk"), F.asc("user_id")],
                out_col="rk",
            ).withColumn("n", F.lit(n_users).cast("long"))
            nxt = keyed.select(
                F.col("rk").alias("rk_b"),
                F.col("x1").alias("x1_perm"),
                F.col("x2").alias("x2_perm"),
            )
            shuf = keyed.join(
                nxt, F.col("rk_b") == (F.col("rk") % F.col("n")) + 1
            )

            def sig(x1c, x2c):
                eta = F.lit(b0) + F.lit(b1) * x1c + F.lit(b2) * x2c
                return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))

            def hits(x1c, x2c):
                pred = F.when(sig(x1c, x2c) > 0.5, 1).otherwise(0)
                return F.sum(F.when(pred == F.col("y"), 1).otherwise(0)).cast("long")

            acc = shuf.agg(
                hits(F.col("x1"), F.col("x2")).alias("base_ok"),
                hits(F.col("x1_perm"), F.col("x2")).alias("x1_ok"),
                hits(F.col("x1"), F.col("x2_perm")).alias("x2_ok"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            rows = []
            for fname, okc in [("x1_log_clicks", "x1_ok"), ("x2_log_views", "x2_ok")]:
                rows.append(
                    acc.select(
                        F.lit(fname).alias("feature"),
                        stable_round(F.col("base_ok") * 1.0 / F.col("n"), 6).alias(
                            "base_acc"
                        ),
                        stable_round(F.col(okc) * 1.0 / F.col("n"), 6).alias(
                            "perm_acc"
                        ),
                        stable_round(
                            (F.col("base_ok") - F.col(okc)) * 1.0 / F.col("n"), 6
                        ).alias("importance"),
                    )
                )
            return rows[0].unionAll(rows[1])
        finally:
            feat.unpersist()


_register_permutation_importance()


def _register_mahalanobis() -> None:
    @register(
        "q_mahalanobis_outliers",
        oracle="""
WITH feat AS (
    SELECT user_id,
           CAST(round(ln(1.0 + sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END))
                      * 1000000.0) AS BIGINT) AS x1q,
           CAST(round(ln(1.0 + sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END))
                      * 1000000.0) AS BIGINT) AS x2q
    FROM events GROUP BY user_id
),
mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x1q) AS BIGINT) AS s1, CAST(sum(x2q) AS BIGINT) AS s2,
           CAST(sum(x1q * x1q) AS BIGINT) AS s11,
           CAST(sum(x2q * x2q) AS BIGINT) AS s22,
           CAST(sum(x1q * x2q) AS BIGINT) AS s12
    FROM feat
),
cov AS (
    SELECT n, s1, s2,
           ((s11 - s1 * 1.0 / n * s1) / (n - 1)) / 1000000000000.0 AS c11,
           ((s22 - s2 * 1.0 / n * s2) / (n - 1)) / 1000000000000.0 AS c22,
           ((s12 - s1 * 1.0 / n * s2) / (n - 1)) / 1000000000000.0 AS c12
    FROM mom
),
scored AS (
    SELECT f.user_id,
           (f.x1q - c.s1 * 1.0 / c.n) / 1000000.0 AS dx1,
           (f.x2q - c.s2 * 1.0 / c.n) / 1000000.0 AS dx2,
           c.c11, c.c22, c.c12,
           (c.c11 * c.c22 - c.c12 * c.c12) AS det
    FROM feat f CROSS JOIN cov c
),
d2 AS (
    SELECT user_id,
           ((dx1 * (c22 * dx1 - c12 * dx2)
             + dx2 * (c11 * dx2 - c12 * dx1)) / det) AS md2
    FROM scored
)
SELECT user_id,
       (round(md2 * 1000000.0) / 1000000.0) AS mahalanobis_sq,
       TRUE AS is_outlier
FROM d2 WHERE md2 >= 5.991464547107979
""",
        description=(
            "Mahalanobis-distance multivariate outliers over the "
            "per-user behavior profile (ln(1+clicks), ln(1+views)): "
            "users whose squared distance exceeds the chi-square(2) "
            "95% critical value — catching the CORRELATED anomalies "
            "(many clicks, impossibly few views) that the univariate "
            "q_anomaly_mad/q_iqr_outliers gates pass. Features are "
            "quantized to integer micro-units, so the covariance "
            "comes from ONE exact-BIGINT moment aggregate (count + 5 "
            "sums — the one-pass Gram discipline of "
            "q_embedding_covariance); the closed-form 2x2 inverse and "
            "per-user distance are fixed double expressions of those "
            "moments (Cramer, no iteration), and the chi2 cutoff is "
            "an inlined literal identical on both engines."
        ),
        tags=("analytics", "extension", "stats", "quality"),
    )
    def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.round(
                F.log(
                    F.lit(1.0)
                    + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("x1q"),
            F.round(
                F.log(
                    F.lit(1.0)
                    + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("x2q"),
        )
        mom = feat.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x1q").cast("long").alias("s1"),
            F.sum("x2q").cast("long").alias("s2"),
            F.sum(F.col("x1q") * F.col("x1q")).cast("long").alias("s11"),
            F.sum(F.col("x2q") * F.col("x2q")).cast("long").alias("s22"),
            F.sum(F.col("x1q") * F.col("x2q")).cast("long").alias("s12"),
        )
        n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
        c11 = ((F.col("s11") - s1 * 1.0 / n * s1) / (n - 1)) / 1e12
        c22 = ((F.col("s22") - s2 * 1.0 / n * s2) / (n - 1)) / 1e12
        c12 = ((F.col("s12") - s1 * 1.0 / n * s2) / (n - 1)) / 1e12
        cov = mom.select(
            "n", "s1", "s2",
            c11.alias("c11"), c22.alias("c22"), c12.alias("c12"),
        )
        sc = feat.crossJoin(F.broadcast(cov))
        dx1 = (F.col("x1q") - F.col("s1") * 1.0 / F.col("n")) / 1e6
        dx2 = (F.col("x2q") - F.col("s2") * 1.0 / F.col("n")) / 1e6
        det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
        md2 = (
            dx1 * (F.col("c22") * dx1 - F.col("c12") * dx2)
            + dx2 * (F.col("c11") * dx2 - F.col("c12") * dx1)
        ) / det
        return (
            sc.select("user_id", md2.alias("md2"))
            .filter(F.col("md2") >= 5.991464547107979)
            .select(
                "user_id",
                stable_round(F.col("md2"), 6).alias("mahalanobis_sq"),
                F.lit(True).alias("is_outlier"),
            )
        )


_register_mahalanobis()


_RAKE_ROUNDS = 4


def _raking_oracle() -> str:
    """Unrolled IPF: integer micro-unit cell values; each half-step is
    the fixed expression round((aq/1e6) * target / (margin_q/1e6) * 1e6)
    so both engines step through identical BIGINT states."""
    parts = [
        """cells AS (
    SELECT event_type AS et, CAST(dayofweek(ts) + 1 AS BIGINT) AS wd,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
)""",
        """tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)""",
        """rt AS (SELECT et, CAST(sum(n) AS BIGINT) AS row_target FROM cells GROUP BY 1)""",
        """a_0 AS (SELECT et, wd, n, n * 1000000 AS aq FROM cells)""",
    ]
    prev = "a_0"
    for r in range(1, _RAKE_ROUNDS + 1):
        parts.append(
            f"""rs_{r} AS (SELECT et, CAST(sum(aq) AS BIGINT) AS row_q FROM {prev} GROUP BY 1)"""
        )
        parts.append(
            f"""ar_{r} AS (
    SELECT a.et, a.wd, a.n,
           CAST(round((a.aq * 1.0 / 1000000.0) * r.row_target
                      / (s.row_q / 1000000.0) * 1000000.0) AS BIGINT) AS aq
    FROM {prev} a JOIN rt r ON r.et = a.et JOIN rs_{r} s ON s.et = a.et
)"""
        )
        parts.append(
            f"""cs_{r} AS (SELECT wd, CAST(sum(aq) AS BIGINT) AS col_q FROM ar_{r} GROUP BY 1)"""
        )
        parts.append(
            f"""a_{r} AS (
    SELECT a.et, a.wd, a.n,
           CAST(round((a.aq * 1.0 / 1000000.0) * (t.total / 7.0)
                      / (s.col_q / 1000000.0) * 1000000.0) AS BIGINT) AS aq
    FROM ar_{r} a JOIN cs_{r} s ON s.wd = a.wd CROSS JOIN tot t
)"""
        )
        prev = f"a_{r}"
    joined = ",\n".join(parts)
    return f"""WITH {joined}
SELECT et AS event_type, wd AS weekday, n,
       (round((aq / 1000000.0) * 1000000.0) / 1000000.0) AS adjusted_count,
       (round((aq * 1.0 / 1000000.0 / n) * 1000000.0) / 1000000.0) AS rake_weight
FROM {prev}
"""


def _register_raking() -> None:
    @register(
        "q_raking_weights",
        oracle=_raking_oracle(),
        description=(
            "Raking / iterative proportional fitting (4 rounds) over "
            "the event_type x weekday cell table: cell weights scaled "
            "alternately so row margins match the observed event-type "
            "totals and column margins match a uniform weekday target "
            "— the survey-calibration primitive for de-biasing a "
            "corpus or panel toward known population margins "
            "(post-stratification's many-margin big sibling). The one "
            "data-scale pass is the 35-cell count; iterations ride the "
            "driver on integer micro-unit cell states (the k-means/"
            "markov discipline), each half-step one fixed rounded "
            "expression of BIGINTs, mirrored by the unrolled-CTE "
            "oracle bit-for-bit. rake_weight is the per-cell "
            "adjustment factor downstream analyses multiply in."
        ),
        tags=("analytics", "extension", "stats", "iterative"),
    )
    def q_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        cells_df = ev.groupBy(
            F.col("event_type").alias("et"),
            F.dayofweek("ts").cast("long").alias("wd"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        rows = cells_df.collect()
        cells = {(r["et"], r["wd"]): r["n"] for r in rows}
        total = sum(cells.values())
        row_target = {}
        for (et, wd), n in cells.items():
            row_target[et] = row_target.get(et, 0) + n
        col_target = total / 7.0
        aq = {k: n * 1000000 for k, n in cells.items()}
        # Fixed expression per half-step, identical to the oracle:
        # round((aq/1e6) * target / (margin/1e6) * 1e6) -> BIGINT.
        import math

        def rnd(x: float) -> int:
            return int(math.copysign(math.floor(abs(x) + 0.5), x))

        for _ in range(_RAKE_ROUNDS):
            row_q: dict = {}
            for (et, wd), v in aq.items():
                row_q[et] = row_q.get(et, 0) + v
            aq = {
                (et, wd): rnd(
                    (v * 1.0 / 1000000.0)
                    * row_target[et]
                    / (row_q[et] / 1000000.0)
                    * 1000000.0
                )
                for (et, wd), v in aq.items()
            }
            col_q: dict = {}
            for (et, wd), v in aq.items():
                col_q[wd] = col_q.get(wd, 0) + v
            aq = {
                (et, wd): rnd(
                    (v * 1.0 / 1000000.0)
                    * col_target
                    / (col_q[wd] / 1000000.0)
                    * 1000000.0
                )
                for (et, wd), v in aq.items()
            }
        out_rows = [
            (et, wd, cells[(et, wd)], float(aq[(et, wd)]))
            for (et, wd) in sorted(cells)
        ]
        res = spark.createDataFrame(
            out_rows, "event_type string, weekday long, n long, aq double"
        )
        return res.select(
            "event_type",
            "weekday",
            "n",
            stable_round(F.col("aq") / 1000000.0, 6).alias("adjusted_count"),
            stable_round(F.col("aq") / 1000000.0 / F.col("n"), 6).alias(
                "rake_weight"
            ),
        )


_register_raking()


def _register_wilcoxon() -> None:
    _D30 = 30 * 24 * 3600 * 1000000

    @register(
        "q_wilcoxon_signed_rank",
        oracle=f"""
WITH t0 AS (SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS start_us FROM events),
u AS (
    SELECT e.user_id,
           CAST(sum(CASE WHEN e.event_type = 'purchase'
                          AND epoch_us(e.ts) < t.start_us + {_D30}
                         THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS pre_cents,
           CAST(sum(CASE WHEN e.event_type = 'purchase'
                          AND epoch_us(e.ts) >= t.start_us + {_D30}
                          AND epoch_us(e.ts) < t.start_us + {2 * _D30}
                         THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS post_cents
    FROM events e CROSS JOIN t0 t
    GROUP BY e.user_id
),
d AS (
    SELECT (post_cents - pre_cents) AS dv FROM u
    WHERE post_cents <> pre_cents
),
grp AS (
    SELECT abs(dv) AS ad, CAST(count(*) AS BIGINT) AS t,
           CAST(sum(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_pos
    FROM d GROUP BY 1
),
ranked AS (
    SELECT ad, t, t_pos,
           CAST(coalesce(sum(t) OVER (ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
    FROM grp
),
m AS (
    SELECT CAST(sum(t) AS BIGINT)                      AS n,
           CAST(sum(t_pos * (2 * cb + t + 1)) AS BIGINT) AS w_plus2,
           CAST(sum(t * t * t - t) AS BIGINT)          AS tie_sum
    FROM ranked
)
SELECT n AS n_nonzero, w_plus2,
       (round(((w_plus2 - n * 1.0 * (n + 1) / 2.0)
               / (2.0 * sqrt(n * 1.0 * (n + 1) * (2 * n + 1) / 24.0
                             - tie_sum / 48.0)))
              * 1000000.0) / 1000000.0) AS z_score,
       (round((((w_plus2 - n * 1.0 * (n + 1) / 2.0)
                / (2.0 * sqrt(n * 1.0 * (n + 1) * (2 * n + 1) / 24.0
                              - tie_sum / 48.0))) / sqrt(n * 1.0))
              * 1000000.0) / 1000000.0) AS effect_r
FROM m
""",
        description=(
            "Wilcoxon signed-rank test on PAIRED per-user spend "
            "(first 30 days vs second 30 days from corpus start): did "
            "the same users' behavior shift, without assuming "
            "normality of the differences — the paired member "
            "completing the testing family (Mann-Whitney compares two "
            "INDEPENDENT arms; pre/post per user is the within-subject "
            "design). Same exactness discipline as q_mann_whitney: "
            "zero-differences dropped per Wilcoxon, average ranks of "
            "|diff| as doubled integers over the DISTINCT-value "
            "table (its cum-before prefix is the two-phase bucketed "
            "carry — no single-partition sort), integer t^3-t tie "
            "correction, floats only in the final z / effect-size "
            "divisions."
        ),
        tags=("analytics", "extension", "stats"),
    )
    def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        t0 = ev.agg(F.min(F.unix_micros("ts")).cast("long").alias("start_us"))
        e = ev.crossJoin(F.broadcast(t0))
        us = F.unix_micros("ts")
        cents = F.round(F.col("value") * 100).cast("long")
        is_p = F.col("event_type") == "purchase"
        u = e.groupBy("user_id").agg(
            F.sum(
                F.when(is_p & (us < F.col("start_us") + _D30), cents).otherwise(0)
            )
            .cast("long")
            .alias("pre_cents"),
            F.sum(
                F.when(
                    is_p
                    & (us >= F.col("start_us") + _D30)
                    & (us < F.col("start_us") + 2 * _D30),
                    cents,
                ).otherwise(0)
            )
            .cast("long")
            .alias("post_cents"),
        )
        d = u.filter(F.col("post_cents") != F.col("pre_cents")).select(
            (F.col("post_cents") - F.col("pre_cents")).alias("dv")
        )
        grp = d.groupBy(F.abs(F.col("dv")).alias("ad")).agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.sum(F.when(F.col("dv") > 0, 1).otherwise(0)).cast("long").alias("t_pos"),
        )
        from healthcare_etl_spark.operators.scale import bucketed_prefix

        # cum-before over the distinct-|diff| table WITHOUT a single-
        # partition sort (the q_mann_whitney bucketed-carry discipline —
        # distinct cent differences grow with the data)
        ranked = bucketed_prefix(
            grp,
            buckets=[F.expr("ad div 4096")],
            order_by=[F.asc("ad")],
            value=F.col("t"),
            agg="sum",
            exclusive=True,
            out_col="cb",
        ).select("t", "t_pos", F.coalesce(F.col("cb"), F.lit(0)).cast("long").alias("cb"))
        t, tp, cb = F.col("t"), F.col("t_pos"), F.col("cb")
        m = ranked.agg(
            F.sum(t).cast("long").alias("n"),
            F.sum(tp * (2 * cb + t + 1)).cast("long").alias("w_plus2"),
            F.sum(t * t * t - t).cast("long").alias("tie_sum"),
        )
        n, w2, ts_ = F.col("n"), F.col("w_plus2"), F.col("tie_sum")
        z = (w2 - n * 1.0 * (n + 1) / 2.0) / (
            2.0
            * F.sqrt(
                n * 1.0 * (n + 1) * (2 * n + 1) / 24.0 - ts_ / 48.0
            )
        )
        return m.select(
            n.alias("n_nonzero"),
            "w_plus2",
            stable_round(z, 6).alias("z_score"),
            stable_round(z / F.sqrt(n * 1.0), 6).alias("effect_r"),
        )


_register_wilcoxon()


def _mcnemar_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
scored AS (
    SELECT y,
           (CASE WHEN 1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2))) > 0.5
                 THEN 1 ELSE 0 END) AS pred_model,
           (CASE WHEN x1 > 2.0 THEN 1 ELSE 0 END) AS pred_baseline
    FROM feat CROSS JOIN {final} b
),
cells AS (
    SELECT CAST(sum(CASE WHEN pred_model = y AND pred_baseline <> y
                    THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(sum(CASE WHEN pred_model <> y AND pred_baseline = y
                    THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(sum(CASE WHEN pred_model = y AND pred_baseline = y
                    THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
           CAST(sum(CASE WHEN pred_model <> y AND pred_baseline <> y
                    THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
    FROM scored
)
SELECT b AS model_only_right, c AS baseline_only_right, both_right, both_wrong,
       (round(((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c))
              * 1000000.0) / 1000000.0) AS mcnemar_chi2
FROM cells WHERE b + c > 0
""".strip()


def _register_mcnemar() -> None:
    @register(
        "q_mcnemar_test",
        oracle=_mcnemar_oracle(),
        description=(
            "McNemar's test (continuity-corrected) comparing the IRLS "
            "model against the naive click-volume baseline "
            "(ln(1+clicks) > 2) on the SAME users: only the discordant "
            "cells — users exactly one classifier gets right — carry "
            "information about which model is better, which is why "
            "comparing two accuracies with a two-proportion z-test "
            "(q_ab_test_ztest's machinery) is wrong for paired "
            "predictions (it ignores the pairing and wastes the "
            "concordant mass). The model-comparison member of the "
            "testing family: chi2 = (|b-c|-1)^2/(b+c) from four exact "
            "BIGINT cells out of ONE partial-aggregated scoring pass."
        ),
        tags=("analytics", "extension", "stats", "ml", "evaluation"),
    )
    def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(feat, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            pm = F.when(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)) > 0.5, 1
            ).otherwise(0)
            pb = F.when(F.col("x1") > 2.0, 1).otherwise(0)
            scored = feat.select("y", pm.alias("pm"), pb.alias("pb"))
            y, m, bl = F.col("y"), F.col("pm"), F.col("pb")
            cells = scored.agg(
                F.sum(F.when((m == y) & (bl != y), 1).otherwise(0))
                .cast("long")
                .alias("b"),
                F.sum(F.when((m != y) & (bl == y), 1).otherwise(0))
                .cast("long")
                .alias("c"),
                F.sum(F.when((m == y) & (bl == y), 1).otherwise(0))
                .cast("long")
                .alias("both_right"),
                F.sum(F.when((m != y) & (bl != y), 1).otherwise(0))
                .cast("long")
                .alias("both_wrong"),
            )
            b, c = F.col("b"), F.col("c")
            chi2 = (F.abs(b - c) - 1.0) * (F.abs(b - c) - 1.0) / (b + c)
            return cells.filter(b + c > 0).select(
                b.alias("model_only_right"),
                c.alias("baseline_only_right"),
                "both_right",
                "both_wrong",
                stable_round(chi2, 6).alias("mcnemar_chi2"),
            )
        finally:
            feat.unpersist()


_register_mcnemar()


def _register_logrank() -> None:
    @register(
        "q_logrank_test",
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
           ((('0x' || substring(md5('ab-v1:' || CAST(f.user_id AS VARCHAR)), 1, 8))::BIGINT
             % 2) = 0) AS in_a,
           CASE WHEN p.p_us IS NOT NULL
                     AND (p.p_us - f.first_us) // 3600000000 <= 60
                THEN (p.p_us - f.first_us) // 3600000000 ELSE 60 END AS dur,
           (p.p_us IS NOT NULL AND (p.p_us - f.first_us) // 3600000000 <= 60) AS event
    FROM f LEFT JOIN p ON f.user_id = p.user_id
),
tbl AS (
    SELECT CAST(dur AS BIGINT) AS dur,
           CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(sum(CASE WHEN event AND in_a THEN 1 ELSE 0 END) AS BIGINT) AS d_a,
           CAST(count(*) AS BIGINT) AS leave_t,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS leave_a
    FROM subj GROUP BY 1
),
risk AS (
    SELECT dur, d, d_a,
           CAST(sum(leave_t) OVER () - coalesce(sum(leave_t) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_t,
           CAST(sum(leave_a) OVER () - coalesce(sum(leave_a) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_a
    FROM tbl
),
terms AS (
    SELECT d_a, d, n_t, n_a,
           CAST(round((d_a - d * 1.0 * n_a / n_t) * 10000000000.0) AS BIGINT) AS oe_q,
           CAST(round(CASE WHEN n_t > 1
                THEN (d * 1.0 * (n_a * 1.0 / n_t) * (1.0 - n_a * 1.0 / n_t)
                      * (n_t - d) / (n_t - 1.0)) ELSE 0.0 END * 10000000000.0)
                AS BIGINT) AS v_q
    FROM risk WHERE d > 0
),
m AS (
    SELECT CAST(sum(oe_q) AS BIGINT) AS oe, CAST(sum(v_q) AS BIGINT) AS v
    FROM terms
)
SELECT (round((oe / 10000000000.0) * 1000000.0) / 1000000.0) AS observed_minus_expected_a,
       (round((v / 10000000000.0) * 1000000.0) / 1000000.0)  AS variance,
       (round(((oe / 10000000000.0) / sqrt(v / 10000000000.0))
              * 1000000.0) / 1000000.0) AS z_score,
       (round((((oe / 10000000000.0) / sqrt(v / 10000000000.0))
               * ((oe / 10000000000.0) / sqrt(v / 10000000000.0)))
              * 1000000.0) / 1000000.0) AS logrank_chi2
FROM m
""",
        description=(
            "Log-rank test comparing time-to-first-purchase between "
            "the md5 A/B arms: at each event time, observed arm-A "
            "conversions vs the hypergeometric expectation d*n_A/n "
            "given the at-risk sets, summed to the O-E / sqrt(V) "
            "statistic — the censoring-correct way to compare the two "
            "arms' q_kaplan_meier curves (comparing conversion RATES "
            "at a fixed horizon throws away timing and mishandles "
            "censoring; q_wilcoxon_signed_rank pairs within users, "
            "this compares independent arms over durations). At-risk "
            "counts are the same running-window arithmetic as the KM "
            "duration table (<=61 rows), per-time O-E and variance "
            "terms quantize to BIGINT at 1e-10 before summing, and "
            "the data-scale work is the two per-user aggregates."
        ),
        tags=("analytics", "extension", "stats"),
    )
    def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        f = ev.groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("first_us"))
        p = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min(F.unix_micros("ts")).alias("p_us"))
        )
        in_a = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )
        delay_h = F.floor((F.col("p_us") - F.col("first_us")) / F.lit(3600000000))
        is_event = F.col("p_us").isNotNull() & (delay_h <= 60)
        subj = f.join(p, "user_id", "left").select(
            in_a.alias("in_a"),
            F.when(is_event, delay_h).otherwise(F.lit(60)).cast("long").alias("dur"),
            is_event.alias("event"),
        )
        tbl = subj.groupBy("dur").agg(
            F.sum(F.when(F.col("event"), 1).otherwise(0)).cast("long").alias("d"),
            F.sum(F.when(F.col("event") & F.col("in_a"), 1).otherwise(0))
            .cast("long")
            .alias("d_a"),
            F.count(F.lit(1)).cast("long").alias("leave_t"),
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("leave_a"),
        )
        w_all = Window.partitionBy()
        w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
        risk = tbl.select(
            "dur",
            "d",
            "d_a",
            (
                F.sum("leave_t").over(w_all)
                - F.coalesce(F.sum("leave_t").over(w_prev), F.lit(0))
            )
            .cast("long")
            .alias("n_t"),
            (
                F.sum("leave_a").over(w_all)
                - F.coalesce(F.sum("leave_a").over(w_prev), F.lit(0))
            )
            .cast("long")
            .alias("n_a"),
        )
        d, da, nt, na = F.col("d"), F.col("d_a"), F.col("n_t"), F.col("n_a")
        share = na * 1.0 / nt
        oe_q = F.round((da - d * 1.0 * na / nt) * 1e10).cast("long")
        v_q = F.round(
            F.when(
                nt > 1, d * 1.0 * share * (F.lit(1.0) - share) * (nt - d) / (nt - 1.0)
            ).otherwise(F.lit(0.0))
            * 1e10
        ).cast("long")
        m = (
            risk.filter(d > 0)
            .select(oe_q.alias("oe_q"), v_q.alias("v_q"))
            .agg(
                F.sum("oe_q").cast("long").alias("oe"),
                F.sum("v_q").cast("long").alias("v"),
            )
        )
        oe, v = F.col("oe") / 1e10, F.col("v") / 1e10
        z = oe / F.sqrt(v)
        return m.select(
            stable_round(oe, 6).alias("observed_minus_expected_a"),
            stable_round(v, 6).alias("variance"),
            stable_round(z, 6).alias("z_score"),
            stable_round(z * z, 6).alias("logrank_chi2"),
        )


_register_logrank()


def _register_decision_stump() -> None:
    @register(
        "q_decision_stump",
        oracle="""
WITH feat AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS y
    FROM events GROUP BY user_id
),
grp AS (
    SELECT x, CAST(count(*) AS BIGINT) AS t, CAST(sum(y) AS BIGINT) AS tp
    FROM feat GROUP BY x
),
cum AS (
    SELECT x, t, tp,
           CAST(sum(t)  OVER (ORDER BY x) AS BIGINT) AS ln,
           CAST(sum(tp) OVER (ORDER BY x) AS BIGINT) AS lp,
           CAST(sum(t)  OVER () AS BIGINT) AS n,
           CAST(sum(tp) OVER () AS BIGINT) AS p
    FROM grp
),
splits AS (
    SELECT x AS threshold, ln, lp, (n - ln) AS rn, (p - lp) AS rp, n, p,
           ((ln * 1.0 / n) * (2.0 * (lp * 1.0 / ln) * (1.0 - lp * 1.0 / ln))
            + ((n - ln) * 1.0 / n)
              * (2.0 * ((p - lp) * 1.0 / (n - ln))
                 * (1.0 - (p - lp) * 1.0 / (n - ln)))) AS w_gini,
           (2.0 * (p * 1.0 / n) * (1.0 - p * 1.0 / n)) AS root_gini
    FROM cum WHERE ln < n
),
best AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            ORDER BY CAST(round(w_gini * 1000000000000.0) AS BIGINT) ASC,
                     threshold ASC) AS rk
        FROM splits
    ) WHERE rk = 1
)
SELECT threshold AS split_le_clicks, ln AS n_left, lp AS pos_left,
       rn AS n_right, rp AS pos_right,
       (round(root_gini * 1000000.0) / 1000000.0) AS root_gini,
       (round(w_gini * 1000000.0) / 1000000.0) AS split_gini,
       (round((root_gini - w_gini) * 1000000.0) / 1000000.0) AS gini_decrease
FROM best
""",
        description=(
            "Decision-stump learner: the single best 'clicks <= t' "
            "split for predicting conversion, chosen by weighted Gini "
            "impurity over EVERY candidate threshold in one pass — "
            "the root node of a decision tree, and the canonical "
            "distributed tree-learning pattern (per-feature value "
            "histogram -> cumulative class counts -> impurity scan) "
            "that XGBoost/LightGBM run per depth. Candidate stats "
            "come from ONE partial-aggregated pass; the cumulative "
            "windows ride the distinct-click-count table "
            "(activity-bounded, like q_spearman_corr's frames); the "
            "argmin compares 1e-12-quantized BIGINT impurities with a "
            "threshold tie-break, so the chosen split can never "
            "differ across engines."
        ),
        tags=("analytics", "extension", "ml", "stats"),
    )
    def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        )
        grp = feat.groupBy("x").agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.sum("y").cast("long").alias("tp"),
        )
        wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
        wa = Window.partitionBy()
        cum = grp.select(
            "x",
            F.sum("t").over(wc).cast("long").alias("ln"),
            F.sum("tp").over(wc).cast("long").alias("lp"),
            F.sum("t").over(wa).cast("long").alias("n"),
            F.sum("tp").over(wa).cast("long").alias("p"),
        )
        ln, lp, n, p = F.col("ln"), F.col("lp"), F.col("n"), F.col("p")
        lrate = lp * 1.0 / ln
        rrate = (p - lp) * 1.0 / (n - ln)
        w_gini = (ln * 1.0 / n) * (2.0 * lrate * (F.lit(1.0) - lrate)) + (
            (n - ln) * 1.0 / n
        ) * (2.0 * rrate * (F.lit(1.0) - rrate))
        root = 2.0 * (p * 1.0 / n) * (F.lit(1.0) - p * 1.0 / n)
        splits = cum.filter(ln < n).select(
            F.col("x").alias("threshold"),
            "ln",
            "lp",
            (n - ln).alias("rn"),
            (p - lp).alias("rp"),
            w_gini.alias("w_gini"),
            root.alias("root_gini"),
        )
        wr = Window.orderBy(
            F.asc(F.round(F.col("w_gini") * 1e12).cast("long")), F.asc("threshold")
        )
        best = splits.withColumn("rk", F.row_number().over(wr)).filter(
            F.col("rk") == 1
        )
        return best.select(
            F.col("threshold").alias("split_le_clicks"),
            F.col("ln").alias("n_left"),
            F.col("lp").alias("pos_left"),
            F.col("rn").alias("n_right"),
            F.col("rp").alias("pos_right"),
            stable_round(F.col("root_gini"), 6).alias("root_gini"),
            stable_round(F.col("w_gini"), 6).alias("split_gini"),
            stable_round(F.col("root_gini") - F.col("w_gini"), 6).alias(
                "gini_decrease"
            ),
        )


_register_decision_stump()


# SPRT literals, Python-precomputed so both engines inline the identical
# doubles: L1 = ln(p1/p0) for p1=0.22 vs p0=0.18, L0 = ln((1-p1)/(1-p0)),
# Wald boundary ln((1-beta)/alpha) = ln(19) at alpha = beta = 0.05.
_SPRT_L1 = 0.20067069546215124
_SPRT_L0 = -0.050010420574661305
_SPRT_BOUND = 2.9444389791664403


def _register_sprt() -> None:
    @register(
        "q_sprt_monitor",
        oracle=f"""
WITH conv AS (
    SELECT user_id,
           CAST(time_bucket(INTERVAL '1 day', min(ts)) AS DATE) AS day,
           max(CASE WHEN event_type = 'purchase' AND value > 150
                THEN 1 ELSE 0 END) AS converted
    FROM events
    WHERE (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 2) = 0
    GROUP BY user_id
),
daily AS (
    SELECT day, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(converted) AS BIGINT) AS c
    FROM conv GROUP BY 1
),
cum AS (
    SELECT day,
           CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS n_cum,
           CAST(sum(c) OVER (ORDER BY day) AS BIGINT) AS c_cum
    FROM daily
)
SELECT CAST(day AS VARCHAR) AS day, n_cum AS users, c_cum AS conversions,
       (round((c_cum * CAST({_SPRT_L1!r} AS DOUBLE)
               + (n_cum - c_cum) * CAST({_SPRT_L0!r} AS DOUBLE))
              * 1000000.0) / 1000000.0) AS llr,
       CASE WHEN (c_cum * CAST({_SPRT_L1!r} AS DOUBLE)
                  + (n_cum - c_cum) * CAST({_SPRT_L0!r} AS DOUBLE))
                 >= CAST({_SPRT_BOUND!r} AS DOUBLE) THEN 'accept_h1'
            WHEN (c_cum * CAST({_SPRT_L1!r} AS DOUBLE)
                  + (n_cum - c_cum) * CAST({_SPRT_L0!r} AS DOUBLE))
                 <= -CAST({_SPRT_BOUND!r} AS DOUBLE) THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
""",
        description=(
            "Wald SPRT conversion-rate monitor: the daily cumulative "
            "log-likelihood ratio of H1 (rate 0.22) vs H0 (0.18) over "
            "arm-A users, with the ln(19) accept/reject boundaries "
            "(alpha=beta=0.05) — the always-valid sequential design "
            "that stops on EVIDENCE rather than at fixed looks, "
            "complementing q_sequential_ab_monitor's Haybittle-Peto "
            "group-sequential readout (SPRT is optimal in expected "
            "sample size when the true rate sits at one hypothesis). "
            "The LLR is cumulative-BIGINT counts times two Python-"
            "precomputed double literals inlined identically in both "
            "plans — integer windows over the days-sized series are "
            "the only cross-row state, so nothing floats across rows."
        ),
        tags=("analytics", "extension", "stats", "timeseries"),
    )
    def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        in_a = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )
        conv = (
            ev.filter(in_a)
            .groupBy("user_id")
            .agg(
                F.date_trunc("day", F.min("ts")).cast("date").alias("day"),
                F.max(
                    F.when(
                        (F.col("event_type") == "purchase") & (F.col("value") > 150),
                        1,
                    ).otherwise(0)
                ).alias("converted"),
            )
        )
        daily = conv.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("converted").cast("long").alias("c"),
        )
        wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        cum = daily.select(
            "day",
            F.sum("n").over(wc).cast("long").alias("n_cum"),
            F.sum("c").over(wc).cast("long").alias("c_cum"),
        )
        llr = F.col("c_cum") * F.lit(_SPRT_L1) + (
            F.col("n_cum") - F.col("c_cum")
        ) * F.lit(_SPRT_L0)
        return cum.select(
            F.col("day").cast("string").alias("day"),
            F.col("n_cum").alias("users"),
            F.col("c_cum").alias("conversions"),
            stable_round(llr, 6).alias("llr"),
            F.when(llr >= _SPRT_BOUND, F.lit("accept_h1"))
            .when(llr <= -_SPRT_BOUND, F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("decision"),
        )


_register_sprt()


def _register_odds_ratio() -> None:
    @register(
        "q_odds_ratio",
        oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a,
           max(CASE WHEN event_type = 'purchase' AND value > 150
                THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
),
cells AS (
    SELECT CAST(sum(CASE WHEN in_a AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT)     AS a,
           CAST(sum(CASE WHEN in_a AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT)     AS b,
           CAST(sum(CASE WHEN NOT in_a AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(sum(CASE WHEN NOT in_a AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM u
)
SELECT a AS conv_a, b AS nonconv_a, c AS conv_b, d AS nonconv_b,
       (round((a * 1.0 * d / (b * 1.0 * c)) * 1000000.0) / 1000000.0) AS odds_ratio,
       (round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                  - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d))
              * 1000000.0) / 1000000.0) AS or_ci_lo,
       (round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                  + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d))
              * 1000000.0) / 1000000.0) AS or_ci_hi,
       (round(((a * 1.0 / (a + b)) / (c * 1.0 / (c + d))) * 1000000.0)
        / 1000000.0) AS relative_risk
FROM cells WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
""",
        description=(
            "Odds ratio + 95% Wald CI and relative risk for the A/B "
            "conversion 2x2 table — the EFFECT-SIZE readout that "
            "travels with q_ab_test_ztest's significance verdict "
            "(a significant z with an OR CI hugging 1.0 is a large-n "
            "nothing; stakeholders act on magnitudes, not p-values). "
            "All four cells are exact BIGINTs from one per-user pass; "
            "OR, its log-scale Wald interval (z=1.959964 inlined "
            "identically), and RR are fixed double expressions of "
            "those integers."
        ),
        tags=("analytics", "extension", "stats"),
    )
    def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        in_a = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )
        u = ev.groupBy("user_id").agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("conv"),
            F.first(in_a).alias("in_a"),
        )
        cells = u.agg(
            F.sum(F.when(F.col("in_a") & (F.col("conv") == 1), 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("in_a") & (F.col("conv") == 0), 1).otherwise(0))
            .cast("long")
            .alias("b"),
            F.sum(F.when(~F.col("in_a") & (F.col("conv") == 1), 1).otherwise(0))
            .cast("long")
            .alias("c"),
            F.sum(F.when(~F.col("in_a") & (F.col("conv") == 0), 1).otherwise(0))
            .cast("long")
            .alias("d"),
        )
        a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
        orr = a * 1.0 * d / (b * 1.0 * c)
        half = F.lit(1.959964) * F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
        rr = (a * 1.0 / (a + b)) / (c * 1.0 / (c + d))
        return cells.filter((a > 0) & (b > 0) & (c > 0) & (d > 0)).select(
            a.alias("conv_a"),
            b.alias("nonconv_a"),
            c.alias("conv_b"),
            d.alias("nonconv_b"),
            stable_round(orr, 6).alias("odds_ratio"),
            stable_round(F.exp(F.log(orr) - half), 6).alias("or_ci_lo"),
            stable_round(F.exp(F.log(orr) + half), 6).alias("or_ci_hi"),
            stable_round(rr, 6).alias("relative_risk"),
        )


_register_odds_ratio()


def _register_rate_ratio() -> None:
    @register(
        "q_poisson_rate_ratio",
        oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purch,
           CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 + 1 AS BIGINT)
               AS exposure_days
    FROM events GROUP BY user_id
),
arms AS (
    SELECT CAST(sum(CASE WHEN in_a THEN n_purch ELSE 0 END) AS BIGINT)        AS ev_a,
           CAST(sum(CASE WHEN in_a THEN exposure_days ELSE 0 END) AS BIGINT)  AS exp_a,
           CAST(sum(CASE WHEN NOT in_a THEN n_purch ELSE 0 END) AS BIGINT)    AS ev_b,
           CAST(sum(CASE WHEN NOT in_a THEN exposure_days ELSE 0 END) AS BIGINT) AS exp_b
    FROM u
)
SELECT ev_a AS events_a, exp_a AS exposure_days_a,
       ev_b AS events_b, exp_b AS exposure_days_b,
       (round((ev_a * 1.0 / exp_a) * 1000000.0) / 1000000.0) AS rate_a_per_day,
       (round((ev_b * 1.0 / exp_b) * 1000000.0) / 1000000.0) AS rate_b_per_day,
       (round(((ev_a * 1.0 / exp_a) / (ev_b * 1.0 / exp_b)) * 1000000.0)
        / 1000000.0) AS rate_ratio,
       (round(exp(ln((ev_a * 1.0 / exp_a) / (ev_b * 1.0 / exp_b))
                  - 1.959964 * sqrt(1.0 / ev_a + 1.0 / ev_b)) * 1000000.0)
        / 1000000.0) AS rr_ci_lo,
       (round(exp(ln((ev_a * 1.0 / exp_a) / (ev_b * 1.0 / exp_b))
                  + 1.959964 * sqrt(1.0 / ev_a + 1.0 / ev_b)) * 1000000.0)
        / 1000000.0) AS rr_ci_hi
FROM arms WHERE ev_a > 0 AND ev_b > 0
""",
        description=(
            "Poisson rate ratio with exposure adjustment: purchases "
            "per USER-DAY in arm A vs B, with the log-scale Wald CI "
            "sqrt(1/e_a + 1/e_b) — the count-data member of the "
            "effect-size family (q_odds_ratio handles binary "
            "converted-or-not; this handles HOW OFTEN, normalized by "
            "each user's observed span, so a cohort observed twice as "
            "long doesn't fake a lift). Per-user counts and "
            "integer-day exposures come from ONE pass; the ratio and "
            "CI are fixed expressions of four exact BIGINTs with the "
            "z literal inlined identically."
        ),
        tags=("analytics", "extension", "stats"),
    )
    def q_poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        in_a = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )
        u = ev.groupBy("user_id").agg(
            F.first(in_a).alias("in_a"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purch"),
            (
                F.floor(
                    (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
                    / F.lit(86400000000)
                )
                + 1
            )
            .cast("long")
            .alias("exposure_days"),
        )
        arms = u.agg(
            F.sum(F.when(F.col("in_a"), F.col("n_purch")).otherwise(0))
            .cast("long")
            .alias("ev_a"),
            F.sum(F.when(F.col("in_a"), F.col("exposure_days")).otherwise(0))
            .cast("long")
            .alias("exp_a"),
            F.sum(F.when(~F.col("in_a"), F.col("n_purch")).otherwise(0))
            .cast("long")
            .alias("ev_b"),
            F.sum(F.when(~F.col("in_a"), F.col("exposure_days")).otherwise(0))
            .cast("long")
            .alias("exp_b"),
        )
        ea, xa, eb, xb = (F.col(c) for c in ["ev_a", "exp_a", "ev_b", "exp_b"])
        ra, rb = ea * 1.0 / xa, eb * 1.0 / xb
        rr = ra / rb
        half = F.lit(1.959964) * F.sqrt(1.0 / ea + 1.0 / eb)
        return arms.filter((ea > 0) & (eb > 0)).select(
            ea.alias("events_a"),
            xa.alias("exposure_days_a"),
            eb.alias("events_b"),
            xb.alias("exposure_days_b"),
            stable_round(ra, 6).alias("rate_a_per_day"),
            stable_round(rb, 6).alias("rate_b_per_day"),
            stable_round(rr, 6).alias("rate_ratio"),
            stable_round(F.exp(F.log(rr) - half), 6).alias("rr_ci_lo"),
            stable_round(F.exp(F.log(rr) + half), 6).alias("rr_ci_hi"),
        )


_register_rate_ratio()


def _register_cohens_d() -> None:
    @register(
        "q_cohens_d",
        oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS v
    FROM events GROUP BY user_id
),
m AS (
    SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
           CAST(sum(CASE WHEN in_a THEN v ELSE 0 END) AS BIGINT) AS sa,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE v END) AS BIGINT) AS sb,
           CAST(sum(CASE WHEN in_a THEN v * v ELSE 0 END) AS BIGINT) AS ssa,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE v * v END) AS BIGINT) AS ssb
    FROM u
),
calc AS (
    SELECT na, nb, sa, sb,
           (((ssa - sa * 1.0 / na * sa) + (ssb - sb * 1.0 / nb * sb))
            / (na + nb - 2.0)) AS pooled_var
    FROM m
)
SELECT na AS n_a, nb AS n_b,
       (round((sa / 100.0 / na) * 1000000.0) / 1000000.0) AS mean_a_dollars,
       (round((sb / 100.0 / nb) * 1000000.0) / 1000000.0) AS mean_b_dollars,
       (round(((sa * 1.0 / na - sb * 1.0 / nb) / sqrt(pooled_var))
              * 1000000.0) / 1000000.0) AS cohens_d,
       (round((((sa * 1.0 / na - sb * 1.0 / nb) / sqrt(pooled_var))
               * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))) * 1000000.0)
        / 1000000.0) AS hedges_g
FROM calc
""",
        description=(
            "Cohen's d and Hedges' g for the arm difference in per-"
            "user spend: the standardized mean difference on the "
            "pooled SD, with Hedges' small-sample bias correction "
            "1 - 3/(4(na+nb)-9) — the continuous-outcome member of "
            "the effect-size family (q_odds_ratio for binary, "
            "q_poisson_rate_ratio for counts, this for magnitudes), "
            "and the number q_power_analysis consumes as its input "
            "assumption. One conditional-moment pass in exact integer "
            "cents; d and g are fixed expressions of six BIGINTs. "
            "(q_covariate_balance computes the same statistic for "
            "covariate drift; here it reads the OUTCOME.)"
        ),
        tags=("analytics", "extension", "stats"),
    )
    def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        in_a = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )
        u = ev.groupBy("user_id").agg(
            F.first(in_a).alias("in_a"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("v"),
        )
        ia, v = F.col("in_a"), F.col("v")
        m = u.agg(
            F.sum(F.when(ia, 1).otherwise(0)).cast("long").alias("na"),
            F.sum(F.when(ia, 0).otherwise(1)).cast("long").alias("nb"),
            F.sum(F.when(ia, v).otherwise(0)).cast("long").alias("sa"),
            F.sum(F.when(ia, 0).otherwise(v)).cast("long").alias("sb"),
            F.sum(F.when(ia, v * v).otherwise(0)).cast("long").alias("ssa"),
            F.sum(F.when(ia, 0).otherwise(v * v)).cast("long").alias("ssb"),
        )
        na, nb, sa, sb = (F.col(c) for c in ["na", "nb", "sa", "sb"])
        pooled = (
            (F.col("ssa") - sa * 1.0 / na * sa) + (F.col("ssb") - sb * 1.0 / nb * sb)
        ) / (na + nb - 2.0)
        d = (sa * 1.0 / na - sb * 1.0 / nb) / F.sqrt(pooled)
        return m.select(
            na.alias("n_a"),
            nb.alias("n_b"),
            stable_round(sa / 100.0 / na, 6).alias("mean_a_dollars"),
            stable_round(sb / 100.0 / nb, 6).alias("mean_b_dollars"),
            stable_round(d, 6).alias("cohens_d"),
            stable_round(
                d * (F.lit(1.0) - 3.0 / (4.0 * (na + nb) - 9.0)), 6
            ).alias("hedges_g"),
        )


_register_cohens_d()


def _register_cochran_armitage() -> None:
    @register(
        "q_cochran_armitage",
        oracle="""
WITH u AS (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS clicks,
           max(CASE WHEN event_type = 'purchase' AND value > 150
                THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
),
binned AS (
    SELECT CASE WHEN clicks <= 12 THEN 0
                WHEN clicks <= 14 THEN 1
                WHEN clicks <= 17 THEN 2
                ELSE 3 END AS score,
           conv
    FROM u
),
g AS (
    SELECT CAST(score AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(conv) AS BIGINT) AS r_g
    FROM binned GROUP BY 1
),
m AS (
    SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(r_g) AS BIGINT) AS r,
           CAST(sum(s * r_g) AS BIGINT) AS sr,
           CAST(sum(s * n_g) AS BIGINT) AS sn,
           CAST(sum(s * s * n_g) AS BIGINT) AS ssn
    FROM g
)
SELECT n AS n_users, r AS n_converted,
       (round((sr - r * 1.0 * sn / n) * 1000000.0) / 1000000.0) AS t_statistic,
       (round(((r * 1.0 / n) * (1.0 - r * 1.0 / n)
               * (ssn - sn * 1.0 * sn / n)) * 1000000.0) / 1000000.0)
           AS variance,
       (round(((sr - r * 1.0 * sn / n)
               / sqrt((r * 1.0 / n) * (1.0 - r * 1.0 / n)
                      * (ssn - sn * 1.0 * sn / n))) * 1000000.0) / 1000000.0)
           AS z_score
FROM m
WHERE (r * 1.0 / n) * (1.0 - r * 1.0 / n) * (ssn - sn * 1.0 * sn / n) > 0
""",
        description=(
            "Cochran-Armitage trend test: does conversion rate rise "
            "MONOTONICALLY across ordered click-volume buckets "
            "(<=12 / 13-14 / 15-17 / 18+, cuts spanning the fixture's per-user click distribution)? — the dose-response test that "
            "beats q_chi2_independence when the exposure is ordered "
            "(chi-square spends power on every deviation pattern; CA "
            "concentrates it on the trend, which is the question "
            "engagement tiers actually pose). T = sum s(r_g - R n_g/N) "
            "and its null variance are fixed expressions of five "
            "exact-BIGINT sums from one partial-aggregated pass over "
            "the 4-row bucket table."
        ),
        tags=("analytics", "extension", "stats"),
    )
    def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        u = ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("clicks"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("conv"),
        )
        score = (
            F.when(F.col("clicks") <= 12, 0)
            .when(F.col("clicks") <= 14, 1)
            .when(F.col("clicks") <= 17, 2)
            .otherwise(3)
            .cast("long")
        )
        g = u.select(score.alias("s"), "conv").groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("conv").cast("long").alias("r_g"),
        )
        m = g.agg(
            F.sum("n_g").cast("long").alias("n"),
            F.sum("r_g").cast("long").alias("r"),
            F.sum(F.col("s") * F.col("r_g")).cast("long").alias("sr"),
            F.sum(F.col("s") * F.col("n_g")).cast("long").alias("sn"),
            F.sum(F.col("s") * F.col("s") * F.col("n_g")).cast("long").alias("ssn"),
        )
        n, r, sr, sn, ssn = (F.col(c) for c in ["n", "r", "sr", "sn", "ssn"])
        t = sr - r * 1.0 * sn / n
        var = (r * 1.0 / n) * (F.lit(1.0) - r * 1.0 / n) * (ssn - sn * 1.0 * sn / n)
        return m.filter(var > 0).select(
            n.alias("n_users"),
            r.alias("n_converted"),
            stable_round(t, 6).alias("t_statistic"),
            stable_round(var, 6).alias("variance"),
            stable_round(t / F.sqrt(var), 6).alias("z_score"),
        )


_register_cochran_armitage()


def _hosmer_lemeshow_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
scored AS (
    SELECT y,
           CAST(round((1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2))))
                      * 1000000.0) AS BIGINT) AS pq
    FROM feat CROSS JOIN {final} b
),
bins AS (
    SELECT least(pq // 100000, 9) AS bin,
           CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(y) AS BIGINT) AS o1,
           CAST(sum(pq) AS BIGINT) AS e1q
    FROM scored GROUP BY 1
),
terms AS (
    SELECT bin, n_g, o1,
           CAST(round((((o1 - e1q / 1000000.0)
                        * (o1 - e1q / 1000000.0)) / (e1q / 1000000.0)
                       + ((n_g - o1) - (n_g - e1q / 1000000.0))
                         * ((n_g - o1) - (n_g - e1q / 1000000.0))
                         / (n_g - e1q / 1000000.0)) * 1000000000000.0) AS BIGINT)
               AS hq
    FROM bins WHERE e1q > 0 AND n_g * 1000000 > e1q
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       (round((CAST(sum(hq) AS BIGINT) / 1000000000000.0) * 1000000.0)
        / 1000000.0) AS hl_chi2,
       CAST(count(*) - 2 AS BIGINT) AS dof
FROM terms
""".strip()


def _register_hosmer_lemeshow() -> None:
    @register(
        "q_hosmer_lemeshow",
        oracle=_hosmer_lemeshow_oracle(),
        description=(
            "Hosmer-Lemeshow goodness-of-fit for the IRLS model: "
            "chi2 over 10 fixed probability bins comparing observed "
            "vs expected conversions (both classes), dof = bins - 2 — "
            "the FORMAL calibration test beside q_calibration_ece's "
            "summary number and q_isotonic_calibration's fix (ECE "
            "says how far off; HL says whether the miscalibration "
            "exceeds chance). Scores quantize to integer 1e-6 units "
            "BEFORE binning and summing, so expected counts are "
            "exact-BIGINT sums, and per-bin chi2 terms quantize at "
            "1e-12 before the final fold — no float crosses rows "
            "anywhere."
        ),
        tags=("analytics", "extension", "stats", "ml", "evaluation"),
    )
    def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(feat, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            pq = F.round(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))) * 1000000.0
            ).cast("long")
            scored = feat.select("y", pq.alias("pq"))
            bins = scored.groupBy(
                F.least(F.floor(F.col("pq") / 100000), F.lit(9)).cast("long").alias(
                    "bin"
                )
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_g"),
                F.sum("y").cast("long").alias("o1"),
                F.sum("pq").cast("long").alias("e1q"),
            )
            n_g, o1 = F.col("n_g"), F.col("o1")
            e1 = F.col("e1q") / 1000000.0
            term = (o1 - e1) * (o1 - e1) / e1 + ((n_g - o1) - (n_g - e1)) * (
                (n_g - o1) - (n_g - e1)
            ) / (n_g - e1)
            terms = bins.filter(
                (F.col("e1q") > 0) & (n_g * 1000000 > F.col("e1q"))
            ).select(F.round(term * 1e12).cast("long").alias("hq"))
            return terms.agg(
                F.count(F.lit(1)).cast("long").alias("n_bins"),
                stable_round(F.sum("hq").cast("long") / 1e12, 6).alias("hl_chi2"),
                (F.count(F.lit(1)) - 2).cast("long").alias("dof"),
            )
        finally:
            feat.unpersist()


_register_hosmer_lemeshow()


def _brier_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
scored AS (
    SELECT y,
           CAST(round((1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2))))
                      * 1000000.0) AS BIGINT) AS pq
    FROM feat CROSS JOIN {final} b
),
brier AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS pos,
           CAST(sum((pq - y * 1000000) * (pq - y * 1000000)) AS BIGINT) AS bq
    FROM scored
),
bins AS (
    SELECT least(pq // 100000, 9) AS bin,
           CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(y) AS BIGINT) AS o_g,
           CAST(sum(pq) AS BIGINT) AS pq_g
    FROM scored GROUP BY 1
),
decomp AS (
    SELECT
      CAST(sum(CAST(round(n_g * ((pq_g * 1.0 / n_g / 1000000.0) - (o_g * 1.0 / n_g))
                          * ((pq_g * 1.0 / n_g / 1000000.0) - (o_g * 1.0 / n_g))
                          * 1000000000000.0) AS BIGINT)) AS BIGINT) AS rel_q,
      CAST(sum(CAST(round(n_g * ((o_g * 1.0 / n_g) - (b.pos * 1.0 / b.n))
                          * ((o_g * 1.0 / n_g) - (b.pos * 1.0 / b.n))
                          * 1000000000000.0) AS BIGINT)) AS BIGINT) AS res_q,
      max(b.n) AS n, max(b.pos) AS pos, max(b.bq) AS bq
    FROM bins CROSS JOIN brier b
)
SELECT n AS n_users,
       (round((bq / 1000000000000.0 / n) * 1000000.0) / 1000000.0) AS brier_score,
       (round((rel_q / 1000000000000.0 / n) * 1000000.0) / 1000000.0) AS reliability,
       (round((res_q / 1000000000000.0 / n) * 1000000.0) / 1000000.0) AS resolution,
       (round(((pos * 1.0 / n) * (1.0 - pos * 1.0 / n)) * 1000000.0) / 1000000.0)
           AS uncertainty
FROM decomp
""".strip()


def _register_brier() -> None:
    @register(
        "q_brier_score",
        oracle=_brier_oracle(),
        description=(
            "Brier score with the Murphy decomposition (reliability - "
            "resolution + uncertainty, over the 10 probability bins): "
            "the strictly-proper scoring rule that grades probability "
            "forecasts as forecasts, completing the calibration "
            "toolkit — ECE summarizes miscalibration, Hosmer-Lemeshow "
            "tests it, Brier PRICES it together with discrimination "
            "(a model can ace HL yet have zero resolution; the "
            "decomposition separates the two). Scores are integer "
            "1e-6 units, so the per-user squared errors are exact "
            "BIGINTs and the per-bin decomposition terms quantize at "
            "1e-12 before their folds."
        ),
        tags=("analytics", "extension", "stats", "ml", "evaluation"),
    )
    def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit

        ev = load_table(spark, sf_dir, "events")
        feat = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(feat, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            pq = F.round(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))) * 1000000.0
            ).cast("long")
            scored = feat.select("y", pq.alias("pq")).persist()
            brier = scored.agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("y").cast("long").alias("pos"),
                F.sum(
                    (F.col("pq") - F.col("y") * 1000000)
                    * (F.col("pq") - F.col("y") * 1000000)
                )
                .cast("long")
                .alias("bq"),
            )
            bins = scored.groupBy(
                F.least(F.floor(F.col("pq") / 100000), F.lit(9)).cast("long").alias(
                    "bin"
                )
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_g"),
                F.sum("y").cast("long").alias("o_g"),
                F.sum("pq").cast("long").alias("pq_g"),
            )
            j = bins.crossJoin(F.broadcast(brier))
            n_g, o_g, pq_g = F.col("n_g"), F.col("o_g"), F.col("pq_g")
            pbar_g = pq_g * 1.0 / n_g / 1000000.0
            obar_g = o_g * 1.0 / n_g
            obar = F.col("pos") * 1.0 / F.col("n")
            rel_t = F.round(n_g * (pbar_g - obar_g) * (pbar_g - obar_g) * 1e12).cast(
                "long"
            )
            res_t = F.round(n_g * (obar_g - obar) * (obar_g - obar) * 1e12).cast(
                "long"
            )
            decomp = j.agg(
                F.sum(rel_t).cast("long").alias("rel_q"),
                F.sum(res_t).cast("long").alias("res_q"),
                F.max("n").alias("n"),
                F.max("pos").alias("pos"),
                F.max("bq").alias("bq"),
            )
            n, pos = F.col("n"), F.col("pos")
            return decomp.select(
                n.alias("n_users"),
                stable_round(F.col("bq") / 1e12 / n, 6).alias("brier_score"),
                stable_round(F.col("rel_q") / 1e12 / n, 6).alias("reliability"),
                stable_round(F.col("res_q") / 1e12 / n, 6).alias("resolution"),
                stable_round(
                    (pos * 1.0 / n) * (F.lit(1.0) - pos * 1.0 / n), 6
                ).alias("uncertainty"),
            )
        finally:
            scored.unpersist()
            feat.unpersist()


_register_brier()


def _register_wasserstein() -> None:
    @register(
        "q_wasserstein_drift",
        oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS in_a,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS v
    FROM events GROUP BY user_id
),
g AS (
    SELECT v,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ta,
           CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS tb
    FROM u GROUP BY v
),
cum AS (
    SELECT v,
           CAST(sum(ta) OVER (ORDER BY v) AS BIGINT) AS ca,
           CAST(sum(tb) OVER (ORDER BY v) AS BIGINT) AS cb,
           CAST(sum(ta) OVER () AS BIGINT) AS na,
           CAST(sum(tb) OVER () AS BIGINT) AS nb,
           CAST(lead(v) OVER (ORDER BY v) AS BIGINT) AS v_next
    FROM g
),
seg AS (
    SELECT CAST(round(abs(ca * 1.0 / na - cb * 1.0 / nb) * (v_next - v)
                      * 1000000.0) AS BIGINT) AS wq,
           abs(ca * 1.0 / na - cb * 1.0 / nb) AS gap_frac
    FROM cum WHERE v_next IS NOT NULL
)
SELECT (round((CAST(sum(wq) AS BIGINT) / 1000000.0 / 100.0) * 1000000.0)
        / 1000000.0) AS wasserstein_dollars,
       (round(max(gap_frac) * 1000000.0) / 1000000.0) AS ks_statistic
FROM seg
""",
        description=(
            "1-D Wasserstein (earth-mover) distance between the arms' "
            "per-user spend distributions — the exact integral of "
            "|CDF_A - CDF_B| over the distinct-cents support, in "
            "dollars — with the KS sup-statistic as a byproduct: KS "
            "answers 'did the distribution change ANYWHERE', "
            "Wasserstein answers 'by how many dollars did mass "
            "move', which is what a drift alert should page on. "
            "CDF steps are exact BIGINT prefix counts over the "
            "distinct-value table, computed with the two-phase "
            "bucketed carry (v div 4096): in-bucket prefixes and "
            "leads are partitioned, cross-boundary v_next is the "
            "next non-empty bucket's min, and the only keyless "
            "windows ride the distinct_v/4096 bucket summary — safe "
            "even for unbounded value support; per-segment "
            "contributions quantize to BIGINT at 1e-6 before the sum."
        ),
        tags=("analytics", "extension", "stats", "evaluation"),
    )
    def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        in_a = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab-v1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )
        u = ev.groupBy("user_id").agg(
            F.first(in_a).alias("in_a"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("v"),
        )
        g = u.groupBy("v").agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("ta"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("tb"),
        )
        # Two-phase bucketed carry over the distinct-cents support:
        # in-bucket inclusive prefixes + in-bucket lead are fully
        # partitioned (v div 4096); the keyless windows only ever see
        # the bucket SUMMARY (distinct_v/4096 rows). v_next across a
        # bucket boundary = the next non-empty bucket's min v. Global
        # arm totals come from an agg cross-joined back, not an
        # unbounded window over the data.
        bkt = g.withColumn("bkt", F.expr("v div 4096"))
        w_in = (
            Window.partitionBy("bkt")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_lead = Window.partitionBy("bkt").orderBy("v")
        rows = bkt.select(
            "v", "bkt",
            F.sum("ta").over(w_in).cast("long").alias("cin_a"),
            F.sum("tb").over(w_in).cast("long").alias("cin_b"),
            F.lead("v").over(w_lead).cast("long").alias("lead_in"),
        )
        btot = bkt.groupBy("bkt").agg(
            F.sum("ta").alias("bv_a"),
            F.sum("tb").alias("bv_b"),
            F.min("v").alias("bmin"),
        )
        w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
        w_bl = Window.orderBy("bkt")
        bsum = btot.select(
            "bkt",
            F.sum("bv_a").over(w_b).alias("prev_a"),
            F.sum("bv_b").over(w_b).alias("prev_b"),
            F.lead("bmin").over(w_bl).cast("long").alias("next_bmin"),
        )
        tot = g.agg(
            F.sum("ta").cast("long").alias("na"), F.sum("tb").cast("long").alias("nb")
        )
        cum = (
            rows.join(F.broadcast(bsum), "bkt")
            .crossJoin(F.broadcast(tot))
            .select(
                "v",
                (F.col("cin_a") + F.coalesce(F.col("prev_a"), F.lit(0)))
                .cast("long")
                .alias("ca"),
                (F.col("cin_b") + F.coalesce(F.col("prev_b"), F.lit(0)))
                .cast("long")
                .alias("cb"),
                "na",
                "nb",
                F.coalesce(F.col("lead_in"), F.col("next_bmin")).alias("v_next"),
            )
        )
        frac = F.abs(F.col("ca") * 1.0 / F.col("na") - F.col("cb") * 1.0 / F.col("nb"))
        seg = cum.filter(F.col("v_next").isNotNull()).select(
            F.round(frac * (F.col("v_next") - F.col("v")) * 1000000.0)
            .cast("long")
            .alias("wq"),
            frac.alias("gap_frac"),
        )
        return seg.agg(
            stable_round(
                F.sum("wq").cast("long") / 1000000.0 / 100.0, 6
            ).alias("wasserstein_dollars"),
            stable_round(F.max("gap_frac"), 6).alias("ks_statistic"),
        )


_register_wasserstein()


@register(
    "q_item_item_cf",
    oracle="""
WITH basket AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
n_i AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM basket GROUP BY pk),
cooc AS (
    SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_ab
    FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2
)
SELECT c.part_a, c.part_b, c.n_ab,
       na.n AS n_a, nb.n AS n_b,
       (round((c.n_ab / sqrt(na.n * 1.0 * nb.n)) * 1000000.0) / 1000000.0)
           AS cosine_sim
FROM cooc c
JOIN n_i na ON na.pk = c.part_a
JOIN n_i nb ON nb.pk = c.part_b
ORDER BY cosine_sim DESC, c.part_a, c.part_b
LIMIT 50
""",
    description=(
        "Item-item collaborative filtering on implicit co-purchase "
        "signals: cosine similarity n_ab/sqrt(n_a*n_b) between parts "
        "over order baskets (lineitem distinct (order, part)), top-50 "
        "pairs — the 'customers who bought X also bought Y' "
        "recommender primitive, and the transactional sibling of "
        "q_session_cooccurrence. The pair join is WITHIN an order key "
        "(quadratic only in basket size, ~7 lines/order in TPC-H — "
        "never an all-pairs item join), co-occurrence folds as BIGINT "
        "counts, similarity is one float expression per surviving "
        "pair, and the top-50 is a TakeOrdered, not a global sort. "
        "At 100x: identical shape — baskets shuffle once on orderkey, "
        "pairs once on (part_a, part_b)."
    ),
    tags=("analytics", "extension", "ml", "recommender"),
)
def q_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_i = basket.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = basket.alias("a")
    b = basket.alias("b")
    cooc = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(
            F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na = n_i.select(F.col("pk").alias("part_a"), F.col("n").alias("n_a"))
    nb = n_i.select(F.col("pk").alias("part_b"), F.col("n").alias("n_b"))
    out = (
        cooc.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            stable_round(
                F.col("n_ab") / F.sqrt(F.col("n_a") * 1.0 * F.col("n_b")), 6
            ).alias("cosine_sim"),
        )
    )
    return out.orderBy(
        F.desc("cosine_sim"), F.asc("part_a"), F.asc("part_b")
    ).limit(50)


_NB_FEATS = ("click", "view", "error", "signup")


def _nb_oracle() -> str:
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    feat_cols = ",\n           ".join(
        f"CAST(max(CASE WHEN event_type = '{f}' THEN 1 ELSE 0 END) AS BIGINT) AS f_{f}"
        for f in _NB_FEATS
    )
    cnt_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN y = 1 THEN f_{f} ELSE 0 END) AS BIGINT) AS c1_{f},\n"
        f"           CAST(sum(CASE WHEN y = 0 THEN f_{f} ELSE 0 END) AS BIGINT) AS c0_{f}"
        for f in _NB_FEATS
    )
    w_cols = ",\n           ".join(
        f"{r6(f'ln((c1_{f} + 1.0) / (n1 + 2.0))')} AS w1_{f},\n"
        f"           {r6(f'ln(1.0 - (c1_{f} + 1.0) / (n1 + 2.0))')} AS z1_{f},\n"
        f"           {r6(f'ln((c0_{f} + 1.0) / (n0 + 2.0))')} AS w0_{f},\n"
        f"           {r6(f'ln(1.0 - (c0_{f} + 1.0) / (n0 + 2.0))')} AS z0_{f}"
        for f in _NB_FEATS
    )
    s1 = " + ".join(f"(u.f_{f} * p.w1_{f} + (1 - u.f_{f}) * p.z1_{f})" for f in _NB_FEATS)
    s0 = " + ".join(f"(u.f_{f} * p.w0_{f} + (1 - u.f_{f}) * p.z0_{f})" for f in _NB_FEATS)
    return f"""
WITH u AS (
    SELECT user_id,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
           {feat_cols}
    FROM events GROUP BY user_id
),
cnt AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n1,
           CAST(count(*) - sum(y) AS BIGINT) AS n0,
           {cnt_cols}
    FROM u
),
params AS (
    SELECT n, n1, n0,
           {r6('ln((n1 + 1.0) / (n + 2.0))')} AS lp1,
           {r6('ln((n0 + 1.0) / (n + 2.0))')} AS lp0,
           {w_cols}
    FROM cnt
),
scored AS (
    SELECT u.y,
           CASE WHEN (p.lp1 + {s1}) > (p.lp0 + {s0}) THEN 1 ELSE 0 END AS pred
    FROM u CROSS JOIN params p
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       {r6('sum(CASE WHEN pred = y THEN 1 ELSE 0 END) * 1.0 / count(*)')} AS accuracy
FROM scored
"""


_register_nb = register(
    "q_naive_bayes",
    oracle=_nb_oracle(),
    description=(
        "Bernoulli naive Bayes classifier predicting purchasers from "
        "event-type presence features (click/view/error/signup), "
        "Laplace-smoothed (priors included — a one-class fixture slice "
        "must not produce ln(0)), trained and scored in ONE pass each: the "
        "counting-only member of the classifier family next to "
        "q_logistic_regression (iterative IRLS) and q_gini_stump "
        "(single split) — NB needs no iteration at all, so it is the "
        "cheapest possible 100 TB baseline (two shuffles total: the "
        "per-user feature agg and the global count agg; the learned "
        "parameters are a 1-row broadcast). Every log-weight is "
        "6dp-stable-rounded at the parameter level so per-user score "
        "sums — fixed-shape 4-term expressions over exact 0/1 "
        "features — are bit-identical across engines; reports the "
        "confusion matrix and training accuracy."
    ),
    tags=("analytics", "extension", "ml"),
)


def _nb_features_and_params(spark: SparkSession, sf_dir: str):
    """Shared Bernoulli-NB training: per-user 0/1 features + the 1-row
    6dp-rounded log-weight parameter frame (see q_naive_bayes)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
        *[
            F.max(F.when(F.col("event_type") == f, 1).otherwise(0))
            .cast("long")
            .alias(f"f_{f}")
            for f in _NB_FEATS
        ],
    )
    cnt = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n0"),
        *[
            c
            for f in _NB_FEATS
            for c in (
                F.sum(F.when(F.col("y") == 1, F.col(f"f_{f}")).otherwise(0))
                .cast("long")
                .alias(f"c1_{f}"),
                F.sum(F.when(F.col("y") == 0, F.col(f"f_{f}")).otherwise(0))
                .cast("long")
                .alias(f"c0_{f}"),
            )
        ],
    )
    n, n1, n0 = F.col("n"), F.col("n1"), F.col("n0")
    params = cnt.select(
        n,
        n1,
        n0,
        stable_round(F.log((n1 + 1.0) / (n + 2.0)), 6).alias("lp1"),
        stable_round(F.log((n0 + 1.0) / (n + 2.0)), 6).alias("lp0"),
        *[
            c
            for f in _NB_FEATS
            for c in (
                stable_round(
                    F.log((F.col(f"c1_{f}") + 1.0) / (n1 + 2.0)), 6
                ).alias(f"w1_{f}"),
                stable_round(
                    F.log(1.0 - (F.col(f"c1_{f}") + 1.0) / (n1 + 2.0)), 6
                ).alias(f"z1_{f}"),
                stable_round(
                    F.log((F.col(f"c0_{f}") + 1.0) / (n0 + 2.0)), 6
                ).alias(f"w0_{f}"),
                stable_round(
                    F.log(1.0 - (F.col(f"c0_{f}") + 1.0) / (n0 + 2.0)), 6
                ).alias(f"z0_{f}"),
            )
        ],
    )
    return u, params


def _nb_scores():
    """Class log-score column expressions (s1, s0) over the joined
    features x params frame, fixed association order on both engines."""
    s1 = F.col("lp1")
    s0 = F.col("lp0")
    for f in _NB_FEATS:
        fv = F.col(f"f_{f}")
        s1 = s1 + (fv * F.col(f"w1_{f}") + (1 - fv) * F.col(f"z1_{f}"))
        s0 = s0 + (fv * F.col(f"w0_{f}") + (1 - fv) * F.col(f"z0_{f}"))
    return s1, s0


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, params = _nb_features_and_params(spark, sf_dir)
    scored = u.crossJoin(F.broadcast(params))
    s1, s0 = _nb_scores()
    pred = F.when(s1 > s0, 1).otherwise(0)
    y = F.col("y")
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when((pred == 1) & (y == 1), 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((pred == 1) & (y == 0), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((pred == 0) & (y == 1), 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when((pred == 0) & (y == 0), 1).otherwise(0)).cast("long").alias("tn"),
        stable_round(
            F.sum(F.when(pred == y, 1).otherwise(0)) * 1.0 / F.count(F.lit(1)), 6
        ).alias("accuracy"),
    )


q_naive_bayes = _register_nb(q_naive_bayes)


@register(
    "q_feature_hashing",
    oracle="""
WITH feats AS (
    SELECT event_type || '#' || CAST(dayofweek(ts) AS VARCHAR) AS f
    FROM events
),
hashed AS (
    SELECT f,
           (('0x' || substring(md5('fh-v1:' || f), 1, 8))::BIGINT % 16) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM feats GROUP BY 1
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_features,
       CAST(sum(n) AS BIGINT) AS total_count,
       (count(*) > 1) AS has_collision
FROM hashed GROUP BY bucket ORDER BY bucket
""",
    description=(
        "Feature hashing (the hashing trick): categorical "
        "(event_type x weekday) features mapped to 16 buckets via the "
        "first 8 hex digits of a salted md5 — the fixed-width, "
        "vocabulary-free encoding large-scale learners use instead of "
        "a label-encoder dictionary (no global vocab build, no "
        "driver-side state, new categories never resize anything). "
        "Reports per-bucket feature fan-in and collision flags — the "
        "operational question ('is 16 buckets enough or are hot "
        "features colliding?'). Hashing and counting fold map-side; "
        "the only shuffle is the 16-bucket agg. Same md5-prefix "
        "idiom as the deterministic A/B arm split, so both engines "
        "bucket identically."
    ),
    tags=("analytics", "extension", "ml-prep"),
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    feats = ev.select(
        F.concat(
            F.col("event_type"), F.lit("#"), (F.dayofweek("ts") - 1).cast("string")
        ).alias("f")
    )
    hashed = feats.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("n"))
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("fh-v1:"), F.col("f"))), 1, 8), 16, 10)
        .cast("long")
        % 16
    )
    return (
        hashed.select(bucket.alias("bucket"), "f", "n")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("n").cast("long").alias("total_count"),
            (F.count(F.lit(1)) > 1).alias("has_collision"),
        )
        .orderBy("bucket")
    )


_MK_CHANNELS = ("click", "error", "signup", "view")

_MK_TRANS_SQL = """
seq AS (
    SELECT user_id, event_type,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS rn
    FROM events
),
conv AS (
    SELECT user_id, CAST(min(rn) AS BIGINT) AS crn
    FROM seq WHERE event_type = 'purchase' GROUP BY user_id
),
tch AS (
    SELECT s.user_id, s.event_type, s.rn,
           CAST(row_number() OVER (PARTITION BY s.user_id ORDER BY s.rn)
                AS BIGINT) AS k
    FROM seq s LEFT JOIN conv c ON s.user_id = c.user_id
    WHERE c.crn IS NULL OR s.rn < c.crn
),
step AS (
    SELECT t.user_id, t.event_type AS f, t.k,
           lead(t.event_type) OVER (PARTITION BY t.user_id ORDER BY t.k) AS nxt,
           max(t.k) OVER (PARTITION BY t.user_id) AS mk,
           (c.crn IS NOT NULL) AS converted
    FROM tch t LEFT JOIN conv c ON t.user_id = c.user_id
),
edges AS (
    SELECT 'START' AS f, event_type AS t FROM tch WHERE k = 1
    UNION ALL
    SELECT f, nxt AS t FROM step WHERE nxt IS NOT NULL
    UNION ALL
    SELECT f, CASE WHEN converted THEN 'CONV' ELSE 'NULL' END AS t
    FROM step WHERE k = mk
    UNION ALL
    SELECT 'START' AS f, 'CONV' AS t FROM conv WHERE crn = 1
),
cnt AS (SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM edges GROUP BY 1, 2),
tot AS (SELECT f, CAST(sum(n) AS BIGINT) AS tn FROM cnt GROUP BY 1),
p AS MATERIALIZED (
    SELECT c.f, c.t,
           (round((c.n * 1.0 / tot.tn) * 1000000.0) / 1000000.0) AS p
    FROM cnt c JOIN tot ON c.f = tot.f
),
st AS MATERIALIZED (
    SELECT unnest(['START', 'click', 'error', 'signup', 'view']) AS s
)"""


def _mk_attrib_oracle(rounds: int = 12) -> str:
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    parts = [_MK_TRANS_SQL.strip()]
    variants = [("full", None)] + [(f"rm_{c}", c) for c in _MK_CHANNELS]
    for tag, removed in variants:
        parts.append(
            f"{tag}_0 AS MATERIALIZED (SELECT s, CAST(0.0 AS DOUBLE) AS v FROM st)"
        )
        rm = f"WHEN p.t = '{removed}' THEN 0.0 " if removed else ""
        for r in range(1, rounds + 1):
            parts.append(
                f"""{tag}_{r} AS MATERIALIZED (
    SELECT st.s,
           {r6(f'''coalesce(sum(p.p * (CASE WHEN p.t = 'CONV' THEN 1.0
                      WHEN p.t = 'NULL' THEN 0.0 {rm}ELSE coalesce(pv.v, 0.0) END)), 0.0)''')} AS v
    FROM st
    LEFT JOIN p ON p.f = st.s
    LEFT JOIN {tag}_{r - 1} pv ON pv.s = p.t
    GROUP BY st.s
)"""
            )
    sel = ",\n".join(
        f"(SELECT v FROM rm_{c}_{rounds} WHERE s = 'START') AS p_rm_{c}"
        for c in _MK_CHANNELS
    )
    eff = {
        c: f"(round((1.0 - p_rm_{c} / p_full) * 1000000.0) / 1000000.0)"
        for c in _MK_CHANNELS
    }
    tot_eff = " + ".join(f"greatest({eff[c]}, 0.0)" for c in _MK_CHANNELS)
    chan_rows = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS channel, p_full, p_rm_{c} AS p_removed,
       {eff[c]} AS removal_effect,
       (round((greatest({eff[c]}, 0.0) / ({tot_eff})) * 1000000.0) / 1000000.0)
           AS attribution_share
FROM base"""
        for c in _MK_CHANNELS
    )
    joined = ",\n".join(parts)
    return f"""WITH {joined},
base AS (
    SELECT (SELECT v FROM full_{rounds} WHERE s = 'START') AS p_full,
           {sel}
)
{chan_rows}
ORDER BY channel
"""


@register(
    "q_markov_attribution",
    oracle=_mk_attrib_oracle(12),
    description=(
        "Markov removal-effect attribution: user journeys (touches "
        "before first purchase, ordered by ts,event_id) become a "
        "first-order chain START -> touches -> CONV/NULL; each "
        "channel's credit is its removal effect 1 - P_conv(chain with "
        "the channel absorbed to NULL)/P_conv(full chain), normalized "
        "to shares — the causal-flavored member of the attribution "
        "family (last-touch ignores paths, linear splits equally, "
        "Shapley needs the coalition powerset; Markov asks 'how much "
        "conversion disappears without this state?'). Data-sized work "
        "is ONE journey pass producing the transition-count matrix "
        "(at most |types|^2 + fringe rows); absorption probabilities "
        "come from 12 value-iteration rounds per variant over the "
        "<=5 transient states, riding the driver like "
        "q_markov_stationary, every iterate 6dp-rounded against the "
        "unrolled-CTE oracle."
    ),
    tags=("events", "extension", "analytics", "attribution"),
)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w_seq).cast("long").alias("rn")
    )
    conv = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").cast("long").alias("crn"))
    )
    tch = (
        seq.join(conv, "user_id", "left")
        .filter(F.col("crn").isNull() | (F.col("rn") < F.col("crn")))
        .withColumn(
            "k",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("rn"))
            .cast("long"),
        )
    )
    w_u = Window.partitionBy("user_id").orderBy("k")
    step = tch.select(
        "user_id",
        F.col("event_type").alias("f"),
        "k",
        F.lead("event_type").over(w_u).alias("nxt"),
        F.max("k").over(Window.partitionBy("user_id")).alias("mk"),
        F.col("crn").isNotNull().alias("converted"),
    )
    edges = (
        tch.filter(F.col("k") == 1)
        .select(F.lit("START").alias("f"), F.col("event_type").alias("t"))
        .unionAll(
            step.filter(F.col("nxt").isNotNull()).select("f", F.col("nxt").alias("t"))
        )
        .unionAll(
            step.filter(F.col("k") == F.col("mk")).select(
                "f",
                F.when(F.col("converted"), "CONV").otherwise("NULL").alias("t"),
            )
        )
        .unionAll(
            conv.filter(F.col("crn") == 1).select(
                F.lit("START").alias("f"), F.lit("CONV").alias("t")
            )
        )
    )
    cnt = edges.groupBy("f", "t").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("f").agg(F.sum("n").alias("tn"))
    prob = cnt.join(tot, "f").select(
        "f", "t", stable_round(F.col("n") * 1.0 / F.col("tn"), 6).alias("p")
    )
    # |states|^2 transition matrix: metadata-scale, like q_markov_stationary.
    mat: dict[str, list[tuple[str, float]]] = {}
    for r in prob.collect():
        mat.setdefault(r["f"], []).append((r["t"], r["p"]))
    states = ["START", *_MK_CHANNELS]

    def absorb(removed: str | None) -> float:
        v = {s: 0.0 for s in states}
        for _ in range(12):
            nxt = {}
            for s in states:
                acc = 0.0
                for t, pp in sorted(mat.get(s, [])):
                    if t == "CONV":
                        acc += pp * 1.0
                    elif t == "NULL" or t == removed:
                        pass
                    else:
                        acc += pp * v.get(t, 0.0)
                nxt[s] = _markov_round6(acc)
            v = nxt
        return v["START"]

    p_full = absorb(None)
    rows = []
    effs = {
        c: _markov_round6(1.0 - absorb(c) / p_full) for c in _MK_CHANNELS
    }
    tot_eff = sum(max(effs[c], 0.0) for c in sorted(_MK_CHANNELS))
    for c in _MK_CHANNELS:
        rows.append(
            (
                c,
                float(p_full),
                float(absorb(c)),
                float(effs[c]),
                float(_markov_round6(max(effs[c], 0.0) / tot_eff)),
            )
        )
    return spark.createDataFrame(
        rows,
        "channel string, p_full double, p_removed double, "
        "removal_effect double, attribution_share double",
    ).orderBy("channel")


@register(
    "q_gumbel_extremes",
    oracle="""
WITH daily AS (
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(max(round(value * 100)) AS BIGINT) AS mx
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(mx) AS BIGINT) AS s1,
           CAST(sum(mx * mx) AS BIGINT) AS s2
    FROM daily
),
fit AS (
    SELECT n,
           (s1 * 1.0 / n / 100.0) AS mean_max,
           (sqrt((n * s2 - s1 * s1) * 1.0 / (n * 1.0 * n)) / 100.0
            * sqrt(6.0) / 3.141592653589793) AS beta
    FROM m
)
SELECT n AS n_days,
       (round(mean_max * 1000000.0) / 1000000.0) AS mean_daily_max,
       (round((mean_max - 0.5772156649015329 * beta) * 1000000.0) / 1000000.0)
           AS gumbel_loc,
       (round(beta * 1000000.0) / 1000000.0) AS gumbel_scale,
       (round((mean_max - 0.5772156649015329 * beta
               - beta * ln(-ln(1.0 - 1.0 / 30.0))) * 1000000.0) / 1000000.0)
           AS return_level_30d,
       (round((mean_max - 0.5772156649015329 * beta
               - beta * ln(-ln(1.0 - 1.0 / 365.0))) * 1000000.0) / 1000000.0)
           AS return_level_365d
FROM fit
""",
    description=(
        "Extreme-value analysis of daily maximum purchase values: "
        "Gumbel fit by method of moments over the block (daily) "
        "maxima — scale = s*sqrt(6)/pi, loc = mean - gamma*scale "
        "(Euler-Mascheroni) — with 30-day and 365-day return levels "
        "loc - scale*ln(-ln(1-1/T)), i.e. 'how large a single "
        "purchase should we expect once a month / once a year?' — "
        "the EVT member of the tail-analysis family next to "
        "q_tail_latency_heatmap's empirical percentiles (quantiles "
        "interpolate INSIDE the data; a fitted tail extrapolates "
        "beyond it, which is what capacity planning actually needs). "
        "Block maxima fold as exact integer cents (max commutes with "
        "the cents quantization), moments are BIGINT, and the fit is "
        "a fixed float expression — one day-grain shuffle total."
    ),
    tags=("analytics", "extension", "stats", "timeseries"),
)
def q_gumbel_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.max(F.round(F.col("value") * 100)).cast("long").alias("mx"))
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mean_max = s1 * 1.0 / n / 100.0
    beta = (
        F.sqrt((n * s2 - s1 * s1) * 1.0 / (n * 1.0 * n))
        / 100.0
        * F.sqrt(F.lit(6.0))
        / F.lit(3.141592653589793)
    )
    gamma = F.lit(0.5772156649015329)
    loc = mean_max - gamma * beta
    import math as _math  # noqa: F401  (documents the pi literal provenance)

    def rl(t: float):
        return loc - beta * F.log(-F.log(1.0 - 1.0 / F.lit(t)))

    return m.select(
        n.alias("n_days"),
        stable_round(mean_max, 6).alias("mean_daily_max"),
        stable_round(loc, 6).alias("gumbel_loc"),
        stable_round(beta, 6).alias("gumbel_scale"),
        stable_round(rl(30.0), 6).alias("return_level_30d"),
        stable_round(rl(365.0), 6).alias("return_level_365d"),
    )


@register(
    "q_bias_baseline_recsys",
    oracle="""
WITH r AS (
    SELECT o.o_custkey AS u, l.l_partkey AS i,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
g AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sq FROM r
),
ib AS (
    SELECT i, CAST(count(*) AS BIGINT) AS n_i, CAST(sum(q) AS BIGINT) AS s_i,
           CAST(round(((sum(q) - count(*) * ((SELECT sq FROM g) * 1.0 / (SELECT n FROM g)))
                       / (5.0 + count(*))) * 1000000.0) AS BIGINT) AS bi_q
    FROM r GROUP BY i
),
ub AS (
    SELECT r.u, CAST(count(*) AS BIGINT) AS n_u,
           CAST(round(((sum(r.q) - count(*) * ((SELECT sq FROM g) * 1.0 / (SELECT n FROM g)))
                        * 1000000.0 - sum(ib.bi_q))
                      / ((5.0 + count(*)) * 1000000.0) * 1000000.0) AS BIGINT) AS bu_q
    FROM r JOIN ib ON ib.i = r.i GROUP BY r.u
),
scored AS (
    SELECT r.q,
           ((SELECT sq FROM g) * 1.0 / (SELECT n FROM g)
            + ib.bi_q / 1000000.0 + ub.bu_q / 1000000.0) AS pred,
           ((SELECT sq FROM g) * 1.0 / (SELECT n FROM g)) AS mu
    FROM r JOIN ib ON ib.i = r.i JOIN ub ON ub.u = r.u
),
e AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round((q - pred) * (q - pred) * 1000000.0) AS BIGINT))
                AS BIGINT) AS se_base,
           CAST(sum(CAST(round((q - mu) * (q - mu) * 1000000.0) AS BIGINT))
                AS BIGINT) AS se_glob,
           max(mu) AS mu
    FROM scored
)
SELECT n AS n_pairs,
       (round(mu * 1000000.0) / 1000000.0) AS global_mean_qty,
       (round(sqrt(se_glob / 1000000.0 / n) * 1000000.0) / 1000000.0)
           AS rmse_global,
       (round(sqrt(se_base / 1000000.0 / n) * 1000000.0) / 1000000.0)
           AS rmse_baseline
FROM e
""",
    description=(
        "Recommender bias baseline (the Netflix-prize 'baseline "
        "predictor'): customer x part implicit ratings (summed "
        "quantity), global mean mu, damped item bias "
        "b_i = (S_i - n_i*mu)/(lambda + n_i), then damped user bias "
        "on the item-debiased residuals, and the RMSE of mu + b_i + "
        "b_u vs mu alone — the mandatory sanity floor before any "
        "factorization model, and the personalization complement to "
        "q_item_item_cf's neighborhood scores. Determinism contract: "
        "ratings are exact BIGINT quantity sums, bias numerators use "
        "the S - n*mu identity (never a float sum of per-row "
        "residuals), biases are quantized to integer micro-units "
        "before the user-level re-aggregation, and squared errors "
        "fold as micro-unit BIGINTs — so both engines emit identical "
        "doubles. Three shuffles: (u,i) agg, item agg, user agg."
    ),
    tags=("analytics", "extension", "ml", "recommender"),
)
def q_bias_baseline_recsys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
        .persist()
    )
    try:
        g = r.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").cast("long").alias("sq"),
        ).collect()[0]
        mu = g["sq"] * 1.0 / g["n"]
        ib = r.groupBy("i").agg(
            F.round(
                (F.sum("q") - F.count(F.lit(1)) * F.lit(mu))
                / (F.lit(5.0) + F.count(F.lit(1)))
                * 1000000.0
            )
            .cast("long")
            .alias("bi_q"),
        )
        ri = r.join(ib, "i")
        ub = ri.groupBy("u").agg(
            F.round(
                (
                    (F.sum("q") - F.count(F.lit(1)) * F.lit(mu)) * 1000000.0
                    - F.sum("bi_q")
                )
                / ((F.lit(5.0) + F.count(F.lit(1))) * 1000000.0)
                * 1000000.0
            )
            .cast("long")
            .alias("bu_q"),
        )
        pred = (
            F.lit(mu) + F.col("bi_q") / 1000000.0 + F.col("bu_q") / 1000000.0
        )
        q = F.col("q")
        scored = ri.join(ub, "u")
        e = scored.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round((q - pred) * (q - pred) * 1000000.0).cast("long"))
            .cast("long")
            .alias("se_base"),
            F.sum(
                F.round((q - F.lit(mu)) * (q - F.lit(mu)) * 1000000.0).cast("long")
            )
            .cast("long")
            .alias("se_glob"),
        )
        n = F.col("n")
        return e.select(
            n.alias("n_pairs"),
            stable_round(F.lit(mu), 6).alias("global_mean_qty"),
            stable_round(F.sqrt(F.col("se_glob") / 1000000.0 / n), 6).alias(
                "rmse_global"
            ),
            stable_round(F.sqrt(F.col("se_base") / 1000000.0 / n), 6).alias(
                "rmse_baseline"
            ),
        )
    finally:
        r.unpersist()


def _entropy_rate_oracle(rounds: int = 12) -> str:
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    parts = [
        """pairs AS (
    SELECT event_type AS f,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
    FROM events
)""",
        """cnt AS (
    SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM pairs WHERE t IS NOT NULL GROUP BY 1, 2
)""",
        """tot AS (SELECT f, CAST(sum(n) AS BIGINT) AS tn FROM cnt GROUP BY 1)""",
        f"""p AS MATERIALIZED (
    SELECT c.f, c.t, {r6('c.n * 1.0 / tot.tn')} AS p FROM cnt c JOIN tot ON c.f = tot.f
)""",
        """states AS MATERIALIZED (SELECT f AS s FROM cnt UNION SELECT t FROM cnt)""",
        """k AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM states)""",
        f"""v_0 AS (SELECT s, {r6('1.0 / kk')} AS v FROM states CROSS JOIN k)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""v_{r} AS MATERIALIZED (
    SELECT st.s, {r6('coalesce(sum(v.v * p.p), 0.0)')} AS v
    FROM states st
    LEFT JOIN p ON p.t = st.s
    LEFT JOIN v_{r - 1} v ON v.s = p.f
    GROUP BY st.s
)"""
        )
    joined = ",\n".join(parts)
    return f"""WITH {joined},
terms AS (
    SELECT CAST(round(pi.v * p.p * (-log2(p.p)) * 1000000000.0) AS BIGINT) AS q
    FROM p JOIN v_{rounds} pi ON pi.s = p.f
    WHERE p.p > 0
),
m AS (
    SELECT CAST(sum(q) AS BIGINT) AS sq,
           (SELECT CAST(count(*) AS BIGINT) FROM states) AS k
    FROM terms
)
SELECT k AS n_states,
       {r6('sq / 1000000000.0')} AS entropy_rate_bits,
       {r6('log2(k * 1.0)')} AS max_entropy_bits,
       {r6('(sq / 1000000000.0) / log2(k * 1.0)')} AS efficiency
FROM m
"""


@register(
    "q_entropy_rate",
    oracle=_entropy_rate_oracle(12),
    description=(
        "Entropy rate of the event-type Markov chain: H = -sum_s "
        "pi(s) sum_t p(s,t) log2 p(s,t) bits/event, with pi the "
        "stationary distribution from the same 12 power rounds as "
        "q_markov_stationary — the information-theoretic summary of "
        "session dynamics (H near log2|types| = user flows are "
        "near-random; H near 0 = rigidly scripted journeys), the "
        "sequence-level complement to the marginal q_token_entropy. "
        "Data-sized work is the one lead()-window transition pass; "
        "the chain iteration rides the driver at |types|^2 metadata "
        "scale, and the final expectation folds as 1e-9-quantized "
        "BIGINT terms so neither engine's float-sum order can leak "
        "into the result."
    ),
    tags=("events", "extension", "analytics", "stats"),
)
def q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from healthcare_etl_spark.plans.queries_mlops import _markov_round6  # noqa: PLW0406

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(w).alias("t"),
    ).filter(F.col("t").isNotNull())
    cnt = pairs.groupBy("f", "t").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("f").agg(F.sum("n").alias("tn"))
    prob = cnt.join(tot, "f").select(
        "f", "t", stable_round(F.col("n") * 1.0 / F.col("tn"), 6).alias("p")
    )
    mat: dict[str, dict[str, float]] = {}
    seen: set[str] = set()
    for r in prob.collect():
        mat.setdefault(r["f"], {})[r["t"]] = r["p"]
        seen.add(r["f"])
        seen.add(r["t"])
    states = sorted(seen)
    v = {s: _markov_round6(1.0 / len(states)) for s in states}
    for _ in range(12):
        nxt = {}
        for s in states:
            acc = 0.0
            for f in states:
                acc += v.get(f, 0.0) * mat.get(f, {}).get(s, 0.0)
            nxt[s] = _markov_round6(acc)
        v = nxt
    sq = 0
    for f in states:
        for t, pp in sorted(mat.get(f, {}).items()):
            if pp > 0:
                sq += int(
                    math.copysign(
                        math.floor(
                            abs(v[f] * pp * (-math.log2(pp)) * 1000000000.0) + 0.5
                        ),
                        1.0,
                    )
                )
    k = len(states)
    h = _markov_round6(sq / 1000000000.0)
    return spark.createDataFrame(
        [
            (
                k,
                float(h),
                float(_markov_round6(math.log2(k * 1.0))),
                float(_markov_round6((sq / 1000000000.0) / math.log2(k * 1.0))),
            )
        ],
        "n_states long, entropy_rate_bits double, max_entropy_bits double, "
        "efficiency double",
    )


@register(
    "q_l_diversity_audit",
    oracle="""
WITH cells AS (
    SELECT CAST(dayofweek(ts) AS BIGINT)       AS wd,
           CAST(floor(value / 10.0) AS BIGINT) AS value_band,
           CAST(count(DISTINCT event_type) AS BIGINT) AS l,
           CAST(count(DISTINCT user_id) AS BIGINT)    AS k,
           CAST(count(*) AS BIGINT)                   AS n_events
    FROM events
    GROUP BY 1, 2
),
classed AS (
    SELECT CASE WHEN l >= 3 THEN '3+' ELSE CAST(l AS VARCHAR) END AS l_class,
           (l < 3) AS at_risk, k, n_events
    FROM cells
)
SELECT l_class, at_risk,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(min(k) AS BIGINT) AS min_k,
       (round((sum(n_events) * 1.0 / (SELECT sum(n_events) FROM cells))
              * 1000000.0) / 1000000.0) AS event_share
FROM classed GROUP BY 1, 2
""",
    description=(
        "l-diversity audit: within each quasi-identifier cell "
        "(weekday, value decile-band), how many DISTINCT values of "
        "the sensitive attribute (event_type) appear — the "
        "attribute-disclosure companion to q_kanonymity_audit, which "
        "only counts users: a cell can be 100-anonymous yet leak "
        "'everyone in it had an error' if l=1. Flags cells below l=3 "
        "and the event-row share they carry, plus each class's worst "
        "k so both audits read together. Same shape: one QI "
        "partial-aggregated pass, then a handful-of-rows histogram."
    ),
    tags=("quality", "extension", "governance"),
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.dayofweek("ts").cast("long").alias("wd"),
        F.floor(F.col("value") / 10.0).cast("long").alias("value_band"),
    ).agg(
        F.countDistinct("event_type").cast("long").alias("l"),
        F.countDistinct("user_id").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ).persist()
    try:
        total = cells.agg(F.sum("n_events")).collect()[0][0]
        classed = cells.select(
            F.when(F.col("l") >= 3, "3+").otherwise(F.col("l").cast("string")).alias(
                "l_class"
            ),
            (F.col("l") < 3).alias("at_risk"),
            "k",
            "n_events",
        )
        return classed.groupBy("l_class", "at_risk").agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("k").cast("long").alias("min_k"),
            stable_round(F.sum("n_events") * 1.0 / F.lit(total), 6).alias(
                "event_share"
            ),
        )
    finally:
        cells.unpersist()


@register(
    "q_iv_wald_estimator",
    oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS z,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS y
    FROM events GROUP BY user_id
),
m AS (
    SELECT CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN z THEN 0 ELSE 1 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN z THEN x ELSE 0 END) AS BIGINT) AS sx1,
           CAST(sum(CASE WHEN z THEN 0 ELSE x END) AS BIGINT) AS sx0,
           CAST(sum(CASE WHEN z THEN y ELSE 0 END) AS BIGINT) AS sy1,
           CAST(sum(CASE WHEN z THEN 0 ELSE y END) AS BIGINT) AS sy0,
           CAST(sum(CASE WHEN z THEN x * x ELSE 0 END) AS BIGINT) AS sxx1,
           CAST(sum(CASE WHEN z THEN 0 ELSE x * x END) AS BIGINT) AS sxx0
    FROM u
)
SELECT (n1 + n0) AS n_users,
       (round(((sx1 * 1.0 / n1) - (sx0 * 1.0 / n0)) * 1000000.0) / 1000000.0)
           AS first_stage_diff,
       CASE WHEN (sxx1 * 1.0 / n1 - (sx1 * 1.0 / n1) * (sx1 * 1.0 / n1)) / n1
                  + (sxx0 * 1.0 / n0 - (sx0 * 1.0 / n0) * (sx0 * 1.0 / n0)) / n0 > 0
            THEN (round((((sx1 * 1.0 / n1) - (sx0 * 1.0 / n0))
               / sqrt((sxx1 * 1.0 / n1 - (sx1 * 1.0 / n1) * (sx1 * 1.0 / n1)) / n1
                      + (sxx0 * 1.0 / n0 - (sx0 * 1.0 / n0) * (sx0 * 1.0 / n0)) / n0))
              * 1000000.0) / 1000000.0) END AS first_stage_z,
       (round((((sy1 * 1.0 / n1) - (sy0 * 1.0 / n0)) / 100.0) * 1000000.0)
        / 1000000.0) AS itt_diff,
       CASE WHEN (sx1 * 1.0 / n1) - (sx0 * 1.0 / n0) <> 0
            THEN (round(((((sy1 * 1.0 / n1) - (sy0 * 1.0 / n0)) / 100.0)
               / ((sx1 * 1.0 / n1) - (sx0 * 1.0 / n0))) * 1000000.0) / 1000000.0) END
           AS wald_late
FROM m
""",
    description=(
        "Instrumental-variable (Wald) estimator: the deterministic "
        "assignment hash is the instrument z, per-user clicks the "
        "treatment x, purchase value the outcome y — LATE = "
        "(E[y|z=1]-E[y|z=0]) / (E[x|z=1]-E[x|z=0]), the "
        "encouragement-design member of the causal family (DiD needs "
        "parallel trends, PSM/AIPW need no unobserved confounding; IV "
        "trades those for an exclusion restriction). Reports the ITT "
        "numerator, the first-stage strength as a Welch-style z "
        "(|z| < ~3 means a weak instrument and an untrustworthy "
        "ratio), and the LATE. One per-user pass + one 8-moment "
        "global fold, all BIGINT until the final divisions."
    ),
    tags=("analytics", "extension", "stats", "causal"),
)
def q_iv_wald_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.plans.queries_stats2 import _arm_a

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.first(_arm_a()).alias("z"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("y"),
    )
    z = F.col("z")
    m = u.agg(
        F.sum(F.when(z, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(z, 0).otherwise(1)).cast("long").alias("n0"),
        F.sum(F.when(z, F.col("x")).otherwise(0)).cast("long").alias("sx1"),
        F.sum(F.when(z, 0).otherwise(F.col("x"))).cast("long").alias("sx0"),
        F.sum(F.when(z, F.col("y")).otherwise(0)).cast("long").alias("sy1"),
        F.sum(F.when(z, 0).otherwise(F.col("y"))).cast("long").alias("sy0"),
        F.sum(F.when(z, F.col("x") * F.col("x")).otherwise(0))
        .cast("long")
        .alias("sxx1"),
        F.sum(F.when(z, 0).otherwise(F.col("x") * F.col("x")))
        .cast("long")
        .alias("sxx0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    mx1, mx0 = F.col("sx1") * 1.0 / n1, F.col("sx0") * 1.0 / n0
    my1, my0 = F.col("sy1") * 1.0 / n1, F.col("sy0") * 1.0 / n0
    vx1 = F.col("sxx1") * 1.0 / n1 - mx1 * mx1
    vx0 = F.col("sxx0") * 1.0 / n0 - mx0 * mx0
    fs = mx1 - mx0
    itt = (my1 - my0) / 100.0
    return m.select(
        (n1 + n0).alias("n_users"),
        stable_round(fs, 6).alias("first_stage_diff"),
        F.when(
            vx1 / n1 + vx0 / n0 > 0,
            stable_round(fs / F.sqrt(vx1 / n1 + vx0 / n0), 6),
        ).alias("first_stage_z"),
        stable_round(itt, 6).alias("itt_diff"),
        F.when(fs != 0, stable_round(itt / fs, 6)).alias("wald_late"),
    )


@register(
    "q_kfold_cv_ridge",
    oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('cv-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 5) AS fold,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS y
    FROM events GROUP BY user_id
),
fm AS (
    SELECT fold, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
    FROM u GROUP BY fold
),
tm AS (
    SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
           CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy,
           CAST(sum(sxx) AS BIGINT) AS sxx
    FROM fm
),
fit AS (
    SELECT f.fold, (t.n - f.n) AS n_train, f.n AS n_test,
           (round((((t.sxy - f.sxy) - (t.sx - f.sx) * 1.0 * (t.sy - f.sy) / (t.n - f.n))
                   / (((t.sxx - f.sxx) - (t.sx - f.sx) * 1.0 * (t.sx - f.sx) / (t.n - f.n))
                      + 1.0)) * 1000000.0) / 1000000.0) AS b
    FROM fm f CROSS JOIN tm t
),
ab AS (
    SELECT f.fold, f.n_train, f.n_test, f.b,
           (round((((t.sy - fm.sy) * 1.0 / (t.n - fm.n))
                   - f.b * ((t.sx - fm.sx) * 1.0 / (t.n - fm.n))) * 1000000.0)
            / 1000000.0) AS a
    FROM fit f
    JOIN fm ON fm.fold = f.fold
    CROSS JOIN tm t
),
scored AS (
    SELECT u.fold,
           CAST(round((u.y - ab.a - ab.b * u.x) * (u.y - ab.a - ab.b * u.x)
                      * 0.000001) AS BIGINT) AS se_q
    FROM u JOIN ab ON ab.fold = u.fold
)
SELECT ab.fold, ab.n_train, ab.n_test, ab.b AS slope_cents_per_click,
       (round(sqrt(sum(s.se_q) * 1000000.0 / ab.n_test) / 100.0 * 1000000.0)
        / 1000000.0) AS rmse_dollars
FROM scored s JOIN ab ON ab.fold = s.fold
GROUP BY ab.fold, ab.n_train, ab.n_test, ab.b
ORDER BY ab.fold
""",
    description=(
        "5-fold cross-validated ridge regression (y = per-user "
        "purchase cents ~ clicks, lambda=1) with deterministic hash "
        "folds: the methodology op every in-repo model (ridge, "
        "logistic, Poisson) implicitly needs — held-out error, not "
        "training fit. The key scale trick: train moments for each "
        "fold are LEAVE-ONE-FOLD-OUT DIFFERENCES of one global moment "
        "pass (total - fold, exact BIGINT), so 5 folds cost ONE scan "
        "plus a 5-row cross join, not 5 training passes; per-row "
        "squared errors fold as 1e-6-quantized BIGINTs against the "
        "6dp-rounded (a, b). Reports per-fold slope and held-out "
        "RMSE in dollars."
    ),
    tags=("analytics", "extension", "ml", "evaluation"),
)
def q_kfold_cv_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cv-v1:"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    u = ev.groupBy("user_id").agg(
        F.first(fold).alias("fold"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("y"),
    ).persist()
    try:
        fm = u.groupBy("fold").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
        tm = fm.agg(
            F.sum("n").cast("long").alias("tn"),
            F.sum("sx").cast("long").alias("tsx"),
            F.sum("sy").cast("long").alias("tsy"),
            F.sum("sxy").cast("long").alias("tsxy"),
            F.sum("sxx").cast("long").alias("tsxx"),
        )
        j = fm.crossJoin(F.broadcast(tm))
        nt = F.col("tn") - F.col("n")
        cx = (F.col("tsx") - F.col("sx")) * 1.0 / nt
        cy = (F.col("tsy") - F.col("sy")) * 1.0 / nt
        sxy_c = (F.col("tsxy") - F.col("sxy")) - (F.col("tsx") - F.col("sx")) * 1.0 * (
            F.col("tsy") - F.col("sy")
        ) / nt
        sxx_c = (F.col("tsxx") - F.col("sxx")) - (F.col("tsx") - F.col("sx")) * 1.0 * (
            F.col("tsx") - F.col("sx")
        ) / nt
        b = stable_round(sxy_c / (sxx_c + 1.0), 6)
        ab = j.select(
            "fold",
            nt.alias("n_train"),
            F.col("n").alias("n_test"),
            b.alias("b"),
            stable_round(cy - b * cx, 6).alias("a"),
        )
        scored = u.join(F.broadcast(ab), "fold").select(
            "fold",
            "n_train",
            "n_test",
            "b",
            F.round(
                (F.col("y") - F.col("a") - F.col("b") * F.col("x"))
                * (F.col("y") - F.col("a") - F.col("b") * F.col("x"))
                * 0.000001
            )
            .cast("long")
            .alias("se_q"),
        )
        return (
            scored.groupBy("fold", "n_train", "n_test", "b")
            .agg(
                stable_round(
                    F.sqrt(F.sum("se_q") * 1000000.0 / F.col("n_test")) / 100.0, 6
                ).alias("rmse_dollars")
            )
            .select(
                "fold",
                "n_train",
                "n_test",
                F.col("b").alias("slope_cents_per_click"),
                "rmse_dollars",
            )
            .orderBy("fold")
        )
    finally:
        u.unpersist()


@register(
    "q_qini_curve",
    oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS treated,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS score,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS conv
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT treated, conv,
           CAST(row_number() OVER (ORDER BY score DESC, user_id) AS BIGINT) AS rk,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM u
),
tiled AS (
    SELECT treated, conv,
           CASE WHEN rk <= (n % 10) * ((n // 10) + 1)
                THEN CAST((rk - 1) // ((n // 10) + 1) AS BIGINT) + 1
                ELSE (n % 10) + CAST((rk - 1 - (n % 10) * ((n // 10) + 1))
                                     // greatest(n // 10, 1) AS BIGINT) + 1
           END AS decile
    FROM ranked
),
agg AS (
    SELECT decile,
           CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           CAST(sum(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
           CAST(sum(CASE WHEN treated THEN conv ELSE 0 END) AS BIGINT) AS conv_t,
           CAST(sum(CASE WHEN treated THEN 0 ELSE conv END) AS BIGINT) AS conv_c
    FROM tiled GROUP BY decile
),
cum AS (
    SELECT decile, n_t, n_c, conv_t, conv_c,
           CAST(sum(n_t) OVER w AS BIGINT) AS cnt,
           CAST(sum(n_c) OVER w AS BIGINT) AS cnc,
           CAST(sum(conv_t) OVER w AS BIGINT) AS cct,
           CAST(sum(conv_c) OVER w AS BIGINT) AS ccc
    FROM agg
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT decile, n_t, n_c, conv_t, conv_c,
       CASE WHEN cnc > 0
            THEN (round((cct - ccc * 1.0 * cnt / cnc) * 1000000.0) / 1000000.0)
       END AS qini
FROM cum ORDER BY decile
""",
    description=(
        "Qini curve for uplift evaluation: users ranked by a targeting "
        "score (clicks, the standing proxy model) into ANSI-ntile "
        "deciles, cumulative incremental conversions qini(k) = "
        "cum_treated_conv - cum_control_conv * cum_n_t/cum_n_c — the "
        "standard 'did targeting the top deciles actually CAUSE more "
        "conversions' readout, which neither the classifier evals "
        "(gains chart ranks raw outcomes) nor the ATE queries "
        "(one global number) provide. Rank is the two-phase "
        "bucketed carry (score buckets descending), deciles are "
        "arithmetic ntile_from_rank; the only keyless window is the "
        "10-row cumulative."
    ),
    tags=("analytics", "extension", "ml", "evaluation", "causal"),
)
def q_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank, ntile_from_rank
    from healthcare_etl_spark.plans.queries_stats2 import _arm_a

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.first(_arm_a()).alias("treated"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("conv"),
    )
    ranked = bucketed_rank(
        u,
        buckets=[F.expr("(-score) div 64")],
        order_by=[F.desc("score"), F.asc("user_id")],
        out_col="rk",
    )
    n_total = u.count()
    tiled = ranked.select(
        "treated",
        "conv",
        ntile_from_rank(F.col("rk"), F.lit(n_total), 10).alias("decile"),
    )
    agg = tiled.groupBy("decile").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated"), 0).otherwise(1)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated"), F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_t"),
        F.sum(F.when(F.col("treated"), 0).otherwise(F.col("conv")))
        .cast("long")
        .alias("conv_c"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return agg.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.when(
            F.sum("n_c").over(w) > 0,
            stable_round(
                F.sum("conv_t").over(w)
                - F.sum("conv_c").over(w) * 1.0 * F.sum("n_t").over(w)
                / F.sum("n_c").over(w),
                6,
            ),
        ).alias("qini"),
    ).orderBy("decile")


@register(
    "q_ips_policy_eval",
    oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS action_treat,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
               AS clicks,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS reward
    FROM events GROUP BY user_id
),
scored AS (
    SELECT reward, action_treat,
           (clicks >= 3) AS target_treat,
           CASE WHEN (clicks >= 3) = action_treat THEN 2.0 ELSE 0.0 END AS w
    FROM u
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(sum(reward) AS BIGINT) AS r_log,
           CAST(sum(CASE WHEN w > 0 THEN reward * 2 ELSE 0 END) AS BIGINT) AS r_ips2,
           CAST(sum(CASE WHEN w > 0 THEN 2 ELSE 0 END) AS BIGINT) AS w_sum2
    FROM scored
)
SELECT n AS n_users, n_matched,
       (round((r_log * 1.0 / n) * 1000000.0) / 1000000.0) AS value_logging,
       (round((r_ips2 * 1.0 / n) * 1000000.0) / 1000000.0) AS value_ips,
       CASE WHEN w_sum2 > 0
            THEN (round((r_ips2 * 1.0 / w_sum2) * 1000000.0) / 1000000.0)
       END AS value_snips,
       (round((n_matched * 1.0 / n) * 1000000.0) / 1000000.0) AS match_rate
FROM m
""",
    description=(
        "Offline (counterfactual) policy evaluation by inverse "
        "propensity scoring: the logged 50/50 assignment is the "
        "logging policy (known propensity 0.5, so matched actions "
        "weight 2.0), the candidate policy 'treat users with >= 3 "
        "clicks' is scored WITHOUT running it — V_IPS = mean of "
        "matched rewards / propensity, plus the self-normalized SNIPS "
        "variant that trades a little bias for much lower variance "
        "(the standard fix when match rates are low) and the match "
        "rate that tells you how much data actually spoke. The "
        "bandit-flavored eval member of the causal family: ATE asks "
        "'what did THE treatment do', this asks 'what would THAT "
        "POLICY earn'. One per-user pass + one 5-moment fold, exact "
        "integer sums (propensity 0.5 makes every IPS weight the "
        "integer 2)."
    ),
    tags=("analytics", "extension", "ml", "evaluation", "causal"),
)
def q_ips_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.plans.queries_stats2 import _arm_a

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.first(_arm_a()).alias("action_treat"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("reward"),
    )
    matched = (F.col("clicks") >= 3) == F.col("action_treat")
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(matched, 1).otherwise(0)).cast("long").alias("n_matched"),
        F.sum("reward").cast("long").alias("r_log"),
        F.sum(F.when(matched, F.col("reward") * 2).otherwise(0))
        .cast("long")
        .alias("r_ips2"),
        F.sum(F.when(matched, 2).otherwise(0)).cast("long").alias("w_sum2"),
    )
    n = F.col("n")
    return m.select(
        n.alias("n_users"),
        "n_matched",
        stable_round(F.col("r_log") * 1.0 / n, 6).alias("value_logging"),
        stable_round(F.col("r_ips2") * 1.0 / n, 6).alias("value_ips"),
        F.when(
            F.col("w_sum2") > 0,
            stable_round(F.col("r_ips2") * 1.0 / F.col("w_sum2"), 6),
        ).alias("value_snips"),
        stable_round(F.col("n_matched") * 1.0 / n, 6).alias("match_rate"),
    )


@register(
    "q_fairness_audit",
    oracle="""
WITH u AS (
    SELECT user_id,
           (('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            % 2 = 0) AS grp_a,
           (CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) >= 3)
               AS pred,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS y
    FROM events GROUP BY user_id
),
g AS (
    SELECT grp_a,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
           CAST(sum(CASE WHEN pred AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(y) AS BIGINT) AS n_pos
    FROM u GROUP BY grp_a
)
SELECT CASE WHEN grp_a THEN 'A' ELSE 'B' END AS grp, n, n_sel,
       (round((n_sel * 1.0 / n) * 1000000.0) / 1000000.0) AS selection_rate,
       CASE WHEN n_pos > 0
            THEN (round((tp * 1.0 / n_pos) * 1000000.0) / 1000000.0) END AS tpr,
       CASE WHEN n - n_pos > 0
            THEN (round((fp * 1.0 / (n - n_pos)) * 1000000.0) / 1000000.0) END AS fpr,
       (round(((n_sel * 1.0 / n)
               / ((SELECT max(CASE WHEN NOT grp_a THEN n_sel * 1.0 / n END) FROM g)))
              * 1000000.0) / 1000000.0) AS disparate_impact_vs_b
FROM g ORDER BY grp
""",
    description=(
        "Fairness audit of a deployed decision rule (treat users with "
        ">= 3 clicks) across the assignment groups: per-group "
        "selection rate (demographic parity), TPR and FPR against the "
        "purchase outcome (the two equalized-odds components), and "
        "the disparate-impact ratio vs group B (the 80%-rule "
        "quantity) — the governance op that belongs next to the "
        "k-anonymity/l-diversity release audits but for the MODEL "
        "side of the pipeline: a rule can be well-calibrated overall "
        "(q_calibration_ece) and still select one group at twice the "
        "rate. One per-user pass + a 2-group aggregate; exact integer "
        "confusion counts, guarded divisions, one broadcastable "
        "scalar for the ratio denominator."
    ),
    tags=("analytics", "extension", "ml", "governance", "evaluation"),
)
def q_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.plans.queries_stats2 import _arm_a

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.first(_arm_a()).alias("grp_a"),
        (
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) >= 3
        ).alias("pred"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    g = u.groupBy("grp_a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("pred"), 1).otherwise(0)).cast("long").alias("n_sel"),
        F.sum(F.when(F.col("pred") & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("pred") & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum("y").cast("long").alias("n_pos"),
    ).persist()
    try:
        b_rate = (
            g.filter(~F.col("grp_a"))
            .select((F.col("n_sel") * 1.0 / F.col("n")).alias("r"))
            .collect()[0]["r"]
        )
        n, n_pos = F.col("n"), F.col("n_pos")
        return (
            g.select(
                F.when(F.col("grp_a"), "A").otherwise("B").alias("grp"),
                n,
                "n_sel",
                stable_round(F.col("n_sel") * 1.0 / n, 6).alias("selection_rate"),
                F.when(
                    n_pos > 0, stable_round(F.col("tp") * 1.0 / n_pos, 6)
                ).alias("tpr"),
                F.when(
                    n - n_pos > 0,
                    stable_round(F.col("fp") * 1.0 / (n - n_pos), 6),
                ).alias("fpr"),
                stable_round(
                    (F.col("n_sel") * 1.0 / n) / F.lit(b_rate), 6
                ).alias("disparate_impact_vs_b"),
            )
            .orderBy("grp")
        )
    finally:
        g.unpersist()


def _nb_margin_oracle() -> str:
    r6 = lambda e: f"(round(({e}) * 1000000.0) / 1000000.0)"  # noqa: E731
    feat_cols = ",\n           ".join(
        f"CAST(max(CASE WHEN event_type = '{f}' THEN 1 ELSE 0 END) AS BIGINT) AS f_{f}"
        for f in _NB_FEATS
    )
    cnt_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN y = 1 THEN f_{f} ELSE 0 END) AS BIGINT) AS c1_{f},\n"
        f"           CAST(sum(CASE WHEN y = 0 THEN f_{f} ELSE 0 END) AS BIGINT) AS c0_{f}"
        for f in _NB_FEATS
    )
    w_cols = ",\n           ".join(
        f"{r6(f'ln((c1_{f} + 1.0) / (n1 + 2.0))')} AS w1_{f},\n"
        f"           {r6(f'ln(1.0 - (c1_{f} + 1.0) / (n1 + 2.0))')} AS z1_{f},\n"
        f"           {r6(f'ln((c0_{f} + 1.0) / (n0 + 2.0))')} AS w0_{f},\n"
        f"           {r6(f'ln(1.0 - (c0_{f} + 1.0) / (n0 + 2.0))')} AS z0_{f}"
        for f in _NB_FEATS
    )
    s1 = " + ".join(f"(u.f_{f} * p.w1_{f} + (1 - u.f_{f}) * p.z1_{f})" for f in _NB_FEATS)
    s0 = " + ".join(f"(u.f_{f} * p.w0_{f} + (1 - u.f_{f}) * p.z0_{f})" for f in _NB_FEATS)
    return f"""
WITH u AS (
    SELECT user_id,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
           {feat_cols}
    FROM events GROUP BY user_id
),
cnt AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n1,
           CAST(count(*) - sum(y) AS BIGINT) AS n0,
           {cnt_cols}
    FROM u
),
params AS (
    SELECT n, n1, n0,
           {r6('ln((n1 + 1.0) / (n + 2.0))')} AS lp1,
           {r6('ln((n0 + 1.0) / (n + 2.0))')} AS lp0,
           {w_cols}
    FROM cnt
),
scored AS (
    SELECT u.user_id,
           {r6(f'abs((p.lp1 + {s1}) - (p.lp0 + {s0}))')} AS margin
    FROM u CROSS JOIN params p
)
SELECT user_id, margin
FROM scored
ORDER BY margin ASC, user_id ASC
LIMIT 20
"""


@register(
    "q_uncertainty_sampling",
    oracle=_nb_margin_oracle(),
    description=(
        "Active-learning annotation queue: the 20 users the Bernoulli "
        "naive Bayes classifier (same training pass and 6dp-rounded "
        "parameters as q_naive_bayes, via the shared helpers) is LEAST "
        "sure about, ranked by ascending class-score margin "
        "|s1 - s0| — margin-based uncertainty sampling, the standard "
        "'label these next' selector for annotation pipelines, and "
        "the missing front half of the labeling loop whose back half "
        "(kNN label propagation, LOO target encoding) is already "
        "in-repo. Scoring is the same broadcast-params single pass; "
        "the queue is a TakeOrdered over (margin, user_id), never a "
        "global sort. Margins are deterministic doubles (fixed-shape "
        "sums of 6dp-rounded weights), re-rounded to 6dp for the "
        "cross-engine hash."
    ),
    tags=("analytics", "extension", "ml", "ml-prep"),
)
def q_uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    u, params = _nb_features_and_params(spark, sf_dir)
    scored = u.crossJoin(F.broadcast(params))
    s1, s0 = _nb_scores()
    return (
        scored.select(
            "user_id",
            stable_round(F.abs(s1 - s0), 6).alias("margin"),
        )
        .orderBy(F.asc("margin"), F.asc("user_id"))
        .limit(20)
    )


_CF_SPLIT_SQL = (
    "(('0x' || substring(md5('cf-split:' || CAST(ok AS VARCHAR)), 1, 8))::BIGINT"
    " % 5 < 4)"
)


@register(
    "q_cf_hitrate_eval",
    oracle=f"""
WITH basket AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
train AS (SELECT * FROM basket WHERE {_CF_SPLIT_SQL}),
test AS (
    SELECT * FROM basket WHERE NOT {_CF_SPLIT_SQL}
      AND ok IN (SELECT ok FROM basket WHERE NOT {_CF_SPLIT_SQL}
                 GROUP BY ok HAVING count(*) >= 2)
),
n_i AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM train GROUP BY pk),
cooc AS (
    SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_ab
    FROM train a JOIN train b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2
),
sim AS (
    SELECT c.pa AS i, c.pb AS j,
           (round((c.n_ab / sqrt(na.n * 1.0 * nb.n)) * 1000000.0) / 1000000.0) AS s
    FROM cooc c JOIN n_i na ON na.pk = c.pa JOIN n_i nb ON nb.pk = c.pb
    UNION ALL
    SELECT c.pb AS i, c.pa AS j,
           (round((c.n_ab / sqrt(na.n * 1.0 * nb.n)) * 1000000.0) / 1000000.0) AS s
    FROM cooc c JOIN n_i na ON na.pk = c.pa JOIN n_i nb ON nb.pk = c.pb
),
nb10 AS (
    SELECT i, j FROM (
        SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY s DESC, j ASC) AS rn
        FROM sim
    ) WHERE rn <= 10
),
probes AS (
    SELECT a.ok, a.pk AS i,
           CAST(max(CASE WHEN nb.j IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hit
    FROM test a
    JOIN test b ON a.ok = b.ok AND a.pk <> b.pk
    LEFT JOIN nb10 nb ON nb.i = a.pk AND nb.j = b.pk
    GROUP BY a.ok, a.pk
)
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(count(DISTINCT ok) AS BIGINT) AS n_test_baskets,
       CAST(sum(hit) AS BIGINT) AS n_hits,
       (round((sum(hit) * 1.0 / count(*)) * 1000000.0) / 1000000.0)
           AS hit_rate_at_10
FROM probes
""",
    description=(
        "Offline recommender evaluation: co-purchase item-item cosine "
        "neighbors (the q_item_item_cf model) TRAINED on a "
        "deterministic 80% hash-split of orders and probed on "
        "held-out baskets — for each item in a >= 2-item test basket, "
        "did its top-10 training neighbors contain any other item "
        "actually bought together? Reports probes, test baskets, "
        "hits and hit-rate@10, completing the recsys family "
        "(q_item_item_cf model, q_bias_baseline_recsys personalized "
        "floor, THIS closes the loop with a leakage-free accuracy "
        "number). Shapes: within-order pair joins (basket-size "
        "quadratic only), the top-10 window PARTITIONED by item "
        "(distributed), the probe a (basket, item)-grain outer "
        "join; 6dp-rounded sims make both engines cut identical "
        "neighbor lists."
    ),
    tags=("analytics", "extension", "ml", "recommender", "evaluation"),
)
def q_cf_hitrate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    is_train = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cf-split:"), F.col("ok").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 5
        < 4
    )
    marked = basket.withColumn("tr", is_train).persist()
    try:
        train = marked.filter(F.col("tr")).select("ok", "pk")
        test_sizes = (
            marked.filter(~F.col("tr"))
            .groupBy("ok")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") >= 2)
            .select("ok")
        )
        test = marked.filter(~F.col("tr")).join(
            F.broadcast(test_sizes), "ok", "left_semi"
        ).select("ok", "pk")
        n_i = train.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("n"))
        a = train.alias("a")
        b = train.alias("b")
        cooc = (
            a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
            .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        )
        na = n_i.select(F.col("pk").alias("pa"), F.col("n").alias("n_a"))
        nbm = n_i.select(F.col("pk").alias("pb"), F.col("n").alias("n_b"))
        scored = (
            cooc.join(F.broadcast(na), "pa")
            .join(F.broadcast(nbm), "pb")
            .select(
                "pa",
                "pb",
                stable_round(
                    F.col("n_ab") / F.sqrt(F.col("n_a") * 1.0 * F.col("n_b")), 6
                ).alias("s"),
            )
        )
        sim = scored.select(
            F.col("pa").alias("i"), F.col("pb").alias("j"), "s"
        ).unionAll(scored.select(F.col("pb").alias("i"), F.col("pa").alias("j"), "s"))
        w = Window.partitionBy("i").orderBy(F.desc("s"), F.asc("j"))
        nb10 = (
            sim.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("i", "j")
        )
        ta = test.alias("ta")
        tb = test.alias("tb")
        pairs = ta.join(
            tb,
            (F.col("ta.ok") == F.col("tb.ok")) & (F.col("ta.pk") != F.col("tb.pk")),
        ).select(
            F.col("ta.ok").alias("ok"),
            F.col("ta.pk").alias("i"),
            F.col("tb.pk").alias("j"),
        )
        probes = (
            pairs.join(
                nb10.withColumn("m", F.lit(1)), ["i", "j"], "left"
            )
            .groupBy("ok", "i")
            .agg(F.max(F.coalesce("m", F.lit(0))).cast("long").alias("hit"))
        )
        return probes.agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.countDistinct("ok").cast("long").alias("n_test_baskets"),
            F.sum("hit").cast("long").alias("n_hits"),
            stable_round(F.sum("hit") * 1.0 / F.count(F.lit(1)), 6).alias(
                "hit_rate_at_10"
            ),
        )
    finally:
        marked.unpersist()


_ALS_P = 2_147_483_647
_ALS_MD5 = f"(('0x' || substring(md5({{x}}), 1, 8))::BIGINT % {_ALS_P})"
# Closed-form regularized 2x2 solve, shared between the user and item
# half-sweeps (identical expression TEXT on both engines so the IEEE op
# order is identical): sums s11/s12/s22 are exact integers in 1e-6
# units, rhs p1/p2 in 1e-3*r units, lambda=0.1 -> +100000 on the
# diagonal; factors clamped to [-1000, 1000] and quantized to exact
# milli-units.
_ALS_DET = "(({s11} + 100000) * 1.0 * ({s22} + 100000) - {s12} * 1.0 * {s12})"
_ALS_U1 = (
    "CAST(round(least(greatest(((({s22} + 100000) * 1.0 * ({p1} * 1000) "
    "- {s12} * 1.0 * ({p2} * 1000)) / " + _ALS_DET + "), -1000.0), 1000.0) "
    "* 1000.0) AS BIGINT)"
)
_ALS_U2 = (
    "CAST(round(least(greatest(((({s11} + 100000) * 1.0 * ({p2} * 1000) "
    "- {s12} * 1.0 * ({p1} * 1000)) / " + _ALS_DET + "), -1000.0), 1000.0) "
    "* 1000.0) AS BIGINT)"
)


@register(
    "q_als_sweep",
    oracle=f"""
WITH r AS MATERIALIZED (
    SELECT o_custkey AS u, l_partkey AS i,
           CAST(round(sum(l_quantity)) AS BIGINT) AS rt
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
f0 AS MATERIALIZED (
    SELECT i,
           {_ALS_MD5.format(x="'als1:' || CAST(i AS VARCHAR)")} % 1000 AS m1,
           {_ALS_MD5.format(x="'als2:' || CAST(i AS VARCHAR)")} % 1000 AS m2
    FROM (SELECT DISTINCT i FROM r)
),
us AS (
    SELECT u, sum(m1 * m1) AS s11, sum(m1 * m2) AS s12, sum(m2 * m2) AS s22,
           sum(m1 * rt) AS p1, sum(m2 * rt) AS p2
    FROM r JOIN f0 USING (i) GROUP BY u
),
uf AS MATERIALIZED (
    SELECT u,
           {_ALS_U1.format(s11="s11", s12="s12", s22="s22", p1="p1", p2="p2")} AS u1q,
           {_ALS_U2.format(s11="s11", s12="s12", s22="s22", p1="p1", p2="p2")} AS u2q
    FROM us
),
its AS (
    SELECT i, sum(u1q * u1q) AS t11, sum(u1q * u2q) AS t12,
           sum(u2q * u2q) AS t22, sum(u1q * rt) AS q1, sum(u2q * rt) AS q2
    FROM r JOIN uf USING (u) GROUP BY i
),
f1 AS MATERIALIZED (
    SELECT i,
           {_ALS_U1.format(s11="t11", s12="t12", s22="t22", p1="q1", p2="q2")} AS g1q,
           {_ALS_U2.format(s11="t11", s12="t12", s22="t22", p1="q1", p2="q2")} AS g2q
    FROM its
),
e0 AS (
    SELECT CAST(sum(CAST(round(((u1q * 1.0 * m1 + u2q * 1.0 * m2) / 1000000.0 - rt)
                               * ((u1q * 1.0 * m1 + u2q * 1.0 * m2) / 1000000.0 - rt)
                               * 1000.0) AS BIGINT)) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM r JOIN uf USING (u) JOIN f0 USING (i)
),
e1 AS (
    SELECT CAST(sum(CAST(round(((u1q * 1.0 * g1q + u2q * 1.0 * g2q) / 1000000.0 - rt)
                               * ((u1q * 1.0 * g1q + u2q * 1.0 * g2q) / 1000000.0 - rt)
                               * 1000.0) AS BIGINT)) AS BIGINT) AS s
    FROM r JOIN uf USING (u) JOIN f1 USING (i)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM uf) AS n_users,
       (SELECT CAST(count(*) AS BIGINT) FROM f0) AS n_items,
       (SELECT n FROM e0) AS n_ratings,
       (round(sqrt((SELECT s FROM e0) / ((SELECT n FROM e0) * 1000.0))
              * 1000000.0) / 1000000.0) AS rmse_init,
       (round(sqrt((SELECT s FROM e1) / ((SELECT n FROM e0) * 1000.0))
              * 1000000.0) / 1000000.0) AS rmse_after
""",
    description=(
        "One ALS sweep of a rank-2 matrix factorization of the "
        "customer x part quantity matrix: deterministic hash-seeded "
        "item factors, closed-form regularized 2x2 normal-equation "
        "solve per user (lambda=0.1), then the symmetric item "
        "half-sweep against the solved users, with train RMSE before/ "
        "after proving the sweep descends. THE collaborative-filtering "
        "training primitive — each half-sweep is one groupBy over the "
        "ratings joined to the (broadcastable) opposite-side factors, "
        "exactly how distributed ALS iterates at any scale. Every "
        "Gram/moment sum folds in EXACT integer milli-unit arithmetic "
        "(no float summation order anywhere); the solves and RMSEs are "
        "single deterministic float expressions with identical text on "
        "both engines, factors clamped to +-1000 and re-quantized to "
        "milli-units between half-sweeps so every cross-engine product "
        "stays integer-exact. BIGINT holds the Gram mass to ~300 "
        "ratings/row-key at these magnitudes; DECIMAL(38) is the "
        "documented 100x headroom swap."
    ),
    tags=("mlops", "extension", "recsys"),
)
def q_als_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    r = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("rt"))
    ).localCheckpoint(eager=True)

    def h31(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.col("i").cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _ALS_P
        )

    f0 = r.select("i").distinct().select(
        "i", (h31("als1:") % 1000).alias("m1"), (h31("als2:") % 1000).alias("m2")
    )

    def solve(s11, s12, s22, p1, p2):
        det = (s11 + 100000) * 1.0 * (s22 + 100000) - s12 * 1.0 * s12
        x1 = ((s22 + 100000) * 1.0 * (p1 * 1000) - s12 * 1.0 * (p2 * 1000)) / det
        x2 = ((s11 + 100000) * 1.0 * (p2 * 1000) - s12 * 1.0 * (p1 * 1000)) / det
        clamp = lambda c: F.round(
            F.least(F.greatest(c, F.lit(-1000.0)), F.lit(1000.0)) * 1000.0
        ).cast("long")
        return clamp(x1), clamp(x2)

    us = (
        r.join(f0, "i")
        .groupBy("u")
        .agg(
            F.sum(F.col("m1") * F.col("m1")).alias("s11"),
            F.sum(F.col("m1") * F.col("m2")).alias("s12"),
            F.sum(F.col("m2") * F.col("m2")).alias("s22"),
            F.sum(F.col("m1") * F.col("rt")).alias("p1"),
            F.sum(F.col("m2") * F.col("rt")).alias("p2"),
        )
    )
    u1, u2 = solve(F.col("s11"), F.col("s12"), F.col("s22"), F.col("p1"), F.col("p2"))
    uf = us.select("u", u1.alias("u1q"), u2.alias("u2q")).localCheckpoint(eager=True)
    its = (
        r.join(uf, "u")
        .groupBy("i")
        .agg(
            F.sum(F.col("u1q") * F.col("u1q")).alias("t11"),
            F.sum(F.col("u1q") * F.col("u2q")).alias("t12"),
            F.sum(F.col("u2q") * F.col("u2q")).alias("t22"),
            F.sum(F.col("u1q") * F.col("rt")).alias("q1"),
            F.sum(F.col("u2q") * F.col("rt")).alias("q2"),
        )
    )
    g1, g2 = solve(F.col("t11"), F.col("t12"), F.col("t22"), F.col("q1"), F.col("q2"))
    f1 = its.select("i", g1.alias("g1q"), g2.alias("g2q"))

    def sqerr(fa, fb):
        pred = (F.col("u1q") * 1.0 * F.col(fa) + F.col("u2q") * 1.0 * F.col(fb)) / 1000000.0
        return F.round((pred - F.col("rt")) * (pred - F.col("rt")) * 1000.0).cast("long")

    e0 = (
        r.join(uf, "u")
        .join(f0, "i")
        .agg(
            F.sum(sqerr("m1", "m2")).cast("long").alias("s0"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    e1 = (
        r.join(uf, "u")
        .join(f1, "i")
        .agg(F.sum(sqerr("g1q", "g2q")).cast("long").alias("s1"))
    )
    nu = uf.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    ni = f0.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    return (
        nu.crossJoin(F.broadcast(ni))
        .crossJoin(F.broadcast(e0))
        .crossJoin(F.broadcast(e1))
        .select(
            "n_users",
            "n_items",
            F.col("n").alias("n_ratings"),
            stable_round(F.sqrt(F.col("s0") / (F.col("n") * 1000.0)), 6).alias(
                "rmse_init"
            ),
            stable_round(F.sqrt(F.col("s1") / (F.col("n") * 1000.0)), 6).alias(
                "rmse_after"
            ),
        )
    )


@register(
    "q_negative_sampling",
    oracle=f"""
WITH pos AS MATERIALIZED (
    SELECT DISTINCT o_custkey AS u, l_partkey AS i
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
items AS (
    SELECT i, row_number() OVER (ORDER BY i) AS pos_idx
    FROM (SELECT DISTINCT i FROM pos)
),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM items),
samp AS (
    SELECT u, i, j,
           {_ALS_MD5.format(x="'neg:' || CAST(u AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
               % (SELECT n_items FROM ni) + 1 AS idx
    FROM pos CROSS JOIN (SELECT unnest(range(4)) AS j)
    WHERE u % 100 = 7
),
mapped AS (
    SELECT s.u, s.i AS pos_item, CAST(s.j AS BIGINT) AS j,
           items.i AS neg_item
    FROM samp s JOIN items ON items.pos_idx = s.idx
)
SELECT m.u, m.pos_item, m.j, m.neg_item
FROM mapped m
LEFT JOIN pos p ON p.u = m.u AND p.i = m.neg_item
WHERE p.i IS NULL
ORDER BY m.u, m.pos_item, m.j
""",
    description=(
        "Deterministic uniform negative sampling for implicit-feedback "
        "training: for each (customer, part) positive (2% user shard), "
        "4 candidate negatives drawn by salted md5 over a DENSE item "
        "index — the index is bucketed_rank's two-phase carry over the "
        "distinct item set (partkey div 4096 buckets), so sampling "
        "uniformly over item IDs works no matter how sparse or skewed "
        "the raw key space is. Sampled items that collide with a true "
        "positive are removed by an anti-join (the standard correction; "
        "deterministic here, so both engines drop the same rows). "
        "Hash-seeded => reproducible across epochs and resumable "
        "mid-shard; the idx join is a uniform-key equi-join. The "
        "epoch-varying form salts with the epoch number."
    ),
    tags=("mlops", "extension", "recsys", "scale-pattern"),
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pos = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
    ).localCheckpoint(eager=True)
    items = bucketed_rank(
        pos.select("i").distinct(),
        buckets=[F.expr("i div 4096")],
        order_by=[F.asc("i")],
        out_col="pos_idx",
    )
    ni = items.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    j_grid = spark.range(4).select(F.col("id").alias("j"))
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("neg:"),
                        F.col("u").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _ALS_P
    )
    samp = (
        pos.filter(F.col("u") % 100 == 7)
        .crossJoin(F.broadcast(j_grid))
        .crossJoin(F.broadcast(ni))
        .select("u", "i", "j", (h % F.col("n_items") + 1).alias("idx"))
    )
    mapped = samp.join(
        items.select(F.col("i").alias("neg_item"), F.col("pos_idx")),
        samp.idx == F.col("pos_idx"),
    ).select(
        "u", F.col("i").alias("pos_item"), F.col("j").cast("long").alias("j"), "neg_item"
    )
    return (
        mapped.join(
            pos.select(F.col("u").alias("pu"), F.col("i").alias("pi")),
            (F.col("u") == F.col("pu")) & (F.col("neg_item") == F.col("pi")),
            "left_anti",
        )
        .select("u", "pos_item", "j", "neg_item")
        .orderBy("u", "pos_item", "j")
    )


def _isoforest_oracle_sql(levels: int = 5, trees: int = 4) -> str:
    """Unrolled isolation-forest levels: per (tree, node) min/max stats
    feed an integer-scaled random cut (md5-derived fraction in units of
    1e-4), so every split comparison is exact integer arithmetic."""
    h = (
        f"(('0x' || substring(md5('iso:' || CAST(a.t AS VARCHAR) || ':' || "
        f"CAST({{lvl}} AS VARCHAR) || ':' || CAST(a.node AS VARCHAR)), 1, 8))"
        f"::BIGINT % 2147483647) % 10000"
    )
    parts = [
        """u AS MATERIALIZED (
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS v
    FROM events GROUP BY user_id
)""",
        "a0 AS (SELECT user_id, v, t, CAST(0 AS BIGINT) AS node "
        "FROM u CROSS JOIN (SELECT unnest(range(%d)) AS t))" % trees,
    ]
    for lvl in range(levels):
        parts.append(
            f"""s{lvl} AS (
    SELECT t, node, CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx
    FROM a{lvl} GROUP BY t, node
)"""
        )
        parts.append(
            f"""a{lvl + 1} AS (
    SELECT a.user_id, a.v, a.t,
           a.node * 2 + (CASE WHEN a.v * 10000
                > s.mn * 10000 + ({h.format(lvl=lvl)}) * (s.mx - s.mn)
                THEN 1 ELSE 0 END) AS node
    FROM a{lvl} a JOIN s{lvl} s ON s.t = a.t AND s.node = a.node
)"""
        )
    final = f"a{levels}"
    return (
        "WITH " + ",\n".join(parts) + f""",
leaf AS (
    SELECT t, node, CAST(count(*) AS BIGINT) AS pop FROM {final} GROUP BY t, node
),
sc AS (
    SELECT a.user_id, max(a.v) AS v, CAST(sum(leaf.pop) AS BIGINT) AS sum_pop
    FROM {final} a JOIN leaf ON leaf.t = a.t AND leaf.node = a.node
    GROUP BY a.user_id
)
SELECT user_id, v AS purchase_cents, sum_pop,
       (round((sum_pop / {float(trees)}) * 1000000.0) / 1000000.0) AS iso_score
FROM sc
ORDER BY sum_pop ASC, user_id ASC
LIMIT 15"""
    )


@register(
    "q_isolation_forest",
    oracle=_isoforest_oracle_sql(),
    description=(
        "Deterministic isolation forest (4 trees x 5 levels) over "
        "per-user purchase value: each level splits every (tree, node) "
        "population at a random cut mn + U*(mx-mn), with U drawn in "
        "exact 1e-4 units from md5(tree, level, node) so the split "
        "comparison v*10000 > mn*10000 + u*(mx-mn) is pure integer "
        "arithmetic — no float anywhere in the tree construction. "
        "Users landing in small leaves are the anomalies (top-15 by "
        "mean leaf population): the ensemble flavor of outlier "
        "detection the distance-based (Mahalanobis/MAD) queries can't "
        "express, and the shape matches distributed iForest exactly — "
        "per level one hash agg for node stats (broadcastable: <= "
        "trees*2^level rows) and one broadcast join back. Oracle: 5 "
        "unrolled levels."
    ),
    tags=("mlops", "extension", "anomaly"),
)
def q_isolation_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    trees, levels = 4, 5
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("v")
    )
    a = u.crossJoin(
        F.broadcast(spark.range(trees).select(F.col("id").alias("t")))
    ).select("user_id", "v", "t", F.lit(0).cast("long").alias("node"))
    for lvl in range(levels):
        s = a.groupBy("t", "node").agg(
            F.min("v").cast("long").alias("mn"), F.max("v").cast("long").alias("mx")
        )
        hfrac = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("iso:"),
                            F.col("t").cast("string"),
                            F.lit(f":{lvl}:"),
                            F.col("node").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2147483647
        ) % 10000
        a = (
            a.join(F.broadcast(s), ["t", "node"])
            .select(
                "user_id",
                "v",
                "t",
                (
                    F.col("node") * 2
                    + F.when(
                        F.col("v") * 10000
                        > F.col("mn") * 10000 + hfrac * (F.col("mx") - F.col("mn")),
                        1,
                    ).otherwise(0)
                ).alias("node"),
            )
        )
    leaf = a.groupBy("t", "node").agg(F.count(F.lit(1)).cast("long").alias("pop"))
    sc = (
        a.join(F.broadcast(leaf), ["t", "node"])
        .groupBy("user_id")
        .agg(
            F.max("v").alias("v"),
            F.sum("pop").cast("long").alias("sum_pop"),
        )
    )
    return (
        sc.select(
            "user_id",
            F.col("v").alias("purchase_cents"),
            "sum_pop",
            stable_round(F.col("sum_pop") / float(trees), 6).alias("iso_score"),
        )
        .orderBy(F.asc("sum_pop"), F.asc("user_id"))
        .limit(15)
    )


@register(
    "q_recsys_diversity_eval",
    oracle="""
WITH basket AS MATERIALIZED (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
ub AS MATERIALIZED (
    SELECT DISTINCT o_custkey AS u, l_partkey AS pk
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey % 50 = 3
),
n_i AS MATERIALIZED (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM basket GROUP BY pk),
no_ AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM basket),
np_ AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM n_i),
cooc AS MATERIALIZED (
    SELECT part_a, part_b,
           CAST(round((n_ab / sqrt(na * 1.0 * nb)) * 1000000.0) AS BIGINT)
               AS sim_q
    FROM (
        SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_ab
        FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2
    )
    JOIN (SELECT pk, n AS na FROM n_i) x ON x.pk = part_a
    JOIN (SELECT pk, n AS nb FROM n_i) y ON y.pk = part_b
),
sims AS MATERIALIZED (
    SELECT part_a AS i, part_b AS j, sim_q FROM cooc
    UNION ALL SELECT part_b, part_a, sim_q FROM cooc
),
scored AS (
    SELECT ub.u, s.j, CAST(sum(s.sim_q) AS BIGINT) AS score_q
    FROM ub JOIN sims s ON s.i = ub.pk
    WHERE NOT EXISTS (SELECT 1 FROM ub o WHERE o.u = ub.u AND o.pk = s.j)
    GROUP BY 1, 2
),
recs AS MATERIALIZED (
    SELECT u, j, score_q FROM (
        SELECT *, row_number() OVER (PARTITION BY u
                   ORDER BY score_q DESC, j ASC) AS rk
        FROM scored
    ) WHERE rk <= 3
),
cov AS (
    SELECT CAST(count(DISTINCT j) AS BIGINT) AS n_rec_items,
           CAST(count(*) AS BIGINT) AS n_recs,
           CAST(count(DISTINCT u) AS BIGINT) AS n_users
    FROM recs
),
nov AS (
    SELECT CAST(sum(CAST(round(-ln(n_i.n * 1.0 / (SELECT n_orders FROM no_))
                               * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS c
    FROM recs JOIN n_i ON n_i.pk = recs.j
),
ils AS (
    SELECT CAST(sum(coalesce(cooc.sim_q, 0)) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS c
    FROM recs a JOIN recs b ON a.u = b.u AND a.j < b.j
    LEFT JOIN cooc ON cooc.part_a = a.j AND cooc.part_b = b.j
)
SELECT cov.n_users, cov.n_recs, cov.n_rec_items,
       (round((cov.n_rec_items * 1.0 / (SELECT n_parts FROM np_))
              * 1000000.0) / 1000000.0) AS catalog_coverage,
       (round((nov.s / (nov.c * 1000000.0)) * 1000000.0) / 1000000.0)
           AS mean_novelty,
       (round((ils.s / (ils.c * 1000000.0)) * 1000000.0) / 1000000.0)
           AS mean_intra_list_sim
FROM cov CROSS JOIN nov CROSS JOIN ils
""",
    description=(
        "Beyond-accuracy recommender evaluation of the item-item CF "
        "scorer: top-3 recommendations per user (2% user shard, "
        "already-purchased items excluded via anti-join), then the "
        "three metrics accuracy evals miss — catalog coverage "
        "(distinct recommended / catalog), mean novelty "
        "(-ln popularity, the inverse-log-pop self-information), and "
        "mean intra-list similarity (pairwise CF cosine within each "
        "user's list; high = filter-bubble lists). Pair similarities "
        "are quantized to micro-units before every sum, so scoring, "
        "novelty and ILS all fold as exact integers. Scoring joins "
        "the shard's profile items against the symmetric similarity "
        "table (shuffle on item id); per-user top-3 rides the "
        "partitioned WindowGroupLimit; the ILS pair join is 3 rows "
        "per user."
    ),
    tags=("mlops", "extension", "recsys"),
)
def q_recsys_diversity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    basket = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct().localCheckpoint(eager=True)
    ub = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_custkey") % 50 == 3)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("pk"))
        .distinct()
    ).localCheckpoint(eager=True)
    n_i = basket.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("n"))
    no_ = basket.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    np_ = n_i.agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    cooc_raw = (
        basket.alias("a")
        .join(
            basket.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    cooc = (
        cooc_raw.join(n_i.select(F.col("pk").alias("part_a"), F.col("n").alias("na")), "part_a")
        .join(n_i.select(F.col("pk").alias("part_b"), F.col("n").alias("nb")), "part_b")
        .select(
            "part_a",
            "part_b",
            F.round(
                (F.col("n_ab") / F.sqrt(F.col("na") * 1.0 * F.col("nb"))) * 1000000.0
            )
            .cast("long")
            .alias("sim_q"),
        )
    ).localCheckpoint(eager=True)
    sims = cooc.select(
        F.col("part_a").alias("i"), F.col("part_b").alias("j"), "sim_q"
    ).unionAll(
        cooc.select(F.col("part_b").alias("i"), F.col("part_a").alias("j"), "sim_q")
    )
    scored = (
        ub.join(sims, ub.pk == sims.i)
        .join(
            ub.select(F.col("u").alias("ou"), F.col("pk").alias("oj")),
            (F.col("u") == F.col("ou")) & (F.col("j") == F.col("oj")),
            "left_anti",
        )
        .groupBy("u", "j")
        .agg(F.sum("sim_q").cast("long").alias("score_q"))
    )
    w = Window.partitionBy("u").orderBy(F.desc("score_q"), F.asc("j"))
    recs = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("u", "j", "score_q")
    ).localCheckpoint(eager=True)
    cov = recs.agg(
        F.countDistinct("u").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_recs"),
        F.countDistinct("j").cast("long").alias("n_rec_items"),
    )
    nov = (
        recs.join(n_i, recs.j == n_i.pk)
        .crossJoin(F.broadcast(no_))
        .agg(
            F.sum(
                F.round(
                    -F.log(F.col("n") * 1.0 / F.col("n_orders")) * 1000000.0
                ).cast("long")
            )
            .cast("long")
            .alias("nov_s"),
            F.count(F.lit(1)).cast("long").alias("nov_c"),
        )
    )
    ils = (
        recs.alias("a")
        .join(recs.alias("b"), (F.col("a.u") == F.col("b.u")) & (F.col("a.j") < F.col("b.j")))
        .join(
            cooc,
            (cooc.part_a == F.col("a.j")) & (cooc.part_b == F.col("b.j")),
            "left",
        )
        .agg(
            F.sum(F.coalesce("sim_q", F.lit(0))).cast("long").alias("ils_s"),
            F.count(F.lit(1)).cast("long").alias("ils_c"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(nov))
        .crossJoin(F.broadcast(ils))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_users",
            "n_recs",
            "n_rec_items",
            stable_round(F.col("n_rec_items") * 1.0 / F.col("n_parts"), 6).alias(
                "catalog_coverage"
            ),
            stable_round(F.col("nov_s") / (F.col("nov_c") * 1000000.0), 6).alias(
                "mean_novelty"
            ),
            stable_round(F.col("ils_s") / (F.col("ils_c") * 1000000.0), 6).alias(
                "mean_intra_list_sim"
            ),
        )
    )


@register(
    "q_cold_start_fallback",
    oracle="""
WITH ub AS (
    SELECT o_custkey AS u, l_partkey AS pk
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
depth AS (SELECT u, CAST(count(*) AS BIGINT) AS n_items FROM ub GROUP BY u),
cold AS (
    SELECT u, n_items FROM (
        SELECT u, n_items, row_number() OVER (ORDER BY n_items, u) AS crk
        FROM depth
    ) WHERE crk <= 20
),
pop AS (
    SELECT pk, CAST(count(*) AS BIGINT) AS n_buyers,
           row_number() OVER (ORDER BY count(*) DESC, pk ASC) AS rk
    FROM ub GROUP BY pk
),
top5 AS (SELECT pk, n_buyers, CAST(rk AS BIGINT) AS rk FROM pop WHERE rk <= 5),
recs AS (
    SELECT c.u, c.n_items, t.pk, t.n_buyers, t.rk
    FROM cold c CROSS JOIN top5 t
    WHERE NOT EXISTS (SELECT 1 FROM ub o WHERE o.u = c.u AND o.pk = t.pk)
),
rr AS (
    SELECT u, n_items, pk, n_buyers,
           row_number() OVER (PARTITION BY u ORDER BY rk) AS pos
    FROM recs
)
SELECT u AS user_id, n_items AS profile_size, CAST(pos AS BIGINT) AS pos,
       pk AS part_id, n_buyers
FROM rr WHERE pos <= 3
ORDER BY user_id, pos
""",
    description=(
        "Cold-start recommendation fallback: the 20 thinnest user "
        "profiles (fewest distinct purchased items) get the top-3 "
        "most-bought catalog items they don't already own — the path "
        "every personalized recommender needs for new users, where "
        "the CF scorer (q_item_item_cf / q_recsys_diversity_eval) has "
        "no signal. Popularity is one hash agg; the top-5 candidate "
        "list is a WindowGroupLimit-truncated broadcast; exclusion is "
        "an anti-join on the user's own items; per-user top-3 "
        "re-ranks the <=5 survivors. In production the profile-size "
        "gate routes users between this and the CF path — both live "
        "in this registry."
    ),
    tags=("mlops", "extension", "recsys"),
)
def q_cold_start_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ub = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("pk"))
        .distinct()
    ).localCheckpoint(eager=True)
    depth = ub.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    wc = Window.orderBy(F.asc("n_items"), F.asc("u"))
    cold = (
        depth.withColumn("crk", F.row_number().over(wc))
        .filter(F.col("crk") <= 20)
        .select("u", "n_items")
    )
    wpop = Window.orderBy(F.desc("n_buyers"), F.asc("pk"))
    pop = ub.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("n_buyers"))
    top5 = (
        pop.withColumn("rk", F.row_number().over(wpop).cast("long"))
        .filter(F.col("rk") <= 5)
    )
    recs = (
        cold.crossJoin(F.broadcast(top5))
        .join(
            ub.select(F.col("u").alias("ou"), F.col("pk").alias("opk")),
            (F.col("u") == F.col("ou")) & (F.col("pk") == F.col("opk")),
            "left_anti",
        )
    )
    wpos = Window.partitionBy("u").orderBy("rk")
    return (
        recs.withColumn("pos", F.row_number().over(wpos).cast("long"))
        .filter(F.col("pos") <= 3)
        .select(
            F.col("u").alias("user_id"),
            F.col("n_items").alias("profile_size"),
            "pos",
            F.col("pk").alias("part_id"),
            "n_buyers",
        )
        .orderBy("user_id", "pos")
    )


@register(
    "q_dp_topk_exponential",
    oracle=f"""
WITH cnt AS (
    SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS c FROM lineitem
    GROUP BY 1
),
noisy AS (
    SELECT pk, c,
           (round((0.5 * c - 2.0 * ln(-ln(
                ((('0x' || substring(md5('dpk-v1:' || CAST(pk AS VARCHAR)), 1, 8))
                  ::BIGINT % 2147483647) + 1.0) / 2147483648.0)))
               * 1000000.0) / 1000000.0) AS nscore
    FROM cnt
),
win AS (
    SELECT pk, c, nscore, nr FROM (
        SELECT pk, c, nscore,
               row_number() OVER (ORDER BY nscore DESC, pk) AS nr
        FROM noisy
    ) WHERE nr <= 10
)
SELECT CAST(w.nr AS BIGINT) AS noisy_rank, w.pk AS part_id, w.c AS true_count,
       w.nscore AS noisy_score,
       CAST(1 + sum(CASE WHEN o.c > w.c OR (o.c = w.c AND o.pk < w.pk)
                    THEN 1 ELSE 0 END) AS BIGINT) AS true_rank
FROM win w CROSS JOIN cnt o
GROUP BY w.nr, w.pk, w.c, w.nscore
ORDER BY noisy_rank
""",
    description=(
        "Differentially-private top-k selection by the exponential "
        "mechanism in its Gumbel-noise formulation: noisy_score = "
        "(eps/2)*count + Gumbel(scale=2), argtop-10 parts, with the "
        "true ranks reported alongside so the privacy/utility rank "
        "displacement is visible. Gumbel draws are -ln(-ln(U)) with U "
        "from counter-based md5 (the q_dp_histogram discipline), so "
        "both engines realize the SAME mechanism run and the query "
        "stays value-hash-checkable while demonstrating one-shot "
        "DP top-k (joint eps, not k sequential mechanisms). One hash "
        "agg + one WindowGroupLimit-truncated rank; the reported "
        "true ranks come from a broadcast dominance count over the "
        "10 winners, never a global sort of the catalog."
    ),
    tags=("mlops", "extension", "privacy"),
)
def q_dp_topk_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from healthcare_etl_spark.functions.rounding import stable_round

    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dpk-v1:"), F.col("pk").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2147483647
        + 1.0
    ) / 2147483648.0
    nscore = stable_round(0.5 * F.col("c") - 2.0 * F.log(-F.log(u)), 6)
    noisy = cnt.select("pk", "c", nscore.alias("nscore"))
    wnr = Window.orderBy(F.desc("nscore"), F.asc("pk"))
    win = (
        noisy.withColumn("noisy_rank", F.row_number().over(wnr).cast("long"))
        .filter(F.col("noisy_rank") <= 10)
    )
    o = cnt.select(F.col("pk").alias("opk"), F.col("c").alias("oc"))
    before = F.when(
        (F.col("oc") > F.col("c"))
        | ((F.col("oc") == F.col("c")) & (F.col("opk") < F.col("pk"))),
        1,
    ).otherwise(0)
    return (
        F.broadcast(win)
        .crossJoin(o)
        .groupBy("noisy_rank", "pk", "c", "nscore")
        .agg((1 + F.sum(before)).cast("long").alias("true_rank"))
        .select(
            "noisy_rank",
            F.col("pk").alias("part_id"),
            F.col("c").alias("true_count"),
            F.col("nscore").alias("noisy_score"),
            "true_rank",
        )
        .orderBy("noisy_rank")
    )


# ---------------------------------------------------------------------------
# DeLong confidence interval for ROC-AUC (round-6 continuation-5)


def _auc_delong_oracle() -> str:
    from healthcare_etl_spark.operators.logistic import irls_beta_ctes

    parts, final = irls_beta_ctes(_logistic_features_sql(), rounds=4)
    joined = ",\n".join(parts)
    return f"""WITH {joined},
scored AS (
    SELECT y,
           (round((1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2)))) * 1000000.0)
            / 1000000.0) AS p
    FROM feat CROSS JOIN {final} b
),
grp AS (
    SELECT p, CAST(count(*) AS BIGINT) AS t,
           CAST(sum(y) AS BIGINT) AS t_pos,
           CAST(count(*) - sum(y) AS BIGINT) AS t_neg
    FROM scored GROUP BY p
),
ranked AS (
    SELECT p, t_pos, t_neg,
           CAST(coalesce(sum(t_neg) OVER (ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cnb,
           CAST(coalesce(sum(t_pos) OVER (ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cpb
    FROM grp
),
tot AS (
    SELECT CAST(sum(t_pos) AS BIGINT) AS m_pos,
           CAST(sum(t_neg) AS BIGINT) AS n_neg
    FROM grp
),
place AS (
    SELECT r.t_pos, r.t_neg,
           (2 * r.cnb + r.t_neg) AS v,
           (2 * (t.m_pos - r.cpb - r.t_pos) + r.t_pos) AS u,
           t.m_pos, t.n_neg
    FROM ranked r CROSS JOIN tot t
),
mom AS (
    SELECT any_value(m_pos) AS m_pos, any_value(n_neg) AS n_neg,
           CAST(sum(t_pos * v) AS BIGINT) AS sv,
           sum(CAST(t_pos AS HUGEINT) * v * v) AS svv,
           CAST(sum(t_neg * u) AS BIGINT) AS su,
           sum(CAST(t_neg AS HUGEINT) * u * u) AS suu
    FROM place
),
stats AS (
    SELECT m_pos, n_neg,
           (sv / (2.0 * m_pos * n_neg)) AS auc,
           ((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv / m_pos)
            / (m_pos - 1.0) / (4.0 * n_neg * n_neg)) AS s10,
           ((CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * su / n_neg)
            / (n_neg - 1.0) / (4.0 * m_pos * m_pos)) AS s01
    FROM mom
)
SELECT m_pos AS n_pos, n_neg,
       (round(auc * 1000000.0) / 1000000.0) AS auc,
       (round(sqrt(s10 / m_pos + s01 / n_neg) * 1000000.0) / 1000000.0)
           AS se_delong,
       (round(greatest(0.0, auc - 1.959964 * sqrt(s10 / m_pos + s01 / n_neg))
              * 1000000.0) / 1000000.0) AS ci_lo,
       (round(least(1.0, auc + 1.959964 * sqrt(s10 / m_pos + s01 / n_neg))
              * 1000000.0) / 1000000.0) AS ci_hi
FROM stats
""".strip()


def _register_auc_delong() -> None:
    @register(
        "q_auc_delong_ci",
        oracle=_auc_delong_oracle(),
        description=(
            "DeLong (1988) standard error and 95% CI for the IRLS "
            "model's ROC-AUC via the placement formulation: each "
            "positive's placement V10 = fraction of negatives scored "
            "below it (ties half-weighted), each negative's V01 "
            "symmetric; var(AUC) = S10/m + S01/n — the inference layer "
            "q_roc_auc's point estimate needs before anyone compares "
            "two models. Placements are constant within a distinct "
            "score, so the whole computation lives on the bounded "
            "distinct-score table: placement numerators are exact "
            "half-unit integers (2*below + ties), both variance folds "
            "are HUGEINT/DECIMAL(38) weighted integer moments, and the "
            "two cumulative counts ride the same bucketed two-phase "
            "carry as q_roc_auc (micro-prob div-4096 summary — no "
            "single-partition sort)."
        ),
        tags=("analytics", "extension", "stats", "ml"),
    )
    def q_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
        from healthcare_etl_spark.operators.logistic import logistic_fit
        from healthcare_etl_spark.operators.scale import bucketed_prefix

        ev = load_table(spark, sf_dir, "events")
        features = ev.groupBy("user_id").agg(
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).alias("x1"),
            F.log(
                F.lit(1.0)
                + F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            ).alias("x2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        ).persist()
        try:
            b0, b1, b2 = logistic_fit(features, rounds=4)
            eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
            pm = F.round(
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))) * 1000000.0
            ).cast("long")
            grp = (
                features.select(pm.alias("pm"), "y")
                .groupBy("pm")
                .agg(
                    F.count(F.lit(1)).alias("t"),
                    F.sum("y").cast("long").alias("t_pos"),
                )
                .select(
                    "pm",
                    "t_pos",
                    (F.col("t") - F.col("t_pos")).cast("long").alias("t_neg"),
                )
            )
            r1 = bucketed_prefix(
                grp,
                buckets=[F.expr("pm div 4096")],
                order_by=[F.col("pm")],
                value=F.col("t_neg"),
                agg="sum",
                exclusive=True,
                out_col="cnb",
            )
            ranked = bucketed_prefix(
                r1,
                buckets=[F.expr("pm div 4096")],
                order_by=[F.col("pm")],
                value=F.col("t_pos"),
                agg="sum",
                exclusive=True,
                out_col="cpb",
            ).select(
                "t_pos",
                "t_neg",
                F.col("cnb").cast("long").alias("cnb"),
                F.col("cpb").cast("long").alias("cpb"),
            )
            tot = grp.agg(
                F.sum("t_pos").cast("long").alias("m_pos"),
                F.sum("t_neg").cast("long").alias("n_neg"),
            )
            place = ranked.crossJoin(F.broadcast(tot)).select(
                "t_pos",
                "t_neg",
                (2 * F.col("cnb") + F.col("t_neg")).alias("v"),
                (
                    2 * (F.col("m_pos") - F.col("cpb") - F.col("t_pos"))
                    + F.col("t_pos")
                ).alias("u"),
                "m_pos",
                "n_neg",
            )
            dec = "decimal(38,0)"
            mom = place.agg(
                F.first("m_pos").alias("m_pos"),
                F.first("n_neg").alias("n_neg"),
                F.sum(F.col("t_pos") * F.col("v")).cast("long").alias("sv"),
                F.sum(F.col("t_pos").cast(dec) * F.col("v").cast(dec) * F.col("v").cast(dec)).alias("svv"),
                F.sum(F.col("t_neg") * F.col("u")).cast("long").alias("su"),
                F.sum(F.col("t_neg").cast(dec) * F.col("u").cast(dec) * F.col("u").cast(dec)).alias("suu"),
            )
            m_pos, n_neg = F.col("m_pos"), F.col("n_neg")
            auc = F.col("sv") / (2.0 * m_pos * n_neg)
            s10 = (
                (F.col("svv").cast("double") - F.col("sv").cast("double") * F.col("sv") / m_pos)
                / (m_pos - 1.0)
                / (4.0 * n_neg * n_neg)
            )
            s01 = (
                (F.col("suu").cast("double") - F.col("su").cast("double") * F.col("su") / n_neg)
                / (n_neg - 1.0)
                / (4.0 * m_pos * m_pos)
            )
            se = F.sqrt(s10 / m_pos + s01 / n_neg)
            out = mom.select(
                m_pos.alias("n_pos"),
                n_neg.alias("n_neg"),
                stable_round(auc, 6).alias("auc"),
                stable_round(se, 6).alias("se_delong"),
                stable_round(F.greatest(F.lit(0.0), auc - 1.959964 * se), 6).alias("ci_lo"),
                stable_round(F.least(F.lit(1.0), auc + 1.959964 * se), 6).alias("ci_hi"),
            )
            return out
        finally:
            features.unpersist()


_register_auc_delong()
