"""Third statistics extension module: distributional normality (Jarque-
Bera), heteroscedasticity (Breusch-Pagan LM), structural break (Chow F),
multicollinearity (variance inflation factors), and Holm step-down
multiple-testing correction.

Extension surface beyond the reference (`etl_app/etl_script.py:74-119`
has only filter/rename/aggregate). Contracts shared with the rest of
the stats family: per-row quantities are quantized to integer units at
the scan so every moment folds as EXACT integer arithmetic (BIGINT, or
DECIMAL(38)/HUGEINT where squares of 1e9-unit values cross 9.2e18 — the
q_price_elasticity discipline); doubles reappear only in the final
textually-mirrored divisions; every emitted double is stable_round-ed.
No partitionless windows over data-scale frames (the one global window,
Holm's step-down, runs over the #hypotheses grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table

_DEC = "decimal(38,0)"

# chi-square / F critical values at alpha=0.05, inlined as literals on
# both engines (no distribution code needed at fixed df).
_CHI2_1_95 = 3.841459
_CHI2_2_95 = 5.991465
_F_2_INF_95 = 2.995732  # = chi2(2)/2 upper bound for large n


@register(
    "q_jarque_bera",
    oracle=f"""
WITH pts AS (
    SELECT o_orderpriority, CAST(round(o_totalprice) AS BIGINT) AS c
    FROM orders
),
mu AS (
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c) AS BIGINT) AS s1
    FROM pts GROUP BY 1
),
dev AS (
    SELECT p.o_orderpriority, m.n,
           CAST(round(p.c - CAST(m.s1 AS DOUBLE) / m.n) AS BIGINT) AS d
    FROM pts p JOIN mu m USING (o_orderpriority)
),
mom AS (
    SELECT o_orderpriority, any_value(n) AS n,
           sum(CAST(d AS HUGEINT) * d) AS s2,
           sum(CAST(d AS HUGEINT) * d * d) AS s3,
           sum(CAST(d AS HUGEINT) * d * d * d) AS s4
    FROM dev GROUP BY 1
),
c AS (
    SELECT o_orderpriority, n,
           (CAST(s2 AS DOUBLE) / n) AS m2,
           (CAST(s3 AS DOUBLE) / n) AS m3,
           (CAST(s4 AS DOUBLE) / n) AS m4
    FROM mom
),
jb AS (
    SELECT o_orderpriority, n,
           (round((m3 / (m2 * sqrt(m2))) * 1000000.0) / 1000000.0) AS skewness,
           (round((m4 / (m2 * m2) - 3.0) * 1000000.0) / 1000000.0) AS ex_kurtosis,
           m2, m3, m4
    FROM c
)
SELECT o_orderpriority, n, skewness, ex_kurtosis,
       (round(((n / 6.0) * (skewness * skewness
              + ex_kurtosis * ex_kurtosis / 4.0)) * 1000000.0) / 1000000.0)
           AS jb_stat,
       ((n / 6.0) * (skewness * skewness + ex_kurtosis * ex_kurtosis / 4.0))
           > {_CHI2_2_95} AS reject_normal
FROM jb
ORDER BY o_orderpriority
""",
    description=(
        "Jarque-Bera normality test per order-priority segment: sample "
        "skewness and excess kurtosis from exact central moments, "
        "JB = n/6*(g1^2 + g2^2/4) vs the chi2(2) 95% critical value. "
        "Two-pass exactness: pass 1 computes each group's exact integer "
        "mean numerator; pass 2 re-scans with the 5-row mean table "
        "broadcast back, quantizes each deviation to a whole-dollar "
        "BIGINT, and folds d^2/d^3/d^4 as exact HUGEINT/DECIMAL(38) "
        "sums (d^3 alone reaches ~1.7e17 per row). Both passes are "
        "partial-aggregated group-bys — no windows, no sorts; at 100 TB "
        "this is two column-pruned scans and a broadcast."
    ),
    tags=("stats", "extension", "parity"),
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice")).cast("long").alias("c"),
    )
    mu = pts.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
    )
    dev = pts.join(F.broadcast(mu), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        F.round(F.col("c") - F.col("s1").cast("double") / F.col("n"))
        .cast("long")
        .alias("d"),
    )
    d = F.col("d").cast(_DEC)
    mom = dev.groupBy("o_orderpriority").agg(
        F.first("n").alias("n"),
        F.sum(d * F.col("d")).alias("s2"),
        F.sum(d * F.col("d") * F.col("d")).alias("s3"),
        F.sum(d * F.col("d") * F.col("d") * F.col("d")).alias("s4"),
    )
    n = F.col("n")
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    m4 = F.col("s4").cast("double") / n
    sk = stable_round(m3 / (m2 * F.sqrt(m2)), 6)
    ku = stable_round(m4 / (m2 * m2) - 3.0, 6)
    out = mom.select(
        "o_orderpriority",
        n.alias("n"),
        sk.alias("skewness"),
        ku.alias("ex_kurtosis"),
    )
    jb = (F.col("n") / 6.0) * (
        F.col("skewness") * F.col("skewness")
        + F.col("ex_kurtosis") * F.col("ex_kurtosis") / 4.0
    )
    return out.select(
        "o_orderpriority",
        "n",
        "skewness",
        "ex_kurtosis",
        stable_round(jb, 6).alias("jb_stat"),
        (jb > _CHI2_2_95).alias("reject_normal"),
    ).orderBy("o_orderpriority")


@register(
    "q_breusch_pagan",
    oracle=f"""
WITH pts AS (
    SELECT CAST(l_quantity AS BIGINT) AS x,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
),
m1 AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           sum(CAST(x AS HUGEINT) * y) AS sxy
    FROM pts
),
fit AS (
    SELECT n, sx, sy, sxx,
           (round((CAST(CAST(n AS HUGEINT) * sxy
                        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT) * sxx
                        - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                  * 1000000.0) / 1000000.0) AS b
    FROM m1
),
fit2 AS (
    SELECT n, b,
           (round(((sy - b * sx) / n) * 1000000.0) / 1000000.0) AS a
    FROM fit
),
res AS (
    SELECT p.x,
           CAST(round((p.y - f.a - f.b * p.x) * (p.y - f.a - f.b * p.x)
                      / 1000000.0) AS BIGINT) AS u
    FROM pts p CROSS JOIN fit2 f
),
m2 AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(u) AS BIGINT) AS su,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           sum(CAST(x AS HUGEINT) * u) AS sxu,
           sum(CAST(u AS HUGEINT) * u) AS suu
    FROM res
),
lm AS (
    SELECT n,
           (CAST(CAST(n AS HUGEINT) * sxu - CAST(sx AS HUGEINT) * su AS DOUBLE))
               AS cv,
           (CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
               AS vx,
           (CAST(CAST(n AS HUGEINT) * suu - CAST(su AS HUGEINT) * su AS DOUBLE))
               AS vu
    FROM m2
)
SELECT f.n AS n_rows, f.b AS slope, f.a AS intercept,
       (round((l.n * (l.cv * l.cv) / (l.vx * l.vu)) * 1000000.0) / 1000000.0)
           AS lm_stat,
       (l.n * (l.cv * l.cv) / (l.vx * l.vu)) > {_CHI2_1_95} AS het_detected
FROM fit2 f CROSS JOIN lm l
""",
    description=(
        "Breusch-Pagan heteroscedasticity test on the price~quantity "
        "OLS: fit y = a + b*x from exact integer moments (price "
        "quantized to cents, HUGEINT/DECIMAL(38) cross products), then "
        "regress the per-row squared residual (quantized back to a "
        "BIGINT unit at the row) on x; LM = n * R^2 of that auxiliary "
        "regression vs chi2(1). Two column-pruned scans with a 1-row "
        "broadcast fit between them; both moment folds are partial "
        "aggregates — the diagnostic that says whether q_grouped_ols's "
        "homoscedastic standard errors can be trusted."
    ),
    tags=("stats", "extension", "parity"),
)
def q_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    xd = F.col("x").cast(_DEC)
    m1 = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(xd * F.col("y").cast(_DEC)).alias("sxy"),
    )
    nd = F.col("n").cast(_DEC)
    b = stable_round(
        (nd * F.col("sxy") - F.col("sx").cast(_DEC) * F.col("sy").cast(_DEC)).cast(
            "double"
        )
        / (nd * F.col("sxx").cast(_DEC) - F.col("sx").cast(_DEC) * F.col("sx").cast(_DEC)).cast(
            "double"
        ),
        6,
    )
    fit = m1.select(
        "n",
        "sx",
        "sy",
        b.alias("b"),
    ).select(
        "n",
        "b",
        stable_round((F.col("sy") - F.col("b") * F.col("sx")) / F.col("n"), 6).alias(
            "a"
        ),
    )
    e = F.col("y") - F.col("a") - F.col("b") * F.col("x")
    res = pts.crossJoin(F.broadcast(fit)).select(
        "x", F.round(e * e / 1000000.0).cast("long").alias("u")
    )
    ud = F.col("u").cast(_DEC)
    m2 = res.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("u").cast("long").alias("su"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x").cast(_DEC) * ud).alias("sxu"),
        F.sum(ud * ud).alias("suu"),
    )
    nd2 = F.col("n").cast(_DEC)
    cv = (nd2 * F.col("sxu") - F.col("sx").cast(_DEC) * F.col("su").cast(_DEC)).cast(
        "double"
    )
    vx = (nd2 * F.col("sxx").cast(_DEC) - F.col("sx").cast(_DEC) * F.col("sx").cast(_DEC)).cast(
        "double"
    )
    vu = (nd2 * F.col("suu") - F.col("su").cast(_DEC) * F.col("su").cast(_DEC)).cast(
        "double"
    )
    lm = m2.select((F.col("n") * (cv * cv) / (vx * vu)).alias("lm_raw"))
    return fit.crossJoin(F.broadcast(lm)).select(
        F.col("n").alias("n_rows"),
        F.col("b").alias("slope"),
        F.col("a").alias("intercept"),
        stable_round(F.col("lm_raw"), 6).alias("lm_stat"),
        (F.col("lm_raw") > _CHI2_1_95).alias("het_detected"),
    )


_CHOW_BREAK = "1998-01-01"


@register(
    "q_chow_test",
    oracle=f"""
WITH daily AS (
    SELECT CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y,
           (CAST(o_orderdate AS DATE) < DATE '{_CHOW_BREAK}') AS pre
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
),
seg AS (
    SELECT CASE WHEN pre THEN 'pre' ELSE 'post' END AS seg,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM daily GROUP BY 1
    UNION ALL
    SELECT 'pooled' AS seg,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM daily
),
sse AS (
    SELECT seg, n,
           (CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
               AS a,
           (CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
               AS bq,
           (CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE))
               AS cq
    FROM seg
),
e AS (
    SELECT seg, n,
           ((a * bq - cq * cq) / (n * bq)) AS sse,
           (cq / bq) AS slope
    FROM sse
),
w AS (
    SELECT
        max(CASE WHEN seg = 'pre' THEN n END) AS n_pre,
        max(CASE WHEN seg = 'post' THEN n END) AS n_post,
        max(CASE WHEN seg = 'pre' THEN slope END) AS slope_pre_raw,
        max(CASE WHEN seg = 'post' THEN slope END) AS slope_post_raw,
        max(CASE WHEN seg = 'pre' THEN sse END) AS sse1,
        max(CASE WHEN seg = 'post' THEN sse END) AS sse2,
        max(CASE WHEN seg = 'pooled' THEN sse END) AS ssep
    FROM e
)
SELECT n_pre, n_post,
       (round(slope_pre_raw * 1000000.0) / 1000000.0) AS slope_pre,
       (round(slope_post_raw * 1000000.0) / 1000000.0) AS slope_post,
       (round((((ssep - sse1 - sse2) / 2.0)
               / ((sse1 + sse2) / (n_pre + n_post - 4.0)))
              * 1000000.0) / 1000000.0) AS f_stat,
       (((ssep - sse1 - sse2) / 2.0)
        / ((sse1 + sse2) / (n_pre + n_post - 4.0))) > {_F_2_INF_95}
           AS structural_break
FROM w
""",
    description=(
        "Chow structural-break test on the daily-revenue trend at a "
        f"fixed break date ({_CHOW_BREAK}): OLS of daily revenue (exact "
        "integer cents) on day index for the pre segment, post segment, "
        "and pooled; F = ((SSE_p - SSE_1 - SSE_2)/k) / "
        "((SSE_1+SSE_2)/(n-2k)) vs the F(2,inf) 95% point. The data-"
        "scale work is ONE grouped day-aggregation (partial-aggregated); "
        "all three moment folds run over the day series. SSEs come from "
        "the closed-form moment identity — no residual pass needed."
    ),
    tags=("stats", "timeseries", "extension", "parity"),
)
def q_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .select(
            F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("x"),
            "y",
            (F.col("day") < F.lit(_CHOW_BREAK).cast("date")).alias("pre"),
        )
    )

    def moments(df: DataFrame, seg: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("x").cast(_DEC) * F.col("y").cast(_DEC)).alias("sxy"),
            F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).alias("syy"),
        ).select(F.lit(seg).alias("seg"), "*")

    seg = (
        moments(daily.filter("pre"), "pre")
        .unionByName(moments(daily.filter("NOT pre"), "post"))
        .unionByName(moments(daily, "pooled"))
    )
    nd = F.col("n").cast(_DEC)
    a = (nd * F.col("syy") - F.col("sy").cast(_DEC) * F.col("sy").cast(_DEC)).cast(
        "double"
    )
    bq = (nd * F.col("sxx").cast(_DEC) - F.col("sx").cast(_DEC) * F.col("sx").cast(_DEC)).cast(
        "double"
    )
    cq = (nd * F.col("sxy") - F.col("sx").cast(_DEC) * F.col("sy").cast(_DEC)).cast(
        "double"
    )
    e = seg.select(
        "seg",
        "n",
        ((a * bq - cq * cq) / (F.col("n") * bq)).alias("sse"),
        (cq / bq).alias("slope"),
    )
    w = e.agg(
        F.max(F.when(F.col("seg") == "pre", F.col("n"))).alias("n_pre"),
        F.max(F.when(F.col("seg") == "post", F.col("n"))).alias("n_post"),
        F.max(F.when(F.col("seg") == "pre", F.col("slope"))).alias("slope_pre_raw"),
        F.max(F.when(F.col("seg") == "post", F.col("slope"))).alias("slope_post_raw"),
        F.max(F.when(F.col("seg") == "pre", F.col("sse"))).alias("sse1"),
        F.max(F.when(F.col("seg") == "post", F.col("sse"))).alias("sse2"),
        F.max(F.when(F.col("seg") == "pooled", F.col("sse"))).alias("ssep"),
    )
    fstat = ((F.col("ssep") - F.col("sse1") - F.col("sse2")) / 2.0) / (
        (F.col("sse1") + F.col("sse2")) / (F.col("n_pre") + F.col("n_post") - 4.0)
    )
    return w.select(
        "n_pre",
        "n_post",
        stable_round(F.col("slope_pre_raw"), 6).alias("slope_pre"),
        stable_round(F.col("slope_post_raw"), 6).alias("slope_post"),
        stable_round(fstat, 6).alias("f_stat"),
        (fstat > _F_2_INF_95).alias("structural_break"),
    )


def _vif_oracle() -> str:
    return """
WITH pts AS (
    SELECT CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_discount * 100) AS BIGINT) AS d,
           CAST(round(l_tax * 100) AS BIGINT) AS t
    FROM lineitem
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS sq, CAST(sum(d) AS BIGINT) AS sd,
           CAST(sum(t) AS BIGINT) AS st,
           CAST(sum(q * q) AS BIGINT) AS sqq, CAST(sum(d * d) AS BIGINT) AS sdd,
           CAST(sum(t * t) AS BIGINT) AS stt,
           CAST(sum(q * d) AS BIGINT) AS sqd, CAST(sum(q * t) AS BIGINT) AS sqt,
           CAST(sum(d * t) AS BIGINT) AS sdt
    FROM pts
),
r AS (
    SELECT
      (CAST(n * sqd - sq * sd AS DOUBLE)
        / sqrt(CAST(n * sqq - sq * sq AS DOUBLE) * CAST(n * sdd - sd * sd AS DOUBLE)))
          AS rqd,
      (CAST(n * sqt - sq * st AS DOUBLE)
        / sqrt(CAST(n * sqq - sq * sq AS DOUBLE) * CAST(n * stt - st * st AS DOUBLE)))
          AS rqt,
      (CAST(n * sdt - sd * st AS DOUBLE)
        / sqrt(CAST(n * sdd - sd * sd AS DOUBLE) * CAST(n * stt - st * st AS DOUBLE)))
          AS rdt
    FROM m
),
r2 AS (
    SELECT 'l_quantity' AS feature,
           ((rqd * rqd + rqt * rqt - 2.0 * rqd * rqt * rdt)
            / (1.0 - rdt * rdt)) AS r2_on_others
    FROM r
    UNION ALL
    SELECT 'l_discount' AS feature,
           ((rqd * rqd + rdt * rdt - 2.0 * rqd * rdt * rqt)
            / (1.0 - rqt * rqt)) AS r2_on_others
    FROM r
    UNION ALL
    SELECT 'l_tax' AS feature,
           ((rqt * rqt + rdt * rdt - 2.0 * rqt * rdt * rqd)
            / (1.0 - rqd * rqd)) AS r2_on_others
    FROM r
)
SELECT feature,
       (round(r2_on_others * 1000000.0) / 1000000.0) AS r2_on_others,
       (round((1.0 / (1.0 - r2_on_others)) * 1000000.0) / 1000000.0) AS vif,
       (1.0 / (1.0 - r2_on_others)) > 5.0 AS collinear
FROM r2
ORDER BY feature
"""


@register(
    "q_vif",
    oracle=_vif_oracle(),
    description=(
        "Variance inflation factors over the (quantity, discount, tax) "
        "feature triple: VIF_i = 1/(1 - R^2 of feature i regressed on "
        "the other two), with the 3-feature R^2 in closed form from the "
        "pairwise correlation matrix — the multicollinearity pre-check "
        "for q_grouped_ols / q_ridge_regression feature sets. All nine "
        "moments fold in ONE exact-integer partial-aggregated scan "
        "(features quantized to percent units at the row); everything "
        "after the 1-row moment table is scalar arithmetic."
    ),
    tags=("stats", "mlops", "extension", "parity"),
)
def q_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum("d").cast("long").alias("sd"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("q") * F.col("d")).cast("long").alias("sqd"),
        F.sum(F.col("q") * F.col("t")).cast("long").alias("sqt"),
        F.sum(F.col("d") * F.col("t")).cast("long").alias("sdt"),
    )
    n = F.col("n")

    def corr(sab, sa, sb, saa, sbb):
        return (n * F.col(sab) - F.col(sa) * F.col(sb)).cast("double") / F.sqrt(
            (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
            * (n * F.col(sbb) - F.col(sb) * F.col(sb)).cast("double")
        )

    r = m.select(
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("rqd"),
        corr("sqt", "sq", "st", "sqq", "stt").alias("rqt"),
        corr("sdt", "sd", "st", "sdd", "stt").alias("rdt"),
    )

    def r2_row(name: str, ra: str, rb: str, rc: str):
        a, bb, c = F.col(ra), F.col(rb), F.col(rc)
        return r.select(
            F.lit(name).alias("feature"),
            ((a * a + bb * bb - 2.0 * a * bb * c) / (1.0 - c * c)).alias(
                "r2_on_others"
            ),
        )

    r2 = (
        r2_row("l_quantity", "rqd", "rqt", "rdt")
        .unionByName(r2_row("l_discount", "rqd", "rdt", "rqt"))
        .unionByName(r2_row("l_tax", "rqt", "rdt", "rqd"))
    )
    vif = 1.0 / (1.0 - F.col("r2_on_others"))
    return r2.select(
        "feature",
        stable_round(F.col("r2_on_others"), 6).alias("r2_on_others"),
        stable_round(vif, 6).alias("vif"),
        (vif > 5.0).alias("collinear"),
    ).orderBy("feature")


_HOLM_ALPHA = 0.05


def _holm_oracle() -> str:
    from healthcare_etl_spark.plans.queries_analytics_stats import _tail_p_sql

    return f"""
WITH g AS (
    SELECT count(*) AS n, sum(value) AS s, sum(value * value) AS ss FROM events
),
gm AS (
    SELECT (round((s / n) * 1000000.0) / 1000000.0) AS gmean,
           (round(sqrt((ss - s * s / n) / n) * 1000000.0) / 1000000.0) AS gstd
    FROM g
),
cells AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           (round((sum(value) / count(*)) * 1000000.0) / 1000000.0) AS cmean
    FROM events GROUP BY 1
),
zs AS (
    SELECT event_type, n,
           (round(((cmean - gmean) / (gstd / sqrt(n))) * 1000000.0) / 1000000.0) AS z
    FROM cells, gm
),
ps AS (
    SELECT event_type, n, z,
           (round({_tail_p_sql("abs(z)")} * 1000000.0) / 1000000.0) AS p
    FROM zs
),
ranked AS (
    SELECT *, CAST(row_number() OVER (ORDER BY p ASC, event_type ASC) AS BIGINT)
                  AS rnk,
           CAST(count(*) OVER () AS BIGINT) AS m
    FROM ps
),
holm AS (
    SELECT *, max((m - rnk + 1) * p) OVER (
                  ORDER BY rnk
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS madj
    FROM ranked
)
SELECT event_type, n, z, p, rnk,
       (round(least(1.0, madj) * 1000000.0) / 1000000.0) AS p_holm,
       madj <= {_HOLM_ALPHA} AS rejected
FROM holm
"""


@register(
    "q_holm_correction",
    oracle=_holm_oracle(),
    description=(
        "Holm step-down multiple-testing correction over the per-event-"
        "type one-sample z-tests (mean value vs corpus mean, the same "
        "Zelen-Severo tail machinery as q_bh_fdr): p-values rank "
        "ascending, adjusted p_i = running max of (m-j+1)*p_j (clipped "
        "at 1), reject while the running max stays under alpha. The FWER-"
        "controlling companion to q_bh_fdr's FDR step-up — strictly "
        "stronger guarantee, fewer rejections. The step-down window runs "
        "over the #event-types hypothesis grid (5 rows), never the event "
        "table; everything data-scale is the two grouped aggregates."
    ),
    tags=("stats", "extension", "parity"),
)
def q_holm_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.plans.queries_analytics_stats import _PHI_CONSTS, _SQRT_2PI

    ev = load_table(spark, sf_dir, "events")
    b0, b1, b2, b3, b4, b5 = _PHI_CONSTS
    g = ev.agg(
        F.count(F.lit(1)).alias("gn"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    ).select(
        stable_round(F.col("s") / F.col("gn"), 6).alias("gmean"),
        stable_round(
            F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("gn")) / F.col("gn")),
            6,
        ).alias("gstd"),
    )
    cells = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        stable_round(F.sum("value") / F.count(F.lit(1)), 6).alias("cmean"),
    )
    zs = cells.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        stable_round(
            (F.col("cmean") - F.col("gmean")) / (F.col("gstd") / F.sqrt("n")), 6
        ).alias("z"),
    )
    az = F.abs(F.col("z"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(b0) * az)
    poly = t * (
        F.lit(b1)
        + t * (F.lit(b2) + t * (F.lit(b3) + t * (F.lit(b4) + t * F.lit(b5))))
    )
    pdf = F.exp(-az * az / F.lit(2.0)) / F.lit(_SQRT_2PI)
    ps = zs.withColumn(
        "p", stable_round(F.least(F.lit(1.0), F.lit(2.0) * pdf * poly), 6)
    )
    wr = Window.orderBy(F.asc("p"), F.asc("event_type"))
    wall = Window.partitionBy()
    ranked = ps.withColumn("rnk", F.row_number().over(wr).cast("long")).withColumn(
        "m", F.count(F.lit(1)).over(wall).cast("long")
    )
    wmax = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    holm = ranked.withColumn(
        "madj", F.max((F.col("m") - F.col("rnk") + 1) * F.col("p")).over(wmax)
    )
    return holm.select(
        "event_type",
        "n",
        "z",
        "p",
        "rnk",
        stable_round(F.least(F.lit(1.0), F.col("madj")), 6).alias("p_holm"),
        (F.col("madj") <= _HOLM_ALPHA).alias("rejected"),
    )


@register(
    "q_weibull_fit",
    oracle="""
WITH f AS (
    SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY user_id
),
p AS (
    SELECT user_id, min(epoch_us(ts)) AS p_us
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
subj AS (
    SELECT CASE WHEN p.p_us IS NOT NULL
                     AND (p.p_us - f.first_us) // 3600000000 <= 60
                THEN (p.p_us - f.first_us) // 3600000000 ELSE 60 END AS dur,
           (p.p_us IS NOT NULL AND (p.p_us - f.first_us) // 3600000000 <= 60)
               AS event
    FROM f LEFT JOIN p ON f.user_id = p.user_id
),
evs AS (
    SELECT CAST(dur AS BIGINT) AS dur, CAST(count(*) AS BIGINT) AS d
    FROM subj WHERE event AND dur >= 1 GROUP BY 1
),
n AS (SELECT CAST(sum(d) AS BIGINT) AS n FROM evs),
ranked AS (
    SELECT dur, d,
           CAST(sum(d) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
    FROM evs
),
pts AS (
    SELECT CAST(round(ln(dur) * 1000000.0) AS BIGINT) AS x,
           CAST(round(ln(-ln(1.0 - (cum - 0.3) / (nn.n + 0.4))) * 1000000.0)
                AS BIGINT) AS y
    FROM ranked CROSS JOIN n nn
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS np,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM pts
),
fit AS (
    SELECT np,
           ((np * sxy - sx * 1.0 * sy) / (np * sxx - sx * 1.0 * sx)) AS k,
           (CAST(np * sxy - sx * 1.0 * sy AS DOUBLE)) AS cv,
           (CAST(np * sxx - sx * 1.0 * sx AS DOUBLE)) AS vx,
           (CAST(np * syy - sy * 1.0 * sy AS DOUBLE)) AS vy,
           sx, sy
    FROM m
)
SELECT nn.n AS n_events, np AS n_points,
       (round(k * 1000000.0) / 1000000.0) AS shape_k,
       (round(exp(-(((sy - k * sx) / np) / 1000000.0) / k) * 1000000.0)
        / 1000000.0) AS scale_hours,
       (round(((cv * cv) / (vx * vy)) * 1000000.0) / 1000000.0) AS r2
FROM fit CROSS JOIN n nn
""",
    description=(
        "Weibull fit of the activation-delay distribution by median-rank "
        "regression (the probability-plot method): over the uncensored "
        "conversion durations (same subject table as q_kaplan_meier, "
        "dur >= 1h), Bernard's approximation F_i = (i-0.3)/(n+0.4) at "
        "each distinct duration, then OLS of ln(-ln(1-F)) on ln(t) — "
        "slope = shape k (k<1 burn-in, k>1 wear-out), scale = "
        "exp(-a/k). Completes the survival family (KM / Nelson-Aalen / "
        "log-rank / RMST are nonparametric; this is the parametric "
        "member that extrapolates beyond the horizon). Per-point logs "
        "quantize to 1e-6 BIGINTs so the OLS moments fold exactly; the "
        "rank window rides the horizon-bounded distinct-duration table "
        "(<=60 rows); data-scale work is the two per-user aggregates."
    ),
    tags=("stats", "survival", "extension", "parity"),
)
def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("first_us"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    hours = F.floor((F.col("p_us") - F.col("first_us")) / 3600000000)
    subj = f.join(p, "user_id", "left").select(
        F.when(F.col("p_us").isNotNull() & (hours <= 60), hours)
        .otherwise(F.lit(60))
        .cast("long")
        .alias("dur"),
        (F.col("p_us").isNotNull() & (hours <= 60)).alias("event"),
    )
    evs = (
        subj.filter(F.col("event") & (F.col("dur") >= 1))
        .groupBy("dur")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    n = evs.agg(F.sum("d").cast("long").alias("n"))
    wc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = evs.select("dur", "d", F.sum("d").over(wc).cast("long").alias("cum"))
    pts = ranked.crossJoin(F.broadcast(n)).select(
        F.round(F.log(F.col("dur")) * 1000000.0).cast("long").alias("x"),
        F.round(
            F.log(-F.log(1.0 - (F.col("cum") - 0.3) / (F.col("n") + 0.4)))
            * 1000000.0
        )
        .cast("long")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    np_, sx, sy = F.col("np"), F.col("sx"), F.col("sy")
    k = (np_ * F.col("sxy") - sx * 1.0 * sy) / (np_ * F.col("sxx") - sx * 1.0 * sx)
    cv = (np_ * F.col("sxy") - sx * 1.0 * sy).cast("double")
    vx = (np_ * F.col("sxx") - sx * 1.0 * sx).cast("double")
    vy = (np_ * F.col("syy") - sy * 1.0 * sy).cast("double")
    fit = m.select(
        "np",
        k.alias("k"),
        cv.alias("cv"),
        vx.alias("vx"),
        vy.alias("vy"),
        "sx",
        "sy",
    )
    return fit.crossJoin(F.broadcast(n)).select(
        F.col("n").alias("n_events"),
        F.col("np").alias("n_points"),
        stable_round(F.col("k"), 6).alias("shape_k"),
        stable_round(
            F.exp(
                -(((F.col("sy") - F.col("k") * F.col("sx")) / F.col("np")) / 1000000.0)
                / F.col("k")
            ),
            6,
        ).alias("scale_hours"),
        stable_round((F.col("cv") * F.col("cv")) / (F.col("vx") * F.col("vy")), 6).alias(
            "r2"
        ),
    )


@register(
    "q_gamma_interarrival",
    oracle="""
WITH gaps AS (
    SELECT event_type,
           CAST((epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS BIGINT)
               AS gap_s
    FROM events
),
g AS (SELECT event_type, gap_s FROM gaps WHERE gap_s IS NOT NULL AND gap_s > 0),
m AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(gap_s) AS BIGINT) AS s1,
           sum(CAST(gap_s AS HUGEINT) * gap_s) AS s2
    FROM g GROUP BY 1
),
mv AS (
    SELECT event_type, n,
           (CAST(s1 AS DOUBLE) / n) AS mean_s,
           (CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
            / (n * (n - 1.0))) AS var_s
    FROM m
)
SELECT event_type, n AS n_gaps,
       (round(mean_s * 1000000.0) / 1000000.0) AS mean_gap_s,
       (round(var_s * 1.0) / 1.0) AS var_gap_s,
       (round((mean_s * mean_s / var_s) * 1000000.0) / 1000000.0) AS shape_k,
       (round((var_s / mean_s) * 1000000.0) / 1000000.0) AS scale_theta_s
FROM mv
ORDER BY event_type
""",
    description=(
        "Gamma fit of inter-event arrival times by method of moments, "
        "per event type (gap attributed to the later event): shape "
        "k = mean^2/var, scale theta = var/mean — k near 1 means "
        "Poisson-like memoryless arrivals, k < 1 bursty (the parametric "
        "companion to q_burstiness_fano's index, usable for simulation "
        "and anomaly thresholds). Gaps come from a per-user lag window "
        "(partitioned — fully distributed); both moments fold as exact "
        "integers (HUGEINT/DECIMAL(38) squares: a 30-day gap in seconds "
        "squares to ~6.7e12 per row)."
    ),
    tags=("stats", "timeseries", "extension", "parity"),
)
def q_gamma_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        F.floor(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 1000000
        )
        .cast("long")
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull() & (F.col("gap_s") > 0))
    m = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_s").cast("long").alias("s1"),
        F.sum(F.col("gap_s").cast(_DEC) * F.col("gap_s").cast(_DEC)).alias("s2"),
    )
    n = F.col("n")
    mean_s = F.col("s1").cast("double") / n
    var_s = (
        (n.cast(_DEC) * F.col("s2") - F.col("s1").cast(_DEC) * F.col("s1").cast(_DEC))
        .cast("double")
        / (n * (n - 1.0))
    )
    mv = m.select("event_type", "n", mean_s.alias("mean_s"), var_s.alias("var_s"))
    return mv.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        stable_round(F.col("mean_s"), 6).alias("mean_gap_s"),
        stable_round(F.col("var_s"), 0).alias("var_gap_s"),
        stable_round(F.col("mean_s") * F.col("mean_s") / F.col("var_s"), 6).alias(
            "shape_k"
        ),
        stable_round(F.col("var_s") / F.col("mean_s"), 6).alias("scale_theta_s"),
    ).orderBy("event_type")


_HUBER_K = 1.345
_HUBER_ROUNDS = 3


def _huber_oracle() -> str:
    pre = f"""
WITH pts AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS x FROM events
),
m0 AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS s1,
           sum(CAST(x AS HUGEINT) * x) AS s2
    FROM pts
),
st AS (
    SELECT n,
           (round((CAST(s1 AS DOUBLE) / n) * 1000000.0) / 1000000.0) AS mu0,
           (round(({_HUBER_K} * sqrt(
                CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                / (n * (n - 1.0)))) * 1000000.0) / 1000000.0) AS c
    FROM m0
)"""
    # round k reads mu from round k-1 (st.mu0 for round 1) and c from st,
    # so each r{k} cross-joins st plus the previous round's 1-row state
    rounds = []
    prev = None
    for k in range(1, _HUBER_ROUNDS + 1):
        mu_ref = "st.mu0" if prev is None else f"{prev}.mu"
        extra = "" if prev is None else f" CROSS JOIN {prev}"
        rounds.append(
            f""",
r{k} AS (
    SELECT
        CAST(sum(CAST(round((CASE WHEN abs(p.x - {mu_ref}) <= st.c THEN 1.0
                             ELSE st.c / abs(p.x - {mu_ref}) END) * p.x
                            * 1000000.0) AS BIGINT)) AS BIGINT) AS swx,
        CAST(sum(CAST(round((CASE WHEN abs(p.x - {mu_ref}) <= st.c THEN 1.0
                             ELSE st.c / abs(p.x - {mu_ref}) END)
                            * 1000000000.0) AS BIGINT)) AS BIGINT) AS sw,
        CAST(sum(CASE WHEN abs(p.x - {mu_ref}) > st.c THEN 1 ELSE 0 END)
             AS BIGINT) AS nd
    FROM pts p CROSS JOIN st{extra}
),
s{k} AS (
    SELECT (round(((swx / 1000000.0) / (sw / 1000000000.0)) * 1000000.0)
            / 1000000.0) AS mu, nd
    FROM r{k}
)"""
        )
        prev = f"s{k}"
    last = f"s{_HUBER_ROUNDS}"
    return (
        pre
        + "".join(rounds)
        + f"""
SELECT st.n AS n_rows,
       (round((st.mu0 / 100.0) * 1000000.0) / 1000000.0) AS mean_value,
       (round(({last}.mu / 100.0) * 1000000.0) / 1000000.0) AS huber_location,
       (round((st.c / 100.0) * 1000000.0) / 1000000.0) AS tuning_c,
       {last}.nd AS n_downweighted,
       (round(({last}.nd * 1.0 / st.n) * 1000000.0) / 1000000.0)
           AS frac_downweighted
FROM st CROSS JOIN {last}
"""
    )


@register(
    "q_huber_location",
    oracle=_huber_oracle(),
    description=(
        f"Huber M-estimator of the event-value location ({_HUBER_ROUNDS} "
        "IRLS rounds, tuning constant 1.345 sigma for 95% Gaussian "
        "efficiency): outliers beyond c get weight c/|x-mu| instead of "
        "1, so the estimate sits between the mean (efficient, fragile) "
        "and the median (robust, inefficient) — the robust-location "
        "member alongside q_winsorized_mean (fixed trim) and "
        "q_anomaly_mad (detection). Each round is one partial-aggregated "
        "fold over the scan with the 1-row state broadcast back; "
        "weighted sums quantize per-row to BIGINTs (order-free exact "
        "folds), the divide-by-zero branch is CASE-guarded because "
        "Spark doubles yield Infinity where DuckDB yields NULL, and "
        "round-k state is 6dp-rounded so both engines iterate from "
        "identical values."
    ),
    tags=("stats", "extension", "iterative", "parity"),
)
def q_huber_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("x")
    )
    m0 = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).alias("s2"),
    )
    n = F.col("n")
    st = m0.select(
        "n",
        stable_round(F.col("s1").cast("double") / n, 6).alias("mu0"),
        stable_round(
            _HUBER_K
            * F.sqrt(
                (n.cast(_DEC) * F.col("s2") - F.col("s1").cast(_DEC) * F.col("s1").cast(_DEC)).cast(
                    "double"
                )
                / (n * (n - 1.0))
            ),
            6,
        ).alias("c"),
    )
    state = st
    mu_col = "mu0"
    nd_last = None
    for _ in range(_HUBER_ROUNDS):
        d = F.abs(F.col("x") - F.col(mu_col))
        w = F.when(d <= F.col("c"), F.lit(1.0)).otherwise(F.col("c") / d)
        r = pts.crossJoin(F.broadcast(state)).agg(
            F.sum(F.round(w * F.col("x") * 1000000.0).cast("long"))
            .cast("long")
            .alias("swx"),
            F.sum(F.round(w * 1000000000.0).cast("long")).cast("long").alias("sw"),
            F.sum(F.when(d > F.col("c"), 1).otherwise(0)).cast("long").alias("nd"),
            F.first("n").alias("n"),
            F.first("mu0").alias("mu0"),
            F.first("c").alias("c"),
        )
        state = r.select(
            "n",
            "mu0",
            "c",
            "nd",
            stable_round(
                (F.col("swx") / 1000000.0) / (F.col("sw") / 1000000000.0), 6
            ).alias("mu"),
        )
        mu_col = "mu"
        nd_last = "nd"
    return state.select(
        F.col("n").alias("n_rows"),
        stable_round(F.col("mu0") / 100.0, 6).alias("mean_value"),
        stable_round(F.col("mu") / 100.0, 6).alias("huber_location"),
        stable_round(F.col("c") / 100.0, 6).alias("tuning_c"),
        F.col(nd_last).alias("n_downweighted"),
        stable_round(F.col(nd_last) * 1.0 / F.col("n"), 6).alias("frac_downweighted"),
    )


@register(
    "q_paired_ttest",
    oracle="""
WITH halves AS (
    SELECT user_id,
           CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS pre_c,
           CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS post_c,
           CAST(count(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN 1 END) AS BIGINT) AS n_pre,
           CAST(count(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN 1 END) AS BIGINT) AS n_post
    FROM events GROUP BY user_id
),
diffs AS (
    SELECT (post_c - pre_c) AS d FROM halves
    WHERE n_pre > 0 AND n_post > 0
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(d) AS BIGINT) AS s1,
           sum(CAST(d AS HUGEINT) * d) AS s2
    FROM diffs
),
t AS (
    SELECT n,
           (CAST(s1 AS DOUBLE) / n) AS dbar,
           sqrt(CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                / (n * (n - 1.0))) AS sd
    FROM m
)
SELECT n AS n_users,
       (round((dbar / 100.0) * 1000000.0) / 1000000.0) AS mean_diff,
       (round((sd / 100.0) * 1000000.0) / 1000000.0) AS sd_diff,
       (round((dbar / (sd / sqrt(n))) * 1000000.0) / 1000000.0) AS t_stat,
       abs(dbar / (sd / sqrt(n))) > 1.959964 AS significant
FROM t
""",
    description=(
        "Paired t-test of per-user spend, first half vs second half of "
        "the month: each user is their own control (the within-subject "
        "design q_welch_ttest's independent-arms form cannot express; "
        "q_wilcoxon_signed_rank is its rank-based robust sibling, "
        "q_cuped_adjustment its regression generalization). Per-user "
        "paired sums fold exactly in cents; users active in only one "
        "half drop (no pair); the diff moments fold as exact "
        "HUGEINT/DECIMAL(38) integers; t vs the normal 95% point "
        "(df >> 30). One grouped aggregate + one 3-moment fold."
    ),
    tags=("stats", "experimentation", "extension", "parity"),
)
def q_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    cents = F.round(F.col("value") * 100).cast("long")
    pre = F.to_date("ts") < cut
    halves = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, cents).otherwise(0)).cast("long").alias("pre_c"),
        F.sum(F.when(~pre, cents).otherwise(0)).cast("long").alias("post_c"),
        F.count(F.when(pre, 1)).cast("long").alias("n_pre"),
        F.count(F.when(~pre, 1)).cast("long").alias("n_post"),
    )
    diffs = halves.filter((F.col("n_pre") > 0) & (F.col("n_post") > 0)).select(
        (F.col("post_c") - F.col("pre_c")).alias("d")
    )
    m = diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d").cast(_DEC) * F.col("d").cast(_DEC)).alias("s2"),
    )
    n = F.col("n")
    dbar = F.col("s1").cast("double") / n
    sd = F.sqrt(
        (n.cast(_DEC) * F.col("s2") - F.col("s1").cast(_DEC) * F.col("s1").cast(_DEC)).cast(
            "double"
        )
        / (n * (n - 1.0))
    )
    tstat = dbar / (sd / F.sqrt(n))
    return m.select(
        n.alias("n_users"),
        stable_round(dbar / 100.0, 6).alias("mean_diff"),
        stable_round(sd / 100.0, 6).alias("sd_diff"),
        stable_round(tstat, 6).alias("t_stat"),
        (F.abs(tstat) > 1.959964).alias("significant"),
    )


@register(
    "q_icc_oneway",
    oracle="""
WITH cells AS (
    SELECT (user_id % 64) AS u, CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
per_u AS (
    SELECT u, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS sy,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM cells GROUP BY 1
),
tot AS (
    SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS k,
           CAST(sum(sy) AS BIGINT) AS st,
           CAST(sum(CAST(syy AS HUGEINT)) AS HUGEINT) AS sst,
           sum(CAST(round(CAST(CAST(sy AS HUGEINT) * sy AS DOUBLE) / n)
                    AS BIGINT)) AS ssb_q
    FROM per_u
),
ss AS (
    SELECT nt, k,
           (CAST(ssb_q AS DOUBLE) - CAST(CAST(st AS HUGEINT) * st AS DOUBLE) / nt)
               AS ssb,
           (CAST(sst AS DOUBLE) - CAST(ssb_q AS DOUBLE)) AS ssw
    FROM tot
),
msq AS (
    SELECT nt, k,
           (ssb / (k - 1.0)) AS msb,
           (ssw / (nt - k * 1.0)) AS msw,
           ((nt * 1.0) / k) AS k0
    FROM ss
)
SELECT nt AS n_cells, k AS n_groups,
       (round(msb * 1.0) / 1.0) AS ms_between,
       (round(msw * 1.0) / 1.0) AS ms_within,
       (round(((msb - msw) / (msb + (k0 - 1.0) * msw)) * 1000000.0) / 1000000.0)
           AS icc1,
       (round((msb / msw) * 1000000.0) / 1000000.0) AS f_ratio
FROM msq
""",
    description=(
        "One-way intraclass correlation ICC(1) of daily spend within "
        "user buckets: variance decomposition into between-group and "
        "within-group mean squares (balanced-approximation k0 = N/k for "
        "the group-size constant), ICC = (MSB - MSW)/(MSB + (k0-1)MSW) "
        "— how much of daily revenue variance is explained by WHICH "
        "user bucket it comes from; the reliability companion to "
        "q_fixed_effects_panel (same panel, asking 'how big are the "
        "fixed effects' instead of 'what survives them') and the "
        "random-effects cousin of q_anova_f. Per-group exact integer "
        "moments; the one rational per-group term (Sy^2/n) quantizes to "
        "a BIGINT before the global fold."
    ),
    tags=("stats", "extension", "parity"),
)
def q_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 64).alias("u"), F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y"))
    )
    per_u = cells.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).alias("syy"),
    )
    ssb_q = F.round(
        (F.col("sy").cast(_DEC) * F.col("sy").cast(_DEC)).cast("double") / F.col("n")
    ).cast("long")
    tot = per_u.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("sy").cast("long").alias("st"),
        F.sum(F.col("syy")).alias("sst"),
        F.sum(ssb_q).cast("long").alias("ssb_q"),
    )
    nt, k = F.col("nt"), F.col("k")
    ssb = F.col("ssb_q").cast("double") - (
        F.col("st").cast(_DEC) * F.col("st").cast(_DEC)
    ).cast("double") / nt
    ssw = F.col("sst").cast("double") - F.col("ssb_q").cast("double")
    msb = ssb / (k - 1.0)
    msw = ssw / (nt - k * 1.0)
    k0 = nt * 1.0 / k
    return tot.select(
        nt.alias("n_cells"),
        k.alias("n_groups"),
        stable_round(msb, 0).alias("ms_between"),
        stable_round(msw, 0).alias("ms_within"),
        stable_round((msb - msw) / (msb + (k0 - 1.0) * msw), 6).alias("icc1"),
        stable_round(msb / msw, 6).alias("f_ratio"),
    )


@register(
    "q_grouped_mad",
    oracle="""
WITH med AS (
    SELECT event_type,
           (round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)
                  * 1000000.0) / 1000000.0) AS med_c
    FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_type, abs(CAST(round(e.value * 100) AS BIGINT) - m.med_c) AS ad
    FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
    SELECT event_type,
           (round(quantile_cont(ad, 0.5) * 1000000.0) / 1000000.0) AS mad_c
    FROM dev GROUP BY event_type
)
SELECT m.event_type,
       (round((m.med_c / 100.0) * 1000000.0) / 1000000.0) AS median_value,
       (round((d.mad_c / 100.0) * 1000000.0) / 1000000.0) AS mad_value,
       (round((1.4826 * d.mad_c / 100.0) * 1000000.0) / 1000000.0)
           AS robust_sigma
FROM med m JOIN mad d ON m.event_type = d.event_type
ORDER BY m.event_type
""",
    description=(
        "Grouped median absolute deviation per event type (plus the "
        "1.4826-scaled robust sigma that makes MAD comparable to a "
        "Gaussian SD): the per-group robust-scale companion to "
        "q_anomaly_mad's global detector and q_huber_location's robust "
        "location — the trio a metrics platform needs before alerting "
        "on heavy-tailed value streams. Two grouped exact percentiles "
        "with the 5-row median table broadcast between them (values "
        "quantized to cents first so interpolation happens on identical "
        "integers); the exact per-group sort is the documented small-"
        "group path, approx_percentile the 100 TB default."
    ),
    tags=("stats", "extension", "parity"),
)
def q_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    med = ev.groupBy("event_type").agg(
        stable_round(F.expr("percentile(c, 0.5)"), 6).alias("med_c")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("c") - F.col("med_c")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        stable_round(F.expr("percentile(ad, 0.5)"), 6).alias("mad_c")
    )
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            stable_round(F.col("med_c") / 100.0, 6).alias("median_value"),
            stable_round(F.col("mad_c") / 100.0, 6).alias("mad_value"),
            stable_round(1.4826 * F.col("mad_c") / 100.0, 6).alias("robust_sigma"),
        )
        .orderBy("event_type")
    )


_PB_TARGET_CENTS = 60000  # same 'good user' target as q_woe_iv_encoding


def _pb_features_sql() -> str:
    return """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS f_events,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS f_active_days,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
               AS f_purchases,
           CASE WHEN coalesce(sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(round(value * 100) AS BIGINT) END), 0)
                     > 60000
                THEN 1 ELSE 0 END AS y
    FROM events GROUP BY user_id
"""


def _pb_oracle() -> str:
    feats = ("f_events", "f_active_days", "f_purchases")
    parts = []
    for f in feats:
        parts.append(
            f"""
SELECT '{f}' AS feature,
       CAST(count(*) AS BIGINT) AS n,
       (CAST(count(*) * sum(CASE WHEN y = 1 THEN {f} ELSE 0 END)
             - sum(y) * sum({f}) AS DOUBLE)
        / (sqrt(CAST(count(*) * sum({f} * {f})
                     - sum({f}) * sum({f}) AS DOUBLE))
           * sqrt(CAST(count(*) * sum(y) - sum(y) * sum(y) AS DOUBLE))))
           AS r_raw
FROM u"""
        )
    body = "\nUNION ALL".join(parts)
    return f"""
WITH u AS ({_pb_features_sql()})
SELECT feature, n,
       (round(r_raw * 1000000.0) / 1000000.0) AS point_biserial_r,
       abs(r_raw) >= 0.1 AS keep_feature
FROM ({body})
ORDER BY feature
"""


@register(
    "q_pointbiserial_screen",
    oracle=_pb_oracle(),
    description=(
        "Point-biserial correlation screen of per-user activity features "
        "against the binary high-spender target (same 600-dollar label "
        "as q_woe_iv_encoding): r_pb is Pearson r with a 0/1 variable, "
        "computed from exact integer moments in ONE pass over the "
        "per-user feature frame — the univariate feature-selection "
        "pre-filter that runs before q_mutual_info (nonlinear), q_vif "
        "(redundancy), and q_permutation_importance (model-based). "
        "Features and target fold exactly (counts and 0/1 sums); the "
        "|r| >= 0.1 keep flag is the conventional screening threshold."
    ),
    tags=("stats", "mlops", "extension", "parity"),
)
def q_pointbiserial_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("f_events"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("f_active_days"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("f_purchases"),
        F.when(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            )
            > _PB_TARGET_CENTS,
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    outs = []
    for f in ("f_events", "f_active_days", "f_purchases"):
        fc, y = F.col(f), F.col("y")
        m = u.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(y == 1, fc).otherwise(0)).cast("long").alias("sfy"),
            F.sum(y).cast("long").alias("sy"),
            F.sum(fc).cast("long").alias("sf"),
            F.sum(fc * fc).cast("long").alias("sff"),
        )
        n = F.col("n")
        r_raw = (n * F.col("sfy") - F.col("sy") * F.col("sf")).cast("double") / (
            F.sqrt((n * F.col("sff") - F.col("sf") * F.col("sf")).cast("double"))
            * F.sqrt((n * F.col("sy") - F.col("sy") * F.col("sy")).cast("double"))
        )
        outs.append(
            m.select(
                F.lit(f).alias("feature"),
                "n",
                r_raw.alias("r_raw"),
            )
        )
    from functools import reduce

    allf = reduce(DataFrame.unionByName, outs)
    return allf.select(
        "feature",
        "n",
        stable_round(F.col("r_raw"), 6).alias("point_biserial_r"),
        (F.abs(F.col("r_raw")) >= 0.1).alias("keep_feature"),
    ).orderBy("feature")


def _bayes_ab_oracle() -> str:
    from healthcare_etl_spark.plans.queries_analytics_stats import _tail_p_sql

    arm = (
        "(('0x' || substring(md5('ab-v1:' || CAST(user_id AS VARCHAR)), 1, 8))"
        "::BIGINT % 2 = 0)"
    )
    tailp = _tail_p_sql("abs(z)")
    return f"""
WITH u AS (
    SELECT user_id, {arm} AS in_a,
           max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
),
g AS (
    SELECT CASE WHEN in_a THEN 'A' ELSE 'B' END AS arm,
           CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS s
    FROM u GROUP BY 1
),
post AS (
    SELECT
        max(CASE WHEN arm = 'A' THEN n END) AS n_a,
        max(CASE WHEN arm = 'A' THEN s END) AS s_a,
        max(CASE WHEN arm = 'B' THEN n END) AS n_b,
        max(CASE WHEN arm = 'B' THEN s END) AS s_b
    FROM g
),
moments AS (
    SELECT n_a, s_a, n_b, s_b,
           ((1.0 + s_a) / (2.0 + n_a)) AS m_a,
           ((1.0 + s_b) / (2.0 + n_b)) AS m_b,
           (((1.0 + s_a) * (1.0 + n_a - s_a))
            / ((2.0 + n_a) * (2.0 + n_a) * (3.0 + n_a))) AS v_a,
           (((1.0 + s_b) * (1.0 + n_b - s_b))
            / ((2.0 + n_b) * (2.0 + n_b) * (3.0 + n_b))) AS v_b
    FROM post
),
zed AS (
    SELECT *, (round(((m_b - m_a) / sqrt(v_a + v_b)) * 1000000.0) / 1000000.0) AS z
    FROM moments
),
pr AS (
    SELECT *,
           (round((CASE WHEN z >= 0 THEN 1.0 - {tailp} / 2.0
                        ELSE {tailp} / 2.0 END) * 1000000.0) / 1000000.0)
               AS prob_b_beats_a
    FROM zed
)
SELECT n_a, s_a AS conv_a, n_b, s_b AS conv_b,
       (round(m_a * 1000000.0) / 1000000.0) AS post_mean_a,
       (round(m_b * 1000000.0) / 1000000.0) AS post_mean_b,
       prob_b_beats_a,
       CASE WHEN prob_b_beats_a >= 0.95 THEN 'ship_b'
            WHEN prob_b_beats_a <= 0.05 THEN 'ship_a'
            ELSE 'continue' END AS decision
FROM pr
"""


@register(
    "q_bayes_ab_prob",
    oracle=_bayes_ab_oracle(),
    description=(
        "Bayesian A/B read of the conversion experiment: Beta(1+s, "
        "1+n-s) posteriors per arm (uniform prior), P(B > A) via the "
        "normal approximation of the posterior difference and the same "
        "Zelen-Severo Phi machinery as q_bh_fdr (z 6dp-rounded before "
        "the tail polynomial) — the 'probability B is better' framing "
        "stakeholders actually ask for, next to q_ab_test_ztest's "
        "p-value and q_sequential_ab_monitor's stopping rule; ship "
        "thresholds at 95%. Exact integer (n, s) per arm from one "
        "grouped pass; everything after is 4-number scalar arithmetic."
    ),
    tags=("stats", "experimentation", "extension", "parity"),
)
def q_bayes_ab_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.plans.queries_analytics_stats import _PHI_CONSTS, _SQRT_2PI
    from healthcare_etl_spark.plans.queries_stats2 import _arm_a

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("conv")
    ).select(_arm_a("user_id").alias("in_a"), "conv")
    g = u.groupBy(F.when(F.col("in_a"), "A").otherwise("B").alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("s"),
    )
    post = g.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("s"))).alias("s_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("s"))).alias("s_b"),
    )
    n_a, s_a, n_b, s_b = F.col("n_a"), F.col("s_a"), F.col("n_b"), F.col("s_b")
    m_a = (1.0 + s_a) / (2.0 + n_a)
    m_b = (1.0 + s_b) / (2.0 + n_b)
    v_a = ((1.0 + s_a) * (1.0 + n_a - s_a)) / ((2.0 + n_a) * (2.0 + n_a) * (3.0 + n_a))
    v_b = ((1.0 + s_b) * (1.0 + n_b - s_b)) / ((2.0 + n_b) * (2.0 + n_b) * (3.0 + n_b))
    zed = post.select(
        "n_a", "s_a", "n_b", "s_b",
        m_a.alias("m_a"), m_b.alias("m_b"),
        stable_round((m_b - m_a) / F.sqrt(v_a + v_b), 6).alias("z"),
    )
    b0, b1, b2, b3, b4, b5 = _PHI_CONSTS
    az = F.abs(F.col("z"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(b0) * az)
    poly = t * (
        F.lit(b1)
        + t * (F.lit(b2) + t * (F.lit(b3) + t * (F.lit(b4) + t * F.lit(b5))))
    )
    pdf = F.exp(-az * az / F.lit(2.0)) / F.lit(_SQRT_2PI)
    tailp = F.least(F.lit(1.0), F.lit(2.0) * pdf * poly)
    prob = stable_round(
        F.when(F.col("z") >= 0, F.lit(1.0) - tailp / 2.0).otherwise(tailp / 2.0), 6
    )
    pr = zed.withColumn("prob_b_beats_a", prob)
    return pr.select(
        "n_a",
        F.col("s_a").alias("conv_a"),
        "n_b",
        F.col("s_b").alias("conv_b"),
        stable_round(F.col("m_a"), 6).alias("post_mean_a"),
        stable_round(F.col("m_b"), 6).alias("post_mean_b"),
        "prob_b_beats_a",
        F.when(F.col("prob_b_beats_a") >= 0.95, "ship_b")
        .when(F.col("prob_b_beats_a") <= 0.05, "ship_a")
        .otherwise("continue")
        .alias("decision"),
    )


@register(
    "q_beta_fit",
    oracle="""
WITH u AS (
    SELECT user_id,
           CAST(round((count(CASE WHEN event_type = 'purchase' THEN 1 END)
                       * 1.0 / count(*)) * 1000000.0) AS BIGINT) AS r
    FROM events GROUP BY user_id
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(r) AS BIGINT) AS s1,
           sum(CAST(r AS HUGEINT) * r) AS s2
    FROM u
),
mv AS (
    SELECT n,
           ((CAST(s1 AS DOUBLE) / n) / 1000000.0) AS mean_r,
           ((CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
             / (n * (n - 1.0))) / 1000000000000.0) AS var_r
    FROM m
),
fit AS (
    SELECT n, mean_r, var_r,
           (mean_r * (mean_r * (1.0 - mean_r) / var_r - 1.0)) AS alpha,
           ((1.0 - mean_r) * (mean_r * (1.0 - mean_r) / var_r - 1.0)) AS beta
    FROM mv
)
SELECT n AS n_users,
       (round(mean_r * 1000000.0) / 1000000.0) AS mean_rate,
       (round(var_r * 100000000.0) / 100000000.0) AS var_rate,
       (round(alpha * 1000000.0) / 1000000.0) AS alpha,
       (round(beta * 1000000.0) / 1000000.0) AS beta,
       (round((alpha + beta) * 1000000.0) / 1000000.0) AS concentration
FROM fit
""",
    description=(
        "Method-of-moments Beta fit of per-user purchase-rate shares: "
        "alpha/beta from the mean and variance of the micro-quantized "
        "rates — the population prior behind q_eb_ctr_shrinkage's "
        "empirical-Bayes pull (this query ESTIMATES the prior those "
        "shrinkage weights assume; concentration alpha+beta is the "
        "implicit pseudo-count). Rates quantize to 1e-6 BIGINTs at the "
        "user row so both moments fold exactly; one grouped pass + one "
        "3-moment fold."
    ),
    tags=("stats", "extension", "parity"),
)
def q_beta_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(
                (
                    F.count(F.when(F.col("event_type") == "purchase", 1))
                    * 1.0
                    / F.count(F.lit(1))
                )
                * 1000000.0
            )
            .cast("long")
            .alias("r")
        )
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("s1"),
        F.sum(F.col("r").cast(_DEC) * F.col("r").cast(_DEC)).alias("s2"),
    )
    n = F.col("n")
    mean_r = (F.col("s1").cast("double") / n) / 1000000.0
    var_r = (
        (n.cast(_DEC) * F.col("s2") - F.col("s1").cast(_DEC) * F.col("s1").cast(_DEC)).cast(
            "double"
        )
        / (n * (n - 1.0))
    ) / 1000000000000.0
    k = mean_r * (1.0 - mean_r) / var_r - 1.0
    return m.select(
        n.alias("n_users"),
        stable_round(mean_r, 6).alias("mean_rate"),
        stable_round(var_r, 8).alias("var_rate"),
        stable_round(mean_r * k, 6).alias("alpha"),
        stable_round((1.0 - mean_r) * k, 6).alias("beta"),
        stable_round(mean_r * k + (1.0 - mean_r) * k, 6).alias("concentration"),
    )
