"""Data-profiling and physical-layout advisor queries: functional-
dependency discovery, inclusion-dependency (foreign-key candidate)
discovery, a per-ingestion-bucket sortedness audit, and a shuffle-skew
planner that simulates reducer loads before a big shuffle.

Extension surface beyond the reference (`etl_app/etl_script.py:74-119`
has only filter/rename/aggregate) — these are the schema/layout
discovery steps a 100 TB lakehouse runs before committing to a join
strategy, a sort order, or a declared constraint. Every shape is a
grouped aggregate (distributed; no partitionless windows over data-
scale frames — the sortedness window partitions by ingestion bucket),
and every emitted double goes through the stable_round idiom.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table

# Candidate FDs to screen: (table, determinant, dependent). The point
# of the operator is the screen itself (exact violation counts), not
# the candidate enumeration policy — at 100 TB you seed this list from
# column-name heuristics or a sampled pre-pass.
_FD_PAIRS: tuple[tuple[str, str, str], ...] = (
    ("events", "event_id", "user_id"),
    ("events", "user_id", "event_type"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("documents", "doc_id", "lang"),
    ("documents", "source", "lang"),
)


def _fd_oracle() -> str:
    parts = []
    for tbl, det, dep in _FD_PAIRS:
        parts.append(
            f"""
SELECT '{tbl}' AS table_name, '{det}' AS determinant, '{dep}' AS dependent,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
       (sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0) AS fd_holds
FROM (SELECT {det} AS k, count(DISTINCT {dep}) AS ndep FROM {tbl} GROUP BY 1)"""
        )
    body = "\nUNION ALL".join(parts)
    return f"SELECT * FROM ({body}) ORDER BY table_name, determinant, dependent"


@register(
    "q_fd_discovery",
    oracle=_fd_oracle(),
    description=(
        "Functional-dependency screen: for each candidate (determinant -> "
        "dependent) pair, the exact number of determinant keys carrying "
        "more than one dependent value. FD holds iff zero violating keys. "
        "Pure two-level hash aggregation per pair (group by determinant, "
        "count distinct dependent, then a 1-row rollup) — fully "
        "distributed with partial aggregation; no windows, no sorts. At "
        "100 TB the per-pair scans share the table read via column "
        "pruning; violating-key EXAMPLES (not counted here) would be a "
        "top-k per pair, not a collect."
    ),
    tags=("profiling", "extension", "parity"),
)
def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tbl, det, dep in _FD_PAIRS:
        t = load_table(spark, sf_dir, tbl)
        per_key = t.groupBy(F.col(det).alias("k")).agg(
            F.countDistinct(dep).alias("ndep")
        )
        outs.append(
            per_key.agg(
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("ndep") > 1).cast("long")).cast("long").alias(
                    "n_violating_keys"
                ),
            ).select(
                F.lit(tbl).alias("table_name"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_keys",
                "n_violating_keys",
                (F.col("n_violating_keys") == 0).alias("fd_holds"),
            )
        )
    return reduce(DataFrame.unionByName, outs).orderBy(
        "table_name", "determinant", "dependent"
    )


# Candidate inclusion dependencies: (child table, child col, parent
# table, parent col). Mix of true FKs, a partial containment, and a
# negative control.
_IND_PAIRS: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_orderkey", "customer", "c_custkey"),
)


def _ind_oracle() -> str:
    parts = []
    for ct, cc, pt, pc in _IND_PAIRS:
        parts.append(
            f"""
SELECT '{ct}' AS child_table, '{cc}' AS child_col,
       '{pt}' AS parent_table, '{pc}' AS parent_col,
       CAST(count(*) AS BIGINT) AS n_child_keys,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_contained,
       (round((sum(CASE WHEN hit THEN 1 ELSE 0 END) * 1.0 / count(*)) * 1000000.0)
        / 1000000.0) AS containment,
       (sum(CASE WHEN hit THEN 1 ELSE 0 END) = count(*)) AS fk_candidate
FROM (
    SELECT c.k, p.k IS NOT NULL AS hit
    FROM (SELECT DISTINCT {cc} AS k FROM {ct} WHERE {cc} IS NOT NULL) c
    LEFT JOIN (SELECT DISTINCT {pc} AS k FROM {pt}) p ON c.k = p.k
)"""
        )
    body = "\nUNION ALL".join(parts)
    return (
        f"SELECT * FROM ({body}) "
        "ORDER BY child_table, child_col, parent_table, parent_col"
    )


@register(
    "q_fk_discovery",
    oracle=_ind_oracle(),
    description=(
        "Inclusion-dependency (foreign-key candidate) discovery: for each "
        "candidate (child.col -> parent.col) edge, the exact containment "
        "fraction of DISTINCT child keys present among parent keys. Both "
        "sides distinct-reduce BEFORE the join (the classic IND trick: "
        "the join runs on |distinct| rows, not |table| rows), and the "
        "parent side of a true FK is dimension-sized — broadcast. "
        "fk_candidate = containment == 1.0 feeds the join-order advisor's "
        "PK-FK cardinality assumption."
    ),
    tags=("profiling", "extension", "parity"),
)
def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for ct, cc, pt, pc in _IND_PAIRS:
        child = (
            load_table(spark, sf_dir, ct)
            .filter(F.col(cc).isNotNull())
            .select(F.col(cc).alias("k"))
            .distinct()
        )
        parent = (
            load_table(spark, sf_dir, pt)
            .select(F.col(pc).alias("k"))
            .distinct()
            .withColumn("hit", F.lit(True))
        )
        joined = child.join(parent, "k", "left").select(
            F.coalesce("hit", F.lit(False)).alias("hit")
        )
        outs.append(
            joined.agg(
                F.count(F.lit(1)).cast("long").alias("n_child_keys"),
                F.sum(F.col("hit").cast("long")).cast("long").alias("n_contained"),
            ).select(
                F.lit(ct).alias("child_table"),
                F.lit(cc).alias("child_col"),
                F.lit(pt).alias("parent_table"),
                F.lit(pc).alias("parent_col"),
                "n_child_keys",
                "n_contained",
                stable_round(
                    F.col("n_contained") / F.col("n_child_keys"), 6
                ).alias("containment"),
                (F.col("n_contained") == F.col("n_child_keys")).alias("fk_candidate"),
            )
        )
    return reduce(DataFrame.unionByName, outs).orderBy(
        "child_table", "child_col", "parent_table", "parent_col"
    )


@register(
    "q_sortedness_audit",
    oracle="""
WITH b AS (
    SELECT CAST(event_id // 4096 AS BIGINT) AS bucket, event_id, ts
    FROM events
),
adj AS (
    SELECT bucket,
           CASE WHEN lag(ts) OVER (PARTITION BY bucket ORDER BY event_id)
                     IS NULL THEN NULL
                WHEN ts >= lag(ts) OVER (PARTITION BY bucket ORDER BY event_id)
                     THEN 1 ELSE 0 END AS in_order
    FROM b
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(in_order) AS BIGINT) AS n_pairs,
       CAST(sum(in_order) AS BIGINT) AS n_ascending,
       (round((sum(in_order) * 1.0 / count(in_order)) * 1000000.0) / 1000000.0)
           AS sortedness,
       (sum(in_order) * 1.0 / count(in_order)) >= 0.99 AS skip_sort
FROM adj GROUP BY bucket
ORDER BY bucket
""",
    description=(
        "Physical-layout sortedness audit: within each ingestion bucket "
        "(event_id div 4096), the fraction of adjacent rows (ordered by "
        "event_id) whose timestamp is non-decreasing. Feeds the decision "
        "'is a sort needed before writing a ts-clustered layout, or is "
        "the data already ingest-ordered?' (nearly-sorted data makes "
        "zone maps effective without paying a global sort). The lag "
        "window partitions by bucket — bounded frames, fully distributed; "
        "the output is bucket-count-sized (metadata scale)."
    ),
    tags=("profiling", "layout", "extension", "parity"),
)
def q_sortedness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("event_id") / 4096).cast("long").alias("bucket"),
        "event_id",
        "ts",
    )
    w = Window.partitionBy("bucket").orderBy("event_id")
    adj = ev.select(
        "bucket",
        F.when(F.lag("ts").over(w).isNull(), F.lit(None).cast("int"))
        .when(F.col("ts") >= F.lag("ts").over(w), F.lit(1))
        .otherwise(F.lit(0))
        .alias("in_order"),
    )
    return (
        adj.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("in_order").cast("long").alias("n_pairs"),
            F.sum("in_order").cast("long").alias("n_ascending"),
        )
        .select(
            "bucket",
            "n_rows",
            "n_pairs",
            "n_ascending",
            stable_round(F.col("n_ascending") / F.col("n_pairs"), 6).alias(
                "sortedness"
            ),
            ((F.col("n_ascending") / F.col("n_pairs")) >= 0.99).alias("skip_sort"),
        )
        .orderBy("bucket")
    )


_PLANNER_P = 32  # reducer count being simulated
_PLANNER_SALT = 8


@register(
    "q_shuffle_skew_planner",
    oracle=f"""
WITH unsalted AS (
    SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {_PLANNER_P} AS part,
           count(*) AS load
    FROM events GROUP BY 1
),
salted AS (
    SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':'
               || CAST(event_id % {_PLANNER_SALT} AS VARCHAR)), 1, 8))::BIGINT
               % {_PLANNER_P} AS part,
           count(*) AS load
    FROM events GROUP BY 1
),
s AS (
    SELECT 'unsalted' AS strategy, count(*) AS parts_used,
           CAST(max(load) AS BIGINT) AS max_load, CAST(sum(load) AS BIGINT) AS total
    FROM unsalted
    UNION ALL
    SELECT 'salted{_PLANNER_SALT}' AS strategy, count(*) AS parts_used,
           CAST(max(load) AS BIGINT) AS max_load, CAST(sum(load) AS BIGINT) AS total
    FROM salted
)
SELECT strategy, CAST(parts_used AS BIGINT) AS parts_used, max_load,
       (round((total * 1.0 / {_PLANNER_P}) * 1000000.0) / 1000000.0) AS mean_load,
       (round((max_load / (total * 1.0 / {_PLANNER_P})) * 1000000.0) / 1000000.0)
           AS skew_ratio
FROM s
ORDER BY strategy
""",
    description=(
        "Shuffle-skew planner: simulates the reducer loads a "
        f"{_PLANNER_P}-way hash shuffle on user_id would produce, versus "
        f"the same shuffle with an {_PLANNER_SALT}-way salt appended to "
        "the key, and reports max/mean load (skew ratio) for each "
        "strategy — the pre-flight check that decides between a plain "
        "shuffle, a salted two-phase aggregate, and AQE skew handling. "
        "Cost is one group-by per strategy over the key column only "
        "(column-pruned scan); the per-partition load table is "
        f"{_PLANNER_P} rows — metadata scale. Uses md5-derived partition "
        "ids so both engines simulate the identical placement."
    ),
    tags=("diagnostics", "scale", "extension", "parity"),
)
def q_shuffle_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")

    def md5_part(expr):
        return (
            F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("long")
            % _PLANNER_P
        )

    unsalted = ev.groupBy(
        md5_part(F.col("user_id").cast("string")).alias("part")
    ).agg(F.count(F.lit(1)).alias("load"))
    salted = ev.groupBy(
        md5_part(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                (F.col("event_id") % _PLANNER_SALT).cast("string"),
            )
        ).alias("part")
    ).agg(F.count(F.lit(1)).alias("load"))

    def summarize(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("parts_used"),
            F.max("load").cast("long").alias("max_load"),
            F.sum("load").cast("long").alias("total"),
        ).select(
            F.lit(name).alias("strategy"),
            "parts_used",
            "max_load",
            stable_round(F.col("total") / _PLANNER_P, 6).alias("mean_load"),
            stable_round(
                F.col("max_load") / (F.col("total") / _PLANNER_P), 6
            ).alias("skew_ratio"),
        )

    return summarize(unsalted, "unsalted").unionByName(
        summarize(salted, f"salted{_PLANNER_SALT}")
    ).orderBy("strategy")


# ---------------------------------------------------------------------------
# Partition-count advisor + stratified k-fold (continuation-5, wave F)

# Per-table physical model: fixed in-memory bytes per row (8 for
# long/double/timestamp, 4 for int) plus variable-width columns
# (avg string bytes + 4 length overhead each); embeddings' float array
# is 64*4 data + 16 header. The MODEL constants are shared between the
# Spark plan and the oracle, so the advisor's arithmetic is identical.
_ADVISOR_TABLES: dict[str, tuple[int, tuple[str, ...]]] = {
    "lineitem": (8 * 9 + 4, ("l_returnflag", "l_linestatus")),
    "orders": (8 * 4, ("o_orderstatus", "o_orderpriority")),
    "events": (8 * 4, ("event_type", "props")),
    "documents": (8 * 2, ("text", "lang", "source")),
    "embeddings": (8 + 272 + 4, ()),
}
_TARGET_PARTITION_BYTES = 128 * 1024 * 1024
_TARGET_FILE_BYTES = 1024 * 1024 * 1024


def _advisor_oracle() -> str:
    parts = []
    for tbl, (fixed, varcols) in _ADVISOR_TABLES.items():
        var_sum = (
            " + ".join(f"sum(length({c}) + 4)" for c in varcols) if varcols else "0"
        )
        parts.append(
            f"""
SELECT '{tbl}' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) * {fixed} + {var_sum} AS BIGINT) AS est_bytes
FROM {tbl}"""
        )
    body = "\nUNION ALL".join(parts)
    return f"""
WITH est AS ({body})
SELECT table_name, n_rows,
       (round((est_bytes / 1048576.0) * 1000000.0) / 1000000.0) AS est_mb,
       CAST(greatest(1, ceil(est_bytes * 1.0 / {_TARGET_PARTITION_BYTES}))
            AS BIGINT) AS shuffle_partitions_128mb,
       CAST(greatest(1, ceil(est_bytes * 1.0 / {_TARGET_FILE_BYTES}))
            AS BIGINT) AS files_1gb,
       CAST(n_rows // greatest(1, ceil(est_bytes * 1.0 / {_TARGET_PARTITION_BYTES}))
            AS BIGINT) AS rows_per_partition
FROM est
ORDER BY table_name
"""


@register(
    "q_partition_count_advisor",
    oracle=_advisor_oracle(),
    description=(
        "Partition-count / file-size advisor: per table, estimated "
        "in-memory bytes from exact column-width accounting (fixed "
        "widths per type + exact summed string lengths), then the "
        "recommended shuffle partition count at the 128 MB target and "
        "output file count at the 1 GB compaction target — the sizing "
        "pre-flight for spark.sql.shuffle.partitions and "
        "maxPartitionBytes that q_compaction_plan assumes and "
        "q_shuffle_skew_planner refines (this one sizes VOLUME, that "
        "one shapes KEY DISTRIBUTION). One column-pruned aggregate per "
        "table; at 100 TB the same fold runs per partition-directory to "
        "drive incremental compaction."
    ),
    tags=("diagnostics", "scale", "extension", "parity"),
)
def q_partition_count_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tbl, (fixed, varcols) in _ADVISOR_TABLES.items():
        t = load_table(spark, sf_dir, tbl)
        var_total = (
            sum((F.length(c) + 4) for c in varcols) if varcols else F.lit(0)
        )
        if varcols:
            agg = t.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(var_total).cast("long").alias("var_bytes"),
            )
        else:
            agg = t.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.lit(0).cast("long").alias("var_bytes"),
            )
        outs.append(
            agg.select(
                F.lit(tbl).alias("table_name"),
                "n_rows",
                (F.col("n_rows") * fixed + F.col("var_bytes"))
                .cast("long")
                .alias("est_bytes"),
            )
        )
    est = reduce(DataFrame.unionByName, outs)
    parts = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("est_bytes") * 1.0 / _TARGET_PARTITION_BYTES).cast("long"),
    )
    files = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("est_bytes") * 1.0 / _TARGET_FILE_BYTES).cast("long"),
    )
    return est.select(
        "table_name",
        "n_rows",
        stable_round(F.col("est_bytes") / 1048576.0, 6).alias("est_mb"),
        parts.alias("shuffle_partitions_128mb"),
        files.alias("files_1gb"),
        F.floor(F.col("n_rows") / parts).cast("long").alias("rows_per_partition"),
    ).orderBy("table_name")


_KFOLD = 5


@register(
    "q_stratified_kfold",
    oracle=f"""
WITH ranked AS (
    SELECT label, vec_id,
           row_number() OVER (PARTITION BY label
               ORDER BY ('0x' || substring(md5('fold-v1:'
                   || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT ASC,
                   vec_id ASC) AS rn
    FROM embeddings
),
assigned AS (
    SELECT label, CAST((rn - 1) % {_KFOLD} AS BIGINT) AS fold
    FROM ranked
)
SELECT fold, label, CAST(count(*) AS BIGINT) AS n_vecs
FROM assigned GROUP BY 1, 2
ORDER BY fold, label
""",
    description=(
        "Exactly-stratified k-fold assignment: within each label "
        "stratum, rows rank by salted content hash (repartition-stable, "
        "no rand()) and fold = (rank-1) mod k — every stratum's fold "
        "sizes differ by at most 1, the guarantee plain hash-mod-k "
        "(q_hash_split) does NOT give on small strata. The CV-split "
        "primitive under q_kfold_cv_ridge, emitted as the per-(fold, "
        "label) count audit. The rank window partitions by label — "
        "fully distributed; for a label so hot it dominates a partition "
        "the bucketed_rank carry applies within the stratum."
    ),
    tags=("mlops", "sampling", "extension", "parity"),
)
def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    skey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("fold-v1:"), F.col("vec_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("label").orderBy(skey.asc(), F.col("vec_id").asc())
    assigned = emb.select(
        "label", ((F.row_number().over(w) - 1) % _KFOLD).cast("long").alias("fold")
    )
    return (
        assigned.groupBy("fold", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .orderBy("fold", "label")
    )


def _health_oracle() -> str:
    return f"""
WITH fd AS ({_fd_oracle()}),
ind AS ({_ind_oracle()}),
srt AS (
    SELECT bucket, sortedness, skip_sort FROM (
        WITH b AS (
            SELECT CAST(event_id // 4096 AS BIGINT) AS bucket, event_id, ts
            FROM events
        ),
        adj AS (
            SELECT bucket,
                   CASE WHEN lag(ts) OVER (PARTITION BY bucket ORDER BY event_id)
                             IS NULL THEN NULL
                        WHEN ts >= lag(ts) OVER (PARTITION BY bucket
                             ORDER BY event_id) THEN 1 ELSE 0 END AS in_order
            FROM b
        )
        SELECT bucket,
               (round((sum(in_order) * 1.0 / count(in_order)) * 1000000.0)
                / 1000000.0) AS sortedness,
               (sum(in_order) * 1.0 / count(in_order)) >= 0.99 AS skip_sort
        FROM adj GROUP BY bucket
    )
),
adv AS ({_advisor_oracle()}),
long AS (
    SELECT 'fd' AS section,
           table_name || '.' || determinant || '->' || dependent AS entity,
           'violating_keys' AS metric,
           CAST(n_violating_keys AS DOUBLE) AS value,
           fd_holds AS ok
    FROM fd
    UNION ALL
    SELECT 'fk' AS section,
           child_table || '.' || child_col || '->' || parent_table || '.'
               || parent_col AS entity,
           'containment' AS metric, containment AS value, fk_candidate AS ok
    FROM ind
    UNION ALL
    SELECT 'layout' AS section,
           'events.bucket_' || CAST(bucket AS VARCHAR) AS entity,
           'sortedness' AS metric, sortedness AS value, skip_sort AS ok
    FROM srt
    UNION ALL
    SELECT 'size' AS section, table_name AS entity,
           'est_mb' AS metric, est_mb AS value,
           (shuffle_partitions_128mb <= 10000) AS ok
    FROM adv
)
SELECT * FROM long ORDER BY section, entity, metric
"""


@register(
    "q_table_health_report",
    oracle=_health_oracle(),
    description=(
        "Profiling capstone: the FD screen, FK-candidate containment, "
        "per-bucket sortedness audit, and partition-sizing advisor "
        "composed as ONE lazy long-format report (section, entity, "
        "metric, value, ok) — the single artifact a data platform "
        "publishes per table per day, and the composition proof that "
        "the profiling operators share scans and union without "
        "materialization barriers (the q_curation_pipeline_v2 pattern "
        "applied to the metadata plane). Each section's arithmetic is "
        "identical to its standalone query, so the composition itself "
        "is value-hash-checked."
    ),
    tags=("profiling", "capstone", "extension", "parity"),
)
def q_table_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    fd = q_fd_discovery(spark, sf_dir).select(
        F.lit("fd").alias("section"),
        F.concat(
            F.col("table_name"),
            F.lit("."),
            F.col("determinant"),
            F.lit("->"),
            F.col("dependent"),
        ).alias("entity"),
        F.lit("violating_keys").alias("metric"),
        F.col("n_violating_keys").cast("double").alias("value"),
        F.col("fd_holds").alias("ok"),
    )
    fk = q_fk_discovery(spark, sf_dir).select(
        F.lit("fk").alias("section"),
        F.concat(
            F.col("child_table"),
            F.lit("."),
            F.col("child_col"),
            F.lit("->"),
            F.col("parent_table"),
            F.lit("."),
            F.col("parent_col"),
        ).alias("entity"),
        F.lit("containment").alias("metric"),
        F.col("containment").alias("value"),
        F.col("fk_candidate").alias("ok"),
    )
    srt = q_sortedness_audit(spark, sf_dir).select(
        F.lit("layout").alias("section"),
        F.concat(F.lit("events.bucket_"), F.col("bucket").cast("string")).alias(
            "entity"
        ),
        F.lit("sortedness").alias("metric"),
        F.col("sortedness").alias("value"),
        F.col("skip_sort").alias("ok"),
    )
    adv = q_partition_count_advisor(spark, sf_dir).select(
        F.lit("size").alias("section"),
        F.col("table_name").alias("entity"),
        F.lit("est_mb").alias("metric"),
        F.col("est_mb").alias("value"),
        (F.col("shuffle_partitions_128mb") <= 10000).alias("ok"),
    )
    return (
        fd.unionByName(fk)
        .unionByName(srt)
        .unionByName(adv)
        .orderBy("section", "entity", "metric")
    )


# Categorical columns to profile: (table, column).
_ENTROPY_COLS: tuple[tuple[str, str], ...] = (
    ("events", "event_type"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("documents", "lang"),
    ("documents", "source"),
    ("customer", "c_mktsegment"),
)


def _entropy_oracle() -> str:
    parts = []
    for tbl, col in _ENTROPY_COLS:
        parts.append(
            f"""
SELECT '{tbl}' AS table_name, '{col}' AS column_name,
       CAST(count(*) AS BIGINT) AS ndv,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(-(cnt * 1.0 / tot) * ln(cnt * 1.0 / tot)
                           * 1000000000.0) AS BIGINT)) AS BIGINT) AS h_q
FROM (
    SELECT {col} AS v, count(*) AS cnt,
           sum(count(*)) OVER () AS tot
    FROM {tbl} GROUP BY 1
)"""
        )
    body = "\nUNION ALL".join(parts)
    return f"""
WITH h AS ({body})
SELECT table_name, column_name, ndv, n_rows,
       (h_q / 1000000000.0) AS entropy_nats,
       CASE WHEN ndv <= 1 THEN 0.0
            ELSE (round(((h_q / 1000000000.0) / ln(ndv)) * 1000000.0) / 1000000.0)
       END AS normalized_entropy
FROM h
ORDER BY table_name, column_name
"""


@register(
    "q_column_entropy_profile",
    oracle=_entropy_oracle(),
    description=(
        "Shannon-entropy profile of the categorical columns: per "
        "column, NDV, H = -sum p ln p over the value distribution, and "
        "H/ln(NDV) normalized to [0,1] (1 = uniform, near 0 = one "
        "dominant value) — the column-level uniformity signal that "
        "feeds q_encoding_advisor (low entropy -> dictionary/RLE wins) "
        "and flags skewed join/agg keys before q_shuffle_skew_planner "
        "simulates placement. Each column is one grouped count (the "
        "value-domain frame is categorical-cardinality-sized, so the "
        "share window rides a tiny grid); per-value -p ln p terms "
        "quantize to 1e-9 BIGINTs before the order-free sum."
    ),
    tags=("profiling", "extension", "parity"),
)
def q_column_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tbl, col in _ENTROPY_COLS:
        t = load_table(spark, sf_dir, tbl)
        counts = t.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        tot = counts.agg(F.sum("cnt").alias("tot"))
        shares = counts.crossJoin(F.broadcast(tot))
        p = F.col("cnt") * 1.0 / F.col("tot")
        term = F.round(-p * F.log(p) * 1000000000.0).cast("long")
        outs.append(
            shares.agg(
                F.count(F.lit(1)).cast("long").alias("ndv"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.sum(term).cast("long").alias("h_q"),
            ).select(
                F.lit(tbl).alias("table_name"),
                F.lit(col).alias("column_name"),
                "ndv",
                "n_rows",
                "h_q",
            )
        )
    h = reduce(DataFrame.unionByName, outs)
    return h.select(
        "table_name",
        "column_name",
        "ndv",
        "n_rows",
        (F.col("h_q") / 1000000000.0).alias("entropy_nats"),
        F.when(F.col("ndv") <= 1, F.lit(0.0))
        .otherwise(
            stable_round((F.col("h_q") / 1000000000.0) / F.log("ndv"), 6)
        )
        .alias("normalized_entropy"),
    ).orderBy("table_name", "column_name")


_FRESHNESS_ASOF = "2024-01-31 00:00:00"
_FRESHNESS_SLA_HOURS = 24


@register(
    "q_data_freshness_audit",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_event,
       CAST((epoch_us(TIMESTAMP '{_FRESHNESS_ASOF}') - epoch_us(max(ts)))
            // 3600000000 AS BIGINT) AS hours_stale,
       ((epoch_us(TIMESTAMP '{_FRESHNESS_ASOF}') - epoch_us(max(ts)))
            // 3600000000) > {_FRESHNESS_SLA_HOURS} AS sla_breach
FROM events GROUP BY event_type
ORDER BY event_type
""",
    description=(
        "Data-freshness audit per event stream: latest event timestamp, "
        "staleness in whole hours against a fixed as-of reference "
        f"(pipelines pass now(); the fixture pins {_FRESHNESS_ASOF} so "
        "the check is reproducible), and a "
        f"{_FRESHNESS_SLA_HOURS}h-SLA breach flag — the first panel on "
        "any ingestion dashboard and the trigger for "
        "q_watermark_audit's deeper lateness analysis. One grouped "
        "max/count — partial-aggregated, no windows; at 100 TB this "
        "reads only partition-level max statistics when the layout is "
        "time-partitioned (the zone-map point q_pruning_stats makes)."
    ),
    tags=("profiling", "quality", "extension", "parity"),
)
def q_data_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    asof = F.lit(_FRESHNESS_ASOF).cast("timestamp")
    stale_h = F.floor(
        (F.unix_micros(asof) - F.unix_micros(F.max("ts"))) / 3600000000
    ).cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_event"),
            stale_h.alias("hours_stale"),
            (stale_h > _FRESHNESS_SLA_HOURS).alias("sla_breach"),
        )
        .orderBy("event_type")
    )


# Columns to null-profile: (table, column).
_NULL_COLS: tuple[tuple[str, str], ...] = (
    ("events", "event_id"),
    ("events", "user_id"),
    ("events", "event_type"),
    ("events", "value"),
    ("events", "props"),
    ("documents", "text"),
    ("documents", "lang"),
    ("documents", "source"),
    ("orders", "o_custkey"),
    ("orders", "o_totalprice"),
)


def _null_oracle() -> str:
    parts = []
    for tbl, col in _NULL_COLS:
        parts.append(
            f"""
SELECT '{tbl}' AS table_name, '{col}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({col}) AS BIGINT) AS n_null,
       (round(((count(*) - count({col})) * 1.0 / count(*)) * 1000000.0)
        / 1000000.0) AS null_rate,
       (count(*) - count({col})) = 0 AS complete
FROM {tbl}"""
        )
    body = "\nUNION ALL".join(parts)
    return f"SELECT * FROM ({body}) ORDER BY table_name, column_name"


@register(
    "q_null_rate_profile",
    oracle=_null_oracle(),
    description=(
        "Null-rate (completeness) profile per column: exact null counts "
        "and rates with a completeness flag — the third leg of the "
        "profiling triad (q_column_entropy_profile: distribution shape; "
        "q_fd_discovery/q_fk_discovery: relationships; this: "
        "completeness), and the check that feeds "
        "operators.quality.check_expectations thresholds. count(col) "
        "vs count(*) per table in one partial-aggregated pass each — "
        "all columns of a table share one scan via column pruning."
    ),
    tags=("profiling", "quality", "extension", "parity"),
)
def q_null_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    by_table: dict[str, list[str]] = {}
    for tbl, col in _NULL_COLS:
        by_table.setdefault(tbl, []).append(col)
    outs = []
    for tbl, cols in by_table.items():
        t = load_table(spark, sf_dir, tbl)
        agg = t.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            *[F.count(c).cast("long").alias(f"__nn_{c}") for c in cols],
        )
        for c in cols:
            outs.append(
                agg.select(
                    F.lit(tbl).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    F.col("__n").alias("n_rows"),
                    (F.col("__n") - F.col(f"__nn_{c}")).cast("long").alias("n_null"),
                    stable_round(
                        (F.col("__n") - F.col(f"__nn_{c}")) * 1.0 / F.col("__n"), 6
                    ).alias("null_rate"),
                    ((F.col("__n") - F.col(f"__nn_{c}")) == 0).alias("complete"),
                )
            )
    return reduce(DataFrame.unionByName, outs).orderBy("table_name", "column_name")
