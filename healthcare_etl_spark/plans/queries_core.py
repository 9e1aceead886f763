"""Core scan/projection/filter/join parity queries (SURVEY.md §2.10).

One named query per operator row of SURVEY.md §2.1-§2.3, each with a
DuckDB oracle. All run on the driver fixtures (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_spark.operators import (
    coerce_numeric,
    drop_columns,
    drop_null_rows,
    filter_eq,
    normalize_columns,
    project,
)
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table
from healthcare_etl_spark.functions.rounding import stable_round


@register(
    "q_scan_project",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    description="S1+P5: columnar scan with projection pruned into the reader",
    tags=("parity",),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return project(c, ["c_custkey", "c_name", "c_mktsegment"])


@register(
    "q_select_star",
    oracle="SELECT r_regionkey, r_name FROM region",
    description="P7/S3: SELECT * passthrough (app.py:31)",
    tags=("parity",),
)
def q_select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("*")


@register(
    "q_normalize_columns",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
    description="P1: rename-all through strip/lower/underscore convention (etl_script.py:74-75)",
    tags=("parity",),
)
def q_normalize_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ugly = li.select(
        F.col("l_orderkey").alias(" L OrderKey "),
        F.col("l_linenumber").alias("L LineNumber"),
        F.col("l_quantity").alias("L/Quantity"),
        F.col("l_returnflag").alias("  L RETURNFLAG"),
    )
    # toDF rename collapses into the scan: still a 4-column parquet read.
    return normalize_columns(ugly).toDF(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "q_try_cast_coerce",
    oracle="""
WITH raw AS (
    SELECT CASE WHEN l_linenumber % 4 = 0 THEN 'N/A'
                ELSE CAST(l_quantity AS VARCHAR) END AS qty_str
    FROM lineitem
)
SELECT count(*)                                        AS n_rows,
       count(TRY_CAST(qty_str AS DOUBLE))              AS n_parsed,
       count(*) - count(TRY_CAST(qty_str AS DOUBLE))   AS n_nulls,
       (round((avg(TRY_CAST(qty_str AS DOUBLE))) * 1000000.0) / 1000000.0)      AS avg_qty
FROM raw
""",
    description="P2/F2: to_numeric(errors='coerce') ≡ try_cast; NULL on unparseable (etl_script.py:79-86)",
    tags=("parity",),
)
def q_try_cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    raw = li.select(
        F.when(F.col("l_linenumber") % 4 == 0, F.lit("N/A"))
        .otherwise(F.col("l_quantity").cast("string"))
        .alias("qty_str")
    )
    coerced = coerce_numeric(raw.withColumn("qty", F.col("qty_str")), ["qty"])
    return coerced.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("qty").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("qty")).alias("n_nulls"),
        stable_round(F.avg("qty"), 6).alias("avg_qty"),
    )


@register(
    "q_dropna",
    oracle="""
WITH raw AS (
    SELECT CASE WHEN l_linenumber % 4 = 0 THEN NULL ELSE l_quantity END AS qty,
           CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_extendedprice END AS price
    FROM lineitem
)
SELECT count(*) AS n_kept, (round((sum(qty)) * 10000.0) / 10000.0) AS sum_qty
FROM raw WHERE qty IS NOT NULL AND price IS NOT NULL
""",
    description="P3: dropna(subset=[...]) (etl_script.py:93)",
    tags=("parity",),
)
def q_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    raw = li.select(
        F.when(F.col("l_linenumber") % 4 == 0, None).otherwise(F.col("l_quantity")).alias("qty"),
        F.when(F.col("l_orderkey") % 7 == 0, None)
        .otherwise(F.col("l_extendedprice"))
        .alias("price"),
    )
    kept = drop_null_rows(raw, ["qty", "price"])
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        stable_round(F.sum("qty"), 4).alias("sum_qty"),
    )


@register(
    "q_filter_eq",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem WHERE l_returnflag = 'R'
""",
    description="P4: equality filter, pushed into the parquet scan (etl_script.py:99)",
    tags=("parity",),
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return filter_eq(li, "l_returnflag", "R").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


@register(
    "q_drop_cols",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders",
    description="P6: drop columns (etl_script.py:112)",
    tags=("parity",),
)
def q_drop_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return drop_columns(o, ["o_orderstatus", "o_orderdate"])


@register(
    "q_inner_join",
    oracle="""
SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    description="J1: inner equi-join, dimension side broadcast (etl_script.py:119)",
    tags=("parity",),
)
def q_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_left_join",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_totalprice > 100000
""",
    description="Left outer join with a non-equi residual condition",
    tags=("extra-relational",),
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 100000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    description="Left-semi join (EXISTS): no fact-side duplication, broadcastable",
    tags=("extra-relational",),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
)
""",
    description=(
        "Left-anti join (NOT EXISTS): customers with no orders since 1999 "
        "(date-scoped so the result is non-empty — every fixture customer has "
        "at least one all-time order, and a vacuously-empty check proves nothing)"
    ),
    tags=("extra-relational",),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    c = load_table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    description="Set op: UNION (distinct) of two key sets",
    tags=("extra-relational",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    description="Set op: INTERSECT of customer and supplier nations",
    tags=("extra-relational",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name)                                   AS name_upper,
       trim(lower(c_mktsegment))                       AS seg_lower,
       regexp_replace(c_name, '[0-9]+', '#', 'g')      AS name_masked,
       length(c_name)                                  AS name_len,
       substr(c_name, 1, 8)                            AS name_prefix,
       concat(c_name, ':', c_mktsegment)               AS name_seg
FROM customer
""",
    description="F1 data-level equivalents: trim/lower/upper/regexp_replace/length/substr/concat",
    tags=("parity",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.trim(F.lower("c_mktsegment")).alias("seg_lower"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
    )


@register(
    "q_date_parts",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT)  AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       count(*)                        AS n_orders,
       (round((sum(o_totalprice)) * 100.0) / 100.0)     AS total_price
FROM orders GROUP BY 1, 2
""",
    description="Date/time functions: year/month extraction + monthly rollup",
    tags=("parity",),
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q_sql_surface",
    oracle="""
SELECT n_name AS nation, count(*) AS n_customers, (round((avg(c_acctbal)) * 1000000.0) / 1000000.0) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    description=(
        "The spark.sql(...) entry point (SURVEY §3.3): same Catalyst plan as the "
        "DataFrame API, registered over temp views — the engine's SQL surface"
    ),
    tags=("parity", "sql"),
)
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT n_name AS nation, count(*) AS n_customers,
               (round((avg(c_acctbal)) * 1000000.0) / 1000000.0) AS avg_acctbal
        FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@register(
    "q_upsert_latest",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
) WHERE rn = 1
""",
    description=(
        "Upsert compaction (operators.scale.latest_snapshot): newest order per "
        "customer — the batch MERGE/latest-wins pattern, one shuffle + "
        "WindowGroupLimit"
    ),
    tags=("extra-relational", "scale"),
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import latest_snapshot

    o = load_table(spark, sf_dir, "orders")
    latest = latest_snapshot(
        o, key="o_custkey", order_by=[F.desc("o_orderdate"), F.desc("o_orderkey")]
    )
    return latest.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


@register(
    "q_profile",
    oracle="""
SELECT 'c_custkey' AS "column",
       sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       count(DISTINCT c_custkey) AS n_distinct,
       min(CAST(c_custkey AS VARCHAR)) AS min_str,
       max(CAST(c_custkey AS VARCHAR)) AS max_str
FROM customer
UNION ALL
SELECT 'c_name', sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT c_name), min(c_name), max(c_name) FROM customer
UNION ALL
SELECT 'c_nationkey', sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT c_nationkey),
       min(CAST(c_nationkey AS VARCHAR)), max(CAST(c_nationkey AS VARCHAR)) FROM customer
UNION ALL
SELECT 'c_mktsegment', sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)::BIGINT,
       count(DISTINCT c_mktsegment), min(c_mktsegment), max(c_mktsegment) FROM customer
""",
    description=(
        "Single-pass column profiler (operators.quality.profile): nulls, distinct, "
        "min/max per column as long-form rows — the data-quality pass every "
        "ingest pipeline runs"
    ),
    tags=("quality", "extension"),
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.quality import profile

    c = load_table(spark, sf_dir, "customer")
    return profile(c, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])


@register(
    "q_csv_scan",
    oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name)              AS first_name
FROM nation GROUP BY n_regionkey
""",
    description=(
        "S1 literal: the CSV reader itself (readers.read_csv, reference "
        "etl_script.py:49,52 pd.read_csv with dtype override) on a CSV "
        "materialization of nation, aggregated. The query materializes "
        "the CSV from the parquet fixture first (25 rows, deterministic "
        "content) so the oracle row exercises the actual CSV scan path — "
        "explicit schema, no inference, PERMISSIVE mode."
    ),
    tags=("parity",),
)
def q_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pyspark.sql import types as T

    from healthcare_etl_spark.sources.readers import read_csv

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    csv_dir = os.path.join(tempfile.gettempdir(), "healthcare_etl_spark_csv", sf_tag)
    nation.write.mode("overwrite").option("header", True).csv(csv_dir)

    # types mirror the parquet fixture (int32) so the round-trip is exact
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_csv(spark, csv_dir, schema=schema)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "q_fuzzy_pairs",
    oracle="""
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
""",
    description=(
        "Blocked fuzzy matching (entity resolution): candidate pairs are "
        "generated by a blocking equi-join on nation — NEVER an all-pairs "
        "cross join — and only candidates pay the edit-distance verify "
        "(levenshtein <= 2). The block-then-verify shape is the same "
        "contract as the LSH dedup family; at 100 TB the blocking key "
        "is a composite (prefix/phonetic/sorted-ngram) chosen to bound "
        "block sizes."
    ),
    tags=("core", "extension"),
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "nk")
        .filter(F.col("cust_a") < F.col("cust_b"))
        .filter(dist <= 2)
        .select("cust_a", "cust_b", dist.cast("long").alias("edit_dist"))
    )


@register(
    "q_json_scan",
    oracle="""
SELECT r_regionkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(r_name)              AS first_name
FROM region GROUP BY r_regionkey
""",
    description=(
        "JSON-lines scan literal (sibling of q_csv_scan): region "
        "materialized as JSONL, then read back through readers.read_json "
        "with its MANDATORY explicit schema (inference over JSON needs a "
        "full extra pass — never acceptable at 100 TB, so unlike CSV there "
        "is no inference fallback), aggregated so the oracle row exercises "
        "the actual JSON scan path."
    ),
    tags=("parity",),
)
def q_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.readers import read_json

    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    json_dir = os.path.join(tempfile.gettempdir(), "healthcare_etl_spark_json", sf_tag)
    region.write.mode("overwrite").json(json_dir)

    back = read_json(spark, json_dir, "r_regionkey INT, r_name STRING")
    return back.groupBy("r_regionkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("r_name").alias("first_name"),
    )


@register(
    "q_orc_scan",
    oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       max(n_name)              AS last_name
FROM nation GROUP BY n_regionkey
""",
    description=(
        "ORC scan literal (completes the CSV/JSON/ORC source trio): nation "
        "materialized as ORC and read back through readers.read_orc — "
        "columnar with predicate pushdown like parquet — aggregated so the "
        "oracle row exercises the actual ORC scan path."
    ),
    tags=("parity",),
)
def q_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.readers import read_orc

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    orc_dir = os.path.join(tempfile.gettempdir(), "healthcare_etl_spark_orc", sf_tag)
    nation.write.mode("overwrite").orc(orc_dir)

    back = read_orc(spark, orc_dir)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("n_name").alias("last_name"),
    )


@register(
    "q_delta_scan",
    oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name)              AS first_name
FROM nation WHERE n_regionkey <> 0
GROUP BY n_regionkey
""",
    description=(
        "Delta Lake table scan on vanilla Spark (sources.delta: the "
        "public delta.io transaction protocol implemented directly — "
        "JSON commit replay, add/remove resolution, partition-value "
        "reconstruction, declared-schema enforcement). The query "
        "materializes nation as a Delta table partitioned by "
        "n_regionkey (version 0), appends a metadata-only partition "
        "DELETE of region 0 (version 1, remove actions — data files "
        "untouched), then reads the LATEST version; the oracle is the "
        "equivalent filtered aggregate, so commit replay + remove "
        "semantics + partition reconstruction are value-hash-checked. "
        "The log replay is metadata-scale (bounded by file count) and "
        "the data read is one pruned parquet scan per live partition "
        "group — pushdown and column pruning reach the files unchanged. "
        "Time travel (version=0 == the pre-delete table) is unit-tested."
    ),
    tags=("sources", "extension"),
)
def q_delta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.delta import (
        delete_partition,
        read_delta_table,
        write_delta_table,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    # Per-process-unique fixture dir: a fixed shared path races when two
    # builds at the same scale factor overlap (parallel pytest workers /
    # concurrent bench runs) — one overwrites the _delta_log the other
    # is replaying. applicationId + pid keeps reruns within one session
    # idempotent while isolating concurrent processes.
    table = os.path.join(
        tempfile.gettempdir(),
        f"healthcare_etl_spark_delta_{os.getpid()}_{spark.sparkContext.applicationId}",
        sf_tag,
    )
    write_delta_table(nation, table, partition_by=["n_regionkey"])
    delete_partition(table, "n_regionkey", "0")
    back = read_delta_table(spark, table)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "q_pyds_scan",
    oracle="""
SELECT i                         AS doc_id,
       'src' || CAST(i % 4 AS VARCHAR) AS source,
       array_to_string(list_transform(range(0, 8),
           t -> 'tok' || CAST((i * 1103515245 + 12345 * t) % 997 AS VARCHAR)), ' ')
                                 AS text,
       CAST(8 AS BIGINT)         AS n_tokens
FROM generate_series(0, 499) s(i)
""",
    description=(
        "Custom connector via the Spark 4 Python Data Source API "
        "(sources.synthetic.SyntheticDocsDataSource): partition-parallel "
        "batch reader (8 InputPartitions, each executor task generates "
        "only its own contiguous id range — no driver materialization), "
        "deterministic arithmetic content. The oracle regenerates the "
        "identical 500 rows from generate_series, so the *connector "
        "itself* is value-hash-checked end to end — the extension point "
        "for feeds Spark has no built-in reader for (internal APIs, "
        "bespoke formats)."
    ),
    tags=("sources", "extension"),
)
def q_pyds_scan(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001 - generated source
    from healthcare_etl_spark.sources.synthetic import register_synthetic_source

    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n_rows", 500)
        .option("n_partitions", 8)
        .load()
    )


@register(
    "q_integrity_audit",
    oracle="""
SELECT 'fk_lineitem_orders' AS check_name, 'lineitem' AS table_name,
       CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)
           AS n_violations,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
UNION ALL
SELECT 'fk_orders_customer', 'orders',
       CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'pk_orders_unique', 'orders',
       CAST((SELECT coalesce(sum(cnt - 1), 0) FROM
             (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'unique_lineitem_orderkey_lineno', 'lineitem',
       CAST((SELECT coalesce(sum(cnt - 1), 0) FROM
             (SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey, l_linenumber
              HAVING count(*) > 1)) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'not_null_events_value', 'events',
       CAST((SELECT count(*) FROM events WHERE value IS NULL) AS BIGINT),
       CAST((SELECT count(*) FROM events) AS BIGINT)
UNION ALL
SELECT 'range_events_value_0_100', 'events',
       CAST((SELECT count(*) FROM events WHERE value < 0 OR value > 100) AS BIGINT),
       CAST((SELECT count(*) FROM events) AS BIGINT)
""",
    description=(
        "dbt-style data-integrity audit in one result set: referential "
        "integrity (orphaned lineitem->orders and orders->customer "
        "foreign keys, via LEFT JOIN null-probe — at scale these are "
        "shuffle joins on the key, never broadcast of the fact), "
        "primary-key uniqueness (surplus-row counts; the fixture's "
        "(l_orderkey, l_linenumber) pair is deliberately NOT unique, so "
        "this row is nonzero and the oracle discriminates), NOT NULL "
        "and range checks (single-scan conditional counts). Each check "
        "partial-aggregates independently; the union is check-count-"
        "sized. The composable per-check form lives in "
        "operators.quality.check_expectations."
    ),
    tags=("quality", "extension", "parity"),
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")

    def row(name: str, table: str, viol, rows):
        return viol.crossJoin(rows).select(
            F.lit(name).alias("check_name"),
            F.lit(table).alias("table_name"),
            F.col("v").cast("long").alias("n_violations"),
            F.col("n").cast("long").alias("n_rows"),
        )

    fk_li = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left")
        .filter(o["o_orderkey"].isNull())
        .agg(F.count(F.lit(1)).alias("v"))
    )
    fk_o = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left")
        .filter(c["c_custkey"].isNull())
        .agg(F.count(F.lit(1)).alias("v"))
    )
    pk_o = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("v"))
    )
    uq_li = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("v"))
    )
    nn_ev = ev.filter(F.col("value").isNull()).agg(F.count(F.lit(1)).alias("v"))
    rg_ev = ev.filter((F.col("value") < 0) | (F.col("value") > 100)).agg(
        F.count(F.lit(1)).alias("v")
    )
    n_li = li.agg(F.count(F.lit(1)).alias("n"))
    n_o = o.agg(F.count(F.lit(1)).alias("n"))
    n_ev = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        row("fk_lineitem_orders", "lineitem", fk_li, n_li)
        .unionAll(row("fk_orders_customer", "orders", fk_o, n_o))
        .unionAll(row("pk_orders_unique", "orders", pk_o, n_o))
        .unionAll(row("unique_lineitem_orderkey_lineno", "lineitem", uq_li, n_li))
        .unionAll(row("not_null_events_value", "events", nn_ev, n_ev))
        .unionAll(row("range_events_value_0_100", "events", rg_ev, n_ev))
    )


@register(
    "q_delta_dv_scan",
    oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name)              AS first_name
FROM nation WHERE n_nationkey % 3 <> 0
GROUP BY n_regionkey
""",
    description=(
        "Delta Lake DELETION-VECTOR scan on vanilla Spark (sources.delta + "
        "sources.roaring — the public PROTOCOL.md DV contract implemented "
        "directly): materialize nation as a Delta table, row-level DELETE "
        "of every third nation via an inline Z85 RoaringBitmapArray "
        "deletion vector (re-add with descriptor + remove, protocol "
        "upgraded to table features), then read the LATEST version; the "
        "oracle is the equivalent filtered aggregate, so the Z85 decode, "
        "the 64-bit roaring parse AND the _metadata.row_index anti-join "
        "masking are all value-hash-checked. 100 TB shape: the DV bitmap "
        "is per-file bounded metadata (exactly what real DV readers hold "
        "in memory); the masked read is scan -> broadcast anti-join, "
        "pushdown and pruning untouched on the data columns."
    ),
    tags=("sources", "extension"),
)
def q_delta_dv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.delta import (
        delete_rows,
        read_delta_table,
        write_delta_table,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    table = os.path.join(
        tempfile.gettempdir(),
        f"healthcare_etl_spark_delta_dv_{os.getpid()}_{spark.sparkContext.applicationId}",
        sf_tag,
    )
    write_delta_table(nation, table, partition_by=["n_regionkey"])
    delete_rows(spark, table, "n_nationkey % 3 = 0")
    back = read_delta_table(spark, table)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "q_iceberg_scan",
    oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name)              AS first_name
FROM nation WHERE n_regionkey <> 1
GROUP BY n_regionkey
""",
    description=(
        "Apache Iceberg format-version-2 table scan on vanilla Spark "
        "(sources.iceberg + the in-repo sources.avro object-container "
        "codec — the public iceberg.apache.org/spec implemented directly, "
        "no iceberg-spark runtime jar): materialize nation as an Iceberg "
        "table identity-partitioned by n_regionkey (snapshot 1), append a "
        "metadata-only partition DELETE snapshot (surviving files carried "
        "as EXISTING manifest entries, dropped files as DELETED — data "
        "files untouched), then read the LATEST snapshot through "
        "version-hint -> metadata JSON -> manifest-list Avro -> manifest "
        "Avro replay with identity partition reconstruction. The oracle "
        "is the equivalent filtered aggregate, so the Avro decode, the "
        "manifest status semantics AND the partition reconstruction are "
        "value-hash-checked. Snapshot time travel and metadata-plane "
        "partition pruning (pruned file groups never reach the Spark "
        "scan) are unit-tested. 100 TB shape: manifest replay is "
        "metadata-plane exactly as in real Iceberg readers (bounded by "
        "file counts, driver-side); the data plane is one pruned "
        "spark.read.parquet per partition group with pushdown intact."
    ),
    tags=("sources", "extension"),
)
def q_iceberg_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.iceberg import (
        delete_partition,
        read_iceberg_table,
        write_iceberg_table,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    table = os.path.join(
        tempfile.gettempdir(),
        f"healthcare_etl_spark_iceberg_{os.getpid()}_{spark.sparkContext.applicationId}",
        sf_tag,
    )
    write_iceberg_table(nation, table, partition_by=["n_regionkey"])
    delete_partition(table, "n_regionkey", 1)
    back = read_iceberg_table(spark, table)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "q_iceberg_pos_delete_scan",
    oracle="""
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name)              AS first_name
FROM nation WHERE n_nationkey % 3 <> 0
GROUP BY n_regionkey
""",
    description=(
        "Apache Iceberg POSITION-DELETE scan on vanilla Spark "
        "(sources.iceberg — table spec v2 row-level deletes): "
        "materialize nation as a partitioned Iceberg table, row-level "
        "DELETE every third nation via a sorted (file_path, pos) "
        "position-delete parquet committed through a content=1 delete "
        "manifest, then read the LATEST snapshot; the oracle is the "
        "equivalent filtered aggregate, so the delete-manifest replay "
        "AND the _metadata.row_index anti-join masking are value-hash-"
        "checked. 100 TB shape: the delete frame is a distributed "
        "parquet read anti-joined against the scan (AQE broadcasts "
        "small delete sets); data files untouched, pushdown and "
        "pruning intact on the data columns — the same shape as the "
        "Delta deletion-vector path, per-spec for each format."
    ),
    tags=("sources", "extension"),
)
def q_iceberg_pos_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.iceberg import (
        delete_rows,
        read_iceberg_table,
        write_iceberg_table,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    table = os.path.join(
        tempfile.gettempdir(),
        f"healthcare_etl_spark_iceberg_pd_{os.getpid()}_{spark.sparkContext.applicationId}",
        sf_tag,
    )
    write_iceberg_table(nation, table, partition_by=["n_regionkey"])
    delete_rows(spark, table, "n_nationkey % 3 = 0")
    back = read_iceberg_table(spark, table)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "q_iceberg_bucket_scan",
    oracle="""
SELECT CAST(count(*) AS BIGINT)          AS n_rows,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
       CAST(sum(CASE WHEN c_nationkey = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_nation7
FROM customer
""",
    description=(
        "Apache Iceberg BUCKET-transform scan on vanilla Spark "
        "(sources.iceberg): materialize customer bucketed by "
        "bucket[8](c_custkey) — the spec's Murmur3-based hash transform "
        "(32-bit x86 Murmur3, seed 0, 8-byte little-endian integral "
        "serialization; spec Appendix B vectors unit-tested) — then read "
        "it back and aggregate; the oracle is the same aggregate over the "
        "raw table, so the lossy-transform path (source column read from "
        "data files, NOT reconstructed from metadata) is value-hash-"
        "checked. Equality pruning on the SOURCE key maps through the "
        "bucket function at the metadata plane (unit-tested on "
        "inputFiles). 100 TB shape: bucket partitioning is the layout "
        "that bounds per-partition file counts under high-cardinality "
        "keys — identity would create one directory per key."
    ),
    tags=("sources", "extension"),
)
def q_iceberg_bucket_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.iceberg import (
        read_iceberg_table,
        write_iceberg_table,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    table = os.path.join(
        tempfile.gettempdir(),
        f"healthcare_etl_spark_iceberg_bk_{os.getpid()}_{spark.sparkContext.applicationId}",
        sf_tag,
    )
    write_iceberg_table(cust, table, partition_by=[("c_custkey", "bucket[8]")])
    back = read_iceberg_table(spark, table)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("c_custkey").alias("n_cust"),
        F.sum((F.col("c_nationkey") == 7).cast("long")).alias("n_nation7"),
    )


@register(
    "q_iceberg_evolution_scan",
    oracle="""
WITH unioned AS (
    SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation
)
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(nation_name)         AS first_name
FROM unioned GROUP BY n_regionkey
""",
    description=(
        "Apache Iceberg SCHEMA-EVOLUTION scan on vanilla Spark "
        "(sources.iceberg): materialize half of nation, RENAME n_name -> "
        "nation_name (a metadata-only commit — same field ids, zero data "
        "files rewritten), append the other half under the new name, then "
        "read the LATEST snapshot: old files (physical n_name) and new "
        "files (physical nation_name) both resolve into the renamed "
        "logical column via PARQUET FIELD IDS "
        "(spark.sql.parquet.fieldId.read.enabled + parquet.field.id read "
        "schemas — the Iceberg column-resolution contract). The oracle "
        "aggregates the raw table under the renamed header, so the "
        "id-based resolution across both physical generations is "
        "value-hash-checked. 100 TB shape: renames stay O(metadata) no "
        "matter the table size — exactly why id resolution exists."
    ),
    tags=("sources", "extension"),
)
def q_iceberg_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.iceberg import (
        append_rows,
        read_iceberg_table,
        rename_column,
        write_iceberg_table,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    table = os.path.join(
        tempfile.gettempdir(),
        f"healthcare_etl_spark_iceberg_ev_{os.getpid()}_{spark.sparkContext.applicationId}",
        sf_tag,
    )
    write_iceberg_table(
        nation.filter("n_nationkey < 13"), table, partition_by=["n_regionkey"]
    )
    rename_column(table, "n_name", "nation_name")
    append_rows(
        nation.filter("n_nationkey >= 13").withColumnRenamed("n_name", "nation_name"),
        table,
    )
    back = read_iceberg_table(spark, table)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("nation_name").alias("first_name"),
    )


@register(
    "q_iceberg_eq_delete_scan",
    oracle="""
WITH alive AS (
    SELECT * FROM nation
    WHERE n_nationkey % 4 <> 1
    UNION ALL
    SELECT n_nationkey, n_name || '_v2' AS n_name, n_regionkey
    FROM nation WHERE n_nationkey % 4 = 1 AND n_nationkey < 13
)
SELECT n_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name)              AS first_name
FROM alive GROUP BY n_regionkey
""",
    description=(
        "Apache Iceberg EQUALITY-DELETE scan on vanilla Spark "
        "(sources.iceberg — the second v2 row-level delete kind, "
        "completing full delete support): materialize nation, delete "
        "every n_nationkey % 4 == 1 row by KEY (an equality delete file "
        "recording just the key values + their field ids — no data scan "
        "at write time), then APPEND replacement rows for the deleted "
        "keys below 13 with '_v2' names: the re-appended rows SURVIVE "
        "because equality deletes apply only to data files with a "
        "strictly older sequence number (the spec's ordering semantic). "
        "The oracle mirrors delete-then-reappend with set algebra, so "
        "the null-safe key anti-join AND the sequence-number scoping "
        "are value-hash-checked. 100 TB shape: the delete write is "
        "O(keys); the read-time masking is one anti-join per equality "
        "key set (broadcast for small key sets) — the cheap-ingest/"
        "read-amplification trade streaming upserts run on."
    ),
    tags=("sources", "extension"),
)
def q_iceberg_eq_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from healthcare_etl_spark.sources.iceberg import (
        append_rows,
        delete_rows_equality,
        read_iceberg_table,
        write_iceberg_table,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sf_tag = os.path.basename(str(sf_dir).rstrip("/"))
    table = os.path.join(
        tempfile.gettempdir(),
        f"healthcare_etl_spark_iceberg_eq_{os.getpid()}_{spark.sparkContext.applicationId}",
        sf_tag,
    )
    write_iceberg_table(nation, table, partition_by=["n_regionkey"])
    delete_rows_equality(
        spark, table, nation.filter("n_nationkey % 4 = 1").select("n_nationkey")
    )
    append_rows(
        nation.filter("n_nationkey % 4 = 1 and n_nationkey < 13").withColumn(
            "n_name", F.concat(F.col("n_name"), F.lit("_v2"))
        ),
        table,
    )
    back = read_iceberg_table(spark, table)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )
