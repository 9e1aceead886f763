"""Schema'd readers (SURVEY.md §2.1 S1/S3).

The reference extracts with ``pd.read_csv(path, encoding='utf-8',
dtype={'Facility ID': str})`` (reference ``etl_app/etl_script.py:49,52``)
— i.e. inference with explicit per-column overrides. At scale we invert
that: explicit schemas always (no inference pass over 100 TB), and
parquet as the columnar default so Catalyst can push filters and prune
columns down into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


class MissingInputError(FileNotFoundError):
    """A scan's input path does not exist.

    Graceful-exit parity with the reference (``etl_script.py:55-57``
    catches FileNotFoundError and prints a clear message instead of a
    stack trace): the engine raises ONE well-named error that names the
    path, instead of letting Spark's AnalysisException surface as a JVM
    trace."""


def _check_local_path(path: str, *, what: str) -> None:
    """Fail fast with a clear message when a LOCAL input path is absent.

    Only plain local paths (and file: URIs) are checked — remote URIs
    (s3://, hdfs://) are left to the scan, where a driver-side
    existence probe would cost a round trip and race against writers.
    """
    import os

    p = path
    if p.startswith("file:"):
        p = p[len("file:"):]
    if "://" in p:
        return
    if not os.path.exists(p):
        raise MissingInputError(
            f"{what} input not found: {path!r} does not exist. "
            "Check the path (and for fixture tables, the sf_dir)."
        )


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every ``timestamp_ntz`` column to plain ``timestamp``.

    The engine's canonical event-time type is TIMESTAMP with the session
    tz pinned to UTC (see ``session.configure_session``). When the
    ``inferTimestampNTZ.enabled=false`` conf took effect this is a no-op;
    when it could not be set (foreign session) the cast is value-
    preserving under the UTC session tz — wall-clock fields are kept,
    and downstream ``unix_micros``/double arithmetic stays legal. The
    cast is a projection only: pushdown/pruning into the scan is
    unaffected.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz_cols:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})


# Per-path cache of the detected epoch granularity for bigint ts columns
# (one tiny sampling job per distinct file, not per query).
_EPOCH_UNIT_CACHE: dict[str, int] = {}

# Memo of INFERRED PARQUET SCHEMAS (metadata only — never rows; every
# action still scans the files). Without it each load_table call re-reads
# parquet footers (~100 ms per call on local fixtures, a listing+footer
# job on object stores) — a query composing 20 table reads pays seconds
# of pure metadata work at plan build. This is what a catalog/metastore
# provides in production; keying on (path, mtime_ns, size, reader confs)
# keeps it exactly as fresh as re-inference: any rewrite/append touches
# the file or directory signature and misses the cache.
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def _local_file_sig(path: str) -> tuple[int, int] | None:
    """(mtime_ns, size) for plain local paths; None for remote URIs."""
    import os

    p = path[len("file:"):] if path.startswith("file:") else path
    if "://" in p:
        return None
    try:
        st = os.stat(p)
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size)


# Memo of the lazy RELATION HANDLE itself (the unexecuted DataFrame):
# building one costs a fresh file listing + a dozen Py4J round trips
# (~34 ms even with the schema known). A DataFrame is an immutable
# logical plan — handing the same handle back is semantically identical
# to rebuilding it, and no rows are ever cached. Guarded by object
# IDENTITY of the owning SparkSession (weakref), so a stopped or new
# session can never receive a handle bound to an old one.
_RELATION_CACHE: dict[tuple, tuple] = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with inferred schema and relation handle
    memoized per (file signature, reader confs, session identity).

    The schema depends on the two parquet reader confs load_table
    manages (NTZ inference, nanos-as-long), so they are part of the key;
    a session where they differ re-infers rather than trusting a schema
    inferred under other settings.
    """
    import weakref

    sig = _local_file_sig(path)
    if sig is None:
        return spark.read.parquet(path)

    def conf(k: str) -> str:
        try:
            return str(spark.conf.get(k, "?"))
        except Exception:  # pragma: no cover - conf read denied
            return "?"

    key = (
        path,
        *sig,
        conf("spark.sql.parquet.inferTimestampNTZ.enabled"),
        conf("spark.sql.legacy.parquet.nanosAsLong"),
    )
    hit = _RELATION_CACHE.get(key)
    if hit is not None and hit[0]() is spark:
        return hit[1]
    schema = _SCHEMA_CACHE.get(key)
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        if len(_SCHEMA_CACHE) > 512:
            _SCHEMA_CACHE.clear()
        _SCHEMA_CACHE[key] = df.schema
    if len(_RELATION_CACHE) > 512:
        _RELATION_CACHE.clear()
    try:
        _RELATION_CACHE[key] = (weakref.ref(spark), df)
    except TypeError:  # pragma: no cover - non-weakref-able session stub
        pass
    return df


def _epoch_to_micros(spark: SparkSession, path: str, df: DataFrame):
    """Column expression converting a raw BIGINT epoch ``ts`` to epoch µs,
    detecting the producer's granularity from data magnitude.

    The round-4 regression class: a reader that *assumes* one granularity
    (``div 1000`` for nanos) silently corrupts values 1000x when the
    producer switches — no error is ever raised. Magnitude
    disambiguates unambiguously for any date between 1973 and 2100+
    (epoch seconds ~1e8-9, millis ~1e11-12, micros ~1e14-15, nanos
    ~1e17-18 — three orders of magnitude apart per step). The sampled
    decision is cached per file path so repeated loads pay nothing.
    """
    unit = _EPOCH_UNIT_CACHE.get(path)
    if unit is None:
        sample = df.select(F.abs(F.col("ts")).alias("v")).filter("v IS NOT NULL").first()
        mag = sample["v"] if sample is not None else 10**15
        if mag >= 10**17:
            unit = 1_000  # nanos: integer-divide down to µs
        elif mag >= 10**14:
            unit = 1  # already µs
        elif mag >= 10**11:
            unit = -1_000  # millis: multiply up
        else:
            unit = -1_000_000  # seconds
        _EPOCH_UNIT_CACHE[path] = unit
    if unit > 1:
        return F.expr(f"ts div {unit}")
    if unit == 1:
        return F.col("ts")
    return F.col("ts") * F.lit(-unit)


def spread_count(df: DataFrame, *, kb_per_task: int | None = None) -> int:
    """Size-derived partition count for spreading a narrow fixture scan
    ahead of a CPU-heavy explode/codec path.

    The fixture parquet files are single row groups, so a bare scan is
    one task and everything up to the first exchange runs serially —
    hence the spread. But the old blanket ``defaultParallelism`` count
    pinned 32 partitions onto kilobyte inputs, and the r9 scaling block
    showed per-task overhead dominating (8 cores beat 32 across the
    board at sf0.1). The count is now derived from the scan's input
    bytes (~64 KiB of raw input per task by default, tunable via
    ``SPARK_GRAFT_SPREAD_KB``), capped at ``defaultParallelism`` —
    scale-adaptive in both directions: kilobyte fixtures get a handful
    of tasks, and any input big enough to saturate the cluster hits the
    cap (where a real multi-split table's scan would already be
    parallel and the spread is only a co-partitioning choice).
    """
    import os

    if kb_per_task is None:
        kb_per_task = int(os.environ.get("SPARK_GRAFT_SPREAD_KB", "64"))
    cap = df.sparkSession.sparkContext.defaultParallelism
    try:
        from urllib.parse import urlparse

        size = sum(os.path.getsize(urlparse(u).path) for u in df.inputFiles())
    except Exception:  # pragma: no cover - non-local storage
        return cap
    return max(1, min(cap, (size + kb_per_task * 1024 - 1) // (kb_per_task * 1024)))


def spread(df: DataFrame, *, kb_per_task: int | None = None) -> DataFrame:
    """Round-robin-spread a fixture scan to :func:`spread_count` tasks.

    ``kb_per_task`` overrides the input-bytes-per-task budget — codec
    paths (JPEG/MP4/WAV decode per row) do ~10x the CPU work per input
    byte of a tokenize path and want smaller tasks.
    """
    return df.repartition(spread_count(df, kb_per_task=kb_per_task))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    Timestamp columns (``events.ts``, ``orders.o_orderdate``,
    ``lineitem.l_shipdate`` — all ``timestamp[us]`` parquet) are
    normalized to one canonical type, plain ``TIMESTAMP`` under the UTC
    session tz, at this boundary so no operator downstream branches on
    the producer's physical type. Three producer encodings are handled:

    - ``timestamp[us]`` + ``inferTimestampNTZ=false`` -> TIMESTAMP
      directly (today's fixture, zero-cost path);
    - ``timestamp[us]`` read as TIMESTAMP_NTZ (conf not settable) ->
      defensive cast, value-preserving under UTC;
    - ``TIMESTAMP(NANOS)`` (the pre-round-4 fixture) -> rejected by
      Spark's vectorized reader, so read as long nanos (legacy conf) and
      converted JVM-side; lossless for µs-granular data and identical to
      DuckDB's ns->µs truncation on read.
    """
    path = f"{str(sf_dir).rstrip('/')}/{name}.parquet"
    _check_local_path(path, what=f"table {name!r}")
    if name != "events":
        return _normalize_timestamps(_read_parquet(spark, path))

    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - non-settable on some builds
        pass
    try:
        df = _read_parquet(spark, path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(_epoch_to_micros(spark, path, df)))
        return _normalize_timestamps(df)
    except Exception:
        # Fallback for sessions where neither conf is available AND the
        # file is nanos-typed: decode through Arrow on the driver. Only
        # acceptable because the events fixture is small; the conf path
        # above is the scale path.
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        pdf = tbl.to_pandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        return spark.createDataFrame(pdf)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each fixture table as a temp view for ``spark.sql`` use."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    header: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    """CSV scan (S1) mirroring reference ``etl_script.py:49,52``.

    PERMISSIVE mode matches pandas' tolerance of malformed rows; an
    explicit schema replaces the reference's ``dtype={'Facility ID':
    str}`` override (never let inference turn zero-padded IDs numeric).
    Missing local paths raise :class:`MissingInputError` with the path
    named (reference ``etl_script.py:55-57`` graceful-exit parity).
    """
    _check_local_path(path, what="CSV")
    reader = (
        spark.read.option("header", header)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> DataFrame:
    """JSON-lines scan with a mandatory explicit schema.

    Inference over JSON requires a full extra pass of the data — never
    acceptable at 100 TB, so unlike ``read_csv`` there is no inference
    fallback here.
    """
    _check_local_path(path, what="JSON")
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar with predicate pushdown, like parquet."""
    _check_local_path(path, what="ORC")
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    properties: dict | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan (S3) mirroring reference ``app.py:31-32``
    (``pd.read_sql`` over an engine connection).

    The reference reads the whole table through one connection; at scale
    pass ``partition_column``/bounds/``num_partitions`` so Spark issues
    one range-bounded query per partition and the read parallelizes
    across executors. Without them the read is a single-connection scan
    (fine for dimension tables only).

    Round-trip with ``writers.write_jdbc`` is smoke-tested against
    embedded Derby (the JDBC database shipped in Spark's own jars) in
    ``tests/test_operators.py``.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for key, val in (properties or {}).items():
        reader = reader.option(key, val)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()
