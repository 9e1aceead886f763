"""Minimal Apache Iceberg (format-version 2) reader on vanilla Spark.

Implements the public Iceberg table spec (iceberg.apache.org/spec/)
directly — no iceberg-spark runtime jar, which this container does not
ship — the same way ``sources.delta`` implements delta.io PROTOCOL.md:

* metadata resolution: ``metadata/version-hint.text`` (HadoopTables
  convention) or the highest ``v<N>.metadata.json``;
* snapshot selection: ``current-snapshot-id`` or explicit time travel
  by ``snapshot_id`` through the metadata's snapshot list;
* the manifest LIST (Avro, via the in-repo ``sources.avro`` codec) to
  enumerate manifest files, then each manifest's ``manifest_entry``
  records to the live data-file set (status DELETED excluded);
* identity-transform partition reconstruction: partition values come
  from the manifest's typed partition struct and are attached as
  literal columns when missing from the data files (the spec's rule
  for identity transforms / migrated files);
* optional partition pruning BEFORE the scan: an equality filter on a
  partition column drops file groups at the metadata plane, so the
  Spark job never opens pruned files;
* POSITION delete files (v2 row-level deletes): delete parquet files
  of (file_path, pos) are read as a DataFrame and masked out with a
  distributed LEFT ANTI join on ``_metadata.file_path`` +
  ``_metadata.row_index`` — the same Spark-first shape as the Delta
  deletion-vector path; ``delete_rows`` writes them.

Also implemented: ``bucket[N]`` / ``truncate[W]`` partition transforms
(spec Murmur3, Appendix B vectors unit-tested) with source-value
pruning mapped through the transform; FIELD-ID column resolution (read
schemas carry ``parquet.field.id`` metadata and the parquet reader
matches on it — the Iceberg contract that makes ``rename_column`` a
metadata-only commit, old files resolving by id); ``append_rows``
snapshots.

* EQUALITY delete files (the other v2 row-level delete kind): delete
  rows matching the equality columns (null-safe) in data files with a
  STRICTLY OLDER data sequence number — rows appended after the delete
  survive; one anti-join per distinct equality-id set;
  ``delete_rows_equality`` writes them. Full v2 row-level delete
  support: both delete-file kinds read AND written.

Scope is honest, fail-loud (misreading is worse than raising):
* partition transforms beyond identity/bucket/truncate (days/hours/
  void/...) raise;
* unknown data_file content codes and non-parquet data files raise.

All log/manifest handling is metadata-plane (bounded by file counts,
exactly like real Iceberg readers, which also replay manifests on the
driver); the data plane is one pruned ``spark.read.parquet`` per
partition group, so predicate pushdown and column pruning reach the
files unchanged. The writer is fixture-grade by volume but spec-grade
by format: data files + manifest + manifest list + metadata JSON that
a real Iceberg reader can consume, used by the registered scan query,
the round-trip tests and the time-travel tests.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_spark.sources.avro import read_avro_file, write_avro_file

_META_DIR = "metadata"
_VERSION_RE = re.compile(r"^v(\d+)\.metadata\.json$")

# ------------------------------------------------------------- type maps

_ICEBERG_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}

_SPARK_TO_ICEBERG: dict[type, str] = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.DateType: "date",
    T.TimestampNTZType: "timestamp",
    T.TimestampType: "timestamptz",
    T.StringType: "string",
    T.BinaryType: "binary",
}

_ICEBERG_TO_AVRO: dict[str, str] = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "date": "int",
    "timestamp": "long",
    "timestamptz": "long",
}


def _spark_type(iceberg_type) -> T.DataType:
    if isinstance(iceberg_type, str):
        if iceberg_type in _ICEBERG_TO_SPARK:
            return _ICEBERG_TO_SPARK[iceberg_type]
        m = re.match(r"^decimal\((\d+),\s*(\d+)\)$", iceberg_type)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
    raise NotImplementedError(f"Iceberg type not supported: {iceberg_type!r}")


def _iceberg_type(spark_type: T.DataType) -> str:
    if type(spark_type) in _SPARK_TO_ICEBERG:
        return _SPARK_TO_ICEBERG[type(spark_type)]
    if isinstance(spark_type, T.DecimalType):
        return f"decimal({spark_type.precision},{spark_type.scale})"
    raise NotImplementedError(f"Spark type not supported: {spark_type!r}")


# ------------------------------------------------------- partition transforms


def _murmur3_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3 (x86 variant), the hash the Iceberg spec fixes for
    bucket transforms (Appendix B). Public-domain algorithm (Appleby);
    implemented here because neither mmh3 nor spark-avro ships in this
    container and Spark's ``F.hash`` uses a different seed and integer
    serialization (seed 42, native width) than Iceberg (seed 0, 8-byte
    little-endian for all integral types)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


_TRANSFORM_RE = re.compile(r"^(identity|bucket\[(\d+)\]|truncate\[(\d+)\])$")


def _apply_transform(transform: str, value, iceberg_type: str):
    """Spec semantics of the supported partition transforms. ``None``
    maps to ``None`` under every transform (spec rule)."""
    if value is None:
        return None
    if transform == "identity":
        return value
    m = _TRANSFORM_RE.match(transform)
    if not m:
        raise NotImplementedError(
            f"partition transform {transform!r} not supported "
            "(identity/bucket[N]/truncate[W] only)"
        )
    if transform.startswith("bucket["):
        n = int(m.group(2))
        if iceberg_type in ("int", "long", "date", "timestamp", "timestamptz"):
            data = int(value).to_bytes(8, "little", signed=True)
        elif iceberg_type == "string":
            data = str(value).encode("utf-8")
        elif iceberg_type == "binary":
            data = bytes(value)
        else:
            raise NotImplementedError(
                f"bucket transform over {iceberg_type!r} not supported"
            )
        return (_murmur3_32(data) & 0x7FFFFFFF) % n
    w = int(m.group(3))
    if iceberg_type in ("int", "long"):
        v = int(value)
        return v - (((v % w) + w) % w)
    if iceberg_type == "string":
        return str(value)[:w]
    raise NotImplementedError(
        f"truncate transform over {iceberg_type!r} not supported"
    )


def _transform_result_type(transform: str, iceberg_type: str) -> str:
    """Iceberg result type of a transform (spec): bucket -> int,
    truncate/identity -> source type."""
    if transform.startswith("bucket["):
        return "int"
    return iceberg_type


def _bucket_column(transform: str, iceberg_type: str):
    """Spark column function computing ``bucket[N]`` per row as an
    Arrow-batched pandas UDF — the engine-side path (a literal
    value->bucket map would bound the writer by key cardinality).
    Integral types vectorize the whole Murmur3 block mix in numpy
    (8-byte LE input = exactly two uint32 blocks, no tail); strings
    hash per UNIQUE value per batch."""
    from pyspark.sql.functions import pandas_udf

    n = int(_TRANSFORM_RE.match(transform).group(2))

    if iceberg_type in ("int", "long", "date", "timestamp", "timestamptz"):

        @pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            mask = s.notna()
            v = s[mask].astype(np.int64).to_numpy().view(np.uint64)
            k1 = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            k2 = (v >> np.uint64(32)).astype(np.uint32)
            h = np.zeros(len(v), np.uint32)
            for k in (k1, k2):
                k = k * np.uint32(0xCC9E2D51)
                k = (k << np.uint32(15)) | (k >> np.uint32(17))
                k = k * np.uint32(0x1B873593)
                h ^= k
                h = (h << np.uint32(13)) | (h >> np.uint32(19))
                h = h * np.uint32(5) + np.uint32(0xE6546B64)
            h ^= np.uint32(8)  # total byte length
            h ^= h >> np.uint32(16)
            h = h * np.uint32(0x85EBCA6B)
            h ^= h >> np.uint32(13)
            h = h * np.uint32(0xC2B2AE35)
            h ^= h >> np.uint32(16)
            out = pd.Series(np.full(len(s), np.nan), index=s.index, dtype="Float64")
            out[mask] = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype(np.int32)
            return out.astype("Int32")

        return _bucket

    @pandas_udf("int")
    def _bucket_str(s: pd.Series) -> pd.Series:
        lut = {
            u: _apply_transform(transform, u, iceberg_type)
            for u in s.dropna().unique()
        }
        return s.map(lut).astype("Int32")

    return _bucket_str


# ------------------------------------------------------------ metadata IO


def _metadata_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _META_DIR, f"v{version}.metadata.json")


def _current_metadata(table_path: str) -> dict:
    meta_dir = os.path.join(table_path, _META_DIR)
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(f"not an Iceberg table (no metadata dir): {table_path}")
    hint = os.path.join(meta_dir, "version-hint.text")
    version: int | None = None
    if os.path.exists(hint):
        with open(hint, encoding="utf-8") as fh:
            version = int(fh.read().strip())
    else:
        versions = [
            int(m.group(1))
            for name in os.listdir(meta_dir)
            if (m := _VERSION_RE.match(name))
        ]
        if versions:
            version = max(versions)
    if version is None:
        raise FileNotFoundError(f"no metadata json found under {meta_dir}")
    with open(_metadata_path(table_path, version), encoding="utf-8") as fh:
        meta = json.loads(fh.read())
    if meta.get("format-version") not in (1, 2):
        raise NotImplementedError(
            f"Iceberg format-version {meta.get('format-version')!r} not supported"
        )
    # Loaded-from version, so metadata-only commits (schema evolution)
    # can number the next metadata file without colliding with
    # snapshot-id-derived numbering. Stripped before writing.
    meta["_loaded_version"] = version
    return meta


def _current_schema(meta: dict) -> list[dict]:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                return s["fields"]
        raise ValueError(f"current-schema-id {sid} not in schemas")
    return meta["schema"]["fields"]  # format-version 1 legacy key


def _partition_fields(meta: dict) -> list[dict]:
    if "partition-specs" in meta:
        sid = meta.get("default-spec-id", 0)
        for s in meta["partition-specs"]:
            if s.get("spec-id") == sid:
                return s["fields"]
        raise ValueError(f"default-spec-id {sid} not in partition-specs")
    return meta.get("partition-spec", [])  # v1 legacy key


def _local_path(p: str, table_path: str) -> str:
    if p.startswith("file://"):
        return p[len("file://") :]
    if p.startswith("file:"):
        return p[len("file:") :]
    if os.path.isabs(p):
        return p
    return os.path.join(table_path, p)


# ---------------------------------------------------------------- reader


def _live_entries(
    meta: dict, snapshot: dict, table_path: str
) -> tuple[list[dict], list[dict], list[dict]]:
    """(data entries, position-delete entries, equality-delete entries)
    live at a snapshot, replayed through manifest list -> manifests
    (DELETED entries dropped). Fail-loud on non-parquet and unknown
    content codes (misreading is worse than raising)."""
    _, manifests = read_avro_file(_local_path(snapshot["manifest-list"], table_path))
    data: list[dict] = []
    pos_deletes: list[dict] = []
    eq_deletes: list[dict] = []
    for mf in manifests:
        _, entries = read_avro_file(_local_path(mf["manifest_path"], table_path))
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            dfile = e["data_file"]
            content = dfile.get("content", 0)
            if content not in (0, 1, 2):
                raise NotImplementedError(
                    f"Iceberg data_file content={content!r} not supported"
                )
            if str(dfile.get("file_format", "PARQUET")).upper() != "PARQUET":
                raise NotImplementedError(
                    f"data file format {dfile.get('file_format')!r} not supported"
                )
            (data, pos_deletes, eq_deletes)[content].append(e)
    return data, pos_deletes, eq_deletes


def read_iceberg_table(
    spark: SparkSession,
    table_path: str,
    *,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Read an Iceberg table as a DataFrame at the current (or an
    explicit ``snapshot_id``) snapshot. ``partition_filter`` is an
    equality predicate dict on identity partition columns, applied at
    the METADATA plane: pruned file groups are never handed to Spark,
    so the scan job opens only matching files (the Iceberg contract —
    partition pruning without touching data)."""
    meta = _current_metadata(table_path)
    fields = _current_schema(meta)
    pfields = _partition_fields(meta)
    for pf in pfields:
        if not _TRANSFORM_RE.match(pf.get("transform", "")):
            raise NotImplementedError(
                f"partition transform {pf.get('transform')!r} not supported "
                "(identity/bucket[N]/truncate[W] only)"
            )
    field_by_id = {f["id"]: f for f in fields}
    pnames = [f["name"] for f in pfields]
    ptypes = [
        _spark_type(field_by_id[f["source-id"]]["type"]) for f in pfields
    ]
    psources = [field_by_id[f["source-id"]]["name"] for f in pfields]
    ptransforms = [f["transform"] for f in pfields]
    psrc_types = [field_by_id[f["source-id"]]["type"] for f in pfields]

    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    schema = T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), not f.get("required", False))
            for f in fields
        ]
    )
    if sid is None or sid == -1:
        return spark.createDataFrame([], schema)
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not found in {table_path}")

    data_e, pos_del_e, eq_del_e = _live_entries(meta, snaps[sid], table_path)
    # (partition tuple, data sequence number, local path) — the seq
    # rides along because EQUALITY deletes apply only to data files
    # with a STRICTLY OLDER sequence number (spec).
    files = [
        (
            tuple((e["data_file"].get("partition") or {}).get(n) for n in pnames),
            e.get("sequence_number") or 0,
            _local_path(e["data_file"]["file_path"], table_path),
        )
        for e in data_e
    ]
    delete_files = [
        _local_path(e["data_file"]["file_path"], table_path) for e in pos_del_e
    ]
    if partition_filter:
        # Filter keys are SOURCE column names; each maps through its
        # partition field's transform (identity passes through, bucket
        # hashes, truncate truncates), so an equality predicate on the
        # source column prunes bucket/truncate layouts too — exactly
        # the metadata-plane pruning real Iceberg readers do.
        unknown = set(partition_filter) - set(psources) - set(pnames)
        if unknown:
            raise ValueError(f"partition_filter on non-partition columns: {unknown}")
        wanted: list[tuple[int, object]] = []
        for k, v in partition_filter.items():
            idx = psources.index(k) if k in psources else pnames.index(k)
            wanted.append(
                (idx, _apply_transform(ptransforms[idx], v, psrc_types[idx]))
            )
        files = [
            (pv, sq, p) for pv, sq, p in files if all(pv[i] == tv for i, tv in wanted)
        ]
    if not files:
        return spark.createDataFrame([], schema)

    # Group by (partition tuple, data seq): equality-delete masking
    # needs each row to know its file's sequence number, attached as a
    # per-group literal. Group count stays metadata-scale (partitions x
    # snapshots at worst).
    groups: dict[tuple, list[str]] = {}
    for pv, sq, p in files:
        groups.setdefault((pv, sq), []).append(p)

    # Scheme-insensitive path key: position-delete rows carry
    # 'file://...' URIs while _metadata.file_path reports 'file:///...'.
    def _norm(col):
        return F.regexp_replace(col, "^file:/+", "/")

    names_only = [f["name"] for f in fields]
    # FIELD-ID column resolution (the Iceberg contract: columns resolve
    # by id, never by name, so renames are metadata-only): the read
    # schema carries each field's id as parquet.field.id metadata and
    # the parquet reader is told to match on it. Identity-partition
    # source columns are EXCLUDED from the read schema (their values
    # reconstruct from the manifest partition struct; requesting them
    # from files that lack them would yield all-null columns instead).
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    identity_sources = {
        src for src, tr in zip(psources, ptransforms) if tr == "identity"
    }
    read_schema = T.StructType(
        [
            T.StructField(
                f["name"],
                _spark_type(f["type"]),
                True,
                {"parquet.field.id": f["id"]},
            )
            for f in fields
            if f["name"] not in identity_sources
        ]
    )
    frames: list[DataFrame] = []
    # None-safe deterministic group order (null partition values are
    # legal Iceberg state — the sort key mirrors the delta reader fix).
    for pv, sq in sorted(
        groups, key=lambda t: (tuple((v is None, str(v)) for v in t[0]), t[1])
    ):
        part = spark.read.schema(read_schema).parquet(*sorted(groups[(pv, sq)]))
        for src, typ, tr, val in zip(psources, ptypes, ptransforms, pv):
            # Identity values reconstruct from metadata; bucket/truncate
            # are lossy, so their source columns live in the data files.
            if tr == "identity" and src not in part.columns:
                part = part.withColumn(src, F.lit(val).cast(typ))
        extra = []
        if delete_files:
            extra += [
                _norm(F.col("_metadata.file_path")).alias("__fp"),
                F.col("_metadata.row_index").alias("__ri"),
            ]
        if eq_del_e:
            extra.append(F.lit(sq).cast("long").alias("__seq"))
        part = part.select(*names_only, *extra)
        frames.append(part)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    if delete_files:
        # Position-delete masking, the Spark-first shape (same as the
        # Delta deletion-vector path): read the delete files as a frame
        # of (file_path, pos) and LEFT ANTI join on the file identity +
        # _metadata.row_index. Delete frames are per-snapshot bounded;
        # at cluster scale AQE broadcasts small ones and shuffles big
        # ones — never a driver-side materialization. Position deletes
        # name exact immutable file paths, so path-scoped application
        # is sequence-safe (a delete cannot name a future file).
        dels = spark.read.parquet(*sorted(delete_files)).select(
            _norm(F.col("file_path")).alias("__fp"),
            F.col("pos").cast("long").alias("__ri"),
        )
        out = out.join(dels, ["__fp", "__ri"], "left_anti").drop("__fp", "__ri")
    if eq_del_e:
        # EQUALITY-delete masking (spec): a delete row removes every
        # data row whose equality columns match (null matches null,
        # hence <=>) in data files with a STRICTLY OLDER data sequence
        # number — rows appended after the delete survive. One anti-
        # join per distinct equality-id set; the seq comparison rides
        # as an extra join condition (equi keys + range — SMJ/broadcast
        # capable, never a Cartesian).
        name_by_id = {f["id"]: f["name"] for f in fields}
        by_ids: dict[tuple, list[dict]] = {}
        for e in eq_del_e:
            ids = tuple(e["data_file"].get("equality_ids") or ())
            if not ids:
                raise ValueError(
                    "equality delete file without equality_ids: "
                    f"{e['data_file'].get('file_path')}"
                )
            by_ids.setdefault(ids, []).append(e)
        for ids, dele in sorted(by_ids.items()):
            keys = [name_by_id[i] for i in ids]
            dfs = []
            for e in dele:
                p = _local_path(e["data_file"]["file_path"], table_path)
                dfs.append(
                    spark.read.parquet(p).select(
                        *[F.col(k).alias(f"__d_{k}") for k in keys],
                        F.lit(e.get("sequence_number") or 0)
                        .cast("long")
                        .alias("__dseq"),
                    )
                )
            dels = dfs[0]
            for d in dfs[1:]:
                dels = dels.unionByName(d)
            cond = F.col("__dseq") > F.col("__seq")
            for k in keys:
                cond = cond & F.col(k).eqNullSafe(F.col(f"__d_{k}"))
            out = out.join(dels, on=cond, how="left_anti")
        out = out.drop("__seq")
    # .to() casts to the DECLARED schema including nullability — the
    # reconstructed partition literals are otherwise non-nullable.
    return out.to(schema)


# ---------------------------------------------------------------- writer


def _manifest_entry_schema(pfields: list[dict], fields: list[dict]) -> dict:
    field_by_id = {f["id"]: f for f in fields}
    part_fields = [
        {
            "name": pf["name"],
            "type": [
                "null",
                _ICEBERG_TO_AVRO[
                    _transform_result_type(
                        pf.get("transform", "identity"),
                        field_by_id[pf["source-id"]]["type"],
                    )
                ],
            ],
            "default": None,
            "field-id": pf["field-id"],
        }
        for pf in pfields
    ]
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": part_fields},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        {
                            "name": "equality_ids",
                            "type": ["null", {"type": "array", "items": "int"}],
                            "default": None,
                            "field-id": 135,
                        },
                    ],
                },
            },
        ],
    }


_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _typed_partition_value(raw: str | None, iceberg_type: str):
    if raw is None:
        return None
    if iceberg_type in ("long", "int", "date", "timestamp", "timestamptz"):
        return int(raw)
    if iceberg_type in ("double", "float"):
        return float(raw)
    if iceberg_type == "boolean":
        return raw.lower() == "true"
    return raw


def _parquet_row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _write_snapshot(
    table_path: str,
    meta: dict,
    entries: list[dict],
    *,
    operation: str,
    delete_entries: list[dict] | None = None,
) -> int:
    """Append one snapshot (manifests + manifest list + metadata json +
    version hint): a data manifest holding ``entries`` and, when
    ``delete_entries`` is given, a DELETE manifest (manifest-list
    ``content=1``) holding position-delete file entries. Returns the
    new snapshot id (== new metadata version, deterministic)."""
    fields = _current_schema(meta)
    pfields = _partition_fields(meta)
    version = (
        max((s["snapshot-id"] for s in meta.get("snapshots", [])), default=0) + 1
    )
    seq = meta.get("last-sequence-number", 0) + 1
    meta_dir = os.path.join(table_path, _META_DIR)
    entry_schema = _manifest_entry_schema(pfields, fields)
    mlist_rows: list[dict] = []
    manifest_groups = [(entries, 0, f"manifest-{version}.avro")]
    if delete_entries:
        manifest_groups.append(
            (delete_entries, 1, f"manifest-{version}-deletes.avro")
        )
    for grp, content, fname in manifest_groups:
        for e in grp:
            if e["status"] == 1:  # ADDED inherits this snapshot/sequence
                e["snapshot_id"] = version
                e["sequence_number"] = seq
                e["file_sequence_number"] = seq
        manifest_path = os.path.join(meta_dir, fname)
        write_avro_file(manifest_path, entry_schema, grp)
        live = [e for e in grp if e["status"] != 2]
        mlist_rows.append(
            {
                "manifest_path": "file://" + manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": min(
                    (e["sequence_number"] for e in live if e["sequence_number"]),
                    default=seq,
                ),
                "added_snapshot_id": version,
                "added_files_count": sum(1 for e in grp if e["status"] == 1),
                "existing_files_count": sum(1 for e in grp if e["status"] == 0),
                "deleted_files_count": sum(1 for e in grp if e["status"] == 2),
                "added_rows_count": sum(
                    e["data_file"]["record_count"] for e in grp if e["status"] == 1
                ),
                "existing_rows_count": sum(
                    e["data_file"]["record_count"] for e in grp if e["status"] == 0
                ),
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"] for e in grp if e["status"] == 2
                ),
            }
        )
    mlist_path = os.path.join(meta_dir, f"snap-{version}-manifest-list.avro")
    write_avro_file(mlist_path, _MANIFEST_LIST_SCHEMA, mlist_rows)
    snapshot = {
        "snapshot-id": version,
        "sequence-number": seq,
        "timestamp-ms": version,  # deterministic fixture clock
        "manifest-list": "file://" + mlist_path,
        "summary": {"operation": operation},
        "schema-id": meta.get("current-schema-id", 0),
    }
    new_meta = dict(meta)
    new_meta["snapshots"] = list(meta.get("snapshots", [])) + [snapshot]
    new_meta["current-snapshot-id"] = version
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = version
    _write_metadata(table_path, new_meta)
    return version


def _write_metadata(table_path: str, new_meta: dict) -> int:
    """Persist a new metadata json (next file version after the one the
    table was loaded from — schema-only commits advance it without a
    new snapshot) and point version-hint at it."""
    meta_version = new_meta.pop("_loaded_version", 0) + 1
    # Snapshot commits may outrun schema-only commits' numbering; never
    # overwrite an existing metadata file.
    while os.path.exists(_metadata_path(table_path, meta_version)):
        meta_version += 1
    with open(_metadata_path(table_path, meta_version), "w", encoding="utf-8") as fh:
        json.dump(new_meta, fh)
    hint = os.path.join(table_path, _META_DIR, "version-hint.text")
    with open(hint, "w", encoding="utf-8") as fh:
        fh.write(str(meta_version))
    return meta_version


def write_iceberg_table(
    df: DataFrame,
    table_path: str,
    *,
    partition_by: list | None = None,
) -> int:
    """Write ``df`` as snapshot 1 of a new Iceberg format-version-2
    table (parquet data files + Avro manifest/manifest-list + metadata
    JSON + version hint). ``partition_by`` entries are either a column
    name (identity transform) or a ``(column, transform)`` pair with
    transform ``bucket[N]`` / ``truncate[W]`` — for those, the derived
    partition value is computed per the spec (Murmur3 bucket / width
    truncate) and the SOURCE column stays in the data files (the
    transforms are lossy, so readers cannot reconstruct it). Returns
    the snapshot id. Bucket values are computed per row by an
    Arrow-batched pandas UDF (vectorized numpy Murmur3 for integral
    types — 8-byte LE input is exactly two uint32 blocks, no tail);
    truncate folds into a plain codegen expression."""
    specs: list[tuple[str, str]] = [
        (p, "identity") if isinstance(p, str) else (p[0], p[1])
        for p in (partition_by or [])
    ]
    for _c, tr in specs:
        if not _TRANSFORM_RE.match(tr):
            raise NotImplementedError(f"partition transform {tr!r} not supported")
    fields = [
        {
            "id": i + 1,
            "name": f.name,
            "required": False,
            "type": _iceberg_type(f.dataType),
        }
        for i, f in enumerate(df.schema.fields)
    ]
    fid = {f["name"]: f["id"] for f in fields}
    ftype = {f["name"]: f["type"] for f in fields}

    def _pname(col: str, tr: str) -> str:
        if tr == "identity":
            return col
        return f"{col}_bucket" if tr.startswith("bucket[") else f"{col}_trunc"

    pfields = [
        {
            "source-id": fid[c],
            "field-id": 1000 + i,
            "name": _pname(c, tr),
            "transform": tr,
        }
        for i, (c, tr) in enumerate(specs)
    ]
    # Result type (what the partition DIRECTORY/manifest value is typed
    # as): bucket -> int, truncate/identity -> source type.
    ptype = {
        _pname(c, tr): _transform_result_type(tr, ftype[c]) for c, tr in specs
    }

    # Stamp parquet field IDs (StructField metadata key
    # ``parquet.field.id``; Spark's parquet writer emits them when
    # present) — the mechanism that makes FIELD-ID column resolution,
    # and therefore schema evolution, work on read.
    df = df.select(
        *[
            F.col(f.name).alias(f.name, metadata={"parquet.field.id": fid[f.name]})
            for f in df.schema.fields
        ]
    )
    out, part_cols = _with_partition_cols(df, specs, ftype, _pname)

    data_dir = os.path.join(table_path, "data")
    writer = out.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(data_dir)

    entries = _added_entries(data_dir, part_cols, ptype)
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": table_path,
        "last-sequence-number": 0,
        "last-updated-ms": 0,
        "last-column-id": len(fields),
        "schemas": [{"schema-id": 0, "type": "struct", "fields": fields}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": pfields}],
        "default-spec-id": 0,
        "last-partition-id": 1000 + len(pfields) - 1 if pfields else 999,
        "properties": {},
        "snapshots": [],
        "current-snapshot-id": -1,
    }
    os.makedirs(os.path.join(table_path, _META_DIR), exist_ok=True)
    return _write_snapshot(table_path, meta, sorted(
        entries, key=lambda e: e["data_file"]["file_path"]
    ), operation="append")


def _with_partition_cols(df: DataFrame, specs, ftype, pname_fn):
    """Attach derived partition columns (truncate as a codegen
    expression, bucket as the vectorized Murmur3 UDF); identity columns
    partition as themselves."""
    out = df
    part_cols: list[str] = []
    for c, tr in specs:
        name = pname_fn(c, tr)
        part_cols.append(name)
        if tr == "identity":
            continue
        m = _TRANSFORM_RE.match(tr)
        if tr.startswith("truncate["):
            w = int(m.group(3))
            if ftype[c] == "string":
                out = out.withColumn(name, F.substring(F.col(c), 1, w))
            else:
                out = out.withColumn(name, F.col(c) - (((F.col(c) % w) + w) % w))
        else:  # bucket[N]
            out = out.withColumn(name, _bucket_column(tr, ftype[c])(F.col(c)))
    return out, part_cols


def _added_entries(data_dir: str, part_cols: list[str], ptype: dict) -> list[dict]:
    """ADDED manifest entries for every parquet file under ``data_dir``,
    partition values parsed from the hive directory layout and typed by
    the transform RESULT type."""
    entries: list[dict] = []
    for root, _dirs, names in os.walk(data_dir):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel_pieces = os.path.relpath(full, data_dir).split(os.sep)[:-1]
            pv: dict = {p: None for p in part_cols}
            for piece in rel_pieces:
                if "=" in piece:
                    k, v = piece.split("=", 1)
                    raw = None if v == "__HIVE_DEFAULT_PARTITION__" else v
                    pv[k] = _typed_partition_value(raw, ptype[k])
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": None,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": "file://" + full,
                        "file_format": "PARQUET",
                        "partition": {p: pv[p] for p in part_cols},
                        "record_count": _parquet_row_count(full),
                        "file_size_in_bytes": os.path.getsize(full),
                    },
                }
            )
    return sorted(entries, key=lambda e: e["data_file"]["file_path"])


def _carry(e: dict, *, status: int) -> dict:
    return {
        "status": status,
        "snapshot_id": e.get("snapshot_id"),
        "sequence_number": e.get("sequence_number"),
        "file_sequence_number": e.get("file_sequence_number"),
        "data_file": e["data_file"],
    }


def delete_partition(table_path: str, column: str, value) -> int:
    """Append a metadata-only partition DELETE snapshot: surviving
    files are carried as EXISTING entries (their original sequence
    numbers preserved), dropped files recorded as DELETED entries; the
    data files themselves are untouched, so time travel to the prior
    snapshot still reads them. Existing position-delete files are
    carried through unchanged. Returns the new snapshot id."""
    meta = _current_metadata(table_path)
    pnames = [f["name"] for f in _partition_fields(meta)]
    if column not in pnames:
        raise ValueError(f"{column!r} is not a partition column of {table_path}")
    sid = meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    data_e, pos_e, eq_e = _live_entries(meta, snaps[sid], table_path)
    del_e = pos_e + eq_e
    entries = [
        _carry(
            e,
            status=2
            if (e["data_file"].get("partition") or {}).get(column) == value
            else 0,
        )
        for e in data_e
    ]
    return _write_snapshot(
        table_path,
        meta,
        entries,
        operation="delete",
        delete_entries=[_carry(e, status=0) for e in del_e] or None,
    )


def delete_rows(spark: SparkSession, table_path: str, predicate: str) -> int:
    """Row-level DELETE via an Iceberg POSITION delete file (table spec
    v2): scan the live data files with ``_metadata`` to resolve the
    (file_path, pos) of every row matching ``predicate``, write them as
    a sorted parquet position-delete file, and commit a snapshot whose
    manifest list carries the data manifest (EXISTING), any prior
    delete manifests' files (EXISTING) and the new delete file (ADDED,
    manifest-list ``content=1``). Data files are untouched — time
    travel to the prior snapshot reads the undeleted rows. Returns the
    new snapshot id.

    The position resolution is one distributed scan + filter (the same
    job a real engine runs for copy-on-write planning); nothing is
    collected to the driver. Rows already masked by earlier delete
    files may be re-recorded — position-delete semantics make that
    idempotent (the anti-join masks a position once)."""
    meta = _current_metadata(table_path)
    fields = _current_schema(meta)
    pfields = _partition_fields(meta)
    field_by_id = {f["id"]: f for f in fields}
    pnames = [f["name"] for f in pfields]
    ptypes = [_spark_type(field_by_id[f["source-id"]]["type"]) for f in pfields]
    psources = [field_by_id[f["source-id"]]["name"] for f in pfields]
    ptransforms = [f["transform"] for f in pfields]
    sid = meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    data_e, pos_e, eq_e = _live_entries(meta, snaps[sid], table_path)
    del_e = pos_e + eq_e

    groups: dict[tuple, list[str]] = {}
    for e in data_e:
        pv = tuple((e["data_file"].get("partition") or {}).get(n) for n in pnames)
        groups.setdefault(pv, []).append(
            _local_path(e["data_file"]["file_path"], table_path)
        )
    frames = []
    for pv in sorted(groups, key=lambda t: tuple((v is None, str(v)) for v in t)):
        part = spark.read.parquet(*sorted(groups[pv]))
        for src, typ, tr, val in zip(psources, ptypes, ptransforms, pv):
            if tr == "identity" and src not in part.columns:
                part = part.withColumn(src, F.lit(val).cast(typ))
        frames.append(
            part.filter(F.expr(predicate)).select(
                F.col("_metadata.file_path").alias("file_path"),
                F.col("_metadata.row_index").alias("pos"),
            )
        )
    matched = frames[0]
    for fr in frames[1:]:
        matched = matched.unionByName(fr)

    version = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    del_dir = os.path.join(table_path, "data", f"deletes-{version}")
    # Spec: position delete files are sorted by file_path then pos.
    matched.sort("file_path", "pos").coalesce(1).write.mode("overwrite").parquet(
        del_dir
    )
    new_delete_entries: list[dict] = []
    for root, _dirs, names in os.walk(del_dir):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            new_delete_entries.append(
                {
                    "status": 1,
                    "snapshot_id": None,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 1,
                        "file_path": "file://" + full,
                        "file_format": "PARQUET",
                        "partition": {n: None for n in pnames},
                        "record_count": _parquet_row_count(full),
                        "file_size_in_bytes": os.path.getsize(full),
                    },
                }
            )
    return _write_snapshot(
        table_path,
        meta,
        [_carry(e, status=0) for e in data_e],
        operation="delete",
        delete_entries=[_carry(e, status=0) for e in del_e] + new_delete_entries,
    )


def rename_column(table_path: str, old: str, new: str) -> int:
    """Metadata-only column rename — the operation that makes field-id
    resolution load-bearing: a NEW schema (same field ids, new name) is
    committed with a bumped schema-id, no snapshot and no data-file
    rewrite; existing parquet files keep the old physical name and the
    reader resolves them by id. Returns the new metadata file version."""
    meta = _current_metadata(table_path)
    fields = _current_schema(meta)
    if not any(f["name"] == old for f in fields):
        raise ValueError(f"column {old!r} not in current schema")
    if any(f["name"] == new for f in fields):
        raise ValueError(f"column {new!r} already exists")
    new_fields = [
        {**f, "name": new} if f["name"] == old else dict(f) for f in fields
    ]
    new_sid = max(s["schema-id"] for s in meta["schemas"]) + 1
    new_meta = dict(meta)
    new_meta["schemas"] = list(meta["schemas"]) + [
        {"schema-id": new_sid, "type": "struct", "fields": new_fields}
    ]
    new_meta["current-schema-id"] = new_sid
    return _write_metadata(table_path, new_meta)


def _write_spec_files(
    meta: dict, df: DataFrame, table_path: str, subdir: str, *, compact: bool = False
) -> list[dict]:
    """Write ``df`` as new data files under the table's partition spec
    (identity / bucket / truncate recomputed exactly as at create
    time, parquet field ids stamped from the current schema) into
    ``data/<subdir>``; returns the ADDED manifest entries."""
    fields = _current_schema(meta)
    pfields = _partition_fields(meta)
    field_by_id = {f["id"]: f for f in fields}
    missing = [f["name"] for f in fields if f["name"] not in df.columns]
    if missing:
        raise ValueError(f"append is missing columns: {missing}")
    ftype = {f["name"]: f["type"] for f in fields}
    df = df.select(
        *[
            F.col(f["name"]).alias(f["name"], metadata={"parquet.field.id": f["id"]})
            for f in fields
        ]
    )
    specs = [
        (field_by_id[pf["source-id"]]["name"], pf["transform"]) for pf in pfields
    ]
    pname_by_spec = {
        (field_by_id[pf["source-id"]]["name"], pf["transform"]): pf["name"]
        for pf in pfields
    }
    out, part_cols = _with_partition_cols(
        df, specs, ftype, lambda c, tr: pname_by_spec[(c, tr)]
    )
    # Identity partition fields whose name differs from the (possibly
    # renamed) source column need the partition column materialized
    # under the PARTITION FIELD name so the hive layout stays uniform.
    for (c, tr), name in pname_by_spec.items():
        if tr == "identity" and name != c:
            out = out.withColumn(name, F.col(c)).drop(c)
    ptype = {
        pf["name"]: _transform_result_type(
            pf["transform"], ftype[field_by_id[pf["source-id"]]["name"]]
        )
        for pf in pfields
    }
    new_dir = os.path.join(table_path, "data", subdir)
    if compact:
        # Bin-pack: co-locate each partition value in one task so every
        # group writes one file (unpartitioned tables collapse to one).
        out = out.repartition(*part_cols) if part_cols else out.coalesce(1)
    writer = out.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(new_dir)
    return _added_entries(new_dir, part_cols, ptype)


def append_rows(df: DataFrame, table_path: str) -> int:
    """Append ``df`` as a new snapshot: new data files written under
    the table's partition spec (identity / bucket / truncate recomputed
    exactly as at create time), prior data and delete files carried as
    EXISTING entries. Column matching is by CURRENT schema name —
    after a ``rename_column``, append under the new name; the new
    files' parquet field ids keep reads consistent across the rename
    boundary. Returns the new snapshot id."""
    meta = _current_metadata(table_path)
    sid = meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    data_e, pos_e, eq_e = _live_entries(meta, snaps[sid], table_path)
    del_e = pos_e + eq_e

    version = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    new_entries = _write_spec_files(meta, df, table_path, f"append-{version}")
    return _write_snapshot(
        table_path,
        meta,
        [_carry(e, status=0) for e in data_e] + new_entries,
        operation="append",
        delete_entries=[_carry(e, status=0) for e in del_e] or None,
    )


def optimize_compact(spark: SparkSession, table_path: str) -> int:
    """OPTIMIZE / rewrite: materialize the fully-masked table (both
    delete-file kinds applied), write it back as fresh data files under
    the table's partition spec, and commit a REPLACE snapshot — old
    data files DELETED, all delete files purged, rewritten files ADDED
    at the new sequence number. Read amplification accrued by streaming
    equality/position deletes drops to zero; old snapshots stay
    time-travelable. Returns the new snapshot id. No-op (returns the
    current snapshot id) when the table carries no delete files and no
    multi-file partition group.

    Scale shape: the rewrite is one distributed masked scan + one
    partitioned write; the commit is metadata — the same contract as
    ``sources.delta.optimize_compact``."""
    meta = _current_metadata(table_path)
    sid = meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    data_e, pos_e, eq_e = _live_entries(meta, snaps[sid], table_path)
    pnames = [f["name"] for f in _partition_fields(meta)]
    pv_counts: dict[tuple, int] = {}
    for e in data_e:
        pv = tuple((e["data_file"].get("partition") or {}).get(n) for n in pnames)
        pv_counts[pv] = pv_counts.get(pv, 0) + 1
    if not (pos_e or eq_e) and all(c <= 1 for c in pv_counts.values()):
        return sid
    current = read_iceberg_table(spark, table_path)
    version = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    new_entries = _write_spec_files(
        meta, current, table_path, f"rewrite-{version}", compact=True
    )
    return _write_snapshot(
        table_path,
        meta,
        [_carry(e, status=2) for e in data_e] + new_entries,
        operation="replace",
        delete_entries=[_carry(e, status=2) for e in pos_e + eq_e] or None,
    )


def delete_rows_equality(spark: SparkSession, table_path: str, keys_df: DataFrame) -> int:
    """Row-level DELETE via an Iceberg EQUALITY delete file (table spec
    v2): ``keys_df``'s columns name the equality columns (a subset of
    the table schema); every current data row matching one of its rows
    (null-safe) is masked on read. The delete file records the columns'
    FIELD IDS (``equality_ids``) and commits at a sequence number
    strictly above all current data files, so rows APPENDED AFTERWARD
    with the same keys survive — the spec's ordering semantic, covered
    by tests. Returns the new snapshot id.

    Unlike ``delete_rows`` (position deletes) no data scan is needed at
    all — writing the keys IS the delete; the cost moves to read-time
    anti-joins, the classic equality-delete trade (cheap streaming
    upsert/delete ingest, compaction later)."""
    meta = _current_metadata(table_path)
    fields = _current_schema(meta)
    by_name = {f["name"]: f for f in fields}
    unknown = [c for c in keys_df.columns if c not in by_name]
    if unknown:
        raise ValueError(f"equality columns not in schema: {unknown}")
    ids = [by_name[c]["id"] for c in keys_df.columns]
    pnames = [f["name"] for f in _partition_fields(meta)]
    sid = meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    data_e, pos_e, eq_e = _live_entries(meta, snaps[sid], table_path)

    version = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    del_dir = os.path.join(table_path, "data", f"eqdeletes-{version}")
    (
        keys_df.select(
            *[
                F.col(c).alias(c, metadata={"parquet.field.id": by_name[c]["id"]})
                for c in keys_df.columns
            ]
        )
        .sort(*keys_df.columns)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(del_dir)
    )
    new_delete_entries: list[dict] = []
    for root, _dirs, names in os.walk(del_dir):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            new_delete_entries.append(
                {
                    "status": 1,
                    "snapshot_id": None,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 2,
                        "file_path": "file://" + full,
                        "file_format": "PARQUET",
                        "partition": {n: None for n in pnames},
                        "record_count": _parquet_row_count(full),
                        "file_size_in_bytes": os.path.getsize(full),
                        "equality_ids": ids,
                    },
                }
            )
    return _write_snapshot(
        table_path,
        meta,
        [_carry(e, status=0) for e in data_e],
        operation="delete",
        delete_entries=[_carry(e, status=0) for e in pos_e + eq_e]
        + new_delete_entries,
    )
