"""Minimal Delta Lake table reader (+ fixture writer) on vanilla Spark.

The Delta transaction protocol is public (delta.io PROTOCOL.md): a table
is a directory of parquet data files plus a ``_delta_log/`` of ordered
JSON commits, each a list of actions (``protocol``, ``metaData``,
``add``, ``remove``). The live file set at version V is the replay of
commits 0..V. Vanilla Spark cannot read such tables without the external
delta-spark package; this module implements the reader side of the
protocol directly, because a 100 TB lake's tables frequently live in
this layout.

Scale shape: the transaction log is METADATA — real Delta readers replay
it driver-side exactly as done here (the log is bounded by file count,
not row count). The data read stays fully distributed: the resolved file
list goes to one ``spark.read.parquet(*files)`` per partition-value
group with an explicit schema, so column pruning and predicate pushdown
reach the parquet scans unchanged, and partition-column equality
predicates prune whole groups before any I/O.

Honest scope (unsupported features raise, never misread):
- JSON commits plus CLASSIC checkpoint parquet (``_last_checkpoint`` +
  ``<version>.checkpoint.parquet`` — the standard every-10-commits log
  compaction; replay starts from the newest checkpoint at or below the
  requested version and applies the JSON commits after it) plus V2
  checkpoints (``<version>.checkpoint.<uuid>.{parquet,json}`` top-level
  file with ``checkpointMetadata`` + ``sidecar`` actions; file actions
  read from the ``_delta_log/_sidecars/`` parquet files, PROTOCOL.md
  "V2 spec"). Multi-part classic checkpoints raise;
- DELETION VECTORS (PROTOCOL.md "Deletion Vectors"): adds carrying a
  ``deletionVector`` descriptor are read with the DV's row indexes
  masked out — inline ('i', Z85 payload), relative-path ('u', Z85 uuid
  file name) and path ('p') storage, CRC-verified file blobs, and the
  64-bit RoaringBitmapArray portable format parsed natively
  (``sources.roaring``, all three container types);
- COLUMN MAPPING in 'name' AND 'id' mode (PROTOCOL.md "Column
  Mapping"): name-mode scans use the fields'
  delta.columnMapping.physicalName; id-mode scans resolve columns by
  PARQUET FIELD ID (delta.columnMapping.id -> parquet.field.id read
  schema — names in the files are ignored, proven by a
  scrambled-names test); partitionValues are keyed by physical name,
  the result carries the logical schema;
- ``minReaderVersion`` must be 1, 2 (column mapping), or 3 with
  ``readerFeatures`` a subset of {v2Checkpoint, deletionVectors,
  columnMapping}; anything else (type widening, ...) raises.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"


def _commit_files(table_path: str, *, allow_empty: bool = False) -> list[tuple[int, str]]:
    log_dir = os.path.join(table_path, _LOG_DIR)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {table_path}")
    out = []
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and stem.isdigit():
            out.append((int(stem), os.path.join(log_dir, name)))
    if not out and not allow_empty:
        raise FileNotFoundError(f"empty Delta log: {log_dir}")
    return sorted(out)


# Reader features this module implements: v2 checkpoints and deletion
# vectors (column mapping / type widening change how data files are
# interpreted and MUST raise, never misread).
_SUPPORTED_READER_FEATURES = frozenset(
    {"v2Checkpoint", "deletionVectors", "columnMapping"}
)


def _check_protocol(protocol: dict) -> None:
    """Raise unless this reader can honor the table's protocol action:
    minReaderVersion 1, or 3 with readerFeatures we implement (table
    features, PROTOCOL.md). mrv=2 is column mapping — unsupported."""
    mrv = protocol.get("minReaderVersion") or 1
    if mrv == 1:
        return
    if mrv == 2:
        # reader version 2 = column mapping; implemented ('name' mode —
        # 'id' mode raises at read time where the mode is known)
        return
    if mrv == 3:
        features = protocol.get("readerFeatures")
        if features is None:
            # the spec REQUIRES readerFeatures at mrv 3; absent means we
            # cannot know what reading needs — fail loud, never misread
            raise NotImplementedError(
                "Delta minReaderVersion=3 without a readerFeatures list"
            )
        unsupported = set(features) - _SUPPORTED_READER_FEATURES
        if not unsupported:
            return
        raise NotImplementedError(
            f"Delta readerFeatures {sorted(unsupported)} not implemented "
            "by this minimal reader"
        )
    raise NotImplementedError(
        f"Delta minReaderVersion={mrv} is newer than this minimal reader"
    )


def _classify_checkpoint_name(name: str) -> tuple[int, str] | None:
    """(version, kind) for a checkpoint file name, else None.
    kinds: 'classic' (<v>.checkpoint.parquet), 'v2' (<v>.checkpoint.
    <uuid>.{parquet,json}); multi-part classic (<v>.checkpoint.<i>.<n>.
    parquet) raises — silently replaying one part would drop files."""
    parts = name.split(".")
    if len(parts) < 3 or parts[1] != "checkpoint" or not parts[0].isdigit():
        return None
    v = int(parts[0])
    if len(parts) == 3 and parts[2] == "parquet":
        return (v, "classic")
    if len(parts) == 5 and parts[2].isdigit() and parts[3].isdigit() and parts[4] == "parquet":
        raise NotImplementedError(f"multi-part Delta checkpoint not supported: {name}")
    if len(parts) == 4 and parts[3] in ("parquet", "json"):
        return (v, "v2")
    raise NotImplementedError(f"unrecognized Delta checkpoint layout: {name}")


def _checkpoint_at_or_below(
    table_path: str, version: int | None
) -> tuple[int, str, str] | None:
    """Newest checkpoint usable for ``version`` (None = latest) as
    ``(version, path, kind)`` — classic parquet or v2 (top-level file +
    sidecars), discovered from ``_last_checkpoint`` when valid plus a
    log-dir scan. Classic preferred when both exist at one version."""
    log_dir = os.path.join(table_path, _LOG_DIR)
    # (version, kind_rank, path): kind_rank 0 = classic preferred
    found: dict[tuple[int, int], str] = {}
    last = os.path.join(log_dir, "_last_checkpoint")
    last_version: int | None = None
    if os.path.exists(last):
        with open(last, encoding="utf-8") as fh:
            meta = json.load(fh)
        if meta.get("parts"):
            raise NotImplementedError("multi-part Delta checkpoints not supported")
        last_version = int(meta["version"])
    for name in os.listdir(log_dir):
        classified = _classify_checkpoint_name(name)
        if classified is None:
            continue
        v, kind = classified
        found[(v, 0 if kind == "classic" else 1)] = os.path.join(log_dir, name)
    usable = [
        (v, rank) for (v, rank) in found if version is None or v <= version
    ]
    if not usable:
        if last_version is not None and (version is None or last_version <= version):
            raise FileNotFoundError(
                f"_last_checkpoint points at version {last_version} but no "
                f"checkpoint file exists in {log_dir}"
            )
        return None
    v, rank = min(usable, key=lambda t: (-t[0], t[1]))
    return (v, found[(v, rank)], "classic" if rank == 0 else "v2")


def _normalize_pv(pv) -> dict:
    """partitionValues as a plain dict: checkpoint parquet MAP columns
    come back from pyarrow as a list of (key, value) tuples, legacy
    struct-typed checkpoints and JSON commits as a dict, absent as None."""
    if pv is None:
        return {}
    if isinstance(pv, dict):
        return pv
    return dict(pv)


def _replay(
    table_path: str, version: int | None = None
) -> tuple[dict[str, dict], str | None, list[str], dict, int, dict]:
    """Checkpoint-aware log replay shared by every entry point (reader,
    delete_partition, write_checkpoint): newest usable checkpoint parquet
    first (if any), then the JSON commits after it. Returns
    ``(live_adds, schema_string, partition_columns, protocol, version,
    configuration)``.

    Metadata-scale by construction: the checkpoint is read driver-side
    with pyarrow (bounded by file count, not row count), exactly the
    replay real Delta readers perform."""
    commits = _commit_files(table_path, allow_empty=True)
    ckpt = _checkpoint_at_or_below(table_path, version)
    if version is not None:
        commits = [(v, p) for v, p in commits if v <= version]
        reachable = commits and commits[-1][0] == version
        if not reachable and not (ckpt is not None and ckpt[0] == version):
            have = sorted(
                {v for v, _ in _commit_files(table_path, allow_empty=True)}
                | ({ckpt[0]} if ckpt else set())
            )
            raise ValueError(f"version {version} not in Delta log (have {have})")
    if not commits and ckpt is None:
        raise FileNotFoundError(f"empty Delta log: {table_path}/{_LOG_DIR}")
    live: dict[str, dict] = {}
    schema_string: str | None = None
    partition_columns: list[str] = []
    configuration: dict = {}
    protocol: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
    resolved_version = ckpt[0] if ckpt is not None else -1
    if ckpt is not None:
        ckpt_version, ckpt_path, ckpt_kind = ckpt

        def _apply_ckpt_row(d: dict) -> None:
            nonlocal schema_string, partition_columns, protocol, configuration
            if d.get("protocol"):
                protocol = {k: v for k, v in d["protocol"].items() if v is not None}
                _check_protocol(protocol)
            if d.get("metaData"):
                schema_string = d["metaData"]["schemaString"]
                partition_columns = list(d["metaData"].get("partitionColumns") or [])
                configuration = _normalize_pv(d["metaData"].get("configuration"))
            if d.get("add"):
                add = dict(d["add"])
                add["partitionValues"] = _normalize_pv(add.get("partitionValues"))
                live[add["path"]] = add
            # remove actions in a checkpoint are tombstones for vacuum,
            # not live-set state: a checkpointed remove's file is already
            # absent from the checkpoint's add set.

        # A checkpoint is the full action state: one row per action with
        # nullable protocol/metaData/add/remove columns (partitionValues
        # is MAP<string,string> per the spec; legacy struct-typed
        # fixtures are normalized too). V2 top-level files additionally
        # carry checkpointMetadata + sidecar actions, with the file
        # actions living in _delta_log/_sidecars/ parquet files.
        if ckpt_kind == "classic":
            import pyarrow.parquet as papq

            for d in papq.read_table(ckpt_path).to_pylist():
                _apply_ckpt_row(d)
        else:
            for d in _v2_checkpoint_rows(table_path, ckpt_path):
                _apply_ckpt_row(d)
        commits = [(v, p) for v, p in commits if v > ckpt_version]
    for v, commit_path in commits:
        resolved_version = v
        with open(commit_path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                    _check_protocol(protocol)
                elif "metaData" in action:
                    md = action["metaData"]
                    if md.get("format", {}).get("provider", "parquet") != "parquet":
                        raise NotImplementedError(
                            f"non-parquet Delta format: {md['format']}"
                        )
                    schema_string = md["schemaString"]
                    partition_columns = list(md.get("partitionColumns", []))
                    configuration = _normalize_pv(md.get("configuration"))
                elif "add" in action:
                    add = dict(action["add"])
                    add["partitionValues"] = _normalize_pv(add.get("partitionValues"))
                    live[add["path"]] = add
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                # commitInfo / txn / cdc actions carry no file-set state
    return live, schema_string, partition_columns, protocol, resolved_version, configuration


def _v2_checkpoint_rows(table_path: str, ckpt_path: str):
    """Yield action dicts from a V2 checkpoint: the top-level file
    (parquet or json) first — its checkpointMetadata is validated, its
    sidecar actions resolved to ``_delta_log/_sidecars/`` parquet files
    whose rows are yielded too (PROTOCOL.md V2 spec: file actions may
    live inline in the top-level file, in sidecars, or both)."""
    import pyarrow.parquet as papq

    log_dir = os.path.join(table_path, _LOG_DIR)
    expected_version = int(os.path.basename(ckpt_path).split(".", 1)[0])
    if ckpt_path.endswith(".json"):
        with open(ckpt_path, encoding="utf-8") as fh:
            top = [json.loads(line) for line in fh if line.strip()]
    else:
        top = papq.read_table(ckpt_path).to_pylist()
    sidecars: list[str] = []
    for d in top:
        cm = d.get("checkpointMetadata")
        if cm and int(cm.get("version", expected_version)) != expected_version:
            raise ValueError(
                f"v2 checkpoint metadata version {cm['version']} != file "
                f"name version {expected_version}: {ckpt_path}"
            )
        sc = d.get("sidecar")
        if sc:
            rel = sc["path"]
            # spec: sidecars always live in _delta_log/_sidecars; writers
            # are encouraged to store just the file name
            full = (
                os.path.join(log_dir, rel)
                if "/" in rel
                else os.path.join(log_dir, "_sidecars", rel)
            )
            sidecars.append(full)
        yield d
    for sidecar_path in sidecars:
        if not os.path.exists(sidecar_path):
            raise FileNotFoundError(f"v2 checkpoint sidecar missing: {sidecar_path}")
        yield from papq.read_table(sidecar_path).to_pylist()


def read_delta_table(
    spark: SparkSession, table_path: str, *, version: int | None = None
) -> DataFrame:
    """Read a Delta table at ``version`` (default: latest) by replaying
    the log (checkpoint parquet + later JSON commits). Returns a
    DataFrame with the table's declared schema (partition columns
    reconstructed from ``partitionValues`` and cast to their declared
    types, Delta semantics)."""
    live, schema_string, partition_columns, _protocol, _v, configuration = _replay(
        table_path, version
    )
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    schema = T.StructType.fromJson(json.loads(schema_string))
    if not live:
        return spark.createDataFrame([], schema)
    # COLUMN MAPPING (PROTOCOL.md): in 'name' mode the parquet files
    # carry physical column names (field metadata
    # delta.columnMapping.physicalName) and partitionValues are keyed by
    # physical name; the scan uses physical names and the final select
    # renames to the logical schema. 'id' mode (parquet field-id
    # matching) is not implemented and raises.
    mapping_mode = configuration.get("delta.columnMapping.mode", "none")
    if mapping_mode not in ("none", "name", "id"):
        raise NotImplementedError(
            f"Delta columnMapping.mode={mapping_mode!r} not implemented"
        )
    phys = {
        f.name: (f.metadata or {}).get("delta.columnMapping.physicalName", f.name)
        for f in schema.fields
    }
    data_fields = [f for f in schema.fields if f.name not in partition_columns]
    if mapping_mode == "id":
        # ID mode: columns resolve by parquet FIELD ID, never by name
        # (PROTOCOL.md) — the read schema carries delta.columnMapping.id
        # as parquet.field.id metadata and the parquet reader matches on
        # it (same mechanism as the Iceberg reader). The physical name
        # in the schema is a display label only.
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        data_schema = T.StructType(
            [
                T.StructField(
                    phys[f.name],
                    f.dataType,
                    f.nullable,
                    {"parquet.field.id": (f.metadata or {})["delta.columnMapping.id"]},
                )
                for f in data_fields
            ]
        )
    else:
        data_schema = T.StructType(
            [T.StructField(phys[f.name], f.dataType, f.nullable) for f in data_fields]
        )
    logical_select = [
        F.col(phys[f.name]).alias(f.name) if f.name not in partition_columns
        else F.col(f.name)
        for f in schema.fields
    ]

    def _scan_plain(paths: list[str]) -> DataFrame:
        return spark.read.schema(data_schema).parquet(*paths)

    def _scan_with_dv(path: str, dv: dict) -> DataFrame:
        # A deletion vector marks PHYSICAL row indexes of the parquet
        # file as deleted; Spark's _metadata.row_index exposes exactly
        # that index, so the masked read is scan -> broadcast anti-join
        # against the (per-file, bounded-by-file-rows) position set —
        # the same shape real DV readers use (the bitmap is per-file
        # memory-resident there too).
        positions = _load_dv(table_path, dv)
        df = (
            spark.read.schema(data_schema)
            .parquet(path)
            .withColumn("__dv_pos", F.col("_metadata.row_index"))
        )
        pos_df = spark.createDataFrame(
            [(int(p),) for p in positions], T.StructType([T.StructField("__dv_pos", T.LongType())])
        )
        return df.join(F.broadcast(pos_df), "__dv_pos", "left_anti").drop("__dv_pos")

    def _file_frames(adds: list[dict]) -> list[DataFrame]:
        """One frame per contiguous plain-file run + one per DV'd file."""
        frames: list[DataFrame] = []
        plain: list[str] = []
        for add in adds:
            full = os.path.join(table_path, add["path"])
            dv = add.get("deletionVector")
            if dv:
                if plain:
                    frames.append(_scan_plain(plain))
                    plain = []
                frames.append(_scan_with_dv(full, dv))
            else:
                plain.append(full)
        if plain:
            frames.append(_scan_plain(plain))
        return frames

    if not partition_columns:
        frames = _file_frames([live[p] for p in sorted(live)])
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out.select(*logical_select)
    # Partitioned: group live files by their partitionValues tuple; the
    # group count is the live-partition count (metadata-scale), each
    # group is ONE parquet scan with the partition values injected as
    # cast literals (Delta stores them as strings in the log, typed by
    # the table schema).
    ptypes = {f.name: f.dataType for f in schema.fields if f.name in partition_columns}
    groups: dict[tuple, list[dict]] = {}
    for path, add in sorted(live.items()):
        pv = add.get("partitionValues", {})
        key = tuple(pv.get(phys[c]) for c in partition_columns)
        groups.setdefault(key, []).append(add)
    parts = []
    # None-safe group order: null partition values (__HIVE_DEFAULT_
    # PARTITION__ / JSON null) are legal Delta state and must not crash
    # the str-vs-None comparison — nulls sort first, deterministically.
    for key, adds in sorted(
        groups.items(), key=lambda kv: tuple((v is not None, v or "") for v in kv[0])
    ):
        for df in _file_frames(adds):
            for col, val in zip(partition_columns, key):
                lit = F.lit(None) if val is None else F.lit(val)
                df = df.withColumn(col, lit.cast(ptypes[col]))
            parts.append(df.select(*logical_select))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _load_dv(table_path: str, dv: dict) -> list[int]:
    """Resolve a deletionVector descriptor to its deleted row indexes.

    storageType 'i': pathOrInlineDv IS the Z85-encoded serialized
    RoaringBitmapArray (sizeInBytes trims the 4-byte-block padding).
    storageType 'p'/'u': an on-disk DV file — format version byte 1,
    then at ``offset``: 4-byte big-endian data size, the bitmap bytes,
    and a 4-byte big-endian CRC-32 of the data, which is verified.
    'u' descriptors encode the file name as <optional prefix><20-char
    Z85 uuid> -> <prefix>/deletion_vector_<uuid>.bin under the table."""
    import struct
    import uuid as _uuid
    import zlib

    from healthcare_etl_spark.sources.roaring import parse_rbm_array, z85_decode

    storage = dv.get("storageType")
    size = int(dv.get("sizeInBytes"))
    if storage == "i":
        return parse_rbm_array(z85_decode(dv["pathOrInlineDv"], size))
    if storage == "p":
        dv_path = os.path.join(table_path, dv["pathOrInlineDv"])
    elif storage == "u":
        raw = dv["pathOrInlineDv"]
        prefix, enc = raw[:-20], raw[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc, 16))
        parts = [table_path] + ([prefix] if prefix else []) + [f"deletion_vector_{u}.bin"]
        dv_path = os.path.join(*parts)
    else:
        raise NotImplementedError(f"deletion vector storageType {storage!r}")
    with open(dv_path, "rb") as fh:
        blob = fh.read()
    if not blob or blob[0] != 1:
        raise ValueError(f"unsupported DV file format version in {dv_path}")
    offset = int(dv["offset"])
    (data_size,) = struct.unpack_from(">i", blob, offset)
    if data_size != size:
        raise ValueError(f"DV size mismatch in {dv_path}: {data_size} != {size}")
    data = blob[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch in {dv_path}")
    return parse_rbm_array(data)


def write_delta_table(
    df: DataFrame,
    table_path: str,
    *,
    partition_by: list[str] | None = None,
    column_mapping: bool | str = False,
) -> None:
    """Write ``df`` as version 0 of a new Delta table (data files +
    hand-built JSON commit). Fixture-grade writer: enough protocol for
    ``read_delta_table`` and any real Delta reader to consume — used by
    the registered scan query and the round-trip tests; a production
    sink would add optimistic-concurrency commit semantics.

    ``column_mapping``: ``'name'`` (or ``True``) writes a NAME-mode
    column-mapping table (PROTOCOL.md): parquet files carry
    deterministic physical column names, the schemaString fields carry
    delta.columnMapping.id / physicalName metadata, configuration sets
    the mode, and the protocol is the legacy column-mapping pair
    (2, 5). ``'id'`` writes ID mode: same physical layout plus
    parquet FIELD IDS stamped into the data files (the reader then
    resolves columns by delta.columnMapping.id, ignoring names — the
    same parquet.field.id mechanism as the Iceberg reader)."""
    import uuid as _uuid

    partition_by = partition_by or []
    protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
    configuration: dict = {}
    schema_json = df.schema.json()
    physical_partition_by = partition_by
    mode = {True: "name", False: None}.get(column_mapping, column_mapping)
    if mode not in (None, "name", "id"):
        raise ValueError(f"column_mapping must be False/'name'/'id', got {mode!r}")
    if mode:
        phys = {
            f.name: "col-"
            + str(_uuid.uuid5(_uuid.NAMESPACE_URL, f"hes-delta-col-{f.name}"))[:8]
            for f in df.schema.fields
        }
        fields = [
            T.StructField(
                f.name,
                f.dataType,
                f.nullable,
                {
                    "delta.columnMapping.id": i + 1,
                    "delta.columnMapping.physicalName": phys[f.name],
                },
            )
            for i, f in enumerate(df.schema.fields)
        ]
        schema_json = T.StructType(fields).json()
        df = df.select(
            *[
                F.col(f.name).alias(
                    phys[f.name],
                    metadata=(
                        {"parquet.field.id": i + 1} if mode == "id" else {}
                    ),
                )
                for i, f in enumerate(df.schema.fields)
            ]
        )
        physical_partition_by = [phys[c] for c in partition_by]
        configuration = {
            "delta.columnMapping.mode": mode,
            "delta.columnMapping.maxColumnId": str(len(fields)),
        }
        protocol = {"minReaderVersion": 2, "minWriterVersion": 5}
    writer = df.write.mode("overwrite")
    if physical_partition_by:
        writer = writer.partitionBy(*physical_partition_by)
    writer.parquet(table_path)
    adds = []
    for root, _dirs, files in os.walk(table_path):
        if _LOG_DIR in root:
            continue
        for name in files:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, table_path)
            pv = {}
            for piece in rel.split(os.sep)[:-1]:
                if "=" in piece:
                    k, v = piece.split("=", 1)
                    pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
            adds.append(
                {
                    "add": {
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": pv,
                        "size": os.path.getsize(full),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
    actions = [
        {"protocol": protocol},
        {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000000",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": partition_by,
                "configuration": configuration,
                "createdTime": 0,
            }
        },
        *sorted(adds, key=lambda a: a["add"]["path"]),
    ]
    _write_commit(table_path, 0, actions)


def delete_partition(table_path: str, column: str, value: str) -> int:
    """Append a commit that removes every live file of one partition
    (Delta metadata-only DELETE, e.g. dropping a bad ingest day): the
    data files are untouched; the new version's replay just no longer
    lists them. Returns the new version number.

    Replays via the shared checkpoint-aware ``_replay`` — a table whose
    older JSON commits were vacuumed after a checkpoint still resolves
    the full live set (a JSON-only replay here would silently delete
    nothing for files whose add actions live only in the checkpoint).
    ``column`` is the LOGICAL name; on column-mapping tables the
    partitionValues keys are physical, so the name is resolved through
    the schema metadata first (matching on the logical key would
    silently remove nothing — the same fail-silent class the r8 advice
    flagged for the checkpoint replay)."""
    live, schema_string, _pcols, _protocol, current_version, _conf = _replay(table_path)
    pv_key = column
    if schema_string is not None:
        for f in T.StructType.fromJson(json.loads(schema_string)).fields:
            if f.name == column:
                pv_key = (f.metadata or {}).get(
                    "delta.columnMapping.physicalName", column
                )
    removes = [
        {"remove": {"path": p, "deletionTimestamp": 0, "dataChange": True}}
        for p, add in sorted(live.items())
        if add.get("partitionValues", {}).get(pv_key) == value
    ]
    new_version = current_version + 1
    _write_commit(table_path, new_version, removes)
    return new_version


def write_checkpoint(spark: SparkSession, table_path: str) -> int:
    """Compact the JSON log into a CLASSIC checkpoint parquet at the
    latest version (+ ``_last_checkpoint`` pointer) — the standard
    every-10-commits Delta maintenance op that bounds log-replay cost.
    After this, readers replay [checkpoint] + [later JSON commits] and
    the older JSON commits are dead weight (vacuumable). Returns the
    checkpointed version. Fixture-grade: carries the action fields this
    reader (and the live-set semantics) need; a production writer also
    carries txn/commitInfo and stats."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    # Checkpoint-aware replay: re-checkpointing a table that already has
    # a checkpoint (with vacuumed older JSON commits) must carry the
    # checkpointed live set forward, not just the surviving JSON tail.
    live, schema_string, partition_columns, protocol, version, _conf = _replay(table_path)
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    if any(a.get("deletionVector") for a in live.values()):
        # the fixture checkpoint schema has no DV struct; compacting a
        # DV table here would silently RESURRECT deleted rows
        raise NotImplementedError(
            "checkpointing a table with live deletion vectors is not "
            "supported by the fixture checkpoint writers"
        )
    rows = [
        {
            # restrict to the two version ints the explicit struct carries
            "protocol": {
                "minReaderVersion": int(protocol.get("minReaderVersion", 1)),
                "minWriterVersion": int(protocol.get("minWriterVersion", 2)),
            },
            "metaData": None,
            "add": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000000",
                "schemaString": schema_string,
                "partitionColumns": partition_columns,
            },
            "add": None,
        },
    ]
    for path in sorted(live):
        add = live[path]
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": {
                    "path": add["path"],
                    # pyarrow map columns take list-of-pairs input
                    "partitionValues": sorted(
                        add.get("partitionValues", {}).items()
                    ),
                    "size": add.get("size", 0),
                    "modificationTime": add.get("modificationTime", 0),
                    "dataChange": False,
                },
            }
        )
    # Explicit schema: the spec types add.partitionValues as
    # MAP<string,string> — struct inference breaks on unpartitioned
    # tables (empty struct is unwritable) and deviates from PROTOCOL.md.
    ckpt_schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    log_dir = os.path.join(table_path, _LOG_DIR)
    papq.write_table(
        pa.Table.from_pylist(rows, schema=ckpt_schema),
        os.path.join(log_dir, f"{version:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    return version


def write_checkpoint_v2(
    spark: SparkSession, table_path: str, *, n_sidecars: int = 2
) -> int:
    """Compact the log into a V2 checkpoint (PROTOCOL.md V2 spec): a
    top-level ``<version>.checkpoint.<uuid>.parquet`` carrying
    checkpointMetadata + protocol + metaData + sidecar actions, with the
    file actions split across ``_delta_log/_sidecars/`` parquet files —
    the layout modern writers emit for very large tables (sidecars are
    readable in parallel and reusable across checkpoints). Upgrades the
    protocol row to table features (minReaderVersion 3 + readerFeatures
    [v2Checkpoint]) as the spec requires for a v2-checkpointed table.
    Fixture-grade, same caveats as ``write_checkpoint``. Returns the
    checkpointed version."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as papq

    live, schema_string, partition_columns, _protocol, version, _conf = _replay(table_path)
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    if any(a.get("deletionVector") for a in live.values()):
        raise NotImplementedError(
            "checkpointing a table with live deletion vectors is not "
            "supported by the fixture checkpoint writers"
        )
    log_dir = os.path.join(table_path, _LOG_DIR)
    sidecar_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sidecar_dir, exist_ok=True)

    add_field = pa.field(
        "add",
        pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
            ]
        ),
    )
    sidecar_schema = pa.schema([add_field])
    add_rows = [
        {
            "add": {
                "path": add["path"],
                "partitionValues": sorted(add.get("partitionValues", {}).items()),
                "size": add.get("size", 0),
                "modificationTime": add.get("modificationTime", 0),
                "dataChange": False,
            }
        }
        for _path, add in sorted(live.items())
    ]
    n_sidecars = max(1, min(n_sidecars, len(add_rows)) if add_rows else 1)
    chunk = -(-len(add_rows) // n_sidecars) if add_rows else 1
    sidecar_actions = []
    # deterministic uuids so fixture writes are reproducible
    ns = uuid.uuid5(uuid.NAMESPACE_URL, f"{os.path.abspath(table_path)}@{version}")
    for i in range(n_sidecars):
        rows = add_rows[i * chunk : (i + 1) * chunk]
        name = f"{uuid.uuid5(ns, f'sidecar-{i}')}.parquet"
        full = os.path.join(sidecar_dir, name)
        papq.write_table(pa.Table.from_pylist(rows, schema=sidecar_schema), full)
        sidecar_actions.append(
            {
                "sidecar": {
                    "path": name,
                    "sizeInBytes": os.path.getsize(full),
                    "modificationTime": 0,
                }
            }
        )
    top_schema = pa.schema(
        [
            pa.field("checkpointMetadata", pa.struct([("version", pa.int64())])),
            pa.field(
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                    ]
                ),
            ),
        ]
    )
    top_rows = [
        {"checkpointMetadata": {"version": version}},
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint"],
                "writerFeatures": ["v2Checkpoint"],
            }
        },
        {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000000",
                "schemaString": schema_string,
                "partitionColumns": partition_columns,
            }
        },
        *sidecar_actions,
    ]
    top_name = f"{version:020d}.checkpoint.{uuid.uuid5(ns, 'top')}.parquet"
    papq.write_table(
        pa.Table.from_pylist(top_rows, schema=top_schema),
        os.path.join(log_dir, top_name),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        json.dump({"version": version, "size": len(top_rows) + len(add_rows)}, fh)
    return version


def _write_commit(table_path: str, version: int, actions: list[dict]) -> None:
    log_dir = os.path.join(table_path, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    commit = os.path.join(log_dir, f"{version:020d}.json")
    with open(commit, "w", encoding="utf-8") as fh:
        for action in actions:
            fh.write(json.dumps(action, separators=(",", ":")) + "\n")


def delete_rows(
    spark: SparkSession,
    table_path: str,
    predicate: str,
    *,
    storage: str = "i",
) -> int:
    """Row-level DELETE via deletion vectors (fixture-grade writer for
    the reader above + any DV-capable reader): for every live file with
    rows matching ``predicate`` (a Spark SQL boolean over the data
    columns), append a commit that re-adds the file with a deletion
    vector marking those physical row indexes and removes the old add —
    data files untouched, the Delta DV contract. Upgrades the protocol
    to table features (minReaderVersion 3 / minWriterVersion 7 with
    deletionVectors listed). ``storage``: 'i' (inline Z85) or 'u'
    (CRC'd .bin file under the table root). Returns the new version.

    The row-index discovery reads each affected file once with
    ``_metadata.row_index`` — bounded by file size, the same per-file
    pass a real DV writer's touched-file rewrite performs."""
    import struct
    import uuid as _uuid
    import zlib

    from healthcare_etl_spark.sources.roaring import serialize_rbm_array, z85_encode

    live, schema_string, partition_columns, protocol, current_version, conf = _replay(
        table_path
    )
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    schema = T.StructType.fromJson(json.loads(schema_string))
    mapping_mode = conf.get("delta.columnMapping.mode", "none")
    if mapping_mode not in ("none", "name"):
        raise NotImplementedError(
            f"Delta columnMapping.mode={mapping_mode!r} not implemented"
        )
    # column mapping: scan by physical name, rename to logical so the
    # caller's predicate is written over the logical schema
    phys = {
        f.name: (f.metadata or {}).get("delta.columnMapping.physicalName", f.name)
        for f in schema.fields
    }
    data_fields = [f for f in schema.fields if f.name not in partition_columns]
    data_schema = T.StructType(
        [T.StructField(phys[f.name], f.dataType, f.nullable) for f in data_fields]
    )
    for path in sorted(live):
        if live[path].get("deletionVector"):
            raise NotImplementedError(
                "fixture delete_rows does not merge with an existing DV"
            )
    # Row-index discovery is ONE distributed scan over ALL live files
    # (``_metadata.file_path`` attributes each matching row to its file)
    # instead of one driver-sequenced job per file — the per-file loop
    # was O(files) round trips of pure scheduling overhead and is the
    # exact driver-side pattern guide §5 warns about; a real DV writer's
    # touched-file pass is likewise one distributed job.
    from urllib.parse import unquote, urlparse

    # realpath on BOTH sides: Spark reports the filesystem-resolved path
    # in _metadata.file_path, so a symlinked table_path would miss an
    # abspath-keyed lookup (ADVICE r9).
    rel_by_abs = {
        os.path.realpath(os.path.join(table_path, p)): p for p in live
    }
    all_df = (
        spark.read.schema(data_schema)
        .parquet(*[os.path.join(table_path, p) for p in sorted(live)])
        .withColumn("__ri", F.col("_metadata.row_index"))
        .withColumn("__fp", F.col("_metadata.file_path"))
        .select(
            "__ri",
            "__fp",
            *[F.col(phys[f.name]).alias(f.name) for f in data_fields],
        )
    )
    hits_by_file: dict[str, list[int]] = {}
    for r in all_df.filter(predicate).select("__fp", "__ri").collect():
        abs_path = os.path.realpath(unquote(urlparse(r["__fp"]).path))
        rel = rel_by_abs.get(abs_path)
        if rel is None:  # pragma: no cover - metadata path outside the log
            raise ValueError(f"matched row in unknown file: {r['__fp']}")
        hits_by_file.setdefault(rel, []).append(r["__ri"])
    actions: list[dict] = []
    for path in sorted(live):
        add = live[path]
        full = os.path.join(table_path, path)
        hit = hits_by_file.get(path, [])
        if not hit:
            continue
        data = serialize_rbm_array(hit)
        if storage == "i":
            descriptor = {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(data),
                "sizeInBytes": len(data),
                "cardinality": len(hit),
            }
        elif storage == "u":
            u = _uuid.uuid5(_uuid.NAMESPACE_URL, f"{os.path.abspath(full)}@dv")
            blob = (
                b"\x01"
                + struct.pack(">i", len(data))
                + data
                + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
            )
            with open(
                os.path.join(table_path, f"deletion_vector_{u}.bin"), "wb"
            ) as fh:
                fh.write(blob)
            descriptor = {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(u.bytes),
                "offset": 1,
                "sizeInBytes": len(data),
                "cardinality": len(hit),
            }
        else:
            raise ValueError(f"storage must be 'i' or 'u', got {storage!r}")
        actions.append(
            {"remove": {"path": path, "deletionTimestamp": 0, "dataChange": True}}
        )
        new_add = {k: v for k, v in add.items() if k != "deletionVector"}
        new_add["deletionVector"] = descriptor
        new_add["dataChange"] = True
        actions.append({"add": new_add})
    features = sorted(set(protocol.get("readerFeatures") or []) | {"deletionVectors"})
    wfeatures = sorted(set(protocol.get("writerFeatures") or []) | {"deletionVectors"})
    actions.insert(
        0,
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": features,
                "writerFeatures": wfeatures,
            }
        },
    )
    new_version = current_version + 1
    _write_commit(table_path, new_version, actions)
    return new_version


def optimize_compact(spark: SparkSession, table_path: str) -> int:
    """OPTIMIZE (bin-packing compaction): rewrite every live partition
    group that has more than one file — or any file carrying a deletion
    vector — into a single compacted file, and commit the swap with
    ``dataChange=false`` adds/removes (the Delta contract for
    compaction: readers see identical rows, streaming readers skip the
    rewrite). Deletion vectors are APPLIED during the rewrite (masked
    rows physically dropped), so compacted files carry no DV — exactly
    what engine OPTIMIZE does. Old files stay on disk for time travel.
    Returns the new version, or the current one if nothing needed
    compaction.

    Scale shape: the rewrite is per partition group (one distributed
    masked scan + one write each); the commit is metadata. A production
    OPTIMIZE adds a target file size and bin-packs within the group —
    at fixture scale every multi-file group packs to one file, which is
    the same code path."""
    live, schema_string, partition_columns, _protocol, version, configuration = (
        _replay(table_path)
    )
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    schema = T.StructType.fromJson(json.loads(schema_string))
    phys = {
        f.name: (f.metadata or {}).get("delta.columnMapping.physicalName", f.name)
        for f in schema.fields
    }
    data_fields = [f for f in schema.fields if f.name not in partition_columns]
    data_schema = T.StructType(
        [T.StructField(phys[f.name], f.dataType, f.nullable) for f in data_fields]
    )

    groups: dict[tuple, list[tuple[str, dict]]] = {}
    for path, add in sorted(live.items()):
        pv = add.get("partitionValues", {})
        key = tuple(sorted(pv.items()))
        groups.setdefault(key, []).append((path, add))

    new_version = version + 1
    actions: list[dict] = []
    n_written = 0
    for key, members in sorted(groups.items()):
        needs = len(members) > 1 or any(a.get("deletionVector") for _p, a in members)
        if not needs:
            continue
        frames = []
        plain = []
        for path, add in members:
            full = os.path.join(table_path, path)
            dv = add.get("deletionVector")
            if dv:
                positions = _load_dv(table_path, dv)
                df = (
                    spark.read.schema(data_schema)
                    .parquet(full)
                    .withColumn("__dv_pos", F.col("_metadata.row_index"))
                )
                pos_df = spark.createDataFrame(
                    [(int(p),) for p in positions],
                    T.StructType([T.StructField("__dv_pos", T.LongType())]),
                )
                frames.append(
                    df.join(F.broadcast(pos_df), "__dv_pos", "left_anti").drop(
                        "__dv_pos"
                    )
                )
            else:
                plain.append(full)
        if plain:
            frames.append(spark.read.schema(data_schema).parquet(*plain))
        merged = frames[0]
        for fr in frames[1:]:
            merged = merged.unionByName(fr)
        out_dir = os.path.join(table_path, f"compact-{new_version}", str(n_written))
        merged.coalesce(1).write.mode("overwrite").parquet(out_dir)
        pv = dict(key)
        for root, _dirs, names in os.walk(out_dir):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, table_path).replace(os.sep, "/")
                actions.append(
                    {
                        "add": {
                            "path": rel,
                            "partitionValues": pv,
                            "size": os.path.getsize(full),
                            "modificationTime": 0,
                            "dataChange": False,
                        }
                    }
                )
        for path, _add in members:
            actions.append(
                {
                    "remove": {
                        "path": path,
                        "deletionTimestamp": 0,
                        "dataChange": False,
                    }
                }
            )
        n_written += 1
    if not actions:
        return version
    _write_commit(table_path, new_version, actions)
    return new_version


def append_delta_table(df: DataFrame, table_path: str) -> int:
    """Append ``df`` to an existing Delta table as a new commit (add
    actions only, dataChange=true): new data files land in an
    ``append-<version>`` subdirectory under the table root, the
    existing schema/partitioning is honored (column-mapping tables get
    the logical->physical projection, id mode re-stamps parquet field
    ids), and replay sees old + new files. Returns the new version —
    the primitive under streaming lakehouse ingestion
    (``streaming.incremental.run_delta_ingest``)."""
    _live, schema_string, partition_columns, _protocol, version, configuration = (
        _replay(table_path)
    )
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    schema = T.StructType.fromJson(json.loads(schema_string))
    mode = configuration.get("delta.columnMapping.mode", "none")
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"append is missing columns: {missing}")
    phys = {
        f.name: (f.metadata or {}).get("delta.columnMapping.physicalName", f.name)
        for f in schema.fields
    }
    ids = {
        f.name: (f.metadata or {}).get("delta.columnMapping.id")
        for f in schema.fields
    }
    df = df.select(
        *[
            F.col(f.name).alias(
                phys[f.name],
                metadata=(
                    {"parquet.field.id": ids[f.name]} if mode == "id" else {}
                ),
            )
            for f in schema.fields
        ]
    )
    new_version = version + 1
    sub = f"append-{new_version}"
    out_dir = os.path.join(table_path, sub)
    physical_partition_by = [phys[c] for c in partition_columns]
    writer = df.write.mode("overwrite")
    if physical_partition_by:
        writer = writer.partitionBy(*physical_partition_by)
    writer.parquet(out_dir)
    adds = []
    for root, _dirs, names in os.walk(out_dir):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, table_path)
            pv = {}
            for piece in rel.split(os.sep)[1:-1]:
                if "=" in piece:
                    k, v = piece.split("=", 1)
                    pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
            adds.append(
                {
                    "add": {
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": pv,
                        "size": os.path.getsize(full),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
    _write_commit(
        table_path, new_version, sorted(adds, key=lambda a: a["add"]["path"])
    )
    return new_version
