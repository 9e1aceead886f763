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
  requested version and applies the JSON commits after it). Multi-part
  and v2/sidecar checkpoints are not implemented and raise;
- ``minReaderVersion`` must be 1 (deletion vectors / column mapping /
  v2 checkpoints need 3/2/3 and change data-file interpretation).
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


def _checkpoint_at_or_below(
    table_path: str, version: int | None
) -> tuple[int, str] | None:
    """Newest classic checkpoint parquet usable for ``version`` (None =
    latest), from ``_last_checkpoint`` when valid, else a log-dir scan.
    Multi-part checkpoints (``parts`` field / .checkpoint.NNN.of.MMM)
    raise — silently replaying one part would drop files."""
    log_dir = os.path.join(table_path, _LOG_DIR)
    candidates: list[int] = []
    last = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(last):
        with open(last, encoding="utf-8") as fh:
            meta = json.load(fh)
        if meta.get("parts"):
            raise NotImplementedError("multi-part Delta checkpoints not supported")
        candidates.append(int(meta["version"]))
    for name in os.listdir(log_dir):
        if ".checkpoint." in name and not name.endswith(".checkpoint.parquet"):
            raise NotImplementedError(f"non-classic Delta checkpoint: {name}")
        if name.endswith(".checkpoint.parquet"):
            candidates.append(int(name.split(".", 1)[0]))
    usable = [v for v in set(candidates) if version is None or v <= version]
    if not usable:
        return None
    v = max(usable)
    path = os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    return (v, path) if os.path.exists(path) else None


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
) -> tuple[dict[str, dict], str | None, list[str], dict, int]:
    """Checkpoint-aware log replay shared by every entry point (reader,
    delete_partition, write_checkpoint): newest usable checkpoint parquet
    first (if any), then the JSON commits after it. Returns
    ``(live_adds, schema_string, partition_columns, protocol, version)``.

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
    protocol: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
    resolved_version = ckpt[0] if ckpt is not None else -1
    if ckpt is not None:
        import pyarrow.parquet as papq

        ckpt_version, ckpt_path = ckpt
        # A checkpoint is the full action state in parquet: one row per
        # action with nullable protocol/metaData/add/remove columns
        # (partitionValues is MAP<string,string> per the spec; legacy
        # struct-typed fixtures are normalized too).
        for d in papq.read_table(ckpt_path).to_pylist():
            if d.get("protocol"):
                protocol = {k: v for k, v in d["protocol"].items() if v is not None}
                mrv = protocol.get("minReaderVersion") or 1
                if mrv > 1:
                    raise NotImplementedError(
                        f"Delta minReaderVersion={mrv} needs reader features "
                        "this minimal reader does not implement"
                    )
            if d.get("metaData"):
                schema_string = d["metaData"]["schemaString"]
                partition_columns = list(d["metaData"].get("partitionColumns") or [])
            if d.get("add"):
                add = dict(d["add"])
                add["partitionValues"] = _normalize_pv(add.get("partitionValues"))
                live[add["path"]] = add
            # remove actions in a checkpoint are tombstones for vacuum,
            # not live-set state: a checkpointed remove's file is already
            # absent from the checkpoint's add set.
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
                    mrv = protocol.get("minReaderVersion", 1)
                    if mrv > 1:
                        raise NotImplementedError(
                            f"Delta minReaderVersion={mrv} needs reader features "
                            "(deletion vectors / column mapping) this minimal "
                            "reader does not implement"
                        )
                elif "metaData" in action:
                    md = action["metaData"]
                    if md.get("format", {}).get("provider", "parquet") != "parquet":
                        raise NotImplementedError(
                            f"non-parquet Delta format: {md['format']}"
                        )
                    schema_string = md["schemaString"]
                    partition_columns = list(md.get("partitionColumns", []))
                elif "add" in action:
                    add = dict(action["add"])
                    add["partitionValues"] = _normalize_pv(add.get("partitionValues"))
                    live[add["path"]] = add
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                # commitInfo / txn / cdc actions carry no file-set state
    return live, schema_string, partition_columns, protocol, resolved_version


def read_delta_table(
    spark: SparkSession, table_path: str, *, version: int | None = None
) -> DataFrame:
    """Read a Delta table at ``version`` (default: latest) by replaying
    the log (checkpoint parquet + later JSON commits). Returns a
    DataFrame with the table's declared schema (partition columns
    reconstructed from ``partitionValues`` and cast to their declared
    types, Delta semantics)."""
    live, schema_string, partition_columns, _protocol, _v = _replay(
        table_path, version
    )
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    schema = T.StructType.fromJson(json.loads(schema_string))
    if not live:
        return spark.createDataFrame([], schema)
    data_fields = [f for f in schema.fields if f.name not in partition_columns]
    data_schema = T.StructType(data_fields)
    if not partition_columns:
        paths = [os.path.join(table_path, p) for p in sorted(live)]
        return spark.read.schema(data_schema).parquet(*paths)
    # Partitioned: group live files by their partitionValues tuple; the
    # group count is the live-partition count (metadata-scale), each
    # group is ONE parquet scan with the partition values injected as
    # cast literals (Delta stores them as strings in the log, typed by
    # the table schema).
    ptypes = {f.name: f.dataType for f in schema.fields if f.name in partition_columns}
    groups: dict[tuple, list[str]] = {}
    for path, add in sorted(live.items()):
        pv = add.get("partitionValues", {})
        key = tuple(pv.get(c) for c in partition_columns)
        groups.setdefault(key, []).append(os.path.join(table_path, path))
    parts = []
    # None-safe group order: null partition values (__HIVE_DEFAULT_
    # PARTITION__ / JSON null) are legal Delta state and must not crash
    # the str-vs-None comparison — nulls sort first, deterministically.
    for key, paths in sorted(
        groups.items(), key=lambda kv: tuple((v is not None, v or "") for v in kv[0])
    ):
        df = spark.read.schema(data_schema).parquet(*paths)
        for col, val in zip(partition_columns, key):
            lit = F.lit(None) if val is None else F.lit(val)
            df = df.withColumn(col, lit.cast(ptypes[col]))
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_delta_table(
    df: DataFrame,
    table_path: str,
    *,
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` as version 0 of a new Delta table (data files +
    hand-built JSON commit). Fixture-grade writer: enough protocol for
    ``read_delta_table`` and any real Delta reader to consume — used by
    the registered scan query and the round-trip tests; a production
    sink would add optimistic-concurrency commit semantics."""
    partition_by = partition_by or []
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
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
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000000",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": partition_by,
                "configuration": {},
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
    nothing for files whose add actions live only in the checkpoint)."""
    live, _schema, _pcols, _protocol, current_version = _replay(table_path)
    removes = [
        {"remove": {"path": p, "deletionTimestamp": 0, "dataChange": True}}
        for p, add in sorted(live.items())
        if add.get("partitionValues", {}).get(column) == value
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
    live, schema_string, partition_columns, protocol, version = _replay(table_path)
    if schema_string is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
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


def _write_commit(table_path: str, version: int, actions: list[dict]) -> None:
    log_dir = os.path.join(table_path, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    commit = os.path.join(log_dir, f"{version:020d}.json")
    with open(commit, "w", encoding="utf-8") as fh:
        for action in actions:
            fh.write(json.dumps(action, separators=(",", ":")) + "\n")
