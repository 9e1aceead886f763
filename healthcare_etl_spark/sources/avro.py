"""Minimal Apache Avro object-container-file codec, pure Python.

Vanilla Spark ships no ``spark-avro`` package and this container has no
Avro library, yet Apache Iceberg stores ALL its table metadata
(manifest lists and manifest files) as Avro object container files —
so a vanilla-Spark Iceberg reader (``sources.iceberg``) needs exactly
this: a schema-driven decoder/encoder for the Avro 1.11 binary
encoding and the object container framing, implemented from the public
specification (avro.apache.org/docs/1.11.1/specification/). Scope is
the full primitive + complex type system (records, enums, arrays,
maps, unions, fixed, named-type references) and the ``null`` /
``deflate`` codecs — everything Iceberg metadata uses; unknown codecs
raise rather than misread.

Decoding is generic (driven by the schema embedded in the file being
read, never by assumptions about field order beyond what that schema
declares), so foreign-written files decode correctly; consumers look
fields up by name. This is metadata-plane code: Avro payloads here are
bounded by manifest counts, never by data volume, so pure Python is
the right cost point — the data plane stays ``spark.read.parquet``.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# ---------------------------------------------------------------- decoding


class _Reader:
    def __init__(self, buf: bytes):
        self._b = buf
        self._pos = 0

    def read(self, n: int) -> bytes:
        if self._pos + n > len(self._b):
            raise EOFError("truncated Avro data")
        out = self._b[self._pos : self._pos + n]
        self._pos += n
        return out

    def at_end(self) -> bool:
        return self._pos >= len(self._b)

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _resolve_names(schema, names: dict):
    """Register named types (record/enum/fixed) so later references by
    bare name decode; returns the schema with string references left
    intact (resolution happens at decode time via ``names``)."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            name = schema.get("name")
            if name:
                names[name] = schema
                ns = schema.get("namespace")
                if ns:
                    names[f"{ns}.{name}"] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _resolve_names(f.get("type"), names)
        elif t in ("array",):
            _resolve_names(schema.get("items"), names)
        elif t in ("map",):
            _resolve_names(schema.get("values"), names)
    elif isinstance(schema, list):
        for s in schema:
            _resolve_names(s, names)
    return schema


def _decode(schema, r: _Reader, names: dict):
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        elif schema in names:
            return _decode(names[schema], r, names)
        else:
            raise ValueError(f"unknown Avro type reference: {schema!r}")
    elif isinstance(schema, list):  # union: branch index then datum
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return _decode(schema[idx], r, names)
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):  # e.g. {"type": {...}} wrapping
            return _decode(t, r, names)

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "record":
        return {f["name"]: _decode(f["type"], r, names) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:  # block-size form: size long precedes items
                count = -count
                r.read_long()
            for _ in range(count):
                out.append(_decode(schema["items"], r, names))
        return out
    if t == "map":
        out = {}
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:
                count = -count
                r.read_long()
            for _ in range(count):
                key = r.read_bytes().decode("utf-8")
                out[key] = _decode(schema["values"], r, names)
        return out
    raise ValueError(f"unsupported Avro type: {t!r}")


def read_avro_file(path: str) -> tuple[dict, list]:
    """Decode an Avro object container file -> (writer schema, records).

    Records come back as plain Python values (records -> dicts keyed by
    field name), decoded with the schema embedded in the file.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    meta = _decode({"type": "map", "values": "bytes"}, r, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"Avro codec {codec!r} not supported (null/deflate only): {path}"
        )
    sync = r.read(SYNC_SIZE)
    names: dict = {}
    _resolve_names(schema, names)
    records: list = []
    while not r.at_end():
        count = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        if r.read(SYNC_SIZE) != sync:
            raise ValueError(f"sync marker mismatch (corrupt block): {path}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(schema, br, names))
    return schema, records


# ---------------------------------------------------------------- encoding


class _Writer:
    def __init__(self):
        self._out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self._out.write(b)

    def write_long(self, n: int) -> None:
        n = (n << 1) ^ (n >> 63)  # zigzag (Python ints are unbounded; >> is arithmetic)
        while True:
            if n & ~0x7F:
                self.write(bytes([(n & 0x7F) | 0x80]))
                n >>= 7
            else:
                self.write(bytes([n]))
                break

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.write(b)

    def getvalue(self) -> bytes:
        return self._out.getvalue()


def _union_branch(schema: list, datum) -> int:
    """Pick the union branch for ``datum`` — null vs first structural
    match, which is all Iceberg metadata unions need (they are
    ['null', X] without exception)."""
    for i, s in enumerate(schema):
        t = s if isinstance(s, str) else s.get("type")
        if datum is None and t == "null":
            return i
        if datum is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {datum!r} in {schema!r}")


def _encode(schema, datum, w: _Writer, names: dict) -> None:
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        elif schema in names:
            _encode(names[schema], datum, w, names)
            return
        else:
            raise ValueError(f"unknown Avro type reference: {schema!r}")
    elif isinstance(schema, list):
        idx = _union_branch(schema, datum)
        w.write_long(idx)
        _encode(schema[idx], datum, w, names)
        return
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            _encode(t, datum, w, names)
            return

    if t == "null":
        return
    if t == "boolean":
        w.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        w.write_long(int(datum))
    elif t == "float":
        w.write(struct.pack("<f", float(datum)))
    elif t == "double":
        w.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        w.write_bytes(bytes(datum))
    elif t == "string":
        w.write_bytes(str(datum).encode("utf-8"))
    elif t == "fixed":
        if len(datum) != schema["size"]:
            raise ValueError("fixed size mismatch")
        w.write(bytes(datum))
    elif t == "enum":
        w.write_long(schema["symbols"].index(datum))
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in datum and "default" in f:
                _encode(f["type"], f["default"], w, names)
            else:
                _encode(f["type"], datum[f["name"]], w, names)
    elif t == "array":
        items = list(datum)
        if items:
            w.write_long(len(items))
            for it in items:
                _encode(schema["items"], it, w, names)
        w.write_long(0)
    elif t == "map":
        entries = dict(datum)
        if entries:
            w.write_long(len(entries))
            for k, v in entries.items():
                w.write_bytes(str(k).encode("utf-8"))
                _encode(schema["values"], v, w, names)
        w.write_long(0)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def write_avro_file(
    path: str, schema: dict, records: list, *, codec: str = "deflate"
) -> None:
    """Encode ``records`` (dicts keyed by field name) into an Avro
    object container file at ``path`` with the given writer schema.
    One block; ``null`` or ``deflate`` codec. Fixture-grade by volume
    (metadata files), spec-grade by format — a real Avro reader
    consumes the output."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} not supported")
    names: dict = {}
    _resolve_names(schema, names)
    body_w = _Writer()
    for rec in records:
        _encode(schema, rec, body_w, names)
    body = body_w.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = comp.compress(body) + comp.flush()
    # Deterministic sync marker (content-derived) keeps fixture builds
    # reproducible; uniqueness across files is not load-bearing for
    # single-writer metadata files.
    import hashlib

    sync = hashlib.md5(path.encode("utf-8") + body[:64]).digest()
    head = _Writer()
    head.write(MAGIC)
    _encode(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        },
        head,
        {},
    )
    head.write(sync)
    block = _Writer()
    block.write_long(len(records))
    block.write_bytes(body)
    block.write(sync)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(head.getvalue() + block.getvalue())
