"""64-bit RoaringBitmapArray codec — the Delta deletion-vector payload.

Implements the PUBLIC serialization formats only:

- **RoaringBitmapArray "portable" format** (delta.io PROTOCOL.md,
  "Deletion Vector Format"): 4-byte little-endian magic ``1681511377``,
  8-byte little-endian number of 32-bit bitmaps N, then N standard
  32-bit RoaringBitmaps back to back, the i-th holding the low 32 bits
  of the 64-bit values whose high 32 bits equal i.
- **32-bit RoaringBitmap portable format** (the RoaringFormatSpec, as
  implemented by RoaringBitmap/CRoaring): cookie 12346
  (SERIAL_COOKIE_NO_RUNCONTAINER, +4-byte container count) or 12347
  (SERIAL_COOKIE, run containers present, count packed in the cookie's
  high 16 bits, followed by the run-flag bitset), descriptive headers
  of (key uint16, cardinality-1 uint16) per container, an offset header
  when required, then the containers: array (uint16 values), bitset
  (8 KiB fixed), or run (uint16 count + (start, length-1) uint16 pairs).

The parser handles all three container types; the serializer emits
array/bitset containers (never runs), which every conforming reader
accepts. Z85 helpers cover Delta's inline-DV encoding (Base85 with the
Z85 alphabet over 4-byte blocks, zero-padded; callers trim with the
descriptor's sizeInBytes).
"""

from __future__ import annotations

import struct

MAGIC = 1681511377  # RoaringBitmapArray portable magic (little endian)

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85 over zero-padded 4-byte blocks (Delta's Base85Codec shape:
    the descriptor's sizeInBytes trims the padding on decode)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        block = []
        for _ in range(5):
            block.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(block))
    return "".join(out)


def z85_decode(text: str, size: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i : i + 5]:
            v = v * 85 + _Z85_INDEX[ch]
        out += struct.pack(">I", v)
    return bytes(out[:size]) if size is not None else bytes(out)


def _parse_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one standard 32-bit RoaringBitmap at ``pos``; return
    (sorted values, new position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    low = cookie & 0xFFFF
    if low == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        run_flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad RoaringBitmap cookie {cookie} at {pos}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1, bool(run_flags[i // 8] >> (i % 8) & 1)))
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing
    values: list[int] = []
    for key, card, is_run in headers:
        base = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base | v for v in range(start, start + length_m1 + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base | (wi * 64 + b.bit_length() - 1))
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base | v for v in vals)
    return values, pos


def parse_rbm_array(data: bytes) -> list[int]:
    """Serialized RoaringBitmapArray -> sorted 64-bit values."""
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _parse_rb32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def _serialize_rb32(values: list[int]) -> bytes:
    """Standard no-run portable serialization of sorted uint32 values."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    body = bytearray()
    header = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n))
    for key in keys:
        header += struct.pack("<HH", key, len(containers[key]) - 1)
    offsets = bytearray()
    data_start = len(header) + 4 * n
    for key in keys:
        vals = containers[key]
        offsets += struct.pack("<I", data_start + len(body))
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v // 64] |= 1 << (v % 64)
            body += struct.pack("<1024Q", *words)
        else:
            body += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(header + offsets + body)


def serialize_rbm_array(values: list[int]) -> bytes:
    """Sorted/unsorted 64-bit values -> serialized RoaringBitmapArray
    (portable, array/bitset containers only)."""
    values = sorted(set(values))
    by_high: dict[int, list[int]] = {}
    for v in values:
        if v < 0:
            raise ValueError("RoaringBitmapArray values must be non-negative")
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<Iq", MAGIC, n_bitmaps))
    for high in range(n_bitmaps):
        out += _serialize_rb32(by_high.get(high, []))
    return bytes(out)
