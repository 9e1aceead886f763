"""RoaringBitmapArray codec tests (sources.roaring) — pure Python.

The portable formats are public (delta.io PROTOCOL.md "Deletion Vector
Format" + the RoaringFormatSpec); these tests pin round-trip exactness
across container types, the Z85 padding/trim contract, and hand-built
run-container parsing (which our serializer never emits but foreign
writers do).
"""

from __future__ import annotations

import random
import struct

import pytest

from healthcare_etl_spark.sources.roaring import (
    MAGIC,
    parse_rbm_array,
    serialize_rbm_array,
    z85_decode,
    z85_encode,
)


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0],
        [5, 9, 70000, (3 << 32) | 12, (3 << 32) | 13],
        list(range(10_000)),  # > 4096 per 16-bit key -> bitset containers
        [0xFFFFFFFF, 1 << 32, (1 << 40) - 1],
    ],
)
def test_round_trip(values):
    data = serialize_rbm_array(values)
    assert parse_rbm_array(data) == sorted(set(values))


def test_round_trip_random_and_duplicates():
    rng = random.Random(7)
    values = [rng.randrange(0, 1 << 40) for _ in range(5000)]
    values += values[:100]  # duplicates collapse
    data = serialize_rbm_array(values)
    assert parse_rbm_array(data) == sorted(set(values))


def test_z85_pads_and_trims():
    for n in range(0, 9):
        data = bytes(range(n))
        enc = z85_encode(data)
        assert len(enc) % 5 == 0
        assert z85_decode(enc, n) == data


def test_run_container_parse():
    # hand-built foreign bitmap: SERIAL_COOKIE with one run container
    buf = struct.pack("<I", 12347 | (0 << 16))  # 1 container (count-1=0)
    buf += b"\x01"  # run flag: container 0 is a run
    buf += struct.pack("<HH", 2, 4)  # key=2, cardinality-1=4
    buf += struct.pack("<H", 1)  # one run
    buf += struct.pack("<HH", 100, 4)  # 100..104
    arr = struct.pack("<Iq", MAGIC, 1) + buf
    assert parse_rbm_array(arr) == [(2 << 16) | v for v in range(100, 105)]


def test_bad_magic_raises():
    with pytest.raises(ValueError):
        parse_rbm_array(struct.pack("<Iq", 123, 0))


def test_negative_value_rejected():
    with pytest.raises(ValueError):
        serialize_rbm_array([-1])
