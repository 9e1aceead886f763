"""Bloom filter as a first-class, mergeable DataFrame.

Joins against a huge held-out key set are the exact-but-expensive way to
test membership (see ``q_decontaminate``). The Bloom filter is the
sketch alternative: the whole set compresses to a fixed-size bitmap that
is **mergeable** (bit_or across batches/partitions — the same
union-merge contract as the HLL rollup and the count-min sketch) and
**broadcastable** (a few MB for millions of keys), so the probe side
never shuffles. False positives are possible (rate set by sizing, below)
but false negatives are not — the safe direction for decontamination,
where a false positive only over-drops a training document.

Representation: ``(word: long, bits: long)`` rows — 63 usable bits per
word (bit 63 stays clear: DuckDB's ``<<`` raises on BIGINT overflow, so
the oracle could not mirror a sign-bit mask). Only non-zero words are
stored. All hashing is salted md5 → deterministic arithmetic, so the
sketch AND its probe results are oracle-checkable bit-for-bit, unlike an
opaque binary sketch blob.

Sizing: ``BLOOM_WORDS = 131072`` words ≈ 8.26M bits. At the sf0.1
fixture's held-out gram cardinality (~0.5M keys, k=4) that is
k·n/m ≈ 0.23 → ~0.2% false-positive rate; capacity scales by raising
``BLOOM_WORDS`` (the build cost is one hash-agg either way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_WORDS = 131072
BITS_PER_WORD = 63  # bit 63 unused: DuckDB << overflows on the sign bit
BLOOM_K = 4
BLOOM_BITS = BLOOM_WORDS * BITS_PER_WORD


def _position(i_col: Column, key: Column) -> Column:
    """Salted 32-bit md5 prefix folded onto the bit array: [0, BLOOM_BITS)."""
    salt = F.concat(F.lit("bloom"), i_col.cast("string"), F.lit(":"), key)
    return F.conv(F.substring(F.md5(salt), 1, 8), 16, 10).cast("long") % BLOOM_BITS


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the sketch over a key column → ``(word, bits)`` rows.

    One explode (×k) + one partial-aggregated hash groupBy — the only
    shuffle is on the word id, bounded by BLOOM_WORDS regardless of
    input size. Sketches from different batches merge with
    ``union → groupBy(word) → bit_or(bits)``.
    """
    cells = df.select(F.col(key_col).alias("k")).select(
        "k",
        F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("i"),
    )
    pos = _position(F.col("i"), F.col("k"))
    masks = cells.select(
        F.floor(pos / F.lit(float(BITS_PER_WORD))).cast("long").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % BITS_PER_WORD).cast("int")
        ).alias("mask"),
    )
    return masks.groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(
    df: DataFrame, key_col: str, sketch: DataFrame, hit_col: str = "bloom_hit"
) -> DataFrame:
    """Membership-test each row's key against the sketch.

    Returns ``df``'s columns plus ``hit_col`` (true ⇔ all k probe bits
    set — i.e. "possibly in the set"; false ⇔ "definitely not"). The
    sketch is broadcast, so the probe is a narrow map-side join — the
    (huge) probe side never shuffles for the membership test itself; the
    only exchange is the per-row regroup, keyed on the probe row.

    ``df``'s rows must be distinct (they are the regroup key).
    """
    carry = df.columns
    cells = df.select(
        *carry, F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("i")
    )
    pos = _position(F.col("i"), F.col(key_col))
    cells = cells.select(
        *carry,
        F.floor(pos / F.lit(float(BITS_PER_WORD))).cast("long").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % BITS_PER_WORD).cast("int")
        ).alias("mask"),
    )
    probed = cells.join(F.broadcast(sketch), "word", "left")
    bit_set = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    return probed.groupBy(*carry).agg(
        (F.sum(F.when(bit_set, 1).otherwise(0)) == BLOOM_K).alias(hit_col)
    )
