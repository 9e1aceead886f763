"""Deduplication operators for LLM training-data pipelines.

Four families, all pure DataFrame programs (no Python in the hot path):

- **exact**: hash-groupBy on the content column. One shuffle; at 100 TB
  pre-hash to a 64-bit key (``xxhash64``) so the shuffle moves 8-byte
  keys, not document bodies.
- **n-gram Jaccard**: exact set similarity over word shingles via a
  shared-shingle self-join. Quadratic in the worst case — used as the
  *verifier* behind candidate generation, or standalone at small scale.
- **MinHash + LSH**: the scale path. Shingles -> md5-derived hashes ->
  64 permutations -> 16 bands of 4 rows -> bucket self-join produces
  candidates in ~linear time; exact Jaccard verifies. Every step is
  deterministic (reproducible in the DuckDB oracle). Hot buckets
  (boilerplate shingles) are the skew risk: AQE skew-join handles
  moderate skew; severe skew calls for dropping über-frequent shingles.
- **SimHash**: 31-bit sign-of-weighted-bit-sums fingerprint; hamming
  band join for near-dup candidates.

Performance notes (measured at sf0.1):

- Spark does NOT codegen lambda higher-order functions (``transform``/
  ``aggregate`` run interpreted), so the pipelines here are written in
  *exploded row* form — hashes via the native ``md5``/``conv``
  expressions, signatures via a single 64-column hash-aggregate —
  keeping every hot operator inside whole-stage codegen. This cut
  MinHash wall time ~5x vs the array/lambda formulation.
- Shingles are built with ``arrays_zip`` over shifted ``slice``\ s of
  the token array (shingle i = (t[i], t[i+1], t[i+2])), not a window
  ``lead`` — no ordering shuffle, measured ~1.4x faster.
- The input is hash-partitioned by doc_id up front, so the shingle
  ``distinct`` and the signature ``groupBy(doc_id)`` both satisfy their
  required distributions from that one exchange: the whole scan ->
  shingle -> distinct -> 64-min-signature pipeline runs with a single
  shuffle (verified: 1 Exchange in the executed plan). The same
  partitioning strategy is what you'd bucket by at 100 TB.

Embedding near-dup (cosine) lives in ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.functions.text import FINGERPRINT_MOD as P

N_PERM = 64
N_BANDS = 16
BAND_R = N_PERM // N_BANDS


def minhash_coefficients(n: int = N_PERM, seed: int = 12345) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod P.

    A plain LCG keeps this reproducible anywhere (the DuckDB oracle SQL
    embeds the same literals).
    """
    state = seed
    out = []
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % (P - 1) + 1
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % P
        out.append((a, b))
    return out


def md5_hash31(col: Column | str) -> Column:
    """First 8 hex digits of md5, as an int in [0, P).

    ``md5``/``conv``/``substring`` are native codegen'd expressions —
    this replaces a per-character interpreted fold. DuckDB mirror:
    ``('0x' || substring(md5(x), 1, 8))::BIGINT % P``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % P


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical content value.

    Returns (keeper_id, n_copies, <content_col>). At scale, group on
    ``xxhash64(content)`` first so the shuffle key is 8 bytes; the full
    content comparison then only runs within hash buckets.
    """
    return df.groupBy(content_col).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _shingle_text_rows(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(doc_id, shingle) rows (NOT distinct) — the exploded zip form.

    Word k-shingles as ``arrays_zip`` over shifted ``slice``\ s of the
    token array: shingle i = (t[i], ..., t[i+k-1]); ``arrays_zip`` null-
    pads the shifted arrays, so rows whose last member is null are the
    (k-1) tail positions and are filtered. Documents shorter than ``k``
    tokens contribute their whole text as a single shingle (the
    ``pos == 0`` row) so they still participate. No window, no ordering
    shuffle — every expression is codegen'd.

    The input is hash-partitioned by doc_id first. That serves two
    needs at once: the corpus fixtures arrive as one small parquet file
    (one scan partition) so downstream work needs spreading, and the
    doc_id partitioning lets the callers' ``distinct`` and
    ``groupBy(doc_id)`` aggregates run with no further exchange.
    """
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("t"), F.size(toks).alias("n_tok")
    )
    zipped = F.arrays_zip(
        F.col("t").alias("w0"),
        *[
            F.slice("t", j + 1, F.greatest(F.col("n_tok") - j, F.lit(0))).alias(f"w{j}")
            for j in range(1, k)
        ],
    )
    z = base.select(
        "doc_id",
        "n_tok",
        F.array_join("t", " ").alias("whole"),
        F.posexplode(zipped).alias("pos", "z"),
    )
    return z.filter(
        ((F.col("n_tok") >= k) & F.col(f"z.w{k - 1}").isNotNull())
        | ((F.col("n_tok") < k) & (F.col("pos") == 0))
    ).select(
        "doc_id",
        F.when(F.col("n_tok") < k, F.col("whole"))
        .otherwise(F.concat_ws(" ", *[f"z.w{j}" for j in range(k)]))
        .alias("shingle"),
    )


def shingle_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Distinct (doc_id, shingle) rows — see ``_shingle_text_rows``.

    The distinct is exchange-free: the input is already hash-partitioned
    by doc_id, which satisfies the (doc_id, shingle) clustering.
    """
    return _shingle_text_rows(df, text_col, id_col, k).distinct()


def jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shared-shingle join.

    Pairs are generated only for documents sharing >= 1 shingle (the
    inverted-index trick), so disjoint documents never meet. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # The inverted index feeds a self-join: materialize once (see the
    # localCheckpoint note in minhash_lsh_pairs).
    inv = shingle_rows(df, text_col, id_col, k).localCheckpoint(eager=True)
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inv_sized = inv.join(sizes, "doc_id")
    common = (
        inv_sized.alias("x")
        .join(
            inv_sized.alias("y"),
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.n_sh").alias("na"),
            F.col("y.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.select("doc_a", "doc_b", stable_round(jac, 6).alias("jaccard"))
        .filter(stable_round(jac, 6) >= threshold)
    )


def hashed_shingle_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Distinct (doc_id, hsh) rows: md5-derived 31-bit shingle hashes.

    Hashing *before* the distinct keeps every downstream shuffle numeric
    (8-byte keys instead of shingle strings) and needs only one dedup
    pass: distinct-of-hashes == hashes-of-distinct-strings, modulo md5
    collisions, which the oracle reproduces exactly (same hash).

    Single-exchange: the doc_id partitioning from ``_shingle_text_rows``
    satisfies both this distinct and the signature ``groupBy(doc_id)``
    downstream, so scan -> shingle -> distinct -> signatures is one
    shuffle total.
    """
    return (
        _shingle_text_rows(df, text_col, id_col, k)
        .select("doc_id", md5_hash31("shingle").alias("hsh"))
        .distinct()
    )


def minhash_signatures_from(inv_h: DataFrame) -> DataFrame:
    """(doc_id, n_sh, s0..s63) from a (doc_id, hsh) frame — one
    hash-aggregate with map-side partial aggregation; every permutation
    min is a plain arithmetic aggregate expression.
    """
    aggs = [
        F.min((F.col("hsh") * a + b) % P).alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_coefficients())
    ]
    return inv_h.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"), *aggs)


def minhash_signatures(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    return minhash_signatures_from(hashed_shingle_rows(df, text_col, id_col, k))


def _band_key(band: int) -> Column:
    """Fold band ``band``'s R signature columns into one 64-bit bucket key."""
    fold = F.lit(0).cast("long")
    for r in range(BAND_R):
        fold = (fold * 31 + F.col(f"s{band * BAND_R + r}")) % P
    return F.lit(band).cast("long") * P + fold


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with exact Jaccard.

    Candidate generation is the banded bucket join (linear-ish in corpus
    size); only candidates pay the exact set comparison. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    # inv_h feeds the signature aggregate and the two verify joins, each
    # needing a different partitioning, so exchanges are not reusable
    # across branches — materialize once with localCheckpoint: it stores
    # the RDD blocks directly and truncates lineage — measured ~1.6x
    # faster end-to-end than recompute, while .cache()'s columnar
    # InMemoryRelation was slower than either. (On a real cluster where
    # executors can be lost, use a reliable checkpoint / staging table.)
    # The checkpoint preserves the doc_id partitioning, so the signature
    # aggregate on top of it still needs no exchange.
    inv_h = hashed_shingle_rows(df, text_col, id_col, k).localCheckpoint(eager=True)
    # sigs is consumed only by the band explode below (set sizes ride
    # along as n_sh through the band join), so it needs no checkpoint.
    sigs = minhash_signatures_from(inv_h)
    bands = sigs.select(
        "doc_id",
        "n_sh",
        F.explode(F.array(*[_band_key(j) for j in range(N_BANDS)])).alias("bk"),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.bk") == F.col("y.bk")) & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.n_sh").alias("na"),
            F.col("y.n_sh").alias("nb"),
        )
        .distinct()
    )
    # exact verify: count shared shingle hashes for candidate pairs only
    # (numeric equi-joins; cand is tiny and broadcasts, so neither inv_h
    # scan shuffles)
    xa = inv_h.select(F.col("doc_id").alias("doc_a"), F.col("hsh"))
    xb = inv_h.select(F.col("doc_id").alias("doc_b"), F.col("hsh"))
    common = (
        cand.join(xa, "doc_a")
        .join(xb, ["doc_b", "hsh"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.select("doc_a", "doc_b", stable_round(jac, 6).alias("jaccard"))
        .filter(stable_round(jac, 6) >= threshold)
    )


def simhash(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """31-bit SimHash per document from md5-derived word hashes.

    bit_i(doc) = sign of sum over word occurrences of (2*((h>>i)&1) - 1).
    Exploded form: one codegen'd 31-column aggregate.
    """
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).withColumn("hsh", md5_hash31("w"))
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright("hsh", i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{i}")
            for i in range(31)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(31):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidates come from a 4-band split of the fingerprint (pigeonhole:
    any pair within hamming 3 shares at least one exact band), then the
    exact popcount check verifies.
    """
    fp = simhash(df, text_col=text_col, id_col=id_col)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    (
                        F.lit(j).cast("long") * (1 << 31)
                        + F.shiftright("simhash", j * 8).bitwiseAND(F.lit(255))
                    )
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.bk") == F.col("y.bk")) & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
