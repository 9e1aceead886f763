"""Deduplication operators for LLM training-data pipelines.

Four families, all pure DataFrame programs (no Python in the hot path):

- **exact**: hash-groupBy on the content column. One shuffle; at 100 TB
  pre-hash to a 64-bit key (``xxhash64``) so the shuffle moves 8-byte
  keys, not document bodies.
- **n-gram Jaccard**: exact set similarity over word shingles via a
  shared-shingle self-join. Quadratic in the worst case — used as the
  *verifier* behind candidate generation, or standalone at small scale.
- **MinHash + LSH**: the scale path. Shingles -> polynomial hashes ->
  64 permutations -> 16 bands of 4 rows -> bucket self-join produces
  candidates in ~linear time; exact Jaccard verifies. Every step is a
  deterministic arithmetic expression (reproducible in the DuckDB
  oracle). Hot buckets (boilerplate shingles) are the skew risk: AQE
  skew-join handles moderate skew; severe skew calls for dropping
  über-frequent shingles, standard practice.
- **SimHash**: 31-bit sign-of-weighted-bit-sums fingerprint; hamming
  band join for near-dup candidates.

Embedding near-dup (cosine) lives in ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.functions.text import FINGERPRINT_MOD as P
from healthcare_etl_spark.functions.text import word_shingles

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


def _poly_hash(col: Column) -> Column:
    """31-bit polynomial string hash, identical to functions.text.word_hash."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % P,
    )


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


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"), word_shingles(F.col(text_col), k).alias("shingles"))


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
    sh = shingle_sets(df, text_col, id_col, k)
    sized = sh.select("doc_id", "shingles", F.size("shingles").alias("n_sh"))
    inv = sized.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    common = (
        inv.alias("x")
        .join(inv.alias("y"), (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.doc_id") < F.col("y.doc_id")))
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


def minhash_signatures(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(doc_id, shingles, sig[N_PERM]) — signature computed JVM-side."""
    sh = shingle_sets(df, text_col, id_col, k)
    hashed = sh.withColumn("hashes", F.transform("shingles", _poly_hash))

    def _perm(a: int, b: int):
        # NB: a closure, not default args — PySpark reads lambda arity
        # from the signature, and `lambda h, a=a, b=b` looks 3-ary.
        return lambda h: (h * a + b) % P

    sig = F.array(
        *[
            F.array_min(F.transform("hashes", _perm(a, b)))
            for a, b in minhash_coefficients()
        ]
    )
    return hashed.select("doc_id", "shingles", sig.alias("sig"))


def _band_key(sig: Column, band: int) -> Column:
    """Fold band ``band``'s R signature slots into one 64-bit bucket key."""
    fold = F.aggregate(
        F.slice(sig, band * BAND_R + 1, BAND_R),
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 31 + v) % P,
    )
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
    sigs = minhash_signatures(df, text_col=text_col, id_col=id_col, k=k)
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[_band_key(F.col("sig"), j) for j in range(N_BANDS)])).alias("bk"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), (F.col("x.bk") == F.col("y.bk")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = sigs.select("doc_id", "shingles")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - n_inter)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", stable_round(jac, 6).alias("jaccard"))
        .filter(stable_round(jac, 6) >= threshold)
    )


def simhash(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """31-bit SimHash per document from word polynomial hashes.

    bit_i(doc) = sign of sum over words of (2*((h>>i)&1) - 1).
    """
    toks = F.split(F.col(text_col), " ")
    hashes = F.transform(toks, _poly_hash)

    def bit_sum(i: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    fp = F.lit(0).cast("long")
    for j in range(31):
        fp = fp + F.when(bit_sum(j) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("doc_id"), fp.alias("simhash"))


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
                    (F.lit(j).cast("long") * (1 << 31)
                     + F.shiftright("simhash", j * 8).bitwiseAND(F.lit(255)))
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), (F.col("x.bk") == F.col("y.bk")) & (F.col("x.doc_id") < F.col("y.doc_id")))
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
