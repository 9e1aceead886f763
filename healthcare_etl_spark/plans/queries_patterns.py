"""Round-6 continuation-4 scale-pattern additions.

Extension surface beyond the reference (`etl_app/etl_script.py:74-119`
is filter/rename/aggregate only): candidate-generation and graph
patterns a 100 TB curation pipeline leans on —

- ``q_dedup_prefix_filter``: the EXACT Jaccard-threshold similarity
  join via prefix filtering (SSJoin/PPJoin family) — the third
  candidate strategy next to the full inverted index (exact, explodes
  on frequent tokens) and banded MinHash-LSH (cheap, probabilistic):
  exact with LSH-like candidate volume.
- ``q_lpa_communities``: deterministic synchronous label-propagation
  communities over a k-NN embedding graph — the community structure a
  connected-components flood cannot see (one component, many dense
  regions).

Contracts: integer-exact thresholds (rational t, no float boundary),
stable_round on every emitted double, no data-scale partitionless
windows, DuckDB oracles with identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_etl_spark.functions.rounding import stable_round
from healthcare_etl_spark.plans.registry import register
from healthcare_etl_spark.sources import load_table
from healthcare_etl_spark.plans.queries_dedup import _MD5H, _shingles_sql
from healthcare_etl_spark.plans.queries_similarity import _COS


def _prefix_filter_oracle(t_num: int = 3, t_den: int = 5) -> str:
    """DuckDB mirror of ``prefix_filter_jaccard_pairs`` — same hashes,
    same rare-first prefix order, same integer-exact length and
    verification filters."""
    return f"""
WITH {_shingles_sql()},
inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inv AS MATERIALIZED (
    SELECT DISTINCT doc_id, {_MD5H.format(x="shingle")} AS hsh FROM inv0),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM inv GROUP BY doc_id),
dfreq AS (SELECT hsh, count(*) AS df FROM inv GROUP BY hsh),
ranked AS (
    SELECT i.doc_id, i.hsh, s.n_sh,
           row_number() OVER (PARTITION BY i.doc_id
                              ORDER BY d.df ASC, i.hsh ASC) AS pos
    FROM inv i JOIN dfreq d USING (hsh) JOIN sizes s USING (doc_id)),
pref AS (
    SELECT doc_id, hsh, n_sh FROM ranked
    WHERE pos <= n_sh - (({t_num} * n_sh + {t_den} - 1) // {t_den}) + 1),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                    x.n_sh AS na, y.n_sh AS nb
    FROM pref x JOIN pref y
      ON x.hsh = y.hsh AND x.doc_id < y.doc_id
     AND {t_den} * least(x.n_sh, y.n_sh) >= {t_num} * greatest(x.n_sh, y.n_sh)),
common AS (
    SELECT c.doc_a, c.doc_b, c.na, c.nb, count(*) AS o
    FROM cand c
    JOIN inv ia ON ia.doc_id = c.doc_a
    JOIN inv ib ON ib.doc_id = c.doc_b AND ib.hsh = ia.hsh
    GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b,
       (round((o * 1.0 / (na + nb - o)) * 1000000.0) / 1000000.0) AS jaccard
FROM common
WHERE {t_den} * o >= {t_num} * (na + nb - o)
ORDER BY doc_a, doc_b
"""


@register(
    "q_dedup_prefix_filter",
    oracle=_prefix_filter_oracle(),
    description=(
        "EXACT Jaccard >= 3/5 near-dup pairs via PREFIX FILTERING "
        "(SSJoin, Chaudhuri et al. ICDE'06 / PPJoin, Xiao et al. "
        "WWW'08): each document's shingle-hash set is ordered by global "
        "document frequency ascending (rarest first) and only the first "
        "n - ceil(t*n) + 1 tokens join — any pair with J >= t provably "
        "shares a prefix token under a common total order, so there are "
        "NO false negatives (unlike LSH) while the join never touches "
        "the frequent tokens that blow up the full inverted index "
        "(q_dedup_ngram_jaccard). Candidates pass the exact integer "
        "length filter t*max <= min, then exact verification "
        "5*o >= 3*(na+nb-o) — the threshold is the rational 3/5 so no "
        "float boundary exists anywhere. 100 TB shape: df is one hash "
        "aggregate on 8-byte keys; the prefix join shuffles a ~(1-t) "
        "fraction of the index biased to RARE keys (inherent skew "
        "guard); verification is candidate-bounded."
    ),
    tags=("dedup", "extension", "scale-pattern"),
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(docs, t_num=3, t_den=5)


_LPA_CAP = 256
_LPA_K = 3
_LPA_ROUNDS = 4


def _lpa_oracle(rounds: int = _LPA_ROUNDS) -> str:
    cos = _COS.format(a="a.embedding", b="b.embedding")
    parts = [
        f"pts AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_LPA_CAP})",
        f"""sc AS MATERIALIZED (
    SELECT a.vec_id AS s, b.vec_id AS d,
           (round(({cos}) * 1000000.0) / 1000000.0) AS c
    FROM pts a JOIN pts b ON a.vec_id <> b.vec_id)""",
        f"""knn AS (SELECT s, d FROM (
    SELECT s, d, row_number() OVER (PARTITION BY s ORDER BY c DESC, d ASC) AS rk
    FROM sc) WHERE rk <= {_LPA_K})""",
        "edges AS MATERIALIZED (SELECT s AS u, d AS v FROM knn UNION SELECT d, s FROM knn)",
        "l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM edges)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""v{r} AS MATERIALIZED (
    SELECT node, lbl, count(*) AS c FROM (
        SELECT e.u AS node, l.lbl FROM edges e JOIN l{r - 1} l ON l.node = e.v
        UNION ALL SELECT node, lbl FROM l{r - 1}) GROUP BY node, lbl)"""
        )
        parts.append(
            f"""l{r} AS MATERIALIZED (
    SELECT node, lbl FROM (
        SELECT node, lbl, row_number() OVER (PARTITION BY node
                          ORDER BY c DESC, lbl ASC) AS rn FROM v{r}) WHERE rn = 1)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node AS vec_id, lbl AS community FROM l{rounds} ORDER BY node"
    )


@register(
    "q_lpa_communities",
    oracle=_lpa_oracle(),
    description=(
        "Deterministic synchronous label-propagation communities "
        "(Raghavan et al. 2007) over the k=3 cosine-NN graph of the "
        "first 256 embeddings: 4 simultaneous rounds where each node "
        "adopts the max-vote label among its neighbors plus one "
        "self-vote (the damping that kills two-coloring oscillation), "
        "ties to the smallest label. This is what connected components "
        "cannot compute — the k-NN graph is one or few giant "
        "components, but LPA lets dense regions keep their own labels "
        "and splits them into communities. Per round: one shuffle "
        "(edges join labels on neighbor id), a (node,label) count, and "
        "a WindowGroupLimit argmax; labels checkpoint per round so "
        "lineage stays bounded. At corpus scale the k-NN edges come "
        "from any ANN in the registry (IVF/LSH/PQ) instead of the "
        "capped brute-force pass; the propagation loop is unchanged. "
        "Oracle: 4 unrolled rounds over MATERIALIZED CTEs."
    ),
    tags=("graph", "extension", "iterative", "scale-pattern"),
)
def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.vectors import cosine_similarity
    from healthcare_etl_spark.operators.graph import label_propagation_communities

    pts = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _LPA_CAP)
        .select("vec_id", "embedding")
    )
    a = pts.select(F.col("vec_id").alias("s"), F.col("embedding").alias("av"))
    b = pts.select(F.col("vec_id").alias("d"), F.col("embedding").alias("bv"))
    sc = (
        a.join(F.broadcast(b), F.col("s") != F.col("d"))
        .select(
            "s",
            "d",
            stable_round(cosine_similarity(F.col("av"), F.col("bv")), 6).alias("c"),
        )
    )
    w = Window.partitionBy("s").orderBy(F.desc("c"), F.asc("d"))
    knn = (
        sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LPA_K)
        .select("s", "d")
    )
    out = label_propagation_communities(knn, src="s", dst="d", rounds=_LPA_ROUNDS)
    return out.select(
        F.col("node").alias("vec_id"), F.col("community").cast("long").alias("community")
    ).orderBy("vec_id")
