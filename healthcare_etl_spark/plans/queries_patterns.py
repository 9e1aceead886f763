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


def _knn_edges_ctes() -> list[str]:
    """Shared CTE chain: symmetrized k=3 cosine-NN graph over the first
    256 embeddings, ending in ``edges(u, v)`` (both directions)."""
    cos = _COS.format(a="a.embedding", b="b.embedding")
    return [
        f"pts AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_LPA_CAP})",
        f"""sc AS MATERIALIZED (
    SELECT a.vec_id AS s, b.vec_id AS d,
           (round(({cos}) * 1000000.0) / 1000000.0) AS c
    FROM pts a JOIN pts b ON a.vec_id <> b.vec_id)""",
        f"""knn AS (SELECT s, d FROM (
    SELECT s, d, row_number() OVER (PARTITION BY s ORDER BY c DESC, d ASC) AS rk
    FROM sc) WHERE rk <= {_LPA_K})""",
        "edges AS MATERIALIZED (SELECT s AS u, d AS v FROM knn UNION SELECT d, s FROM knn)",
    ]


def _lpa_oracle(rounds: int = _LPA_ROUNDS) -> str:
    parts = _knn_edges_ctes() + [
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


def _ktruss_oracle(k: int = 4, rounds: int = 3) -> str:
    """Unrolled k-truss peel over the k-NN embedding graph — every
    per-round CTE MATERIALIZED (the shared edge base would otherwise
    inline into each triangle chain and plan exponentially)."""
    min_sup = k - 2
    parts = _knn_edges_ctes() + [
        """e0 AS MATERIALIZED (
    SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM edges)"""
    ]
    for r in range(1, rounds + 1):
        p = f"e{r - 1}"
        parts.append(
            f"""tri{r} AS MATERIALIZED (
    SELECT w.a, w.b, w.c
    FROM (SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM {p} e1 JOIN {p} e2 ON e1.v = e2.u) w
    JOIN {p} e3 ON w.a = e3.u AND w.c = e3.v)"""
        )
        parts.append(
            f"""s{r} AS MATERIALIZED (
    SELECT u, v, CAST(count(*) AS BIGINT) AS support FROM (
        SELECT a AS u, b AS v FROM tri{r}
        UNION ALL SELECT b, c FROM tri{r}
        UNION ALL SELECT a, c FROM tri{r}) GROUP BY u, v)"""
        )
        parts.append(
            f"""e{r} AS MATERIALIZED (
    SELECT e.u, e.v, coalesce(s.support, 0) AS support
    FROM {p} e LEFT JOIN s{r} s ON e.u = s.u AND e.v = s.v
    WHERE coalesce(s.support, 0) >= {min_sup})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT u, v, support FROM e{rounds} ORDER BY u, v"
    )


@register(
    "q_ktruss_peel",
    oracle=_ktruss_oracle(k=3),
    description=(
        "3-truss peel (Cohen 2008) over the k=3 cosine-NN embedding "
        "graph: 3 unrolled rounds each dropping every edge in fewer "
        "than k-2 = 1 triangle among the SURVIVING edges — the "
        "edge-level cohesion filter that strips the hub/bridge edges "
        "k-NN graphs accumulate (asymmetric hubness matches that close "
        "no triangle) while keeping the mutually-corroborated "
        "neighborhoods; on this fixture it peels 518 edges to 73. "
        "Stricter than q_kcore_peel's degree test, complementary to "
        "q_triangle_count's node counts and q_lpa_communities' labels "
        "(same shared k-NN graph). Per round: the canonical a<b<c "
        "ordered-triangle enumeration (two hash joins on 8-byte keys, "
        "each triangle generated once), one UNION ALL support count, "
        "one left-join filter; edges checkpoint per round so nothing "
        "re-executes transitively. Fixed 3 rounds keeps it oracle-"
        "expressible; production runs to fixpoint with the same "
        "per-round plan, and at corpus scale the k-NN edges come from "
        "any ANN in the registry instead of the capped brute-force "
        "pass."
    ),
    tags=("graph", "extension", "iterative", "scale-pattern"),
)
def q_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.functions.vectors import cosine_similarity
    from healthcare_etl_spark.operators.graph import ktruss_edges

    pts = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _LPA_CAP)
        .select("vec_id", "embedding")
    )
    a = pts.select(F.col("vec_id").alias("s"), F.col("embedding").alias("av"))
    b = pts.select(F.col("vec_id").alias("d"), F.col("embedding").alias("bv"))
    sc = a.join(F.broadcast(b), F.col("s") != F.col("d")).select(
        "s",
        "d",
        stable_round(cosine_similarity(F.col("av"), F.col("bv")), 6).alias("c"),
    )
    w = Window.partitionBy("s").orderBy(F.desc("c"), F.asc("d"))
    knn = (
        sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LPA_K)
        .select("s", "d")
    )
    sym = knn.select(F.col("s").alias("u"), F.col("d").alias("v")).union(
        knn.select(F.col("d").alias("u"), F.col("s").alias("v"))
    )
    return ktruss_edges(sym, src="u", dst="v", k=3, rounds=3).orderBy("u", "v")


def _ransac_hashes(n_cand: int = 16) -> list[tuple[int, int, int]]:
    """Counter-based candidate anchors: (cand, Ha, Hb) with H = 31-bit
    md5 of the literal strings 'ransac:{i}:a' / 'ransac:{i}:b' — the
    same md5-derived hash family every dedup oracle mirrors, computed
    once here and INLINED as literals into both engines so there is no
    RNG to disagree on."""
    import hashlib

    out = []
    for i in range(n_cand):
        ha = int(hashlib.md5(f"ransac:{i}:a".encode()).hexdigest()[:8], 16) % 2147483647
        hb = int(hashlib.md5(f"ransac:{i}:b".encode()).hexdigest()[:8], 16) % 2147483647
        out.append((i, ha, hb))
    return out


_RANSAC_EPS = 20000  # inlier band, integer cents


def _ransac_oracle(n_cand: int = 16) -> str:
    values = ", ".join(f"({c}, {ha}, {hb})" for c, ha, hb in _ransac_hashes(n_cand))
    fit_num = "(k * sxy - sx * sy) * 1.0"
    fit_den = "(k * sxx - sx * sx)"
    slope_raw = f"({fit_num} / {fit_den})"
    return f"""
WITH pts AS MATERIALIZED (
    SELECT user_id, CAST(count(*) AS BIGINT) AS x,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY user_id),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
ranked AS (SELECT x, y, row_number() OVER (ORDER BY user_id) AS rk FROM pts),
hc (cand, ha, hb) AS (VALUES {values}),
cands AS (SELECT cand, ha % nn.n + 1 AS ra, hb % nn.n + 1 AS rb FROM hc, nn),
models AS (
    SELECT c.cand, c.ra, c.rb, p1.x AS x1, p1.y AS y1,
           p2.x - p1.x AS dx, p2.y - p1.y AS dy
    FROM cands c
    JOIN ranked p1 ON p1.rk = c.ra
    JOIN ranked p2 ON p2.rk = c.rb
    WHERE p1.x <> p2.x),
inl AS (
    SELECT m.cand, CAST(count(*) AS BIGINT) AS n_inliers
    FROM models m JOIN pts p
      ON abs(m.dx * (p.y - m.y1) - m.dy * (p.x - m.x1)) <= {_RANSAC_EPS} * abs(m.dx)
    GROUP BY 1),
counts AS (
    SELECT m.cand, m.ra, m.rb, m.x1, m.y1, m.dx, m.dy, i.n_inliers
    FROM models m JOIN inl i USING (cand)),
winner AS (SELECT * FROM counts ORDER BY n_inliers DESC, cand ASC LIMIT 1),
mom AS (
    SELECT w.cand, CAST(count(*) AS BIGINT) AS k,
           sum(p.x) AS sx, sum(p.y) AS sy,
           sum(p.x * p.x) AS sxx, sum(p.x * p.y) AS sxy
    FROM winner w JOIN pts p
      ON abs(w.dx * (p.y - w.y1) - w.dy * (p.x - w.x1)) <= {_RANSAC_EPS} * abs(w.dx)
    GROUP BY 1),
fit AS (
    SELECT cand,
           (round({slope_raw} * 1000000.0) / 1000000.0) AS slope,
           (round(((sy - {slope_raw} * sx) * 1.0 / k) * 1000000.0) / 1000000.0)
               AS intercept
    FROM mom)
SELECT c.cand, c.ra, c.rb, c.n_inliers, f.slope, f.intercept
FROM counts c LEFT JOIN fit f USING (cand)
ORDER BY c.cand
"""


@register(
    "q_ransac_fit",
    oracle=_ransac_oracle(),
    description=(
        "Deterministic RANSAC line fit (Fischler-Bolles 1981) of "
        "per-user spend-cents vs event-count: 16 candidate models, each "
        "anchored by two points addressed via counter-based hashing "
        "(rank = md5('ransac:i:a') mod n — literals inlined into both "
        "engines, no RNG), inliers tested in EXACT BIGINT arithmetic "
        "(|dx*(y-y1) - dy*(x-x1)| <= eps*|dx| — the residual test "
        "multiplied through by dx so no float boundary exists), winner "
        "= max inliers (tie: min candidate), then an exact-moment OLS "
        "refit over the winner's inliers. The robust-regression "
        "pattern OLS diagnostics (q_regression_diagnostics) and "
        "Theil-Sen (q_theil_sen) bracket: RANSAC tolerates arbitrary "
        "outlier fractions at O(candidates * n) cost. 100 TB shape: "
        "point ranks ride bucketed_rank (two-phase carry, no global "
        "sort); the 16 models broadcast into ONE conditional-count "
        "pass; the refit is one more broadcast pass — no per-candidate "
        "scans, no collect."
    ),
    tags=("mlops", "extension", "robust", "scale-pattern"),
)
def q_ransac_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_spark.operators.scale import bucketed_rank

    ev = load_table(spark, sf_dir, "events")
    pts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
    )
    pts = pts.localCheckpoint(eager=True)
    ranked = bucketed_rank(
        pts,
        buckets=[F.expr("user_id div 1024")],
        order_by=[F.col("user_id")],
        out_col="rk",
    ).select("x", "y", "rk")
    nn = pts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    hc = spark.createDataFrame(_ransac_hashes(), "cand long, ha long, hb long")
    cands = hc.crossJoin(F.broadcast(nn)).select(
        "cand",
        (F.col("ha") % F.col("n") + 1).alias("ra"),
        (F.col("hb") % F.col("n") + 1).alias("rb"),
    )
    p1 = ranked.select(F.col("rk").alias("ra"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    p2 = ranked.select(F.col("rk").alias("rb"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    models = (
        p1.join(F.broadcast(cands), "ra")
        .join(p2, "rb")
        .filter(F.col("x1") != F.col("x2"))
        .select(
            "cand", "ra", "rb", "x1", "y1",
            (F.col("x2") - F.col("x1")).alias("dx"),
            (F.col("y2") - F.col("y1")).alias("dy"),
        )
    )
    resid_ok = (
        F.abs(
            F.col("dx") * (F.col("y") - F.col("y1"))
            - F.col("dy") * (F.col("x") - F.col("x1"))
        )
        <= F.lit(_RANSAC_EPS) * F.abs("dx")
    )
    inl = (
        pts.crossJoin(F.broadcast(models))
        .filter(resid_ok)
        .groupBy("cand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inliers"))
    )
    counts = models.join(inl, "cand")
    winner = counts.orderBy(F.desc("n_inliers"), F.asc("cand")).limit(1)
    mom = (
        pts.crossJoin(F.broadcast(winner))
        .filter(resid_ok)
        .groupBy("cand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    slope_raw = (
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) * F.lit(1.0)
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
    fit = mom.select(
        "cand",
        stable_round(slope_raw, 6).alias("slope"),
        stable_round((F.col("sy") - slope_raw * F.col("sx")) * F.lit(1.0) / F.col("k"), 6).alias(
            "intercept"
        ),
    )
    return (
        counts.select("cand", "ra", "rb", "n_inliers")
        .join(F.broadcast(fit), "cand", "left")
        .orderBy("cand")
    )
