"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection emits *pairs*; the pipeline step that actually drops
documents needs *clusters* (transitively connected groups) with one
keeper each. Connected components is the canonical iterative Spark
algorithm: small-step minimum-label propagation, one join + aggregate
per round, converging in O(graph diameter) rounds.

Scale notes: each round is a shuffle on the node id — fully distributed;
the driver only runs the (tiny) convergence loop. Diameter of near-dup
graphs is small in practice (dup clusters are cliques or short chains),
so rounds stay in the single digits. For billion-edge graphs the
large-star/small-star variant halves rounds; the propagation skeleton is
the same.

Why not Spark 4's native ``WITH RECURSIVE``: recursive CTEs currently
allow only UNION ALL between the anchor and recursive terms
(``UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE``, probed on 4.1.2). Transitive
closure over a CYCLIC graph (any symmetric dup graph) needs UNION's
dedup-per-level to terminate — with UNION ALL the path multiset grows
without bound. The driver-side iterative loops here ARE the
deduplicating fixpoint recursion, with convergence checks and lineage
checkpointing the SQL form cannot express; the DuckDB oracles (which do
support recursive UNION) verify their results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Label every node of the pair graph with its component's min id.

    Returns (node, component). Deterministic: min-label propagation has
    a unique fixpoint. Raises if not converged within ``max_iter``
    (diameter bound exceeded — raise the bound, not the stakes).

    Iteration discipline (the two classic iterative-Spark traps):

    - **One action per round.** The convergence check needs this round's
      label sum and last round's — last round's is remembered on the
      driver instead of re-executing the previous DAG a second time.
    - **Bounded lineage.** ``labels`` feeds two branches of the next
      round (the neighbor aggregate and the join), so its lineage would
      double every round; ``localCheckpoint`` every ``checkpoint_every``
      rounds truncates it (the convergence action materializes the
      blocks, so the lazy checkpoint costs no extra job). ``edges`` is
      checkpointed once up front — it is re-read every round and its
      upstream (e.g. the full MinHash pipeline) must not re-execute per
      round. On a real cluster use reliable ``checkpoint()``/staging
      tables; local block storage is the single-JVM equivalent.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Fused first round: with component(v) initialized to v, round 1's
    # neighbor-min is just min(neighbor id), so the initial labels can be
    # computed directly as least(node, min(neighbor)) in ONE aggregate —
    # saving a full join round (every node of a pair graph has >= 1
    # neighbor, so no node is lost).
    labels = edges.groupBy(F.col("u").alias("node")).agg(
        F.least(F.col("u"), F.min("v")).alias("component")
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for i in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        # convergence: component sum strictly decreases until fixpoint
        new_sum = new_labels.agg(F.sum("component")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster near-dup pairs; mark the keeper (min doc id) per cluster.

    Returns (doc_id, cluster_id, is_keeper) for every document that
    appears in at least one pair — the rows a dedup pipeline uses to
    drop ``is_keeper = false`` documents.
    """
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )


def connected_components_two_phase(
    pairs: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the O(log n)-round scale path.

    ``connected_components`` above propagates labels one hop per round:
    O(diameter) rounds, ideal for near-dup graphs (cliques and short
    chains). On high-diameter graphs (paths, meshes, web graphs) the
    alternating star operations contract whole subtrees per round and
    converge in O(log n) rounds instead:

    - **large-star** (per node u over its symmetric neighborhood):
      connect every neighbor LARGER than u to the neighborhood minimum
      ``m = min(N(u) + {u})``;
    - **small-star**: connect every neighbor smaller than u (and u
      itself) to the minimum of that smaller set.

    Both steps are a groupBy on the node + a re-join — the same
    shuffle-on-node shape as label propagation, two of them per round.
    Terminates when the edge multiset is stable, at which point every
    component is a star whose center is the component minimum; the
    label read-off is one final aggregate. Returns (node, component),
    identical to ``connected_components`` (asserted in tests).
    """
    e = (
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for i in range(max_iter):
        # ---- large-star: symmetric view, group on u
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        # no distinct here: duplicate edges cannot change the small-star
        # phase's min aggregates, and the round ends in a distinct — so
        # deduping now would only add a shuffle per round
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # ---- small-star over large-star's output (edges stored big->small)
        e2 = large.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        small_mins = e2.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            e2.join(small_mins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(small_mins.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
        )
        if (i + 1) % checkpoint_every == 0:
            small = small.localCheckpoint(eager=False)
        # Checkpoint default is EVERY round: the convergence action below
        # materializes the round's plan regardless, so skipping the
        # checkpoint only means the NEXT round's action recomputes this
        # round's two shuffles from scratch (measured 6.8s -> 2.8s at
        # sf0.1 switching checkpoint_every from 2 to 1).
        # one action per round: edge count + order-insensitive signature
        # (bit_xor, not sum — hash sums overflow under ANSI arithmetic)
        row = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("sig"),
        ).first()
        sig = (row["n"], row["sig"])
        e = small
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"two-phase CC did not converge in {max_iter} rounds")
    # stars: every edge is (node -> component min); nodes that are
    # centers appear only on the v side
    nodes = e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    )
    return nodes.groupBy("node").agg(F.min("component").alias("component"))


def pagerank(
    pairs: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    iterations: int = 5,
    damping: float = 0.85,
    teleport_weight: float | None = None,
    round_digits: int = 10,
) -> DataFrame:
    """PageRank over the symmetrized pair graph → (node, rank).

    ``teleport_weight`` defaults to ``1.0 - damping`` but can be passed
    explicitly (e.g. the literal ``0.15``) so callers whose oracle SQL
    interpolates the same literal stay bit-identical — the Python
    expression ``1.0 - 0.85`` is the IEEE double 0.15000000000000002,
    NOT the literal 0.15, and per-round rounding can land exactly on a
    half boundary where that last-ulp difference flips the result.

    Fixed-iteration power method: contribution = rank/out-degree pushed
    along edges (join), summed per target (hash agg), damped teleport
    added back — the canonical iterative-join Spark shape, same
    discipline as ``connected_components`` (edges checkpointed once and
    re-read per round, rank lineage truncated periodically, the driver
    never touches row data). Symmetrization guarantees every node has
    out-degree ≥ 1, so no dangling-mass correction term is needed and
    total rank stays 1.

    Ranks are stable-rounded (multiply-round-divide, ``round_digits``)
    after EVERY iteration so the per-node double is bit-identical to the
    unrolled-CTE oracle — cross-engine drift cannot compound across
    rounds.

    Scale: each round is one shuffle on the node id; degree and the node
    count ride along as columns (the count is a 1-row broadcast). At
    100 TB edge scale, pre-partition ``edges`` by ``u`` (bucketed
    staging table) so the per-round join is exchange-free on one side.
    """
    tw = teleport_weight if teleport_weight is not None else (1.0 - damping)
    scale = float(10**round_digits)

    def rnd(c):
        return F.round(c * scale) / scale

    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    n_df = deg.agg(F.count(F.lit(1)).alias("n"))
    # (node, d, n) — the loop-invariant base every round rejoins against.
    base = (
        deg.select(F.col("u").alias("node"), "d")
        .crossJoin(F.broadcast(n_df))
        .localCheckpoint(eager=True)
    )
    ranks = base.select("node", "d", "n", rnd(F.lit(1.0) / F.col("n")).alias("rank"))
    for i in range(iterations):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("node").alias("u"), (F.col("rank") / F.col("d")).alias("c")
                ),
                "u",
            )
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.v, "left")
            .select(
                "node",
                "d",
                "n",
                rnd(
                    F.lit(tw) / F.col("n")
                    + damping * F.coalesce("s", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % 2 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def bfs_hops(
    pairs: DataFrame,
    seeds: DataFrame | None = None,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    seed_col: str = "node",
    max_iter: int = 20,
    seed_filter=None,
) -> DataFrame:
    """Minimum hop count from a seed set over the symmetrized pair graph.

    Returns (node, hops) for every node reachable within ``max_iter``
    hops (seeds at 0). Classic distributed BFS: the frontier expands one
    join per round, already-labelled nodes are anti-joined away so each
    node is visited exactly once — total work is O(edges) across all
    rounds, not O(edges x rounds). Same iteration discipline as
    ``connected_components``: edges checkpointed once, labels lineage
    truncated as it accumulates, one (empty?) action per round.

    Seeds come either as a frame (``seeds``) or as ``seed_filter``, a
    predicate over the node column applied to the node set of the
    ALREADY-CHECKPOINTED edges. Prefer the filter when the seed set
    derives from the pair graph itself (hash-probe centrality): passing
    a seeds frame built from the raw ``pairs`` subtree executes the
    whole pair pipeline a second time at the seed checkpoint — measured
    1.4x end-to-end on q_harmonic_centrality (AB_RUNS.jsonl
    r9-clean-bench-movers) once the band-frame checkpoint that used to
    absorb the recompute was (correctly) removed.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if seed_filter is not None:
        seeds = edges.select(F.col("u").alias(seed_col)).distinct().filter(
            seed_filter(F.col(seed_col))
        )
    labels = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = labels
    prev_frontier = None
    for _ in range(max_iter):
        neighbors = (
            edges.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"), (F.col("hops") + 1).alias("hops"))
            .distinct()
        )
        # Two-frontier anti-join (r10, guide §1.2/§2.3): in an undirected
        # graph a neighbor of a distance-r node has distance r-1, r or
        # r+1, so the only SETTLED nodes `neighbors` can contain are in
        # the current or previous frontier — anti-joining against those
        # two (frontier-sized) frames is exactly equivalent to anti-
        # joining against the full accumulated label set, and shuffles
        # O(frontier) instead of O(all labels) per round.
        seen = (
            frontier if prev_frontier is None else frontier.union(prev_frontier)
        )
        new = neighbors.join(seen.select("node"), "node", "left_anti").localCheckpoint(
            eager=True
        )
        if new.isEmpty():
            break
        # Labels are APPEND-ONLY: every constituent (seed labels + each
        # round's `new`) is already an eagerly-checkpointed RDD, so the
        # accumulator can stay a LAZY union of those checkpoints — no
        # recompute is possible through it, and re-checkpointing the
        # union each round re-materialized the entire accumulated label
        # set every round (O(labels) per round, quadratic across the
        # BFS; guide §1.2: don't compute things you throw away).
        labels = labels.union(new)
        prev_frontier = frontier
        frontier = new
    return labels


def personalized_pagerank(
    pairs: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    seed_col: str = "node",
    iterations: int = 5,
    damping: float = 0.85,
    teleport_weight: float | None = None,
    round_digits: int = 10,
) -> DataFrame:
    """Personalized PageRank: teleport mass restarts at the SEED set
    instead of uniformly — rank becomes proximity TO the seeds, the
    similar-item / recommendation primitive (vs :func:`pagerank`'s
    global centrality). Same iterative-join discipline: edges
    checkpointed once, one shuffle per round on the node id, per-round
    stable rounding keeps both engines on bit-identical iterates.
    Seeds not present in the graph are ignored; an empty effective seed
    set yields all-zero ranks rather than an error.
    """
    tw = teleport_weight if teleport_weight is not None else (1.0 - damping)
    scale = float(10**round_digits)

    def rnd(c):
        return F.round(c * scale) / scale

    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    marked = deg.select(F.col("u").alias("node"), "d").join(
        seed_nodes.withColumn("is_seed", F.lit(True)), "node", "left"
    ).select("node", "d", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
    ns_df = marked.agg(
        F.sum(F.when(F.col("is_seed"), 1).otherwise(0)).cast("long").alias("ns")
    )
    base = marked.crossJoin(F.broadcast(ns_df)).localCheckpoint(eager=True)
    teleport = F.when(
        F.col("is_seed") & (F.col("ns") > 0), F.lit(1.0) / F.col("ns")
    ).otherwise(F.lit(0.0))
    ranks = base.select("node", "d", "is_seed", "ns", rnd(teleport).alias("rank"))
    for i in range(iterations):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("node").alias("u"), (F.col("rank") / F.col("d")).alias("c")
                ),
                "u",
            )
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.v, "left")
            .select(
                "node",
                "d",
                "is_seed",
                "ns",
                rnd(
                    F.lit(tw) * teleport
                    + damping * F.coalesce("s", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % 2 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def label_propagation_communities(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Deterministic SYNCHRONOUS label-propagation community detection
    (Raghavan et al. 2007, made deterministic): unlike connected
    components (which floods the min id across every reachable node),
    LPA lets DENSE regions keep their own label, so one connected
    component can split into several communities.

    Update rule, applied to all nodes simultaneously each round:
    new_label(v) = the label with the highest vote count among v's
    neighbors' current labels PLUS v's own current label (one self-vote
    — the standard damping that prevents two-coloring oscillation on
    bipartite-ish structures), ties broken to the SMALLEST label.
    Fixed ``rounds`` (no data-dependent stop) keeps the op oracle-
    expressible as an unrolled SQL chain.

    Scale shape: each round is one shuffle — edges join labels on the
    neighbor id, then a (node, label) count aggregate and a per-node
    argmax via the partitioned window (WindowGroupLimit prunes to one
    row per node before the final exchange). Labels are checkpointed
    per round so lineage stays bounded. Returns (node, community).
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = fwd.union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct().localCheckpoint(eager=True)
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    from pyspark.sql.window import Window

    for _ in range(rounds):
        nbr = e.join(labels, e.v == labels.node).select(
            F.col("u").alias("node"), "lbl"
        )
        votes = (
            nbr.unionByName(labels.select("node", "lbl"))
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lbl"))
        labels = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def ktruss_edges(
    edges: DataFrame,
    *,
    src: str = "u",
    dst: str = "v",
    k: int = 4,
    rounds: int = 3,
) -> DataFrame:
    """k-truss peel over an undirected graph (Cohen 2008): iteratively
    drop every edge supported by fewer than ``k - 2`` triangles among
    the SURVIVING edges. Where k-core keeps nodes by degree, k-truss
    keeps edges by triangle support — the stricter cohesion filter that
    removes the bridge/chance edges a near-dup graph accumulates while
    preserving genuine duplicate cliques.

    Fixed ``rounds`` (no data-dependent stop) keeps the op oracle-
    expressible as an unrolled SQL chain; a 4-clique stabilizes in one
    round, chains of bridges peel one layer per round. Returns the
    surviving canonical edges (u < v) with the support computed on the
    LAST round's graph (the value the final filter saw).

    Scale shape per round: the canonical ordered-triangle enumeration
    (two hash joins on 8-byte node keys, each triangle generated once
    as a<b<c), one UNION ALL + count for per-edge support, one
    left-join filter. Edges checkpoint per round so the triangle
    pipeline never re-executes transitively.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    min_sup = k - 2
    out = None
    for _ in range(rounds):
        e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
        wedges = e.alias("e1").join(e2, F.col("e1.v") == F.col("b2")).select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), "c"
        )
        e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
        tri = wedges.join(
            e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
        ).select("a", "b", "c")
        sup = (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        scored = e.join(sup, ["u", "v"], "left").select(
            "u", "v", F.coalesce("support", F.lit(0)).alias("support")
        )
        out = scored.filter(F.col("support") >= min_sup).localCheckpoint(eager=False)
        e = out.select("u", "v")
    return out


def bfs_hops_per_seed(
    pairs: DataFrame,
    seeds: DataFrame | None = None,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    seed_col: str = "node",
    max_iter: int = 20,
    seed_filter=None,
) -> DataFrame:
    """Per-seed hop distances over the symmetrized pair graph: returns
    (seed, node, hops) for every (seed, reachable node) pair within
    ``max_iter`` hops — ``bfs_hops`` generalized from "min distance to
    the seed SET" to independent single-source BFS runs sharing one
    frontier pipeline (state keyed by (seed, node), so all sources
    expand in the same per-round join; the classic multi-source trick
    that makes k centrality probes cost one BFS, not k).

    Same iteration discipline as ``connected_components``: edges
    checkpointed once, per-round anti-join against settled labels so
    each (seed, node) is expanded exactly once, lineage truncated with
    localCheckpoint, one (empty?) action per round. Feeds closeness /
    harmonic centrality estimates from a hash-chosen probe set.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if seed_filter is not None:
        # Derive seeds from the checkpointed edges so the pair pipeline
        # runs exactly once (see bfs_hops docstring).
        seeds = edges.select(F.col("u").alias(seed_col)).distinct().filter(
            seed_filter(F.col(seed_col))
        )
    labels = (
        seeds.select(F.col(seed_col).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(0).cast("long").alias("hops"))
        .localCheckpoint(eager=True)
    )
    frontier = labels
    prev_frontier = None
    for _ in range(max_iter):
        neighbors = (
            edges.join(frontier.withColumnRenamed("node", "u"), "u")
            .select("seed", F.col("v").alias("node"), (F.col("hops") + 1).alias("hops"))
            .distinct()
        )
        # Two-frontier anti-join (r10): per seed, a neighbor of a
        # distance-r node has distance r-1, r or r+1, so the settled
        # (seed, node) pairs reachable from this round's frontier all
        # sit in the current or previous frontier — anti-joining those
        # two is equivalent to anti-joining the whole label set and
        # keeps the per-round shuffle O(frontier), not O(labels)
        # (see bfs_hops).
        seen = (
            frontier if prev_frontier is None else frontier.union(prev_frontier)
        )
        new = neighbors.join(
            seen.select("seed", "node"), ["seed", "node"], "left_anti"
        ).localCheckpoint(eager=True)
        if new.isEmpty():
            break
        # Append-only accumulator over already-checkpointed rounds: keep
        # the union LAZY (see bfs_hops — re-checkpointing it was a full
        # re-materialization of all settled labels every round).
        labels = labels.union(new)
        prev_frontier = frontier
        frontier = new
    return labels
