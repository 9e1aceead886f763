"""Query registry — single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (and every extension
operator) registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``;
- where SQL-expressible, the equivalent ANSI SQL for the DuckDB oracle
  (the fixture tables are pre-registered views on the driver side).

Column names are aliased identically on both sides: the driver's compare
sorts columns by name before hashing values. Computed floating-point
columns are rounded on both sides because double summation order differs
between engines (last-ulp drift would break the value hash).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator registering a query program under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, description=description, tags=tags)
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every query module so its @register calls run."""
    import healthcare_etl_spark.plans.healthcare  # noqa: F401
    import healthcare_etl_spark.plans.queries_core  # noqa: F401
    import healthcare_etl_spark.plans.queries_agg  # noqa: F401
    import healthcare_etl_spark.plans.queries_tpch  # noqa: F401
    import healthcare_etl_spark.plans.queries_tpch_deep  # noqa: F401
    import healthcare_etl_spark.plans.queries_pipeline_ops  # noqa: F401
    import healthcare_etl_spark.plans.queries_events  # noqa: F401
    import healthcare_etl_spark.plans.queries_text  # noqa: F401
    import healthcare_etl_spark.plans.queries_corpus  # noqa: F401
    import healthcare_etl_spark.plans.queries_subqueries  # noqa: F401
    import healthcare_etl_spark.plans.queries_dedup  # noqa: F401
    import healthcare_etl_spark.plans.queries_similarity  # noqa: F401
    import healthcare_etl_spark.plans.queries_multimodal  # noqa: F401
    import healthcare_etl_spark.plans.queries_analytics  # noqa: F401
    import healthcare_etl_spark.plans.queries_mlops  # noqa: F401

    from healthcare_etl_spark.streaming.joins import register_join_queries
    from healthcare_etl_spark.streaming.stateful import register_stateful_queries
    from healthcare_etl_spark.streaming.windows import register_streaming_queries

    register_streaming_queries()
    register_stateful_queries()
    register_join_queries()


# The driver's correctness gate oracle-checks the FIRST 50 registered
# queries (registration order == dict order).  This list curates that
# window.  Rotation policy: the 22 SURVEY.md §2 core rows stay pinned
# every round (reference parity must never lose driver signal); the
# remaining 28 slots ROTATE each round over the oracle-backed extension
# queries so that every one of them regains a driver-green row at most
# a couple of rounds apart.  Round 2 covered the extension families
# (dedup/similarity/text/corpus/pipeline/events/multimodal); round 3
# swapped in the deep TPC-H shapes, set-ops, grouping, subqueries,
# temporal joins and multimodal kernels (all green in CORRECTNESS_r03/
# r04 except the round-4 ts regression); round 5 keeps q_range_join and
# q_sessionize in-window to prove the TIMESTAMP_NTZ fix and rotates the
# remaining slots back to the extension families last driver-checked in
# round 2 (dedup, similarity, text/corpus, pipeline ops, events).
# Queries outside the window keep their in-repo DuckDB-parity test
# (tests/test_oracle_parity.py runs ALL oracle-backed queries at
# sf0.001 and, under -m sf001, at sf0.01); rows-only (non-SQL-
# expressible) queries register last so they never burn a checked slot
# on `no_oracle`.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- SURVEY.md §2 core (reference parity; must stay green every round)
    "q_etl_replica",
    "q_etl_replica_by_state",
    "q_etl_replica_by_ownership",
    "q_etl_metrics",
    "q_etl_topn_by_state",
    "q_scan_project",
    "q_select_star",
    "q_normalize_columns",
    "q_try_cast_coerce",
    "q_dropna",
    "q_filter_eq",
    "q_drop_cols",
    "q_inner_join",
    "q_count",
    "q_count_distinct",
    "q_avg_global",
    "q_groupby_avg",
    "q_groupby_avg_sorted",
    "q_topk",
    "q_string_funcs",
    "q_sql_surface",
    "q_format_number",
    # -- S1 literal: the CSV reader itself, oracle-checked (round 5+)
    "q_csv_scan",
    # -- round-5: the two round-4 ts casualties stay in-window to prove
    #    the TIMESTAMP_NTZ fix with a driver-green row
    "q_range_join",
    "q_sessionize",
    # -- rotation: dedup family (last driver-checked round 2)
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash",
    # q_pagerank (new this round) takes q_dedup_simhash's slot — the
    # second iterative-graph shape gets a driver-green row; simhash
    # keeps its in-repo parity test
    "q_pagerank",
    "q_dedup_clusters",
    # -- similarity / ANN family (q_semantic_dedup is new in round 5 —
    #    it replaces the O(n^2) q_sim_neardup slot with the clustered
    #    scale path; q_sim_hamming_topk — binary quantization + Hamming
    #    prefilter, also new — takes the random-hyperplane LSH slot;
    #    neardup and lsh keep their in-repo parity tests)
    "q_sim_topk",
    "q_semantic_dedup",
    "q_sim_hamming_topk",
    # product-quantization ANN (new late round 5 — the 32x-compression
    # ADC tier) takes the IVF slot; q_sim_ann_ivf was driver-green in
    # r3/r4 and keeps its in-repo parity test
    "q_sim_ann_pq",
    "q_kmeans_clusters",
    # -- text / corpus analytics (late round 5: the hybrid BM25+vector
    #    RRF fusion takes q_lang_id's slot — lang-ID keeps its in-repo
    #    parity test and still runs inside q_corpus_pipeline; the KS
    #    drift monitor takes q_quality_score's sibling slot so the
    #    drift/monitoring family gets its first driver-green row —
    #    quality_score keeps its in-repo test and also runs inside
    #    q_corpus_pipeline and q_quality_gate)
    "q_text_stats",
    "q_ks_drift",
    "q_hybrid_search_rrf",
    # corpus-level sketch-merge similarity (new round 5) takes the
    # fingerprint slot; q_fingerprint keeps its in-repo parity test
    "q_source_minhash_jaccard",
    "q_bm25_search",
    "q_tfidf_topterms",
    "q_corpus_pipeline",
    # -- training-data pipeline ops (round-5 additions swap in for their
    #    nearest established sibling: train_shards for hash_split,
    #    mixture_balance for sample_stratified — the swapped-out queries
    #    keep their in-repo parity tests)
    "q_train_shards",
    "q_mixture_balance",
    # the Bloom-sketch decontamination (new this round) takes the exact
    # gram-join variant's slot; q_decontaminate keeps its in-repo test
    "q_bloom_decontaminate",
    # late round 5: DSIR importance weighting supersedes the unigram
    # log-probability score as the data-selection flagship (same family,
    # strictly richer: target/raw ratio vs raw-only); unigram keeps its
    # in-repo parity test
    "q_dsir_weights",
    "q_pack_chunks",
    # the compaction planner (new round 5, lakehouse maintenance op)
    # takes the passage-dedup slot; q_passage_dedup keeps its in-repo
    # parity test
    "q_compaction_plan",
    # -- event-time (late round 5: the CDC MERGE collapse takes the
    #    tumbling-window slot — q_event_windows keeps its in-repo parity
    #    test and its streaming twin q_stream_tumbling stays ==batch-
    #    tested)
    "q_cdc_apply",
    "q_scd2_intervals",
)


def _ordered(reg: dict[str, Query]) -> dict[str, Query]:
    """Window names first, then remaining oracle-backed, then rows-only."""
    missing = [name for name in DRIVER_WINDOW if name not in reg]
    if missing:
        raise KeyError(
            "DRIVER_WINDOW names not present in the registry (renamed or "
            f"unregistered?): {missing}"
        )
    out: dict[str, Query] = {}
    for name in DRIVER_WINDOW:
        out[name] = reg[name]
    rest = [q for name, q in reg.items() if name not in out]
    for q in rest:
        if q.oracle is not None:
            out[q.name] = q
    for q in rest:
        if q.oracle is None:
            out[q.name] = q
    return out


def get_registry() -> dict[str, Query]:
    _load_all_modules()
    return _ordered(REGISTRY)


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in get_registry().items()}


def get_oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in get_registry().items() if q.oracle is not None}
