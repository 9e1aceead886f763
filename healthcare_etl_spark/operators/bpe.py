"""BPE merge-pair learning (tokenizer training) over a document corpus.

Byte-pair encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") is the canonical
tokenizer-construction step of an LLM data pipeline. The scalable
formulation — the one HuggingFace `tokenizers` and SentencePiece use —
never iterates over the corpus: the corpus is scanned ONCE to build a
(word, count) vocabulary, and every merge round then operates on that
weighted vocabulary, which is orders of magnitude smaller (Heaps' law:
~sqrt-ish growth of distinct words in corpus size).

Engine mapping:

- corpus scan -> one `groupBy(word)` shuffle (partial-aggregated);
- per round: adjacent-pair counts come from a codegen'd
  ``zip_with(syms, slice(syms, 2, ...))`` explode over the vocabulary,
  aggregated with map-side combine; the winning pair is a
  TakeOrdered(1) (count desc, pair asc tie-break — fully
  deterministic);
- the merge itself is a stateful left-to-right ``aggregate`` fold per
  word, replacing non-overlapping occurrences greedily (exact BPE
  semantics: in ``a a a`` the pair ``(a, a)`` merges once, leaving
  ``aa a``) — the 1-row winner is broadcast-joined onto the vocabulary,
  never collected to the driver;
- the vocabulary frame is ``localCheckpoint``-ed per round (same
  iteration discipline as ``operators.graph`` / ``similarity.
  kmeans_lloyd``) so lineage stays bounded over many merges.

Determinism / oracle parity: counts are exact integers, tie-breaks are
total orders, and the greedy fold has identical semantics in DuckDB's
``list_reduce`` — the unrolled-CTE oracle reproduces every merge
decision exactly, so the whole training loop is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Greedy non-overlapping merge of the (l, r) pair carried on the row:
# fold symbols left-to-right; when the accumulator's last symbol is l
# and the incoming symbol is r, replace the tail with the merged token.
# Seeded with a '' sentinel so element_at(acc, -1) is always defined;
# the finish lambda drops it.
_MERGE_FOLD = """
aggregate(
    syms,
    array(''),
    (acc, x) -> CASE
        WHEN element_at(acc, -1) = l AND x = r
        THEN concat(slice(acc, 1, size(acc) - 1), array(concat(l, r)))
        ELSE concat(acc, array(x))
    END,
    acc -> slice(acc, 2, size(acc) - 1)
)
"""

_ADJACENT_PAIRS = (
    "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1), "
    "(a, b) -> struct(a AS l, b AS r))"
)


def word_vocabulary(
    docs: DataFrame, *, text_col: str = "text", vocab_size: int = 200
) -> DataFrame:
    """One corpus scan -> the top-``vocab_size`` (word, cnt) rows by
    count (word asc tie-break). Space tokenization matches the corpus
    queries' convention (plans.queries_corpus)."""
    words = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word")).filter(
        F.length("word") > 0
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(vocab_size)
    )


def bpe_merges(
    docs: DataFrame,
    *,
    n_merges: int = 4,
    vocab_size: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges. Returns one row per
    merge round: (round, left, right, merged, pair_count) — the merge
    table a downstream tokenizer would apply in order.

    ``vocab_size`` bounds the weighted word vocabulary the rounds
    operate on (top words by count — at production scale you keep the
    full distinct-word table; it is still corpus-scan-free after round
    zero)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = word_vocabulary(docs, text_col=text_col, vocab_size=vocab_size).withColumn(
        "syms",
        F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"),
    )
    winners: list[DataFrame] = []
    for r in range(1, n_merges + 1):
        pair_counts = (
            vocab.select("cnt", F.explode(F.expr(_ADJACENT_PAIRS)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        winner = (
            pair_counts.orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        winners.append(winner.select(F.lit(r).cast("int").alias("round"), "l", "r", "pair_count"))
        if r < n_merges:
            vocab = (
                vocab.crossJoin(F.broadcast(winner.select("l", "r")))
                .select("word", "cnt", F.expr(_MERGE_FOLD).alias("syms"))
                .localCheckpoint(eager=True)
            )
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    # left/right are SQL keywords; _sym suffix keeps the oracle SQL clean
    return out.select(
        "round",
        F.col("l").alias("left_sym"),
        F.col("r").alias("right_sym"),
        F.concat("l", "r").alias("merged"),
        "pair_count",
    )


def bpe_token_counts(
    docs: DataFrame,
    merges_rows: list[dict],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts under a learned merge table (passed as
    plain row dicts: [{'left_sym': ..., 'right_sym': ...}, ...] in
    training order). One corpus scan, all folds nested in a single
    codegen'd expression — no shuffle beyond the per-doc aggregate."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    expr = "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
    for m in merges_rows:
        l, r = esc(m["left_sym"]), esc(m["right_sym"])
        expr = f"""
aggregate(
    {expr},
    array(''),
    (acc, x) -> CASE
        WHEN element_at(acc, -1) = '{l}' AND x = '{r}'
        THEN concat(slice(acc, 1, size(acc) - 1), array(concat('{l}', '{r}')))
        ELSE concat(acc, array(x))
    END,
    acc -> slice(acc, 2, size(acc) - 1)
)
"""
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.select(id_col, F.size(F.expr(expr)).cast("long").alias("n_tok"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
