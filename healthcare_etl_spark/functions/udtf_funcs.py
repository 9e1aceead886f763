"""Python user-defined table functions (Spark 4 `udtf` API).

UDTFs are the row-expanding escape hatch: one input row → many output
rows, with arbitrary Python logic, callable from SQL (`LATERAL` /
table-argument syntax) or the DataFrame API. They sit BELOW built-in
generators in the performance hierarchy — `F.explode(F.sequence(...))`
stays in whole-stage codegen while a UDTF crosses into a Python worker
per batch — so this module exists to prove the extension point works
end to end, not to serve the hot path: the production chunker is the
codegen form in ``plans.queries_analytics.q_doc_chunks``, and the test
suite asserts this UDTF reproduces it row-for-row.

Use a UDTF only when the expansion logic cannot be expressed with
sequence/explode/stack/inline — e.g. an external tokenizer, a parser
producing a variable record set, a generator with data-dependent
control flow.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_LEN = 64
CHUNK_STRIDE = 48


@udtf(returnType="chunk_idx: bigint, start_tok: bigint, end_tok: bigint, chunk_len: bigint")
class ChunkSpans:
    """Sliding-window chunk spans for an ``n_tok``-token document.

    Mirrors q_doc_chunks: CHUNK_LEN-token chunks at CHUNK_STRIDE, every
    document yields at least one (possibly truncated) chunk.
    """

    def eval(self, n_tok: int):  # noqa: D102 - UDTF contract
        if n_tok is None:
            return
        last_start = max(n_tok - CHUNK_LEN + CHUNK_STRIDE - 1, 0)
        for start in range(0, last_start + 1, CHUNK_STRIDE):
            end = min(start + CHUNK_LEN, n_tok)
            yield start // CHUNK_STRIDE, start, end, end - start


def register_udtfs(spark) -> None:
    """Register the UDTFs for SQL use (``chunk_spans(n_tok)``)."""
    spark.udtf.register("chunk_spans", ChunkSpans)
