"""Custom batch connector via the Spark 4 Python Data Source API.

The reference's source surface is files + a SQL database (reference
``etl_app/etl_script.py:49,52`` CSV extract, ``dashboard_app/app.py:31``
SQL read). A real engine also needs *pluggable* sources — the Spark-4
`pyspark.sql.datasource` API is the public extension point, and this
module exercises it end-to-end with a deterministic synthetic-document
generator:

- **partition-parallel**: `partitions()` returns N `InputPartition`s;
  each executor task generates only its own id range, so the source
  scales out like any file scan (no driver-side materialization);
- **deterministic**: row content is pure arithmetic on the row id
  (LCG-style token ids), so output is identical across runs, partition
  counts, and engines — the DuckDB oracle rebuilds the same rows from
  `generate_series`, making a *custom connector* value-hash-checkable;
- **batch-friendly**: rows are yielded as tuples (the API Arrow-batches
  them); generation cost is O(rows/partition) with zero shuffle.

Registration is per-session: ``spark.dataSource.register(
SyntheticDocsDataSource)`` then ``spark.read.format("synthetic_docs")``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Token-id mixing constants (documented in the oracle SQL mirror too).
_A = 1103515245
_B = 12345
_MOD = 997  # vocabulary size: token ids in [0, 997)
_TOKENS_PER_DOC = 8
_N_SOURCES = 4


def synthetic_doc_text(doc_id: int) -> str:
    """The deterministic text for ``doc_id`` — shared by reader and tests."""
    return " ".join(
        f"tok{(doc_id * _A + _B * t) % _MOD}" for t in range(_TOKENS_PER_DOC)
    )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # Contiguous id ranges per partition: partition i owns
        # [i*step, min((i+1)*step, n)) — no overlap, no gaps.
        step = -(-self.n_rows // self.n_partitions)
        lo = partition.value * step
        hi = min(lo + step, self.n_rows)
        for doc_id in range(lo, hi):
            yield (
                doc_id,
                f"src{doc_id % _N_SOURCES}",
                synthetic_doc_text(doc_id),
                _TOKENS_PER_DOC,
            )


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, source STRING, text STRING, n_tokens BIGINT"

    def reader(self, schema) -> SyntheticDocsReader:  # noqa: ARG002 - fixed schema
        return SyntheticDocsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent per-session registration of the connector."""
    spark.dataSource.register(SyntheticDocsDataSource)
