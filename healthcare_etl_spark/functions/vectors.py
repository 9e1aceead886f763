"""Vector math over ``array<float>`` columns — pure built-in expressions.

Everything here compiles to JVM higher-order functions
(``aggregate``/``zip_with``) inside whole-stage codegen: no Python UDF,
no Arrow round-trip, so a 100 TB embedding column streams through the
executors at scan speed.

Determinism note (oracle parity): ``aggregate`` folds strictly
left-to-right, so the float summation order is fixed — the same fold in
DuckDB (``list_reduce``) produces bit-identical doubles. Elements are
cast to double *before* multiplication so float32 inputs round the same
way on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, folded left-to-right."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe only insofar as SQL NULL propagates."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def max_abs(a: Column | str) -> Column:
    """Largest |element| of an array<numeric> column (order-independent)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Symmetric per-vector int8 quantization: ``floor(x/scale*127 + 0.5)``.

    ``floor(v + 0.5)`` is used instead of ``round(v)`` because round-half
    behavior differs across engines (Spark HALF_UP on BigDecimal, DuckDB
    std::round) — floor(+0.5) is bit-identical everywhere. With
    ``scale = max_abs(vec)`` every quantized value lands in [-127, 127].
    4x smaller than float32 at rest and integer dot products thereafter:
    the standard memory/bandwidth move for a 100 TB embedding column.
    """
    a = F.col(a) if isinstance(a, str) else a
    safe = F.greatest(scale, F.lit(1e-30))
    return F.transform(
        a, lambda x: F.floor(x.cast("double") / safe * F.lit(127.0) + F.lit(0.5)).cast("long")
    )


def dot_int(a: Column | str, b: Column | str) -> Column:
    """Integer dot product (exact, order-independent — no float drift)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
