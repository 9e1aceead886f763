"""Slowly-changing-dimension history construction (SCD type 2).

The warehouse operator behind every "attribute history" table: given an
event/change log, produce one validity interval per (entity, attribute
value) run — ``valid_from`` inclusive, ``valid_to`` exclusive (the next
change's timestamp), ``is_current`` for the open interval. The
reference's data model is snapshot-only (reference
``etl_app/etl_script.py:74-119`` replaces the table wholesale per run);
SCD2 is the incremental counterpart a 100 TB warehouse needs so history
survives reloads.

Sibling operator: ``operators.scale.scd2_merge`` APPLIES a batch of
updates to an existing SCD2 dimension (close-out + append). This module
CONSTRUCTS the dimension from a raw change log in one pass — use this
for the initial build / full rebuild, the merge for incremental loads.

Scale shape: both windows partition on the entity key, so the whole
operator is ONE shuffle on the key (Catalyst folds the consecutive
same-key windows into a single Exchange + two Window nodes over the
same sort). No driver participation, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    *,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Compress a change log into SCD2 validity intervals.

    Consecutive rows (per ``key``, ordered by ``ts`` then ``tiebreak``)
    with the same ``attr`` value collapse into one interval starting at
    the run's first timestamp; ``valid_to`` is the next run's start
    (NULL for the current run). The ``tiebreak`` column makes the order
    — and therefore the run boundaries — total and deterministic even
    when timestamps collide.

    Returns (key, attr, valid_from, valid_to, is_current).
    """
    w_order = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    changes = (
        df.select(key, attr, ts, tiebreak)
        .withColumn("__prev", F.lag(attr).over(w_order))
        .filter(F.col("__prev").isNull() | (F.col(attr) != F.col("__prev")))
    )
    # lead() keyed on the same (ts, tiebreak) order: change rows keep
    # their tiebreak so equal-timestamp change points still order
    # deterministically.
    intervals = changes.withColumn(
        "valid_to", F.lead(ts).over(w_order)
    )
    return intervals.select(
        key,
        attr,
        F.col(ts).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
