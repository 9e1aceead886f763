"""Scale-pattern operators: skew mitigation, upserts, snapshots.

These are the patterns that keep the 100 TB plans healthy when the
built-in machinery needs help:

- ``salted_join``: explicit key-salting for joins whose hot keys exceed
  what AQE's skew-join splitting handles (AQE splits skewed *partitions*
  of a sort-merge join; a single monster key still lands in one task —
  salting spreads it over N).
- ``latest_snapshot``: upsert/compaction semantics — keep the newest row
  per key (the batch equivalent of MERGE INTO ... WHEN MATCHED UPDATE).
- ``scd2_merge``: slowly-changing-dimension type-2 emulation without
  Delta: close out changed rows, append new versions. Expressed as
  anti-join + union + window, all shuffle-on-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across ``n_salts``
    shuffle partitions.

    Left rows get a random-ish deterministic salt (hash of a unique-ish
    row fingerprint mod n_salts); the right side is replicated once per
    salt value (explode of a literal range — cheap for dimension-sized
    rights). The join key becomes (key, salt), so one hot key occupies
    ``n_salts`` tasks instead of one.

    Only left-preserving join types are supported: the right side is
    replicated ``n_salts`` times, so right/full-outer would emit each
    unmatched right row once per salt.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — the salted right side is "
            f"replicated {n_salts}x, which duplicates unmatched right rows under "
            f"right/full joins. Use one of {sorted(allowed)}."
        )
    salt = (F.xxhash64(*[F.col(c) for c in left.columns]) % n_salts + n_salts) % n_salts
    l_salted = left.withColumn("__salt", salt.cast("int"))
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_salted.join(r_salted, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def latest_snapshot(
    df: DataFrame,
    *,
    key: str | list[str],
    order_by: list[Column],
) -> DataFrame:
    """Keep the latest row per key (upsert compaction).

    One shuffle on the key; ``row_number`` + filter fuses with
    WindowGroupLimit so each partition pre-filters before the shuffle.
    ``order_by`` must be a total order (include a unique tiebreak) for
    deterministic output.
    """
    keys = [key] if isinstance(key, str) else key
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    compare_cols: list[str],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    update_ts_col: str = "update_ts",
    open_end_value: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """SCD type-2 merge without a lakehouse MERGE INTO.

    - rows in ``dim`` whose key gets an update with changed
      ``compare_cols``: closed out (``end_col`` = update time);
    - new version rows appended, open-ended;
    - unchanged rows pass through.

    All operations are key-partitioned joins/unions — no driver loops.
    ``updates`` must contain one row per key (pre-compact with
    ``latest_snapshot`` otherwise).
    """
    upd_cols = [key, update_ts_col, *compare_cols]
    upd = updates.select(*upd_cols)

    changed_cond = F.lit(False)
    for c in compare_cols:
        changed_cond = changed_cond | ~F.col(f"d.{c}").eqNullSafe(F.col(f"u.{c}"))

    open_rows = dim.filter(F.col(end_col) == open_end_value)
    closed_rows = dim.filter(F.col(end_col) != open_end_value)

    joined = open_rows.alias("d").join(upd.alias("u"), on=key, how="left")
    unchanged = joined.filter(F.col(f"u.{update_ts_col}").isNull() | ~changed_cond).select("d.*")
    closed_out = (
        joined.filter(F.col(f"u.{update_ts_col}").isNotNull() & changed_cond)
        .select("d.*", F.col(f"u.{update_ts_col}").alias("__close_ts"))
        .withColumn(end_col, F.col("__close_ts"))
        .drop("__close_ts")
    )
    # New versions take the updated compare_cols from the update row and
    # every other dim attribute (surrogate keys, non-tracked columns)
    # from the matched open row, so arbitrary dim schemas round-trip.
    passthrough = [
        c
        for c in dim.columns
        if c not in {key, effective_col, end_col, *compare_cols}
    ]
    new_versions = (
        joined.filter(F.col(f"u.{update_ts_col}").isNotNull() & changed_cond)
        .select(
            F.col(f"d.{key}").alias(key),
            *[F.col(f"d.{c}").alias(c) for c in passthrough],
            *[F.col(f"u.{c}").alias(c) for c in compare_cols],
            F.col(f"u.{update_ts_col}").alias(effective_col),
            F.lit(open_end_value).alias(end_col),
        )
    )
    base_cols = dim.columns
    return (
        closed_rows.select(*base_cols)
        .unionByName(unchanged.select(*base_cols))
        .unionByName(closed_out.select(*base_cols))
        .unionByName(new_versions.select(*base_cols))
    )
