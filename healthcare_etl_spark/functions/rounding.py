"""Cross-engine-stable rounding.

``round(x, d)`` is implementation-defined at half-boundaries: Spark
converts the double to exact BigDecimal then HALF_UP; DuckDB computes
``std::round(x * 10^d) / 10^d``. For values derived from small-integer
ratios (Jaccard, quality scores) the two can disagree by one final
digit. ``stable_round`` uses the multiply-round-divide form explicitly,
and the oracle SQL mirrors it textually — both engines then execute the
identical IEEE operation sequence, so outputs are bit-equal whenever the
inputs are.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column | str, digits: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.round(c * scale) / scale


def stable_round_sql(expr: str, digits: int = 6) -> str:
    scale = float(10**digits)
    return f"(round(({expr}) * {scale}) / {scale})"
