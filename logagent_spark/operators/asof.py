"""As-of (nearest-preceding) join — the time-series enrich operator
Spark's join zoo lacks (DuckDB/kdb/pandas `ASOF JOIN`): each left row
picks the right row with the greatest right-ts <= left-ts per key.

Spark-first implementation: the classic union-and-carry trick instead of
a range join —

  * tag both inputs and UNION them (no join at all);
  * ONE window per key ordered by (ts, side) with `last(col,
    ignorenulls=True)` carrying the most recent right-side values
    forward;
  * keep the left rows.

Cost: one shuffle of (left + right) skinny rows on the key — versus a
range-join's O(left × right-per-key) explosion or a per-key sort-merge
with custom comparators. Right rows at ts == left ts DO match
(sort puts side=0 first). At 10^12 rows the same skew note as
sessionization applies: the window sorts within a key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Left rows + `value_cols` from the nearest right row with
    right_ts <= left_ts (NULLs when no right row precedes). `right`
    must have at most one row per (key, right_ts) — pre-aggregate
    duplicates or the carried value is ambiguous."""
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
    ).withColumn("_asof_ts", F.col(left_ts))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # align schemas for the union: right contributes NULL left columns
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    order = ["_asof_ts", _SIDE, *(order_cols or [])]
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col(_SIDE) == 1).select(*lcols, *value_cols)
