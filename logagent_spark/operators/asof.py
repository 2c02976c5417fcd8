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
from pyspark.sql import types as T

_SIDE = "_asof_side"
_CARRY = "_asof_carry"


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
    duplicates or the carried value is ambiguous.

    The carry is ONE struct of all value columns, not per-column
    `last(ignorenulls)`: the struct is non-NULL for every right row even
    when its fields are NULL, so the carried values are exactly the
    nearest right ROW's — a legitimate NULL in the matched snapshot
    survives instead of being skipped for an older snapshot's value
    (which would diverge from a true as-of join)."""
    return _asof_join(
        left, right, key=key, left_ts=left_ts, right_ts=right_ts,
        value_cols=value_cols, order_cols=order_cols,
        direction="backward",
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Mirror of `asof_join_backward`: nearest right row with
    right_ts >= left_ts (the "next snapshot" join — e.g. attach the next
    deploy/config change after each event). Same union-and-carry plan
    with the window order REVERSED (ts desc), so the cost is identical:
    one shuffle of skinny rows on the key, no range-join explosion."""
    return _asof_join(
        left, right, key=key, left_ts=left_ts, right_ts=right_ts,
        value_cols=value_cols, order_cols=order_cols,
        direction="forward",
    )


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    order_cols: list[str] | None,
    direction: str,
) -> DataFrame:
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join_{direction}: value_cols {clash} collide with "
            "left columns — rename before joining"
        )
    lcols = left.columns
    carry_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        *lcols,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(carry_t).alias(_CARRY),
    ).withColumn("_asof_ts", F.col(left_ts))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias(_CARRY),
    )
    # align schemas for the union: right contributes NULL left columns
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # either direction keeps rights-at-equal-ts BEFORE the left rows
    # (side asc after the ts sort), so an exactly-matching snapshot
    # always matches
    ts_first = (
        F.col("_asof_ts").asc() if direction == "backward"
        else F.col("_asof_ts").desc()
    )
    order = [ts_first, F.col(_SIDE).asc(),
             *[F.col(c).asc() for c in (order_cols or [])]]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(F.col(_CARRY), ignorenulls=True).over(w).alias("_matched"),
    )
    return carried.filter(F.col(_SIDE) == 1).select(
        *lcols,
        *[F.col("_matched")[c].alias(c) for c in value_cols],
    )
