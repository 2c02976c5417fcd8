"""Gap-based sessionization — the standard event-log analytics operator
the reference's per-handler counters stop short of (SURVEY.md §2.7 lists
aggregation as the mandated extension layer).

A session = a maximal run of one key's events with inter-event gaps <=
`gap_s`. Spark-first shape: one window over (key, event-time) — `lag`
marks session starts, a running `sum` numbers them; no UDF, no
self-join. The single shuffle is the window's partitioning on the key;
at 10^12 rows that is the minimum any session semantics needs (events of
one key must meet). Hot keys: the window sorts within a key — for a
Zipf-hot key prefer bucketing the input by key at ingest so the sort is
a local spill-merge, or sessionize per day-partition when the gap allows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_s: float,
    order_cols: list[str] | None = None,
    session_col: str = "session_n",
) -> DataFrame:
    """Append `session_n`: 1-based session number per key (ordered by
    event time; pass order_cols for a deterministic tie-break). A new
    session starts when the gap from the previous event EXCEEDS gap_s
    (gap == gap_s stays in-session)."""
    order = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    # NTZ timestamps don't cast to double directly (Spark 4); micros/1e6
    # mirrors the oracle's epoch_us(ts)/1000000.0 bit-for-bit (session
    # timezone is UTC, so the NTZ->LTZ cast is the identity)
    t = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1000000.0
    prev = F.lag(t).over(w)
    new_sess: Column = (
        prev.isNull() | ((t - prev) > F.lit(float(gap_s)))
    ).cast("long")
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_sess).over(running))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_s: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """(key, session_n, n_events, duration_us) per session. Duration in
    exact integer microseconds (engine-portable hashing)."""
    s = sessionize(df, key_col, ts_col, gap_s=gap_s, order_cols=order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))  # exact int micros
    return s.groupBy(key_col, "session_n").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )
