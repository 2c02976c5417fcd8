"""Keyed aggregate helpers with explicit exact/approximate scale paths.

The reference's counters are exact (per-handler ints, handler.go); the
analytics layer adds percentiles and distinct counts, where "exact" has
a real distributed cost: `percentile` buffers every value per group and
`countDistinct` doubles the shuffle (expand per distinct column). These
helpers pair each exact form with the sketch it swaps to at 10^12 rows:

* percentiles — `approx_percentile` (Greenwald-Khanna): mergeable
  fixed-size sketch per group, rank error <= n / accuracy. The exact
  twin is the oracle in tests; at corpus scale you pick `accuracy` from
  the rank tolerance you can live with, not from memory pressure.
* distinct counts — `approx_count_distinct` (HyperLogLog++): fixed
  ~1.04/sqrt(2^p) relative standard deviation per group, one
  constant-size buffer per group instead of a distinct-expanded
  shuffle. The exact twin (plain or salted two-phase, plans/skew.py)
  stays the verify pass.

Both sketches aggregate map-side like any other HashAggregate pair, so
their shuffle volume is group-cardinality-sized — the property the
exact forms lose at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["percentiles_by_key", "distinct_by_key"]


def percentiles_by_key(
    df: DataFrame,
    key: str,
    value_col: str,
    qs: "list[float]",
    *,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """-> (key, p<q> ...) with one column per requested quantile.

    exact=True buffers each group's values (fine to ~10^7 rows/group);
    exact=False uses the GK sketch: rank error <= group_rows/accuracy,
    memory O(accuracy) per group regardless of group size."""
    if exact:
        aggs = [
            F.percentile(value_col, F.lit(q)).alias(_qname(q)) for q in qs
        ]
    else:
        aggs = [
            F.percentile_approx(
                value_col, F.lit(q), F.lit(accuracy)
            ).alias(_qname(q))
            for q in qs
        ]
    return df.groupBy(key).agg(*aggs)


def _qname(q: float) -> str:
    return "p" + str(q).replace("0.", "").ljust(2, "0")


def distinct_by_key(
    df: DataFrame,
    key: str,
    value_col: str,
    *,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """-> (key, n_distinct). exact=False swaps to HyperLogLog++ with
    relative standard deviation `rsd` — constant memory per group, no
    distinct-expand in the shuffle."""
    agg = (
        F.countDistinct(value_col)
        if exact
        else F.approx_count_distinct(value_col, rsd)
    )
    return df.groupBy(key).agg(agg.alias("n_distinct"))
