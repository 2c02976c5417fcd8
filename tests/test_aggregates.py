"""Exact vs approximate keyed aggregates: the sketch paths must land
within their advertised error of the exact twins, and their plans must
keep map-side partial aggregation (the scale property they exist for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logagent_spark.operators.aggregates import (
    distinct_by_key,
    percentiles_by_key,
)

SF = "/root/testdata/sf0.01"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_exact_percentiles_shape(spark):
    out = percentiles_by_key(
        _events(spark), "event_type", "value", [0.5, 0.95]
    )
    assert set(out.columns) == {"event_type", "p50", "p95"}
    rows = out.collect()
    assert all(r["p50"] <= r["p95"] for r in rows)


def test_approx_percentiles_within_rank_error(spark):
    """GK guarantee: rank error <= group_rows / accuracy. Check the
    approx p50/p95 against exact quantiles at q +- the implied rank
    tolerance (2x slack for interpolation differences: exact is
    continuous, the sketch returns an observed value)."""
    ev = _events(spark)
    accuracy = 1000
    sizes = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type").count()
             .withColumnRenamed("count", "n").collect()}
    approx = {r["event_type"]: r for r in percentiles_by_key(
        ev, "event_type", "value", [0.5, 0.95],
        exact=False, accuracy=accuracy).collect()}
    for q, col in ((0.5, "p50"), (0.95, "p95")):
        for et, n in sizes.items():
            eps = 2.0 / accuracy  # rank tolerance as a quantile delta
            lo_q, hi_q = max(q - eps, 0.0), min(q + eps, 1.0)
            lo, hi = ev.filter(F.col("event_type") == et).select(
                F.percentile("value", F.lit(lo_q)),
                F.percentile("value", F.lit(hi_q)),
            ).first()
            assert lo <= approx[et][col] <= hi, (et, col)


def test_approx_distinct_within_rsd(spark):
    ev = _events(spark)
    exact = {r["event_type"]: r["n_distinct"] for r in distinct_by_key(
        ev, "event_type", "user_id").collect()}
    approx = {r["event_type"]: r["n_distinct"] for r in distinct_by_key(
        ev, "event_type", "user_id", exact=False, rsd=0.02).collect()}
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(4 * 0.02 * n, 2), (et, n, approx[et])


def test_sketch_plans_keep_partial_aggregation(spark):
    """Both sketches must compile to the partial/final HashAggregate or
    ObjectHashAggregate pair around ONE exchange — constant-size buffers
    merging map-side, the reason they scale."""
    ev = _events(spark)
    for frame in (
        percentiles_by_key(ev, "event_type", "value", [0.5], exact=False),
        distinct_by_key(ev, "event_type", "user_id", exact=False),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        n_aggs = plan.count("HashAggregate")  # matches ObjectHashAggregate too
        assert n_aggs >= 2, plan[:800]
        assert plan.count("Exchange") == 1, plan[:800]
