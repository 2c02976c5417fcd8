"""Gap-based sessionization: boundary semantics (gap == gap_s stays
in-session), per-key independence, stats aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from logagent_spark.operators.sessions import session_stats, sessionize


def _ev(spark):
    rows = [
        # user 1: two sessions (gap 100 > 60 splits); gap == 60 stays
        (1, 0.0, 10), (1, 60.0, 11), (1, 160.0, 12), (1, 161.0, 13),
        # user 2: one event
        (2, 5.0, 20),
    ]
    return spark.createDataFrame(
        rows, "uid long, sec double, eid long"
    ).select("uid", F.timestamp_seconds("sec").alias("ts"), "eid")


def test_sessionize_boundaries(spark):
    out = {
        r["eid"]: r["session_n"]
        for r in sessionize(
            _ev(spark), "uid", "ts", gap_s=60.0, order_cols=["ts", "eid"]
        ).collect()
    }
    assert out[10] == 1 and out[11] == 1       # gap == 60 stays
    assert out[12] == 2 and out[13] == 2       # gap 100 splits
    assert out[20] == 1


def test_session_stats(spark):
    got = {
        (r["uid"], r["session_n"]): (r["n_events"], r["duration_us"])
        for r in session_stats(
            _ev(spark), "uid", "ts", gap_s=60.0, order_cols=["ts", "eid"]
        ).collect()
    }
    assert got[(1, 1)] == (2, 60_000_000)
    assert got[(1, 2)] == (2, 1_000_000)
    assert got[(2, 1)] == (1, 0)
