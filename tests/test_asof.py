"""As-of join: tie semantics (right row at equal ts matches), NULL when
no preceding right row, per-key isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from logagent_spark.operators.asof import asof_join_backward


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("a", 5.0, 1), ("a", 10.0, 2), ("a", 15.0, 3),
         ("b", 10.0, 4), ("c", 1.0, 5)],
        "k string, sec double, lid long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("a", 10.0, 100.0), ("a", 12.0, 120.0), ("b", 3.0, 30.0)],
        "k string, rsec double, v double",
    ).select("k", F.timestamp_seconds("rsec").alias("rts"), "v")

    out = {
        r["lid"]: r["v"]
        for r in asof_join_backward(
            left, right, key="k", left_ts="ts", right_ts="rts",
            value_cols=["v"], order_cols=["lid"],
        ).collect()
    }
    assert out[1] is None          # nothing precedes t=5
    assert out[2] == 100.0         # equal ts matches (>= semantics)
    assert out[3] == 120.0         # nearest preceding, not first
    assert out[4] == 30.0          # per-key isolation
    assert out[5] is None          # key with no right rows at all
    assert len(out) == 5           # every left row survives (left join)


def test_asof_null_in_matched_row_survives(spark):
    """A legitimate NULL in the NEAREST right row's value column must be
    carried as NULL — not skipped for an older snapshot's value (the
    ignorenulls-per-column trap)."""
    left = spark.createDataFrame(
        [("a", 20.0, 1)], "k string, sec double, lid long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("a", 5.0, 50.0, "old"), ("a", 15.0, None, "new")],
        "k string, rsec double, v double, tag string",
    ).select("k", F.timestamp_seconds("rsec").alias("rts"), "v", "tag")

    row = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        value_cols=["v", "tag"],
    ).collect()[0]
    assert row["tag"] == "new"     # matched the nearest snapshot...
    assert row["v"] is None        # ...and kept ITS null, not old's 50.0


def test_asof_value_col_collision_raises(spark):
    import pytest

    left = spark.createDataFrame([("a", 1.0, 9.0)],
                                 "k string, ts double, v double")
    right = spark.createDataFrame([("a", 0.5, 1.0)],
                                  "k string, rts double, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join_backward(left, right, key="k", left_ts="ts",
                           right_ts="rts", value_cols=["v"])


def test_asof_forward_semantics(spark):
    """Forward mirror: nearest FOLLOWING right row; equal ts matches;
    NULL when nothing follows; per-key isolation."""
    from logagent_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [("a", 5.0, 1), ("a", 10.0, 2), ("a", 15.0, 3),
         ("b", 1.0, 4), ("c", 9.0, 5)],
        "k string, sec double, lid long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("a", 10.0, 100.0), ("a", 12.0, 120.0), ("b", 3.0, 30.0)],
        "k string, rsec double, v double",
    ).select("k", F.timestamp_seconds("rsec").alias("rts"), "v")

    out = {r["lid"]: r["v"] for r in asof_join_forward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        value_cols=["v"], order_cols=["lid"]).collect()}
    assert out[1] == 100.0         # nearest following, not farthest
    assert out[2] == 100.0         # equal ts matches (<= semantics)
    assert out[3] is None          # nothing follows t=15
    assert out[4] == 30.0          # per-key isolation
    assert out[5] is None          # key with no right rows
    assert len(out) == 5
