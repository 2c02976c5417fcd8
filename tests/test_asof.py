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
