"""Interleaved A/B for the r7 connected-components small-graph change
(collect raw pairs; no union+distinct shuffle before union-find)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import bench  # noqa: E402
import logagent_spark.queries as q  # noqa: E402
from logagent_spark.operators import dedup as dd  # noqa: E402

SF = "/root/testdata/sf0.1"
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
_new_cc = dd.connected_components


def old_cc(pairs, max_iters=50, small_graph_edges=200_000):
    edges = (
        pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
    ).localCheckpoint(eager=True)
    assert edges.count() <= 2 * small_graph_edges
    spark = pairs.sparkSession
    comp = dd._union_find_components(
        [(r["x"], r["y"]) for r in edges.collect()]
    )
    id_t = pairs.schema["a"].dataType
    return spark.createDataFrame(
        list(comp.items()),
        T.StructType([T.StructField("id", id_t),
                      T.StructField("component", id_t)]),
    )


def main():
    spark = bench._session(32)
    spark.read.parquet(f"{SF}/documents.parquet").count()

    def run():
        q.q_dedup_cluster_keep(spark, SF).count()

    new_t, old_t = [], []
    for _ in range(ROUNDS):
        dd.connected_components = _new_cc
        t = time.monotonic(); run(); new_t.append(time.monotonic() - t)
        dd.connected_components = old_cc
        t = time.monotonic(); run(); old_t.append(time.monotonic() - t)
        dd.connected_components = _new_cc
    print(f"dedup_cluster_keep: new={[round(x,2) for x in new_t]} "
          f"old={[round(x,2) for x in old_t]} "
          f"best new={min(new_t):.2f}s old={min(old_t):.2f}s "
          f"old/new={min(old_t)/min(new_t):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
