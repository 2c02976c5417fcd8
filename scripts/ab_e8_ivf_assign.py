"""Interleaved A/B for the r7 IVF bucket-assignment change: Arrow/numpy
sequential-fold assignment (new) vs the interpreted Column-expr argmax
(old), on the bench's knn_ivf_large_q workload (index build + join +
recall sweep, 101k corpus x 64 centroids)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from logagent_spark.operators import similarity as sim  # noqa: E402

ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))
_new_assign = sim.assign_buckets_pandas


def _old_assign(df, emb_col, centroids, out_col):
    return df.withColumn(
        out_col, sim.centroid_assignment(F.col(emb_col), centroids)
    )


def main():
    spark = bench._session(32)
    pages = bench.ensure_pages(spark, 4_000_000)
    new_t, old_t = [], []
    for _ in range(ROUNDS):
        sim.assign_buckets_pandas = _new_assign
        t = time.monotonic()
        r = bench.knn_ivf_large_q(spark, pages)
        new_t.append(time.monotonic() - t)
        print("  new index_sec", r["index_sec"], "join", r["sec"],
              {k: v["sec"] for k, v in r["recall_sweep"].items()}, flush=True)
        sim.assign_buckets_pandas = _old_assign
        t = time.monotonic()
        r = bench.knn_ivf_large_q(spark, pages)
        old_t.append(time.monotonic() - t)
        print("  old index_sec", r["index_sec"], "join", r["sec"],
              {k: v["sec"] for k, v in r["recall_sweep"].items()}, flush=True)
        sim.assign_buckets_pandas = _new_assign
    print(f"knn_ivf_large_q total: new={[round(x,1) for x in new_t]} "
          f"old={[round(x,1) for x in old_t]} "
          f"best new={min(new_t):.1f}s old={min(old_t):.1f}s "
          f"old/new={min(old_t)/min(new_t):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
