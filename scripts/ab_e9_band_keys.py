"""Interleaved A/B for the r7 band-key change: Arrow/numpy band keys
(_hyperplane_band_keys_pandas, new) vs n_planes interpreted
zip_with/aggregate folds per row (the prior expr keys), with the
per-bucket pandas scorer IDENTICAL in both arms — isolates the key
computation. Workloads: the bench's lsh_scale_100k and the registry
embedding_near_dup gate shape."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
import logagent_spark.queries as q  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from logagent_spark.operators import dedup as dd  # noqa: E402

ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))
_new = dd._hyperplane_band_keys_pandas


def _expr_keys(df, id_col, emb_col, planes, chunks):
    """The pre-r7 key path: interpreted HOF fold per plane + explode."""
    bits = dd.hyperplane_bits(F.col(emb_col), planes)
    chunk_keys = []
    for c, idxs in enumerate(chunks):
        key = F.lit(0)
        for i in idxs:
            key = key * 2 + bits[i]
        chunk_keys.append(F.struct(F.lit(c).alias("band"), key.alias("key")))
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_e"),
        F.explode(F.array(*chunk_keys)).alias("_bk"),
    ).select("_id", "_e", "_bk.band", "_bk.key")


def main():
    spark = bench._session(32)
    pages = bench.ensure_pages(spark, 4_000_000)

    def near_dup_gate():
        q.q_embedding_near_dup(spark, "/root/testdata/sf0.1").count()

    def scale100k():
        return bench.lsh_scale_100k(spark, pages)["sec"]

    for label, fn in [("embedding_near_dup", near_dup_gate),
                      ("lsh_scale_100k", scale100k)]:
        new_t, old_t = [], []
        for _ in range(ROUNDS):
            dd._hyperplane_band_keys_pandas = _new
            t = time.monotonic(); r = fn()
            new_t.append(r if r is not None else time.monotonic() - t)
            dd._hyperplane_band_keys_pandas = _expr_keys
            t = time.monotonic(); r = fn()
            old_t.append(r if r is not None else time.monotonic() - t)
            dd._hyperplane_band_keys_pandas = _new
        print(f"{label}: new={[round(x,2) for x in new_t]} "
              f"old={[round(x,2) for x in old_t]} "
              f"best new={min(new_t):.2f}s old={min(old_t):.2f}s "
              f"old/new={min(old_t)/min(new_t):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
