"""Interleaved A/B for the r7 embedding-pair scoring change: per-bucket
Arrow/numpy (new default) vs skinny-pair join + interpreted HOF fold
(the r6 'expr' strategy), on the bench's own lsh_scale_100k workload
and on the registry embedding_near_dup gate shape."""
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
import logagent_spark.queries as q  # noqa: E402
from logagent_spark.operators import dedup as dd  # noqa: E402

ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))
_orig = dd.embedding_candidate_pairs


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
            dd.embedding_candidate_pairs = _orig
            t = time.monotonic(); r = fn()
            new_t.append(r if r is not None else time.monotonic() - t)
            dd.embedding_candidate_pairs = functools.partial(
                _orig, strategy="expr"
            )
            t = time.monotonic(); r = fn()
            old_t.append(r if r is not None else time.monotonic() - t)
            dd.embedding_candidate_pairs = _orig
        print(f"{label}: new={[round(x,2) for x in new_t]} "
              f"old={[round(x,2) for x in old_t]} "
              f"best new={min(new_t):.2f}s old={min(old_t):.2f}s "
              f"old/new={min(old_t)/min(new_t):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
