"""Round-7 profiling harness: dissect the heavy operator rows.

For each picked query: time BUILD (queries fn call, includes any eager
actions) and EXECUTE (count / noop) separately, twice, in one session —
the split says whether a row's cost is driver-side planning/eager work
or executor compute. Optionally dump .explain("formatted") to
plans/r07/.

Run with nothing else on the machine.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
import logagent_spark.queries as q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PICKS = [
    "text_dup_windows", "text_excise_windows", "dedup_minhash_pairs",
    "fingerprint_minshingle", "embedding_near_dup", "dedup_cluster_keep",
    "curation_pipeline", "rate_limit_admit", "dedup_simhash_pairs",
    "knn_join_ivf", "agg_distinct_salted", "dedup_exact_keep",
]
VALUE_MATERIALIZE = {"text_dup_windows", "text_excise_windows"}


def main():
    spark = bench._session(32)
    fns = dict(q.queries())
    fns.update({
        "dedup_exact_stats": q.q_dedup_exact_stats,
        "dedup_exact_keep": q.q_dedup_exact_keep,
        "similarity_topk": q.q_similarity_topk,
        "ann_ivf_topk": q.q_ann_ivf_topk,
    })
    picks = sys.argv[1:] or PICKS
    # warm the UDF worker pool + scan cache
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for name in picks:
        for i in range(2):
            t0 = time.monotonic()
            df = fns[name](spark, SF_DIR)
            t_build = time.monotonic() - t0
            t0 = time.monotonic()
            if name in VALUE_MATERIALIZE:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t_exec = time.monotonic() - t0
            print(f"{name} run{i}: build={t_build:.2f}s exec={t_exec:.2f}s "
                  f"total={t_build + t_exec:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
