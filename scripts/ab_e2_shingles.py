"""Interleaved A/B for the r7 shingle change: tokens re-derived k+1
times inside the zip chain (old, reproduced inline) vs tokens
materialized once in a prior projection (new, the shipped code).
Workload = the boilerplate census corpus the prefilter bench uses."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from logagent_spark.operators import textstats as ts  # noqa: E402

ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def shingles_old(col, k=5):
    def tokens(c):
        return F.filter(F.split(c, " +"), lambda t: t != F.lit(""))

    toks = tokens(col)
    acc = toks
    for j in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(tokens(col), j + 1, 2147483647 - k),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    full = F.filter(acc, lambda s: s.isNotNull())
    return F.when(F.size(toks) >= k, full).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def main():
    spark = bench._session(32)
    path, n_docs = bench._ensure_boiler_corpus(spark)
    docs = spark.read.parquet(path).filter(F.col("doc_id") % 3 == 0)
    docs.count()  # warm page cache
    print(f"n_docs={n_docs}//3", flush=True)

    def old_explode():
        docs.select(
            "doc_id", F.explode(shingles_old(F.col("text"), 5)).alias("_s")
        ).write.format("noop").mode("overwrite").save()

    def new_explode():
        docs.select(
            "doc_id", ts.tokens(F.col("text")).alias("_tk")
        ).select(
            "doc_id",
            F.explode(ts.shingles_from_tokens(F.col("_tk"), 5)).alias("_s"),
        ).write.format("noop").mode("overwrite").save()

    def old_sig():
        from logagent_spark.operators.dedup import (
            minhash_signature_from_shingles,
        )

        docs.select(
            "doc_id",
            minhash_signature_from_shingles(
                shingles_old(F.col("text"), 5), 32
            ).alias("_sig"),
        ).write.format("noop").mode("overwrite").save()

    def new_sig():
        from logagent_spark.operators.dedup import (
            minhash_signature_from_shingles,
        )

        docs.select(
            "doc_id", ts.tokens(F.col("text")).alias("_tk")
        ).select(
            "doc_id",
            minhash_signature_from_shingles(
                ts.shingles_from_tokens(F.col("_tk"), 5), 32
            ).alias("_sig"),
        ).write.format("noop").mode("overwrite").save()

    for label, new_fn, old_fn in [
        ("shingle_explode", new_explode, old_explode),
        ("minhash_sig", new_sig, old_sig),
    ]:
        new_t, old_t = [], []
        for _ in range(ROUNDS):
            t = time.monotonic(); new_fn()
            new_t.append(time.monotonic() - t)
            t = time.monotonic(); old_fn()
            old_t.append(time.monotonic() - t)
        print(f"{label}: new={[round(x,2) for x in new_t]} "
              f"old={[round(x,2) for x in old_t]} "
              f"best new={min(new_t):.2f}s old={min(old_t):.2f}s "
              f"old/new={min(old_t)/min(new_t):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
