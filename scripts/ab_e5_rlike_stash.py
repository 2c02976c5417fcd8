"""Interleaved A/B: does stashing the regex match flag in a real column
(one guaranteed rlike evaluation) beat the inline form that relies on
codegen subexpression elimination across projection outputs?"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from logagent_spark.sources import from_pages  # noqa: E402

ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
JPAT = (r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})"
        r" - ([A-Z]+) - ([^\n]*)")
GROUPS = {"ts": 1, "levelname": 2, "body": 3}


def main():
    spark = bench._session(32)
    pages = bench.ensure_pages(spark, 4_000_000)
    df = from_pages(spark.read.parquet(pages))
    df.count()
    msg = F.col("message")

    def inline():
        out = df
        m = msg.rlike(JPAT)
        for name, idx in GROUPS.items():
            out = out.withColumn(
                name, F.when(m, F.regexp_extract(msg, JPAT, idx))
            )
        out.filter(F.col("ts").isNotNull()).count()

    def stashed():
        out = df.withColumn("_m", msg.rlike(JPAT))
        for name, idx in GROUPS.items():
            out = out.withColumn(
                name,
                F.when(F.col("_m"), F.regexp_extract(msg, JPAT, idx)),
            )
        out.drop("_m").filter(F.col("ts").isNotNull()).count()

    def probe_once():
        # group-0 extract stash, anchored extracts over the short match
        out = df.withColumn("_m0", F.regexp_extract(msg, JPAT, 0))
        short = F.col("_m0")
        apat = "^" + JPAT
        for name, idx in GROUPS.items():
            out = out.withColumn(
                name,
                F.when(short != "", F.regexp_extract(short, apat, idx)),
            )
        out.drop("_m0").filter(F.col("ts").isNotNull()).count()

    for label, a_fn, b_fn in [("stash_vs_inline", stashed, inline),
                              ("probe_vs_inline", probe_once, inline)]:
        a_t, b_t = [], []
        for _ in range(ROUNDS):
            t = time.monotonic(); a_fn()
            a_t.append(time.monotonic() - t)
            t = time.monotonic(); b_fn()
            b_t.append(time.monotonic() - t)
        print(f"{label}: A={[round(x,2) for x in a_t]} "
              f"B={[round(x,2) for x in b_t]} "
              f"best A={min(a_t):.2f}s B={min(b_t):.2f}s "
              f"B/A={min(b_t)/min(a_t):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
