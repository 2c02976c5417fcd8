"""Isolate the band-KEY stage at lsh_scale: keys + groupBy count only
(no scoring), new Arrow pass vs expr folds, interleaved."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench
from pyspark.sql import functions as F
from logagent_spark.operators import dedup as dd

spark = bench._session(32)
pages = bench.ensure_pages(spark, 4_000_000)
dim = 16
df = (
    spark.read.parquet(pages)
    .filter(F.crc32(F.col("url")) % 40 == 0)
    .withColumn("_h", F.md5("text"))
    .select(
        F.col("url").alias("vec_id"),
        F.array(*[
            (F.conv(F.substring("_h", 1 + i * 2, 2), 16, 10)
             .cast("int") - 128).cast("double")
            for i in range(dim)
        ]).alias("embedding"),
    )
)
n = df.count()
cfg = dd.suggest_lsh_config(0.9, n=n, max_cand_frac=0.004)
print("n =", n, "cfg =", cfg, flush=True)
planes = dd.seeded_planes(cfg["n_planes"], dim, 42)
chunks = dd.plane_chunks(cfg["n_planes"], cfg["n_chunks"])


def new_keys():
    return dd._hyperplane_band_keys_pandas(df, "vec_id", "embedding", planes, chunks)


def old_keys():
    bits = dd.hyperplane_bits(F.col("embedding"), planes)
    chunk_keys = []
    for c, idxs in enumerate(chunks):
        key = F.lit(0)
        for i in idxs:
            key = key * 2 + bits[i]
        chunk_keys.append(F.struct(F.lit(c).alias("band"), key.alias("key")))
    return df.select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("_e"),
        F.explode(F.array(*chunk_keys)).alias("_bk"),
    ).select("_id", "_e", "_bk.band", "_bk.key")


def run(mk):
    t = time.monotonic()
    # groupBy count forces the exchange like the scorer does, without Python scoring
    mk().groupBy("band", "key").agg(F.count(F.lit(1)).alias("n")) \
        .write.format("noop").mode("overwrite").save()
    return time.monotonic() - t


for r in range(3):
    tn = run(new_keys)
    to = run(old_keys)
    print(f"round {r}: new={tn:.2f}s old={to:.2f}s old/new={to/tn:.2f}x", flush=True)
spark.stop()
