"""Host-capacity probe (r7): pure-CPU scaling local[8] vs local[32].

64M md5 hashes, no shuffle, no commit, no Python boundary - if THIS
doesn't scale 4x from 8 to 32 vCPUs, no Spark plan can; the scaling-
efficiency number measures hypervisor tenancy in such windows.
Measured 2026-08-22 interleaved with the mid-round bench window:
local[32] 1.32s vs local[8] 2.89s = 2.2x (efficiency 0.55).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import bench
from pyspark.sql import functions as F

for par in (32, 8, 32, 8):
    spark = bench._session(par)
    # pure CPU: 64M md5 hashes, no IO, no shuffle beyond 1-row agg
    df = spark.range(64_000_000, numPartitions=par * 3)
    t0 = time.monotonic()
    df.select(F.md5(F.col("id").cast("string")).alias("h")) \
      .select(F.max("h")).collect()
    print(f"local[{par}] cpu_md5={time.monotonic()-t0:.2f}s", flush=True)
    spark.stop()
