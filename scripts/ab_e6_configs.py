"""Config A/B in ONE JIT-warm JVM (the bench's own session-recreate
protocol): (1) parquet zstd level 1 vs default 3 on the headline
multiplex write; (2) Arrow maxRecordsPerBatch 40k vs default 10k on the
grok-dict pandas UDF."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from logagent_spark.config import PipelineSpec  # noqa: E402
from logagent_spark.plans.pipeline import CompiledPipeline  # noqa: E402
from logagent_spark.sources import from_pages  # noqa: E402

ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def session(extra):
    from logagent_spark.session import get_spark

    return get_spark(
        "ab_conf", parallelism=32, shuffle_partitions=32,
        extra={
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g"),
            **extra,
        },
    )


def headline(spark):
    pages = bench.ensure_pages(spark, 4_000_000)
    out_dir = os.path.join(bench.CACHE, "out_ab_conf")
    import shutil

    df = from_pages(spark.read.parquet(pages))
    spec = PipelineSpec.from_dict(bench.PIPELINE_SPEC, name="ab")
    pipe = CompiledPipeline(spec)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    out = pipe.multiplexed(pipe.transform(df), keep=["url", "lang", "warc_ts"])
    out = out.coalesce(2 * spark.sparkContext.defaultParallelism)
    out.write.mode("overwrite").partitionBy("sink").parquet(out_dir)
    sec = time.monotonic() - t0
    import subprocess

    du = subprocess.run(["du", "-sm", out_dir], capture_output=True,
                        text=True).stdout.split()[0]
    return sec, int(du)


def dict_udf(spark):
    pages = bench.ensure_pages(spark, 4_000_000)
    df = from_pages(spark.read.parquet(pages))
    dict_spec = PipelineSpec.from_dict(
        {"Parser": {"Mode": "grok", "Patterns": {
            "logline": bench.PIPELINE_SPEC["Parser"]["Regex"],
            "kv": r"(?P<key>[a-z_]+)=(?P<val>\S+)",
            "head": r"^(?P<first>\S+)",
        }}},
        name="dict",
    )
    pipe = CompiledPipeline(dict_spec, regex_strategy="grok")
    pipe.transform(df.sample(0.002, seed=1)).frame.count()  # fork workers
    t0 = time.monotonic()
    pipe.transform(df).frame.filter(
        F.col("grok_pattern").isNotNull()).count()
    return time.monotonic() - t0, 0


EXPERIMENTS = {
    "zstd1_write": (
        headline,
        {"spark.hadoop.parquet.compression.codec.zstd.level": "1"},
    ),
    "arrow40k_dictudf": (
        dict_udf,
        {"spark.sql.execution.arrow.maxRecordsPerBatch": "40000"},
    ),
}


def main():
    which = sys.argv[1:] or list(EXPERIMENTS)
    for name in which:
        fn, conf = EXPERIMENTS[name]
        a_t, b_t = [], []
        a_x = b_x = None
        for _ in range(ROUNDS):
            s = session(conf)
            r = fn(s); a_t.append(r[0]); a_x = r[1]
            s.stop()
            s = session({})
            r = fn(s); b_t.append(r[0]); b_x = r[1]
            s.stop()
        print(f"{name}: conf={[round(x,2) for x in a_t]} "
              f"default={[round(x,2) for x in b_t]} "
              f"best conf={min(a_t):.2f}s default={min(b_t):.2f}s "
              f"default/conf={min(b_t)/min(a_t):.2f}x "
              f"size conf={a_x}MB default={b_x}MB", flush=True)


if __name__ == "__main__":
    main()
