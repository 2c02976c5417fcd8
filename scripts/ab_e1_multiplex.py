"""Interleaved A/B for the r7 multiplex change: rendered-in-struct
(old, reproduced here as a subclass) vs rendered-after-explode (new,
the shipped code). Same session, fresh plan per run, alternating."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import bench  # noqa: E402
from logagent_spark.config import PipelineSpec  # noqa: E402
from logagent_spark.operators.template import compile_template  # noqa: E402
from logagent_spark.operators.validators import compile_gate  # noqa: E402
from logagent_spark.plans.pipeline import (  # noqa: E402
    DEAD_SINK,
    DROP_COL,
    RENDERED_COL,
    SINK_COL,
    CompiledPipeline,
)
from logagent_spark.sources import from_pages  # noqa: E402

ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


class OldPipeline(CompiledPipeline):
    """Pre-r7 multiplex: rendered computed inside the sink structs."""

    def _sink_structs(self, schema):
        structs = []
        for i, h in enumerate(self.spec.handlers):
            gate = compile_gate(
                h.validators, schema,
                attrs_col=self.spec.parser.attrs or None,
            )
            if h.mode == "database":
                rendered = F.lit(None).cast(T.StringType())
            else:
                rendered = compile_template(h.template, schema)
            structs.append(
                F.struct(
                    F.lit(h.sink_name(i)).alias(SINK_COL),
                    F.coalesce(gate, F.lit(False)).alias("_ok"),
                    rendered.alias(RENDERED_COL),
                )
            )
        return F.filter(F.array(*structs), lambda s: s["_ok"])

    def _exploded(self, result, keep, include_dead):
        schema = result.schema
        matches = self._sink_structs(schema)
        if include_dead:
            dead_struct = F.struct(
                F.lit(DEAD_SINK).alias(SINK_COL),
                F.lit(True).alias("_ok"),
                F.col(DROP_COL).alias(RENDERED_COL),
            )
            arr = F.when(
                F.col(DROP_COL).isNotNull(), F.array(dead_struct)
            ).otherwise(matches)
        else:
            arr = F.when(F.col(DROP_COL).isNull(), matches)
        cols = keep if keep is not None else list(schema)
        return (
            result.frame.withColumn("_sinks", arr)
            .select(*cols, F.explode("_sinks").alias("_s"))
            .select(
                F.col(f"_s.{SINK_COL}").alias(SINK_COL),
                F.col(f"_s.{RENDERED_COL}").alias(RENDERED_COL),
                *cols,
            )
        )


def main():
    spark = bench._session(32)
    pages = bench.ensure_pages(spark, 4_000_000)
    df = from_pages(spark.read.parquet(pages))
    spec = PipelineSpec.from_dict(bench.PIPELINE_SPEC, name="ab")
    keep = ["url", "lang", "warc_ts"]

    def route_agg(cls):
        pipe = cls(spec)
        routed = pipe.routed(pipe.transform(df), keep=keep)
        pipe.sink_counts(routed, lang_col="lang", ts_col="warc_ts").count()

    def multiplex_noop(cls):
        pipe = cls(spec)
        pipe.multiplexed(pipe.transform(df), keep=keep) \
            .write.format("noop").mode("overwrite").save()

    def full_write(cls):
        pipe = cls(spec)
        out = pipe.multiplexed(pipe.transform(df), keep=keep)
        out = out.coalesce(2 * spark.sparkContext.defaultParallelism)
        out.write.mode("overwrite").partitionBy(SINK_COL).parquet(
            "/root/repo/.bench_cache/out_ab_e1"
        )

    df.count()  # warm scan cache
    for label, fn in [("route_agg", route_agg),
                      ("multiplex_noop", multiplex_noop),
                      ("full_write", full_write)]:
        new_t, old_t = [], []
        for _ in range(ROUNDS):
            t = time.monotonic(); fn(CompiledPipeline)
            new_t.append(time.monotonic() - t)
            t = time.monotonic(); fn(OldPipeline)
            old_t.append(time.monotonic() - t)
        print(f"{label}: new={[round(x,2) for x in new_t]} "
              f"old={[round(x,2) for x in old_t]} "
              f"best new={min(new_t):.2f}s old={min(old_t):.2f}s "
              f"old/new={min(old_t)/min(new_t):.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
