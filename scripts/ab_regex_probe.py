"""Interleaved A/B: one-scan regex probe (regexp_substr + \\A-anchored
group extracts) vs classic rlike + in-place per-group extracts.

Same session, fresh plan per run, alternating A/B per the repo's
contention protocol (CLAUDE.md: cross-invocation comparisons invalid).
Run with nothing else on the machine.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from logagent_spark.config import PipelineSpec  # noqa: E402
from logagent_spark.operators import parsers as P  # noqa: E402
from logagent_spark.plans.pipeline import CompiledPipeline  # noqa: E402
from logagent_spark.sources import from_pages  # noqa: E402

N_ROWS = int(os.environ.get("AB_ROWS", "4000000"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

spark = bench._session(32)
pages = bench.ensure_pages(spark, N_ROWS)
df = from_pages(spark.read.parquet(pages))

spec_parse = PipelineSpec.from_dict(
    {"Parser": bench.PIPELINE_SPEC["Parser"]}, name="parse_only"
)
dict_spec = PipelineSpec.from_dict(
    {"Parser": {"Mode": "grok", "Patterns": {
        "logline": bench.PIPELINE_SPEC["Parser"]["Regex"],
        "kv": r"(?P<key>[a-z_]+)=(?P<val>\S+)",
        "head": r"^(?P<first>\S+)",
    }}},
    name="dict",
)

_real = P._rescan_safe


def run_parse() -> float:
    t = time.monotonic()
    CompiledPipeline(spec_parse).transform(df).frame.filter(
        F.col("levelname").isNotNull()
    ).count()
    return time.monotonic() - t


def run_dict() -> float:
    t = time.monotonic()
    CompiledPipeline(dict_spec).transform(df).frame.filter(
        F.col("grok_pattern").isNotNull()
    ).count()
    return time.monotonic() - t


# warm the scan cache once outside the clock
df.count()

for label, fn in [("parse_only", run_parse), ("dict_native", run_dict)]:
    probe_t, classic_t = [], []
    for _ in range(ROUNDS):
        P._rescan_safe = _real
        probe_t.append(fn())
        P._rescan_safe = lambda _: False
        classic_t.append(fn())
    P._rescan_safe = _real
    print(f"{label}: probe={[round(x, 2) for x in probe_t]} "
          f"classic={[round(x, 2) for x in classic_t]} "
          f"best probe={min(probe_t):.2f}s classic={min(classic_t):.2f}s "
          f"ratio={min(classic_t) / min(probe_t):.2f}x")

spark.stop()
