"""Resumable-restart semantics (M7): kill mid-run, resume, identical
final counts + identical sink contents vs a single-shot run."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from logagent_spark.config import PipelineSpec
from logagent_spark.datagen import WAF_REGEX, write_pages
from logagent_spark.plans.checkpoint import CheckpointedRunner
from logagent_spark.plans.pipeline import DEAD_SINK, CompiledPipeline
from logagent_spark.sources import from_pages

SPEC = {
    "Parser": {"Mode": "regex", "Regex": WAF_REGEX},
    "Rewrites": [
        {"Mode": "mapping", "Column": "lang",
         "Mapping": {"en": "english", "zh": "chinese", "de": "german",
                     "fr": "french", "es": "spanish", "ru": "russian",
                     "ja": "japanese"}},   # xx/yy miss -> dropped
    ],
    "Handlers": [
        {"Mode": "stream", "Name": "errors", "Template": "${ts} ${body}",
         "Validators": [{"Mode": "value", "Column": "levelname",
                         "Value": "ERROR"}]},
        {"Mode": "stream", "Name": "all", "Template": "${message}"},
    ],
}


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("ckpt") / "pages"
    write_pages(spark, str(p), 2000, seed=11, n_hosts=40, partitions=8)
    return str(p)


def _runner(pipe, out):
    return CheckpointedRunner(
        pipe, out, n_chunks=4, source_adapter=from_pages,
        keep=["url", "lang", "warc_ts"],
    )


def test_kill_and_resume_matches_single_shot(spark, input_dir, tmp_path):
    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))

    # single-shot reference run
    r_full = _runner(pipe, str(tmp_path / "full"))
    reports = r_full.run(spark, input_dir)
    assert len(reports) == 4 and not any(r.resumed for r in reports)
    want = r_full.totals()

    # killed run: only 2 of 4 chunks commit
    r_kill = _runner(pipe, str(tmp_path / "kill"))
    partial = r_kill.run(spark, input_dir, max_chunks=2)
    assert len(partial) == 2
    assert len(r_kill.committed_chunks()) == 2

    # resume: the 2 committed chunks are skipped, the rest run
    resumed = r_kill.run(spark, input_dir)
    assert sum(1 for r in resumed if r.resumed) == 2
    assert sum(1 for r in resumed if not r.resumed) == 2
    got = r_kill.totals()

    assert got["rows_in"] == want["rows_in"] == 2000
    assert got["sink_counts"] == want["sink_counts"]
    assert got["drop_counts"] == want["drop_counts"]

    # sink contents byte-identical between the two runs
    for sink in ("errors", "all"):
        a = sorted(
            r["rendered"]
            for r in r_full.output_frame(spark)
            .filter(F.col("sink") == sink).select("rendered").collect()
        )
        b = sorted(
            r["rendered"]
            for r in r_kill.output_frame(spark)
            .filter(F.col("sink") == sink).select("rendered").collect()
        )
        assert a == b, sink


def test_manifest_lineage_fields(spark, input_dir, tmp_path):
    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))
    runner = _runner(pipe, str(tmp_path / "lin"))
    runner.run(spark, input_dir)
    manifests = sorted(
        glob.glob(os.path.join(str(tmp_path / "lin"), "_manifests", "*.json"))
    )
    assert len(manifests) == 4
    m = json.load(open(manifests[0]))
    # lineage: which input files fed this output partition, row accounting
    assert m["files"] and all(f.endswith(".parquet") for f in m["files"])
    assert all(fp["bytes"] > 0 for fp in m["fingerprint"])
    assert m["output"].endswith("chunk=0")
    assert m["rows_in"] == sum(m["drop_counts"].values()) + _unique_routed(
        spark, m["output"]
    )


def _unique_routed(spark, data_dir) -> int:
    df = spark.read.parquet(data_dir)
    return (
        df.filter(F.col("sink") != DEAD_SINK)
        .select("url").distinct().count()
    )


def test_observe_counters_match_data(spark, input_dir, tmp_path):
    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))
    runner = _runner(pipe, str(tmp_path / "obs"))
    runner.run(spark, input_dir)
    totals = runner.totals()
    df = runner.output_frame(spark)
    got = {
        r["sink"]: r["n"]
        for r in df.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for name, n in totals["sink_counts"].items():
        assert got.get(name, 0) == n
    assert got.get(DEAD_SINK, 0) == sum(totals["drop_counts"].values())
