"""Checkpointed, resumable pipeline runner — per-chunk lineage + metrics.

The reference's only durability is a hand-written Kafka offset file
(/root/reference/agent/task/collector.go:230-239, 256-260: one int,
written on shutdown — at-most-once-ish). Spark gives task-level retry but
no batch mid-JOB resume; this module implements resume at the
input-chunk level, "the offset file done right" (SURVEY.md §7 M7):

  * the input is split into deterministic CHUNKS (groups of parquet
    files, sorted listing — at cluster scale the same grouping applies to
    an Iceberg snapshot's file manifest);
  * each chunk runs the full parse->enrich->route pipeline and writes all
    sinks in ONE job under ``{out}/data/chunk=<id>/sink=<name>/``;
  * metrics for the chunk (rows in/routed per sink/dropped per reason,
    wall time, input fingerprint) are gathered DURING the write via
    ``DataFrame.observe`` — zero extra scans — and committed as a JSON
    manifest by atomic rename. The manifest doubles as the lineage
    record (which input files produced which output partition);
  * a restart lists committed manifests and skips those chunks; a chunk
    killed mid-write is simply re-run (its data dir is overwritten), so
    the protocol is idempotent and exactly-once at chunk granularity.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logagent_spark.plans.pipeline import (
    DEAD_SINK,
    RENDERED_COL,
    SINK_COL,
    CompiledPipeline,
)


def list_input_files(input_path: str) -> list[str]:
    """Deterministic sorted listing of the input table's data files.
    Local-FS implementation; on a cluster the same contract is served by
    the Iceberg/Hadoop file manifest."""
    if os.path.isdir(input_path):
        files = sorted(
            f
            for f in glob.glob(os.path.join(input_path, "**", "*.parquet"),
                               recursive=True)
            if not os.path.basename(f).startswith(("_", "."))
        )
        if files:
            return files
    return [input_path]


def make_chunks(files: list[str], n_chunks: int) -> list[list[str]]:
    n_chunks = max(1, min(n_chunks, len(files)))
    out: list[list[str]] = [[] for _ in range(n_chunks)]
    for i, f in enumerate(files):
        out[i % n_chunks].append(f)
    return [c for c in out if c]


@dataclass
class ChunkReport:
    chunk_id: int
    files: list[str]
    rows_in: int
    sink_counts: dict[str, int]
    drop_counts: dict[str, int]
    seconds: float
    resumed: bool = False


class CheckpointedRunner:
    def __init__(
        self,
        pipe: CompiledPipeline,
        out_dir: str,
        *,
        n_chunks: int = 8,
        source_adapter: Callable[[DataFrame], DataFrame] | None = None,
        keep: list[str] | None = None,
        repartition: int | None = None,
    ) -> None:
        self.pipe = pipe
        self.out_dir = out_dir
        self.n_chunks = n_chunks
        self.source_adapter = source_adapter
        self.keep = keep
        self.repartition = repartition
        os.makedirs(self._manifest_dir, exist_ok=True)

    # ------------------------------------------------------------------
    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.out_dir, "_manifests")

    def _manifest_path(self, chunk_id: int) -> str:
        return os.path.join(self._manifest_dir, f"chunk_{chunk_id:05d}.json")

    def committed_chunks(self) -> dict[int, dict]:
        out = {}
        for p in glob.glob(os.path.join(self._manifest_dir, "chunk_*.json")):
            with open(p) as f:
                m = json.load(f)
            out[m["chunk_id"]] = m
        return out

    # ------------------------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        input_path: str,
        *,
        max_chunks: int | None = None,
    ) -> list[ChunkReport]:
        """Process all uncommitted chunks (optionally at most `max_chunks`
        of them — used by tests to simulate a mid-run kill)."""
        files = list_input_files(input_path)
        chunks = make_chunks(files, self.n_chunks)
        committed = self.committed_chunks()
        reports: list[ChunkReport] = []
        done = 0
        for cid, chunk_files in enumerate(chunks):
            if cid in committed and self._manifest_valid(
                committed[cid], chunk_files
            ):
                m = committed[cid]
                reports.append(ChunkReport(
                    chunk_id=cid, files=m["files"], rows_in=m["rows_in"],
                    sink_counts=m["sink_counts"],
                    drop_counts=m["drop_counts"], seconds=m["seconds"],
                    resumed=True,
                ))
                continue
            if max_chunks is not None and done >= max_chunks:
                break
            reports.append(self._run_chunk(spark, cid, chunk_files))
            done += 1
        return reports

    @staticmethod
    def _manifest_valid(manifest: dict, chunk_files: list[str]) -> bool:
        """A committed chunk is only skippable if its lineage still
        matches reality: same file set, same byte sizes. Otherwise the
        input changed under us (new files shift the round-robin chunking;
        a rewritten file changes bytes) and the chunk re-runs — skipping
        on id alone would silently serve stale output."""
        if manifest.get("files") != chunk_files:
            return False
        for fp in manifest.get("fingerprint", []):
            try:
                if os.path.getsize(fp["path"]) != fp["bytes"]:
                    return False
            except OSError:
                return False
        return True

    def _run_chunk(
        self, spark: SparkSession, cid: int, files: list[str]
    ) -> ChunkReport:
        t0 = time.monotonic()
        df = spark.read.parquet(*files)
        # parquet count() is served from row-group metadata — no data read
        rows_in = df.count()
        if self.source_adapter is not None:
            df = self.source_adapter(df)
        if self.repartition:
            # salted spread for host-domain skew: hash the whole row id
            # space rather than trusting input file layout
            df = df.repartition(self.repartition)

        result = self.pipe.transform(df)
        out = self.pipe.multiplexed(result, keep=self.keep)

        # metrics piggy-back on the write action: no second scan
        metrics = [F.count(F.lit(1)).alias("rows_out")]
        for name in self.pipe.sink_names():
            metrics.append(
                F.sum(F.when(F.col(SINK_COL) == name, 1).otherwise(0))
                .alias(f"sink:{name}")
            )
        for reason in self.pipe.known_reasons():
            metrics.append(
                F.sum(
                    F.when(
                        (F.col(SINK_COL) == DEAD_SINK)
                        & (F.col(RENDERED_COL) == reason),
                        1,
                    ).otherwise(0)
                ).alias(f"drop:{reason}")
            )
        obs = Observation(f"chunk_{cid}")
        out = out.observe(obs, *metrics)

        data_dir = os.path.join(self.out_dir, "data", f"chunk={cid}")
        # 2 tasks per core, same sizing as write_sinks (a no-op when the
        # chunk has fewer partitions): bounds per-chunk task-commit and
        # per-file writer overhead, which recurs once PER CHUNK here
        spark = out.sparkSession
        out = out.coalesce(2 * spark.sparkContext.defaultParallelism)
        out.write.mode("overwrite").partitionBy(SINK_COL).parquet(data_dir)

        got = obs.get
        sink_counts = {
            n: int(got.get(f"sink:{n}", 0) or 0) for n in self.pipe.sink_names()
        }
        drop_counts = {
            r: int(got.get(f"drop:{r}", 0) or 0)
            for r in self.pipe.known_reasons()
        }
        seconds = time.monotonic() - t0

        manifest = {
            "chunk_id": cid,
            "files": files,
            "fingerprint": [
                {"path": f, "bytes": os.path.getsize(f)}
                for f in files
                if os.path.exists(f)
            ],
            "rows_in": rows_in,
            "sink_counts": sink_counts,
            "drop_counts": drop_counts,
            "seconds": seconds,
            "output": data_dir,
        }
        tmp = self._manifest_path(cid) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(cid))  # atomic commit
        return ChunkReport(
            chunk_id=cid, files=files, rows_in=rows_in,
            sink_counts=sink_counts, drop_counts=drop_counts,
            seconds=seconds,
        )

    # ------------------------------------------------------------------
    def totals(self) -> dict:
        """Aggregate committed manifests into the run-level report."""
        sink_totals: dict[str, int] = {}
        drop_totals: dict[str, int] = {}
        rows_in = 0
        secs = 0.0
        manifests = self.committed_chunks()
        for m in manifests.values():
            rows_in += m["rows_in"]
            secs += m["seconds"]
            for k, v in m["sink_counts"].items():
                sink_totals[k] = sink_totals.get(k, 0) + v
            for k, v in m["drop_counts"].items():
                drop_totals[k] = drop_totals.get(k, 0) + v
        return {
            "chunks": len(manifests),
            "rows_in": rows_in,
            "sink_counts": sink_totals,
            "drop_counts": drop_totals,
            "seconds": secs,
        }

    def output_frame(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "data"))
