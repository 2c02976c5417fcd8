"""Streaming pipeline: micro-batched execution must produce EXACTLY the
batch engine's output (same compiled expressions), with checkpointed
exactly-once sink writes and windowed counters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logagent_spark.config import PipelineSpec
from logagent_spark.datagen import WAF_REGEX, pages_df, write_pages
from logagent_spark.plans.pipeline import CompiledPipeline
from logagent_spark.sources import from_pages
from logagent_spark.streaming import (
    start_streaming_pipeline,
    streaming_sink_counts,
)

SPEC = {
    "Parser": {"Mode": "regex", "Regex": WAF_REGEX},
    "Handlers": [
        {"Mode": "stream", "Name": "errors", "Template": "${ts} ${body}",
         "Validators": [{"Mode": "value", "Column": "levelname",
                         "Value": "ERROR"}]},
        {"Mode": "stream", "Name": "all", "Template": "${message}"},
    ],
}


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "pages")
    write_pages(spark, p, 1200, seed=5, n_hosts=30, partitions=6)
    return p


def test_streaming_equals_batch(spark, stream_input, tmp_path):
    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))
    schema = spark.read.parquet(stream_input).schema

    q = start_streaming_pipeline(
        pipe, spark, stream_input, str(tmp_path / "out"),
        str(tmp_path / "ckpt"), schema=schema, source_adapter=from_pages,
        keep=["url", "lang"], max_files_per_trigger=2,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out"))
    # batch reference on the same input
    res = pipe.transform(from_pages(spark.read.parquet(stream_input)))
    want = pipe.multiplexed(res, keep=["url", "lang"])
    for sink in ("errors", "all", "_dead_letter"):
        a = sorted(
            (r["url"], r["rendered"])
            for r in got.filter(F.col("sink") == sink).collect()
        )
        b = sorted(
            (r["url"], r["rendered"])
            for r in want.filter(F.col("sink") == sink).collect()
        )
        assert a == b, sink
    # multiple micro-batches actually happened
    epochs = got.select("_epoch").distinct().count()
    assert epochs >= 2


def test_streaming_restart_no_duplicates(spark, stream_input, tmp_path):
    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))
    schema = spark.read.parquet(stream_input).schema
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    for _ in range(2):  # second start: checkpoint says all consumed
        q = start_streaming_pipeline(
            pipe, spark, stream_input, out, ckpt,
            schema=schema, source_adapter=from_pages, keep=["url"],
        )
        q.awaitTermination(120)

    got_n = spark.read.parquet(out).filter(F.col("sink") == "all").count()
    want_n = spark.read.parquet(stream_input).count()
    assert got_n == want_n  # exactly-once despite the restart


def test_streaming_windowed_counters(spark, stream_input):
    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))
    schema = spark.read.parquet(stream_input).schema
    q = streaming_sink_counts(
        pipe, spark, stream_input, schema=schema, source_adapter=from_pages,
        query_name="t_counts",
    )
    q.awaitTermination(120)
    got = {
        (r["sink"], r["window"]["start"]): r["n"]
        for r in spark.sql("SELECT * FROM t_counts").collect()
    }
    res = pipe.transform(from_pages(spark.read.parquet(stream_input)))
    want = {
        (r["sink"], r["time_bucket"]): r["n"]
        for r in pipe.sink_counts(
            pipe.routed(res), ts_col="warc_ts", bucket="hour"
        ).collect()
    }
    assert got == want


def test_streaming_rate_limited_source_gate(spark, stream_input, tmp_path):
    """Leaky bucket gating the streaming source (the reference pours on
    the tail collector before parsing): routed output must equal the
    batch pipeline applied to exactly the batch-admitted row set."""
    from logagent_spark.streaming.ratelimit import rate_limited_batch

    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))
    schema = spark.read.parquet(stream_input).schema
    rl = {"key_col": "lang", "ts_col": "warc_ts",
          "size": 2, "leak_interval_s": 3600.0}

    q = start_streaming_pipeline(
        pipe, spark, stream_input, str(tmp_path / "out"),
        str(tmp_path / "ckpt"), schema=schema, source_adapter=from_pages,
        keep=["url", "lang"], max_files_per_trigger=6,
        rate_limit=rl,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))

    src = from_pages(spark.read.parquet(stream_input))
    admitted = (
        rate_limited_batch(
            src, "lang", "warc_ts", size=2, leak_interval_s=3600.0,
            payload_cols=[c for c in src.columns
                          if c not in ("lang", "warc_ts")],
        )
        .filter(F.col("admitted")).drop("admitted")
    )
    res = pipe.transform(admitted)
    want = pipe.multiplexed(res, keep=["url", "lang"])

    a = sorted((r["sink"], r["url"], r["rendered"]) for r in got.collect())
    b = sorted((r["sink"], r["url"], r["rendered"]) for r in want.collect())
    assert a == b and len(a) > 0
    # the gate actually dropped something (bursty langs overflow size 2)
    n_src = src.count()
    n_admitted = admitted.count()
    assert n_admitted < n_src


def test_epoch_replay_is_idempotent(spark, stream_input, tmp_path):
    """foreachBatch is at-least-once: a micro-batch that fails after a
    (partial or complete) sink write replays with the SAME epoch_id. The
    writer must overwrite only that epoch's partitions, so a replay
    changes nothing — this pins the dynamic-partition-overwrite
    mechanism through the PRODUCTION write_epoch function, including the
    mid-batch case: a PARTIAL write followed by a same-epoch full replay
    must leave exactly one copy of every row."""
    from logagent_spark.streaming.pipeline import write_epoch

    pipe = CompiledPipeline(PipelineSpec.from_dict(SPEC))
    src = from_pages(spark.read.parquet(stream_input))
    out_dir = str(tmp_path / "replay_out")
    keep = ["url", "lang"]

    write_epoch(pipe, src, 0, out_dir, keep=keep)
    first = spark.read.parquet(out_dir).count()
    write_epoch(pipe, src, 0, out_dir, keep=keep)  # full same-epoch replay
    # epoch 1 dies mid-write (only a quarter of its rows landed) ...
    part = src.filter(F.pmod(F.hash("url"), F.lit(4)) == 0)
    write_epoch(pipe, part, 1, out_dir, keep=keep)
    # ... then the checkpoint replays the SAME epoch with the full batch
    write_epoch(pipe, src, 1, out_dir, keep=keep)
    got = spark.read.parquet(out_dir)
    assert got.filter(F.col("_epoch") == 0).count() == first
    assert got.filter(F.col("_epoch") == 1).count() == first
    assert got.count() == 2 * first
    # byte-level: each epoch holds exactly the batch-engine row set
    want = sorted(
        (r["sink"], r["url"], r["rendered"])
        for r in pipe.multiplexed(pipe.transform(src), keep=keep).collect()
    )
    for e in (0, 1):
        a = sorted(
            (r["sink"], r["url"], r["rendered"])
            for r in got.filter(F.col("_epoch") == e).collect()
        )
        assert a == want, e


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_path):
    """session_window (streaming, append mode: a session emits exactly
    once, when the watermark closes it, and its state is evicted) and
    the batch window sessionizer must agree on session count and
    per-session event counts for the same gap. A far-future sentinel
    event advances the watermark past every real session's end; the
    sentinel's own still-open session must NOT emit — that absence is
    exactly the append-mode state-eviction contract."""
    from logagent_spark.operators.sessions import session_stats
    from logagent_spark.streaming.pipeline import streaming_session_counts

    rows = []
    for uid in (1, 2):
        # bursts 10 min apart inside sessions, 2 h between sessions
        for s0 in (0, 7200, 14400):
            for i in range(3):
                rows.append((uid, float(uid * 100000 + s0 + i * 600),
                             len(rows)))
    # watermark sentinel: closes all real sessions, stays open itself
    rows.append((99, 500000.0, len(rows)))
    src = spark.createDataFrame(
        rows, "uid long, sec double, eid long"
    ).select("uid", F.timestamp_seconds("sec").alias("ts"), "eid")
    in_dir = str(tmp_path / "sess_in")
    src.write.parquet(in_dir)

    q = streaming_session_counts(
        spark, in_dir, schema=spark.read.parquet(in_dir).schema,
        key_col="uid", ts_col="ts", gap="30 minutes",
        query_name="sess_test",
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from sess_test").collect()
    got = sorted((r["uid"], r["n_events"]) for r in emitted)
    want = sorted(
        (r["uid"], r["n_events"])
        for r in session_stats(
            src.filter(F.col("uid") != 99), "uid", "ts", gap_s=1800.0,
            order_cols=["ts", "eid"]).collect()
    )
    assert got == want and len(got) == 6
    assert not any(r["uid"] == 99 for r in emitted)  # open session held back


def test_streaming_dedup_exact_across_batches(spark, tmp_path):
    """First-arrival-wins exact dedup with engine state: duplicates are
    flagged within a batch AND across micro-batches (the state store
    remembers every content hash ever admitted); the admitted set equals
    the batch dedup_exact winners over the full input when ids follow
    arrival order."""
    import time as _time

    from logagent_spark.operators.dedup import dedup_exact
    from logagent_spark.streaming.dedup import streaming_dedup_exact

    in_dir = str(tmp_path / "dd_in")
    contents = [f"doc content number {i}" for i in range(5)]
    # batch 1: contents 0-4, each twice (in-batch dups), ids 0-9
    rows1 = [(i, contents[i % 5]) for i in range(10)]
    # batch 2: contents 0-4 again (cross-batch dups) + new 5-6, ids 10-21
    rows2 = [(10 + i, contents[i % 5]) for i in range(10)]
    rows2 += [(20, "fresh doc twenty"), (21, "fresh doc twenty-one")]
    spark.createDataFrame(rows1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.2)  # distinct mod-times => deterministic batch order
    spark.createDataFrame(rows2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)

    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_dedup_exact(stream, "doc_id", "text")
        .writeStream.outputMode("append")
        .format("memory").queryName("dd_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dd_test").collect()
    assert len(got) == 22                      # flagged, never dropped
    admitted = sorted(r["doc_id"] for r in got if not r["is_dup"])
    # exactly one winner per distinct content
    assert len(admitted) == 7
    # equals the batch twin over the full input (min id per content)
    full = spark.read.parquet(in_dir)
    want = sorted(r["doc_id"]
                  for r in dedup_exact(full, "doc_id", "text").collect())
    assert admitted == want == [0, 1, 2, 3, 4, 20, 21]
    # every duplicate row carries the hash of its winner
    by_hash = {}
    for r in got:
        by_hash.setdefault(r["content_hash"], []).append(r)
    for h, rs in by_hash.items():
        assert sum(not r["is_dup"] for r in rs) == 1, h


def test_streaming_dedup_ttl_horizon_and_eviction(spark, tmp_path):
    """Bounded TTL mode: inside the horizon parity with unbounded dedup
    is exact (duplicates flagged); once the watermark passes a content's
    last sighting + ttl its re-arrival is RE-ADMITTED (the documented
    forgetting semantics), and the engine physically evicts expired
    state (observed via the state operator's numRowsRemoved metric)."""
    import time as _time

    from logagent_spark.streaming.dedup import streaming_dedup_exact

    in_dir = str(tmp_path / "ttl_in")

    def write_batch(rows):
        spark.createDataFrame(rows, "doc_id long, sec double, text string") \
            .coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.2)  # distinct mod-times => deterministic batch order

    ttl = 3600.0
    # t=100 not t=0: the initial watermark IS epoch 0 and the stateful
    # operator drops rows with ts <= watermark as late
    write_batch([(0, 100.0, "doc A"), (1, 100.0, "doc B")])
    # watermark still 100s here: B's dup is INSIDE the horizon -> flagged
    write_batch([(2, 10_000.0, "doc C"), (3, 10_000.0, "doc B")])
    # watermark now 10000s: A's last sighting (t=100) + ttl has passed ->
    # re-admitted; B's (t=10000) has not -> flagged
    write_batch([(4, 10_001.0, "doc A"), (5, 10_001.0, "doc B")])
    # two fillers: first advances the watermark to 10001s, second runs
    # with watermark 20000s so A/B/C state (timeouts <= 13601s) fires
    # hasTimedOut and is physically removed
    write_batch([(6, 20_000.0, "filler one")])
    write_batch([(7, 20_002.0, "filler two")])

    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .select("doc_id", F.timestamp_seconds("sec").alias("ts"), "text")
        .withWatermark("ts", "0 seconds")
    )
    q = (
        streaming_dedup_exact(
            stream, "doc_id", "text", ttl_s=ttl, ts_col="ts",
        )
        .writeStream.outputMode("append")
        .format("memory").queryName("dd_ttl_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in q.recentProgress for op in p["stateOperators"]
    )
    got = {r["doc_id"]: r["is_dup"]
           for r in spark.sql("select * from dd_ttl_test").collect()}
    assert got == {
        0: False, 1: False,          # first arrivals
        2: False, 3: True,           # C fresh; B dup inside horizon
        4: False,                    # A re-admitted: horizon passed
        5: True,                     # B still inside horizon
        6: False, 7: False,
    }
    assert removed > 0, q.recentProgress  # physical state eviction fired


def test_streaming_dedup_ttl_monotone_anchor(spark, tmp_path):
    """A late-but-valid duplicate (ts above the watermark but below the
    stored last sighting) must NOT move the TTL anchor backward: the
    horizon runs from max(stored last_ms, batch max). With a shrunk
    anchor the third arrival below would be spuriously re-admitted."""
    import time as _time

    from logagent_spark.streaming.dedup import streaming_dedup_exact

    in_dir = str(tmp_path / "ttl_mono_in")

    def write_batch(rows):
        spark.createDataFrame(rows, "doc_id long, sec double, text string") \
            .coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.2)

    # watermark delay 10000s so a duplicate can be above the watermark
    # yet below the stored last sighting (the late-but-valid window)
    write_batch([(0, 20_000.0, "doc A")])   # last sighting anchor 20000
    write_batch([(1, 12_000.0, "doc A")])   # late dup: wm=10000 < 12000 < 20000
    write_batch([(2, 28_000.0, "filler")])  # advances wm to 18000 for next batch
    # true horizon = 20000 + ttl(5000) = 25000; a backward-moved anchor
    # (12000) would put the horizon at 17000 < wm 18000 -> re-admission
    write_batch([(3, 18_500.0, "doc A")])

    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .select("doc_id", F.timestamp_seconds("sec").alias("ts"), "text")
        .withWatermark("ts", "10000 seconds")
    )
    q = (
        streaming_dedup_exact(
            stream, "doc_id", "text", ttl_s=5000.0, ts_col="ts",
        )
        .writeStream.outputMode("append")
        .format("memory").queryName("dd_ttl_mono_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["is_dup"]
           for r in spark.sql("select * from dd_ttl_mono_test").collect()}
    assert got == {0: False, 1: True, 2: False, 3: True}


def test_streaming_dedup_sharded_union_equals_unsharded(spark, tmp_path):
    """Hash-space sharding: n_shards jobs over disjoint shard slices
    each hold 1/n of the state, and their admitted sets union to
    EXACTLY the unsharded answer (shard is a function of the content
    hash, so no content spans jobs)."""
    import time as _time

    from logagent_spark.streaming.dedup import streaming_dedup_exact

    in_dir = str(tmp_path / "shard_in")
    contents = [f"sharded doc {i}" for i in range(8)]
    rows1 = [(i, contents[i % 8]) for i in range(12)]
    rows2 = [(12 + i, contents[i % 8]) for i in range(12)]
    spark.createDataFrame(rows1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.2)
    spark.createDataFrame(rows2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)

    schema = spark.read.parquet(in_dir).schema

    def run(name, **kw):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            streaming_dedup_exact(stream, "doc_id", "text", **kw)
            .writeStream.outputMode("append")
            .format("memory").queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(f"select * from {name}").collect()

    full = run("dd_shard_full")
    s0 = run("dd_shard_0", n_shards=2, shard=0)
    s1 = run("dd_shard_1", n_shards=2, shard=1)
    assert 0 < len(s0) < len(full) and 0 < len(s1) < len(full)
    assert len(s0) + len(s1) == len(full) == 24
    union = sorted((r["doc_id"], r["is_dup"]) for r in s0 + s1)
    assert union == sorted((r["doc_id"], r["is_dup"]) for r in full)
