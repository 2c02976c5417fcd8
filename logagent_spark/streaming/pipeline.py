"""Streaming execution of a compiled pipeline.

The reference is a streaming agent (channel + worker pool,
/root/reference/agent/task/task.go:75-199) with a hand-rolled Kafka
offset checkpoint (collector.go:230-260). The Spark-native equivalent is
Structured Streaming:

  * source: file-stream over the landing directory (stands in for the
    file/dir/kafka collectors; a real deployment swaps
    `readStream.format("kafka")` — same downstream plan);
  * the SAME CompiledPipeline.transform / multiplexed expressions run on
    each micro-batch (one code path for batch and streaming — the
    transform is pure Column algebra);
  * sink fan-out via foreachBatch writing the multiplex partitionBy(sink)
    layout — exactly-once per micro-batch with the streaming checkpoint
    (the reference's offset file, done by the engine);
  * per-handler counters as a windowed streaming aggregation with a
    watermark for late data (the reference only has arrival time and no
    late-data story — SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logagent_spark.plans.pipeline import SINK_COL, CompiledPipeline


def write_epoch(
    pipe: CompiledPipeline,
    batch_df: DataFrame,
    epoch_id: int,
    out_dir: str,
    *,
    keep: list[str] | None = None,
) -> None:
    """The foreachBatch body, module-level so the replay contract is
    directly testable. foreachBatch is AT-LEAST-ONCE on micro-batch
    retry: a batch that fails after a partial write replays from the
    checkpoint with the SAME epoch_id. Idempotence comes from
    partitioning on _epoch and dynamically overwriting ONLY the replayed
    epoch's partitions (a blind append would duplicate the partial
    write)."""
    result = pipe.transform(batch_df)
    out = pipe.multiplexed(result, keep=keep)
    (
        out.withColumn("_epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch", SINK_COL)
        .parquet(out_dir)
    )


def start_streaming_pipeline(
    pipe: CompiledPipeline,
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    source_adapter=None,
    keep: list[str] | None = None,
    max_files_per_trigger: int = 8,
    rate_limit: dict | None = None,
):
    """File-stream -> [leaky-bucket source gate] -> compiled pipeline ->
    multiplex sink write. Returns the StreamingQuery (caller:
    processAllAvailable()/stop()).

    `rate_limit` = {"key_col", "ts_col", "size", "leak_interval_s"}
    gates the SOURCE before parsing, exactly where the reference's tail
    collector pours its bucket (tail/tail.go:266-284): rejected rows
    never reach the pipeline. The bucket state lives in the streaming
    state store, keyed per `key_col`."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    if source_adapter is not None:
        stream = source_adapter(stream)
    if rate_limit is not None:
        from logagent_spark.streaming.ratelimit import rate_limited

        rl = dict(rate_limit)
        key_col, ts_col = rl.pop("key_col"), rl.pop("ts_col")
        payload = [c for c in stream.columns if c not in (key_col, ts_col)]
        stream = (
            rate_limited(stream, key_col, ts_col,
                         payload_cols=payload, **rl)
            .filter(F.col("admitted"))
            .drop("admitted")
        )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        write_epoch(pipe, batch_df, epoch_id, out_dir, keep=keep)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_session_counts(
    spark: SparkSession,
    input_dir: str,
    *,
    schema: T.StructType,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    source_adapter=None,
    query_name: str = "session_counts",
    output_mode: str = "append",
    path_glob: str | None = None,
):
    """Native Structured-Streaming sessionization: `session_window`
    merges events within `gap` per key; the watermark bounds state (a
    session closes once the watermark passes its end, so state volume is
    O(open sessions), not O(history)). The batch twin is
    operators/sessions.sessionize, with one boundary divergence: an
    event at EXACTLY gap seconds stays in-session in the batch operator
    (> splits) but opens a new session here (session_window spans are
    half-open [start, start+gap)).

    Output modes: session-window aggregation supports only 'append' and
    'complete' (Spark rejects 'update': merging sessions cannot re-emit
    keyed updates). Default 'append' is the production mode — a session
    emits exactly once, when the watermark passes its end, and its state
    is evicted, so state volume really is O(open sessions); trailing
    sessions still open when the stream idles emit only after later data
    advances the watermark. 'complete' re-emits everything and retains
    ALL aggregation state forever — O(history), NOT bounded by the
    watermark — so it is only safe for bounded availableNow test runs,
    never for a long-running query."""
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(input_dir)
    if source_adapter is not None:
        stream = source_adapter(stream)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def streaming_sink_counts(
    pipe: CompiledPipeline,
    spark: SparkSession,
    input_dir: str,
    *,
    schema: T.StructType,
    source_adapter=None,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "sink_counts",
):
    """Windowed per-sink counters as a live streaming aggregation
    (watermark bounds state; 'update' into the in-memory sink for tests,
    a kafka/parquet sink in production)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    if source_adapter is not None:
        stream = source_adapter(stream)

    result = pipe.transform(stream)
    routed = pipe.routed(result)
    agg = (
        routed.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(SINK_COL))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
