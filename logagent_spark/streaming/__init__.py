"""Structured Streaming surface: the same compiled pipeline, incremental."""

from logagent_spark.streaming.dedup import (  # noqa: F401
    streaming_dedup_exact,
)
from logagent_spark.streaming.pipeline import (  # noqa: F401
    start_streaming_pipeline,
    streaming_sink_counts,
)
