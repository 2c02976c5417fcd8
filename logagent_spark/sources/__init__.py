"""Input adapters: seed the reference's message envelope onto DataFrames."""

from logagent_spark.sources.readers import (  # noqa: F401
    from_pages,
    read_json_lines,
    read_pages,
    read_text_lines,
    syslog_decode,
)
