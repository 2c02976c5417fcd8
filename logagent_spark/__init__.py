"""logagent_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch re-engineering of the capabilities of Gloden7/logagent
(a single-process Go log-shipping agent) as a batch
parse -> enrich -> route -> aggregate pipeline over web-scale tables,
expressed in idiomatic PySpark (DataFrame/SQL + Catalyst; vectorized
pandas/Arrow UDFs only where Column expressions cannot express the
semantics).

Layout:
  config       — PipelineSpec: the reference's JSON config dialect as the IR
                 (mirrors /root/reference/agent/task/config.go:3-83)
  operators/   — compilers from spec nodes to Column expressions
                 (parsers, validators, rewrites, template) plus the
                 training-data operator suite (dedup, similarity, textstats)
  plans/       — pipeline compiler (fan-out router, aggregation,
                 dead-letter accounting) and checkpoint/lineage/resume
  sources/     — input adapters (pages table, text lines, syslog framing, json)
  functions/   — shared Column-expression helpers
  oracle       — pure-Python transcription of the reference's per-row
                 semantics, used as the golden oracle in tests
  datagen      — deterministic synthetic Common-Crawl-style `pages` table
"""

__version__ = "0.1.0"

from logagent_spark.config import PipelineSpec  # noqa: F401
