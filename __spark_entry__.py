"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001: regex-parse documents,
                validate, broadcast-lookup enrich, route to 3 sinks,
                return per-(sink, lang) counts.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data suite), each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL for EVERY query: the LSH/simhash/
                ANN ops hash with md5 / literal planes / literal
                centroids, so DuckDB reproduces the full pipelines, and
                the leaky bucket replays as a recursive CTE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logagent_spark import queries as _q
from logagent_spark.config import PipelineSpec
from logagent_spark.plans.pipeline import CompiledPipeline

FLAGSHIP_SPEC = {
    "Parser": {"Mode": "regex", "Regex": _q.HEAD_REGEX},
    "Validators": [
        {"Mode": "minlength", "Column": "text", "Number": 10},
    ],
    "Rewrites": [
        {"Mode": "set", "Column": "pipeline", "Value": "flagship"},
        {"Mode": "lookup", "Lookup": {
            "key": "lang",
            "table": [
                {"lang": "en", "geo": "US"}, {"lang": "zh", "geo": "CN"},
                {"lang": "de", "geo": "DE"}, {"lang": "fr", "geo": "FR"},
                {"lang": "es", "geo": "MX"},
            ],
            "output": {"geo": "string"},
            "on_miss": "drop",
        }},
    ],
    "Handlers": [
        {"Mode": "stream", "Name": "short_docs",
         "Template": "[${pipeline}/${geo}] ${head}",
         "Validators": [
             {"Mode": "maxlength", "Column": "text", "Number": 200},
         ]},
        {"Mode": "stream", "Name": "long_docs",
         "Template": "[${pipeline}/${geo}] ${head} :: ${rest}",
         "Validators": [
             {"Mode": "minlength", "Column": "text", "Number": 201},
         ]},
        {"Mode": "stream", "Name": "all_docs", "Template": "${text}"},
    ],
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = PipelineSpec.from_dict(FLAGSHIP_SPEC, name="flagship")
    pipe = CompiledPipeline(spec)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.withColumn("message", F.col("text"))
    result = pipe.transform(docs)
    routed = pipe.routed(result, keep=["doc_id", "lang", "geo"])
    return pipe.sink_counts(routed, lang_col="lang").orderBy("sink", "lang")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
