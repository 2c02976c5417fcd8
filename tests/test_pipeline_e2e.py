"""End-to-end parity on the F4 routing shape: one source -> parse ->
global validators -> rewrites -> 4 sinks (each with its own validator
gate + template). Checks, against the Python oracle:

  * per-sink routed-row equality, byte-compared rendered text
    (sorted — row order is not part of the contract);
  * per-sink aggregate counts;
  * dead-letter reasons + counts;
  * multiplex and cache write strategies produce identical sink contents.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from logagent_spark import oracle
from logagent_spark.config import PipelineSpec
from logagent_spark.datagen import WAF_REGEX
from logagent_spark.plans.pipeline import CompiledPipeline
from logagent_spark.sources import from_pages

# F4: mirrors config/config_consumer.json's one-source->N-sink routing,
# over the F1 pages fixture. The `message` column is the page text.
SPEC = {
    "Parser": {"Mode": "regex", "Regex": WAF_REGEX},
    "Validators": [
        {"Mode": "minlength", "Column": "message", "Number": 5},
    ],
    "Rewrites": [
        {"Mode": "set", "Column": "pipeline", "Value": "waf"},
        {"Mode": "subst", "Column": "body", "Old": "upstream", "Value": "origin"},
        {"Mode": "splicing", "Key": "line_id",
         "Columns": ["levelname", "ts"], "Delimiters": "@"},
        {"Mode": "mapping", "Column": "lang",
         "Mapping": {"en": "english", "zh": "chinese", "de": "german",
                     "fr": "french", "es": "spanish", "ru": "russian",
                     "ja": "japanese", "xx": "unknown", "yy": "unknown"}},
    ],
    "Handlers": [
        {"Mode": "stream", "Name": "errors",
         "Template": "[${pipeline}] ${line_id} :: ${body}",
         "Validators": [
             {"Mode": "value", "Column": "levelname", "Value": "ERROR"},
         ]},
        {"Mode": "file", "Name": "all_parsed",
         "Template": "${ts} ${levelname} ${body} ${missing_key}",
         "Validators": [
             {"Mode": "required", "Column": "ts"},
         ]},
        {"Mode": "kafka", "Name": "raw_topic", "Topic": "raw_topic",
         "Template": ""},
        {"Mode": "database", "Name": "pages_db", "Table": "pages_db",
         "Columns": ["url", "lang", "levelname", "line_id", "nope"],
         "Validators": [
             {"Mode": "maxlength", "Column": "body", "Number": 200},
         ]},
    ],
}


@pytest.fixture(scope="module")
def spec():
    return PipelineSpec.from_dict(SPEC, name="f4")


@pytest.fixture(scope="module")
def oracle_result(spec, pages_rows):
    rows = [dict(r, message=r["text"]) for r in pages_rows]
    return oracle.run_pipeline(spec, rows)


@pytest.fixture(scope="module")
def spark_routed(spec, spark, pages_sdf):
    pipe = CompiledPipeline(spec)
    res = pipe.transform(from_pages(pages_sdf))
    routed = pipe.routed(res)
    dead = pipe.dead_letter(res)
    return pipe, res, routed, dead


def test_per_sink_rendered_byte_equality(spark_routed, oracle_result):
    _, _, routed, _ = spark_routed
    got = collections.defaultdict(list)
    for r in routed.select("sink", "rendered").collect():
        got[r["sink"]].append(r["rendered"])
    for name in ("errors", "all_parsed", "raw_topic"):
        want = oracle_result["sinks"][name]
        assert sorted(got.get(name, [])) == sorted(want), name


def test_database_sink_rows(spark_routed, oracle_result, spec):
    _, _, routed, _ = spark_routed
    h = spec.handlers[3]
    got = [
        tuple(r[c] if c in routed.columns else None for c in h.columns)
        for r in routed.filter(F.col("sink") == "pages_db").collect()
    ]
    want = [tuple(d[c] for c in h.columns) for d in oracle_result["sinks"]["pages_db"]]
    assert sorted(got, key=str) == sorted(want, key=str)


def test_per_sink_counts(spark_routed, oracle_result):
    pipe, _, routed, _ = spark_routed
    got = {
        r["sink"]: r["n"] for r in pipe.sink_counts(routed).collect()
    }
    want = {k: v for k, v in oracle_result["counts"].items() if v}
    assert got == want


def test_dead_letter_reasons(spark_routed, oracle_result):
    pipe, _, _, dead = spark_routed
    got = {
        r["reason"]: r["n"] for r in pipe.drop_counts(dead).collect()
    }
    want = collections.Counter(reason for reason, _ in oracle_result["dropped"])
    assert got == dict(want)


def test_write_strategies_equal(spark_routed, tmp_path):
    pipe, _, routed, _ = spark_routed
    spark = routed.sparkSession
    pipe.write_sinks(routed, str(tmp_path / "mx"), strategy="multiplex")
    pipe.write_sinks(routed, str(tmp_path / "ca"), strategy="cache")
    mx = spark.read.parquet(str(tmp_path / "mx"))
    for i, h in enumerate(pipe.spec.handlers):
        name = h.sink_name(i)
        ca = spark.read.parquet(str(tmp_path / "ca") + f"/sink={name}")
        got_mx = mx.filter(F.col("sink") == name)
        if h.mode == "database":
            cols = [c for c in h.columns if c in got_mx.columns]
            a = sorted(str(tuple(r[c] for c in cols)) for r in got_mx.collect())
            b = sorted(str(tuple(r[c] for c in cols)) for r in ca.collect())
        else:
            a = sorted(r["rendered"] for r in got_mx.select("rendered").collect())
            b = sorted(r["rendered"] for r in ca.select("rendered").collect())
        assert a == b, name


def test_counts_by_lang_and_bucket(spark_routed, oracle_result, spec, pages_rows):
    """groupBy(sink, lang, time_bucket) == oracle counters (BASELINE M6)."""
    pipe, _, routed, _ = spark_routed
    got = {
        (r["sink"], r["lang"], r["time_bucket"].isoformat()): r["n"]
        for r in pipe.sink_counts(
            routed, lang_col="lang", ts_col="warc_ts", bucket="hour"
        ).collect()
    }
    # oracle-side: recompute per-sink surviving rows with their lang/ts
    want: collections.Counter = collections.Counter()
    rows = [dict(r, message=r["text"]) for r in pages_rows]
    sink_names = [h.sink_name(i) for i, h in enumerate(spec.handlers)]
    for row in rows:
        msg = {k: v for k, v in row.items() if v is not None}
        try:
            oracle.parse_row(spec.parser, msg)
            if any(not oracle.validate_row(v, msg) for v in spec.validators):
                continue
            for rw in spec.rewrites:
                oracle.rewrite_row(rw, msg)
        except oracle.RowError:
            continue
        bucket = msg["warc_ts"].replace(
            minute=0, second=0, microsecond=0, tzinfo=None
        )
        for name, h in zip(sink_names, spec.handlers):
            if any(not oracle.validate_row(v, msg) for v in h.validators):
                continue
            want[(name, msg["lang"], bucket.isoformat())] += 1
    assert got == dict(want)
