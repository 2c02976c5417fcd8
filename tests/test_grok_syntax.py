"""Grok `%{NAME:field}` syntax: expansion unit tests + end-to-end parse
equivalence with the equivalent raw named-group regex on both regex
strategies (native regexp_extract and the Arrow pandas UDF)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from logagent_spark.config import PipelineSpec
from logagent_spark.functions.grok import GrokError, expand_grok
from logagent_spark.plans.pipeline import CompiledPipeline


def test_expand_simple_field():
    pat = expand_grok("%{INT:n} %{WORD:w}")
    m = re.search(pat, "42 hello")
    assert m and m.group("n") == "42" and m.group("w") == "hello"


def test_expand_bare_reference_not_capturing():
    pat = expand_grok("%{INT} %{WORD:w}")
    cre = re.compile(pat)
    assert list(cre.groupindex) == ["w"]


def test_expand_nested_references():
    pat = expand_grok("%{TIMESTAMP_ISO8601:ts}")
    m = re.search(pat, "before 2020-08-19 22:11:59 after")
    assert m and m.group("ts") == "2020-08-19 22:11:59"


def test_expand_custom_library_and_passthrough():
    pat = expand_grok("%{MYID:x}", {"MYID": r"id-\d+"})
    assert re.search(pat, "see id-77.").group("x") == "id-77"
    raw = r"(?P<a>\d+)-(?P<b>\d+)"
    assert expand_grok(raw) == raw  # no references: untouched


def test_expand_errors():
    with pytest.raises(GrokError):
        expand_grok("%{NOPE:x}")
    with pytest.raises(GrokError):
        expand_grok("%{A:x}", {"A": "%{B}", "B": "%{A}"})  # cycle


WAF_LINE_GROK = (
    r"%{TIMESTAMP_ISO8601:ts},%{INT:ms} - %{LOGLEVEL:levelname}"
    r" - %{GREEDYDATA:body}"
)
WAF_LINE_RAW = (
    r"(?P<ts>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),(?P<ms>\d+)"
    r" - (?P<levelname>[A-Z]+) - (?P<body>.*)"
)

ROWS = [
    (0, "2020-08-19 22:11:59,515 - ERROR - No matched file: x"),
    (1, "2021-01-02 03:04:05,001 - INFO - started"),
    (2, "not a log line at all"),
    (3, None),
]


@pytest.mark.parametrize("strategy", ["native", "grok"])
def test_grok_syntax_parses_like_raw_regex(spark, strategy):
    df = spark.createDataFrame(ROWS, "id long, message string")

    def parse(regex):
        spec = PipelineSpec.from_dict(
            {"Parser": {"Mode": "regex", "Regex": regex}}
        )
        res = CompiledPipeline(spec, regex_strategy=strategy).transform(df)
        return sorted(
            (r["id"], r["ts"], r["ms"], r["levelname"], r["body"])
            for r in res.frame.collect()
        )

    got, want = parse(WAF_LINE_GROK), parse(WAF_LINE_RAW)
    assert got == want
    assert got[0][3] == "ERROR" and got[1][3] == "INFO"
    assert got[2][1] is None  # no match: columns stay NULL, row survives
