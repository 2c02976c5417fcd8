"""Template render parity: compiled concat tree vs the Python oracle
(which transcribes template.go:8-31)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from logagent_spark import oracle
from logagent_spark.operators.template import compile_template, split_template

SCHEMA = T.StructType([
    T.StructField("message", T.StringType()),
    T.StructField("a", T.StringType()),
    T.StructField("b", T.StringType()),
    T.StructField("n", T.LongType()),
])

ROWS = [
    {"message": "hello world", "a": "A", "b": "B", "n": 1},
    {"message": None, "a": "", "b": "with ${weird}", "n": None},
    {"message": "m", "a": None, "b": "B", "n": 7},
    {"message": "x", "a": "ä/漢", "b": None, "n": 0},
]

TEMPLATES = [
    "",                                  # empty -> msg["message"] or ""
    "plain text only",
    "${a}",
    "pre ${a} mid ${b} post",
    "${missing} stays",
    "${n} non-string stays literal",     # Long column -> literal survives
    "${a}${b}${a}",
    "$${a}} trim-set edge",              # Trim(match, "${}") edge
    "nested ${a ${b} tail",              # non-greedy: `${a ${b}` -> key "a ${b"?? no: match is ${a } ... exercised
    "unclosed ${a",
]


def test_split_template_roundtrip():
    for t in TEMPLATES:
        parts = split_template(t)
        assert "".join(p[0] for p in parts) == t


def test_template_parity(spark):
    schema_map = {f.name: f.dataType for f in SCHEMA.fields}
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    for t in TEMPLATES:
        got = [
            r[0]
            for r in df.select(compile_template(t, schema_map)).collect()
        ]
        want = [
            oracle.render_template(t, {k: v for k, v in row.items() if v is not None})
            for row in ROWS
        ]
        assert got == want, f"template {t!r}: {got} != {want}"
