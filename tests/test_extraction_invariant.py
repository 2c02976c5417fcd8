"""BASELINE per-row invariant: byte-identical extracted text per url.

Pages carry the log-line payload EMBEDDED in filler prose (F1 bench
shape); the engine (both regex strategies + the grok dictionary) must
recover exactly the bytes the oracle recovers, keyed by url."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logagent_spark import oracle
from logagent_spark.config import ParserSpec, PipelineSpec
from logagent_spark.datagen import EMBEDDED_WAF_REGEX, gen_pages, pages_df
from logagent_spark.plans.pipeline import CompiledPipeline


@pytest.fixture(scope="module")
def filler_pages(spark):
    sdf = pages_df(spark, 600, seed=21, n_hosts=20, filler_sentences=6)
    pdf = gen_pages(600, seed=21, n_hosts=20, filler_sentences=6)
    return sdf, pdf.to_dict("records")


@pytest.mark.parametrize("strategy", ["native", "grok"])
def test_embedded_extraction_byte_identical(spark, filler_pages, strategy):
    sdf, rows = filler_pages
    spec = PipelineSpec(
        parser=ParserSpec(mode="regex", regex=EMBEDDED_WAF_REGEX)
    )
    pipe = CompiledPipeline(spec, regex_strategy=strategy)
    res = pipe.transform(sdf.withColumn("message", F.col("text")))
    got = {
        r["url"]: (r["ts"], r["levelname"], r["body"])
        for r in res.frame.select("url", "ts", "levelname", "body").collect()
    }
    n_matched = 0
    for row in rows:
        msg = {"url": row["url"], "message": row["text"]}
        oracle.parse_row(spec.parser, msg)
        want = (msg.get("ts"), msg.get("levelname"), msg.get("body"))
        assert got[row["url"]] == want, (strategy, row["url"])
        if want[0] is not None:
            n_matched += 1
    assert n_matched > 300  # the waf fraction actually matched


def test_grok_dictionary_on_pages(spark, filler_pages):
    sdf, rows = filler_pages
    parser = ParserSpec(mode="grok", patterns={
        "waf": EMBEDDED_WAF_REGEX,
        "json": r'"level":"(?P<jlevel>[A-Z]+)"',
    })
    pipe = CompiledPipeline(PipelineSpec(parser=parser))
    res = pipe.transform(sdf.withColumn("message", F.col("text")))
    got = {
        r["url"]: (r["grok_pattern"], r["body"], r["jlevel"])
        for r in res.frame.select(
            "url", "grok_pattern", "body", "jlevel"
        ).collect()
    }
    for row in rows:
        msg = {"url": row["url"], "message": row["text"]}
        oracle.parse_row(parser, msg)
        want = (msg.get("grok_pattern"), msg.get("body"), msg.get("jlevel"))
        assert got[row["url"]] == want, row["url"]
