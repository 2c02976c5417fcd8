"""Rewrite-chain parity vs the oracle: set/subst/mapping/jsonify/
unjsonify/splicing composition order, drop accounting, lookup join."""

from __future__ import annotations

from pyspark.sql import types as T

from logagent_spark import oracle
from logagent_spark.config import PipelineSpec, RewriteSpec
from logagent_spark.plans.pipeline import DROP_COL, CompiledPipeline

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("message", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("n", T.LongType()),
])

ROWS = [
    {"id": 0, "message": "aaa bbb", "lang": "en", "n": 1},
    {"id": 1, "message": "zzz", "lang": "de", "n": None},
    {"id": 2, "message": None, "lang": "xx", "n": 3},       # mapping miss
    {"id": 3, "message": "a{a", "lang": None, "n": 4},      # null key passes mapping
    {"id": 4, "message": '{"k":7,"s":"v"}', "lang": "en", "n": 5},
]


def _run_both(spark, spec: PipelineSpec):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    pipe = CompiledPipeline(spec)
    res = pipe.transform(df)
    got = {r["id"]: r.asDict() for r in res.frame.collect()}

    want = {}
    for row in ROWS:
        msg = {k: v for k, v in row.items() if v is not None}
        reason = None
        try:
            for rw in spec.rewrites:
                oracle.rewrite_row(rw, msg)
        except oracle.RowError as e:
            reason = e.reason
        msg["_reason"] = reason
        want[row["id"]] = msg
    return got, want


def _assert_parity(got, want, cols):
    for i, w in want.items():
        g = got[i]
        assert g[DROP_COL] == w["_reason"], (g, w)
        if w["_reason"] is None:
            for c in cols:
                gv = g.get(c)
                wv = w.get(c)
                if isinstance(gv, (bytes, bytearray)) or isinstance(wv, bytes):
                    gv = bytes(gv) if gv is not None else None
                assert gv == wv, (c, g, w)


def test_set_subst_splicing_chain(spark):
    spec = PipelineSpec(rewrites=[
        RewriteSpec(mode="set", column="env", value="prod"),
        RewriteSpec(mode="subst", column="message", old="a", value="X"),
        RewriteSpec(mode="subst", column="missing", old="a", value="X"),
        RewriteSpec(mode="splicing", key="joined",
                    columns=["env", "message", "n", "nope"], delimiters="|"),
        RewriteSpec(mode="subst", column="joined", old="|", value="/"),
    ])
    got, want = _run_both(spark, spec)
    _assert_parity(got, want, ["env", "message", "joined"])


def test_mapping_hit_miss_null(spark):
    spec = PipelineSpec(rewrites=[
        RewriteSpec(mode="mapping", column="lang",
                    mapping={"en": "english", "de": "german"}),
        RewriteSpec(mode="set", column="after", value="ran"),
    ])
    got, want = _run_both(spark, spec)
    _assert_parity(got, want, ["lang", "after"])
    # xx row must be dropped with the mapping reason
    assert got[2][DROP_COL] == "mapping_miss:lang"
    # null lang passes through unmapped (Go type-assert miss -> no-op)
    assert got[3][DROP_COL] is None and got[3]["lang"] is None


def test_jsonify_rewrite_and_unjsonify(spark):
    spec = PipelineSpec(rewrites=[
        RewriteSpec(mode="jsonify", column="message",
                    types={"k": "double", "s": "string"}),
    ])
    got, want = _run_both(spark, spec)
    # only row 4 parses; others drop (non-JSON strings) or pass (null msg)
    assert got[4][DROP_COL] is None
    assert got[4]["message_k"] == 7.0 and got[4]["message_s"] == "v"
    assert got[0][DROP_COL] == "parse_error:jsonify_rewrite:message"
    assert got[2][DROP_COL] is None  # null message: no-op


def test_unjsonify_string_encoding(spark):
    spec = PipelineSpec(rewrites=[
        RewriteSpec(mode="unjsonify", column="message"),
    ])
    got, want = _run_both(spark, spec)
    _assert_parity(got, want, ["message"])


def test_lookup_broadcast_enrich(spark):
    lookup_cfg = {
        "key": "lang",
        "table": [
            {"lang": "en", "lang_name": "English", "geo": "US"},
            {"lang": "de", "lang_name": "German", "geo": "DE"},
        ],
        "output": {"lang_name": "string", "geo": "string"},
        "on_miss": "drop",
    }
    spec = PipelineSpec(rewrites=[RewriteSpec(mode="lookup", lookup=lookup_cfg)])
    got, want = _run_both(spark, spec)
    _assert_parity(got, want, ["lang", "lang_name", "geo"])
    assert got[2][DROP_COL] == "lookup_miss:lang"
    assert got[3][DROP_COL] is None  # null key passes with null outputs


def test_command_rewrite(spark):
    """Reference runs the bare binary per row and stores raw stdout
    (task.go:336-351); our batch engine executes it once at compile time
    — deterministic commands give identical columns (documented
    divergence, SURVEY.md §2.3). `/bin/echo` with no args emits "\\n"."""
    spec = PipelineSpec(rewrites=[
        RewriteSpec(mode="command", column="out", command="/bin/echo"),
    ])
    got, want = _run_both(spark, spec)
    _assert_parity(got, want, ["out"])
    assert all(r["out"] == "\n" for r in got.values())


def test_command_rewrite_failure_is_config_fatal(spark):
    """A failing command errors at compile time (the reference drops
    every row and logs per message — compile-fatal is the batch
    equivalent of a 100% drop)."""
    import pytest as _pytest

    spec = PipelineSpec(rewrites=[
        RewriteSpec(mode="command", column="out", command="/bin/false"),
    ])
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    with _pytest.raises(Exception):
        CompiledPipeline(spec).transform(df)


def test_scrub_rewrite(spark):
    """scrub (extension): ordered pattern->token redaction, all
    occurrences; non-string/missing column is a no-op like subst."""
    from pyspark.sql import functions as F

    from logagent_spark.config import PipelineSpec, SpecError
    from logagent_spark.plans.pipeline import CompiledPipeline

    spec = PipelineSpec.from_dict({
        "Rewrites": [{"Mode": "scrub", "Column": "msg", "Mapping": {
            r"[a-z]+@[a-z.]+": "<EMAIL>",
            r"\d+": "<NUM>",
        }}],
    })
    df = spark.createDataFrame(
        [(0, "mail me at bob@x.co or 555 1234"), (1, None)],
        "id long, msg string",
    )
    got = {r["id"]: r["msg"] for r in
           CompiledPipeline(spec).transform(df).frame.collect()}
    assert got[0] == "mail me at <EMAIL> or <NUM> <NUM>"
    assert got[1] is None
    # non-string column: no-op
    spec2 = PipelineSpec.from_dict({
        "Rewrites": [{"Mode": "scrub", "Column": "id",
                      "Mapping": {r"\d": "x"}}],
    })
    out = CompiledPipeline(spec2).transform(df).frame
    assert {r["id"] for r in out.collect()} == {0, 1}
    # config validation: mapping required
    import pytest as _pt
    with _pt.raises(SpecError):
        PipelineSpec.from_dict(
            {"Rewrites": [{"Mode": "scrub", "Column": "msg"}]})
    _ = F
