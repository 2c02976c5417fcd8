"""Property-based parity: random inputs through the compiled Column
expressions must match the Python oracle byte-for-byte. Each example is
a BATCH of rows (one Spark job per hypothesis example keeps wall-time
sane at max_examples=8)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from logagent_spark import oracle
from logagent_spark.config import (
    ParserSpec,
    PipelineSpec,
    RewriteSpec,
    ValidatorSpec,
)
from logagent_spark.operators.template import compile_template
from logagent_spark.plans.pipeline import DROP_COL, CompiledPipeline

# text with the troublemakers: delimiters, ${}, unicode, spaces, newlines
TEXT = st.text(alphabet="abcX $,{}|:\n\t.€漢", max_size=30)
SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _msg_df(spark, messages):
    return spark.createDataFrame(
        [(i, m) for i, m in enumerate(messages)],
        schema=T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("message", T.StringType(), True),
        ]),
    )


@given(msgs=st.lists(TEXT, min_size=1, max_size=40),
       delim=st.sampled_from([",", "|", " ", "::", "$"]),
       ncols=st.integers(1, 4))
@settings(**SETTINGS)
def test_csv_parser_property(spark, msgs, delim, ncols):
    parser = ParserSpec(
        mode="csv", delimiters=delim,
        columns=[f"c{i}" for i in range(ncols)],
    )
    pipe = CompiledPipeline(PipelineSpec(parser=parser))
    got = {
        r["id"]: r.asDict()
        for r in pipe.transform(_msg_df(spark, msgs)).frame.collect()
    }
    for i, m in enumerate(msgs):
        msg = {"id": i, "message": m}
        oracle.parse_row(parser, msg)
        for c in parser.columns:
            assert got[i].get(c) == msg.get(c), (m, c, got[i], msg)


@given(template=TEXT,
       vals=st.lists(
           st.one_of(st.none(), TEXT, st.integers(-5, 5)),
           min_size=2, max_size=2))
@settings(**SETTINGS)
def test_template_property(spark, template, vals):
    schema = T.StructType([
        T.StructField("message", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("n", T.LongType()),
    ])
    a = vals[0] if isinstance(vals[0], (str, type(None))) else str(vals[0])
    n = vals[1] if isinstance(vals[1], (int, type(None))) else None
    rows = [{"message": "m0", "a": a, "n": n}]
    df = spark.createDataFrame(rows, schema=schema)
    smap = {f.name: f.dataType for f in schema.fields}
    got = df.select(compile_template(template, smap).alias("r")).collect()[0]["r"]
    want = oracle.render_template(
        template, {k: v for k, v in rows[0].items() if v is not None}
    )
    assert got == want, (template, rows[0], got, want)


@given(msgs=st.lists(TEXT, min_size=1, max_size=40),
       n=st.integers(0, 12),
       mode=st.sampled_from(["maxlength", "minlength"]))
@settings(**SETTINGS)
def test_bytelength_validator_property(spark, msgs, n, mode):
    v = ValidatorSpec(mode=mode, column="message", number=n)
    spec = PipelineSpec(
        validators=[v],
        handlers=[],
    )
    pipe = CompiledPipeline(spec)
    got = {
        r["id"]: r[DROP_COL] is None
        for r in pipe.transform(_msg_df(spark, msgs)).frame.collect()
    }
    for i, m in enumerate(msgs):
        want = oracle.validate_row(v, {"message": m})
        assert got[i] == want, (m, n, mode)


@given(msgs=st.lists(TEXT, min_size=1, max_size=30),
       old=TEXT.filter(lambda s: len(s) > 0),
       new=TEXT)
@settings(**SETTINGS)
def test_subst_property(spark, msgs, old, new):
    rw = RewriteSpec(mode="subst", column="message", old=old, value=new)
    pipe = CompiledPipeline(PipelineSpec(rewrites=[rw]))
    got = {
        r["id"]: r["message"]
        for r in pipe.transform(_msg_df(spark, msgs)).frame.collect()
    }
    for i, m in enumerate(msgs):
        msg = {"message": m}
        oracle.rewrite_row(rw, msg)
        assert got[i] == msg["message"], (m, old, new)


@given(msgs=st.lists(TEXT, min_size=1, max_size=30),
       mapping=st.dictionaries(TEXT, TEXT, min_size=1, max_size=5))
@settings(**SETTINGS)
def test_mapping_property(spark, msgs, mapping):
    rw = RewriteSpec(mode="mapping", column="message", mapping=mapping)
    pipe = CompiledPipeline(PipelineSpec(rewrites=[rw]))
    got = {
        r["id"]: (r[DROP_COL], r["message"])
        for r in pipe.transform(_msg_df(spark, msgs)).frame.collect()
    }
    for i, m in enumerate(msgs):
        msg = {"message": m}
        try:
            oracle.rewrite_row(rw, msg)
            assert got[i] == (None, msg["message"]), (m, mapping)
        except oracle.RowError as e:
            assert got[i][0] == e.reason, (m, mapping, got[i])


# ---------------------------------------------------------------------------
# round-2 operators vs pure-Python oracles


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=1, max_size=60,
    ),
    gap=st.integers(1, 2000),
)
@settings(**SETTINGS)
def test_sessionize_matches_python(spark, rows, gap):
    """Random (key, second) streams: session numbering must equal the
    sequential python fold (> gap splits, == gap stays)."""
    from pyspark.sql import functions as F

    from logagent_spark.operators.sessions import sessionize

    data = [(k, float(sec), i) for i, (k, sec) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k long, sec double, rid long"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "rid")
    got = {
        r["rid"]: r["session_n"]
        for r in sessionize(df, "k", "ts", gap_s=float(gap),
                            order_cols=["ts", "rid"]).collect()
    }
    # python oracle
    want = {}
    bykey: dict = {}
    for k, sec, rid in sorted(data, key=lambda x: (x[0], x[1], x[2])):
        prev, n = bykey.get(k, (None, 0))
        if prev is None or sec - prev > gap:
            n += 1
        bykey[k] = (sec, n)
        want[rid] = n
    assert got == want


@given(
    lefts=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    rights=st.lists(st.integers(0, 1000), min_size=0, max_size=20),
)
@settings(**SETTINGS)
def test_asof_matches_python_bisect(spark, lefts, rights):
    """Random event times vs snapshot times on one key: the carried
    value must equal the bisect answer (greatest right ts <= left ts)."""
    import bisect

    from pyspark.sql import functions as F

    from logagent_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, float(s), i) for i, s in enumerate(lefts)],
        "k long, sec double, lid long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "lid")
    rsorted = sorted(set(rights))
    right = spark.createDataFrame(
        [(1, float(s), float(s) * 2) for s in rsorted] or [(2, 0.0, 0.0)],
        "k long, rsec double, v double",
    ).select("k", F.timestamp_seconds("rsec").alias("rts"), "v")

    got = {
        r["lid"]: r["v"]
        for r in asof_join_backward(
            left, right, key="k", left_ts="ts", right_ts="rts",
            value_cols=["v"], order_cols=["lid"],
        ).collect()
    }
    for i, s in enumerate(lefts):
        j = bisect.bisect_right(rsorted, s) - 1
        want = float(rsorted[j]) * 2 if j >= 0 else None
        assert got[i] == want, (i, s, got[i], want)


HTMLISH = st.text(
    alphabet="ab<>&\"' ;/scriptlye=\n\t€漢&amp;lt", max_size=60
)


@given(texts=st.lists(HTMLISH, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_html_escape_extract_round_trip_property(spark, texts):
    """For ANY text — including strings full of markup metacharacters
    and pre-escaped-looking sequences — escape -> wrap in a page with
    script/style noise -> extract must return the original bytes."""
    from pyspark.sql import functions as F

    from logagent_spark.operators.web import escape_html_text, html_to_text

    df = _msg_df(spark, texts)
    wrapped = F.concat(
        F.lit('<html><head><style a="b">x{y:z}</style></head><body><p>'),
        escape_html_text(F.col("message")),
        F.lit('</p><script>if(1<2){t("&");}</script></body></html>'),
    )
    out = df.select("id", "message",
                    html_to_text(wrapped).alias("rt")).collect()
    for r in out:
        assert r["rt"] == r["message"], (r["message"], r["rt"])
