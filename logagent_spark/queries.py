"""Driver-facing query suite: every implemented operator as a
(spark_callable, duckdb_oracle_sql) pair over the shared testdata tables.

Contract (driver): each callable takes (spark, sf_dir) and returns a
DataFrame; the oracle SQL runs on DuckDB views named after the tables.
Column names are aliased identically on both sides; float outputs are
emitted as floor-ppm BIGINTs so value hashes can't diverge on formatting.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logagent_spark.config import PipelineSpec
from logagent_spark.operators import curation as cu
from logagent_spark.operators import dedup as dd
from logagent_spark.operators import similarity as sim
from logagent_spark.operators import textstats as ts
from logagent_spark.operators.template import compile_template
from logagent_spark.operators.validators import compile_gate
from logagent_spark.plans.pipeline import CompiledPipeline

HEAD_REGEX = r"^(?P<head>\w+) (?P<rest>.*)$"
TOKEN_REGEX_SQL = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ppm(col) -> F.Column:
    return F.floor(col * 1000000).cast("long")


# ---------------------------------------------------------------------------
# §2.2 parsers

def q_parse_regex(spark, sf_dir):
    spec = PipelineSpec.from_dict({
        "Parser": {"Mode": "regex", "Regex": HEAD_REGEX},
    })
    docs = _t(spark, sf_dir, "documents").withColumn("message", F.col("text"))
    res = CompiledPipeline(spec).transform(docs)
    return res.frame.filter(F.col("head").isNotNull()).select(
        "doc_id", "head", "rest"
    )


SQL_PARSE_REGEX = r"""
SELECT doc_id,
       regexp_extract(text, '^(\w+) (.*)$', 1) AS head,
       regexp_extract(text, '^(\w+) (.*)$', 2) AS rest
FROM documents
WHERE regexp_matches(text, '^(\w+) (.*)$')
"""


def q_parse_csv(spark, sf_dir):
    spec = PipelineSpec.from_dict({
        "Parser": {"Mode": "csv", "Delimiters": " ",
                   "Columns": ["c1", "c2", "c3"]},
    })
    docs = _t(spark, sf_dir, "documents").withColumn("message", F.col("text"))
    res = CompiledPipeline(spec).transform(docs)
    return res.frame.filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    ).select("doc_id", "c1", "c2", "c3")


SQL_PARSE_CSV = r"""
SELECT doc_id,
       split_part(text, ' ', 1) AS c1,
       split_part(text, ' ', 2) AS c2,
       regexp_extract(text, '^[^ ]* [^ ]* (.*)$', 1) AS c3
FROM documents
WHERE len(string_split(text, ' ')) >= 3
"""


def q_parse_json(spark, sf_dir):
    spec = PipelineSpec.from_dict({
        "Parser": {"Mode": "jsonify", "Columns": ["k"],
                   "Types": {"k": "double"}},
    })
    ev = _t(spark, sf_dir, "events").withColumn("message", F.col("props"))
    res = CompiledPipeline(spec).transform(ev)
    return res.frame.select("event_id", F.col("k").cast("long").alias("k_val"))


SQL_PARSE_JSON = """
SELECT event_id,
       CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS BIGINT) AS k_val
FROM events
"""


def q_parse_grok_dict(spark, sf_dir):
    """Grok dictionary over events: json-ish lines hit the `kv` pattern,
    others fall through to `word`; first match wins (ordered)."""
    spec = PipelineSpec.from_dict({
        "Parser": {"Mode": "grok", "Patterns": {
            "kv": r'"k": (?P<kval>\d+)',
            "word": r"^(?P<w>[a-z]+)",
        }},
    })
    ev = _t(spark, sf_dir, "events").withColumn(
        "message", F.concat(F.col("event_type"), F.lit(" "), F.col("props"))
    )
    res = CompiledPipeline(spec).transform(ev)
    return res.frame.select("event_id", "grok_pattern", "kval", "w")


def q_parse_grok_dict_udf(spark, sf_dir):
    """Same dictionary through the Arrow-vectorized pandas-UDF strategy
    (one re.search per row, all groups off the match object) — both
    physical strategies answer the same oracle."""
    spec = PipelineSpec.from_dict({
        "Parser": {"Mode": "grok", "Patterns": {
            "kv": r'"k": (?P<kval>\d+)',
            "word": r"^(?P<w>[a-z]+)",
        }},
    })
    ev = _t(spark, sf_dir, "events").withColumn(
        "message", F.concat(F.col("event_type"), F.lit(" "), F.col("props"))
    )
    res = CompiledPipeline(spec, regex_strategy="grok").transform(ev)
    return res.frame.select("event_id", "grok_pattern", "kval", "w")


SQL_PARSE_GROK_DICT = r"""
WITH m AS (
  SELECT event_id, event_type || ' ' || props AS message FROM events
)
SELECT event_id,
       CASE WHEN regexp_matches(message, '"k": (\d+)') THEN 'kv'
            WHEN regexp_matches(message, '^([a-z]+)') THEN 'word'
       END AS grok_pattern,
       CASE WHEN regexp_matches(message, '"k": (\d+)')
            THEN regexp_extract(message, '"k": (\d+)', 1) END AS kval,
       CASE WHEN NOT regexp_matches(message, '"k": (\d+)')
             AND regexp_matches(message, '^([a-z]+)')
            THEN regexp_extract(message, '^([a-z]+)', 1) END AS w
FROM m
"""


# ---------------------------------------------------------------------------
# §2.4 validators

def q_validate_filter(spark, sf_dir):
    spec = PipelineSpec.from_dict({
        "Validators": [
            {"Mode": "minlength", "Column": "text", "Number": 200},
            {"Mode": "regex", "Column": "text", "Regex": "the"},
            {"Mode": "maxvalue", "Column": "n_chars", "Number": 500},
        ],
    })
    docs = _t(spark, sf_dir, "documents")
    schema = {f.name: f.dataType for f in docs.schema.fields}
    gate = compile_gate(spec.validators, schema)
    return docs.filter(F.coalesce(gate, F.lit(False))).select("doc_id", "lang")


SQL_VALIDATE_FILTER = """
SELECT doc_id, lang FROM documents
WHERE strlen(text) >= 200
  AND regexp_matches(text, 'the')
  AND n_chars <= 500
"""


# ---------------------------------------------------------------------------
# §2.3 rewrites

def q_rewrite_enrich(spark, sf_dir):
    spec = PipelineSpec.from_dict({
        "Rewrites": [
            {"Mode": "set", "Column": "pipeline", "Value": "docs"},
            {"Mode": "splicing", "Key": "tag",
             "Columns": ["pipeline", "lang", "source"], "Delimiters": ":"},
            {"Mode": "subst", "Column": "tag", "Old": "src", "Value": "source-"},
            {"Mode": "mapping", "Column": "lang",
             "Mapping": {"en": "english", "zh": "chinese", "de": "german",
                         "fr": "french", "es": "spanish"}},
        ],
    })
    docs = _t(spark, sf_dir, "documents")
    res = CompiledPipeline(spec).transform(docs)
    return res.frame.select("doc_id", "tag", F.col("lang").alias("lang_name"))


SQL_REWRITE_ENRICH = """
SELECT doc_id,
       replace(concat_ws(':', 'docs', lang, source), 'src', 'source-') AS tag,
       CASE lang WHEN 'en' THEN 'english' WHEN 'zh' THEN 'chinese'
                 WHEN 'de' THEN 'german' WHEN 'fr' THEN 'french'
                 WHEN 'es' THEN 'spanish' END AS lang_name
FROM documents
"""


def q_rewrite_lookup_join(spark, sf_dir):
    spec = PipelineSpec.from_dict({
        "Rewrites": [
            {"Mode": "lookup", "Lookup": {
                "key": "lang",
                "table": [
                    {"lang": "en", "geo": "US"}, {"lang": "zh", "geo": "CN"},
                    {"lang": "de", "geo": "DE"},
                ],
                "output": {"geo": "string"},
                "on_miss": "drop",
            }},
        ],
    })
    docs = _t(spark, sf_dir, "documents")
    res = CompiledPipeline(spec).transform(docs)
    return res.frame.filter(F.col("_drop_reason").isNull()).select(
        "doc_id", "lang", "geo"
    )


SQL_REWRITE_LOOKUP = """
SELECT d.doc_id, d.lang, l.geo
FROM documents d
JOIN (VALUES ('en','US'), ('zh','CN'), ('de','DE')) l(lang, geo)
  ON d.lang = l.lang
"""


# ---------------------------------------------------------------------------
# §2.5 router / sinks + BASELINE aggregation

ROUTER_SPEC = {
    "Handlers": [
        {"Mode": "stream", "Name": "errors",
         "Template": "${event_type} ${props}",
         "Validators": [
             {"Mode": "value", "Column": "event_type", "Value": "error"},
         ]},
        {"Mode": "stream", "Name": "signups",
         "Template": "${event_type} ${props}",
         "Validators": [
             {"Mode": "value", "Column": "event_type", "Value": "signup"},
         ]},
        {"Mode": "stream", "Name": "long_props",
         "Template": "${props}",
         "Validators": [
             {"Mode": "minlength", "Column": "props", "Number": 9},
         ]},
        {"Mode": "stream", "Name": "all_events", "Template": "${event_type}"},
    ],
}


def _routed_events(spark, sf_dir):
    spec = PipelineSpec.from_dict(ROUTER_SPEC)
    pipe = CompiledPipeline(spec)
    ev = _t(spark, sf_dir, "events")
    res = pipe.transform(ev)
    return pipe, pipe.routed(res)


def q_route_fanout_counts(spark, sf_dir):
    pipe, routed = _routed_events(spark, sf_dir)
    return pipe.sink_counts(routed)


SQL_ROUTE_FANOUT = """
SELECT * FROM (
  SELECT 'errors' AS sink, count(*) AS n FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT 'signups', count(*) FROM events WHERE event_type = 'signup'
  UNION ALL
  SELECT 'long_props', count(*) FROM events WHERE strlen(props) >= 9
  UNION ALL
  SELECT 'all_events', count(*) FROM events
) WHERE n > 0
"""


def q_route_rendered(spark, sf_dir):
    _, routed = _routed_events(spark, sf_dir)
    return routed.filter(F.col("sink") == "errors").select(
        "event_id", "rendered"
    )


SQL_ROUTE_RENDERED = """
SELECT event_id, event_type || ' ' || props AS rendered
FROM events WHERE event_type = 'error'
"""


def q_route_dead_letter(spark, sf_dir):
    spec = PipelineSpec.from_dict({
        "Rewrites": [
            {"Mode": "mapping", "Column": "lang",
             "Mapping": {"en": "english", "zh": "chinese", "de": "german"}},
        ],
        "Handlers": [{"Mode": "stream", "Name": "out", "Template": "${lang}"}],
    })
    pipe = CompiledPipeline(spec)
    res = pipe.transform(_t(spark, sf_dir, "documents"))
    return pipe.drop_counts(pipe.dead_letter(res))


SQL_ROUTE_DEAD_LETTER = """
SELECT 'mapping_miss:lang' AS reason, count(*) AS n
FROM documents WHERE lang NOT IN ('en', 'zh', 'de')
"""


def q_agg_sink_counts(spark, sf_dir):
    pipe, routed = _routed_events(spark, sf_dir)
    return pipe.sink_counts(routed, lang_col="event_type", ts_col="ts",
                            bucket="day")


SQL_AGG_SINK_COUNTS = """
WITH routed AS (
  SELECT 'errors' AS sink, event_type, ts FROM events WHERE event_type='error'
  UNION ALL
  SELECT 'signups', event_type, ts FROM events WHERE event_type='signup'
  UNION ALL
  SELECT 'long_props', event_type, ts FROM events WHERE strlen(props) >= 9
  UNION ALL
  SELECT 'all_events', event_type, ts FROM events
)
SELECT sink, event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS time_bucket,
       count(*) AS n
FROM routed GROUP BY 1, 2, 3
"""


def q_agg_distinct_salted(spark, sf_dir):
    """Skew-robust countDistinct: event_type is low-cardinality (each
    key is hot), so phase 1 shuffles on (key, hash(user) % buckets) and
    phase 2 sums exact disjoint partials — no single reducer ever holds
    a hot key's full distinct state."""
    from logagent_spark.plans.skew import count_distinct_salted

    ev = _t(spark, sf_dir, "events")
    return count_distinct_salted(ev, ["event_type"], "user_id")


SQL_AGG_DISTINCT_SALTED = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


def q_template_render(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    schema = {f.name: f.dataType for f in docs.schema.fields}
    tmpl = "[${lang}] ${source} :: ${text} ${nope}"
    return docs.select(
        "doc_id", compile_template(tmpl, schema).alias("rendered")
    )


SQL_TEMPLATE_RENDER = """
SELECT doc_id,
       '[' || lang || '] ' || source || ' :: ' || text || ' ${nope}' AS rendered
FROM documents
"""


def q_syslog_decode(spark, sf_dir):
    from logagent_spark.sources import syslog_decode

    ev = _t(spark, sf_dir, "events").withColumn(
        "message",
        F.concat(
            F.lit("<"),
            ((F.col("event_id") % 24) * 8 + F.col("event_id") % 8).cast("string"),
            F.lit(">"),
            F.col("event_type"),
            F.lit("\x00junk"),
        ),
    )
    out = syslog_decode(ev, with_priority=True)
    return out.select("event_id", "message", "facility", "severity")


SQL_SYSLOG_DECODE = """
SELECT event_id, event_type AS message,
       event_id % 24 AS facility, event_id % 8 AS severity
FROM events
"""


# ---------------------------------------------------------------------------
# training-data ops

def q_dedup_exact_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        dd.content_hash(F.col("text")).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("h").alias("n_unique"),
    )


SQL_DEDUP_EXACT = r"""
SELECT count(*) AS n_rows,
       count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_unique
FROM documents
"""


def q_dedup_exact_keep(spark, sf_dir):
    """Exact dedup winners: smallest doc_id per normalized content hash
    (min-by aggregation + left-semi join — one shuffle on the uniform
    hash, no window sort)."""
    docs = _t(spark, sf_dir, "documents")
    return dd.dedup_exact(docs, "doc_id", "text").select("doc_id", "lang")


SQL_DEDUP_EXACT_KEEP = r"""
SELECT doc_id, lang FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
)
"""


def q_text_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    n = ts.token_count(c)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        ts.bpe_ish_token_count(c).alias("n_bpe_tokens"),
        _ppm(ts.stopword_ratio(c, "en")).alias("stopword_ppm"),
        _ppm(ts.punct_ratio(c)).alias("punct_ppm"),
        ts.langid(c).alias("lang_pred"),
        ts.fingerprint(c).alias("fingerprint"),
    )


def _sql_stopword_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in ts.STOPWORDS[lang])
    return (
        "len(list_filter(string_split_regex(lower(text), ' +'), "
        f"x -> x <> '' AND list_contains([{words}], x)))"
    )


SQL_TEXT_STATS = f"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, ' +'), x -> x <> '')) AS n_tokens,
         len(regexp_extract_all(text, '{TOKEN_REGEX_SQL}')) AS n_bpe_tokens,
         {_sql_stopword_hits('en')} AS h_en,
         {_sql_stopword_hits('de')} AS h_de,
         {_sql_stopword_hits('fr')} AS h_fr,
         {_sql_stopword_hits('es')} AS h_es,
         strlen(text) AS total_bytes,
         strlen(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS nonpunct_bytes,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
)
SELECT doc_id, n_tokens, n_bpe_tokens,
       CASE WHEN n_tokens > 0
            THEN CAST(floor(h_en * 1000000.0 / n_tokens) AS BIGINT)
            ELSE 0 END AS stopword_ppm,
       CASE WHEN total_bytes > 0
            THEN CAST(floor((total_bytes - nonpunct_bytes) * 1000000.0 / total_bytes) AS BIGINT)
            ELSE 0 END AS punct_ppm,
       CASE WHEN h_en > 0 AND h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
            WHEN h_de > 0 AND h_de >= h_fr AND h_de >= h_es THEN 'de'
            WHEN h_fr > 0 AND h_fr >= h_es THEN 'fr'
            WHEN h_es > 0 THEN 'es'
            ELSE 'und' END AS lang_pred,
       fingerprint
FROM base
"""


def q_fingerprint_minshingle(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ts.min_shingle_fingerprint(F.col("text"), 5).alias("min_fp"),
    )


SQL_FINGERPRINT_MINSHINGLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(t) >= 5 THEN
         list_min(list_transform(
           generate_series(1, len(t) - 4),
           i -> md5(array_to_string(list_slice(t, i, i + 4), ' '))))
       ELSE md5(array_to_string(t, ' ')) END AS min_fp
FROM toks
"""


def q_quality_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    keep = (
        (ts.token_count(c) >= 10)
        & (ts.punct_ratio(c) < 0.05)
        & (ts.stopword_hits(c, "en") > 0)
    )
    return docs.filter(keep).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_QUALITY_FILTER = f"""
SELECT lang, count(*) AS n FROM documents
WHERE len(list_filter(string_split_regex(text, ' +'), x -> x <> '')) >= 10
  AND (strlen(text) - strlen(regexp_replace(text, '[^\\w\\s]', '', 'g')))
      * 1.0 / strlen(text) < 0.05
  AND {_sql_stopword_hits('en')} > 0
GROUP BY lang
"""


def q_similarity_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    # floor-ppm scores: identical IEEE sequential math on both engines,
    # and the top-k boundary is decided on the SAME quantized value
    scored = emb.select(
        "vec_id", _ppm(sim.cosine_to_query(F.col("embedding"), q)).alias("cos_ppm")
    )
    return scored.orderBy(F.col("cos_ppm").desc(), F.col("vec_id")).limit(10)


SQL_SIMILARITY_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         CAST(floor(list_cosine_similarity(embedding::DOUBLE[], q.qe) * 1000000) AS BIGINT) AS cos_ppm
  FROM embeddings, q
)
SELECT vec_id, cos_ppm FROM scored
ORDER BY cos_ppm DESC, vec_id LIMIT 10
"""


def q_embedding_near_dup_exact(spark, sf_dir):
    """Brute-force embedding near-dup pairs — the exact baseline the
    hyperplane-LSH path (embedding_near_dup) approximates. All-pairs is
    O(n^2): correct as an oracle-checked baseline at test scale; the
    scale path is the LSH bucketing."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    # norms depend on ONE side each: hoist them out of the O(n^2) pair
    # expression (3 interpreted 64-element folds per pair -> 1). The
    # arithmetic dot/(na*nb) is unchanged, so floor-ppm stays bitwise
    # identical to the single-expression form and to DuckDB.
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    a = emb.select(F.col("vec_id").alias("a"),
                   F.col("embedding").alias("_ea"), norm.alias("_na"))
    b = emb.select(F.col("vec_id").alias("b"),
                   F.col("embedding").alias("_eb"), norm.alias("_nb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    dot = F.aggregate(
        F.zip_with(F.col("_ea"), F.col("_eb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0),
        dot / (F.col("_na") * F.col("_nb")),
    ).otherwise(F.lit(0.0))
    return pairs.select(
        "a", "b", _ppm(cos).alias("cos_ppm")
    ).filter(F.col("cos_ppm") >= 400000)


SQL_EMBEDDING_NEAR_DUP_EXACT = """
WITH p AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         CAST(floor(list_cosine_similarity(
             a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000) AS BIGINT)
           AS cos_ppm
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT a, b, cos_ppm FROM p WHERE cos_ppm >= 400000
"""


# ---------------------------------------------------------------------------
# LSH / hashing ops — every hash in these pipelines is md5- or
# literal-plane-based, so DuckDB reproduces the FULL pipeline (bucketing
# included), not just an invariant. The exceptions that remain rows-only
# are noted at the registry.

def q_dedup_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup pairs, exact-Jaccard verified. The oracle is
    all-pairs exact Jaccard: banding at r=2/b=16 misses a J>=0.5 pair
    with probability (1 - J^2)^16 <= 2.4e-11 at this corpus's minimum
    qualifying J (0.875), so LSH output == exact output deterministically
    at test scale. (Production presets trade r/b the other way — recall
    is the tunable, and the exact oracle is the measuring stick.)"""
    docs = _t(spark, sf_dir, "documents")
    out = dd.minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, num_hashes=32, bands=16
    )
    return out.select("a", "b", _ppm(F.col("jaccard")).alias("jaccard_ppm"))


SQL_DEDUP_MINHASH_PAIRS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(t) >= 5 THEN
      list_transform(generate_series(1, len(t) - 4),
                     i -> array_to_string(list_slice(t, i, i + 4), ' '))
    ELSE [array_to_string(t, ' ')] END) AS s
  FROM toks
), j AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.s, b.s)) AS i,
         len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT a, b, CAST(floor((i::DOUBLE / u) * 1000000) AS BIGINT) AS jaccard_ppm
FROM j WHERE i::DOUBLE / u >= 0.5
"""


def q_dedup_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dd.with_simhash(docs, "text").select("doc_id", "simhash")


# SimHash rebuilt in SQL: token hash = little-endian uint64 of
# md5(token)[:8] = DuckDB md5_number_upper; per-bit majority vote; the
# unsigned signature two's-complements into the BIGINT Spark emits.
_SQL_SIMHASH_CTE = r"""
toks AS (
  SELECT doc_id, list_transform(
    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
    t -> md5_number_upper(t)) AS hs
  FROM documents
), sig AS (
  SELECT doc_id,
    list_sum(list_transform(range(0, 64), b ->
      CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> b) & 1)) > len(hs)
           THEN (1::HUGEINT << b) ELSE 0::HUGEINT END))::HUGEINT AS u
  FROM toks
), s AS (
  SELECT doc_id,
         (CASE WHEN u >= 9223372036854775808::HUGEINT
               THEN u - 18446744073709551616::HUGEINT
               ELSE u END)::BIGINT AS simhash
  FROM sig
)
"""

SQL_DEDUP_SIMHASH = f"""
WITH {_SQL_SIMHASH_CTE}
SELECT doc_id, simhash FROM s
"""


def q_dedup_simhash_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3)


SQL_DEDUP_SIMHASH_PAIRS = f"""
WITH {_SQL_SIMHASH_CTE}
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE ((a.simhash >> 0) & 65535 = (b.simhash >> 0) & 65535
    OR (a.simhash >> 16) & 65535 = (b.simhash >> 16) & 65535
    OR (a.simhash >> 32) & 65535 = (b.simhash >> 32) & 65535
    OR (a.simhash >> 48) & 65535 = (b.simhash >> 48) & 65535)
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _sql_vec(v) -> str:
    # repr() round-trips float64 exactly; DuckDB's decimal/scientific
    # literal -> DOUBLE parse lands on the same bits
    return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


_IVF_CENTROIDS = sim.seeded_centroids(64, 8, seed=1)
_IVF_NPROBE = 4


def q_ann_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    indexed = sim.ivf_index(emb, "embedding", _IVF_CENTROIDS)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    probes = sim.ivf_probes(_IVF_CENTROIDS, q, _IVF_NPROBE)
    pruned = indexed.filter(F.col("ivf_bucket").isin(probes))
    scored = pruned.select(
        "vec_id",
        _ppm(sim.cosine_to_query(F.col("embedding"), q)).alias("cos_ppm"),
    )
    return scored.orderBy(F.col("cos_ppm").desc(), F.col("vec_id")).limit(10)


def _sql_ann_ivf() -> str:
    cent_rows = ", ".join(
        f"({i}, {_sql_vec(c)})" for i, c in enumerate(_IVF_CENTROIDS)
    )
    dots = "[" + ", ".join(
        f"list_dot_product(e, {_sql_vec(c)})" for c in _IVF_CENTROIDS
    ) + "]"
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
cents(cid, cv) AS (VALUES {cent_rows}),
probes AS (
  SELECT cid FROM cents, q
  ORDER BY list_dot_product(cv, qe) DESC, cid LIMIT {_IVF_NPROBE}
),
scored AS (
  SELECT vec_id,
         CAST(floor(list_cosine_similarity(e, q.qe) * 1000000) AS BIGINT)
           AS cos_ppm,
         list_position({dots}, list_max({dots})) - 1 AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings), q
)
SELECT vec_id, cos_ppm FROM scored
WHERE bucket IN (SELECT cid FROM probes)
ORDER BY cos_ppm DESC, vec_id LIMIT 10
"""


SQL_ANN_IVF_TOPK = _sql_ann_ivf()


_NDUP_N_PLANES = 8
_NDUP_N_CHUNKS = 4  # 4 bands of 2 bits: pairs within hamming<=3 always
                    # collide; measured recall 0.89 vs 0.71 at 3 bands
                    # on the driver corpus (BENCH.md sweep)
_NDUP_PLANES = dd.seeded_planes(_NDUP_N_PLANES, 64, seed=42)
_NDUP_THRESHOLD_PPM = 400000


def q_embedding_near_dup(spark, sf_dir):
    """Banded hyperplane-LSH near-dup pairs. The DuckDB oracle rebuilds
    the SAME LSH (the planes are shared literals), so the gate checks
    the full approximate pipeline; recall vs the exact baseline is
    measured separately in bench.py."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cand = dd.embedding_candidate_pairs(
        emb, "vec_id", "embedding", dim=64,
        n_planes=_NDUP_N_PLANES, seed=42, n_chunks=_NDUP_N_CHUNKS,
    )
    return cand.select(
        "a", "b", _ppm(F.col("cos")).alias("cos_ppm")
    ).filter(F.col("cos_ppm") >= _NDUP_THRESHOLD_PPM)


def _sql_embedding_near_dup() -> str:
    bit_exprs = ",\n         ".join(
        f"CASE WHEN list_dot_product(e, {_sql_vec(p)}) >= 0 "
        f"THEN 1 ELSE 0 END AS b{i}"
        for i, p in enumerate(_NDUP_PLANES)
    )
    bands = "\n    OR ".join(
        "(" + " AND ".join(f"x.b{i} = y.b{i}" for i in idxs) + ")"
        for idxs in dd.plane_chunks(_NDUP_N_PLANES, _NDUP_N_CHUNKS)
    )
    cos = "CAST(floor(list_cosine_similarity(x.e, y.e) * 1000000) AS BIGINT)"
    return f"""
WITH b AS (
  SELECT vec_id, e,
         {bit_exprs}
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
)
SELECT x.vec_id AS a, y.vec_id AS b, {cos} AS cos_ppm
FROM b x JOIN b y ON x.vec_id < y.vec_id
WHERE ({bands})
  AND {cos} >= {_NDUP_THRESHOLD_PPM}
"""


SQL_EMBEDDING_NEAR_DUP = _sql_embedding_near_dup()


def q_rate_limit_admit(spark, sf_dir):
    """Leaky-bucket rate limit (reference tail/ratelimiter) keyed by
    event_type, batch twin of the stateful streaming operator — routed
    through the hot-key-safe CHUNKED path (the production default: a
    Zipf-hot key's per-task input is bounded by rows/chunk, not its full
    history; the unchunked form survives only as the oracle twin). The
    chunk count auto-sizes with data volume, so at gate scale this
    collapses to one chunk of the SAME code path; multi-chunk state
    carry on a Zipf fixture is pytest-pinned equal to the unchunked
    operator (test_ratelimit: chunked==unchunked, NULL-ts routing). The
    oracle replays the same event-time-ordered recurrence as a DuckDB
    recursive CTE (one recursion step = one row per key)."""
    from logagent_spark.streaming.ratelimit import rate_limited_batch_chunked

    ev = _t(spark, sf_dir, "events")
    out = rate_limited_batch_chunked(
        ev, "event_type", "ts", size=5, leak_interval_s=3600.0,
        payload_cols=["event_id"], order_cols=["ts", "event_id"],
    )
    return out.select("event_id", "event_type", "admitted")


SQL_RATE_LIMIT_ADMIT = r"""
WITH RECURSIVE ev AS (
  SELECT event_type, event_id, (epoch_us(ts)/1000000.0)::DOUBLE AS t,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS rn
  FROM events
), sim AS (
  -- base: fill 0.0, no leak; size=5 admits the first pour
  SELECT event_type, event_id, rn, t, t AS last_ts,
         1.0::DOUBLE AS fill, true AS admitted
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT x.event_type, x.event_id, x.rn, x.t, x.t,
         CASE WHEN x.leaked + 1.0::DOUBLE > 5.0::DOUBLE THEN x.leaked
              ELSE x.leaked + 1.0::DOUBLE END,
         (x.leaked + 1.0::DOUBLE <= 5.0::DOUBLE)
  FROM (
    SELECT e.event_type, e.event_id, e.rn, e.t,
           CASE WHEN s.fill > 0.0::DOUBLE
                THEN greatest(s.fill - (e.t - s.last_ts)/3600.0::DOUBLE,
                              0.0::DOUBLE)
                ELSE s.fill END AS leaked
    FROM sim s JOIN ev e
      ON e.event_type = s.event_type AND e.rn = s.rn + 1
  ) x
)
SELECT event_id, event_type, admitted FROM sim
"""


# ---------------------------------------------------------------------------
# dynamic-JSON attrs overflow (SURVEY §1.4; reference merges ALL keys,
# task.go:244-250)

def q_parse_json_dynamic(spark, sf_dir):
    """jsonify with declared `k` + Attrs overflow: undeclared keys (et,
    uid) land in the attrs map; validators consult the map for columns
    the schema doesn't declare."""
    spec = PipelineSpec.from_dict({
        "Parser": {"Mode": "jsonify", "Columns": ["k"],
                   "Types": {"k": "double"}, "Attrs": "attrs"},
    })
    ev = _t(spark, sf_dir, "events").withColumn(
        "message",
        F.concat(
            F.lit('{"k": '), F.regexp_extract("props", r"(\d+)", 1),
            F.lit(', "et": "'), F.col("event_type"),
            F.lit('", "uid": '), F.col("user_id").cast("string"),
            F.lit("}"),
        ),
    )
    res = CompiledPipeline(spec).transform(ev)
    from logagent_spark.config import ValidatorSpec

    # undeclared columns resolve against the attrs map (validators.py)
    et_ok = compile_gate(
        [ValidatorSpec(mode="required", column="et"),
         ValidatorSpec(mode="minlength", column="et", number=5)],
        res.schema,
    )
    return res.frame.select(
        "event_id",
        F.col("k").cast("long").alias("k_val"),
        F.array_join(F.array_sort(F.map_keys("attrs")), ",").alias("attr_keys"),
        F.element_at("attrs", F.lit("et")).alias("et"),
        F.element_at("attrs", F.lit("uid")).alias("uid"),
        F.coalesce(et_ok, F.lit(False)).alias("et_len5_ok"),
    )


SQL_PARSE_JSON_DYNAMIC = r"""
WITH m AS (
  SELECT event_id,
         '{"k": ' || regexp_extract(props, '(\d+)', 1)
         || ', "et": "' || event_type
         || '", "uid": ' || user_id || '}' AS msg
  FROM events
)
SELECT event_id,
       CAST(CAST(json_extract_string(msg, '$.k') AS DOUBLE) AS BIGINT) AS k_val,
       array_to_string(
         list_sort(list_filter(json_keys(msg), k -> k <> 'k')), ','
       ) AS attr_keys,
       json_extract_string(msg, '$.et') AS et,
       json_extract_string(msg, '$.uid') AS uid,
       (json_extract_string(msg, '$.et') IS NOT NULL
        AND strlen(json_extract_string(msg, '$.et')) >= 5)
         AS et_len5_ok
FROM m
"""


# ---------------------------------------------------------------------------
# remaining validator modes + rewrite modes as driver queries

def q_validate_modes(spark, sf_dir):
    """required / type / minvalue / maxlength as the row gate; `number`
    (exact equality) as a per-row flag (an AND-ed equality gate would
    keep ~0 rows — pointless evidence)."""
    from logagent_spark.config import ValidatorSpec

    ev = _t(spark, sf_dir, "events")
    schema = {f.name: f.dataType for f in ev.schema.fields}
    gate = compile_gate(
        [
            ValidatorSpec(mode="required", column="props"),
            ValidatorSpec(mode="type", column="user_id", type="int"),
            ValidatorSpec(mode="minvalue", column="user_id", number=10),
            ValidatorSpec(mode="maxlength", column="event_type", number=6),
        ],
        schema,
    )
    from logagent_spark.operators.validators import compile_validator

    num_ok = compile_validator(
        ValidatorSpec(mode="number", column="event_id", number=42), schema
    )
    return ev.filter(F.coalesce(gate, F.lit(False))).select(
        "event_id",
        F.coalesce(num_ok, F.lit(False)).alias("is_42"),
    )


SQL_VALIDATE_MODES = """
SELECT event_id, (event_id = 42) AS is_42
FROM events
WHERE props IS NOT NULL
  AND user_id IS NOT NULL
  AND user_id >= 10
  AND strlen(event_type) <= 6
"""


def q_rewrite_jsonify_splice(spark, sf_dir):
    """`jsonify` rewrite: parse a JSON-string COLUMN (not message) and
    splice keys in as {col}_{key} (task.go:302-321)."""
    spec = PipelineSpec.from_dict({
        "Rewrites": [
            {"Mode": "jsonify", "Column": "props", "Types": {"k": "double"}},
        ],
    })
    ev = _t(spark, sf_dir, "events")
    res = CompiledPipeline(spec).transform(ev)
    return res.frame.select(
        "event_id", F.col("props_k").cast("long").alias("props_k"),
    )


SQL_REWRITE_JSONIFY_SPLICE = """
SELECT event_id,
       CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS BIGINT)
         AS props_k
FROM events
"""


def q_rewrite_unjsonify(spark, sf_dir):
    """`unjsonify`: value -> its Go json.Marshal encoding (string gets
    quoted+escaped, number renders bare; stored as bytes, task.go:323-334).
    Output decodes the bytes back to UTF-8 for engine-portable hashing."""
    spec = PipelineSpec.from_dict({
        "Rewrites": [
            {"Mode": "unjsonify", "Column": "event_type"},
            {"Mode": "unjsonify", "Column": "value"},
        ],
    })
    ev = _t(spark, sf_dir, "events")
    res = CompiledPipeline(spec).transform(ev)
    return res.frame.select(
        "event_id",
        F.col("event_type").cast("string").alias("et_json"),
        F.col("value").cast("string").alias("val_json"),
    )


SQL_REWRITE_UNJSONIFY = """
SELECT event_id,
       '"' || event_type || '"' AS et_json,
       CAST(value AS VARCHAR) AS val_json
FROM events
"""


def q_rewrite_command(spark, sf_dir):
    """`command` rewrite parity: the reference execs per row
    (task.go:336-351); the engine execs once on the driver and
    broadcasts the literal (documented divergence — identical output for
    deterministic commands). `echo` emits a single newline."""
    spec = PipelineSpec.from_dict({
        "Rewrites": [
            {"Mode": "command", "Column": "cmd_out", "Command": "echo"},
        ],
    })
    ev = _t(spark, sf_dir, "events")
    res = CompiledPipeline(spec).transform(ev)
    return res.frame.select("event_id", "cmd_out")


SQL_REWRITE_COMMAND = """
SELECT event_id, chr(10) AS cmd_out FROM events
"""


# ---------------------------------------------------------------------------
# multimodal plumbing (binary payload columns)

def _doc_payload() -> F.Column:
    prefix = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("GIF8"))
        .when(F.col("doc_id") % 4 == 1, F.lit("<htm"))
        .when(F.col("doc_id") % 4 == 2, F.lit("%PDF"))
        .otherwise(F.lit("RIFF"))
    )
    return F.encode(F.concat(prefix, F.col("text")), "UTF-8")


def q_multimodal_meta(spark, sf_dir):
    """Opaque-binary metadata path: payload bytes synthesized from text
    with real magic-byte prefixes; sniff/size/digest are pure Column
    exprs (no Python touches the payloads)."""
    from logagent_spark.operators.multimodal import with_media_meta

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _doc_payload().alias("payload")
    )
    return with_media_meta(docs).select(
        "doc_id", "media_bytes", "media_format", "media_digest"
    )


SQL_MULTIMODAL_META = """
WITH p AS (
  SELECT doc_id,
         encode(CASE doc_id % 4 WHEN 0 THEN 'GIF8' WHEN 1 THEN '<htm'
                               WHEN 2 THEN '%PDF' ELSE 'RIFF' END
                || text) AS payload,
         -- UTF-8 payload: hashing the string == hashing the blob bytes
         -- (this DuckDB's md5 is VARCHAR-only)
         md5(CASE doc_id % 4 WHEN 0 THEN 'GIF8' WHEN 1 THEN '<htm'
                             WHEN 2 THEN '%PDF' ELSE 'RIFF' END
             || text) AS digest
  FROM documents
)
SELECT doc_id,
       octet_length(payload) AS media_bytes,
       -- the oracle PREDICTS the sniff from the planted prefix — an
       -- independent path to the same answer
       CASE doc_id % 4 WHEN 0 THEN 'gif' WHEN 1 THEN 'html'
                       WHEN 2 THEN 'pdf' ELSE 'riff' END AS media_format,
       digest AS media_digest
FROM p
"""


def q_multimodal_frames(spark, sf_dir):
    """Video frame-sampling PLAN: (frame_idx, byte_offset) rows per
    payload, sequence+posexplode — no Python."""
    from logagent_spark.operators.multimodal import frame_sample_plan

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _doc_payload().alias("payload")
    )
    out = frame_sample_plan(docs, every_n_bytes=256, max_frames=8)
    return out.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )


SQL_MULTIMODAL_FRAMES = """
WITH f AS (
  SELECT doc_id,
         -- + 4: the payload carries a 4-byte magic prefix
         least(greatest(CAST(trunc((octet_length(encode(text)) + 4) / 256.0)
                             AS INT), 1), 8) AS nf
  FROM documents
)
SELECT doc_id, frame_idx, frame_idx * 256 AS byte_offset
FROM (SELECT doc_id, unnest(range(0, nf)) AS frame_idx FROM f)
"""


def q_embed_text_fake(spark, sf_dir):
    """Fake text-embedder (model stand-in): md5-byte-derived unit
    vectors through the Arrow/pandas UDF; integer norms make components
    engine-exact (see multimodal.embed_text_fake)."""
    from logagent_spark.operators.multimodal import embed_text_fake

    docs = _t(spark, sf_dir, "documents")
    emb = embed_text_fake(docs, "text", dim=16)
    return emb.select(
        "doc_id",
        *[
            _ppm(F.get(F.col("embedding"), i)).alias(f"v{i}_ppm")
            for i in range(4)
        ],
    )


SQL_EMBED_TEXT_FAKE = """
WITH b AS (
  SELECT doc_id,
         list_transform(range(0, 16),
           i -> ('0x' || substring(md5(text), 1 + i*2, 2))::INTEGER - 128)
           AS bs
  FROM documents
), n AS (
  SELECT doc_id, bs,
         CASE WHEN list_sum(list_transform(bs, x -> x*x)) > 0
              THEN sqrt(list_sum(list_transform(bs, x -> x*x))::DOUBLE)
              ELSE 1.0 END AS nrm
  FROM b
)
SELECT doc_id,
       CAST(floor((bs[1] / nrm) * 1000000) AS BIGINT) AS v0_ppm,
       CAST(floor((bs[2] / nrm) * 1000000) AS BIGINT) AS v1_ppm,
       CAST(floor((bs[3] / nrm) * 1000000) AS BIGINT) AS v2_ppm,
       CAST(floor((bs[4] / nrm) * 1000000) AS BIGINT) AS v3_ppm
FROM n
"""


def q_rewrite_scrub(spark, sf_dir):
    """PII-style redaction (scrub rewrite, engine extension): ordered
    pattern->token chain — emails first, then IPs, then residual
    numbers — all occurrences, scan-side regexp_replace."""
    spec = PipelineSpec.from_dict({
        "Rewrites": [
            {"Mode": "scrub", "Column": "message", "Mapping": {
                r"[A-Za-z0-9+.]+@[A-Za-z0-9.-]+": "<EMAIL>",
                r"\d+\.\d+\.\d+\.\d+": "<IP>",
                r"\d+": "<NUM>",
            }},
        ],
    })
    ev = _t(spark, sf_dir, "events").withColumn(
        "message",
        F.concat(
            F.col("event_type"), F.lit("+"),
            F.col("user_id").cast("string"), F.lit("@example.com via 10.0.0."),
            (F.col("event_id") % 256).cast("string"),
            F.lit(" payload "), F.col("props"),
        ),
    )
    res = CompiledPipeline(spec).transform(ev)
    return res.frame.select(
        "event_id", F.col("message").alias("scrubbed")
    )


SQL_REWRITE_SCRUB = r"""
WITH m AS (
  SELECT event_id,
         event_type || '+' || user_id || '@example.com via 10.0.0.'
         || (event_id % 256) || ' payload ' || props AS msg
  FROM events
)
SELECT event_id,
       regexp_replace(regexp_replace(regexp_replace(msg,
         '[A-Za-z0-9+.]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
         '\d+\.\d+\.\d+\.\d+', '<IP>', 'g'),
         '\d+', '<NUM>', 'g') AS scrubbed
FROM m
"""


def q_tpch_promo_share(spark, sf_dir):
    """TPC-H Q14-shaped: PROMO parts' share of revenue in a month
    (broadcast part dim; the ratio of two exact-cent sums is one float
    division — engine-portable). Completes the star schema: every
    testdata table now has a driver query."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _cents(disc))
              .otherwise(F.lit(0))).alias("promo_c"),
        F.sum(_cents(disc)).alias("total_c"),
    )
    return agg.select(
        "promo_c", "total_c",
        _ppm(F.col("promo_c") / F.col("total_c")).alias("promo_share_ppm"),
    )


SQL_TPCH_PROMO_SHARE = """
WITH j AS (
  SELECT CASE WHEN p_type = 'PROMO'
              THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
                        AS BIGINT) ELSE 0 END AS pc,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           AS tc
  FROM lineitem, part
  WHERE l_partkey = p_partkey
    AND l_shipdate >= TIMESTAMP '1996-03-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT CAST(sum(pc) AS BIGINT) AS promo_c,
       CAST(sum(tc) AS BIGINT) AS total_c,
       CAST(floor((sum(pc)::DOUBLE / sum(tc)::DOUBLE) * 1000000) AS BIGINT)
         AS promo_share_ppm
FROM j
"""


def q_agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per key (log-latency analytics).
    Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation definition, so the values hash identically (verified
    bit-for-bit at sf0.01). At 10^12 rows swap in approx_percentile —
    the exact form is the oracle-checkable twin."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        _ppm(F.percentile("value", F.lit(0.5))).alias("p50_ppm"),
        _ppm(F.percentile("value", F.lit(0.95))).alias("p95_ppm"),
        _ppm(F.percentile("value", F.lit(0.99))).alias("p99_ppm"),
    )


SQL_AGG_PERCENTILES = """
SELECT event_type,
       CAST(floor(quantile_cont(value, 0.5) * 1000000) AS BIGINT) AS p50_ppm,
       CAST(floor(quantile_cont(value, 0.95) * 1000000) AS BIGINT) AS p95_ppm,
       CAST(floor(quantile_cont(value, 0.99) * 1000000) AS BIGINT) AS p99_ppm
FROM events GROUP BY 1
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap) + per-session stats: one
    window on (user, event-time) — lag marks starts, running sum numbers
    sessions; durations in exact integer microseconds."""
    from logagent_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(
        ev, "user_id", "ts", gap_s=1800.0, order_cols=["ts", "event_id"]
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         (epoch_us(ts)/1000000.0)::DOUBLE AS t,
         lag((epoch_us(ts)/1000000.0)::DOUBLE) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), marked AS (
  SELECT user_id, event_id, us,
         CASE WHEN prev IS NULL OR t - prev > 1800.0 THEN 1 ELSE 0 END AS ns
  FROM g
), numbered AS (
  SELECT user_id, us,
         -- CAST: DuckDB window-sums INTEGER into HUGEINT, which the
         -- driver's comparison frame round-trips to float64 and the
         -- value-hash then sees 1.0 vs Spark's 1 (the round-2 red row)
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n
  FROM marked
)
SELECT user_id, session_n, count(*) AS n_events,
       max(us) - min(us) AS duration_us
FROM numbered GROUP BY 1, 2
"""


def q_ann_ivf_kmeans_fullprobe(spark, sf_dir):
    """Distributed Lloyd-refined IVF, gated by the full-probe
    equivalence invariant: with nprobe = n_centroids the ANN result must
    equal exact brute force WHATEVER the (data-dependent) centroids are
    — so the refinement path gets a hard oracle without embedding
    centroids in SQL."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cents = sim.kmeans_refine(
        emb, "embedding", sim.seeded_centroids(64, 8, seed=1), iters=2
    )
    indexed = sim.ivf_index(emb, "embedding", cents)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    probes = sim.ivf_probes(cents, q, 8)  # full probe
    pruned = indexed.filter(F.col("ivf_bucket").isin(probes))
    scored = pruned.select(
        "vec_id",
        _ppm(sim.cosine_to_query(F.col("embedding"), q)).alias("cos_ppm"),
    )
    return scored.orderBy(F.col("cos_ppm").desc(), F.col("vec_id")).limit(10)


def q_asof_join(spark, sf_dir):
    """As-of join (union-and-carry, no range join): every event picks
    the nearest preceding snapshot of its event_type. The oracle is
    DuckDB's NATIVE ASOF JOIN — two independent implementations of the
    operator. Snapshots are a deterministic sparse subset (every 97th
    event), deduped per (key, ts) as the operator requires."""
    from logagent_spark.operators.asof import asof_join_backward

    ev = _t(spark, sf_dir, "events")
    snaps = (
        ev.filter(F.col("event_id") % 97 == 0)
        .groupBy("event_type", F.col("ts").alias("snap_ts"))
        .agg(F.max("value").alias("snap_value"))
    )
    out = asof_join_backward(
        ev.select("event_id", "event_type", "ts"), snaps,
        key="event_type", left_ts="ts", right_ts="snap_ts",
        value_cols=["snap_value"], order_cols=["event_id"],
    )
    return out.select(
        "event_id", "event_type",
        _ppm(F.col("snap_value")).alias("snap_ppm"),
    )


SQL_ASOF_JOIN = """
WITH snaps AS (
  SELECT event_type, ts AS snap_ts, max(value) AS snap_value
  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2
)
SELECT l.event_id, l.event_type,
       CAST(floor(r.snap_value * 1000000) AS BIGINT) AS snap_ppm
FROM events l ASOF LEFT JOIN snaps r
  ON l.event_type = r.event_type AND l.ts >= r.snap_ts
"""


def q_asof_join_forward(spark, sf_dir):
    """Forward as-of join: every event picks the nearest FOLLOWING
    snapshot (the "next deploy after this event" shape). Same
    union-and-carry plan as backward with the window order reversed;
    the oracle is DuckDB's native ASOF JOIN with the <= comparison."""
    from logagent_spark.operators.asof import asof_join_forward

    ev = _t(spark, sf_dir, "events")
    snaps = (
        ev.filter(F.col("event_id") % 97 == 0)
        .groupBy("event_type", F.col("ts").alias("snap_ts"))
        .agg(F.max("value").alias("snap_value"))
    )
    out = asof_join_forward(
        ev.select("event_id", "event_type", "ts"), snaps,
        key="event_type", left_ts="ts", right_ts="snap_ts",
        value_cols=["snap_value"], order_cols=["event_id"],
    )
    return out.select(
        "event_id", "event_type",
        _ppm(F.col("snap_value")).alias("snap_ppm"),
    )


SQL_ASOF_JOIN_FORWARD = """
WITH snaps AS (
  SELECT event_type, ts AS snap_ts, max(value) AS snap_value
  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2
)
SELECT l.event_id, l.event_type,
       CAST(floor(r.snap_value * 1000000) AS BIGINT) AS snap_ppm
FROM events l ASOF LEFT JOIN snaps r
  ON l.event_type = r.event_type AND l.ts <= r.snap_ts
"""


def _cents(col) -> F.Column:
    return F.floor(col * 100).cast("long")


def q_tpch_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary over lineitem. Money sums in
    exact integer cents (floor(x*100) per row BEFORE summing) so the
    aggregate is order-independent and engine-portable — summing raw
    doubles would make the hash depend on partial-aggregation order."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
        F.sum(_cents(disc)).alias("sum_disc_c"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_TPCH_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_c,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS sum_disc_c,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""


def q_tpch_top_orders(spark, sf_dir):
    """TPC-H Q3-shaped: top-10 highest-revenue unshipped BUILDING
    orders. Dim side (filtered customers) broadcasts; orderBy+limit
    compiles to TakeOrderedAndProject."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
    )
    rev = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_cents(disc)).alias("revenue_c")
    )
    return rev.orderBy(
        F.col("revenue_c").desc(), F.col("l_orderkey")
    ).limit(10)


SQL_TPCH_TOP_ORDERS = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2
ORDER BY revenue_c DESC, l_orderkey LIMIT 10
"""


def q_tpch_region_revenue(spark, sf_dir):
    """TPC-H Q5-shaped: per-nation revenue for ASIA with local
    suppliers. Every dimension broadcasts (region/nation/supplier/
    customer); only orders-lineitem shuffles on the join key."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(F.sum(_cents(disc)).alias("revenue_c"))


SQL_TPCH_REGION_REVENUE = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


def q_text_dup_windows(spark, sf_dir):
    """Cross-document repeated-substring census (the statistic behind
    substring-level corpus dedup): per document, how many of its 5-token
    windows occur >= 2 times corpus-wide (multiplicity counted). The
    oracle unnests the same shingle lists (NO list_distinct — a
    within-doc repeat is a duplicate) and replays the census in SQL.
    Runs through the counting-bucket PREFILTER (the 10^12-doc scale
    path) with AUTO sizing — the sample-estimator + W=T/0.02 rule is
    exactly what a 10^12-doc job would use, and it is lossless, so the
    exact-census oracle still gates it."""
    docs = _t(spark, sf_dir, "documents")
    return ts.duplicated_window_stats(
        docs, "doc_id", "text", w=5, prefilter_buckets="auto"
    )


SQL_TEXT_DUP_WINDOWS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 5 THEN
      list_transform(generate_series(1, len(t) - 4),
                     i -> array_to_string(list_slice(t, i, i + 4), ' '))
    ELSE [array_to_string(t, ' ')] END AS s
  FROM toks
), w AS (
  SELECT doc_id, unnest(s) AS win FROM sh
), c AS (
  SELECT win, count(*) AS n FROM w GROUP BY 1
)
SELECT w.doc_id,
       count(*) AS n_windows,
       CAST(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       CAST(floor(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*)) AS BIGINT) AS dup_frac_ppm
FROM w JOIN c USING (win)
GROUP BY 1
"""


def q_text_excise_windows(spark, sf_dir):
    """Substring-level dedup CLEANING: every token covered by a 5-token
    window occurring >= 2 times corpus-wide is excised; the oracle
    rebuilds each cleaned text with the same census + position joins in
    SQL, so the returned strings must match byte-for-byte. Runs through
    the counting-bucket prefilter with AUTO sizing (lossless — see
    text_dup_windows)."""
    docs = _t(spark, sf_dir, "documents")
    return ts.excise_duplicated_windows(
        docs, "doc_id", "text", w=5, prefilter_buckets="auto"
    )


SQL_TEXT_EXCISE_WINDOWS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 5 THEN
      list_transform(generate_series(1, len(t) - 4),
                     i -> array_to_string(list_slice(t, i, i + 4), ' '))
    ELSE [array_to_string(t, ' ')] END AS s
  FROM toks
), pos AS (
  SELECT doc_id, u.wp[1] AS win, u.wp[2] AS p
  FROM sh, unnest(list_zip(s, generate_series(1, len(s)))) AS u(wp)
), c AS (
  SELECT win, count(*) AS n FROM pos GROUP BY 1
), covered AS (
  SELECT DISTINCT pos.doc_id, cp.ci AS ci
  FROM pos JOIN c USING (win),
       unnest(generate_series(pos.p, pos.p + 4)) AS cp(ci)
  WHERE c.n >= 2
), tp AS (
  SELECT doc_id, u.tp2[1] AS tok, u.tp2[2] AS ti
  FROM toks, unnest(list_zip(t, generate_series(1, len(t)))) AS u(tp2)
), rebuilt AS (
  SELECT tp.doc_id,
         string_agg(tp.tok, ' ' ORDER BY tp.ti)
           FILTER (WHERE covered.ci IS NULL) AS text_clean
  FROM tp LEFT JOIN covered
    ON tp.doc_id = covered.doc_id AND tp.ti = covered.ci
  GROUP BY 1
)
SELECT d.doc_id, coalesce(r.text_clean, '') AS text_clean
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""


def q_knn_join(spark, sf_dir):
    """Batched similarity search: exact k-NN JOIN of 4 query vectors
    against the corpus in ONE scan (operators/similarity.knn_join — a
    numpy matmul per Arrow batch emits only per-query top-k, so the
    follow-up global window shuffles O(Q*k*batches) skinny rows, never
    the corpus). Query vectors are the first 4 embeddings (collected
    driver-side by necessity — they parameterize the scan); the oracle
    replays the full cross join + rank in SQL."""
    from logagent_spark.operators.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qrows = emb.filter(F.col("vec_id") < 4).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    corpus = emb.filter(F.col("vec_id") >= 4)
    return knn_join(corpus, "embedding", queries, k=5).select(
        "query_id", "vec_id", "cos_ppm", "rank"
    )


SQL_KNN_JOIN = """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id < 4
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id >= 4
), s AS (
  SELECT q.qid AS query_id, c.vec_id,
         CAST(floor(list_cosine_similarity(q.e, c.e) * 1000000)
              AS BIGINT) AS cos_ppm
  FROM q, c
), r AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cos_ppm DESC, vec_id
  ) AS INTEGER) AS rank FROM s
)
SELECT query_id, vec_id, cos_ppm, rank FROM r WHERE rank <= 5
"""


def q_agg_rollup_counts(spark, sf_dir):
    """Hierarchical counter rollup — the ops-dashboard view of the
    per-handler counters (per (type, day), per type, grand total) as ONE
    pass with ROLLUP grouping sets instead of three scans + union.
    Catalyst expands grouping sets into a single Expand + hash
    aggregate, so the 10^12-row scan happens once for all three levels."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_AGG_ROLLUP_COUNTS = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) AS n
FROM events
GROUP BY ROLLUP (event_type, day)
"""


def q_html_extract_text(spark, sf_dir):
    """The north-star per-row invariant as a driver gate: wrap each
    document's text into an escaped HTML page IN-QUERY (binary, like the
    input_hint's html column — with style/script subtrees and attribute
    noise), then recover it with the scan-side extractor
    (operators/web.py, pure Column regex — no UDF). Output must be
    BYTE-IDENTICAL text per doc: the oracle is the identity projection,
    so any extraction mangling fails the value hash."""
    from logagent_spark.operators.web import escape_html_text, html_to_text

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><style>p {color: red}</style></head>'
              '<body><p class="doc">'),
        escape_html_text(F.col("text")),
        F.lit('</p><script type="text/javascript">'
              'if (1<2) { track("&"); }</script></body></html>'),
    ).cast("binary")
    return (
        docs.withColumn("_html", html)
        .select(
            "doc_id",
            html_to_text(F.col("_html").cast("string")).alias("text"),
        )
    )


SQL_HTML_EXTRACT_TEXT = """
SELECT doc_id, text FROM documents
"""


def q_tpch_bucketed_revenue(spark, sf_dir):
    """The bucketed-table seam (plans/bucketed.py) as a driver gate: at
    100 TB the orders⋈lineitem shuffle is the recurring join cost;
    bucketing pays it once at ingest. Here both tables are written as
    co-bucketed catalog tables, the join is asserted Exchange-free on
    BOTH sides (broadcast disabled so the plan must be the bucketed
    SortMergeJoin), and revenue per order-priority must match the plain
    plain-join oracle exactly."""
    import os
    import shutil

    from logagent_spark.plans.bucketed import cobucketed_join, write_bucketed

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/logagent_bucketed_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    for t in (f"bq_orders_{tag}", f"bq_lineitem_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        _t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "okey"),
        f"bq_orders_{tag}", key="okey", n_buckets=8,
        path=f"{base}/orders",
    )
    write_bucketed(
        _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "okey"),
        f"bq_lineitem_{tag}", key="okey", n_buckets=8,
        path=f"{base}/lineitem",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = cobucketed_join(
            spark, f"bq_orders_{tag}", f"bq_lineitem_{tag}", "okey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        out = j.groupBy("o_orderpriority").agg(
            F.sum(_cents(disc)).alias("revenue_c"),
            F.count(F.lit(1)).alias("n"),
        )
        out = out.localCheckpoint(eager=True)  # evaluate under the conf
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return out


SQL_TPCH_BUCKETED_REVENUE = """
SELECT o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition signals, token-level (this corpus has no
    line structure): duplicate-token fraction and top-bigram share —
    pure scan-side folds, no explode/shuffle."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        _ppm(ts.dup_token_fraction(c)).alias("dup_token_ppm"),
        _ppm(ts.top_bigram_fraction(c)).alias("top_bigram_ppm"),
    )


SQL_TEXT_REPETITION = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS toks
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1])) AS b
  FROM t WHERE len(toks) >= 2
), top AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c) AS frac FROM (
    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(floor(CASE WHEN len(toks) > 0
            THEN ((len(toks) - len(list_distinct(toks)))::DOUBLE / len(toks))
            ELSE 0.0 END * 1000000) AS BIGINT) AS dup_token_ppm,
       CAST(floor(coalesce(top.frac, 0.0) * 1000000) AS BIGINT)
         AS top_bigram_ppm
FROM t LEFT JOIN top ON t.doc_id = top.doc_id
"""


def q_dedup_cluster_keep(spark, sf_dir):
    """Cluster-level dedup: near-dup PAIRS -> connected components ->
    keep min-id per component. The oracle computes the same transitive
    closure with a recursive CTE over the exact-Jaccard pair set."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5, num_hashes=32, bands=16
    ).select("a", "b")
    return dd.dedup_cluster(docs, pairs, "doc_id").select("doc_id", "lang")


SQL_DEDUP_CLUSTER_KEEP = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(t) >= 5 THEN
      list_transform(generate_series(1, len(t) - 4),
                     i -> array_to_string(list_slice(t, i, i + 4), ' '))
    ELSE [array_to_string(t, ' ')] END) AS s
  FROM toks
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
), edges AS (
  SELECT a AS x, b AS y FROM p UNION SELECT b, a FROM p
), reach AS (
  SELECT x AS id, x AS r FROM edges
  UNION
  SELECT reach.id, e.y FROM reach JOIN edges e ON e.x = reach.r
), comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
)
SELECT doc_id, lang FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
"""


def q_curation_pipeline(spark, sf_dir, *, persist_intermediate=True):
    """Capstone: the full training-data curation chain as ONE plan —
    quality filter -> exact dedup (min-id per content hash) -> near-dup
    CLUSTER dedup (MinHash-LSH pairs -> connected components -> keep
    min id). The oracle recomputes every stage in SQL, including the
    transitive closure. Output = the surviving corpus.

    `persist_intermediate=True` (the default since r7 — it is the
    production form, and measured faster at gate scale too): the
    exact-dedup survivor set is localCheckpointed once, so the
    downstream stages (shingle pairs AND the anti-join) reuse it
    instead of re-running the quality filter + exact dedup per stage.
    The checkpoint computes from the parquet inputs inside this query's
    own build (an execution strategy, not cross-run caching); results
    are identical either way and the re-scan form stays available."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    quality = docs.filter(
        (ts.token_count(c) >= 10)
        & (ts.punct_ratio(c) < 0.05)
        & (ts.stopword_hits(c, "en") > 0)
    )
    exact = dd.dedup_exact(quality, "doc_id", "text")
    if persist_intermediate:
        exact = exact.localCheckpoint(eager=True)
    pairs = dd.minhash_near_duplicates(
        exact, "doc_id", "text", threshold=0.5, num_hashes=32, bands=16
    ).select("a", "b")
    survivors = dd.dedup_cluster(exact, pairs, "doc_id")
    return survivors.select("doc_id", "lang")


SQL_CURATION_PIPELINE = f"""
WITH RECURSIVE quality AS (
  SELECT doc_id, lang, text FROM documents
  WHERE len(list_filter(string_split_regex(text, ' +'), x -> x <> '')) >= 10
    AND (strlen(text) - strlen(regexp_replace(text, '[^\\w\\s]', '', 'g')))
        * 1.0 / strlen(text) < 0.05
    AND {_sql_stopword_hits('en')} > 0
), exact AS (
  SELECT q.doc_id, q.lang, q.text FROM quality q
  WHERE q.doc_id IN (
    SELECT min(doc_id) FROM quality
    GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
  )
), toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM exact
), sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(t) >= 5 THEN
      list_transform(generate_series(1, len(t) - 4),
                     i -> array_to_string(list_slice(t, i, i + 4), ' '))
    ELSE [array_to_string(t, ' ')] END) AS s
  FROM toks
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
), edges AS (
  SELECT a AS x, b AS y FROM p UNION SELECT b, a FROM p
), reach AS (
  SELECT x AS id, x AS r FROM edges
  UNION
  SELECT reach.id, e.y FROM reach JOIN edges e ON e.x = reach.r
), comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
)
SELECT doc_id, lang FROM exact
WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
"""


# ---------------------------------------------------------------------------
# checkpointed resumable run (the reference's offset file done right —
# plans/checkpoint.py)

def q_checkpoint_resume(spark, sf_dir, *, simulate_kill=True):
    """Kill/resume equivalence as a driver-checkable query: split events
    into 4 input chunks, run 2 chunks, 'die', resume to completion with a
    FRESH runner, and emit the committed-manifest totals. The oracle is
    the single-shot aggregation — resume must lose and duplicate
    nothing. `simulate_kill=False` skips the kill/rerun fixture phase
    (setup + a partial run, side effects a timing harness must not
    attribute to the operator) and times ONE clean checkpointed pass."""
    import os
    import shutil

    from logagent_spark.plans.checkpoint import CheckpointedRunner

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/logagent_ckpt_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    in_dir, out_dir = f"{base}/input", f"{base}/out"
    _t(spark, sf_dir, "events").repartition(4).write.parquet(in_dir)

    spec = PipelineSpec.from_dict({
        "Validators": [{"Mode": "minlength", "Column": "props", "Number": 9}],
        "Handlers": [
            {"Mode": "stream", "Name": "errors", "Template": "${props}",
             "Validators": [
                 {"Mode": "value", "Column": "event_type", "Value": "error"},
             ]},
            {"Mode": "stream", "Name": "all_events", "Template": "${props}"},
        ],
    })
    pipe = CompiledPipeline(spec)
    kw = dict(n_chunks=4, keep=["event_id"])
    if simulate_kill:
        CheckpointedRunner(pipe, out_dir, **kw).run(
            spark, in_dir, max_chunks=2  # simulated mid-run kill
        )
    runner = CheckpointedRunner(pipe, out_dir, **kw)  # fresh process
    reports = runner.run(spark, in_dir)
    if simulate_kill:
        assert sum(r.resumed for r in reports) == 2, \
            "resume must skip 2 chunks"
    tot = runner.totals()
    rows = [("rows_in", tot["rows_in"])]
    rows += [(f"sink:{k}", v) for k, v in tot["sink_counts"].items()]
    rows += [(f"drop:{k}", v) for k, v in tot["drop_counts"].items()]
    return spark.createDataFrame(rows, "name string, n long")


SQL_CHECKPOINT_RESUME = """
SELECT 'rows_in' AS name, count(*) AS n FROM events
UNION ALL
SELECT 'sink:errors', count(*) FROM events
WHERE strlen(props) >= 9 AND event_type = 'error'
UNION ALL
SELECT 'sink:all_events', count(*) FROM events WHERE strlen(props) >= 9
UNION ALL
SELECT 'drop:validator:minlength:props', count(*) FROM events
WHERE strlen(props) < 9
"""


# ---------------------------------------------------------------------------
# collector transports + degradation sampling as driver-checkable gates
# (round-2 verdict item 6: these rows had only pytest evidence)

def q_file_collector_lines(spark, sf_dir):
    """file collector (collector.go:169-206) as a batch round-trip:
    render events as pipe-delimited text lines into a temp landing dir,
    collect them back with read_text_lines (one message per line +
    device_id stamp), re-split. The oracle is the identity projection of
    events — the transport must lose, duplicate, and mangle nothing."""
    import os
    import shutil

    from logagent_spark.sources.readers import read_text_lines

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/logagent_file_gate_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    ev = _t(spark, sf_dir, "events")
    ev.select(
        F.concat_ws("|", F.col("event_id").cast("string"),
                    F.col("event_type")).alias("value")
    ).repartition(4).write.text(base)

    got = read_text_lines(spark, base)
    parts = F.split(F.col("message"), r"\|", 2)
    return got.select(
        F.get(parts, 0).cast("long").alias("event_id"),
        F.get(parts, 1).alias("event_type"),
        F.col("device_id"),
    )


SQL_FILE_COLLECTOR_LINES = """
SELECT event_id, event_type, 'logagent-spark' AS device_id FROM events
"""


def q_dir_collector_whole_files(spark, sf_dir):
    """dir collector (collector.go:275-324) as a batch round-trip: one
    file per lang whose body is every document's text in doc_id order,
    read back whole-file-per-message via the binaryFile source with the
    collector's glob filter. The oracle rebuilds each body with
    string_agg ORDER BY doc_id."""
    import os
    import shutil

    from logagent_spark.sources.readers import read_whole_files

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/logagent_dir_gate_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    docs = _t(spark, sf_dir, "documents")
    bodies = docs.groupBy("lang").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("body")
    ).collect()
    for r in bodies:
        with open(os.path.join(base, f"{r['lang']}.txt"), "w") as f:
            f.write(r["body"])
    # a decoy the glob filter must skip (the reference's filename regex)
    with open(os.path.join(base, "skipme.log"), "w") as f:
        f.write("not a txt")

    got = read_whole_files(spark, base, "*.txt")
    return got.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.txt$", 1).alias("lang"),
        F.col("message"),
        F.col("device_id"),
    )


SQL_DIR_COLLECTOR_WHOLE_FILES = """
SELECT lang, string_agg(text, chr(10) ORDER BY doc_id) AS message,
       'logagent-spark' AS device_id
FROM documents GROUP BY lang
"""


def q_degradation_sample(spark, sf_dir):
    """Load-shed sampling (agent.go:83-93) in the deterministic
    content-hash form: cpu 80 over limit 50 -> admit p = 0.2, admission
    = top-32-bits of md5(event_id ":" seed) under p * 2^32. The SAME
    arithmetic runs in the oracle — reproducible across engines AND
    cluster layouts, which partition-seeded df.sample is not."""
    from logagent_spark.sources.readers import degradation_sample

    ev = _t(spark, sf_dir, "events")
    out = degradation_sample(ev, cpu_percent=80.0, cpu_limit=50.0,
                             seed=42, id_col="event_id")
    return out.select("event_id", "event_type")


SQL_DEGRADATION_SAMPLE = f"""
SELECT event_id, event_type FROM events
WHERE ('0x' || substr(md5(event_id::VARCHAR || ':42'), 1, 8))::BIGINT
      < {int(0.2 * 2**32)}
"""


# ---------------------------------------------------------------------------
# merged + streaming-parity gates (VERDICT r3 #1/#5/#6)
#
# The driver records the FIRST 50 queries() entries, so the registry is a
# budget: near-duplicate gates merge into one driver row each (both halves
# still run and both halves' values are hash-checked — a union/join gate is
# strictly stronger than either half alone), and never-driver-verified
# entries are registered first.

def _run_available_now(df, name: str):
    """Run a streaming frame to completion into a memory sink under
    trigger(availableNow) with a FRESH checkpoint (so repeated calls
    reprocess) and return the sink table. The checkpoint path is
    deterministic (keyed by query name) and wiped before start, so
    repeated oracle/driver runs don't accumulate orphan dirs
    (ADVICE r4)."""
    spark = df.sparkSession
    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    ckpt = os.path.join(tempfile.gettempdir(), f"la_ckpt_{name}")
    shutil.rmtree(ckpt, ignore_errors=True)
    sq = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    sq.awaitTermination()
    return spark.table(name)


def _stream_table(spark, sf_dir: str, table: str):
    """File streams want a directory: stream the sf dir with a glob
    pinned to one table's parquet file (one file -> one micro-batch)."""
    schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{table}.parquet")
        .parquet(sf_dir)
    )


def q_streaming_parity(spark, sf_dir):
    """Driver-visible parity for FOUR stateful streaming twins, run
    INSIDE this batch query under trigger(availableNow) into memory
    sinks:

    * exact dedup (streaming/dedup.py — applyInPandasWithState keyed by
      content hash, first-arrival-wins) over documents: one parquet
      file -> one micro-batch -> the in-batch winner is the min doc_id,
      so the batch twin's min-id-winners SQL is the oracle;
    * leaky-bucket rate limit (streaming/ratelimit.py — bucket fill +
      last-ts state per key) over events with the SAME parameters as
      the batch gate `rate_limit_admit`, so the recursive-CTE
      replay is the oracle;
    * native session_window sessionization (streaming/pipeline.py) in
      the production 'append' mode — a far-future SENTINEL event
      (user_id -1, excluded from the result) is appended to the bounded
      input so the final watermark passes every real session's end and
      append emits them all; the sentinel's own still-open session is
      held in state, exactly the append eviction contract. The oracle
      replays session_window's HALF-OPEN gap semantics (a gap of
      exactly 30 min splits — `>=` — where the batch sessionizer's `>`
      keeps; the divergence is documented on the operator);
    * BOUNDED event-time-TTL exact dedup (streaming/dedup.py TTL mode —
      the r5 state-bounding mode, previously pytest-only): documents
      split by content-hash parity into halves A/B stream as FOUR
      engineered micro-batches (one parquet file each, mtimes pinned
      with os.utime so no sleeps) — all docs at t=100 (winners = min
      doc_id per content), A-half duplicates at t=10,000 (watermark
      still 100 -> inside horizon, ALL flagged), B-half duplicates at
      t=20,000 (watermark 10,000 > B's last sighting 100 + ttl 3,600 ->
      RE-ADMITTED, in-batch min-id wins again), A-half duplicates at
      t=30,000 (watermark 20,000 > A's last 10,000 + ttl -> re-admitted).
      Splitting on the CONTENT hash (not doc_id) keeps a content from
      spanning halves, so every leg has a closed-form SQL oracle;
    * SHARDED exact dedup (streaming/dedup.py hash-space sharding —
      the other r5 bounded mode): two jobs over disjoint
      crc32(hash)%2 slices, each holding half the state, whose
      admitted sets UNION to exactly the unsharded answer (shard is a
      pure function of the content hash). Oracle: min-id winners over
      all documents.

    Results conform to skinny (gate, key, val) rows so one driver row
    hash-checks all five twins. Resume-contract anchor: the kafka
    collector's offset replay (collector.go:230-260)."""
    from logagent_spark.streaming.dedup import streaming_dedup_exact
    from logagent_spark.streaming.pipeline import streaming_session_counts
    from logagent_spark.streaming.ratelimit import rate_limited

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")

    dedup = _run_available_now(
        streaming_dedup_exact(
            _stream_table(spark, sf_dir, "documents"), "doc_id", "text"
        ),
        f"stream_dedup_parity_{tag}",
    )
    a = (
        dedup.filter(~F.col("is_dup"))
        .select(
            F.lit("dedup").alias("gate"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("content_hash").alias("val"),
        )
    )

    limited = _run_available_now(
        rate_limited(
            _stream_table(spark, sf_dir, "events"),
            "event_type", "ts", size=5, leak_interval_s=3600.0,
            payload_cols=["event_id"], order_cols=["ts", "event_id"],
        ),
        f"stream_ratelimit_parity_{tag}",
    )
    b = limited.select(
        F.lit("ratelimit").alias("gate"),
        F.col("event_id").cast("string").alias("key"),
        F.col("admitted").cast("string").alias("val"),
    )

    sess_name = f"stream_session_parity_{tag}"
    for active in spark.streams.active:
        if active.name == sess_name:
            active.stop()
    # sentinel-flushed append input: events + one far-future row. The
    # no-data micro-batch after the last file advances the watermark to
    # sentinel_ts - delay, past every real session's end, so append
    # emits them all and evicts their state.
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess_in = os.path.join(tempfile.gettempdir(), f"la_sess_in_{tag}")
    shutil.rmtree(sess_in, ignore_errors=True)
    sentinel = ev.agg(
        F.lit(-1).cast("long").alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
    )
    ev.select("event_id", "ts", "user_id").unionByName(sentinel) \
        .coalesce(1).write.mode("overwrite").parquet(sess_in)
    sq = streaming_session_counts(
        spark, sess_in,
        schema=spark.read.parquet(sess_in).schema,
        key_col="user_id", ts_col="ts", gap="30 minutes",
        query_name=sess_name, output_mode="append",
        # parquet ts is NTZ; watermarks demand TIMESTAMP (UTC session)
        source_adapter=lambda df: df.withColumn(
            "ts", F.col("ts").cast("timestamp")
        ),
    )
    sq.awaitTermination()
    c = spark.table(sess_name).filter(F.col("user_id") >= 0).select(
        F.lit("session").alias("gate"),
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"),
            # parquet ts is NTZ; unix_micros wants TIMESTAMP (CLAUDE.md)
            F.unix_micros(
                F.col("session_window.start").cast("timestamp")
            ).cast("string"),
        ).alias("key"),
        F.concat(
            F.unix_micros(
                F.col("session_window.end").cast("timestamp")
            ).cast("string"),
            F.lit(":"), F.col("n_events").cast("string"),
        ).alias("val"),
    )

    # --- TTL dedup leg: 4 engineered micro-batches over content-hash
    # halves (see docstring). File order is pinned by explicit mtimes.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    hh = F.conv(F.substring(dd.content_hash(F.col("text")), 1, 1), 16, 10) \
        .cast("int") % 2
    a_half = docs.filter(hh == 0)
    b_half = docs.filter(hh == 1)
    ttl_in = os.path.join(tempfile.gettempdir(), f"la_ttl_in_{tag}")
    shutil.rmtree(ttl_in, ignore_errors=True)
    import glob as _glob
    import time as _time

    _seen_parts: set = set()
    _base_mtime = _time.time() - 3600.0

    def _ttl_batch(bdf, sec: float, id_shift: int, order: int):
        bdf.select(
            (F.col("doc_id") + id_shift).alias("doc_id"),
            F.timestamp_seconds(F.lit(sec)).alias("ts"),
            "text",
        ).coalesce(1).write.mode("append").parquet(ttl_in)
        for p in set(_glob.glob(os.path.join(ttl_in, "*.parquet"))) - _seen_parts:
            os.utime(p, (_base_mtime + 10 * order, _base_mtime + 10 * order))
            _seen_parts.add(p)

    _ttl_batch(docs, 100.0, 0, 0)
    _ttl_batch(a_half, 10_000.0, 1_000_000, 1)
    _ttl_batch(b_half, 20_000.0, 1_000_000, 2)
    _ttl_batch(a_half, 30_000.0, 2_000_000, 3)

    ttl_schema = spark.read.parquet(ttl_in).schema
    ttl_stream = (
        spark.readStream.schema(ttl_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ttl_in)
        # parquet ts is NTZ; watermarks demand TIMESTAMP (UTC session)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "0 seconds")
    )
    ttl_out = _run_available_now(
        streaming_dedup_exact(
            ttl_stream, "doc_id", "text", ttl_s=3600.0, ts_col="ts",
        ),
        f"stream_dedup_ttl_parity_{tag}",
    )
    d = ttl_out.select(
        F.lit("dedup_ttl").alias("gate"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("is_dup").cast("string").alias("val"),
    )

    # --- sharded dedup leg: disjoint shard jobs union to the
    # unsharded answer (see docstring)
    shards = [
        _run_available_now(
            streaming_dedup_exact(
                _stream_table(spark, sf_dir, "documents"),
                "doc_id", "text", n_shards=2, shard=s,
            ),
            f"stream_dedup_shard{s}_parity_{tag}",
        )
        for s in (0, 1)
    ]
    e = shards[0].unionByName(shards[1]).select(
        F.lit("dedup_sharded").alias("gate"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("is_dup").cast("string").alias("val"),
    )
    return a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)


SQL_STREAMING_PARITY = (
    r"""
SELECT 'dedup' AS gate, min(doc_id)::VARCHAR AS key,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS val
FROM documents GROUP BY 3
UNION ALL
SELECT 'ratelimit' AS gate, event_id::VARCHAR AS key,
       admitted::VARCHAR AS val
FROM ("""
    + SQL_RATE_LIMIT_ADMIT
    + r""") rl
UNION ALL
-- session_window semantics: HALF-OPEN [start, start+gap) spans, so a
-- gap of EXACTLY 30 min opens a new session (>=); window start = first
-- event ts, end = last event ts + gap. RANGE-framed running sum gives
-- tied timestamps one session id regardless of tie order.
SELECT 'session' AS gate,
       user_id::VARCHAR || ':' || min(tus)::VARCHAR AS key,
       (max(tus) + 1800000000)::VARCHAR || ':' || count(*)::VARCHAR AS val
FROM (
  SELECT user_id, tus,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus) AS sid
  FROM (
    SELECT user_id, epoch_us(ts) AS tus,
           CASE WHEN lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts
                ) IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts
                ) >= 1800000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
  ) f
) g
GROUP BY user_id, sid
UNION ALL
-- TTL dedup leg, 4 engineered micro-batches (see q_streaming_parity):
-- batch 1 = all docs (winner = min doc_id per content, both halves)
SELECT 'dedup_ttl' AS gate, doc_id::VARCHAR AS key,
       (doc_id <> min(doc_id) OVER (PARTITION BY ch))::VARCHAR AS val
FROM (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS ch
      FROM documents) h1
UNION ALL
-- batch 2 = A-half dups inside the horizon: ALL flagged
SELECT 'dedup_ttl', (doc_id + 1000000)::VARCHAR, 'true'
FROM (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS ch
      FROM documents) h2
WHERE ('0x' || substr(ch, 1, 1))::BIGINT % 2 = 0
UNION ALL
-- batch 3 = B-half dups past the horizon: re-admitted, min new id wins
SELECT 'dedup_ttl', (doc_id + 1000000)::VARCHAR,
       (doc_id <> min(doc_id) OVER (PARTITION BY ch))::VARCHAR
FROM (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS ch
      FROM documents) h3
WHERE ('0x' || substr(ch, 1, 1))::BIGINT % 2 = 1
UNION ALL
-- batch 4 = A-half dups past the horizon again: re-admitted
SELECT 'dedup_ttl', (doc_id + 2000000)::VARCHAR,
       (doc_id <> min(doc_id) OVER (PARTITION BY ch))::VARCHAR
FROM (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS ch
      FROM documents) h4
WHERE ('0x' || substr(ch, 1, 1))::BIGINT % 2 = 0
UNION ALL
-- sharded dedup leg: the shard-union must equal the unsharded
-- min-id-winners answer over ALL documents
SELECT 'dedup_sharded', doc_id::VARCHAR,
       (doc_id <> min(doc_id) OVER (PARTITION BY ch))::VARCHAR
FROM (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS ch
      FROM documents) hs"""
)


def q_knn_join_ivf(spark, sf_dir):
    """IVF-bucketed k-NN join (similarity.knn_join_ivf — the large-Q
    regime where queries are a DataFrame, nothing collected) in its
    EXACT configuration: nprobe = n_centroids is full probe, so bucket
    routing is a pure partition of the corpus and the result must equal
    brute force — the same cross-join + rank oracle as knn_join."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    corpus = emb.filter(F.col("vec_id") >= 4)
    cents = sim.seeded_centroids(64, 8, seed=1)
    out = sim.knn_join_ivf(corpus, "embedding", qdf, cents, k=5, nprobe=8)
    return out.select("query_id", "vec_id", "cos_ppm", "rank")


def q_collector_file_dir(spark, sf_dir):
    """Both file-shaped collectors in ONE driver gate: the line-oriented
    `file` collector (collector.go:169-206) round-trips events through a
    text landing dir; the whole-file `dir` collector
    (collector.go:275-324) round-trips per-lang document bodies through
    binaryFile with the glob filter. Both conform to (source, key,
    payload, device_id); the oracle is the union of the two
    identities — the transports must lose, duplicate, and mangle
    nothing."""
    a = q_file_collector_lines(spark, sf_dir).select(
        F.lit("file").alias("source"),
        F.col("event_id").cast("string").alias("key"),
        F.col("event_type").alias("payload"),
        "device_id",
    )
    b = q_dir_collector_whole_files(spark, sf_dir).select(
        F.lit("dir").alias("source"),
        F.col("lang").alias("key"),
        F.col("message").alias("payload"),
        "device_id",
    )
    return a.unionByName(b)


SQL_COLLECTOR_FILE_DIR = """
SELECT 'file' AS source, event_id::VARCHAR AS key, event_type AS payload,
       'logagent-spark' AS device_id
FROM events
UNION ALL
SELECT 'dir' AS source, lang AS key,
       string_agg(text, chr(10) ORDER BY doc_id) AS payload,
       'logagent-spark' AS device_id
FROM documents GROUP BY lang
"""


def q_parse_grok_dict_both(spark, sf_dir):
    """Both grok physical strategies — the native when-chain and the
    Arrow pandas-UDF — answer the SAME oracle in one gate; a divergence
    between them fails the value hash."""
    a = q_parse_grok_dict(spark, sf_dir).withColumn(
        "strategy", F.lit("native"))
    b = q_parse_grok_dict_udf(spark, sf_dir).withColumn(
        "strategy", F.lit("udf"))
    return a.unionByName(b)


SQL_PARSE_GROK_BOTH = f"""
WITH base AS ({SQL_PARSE_GROK_DICT})
SELECT *, 'native' AS strategy FROM base
UNION ALL
SELECT *, 'udf' AS strategy FROM base
"""


def q_dedup_exact(spark, sf_dir):
    """Exact-dedup winners AND group sizes in one gate: the min-doc_id
    keep set (min-by + left-semi join, one shuffle on the uniform hash)
    joined to per-content copy counts — covers both the old `stats`
    gate (sum(n_copies) = corpus rows, row count = distinct contents)
    and the old `keep` gate (the winner set)."""
    docs = _t(spark, sf_dir, "documents")
    keep = dd.dedup_exact(docs, "doc_id", "text").select("doc_id", "lang")
    sizes = (
        docs.groupBy(dd.content_hash(F.col("text")).alias("_h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("doc_id", "n_copies")
    )
    return keep.join(sizes, "doc_id")


SQL_DEDUP_EXACT_MERGED = r"""
SELECT d.doc_id, d.lang, g.n_copies
FROM documents d JOIN (
  SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
) g USING (doc_id)
"""


def _synth_media_payload(doc_ids: "list[int]") -> "list[bytearray]":
    """Deterministic media payloads from a closed-form formula, REAL
    encoders (operators/codecs.py):

    - doc_id % 3 == 0 -> 24-bit BMP, w=4+d%13, h=4+(3d)%11,
      pixel(x,y,ch) = (7d + 3x + 5y + 11ch) % 256 (RGB);
    - doc_id % 3 == 1 -> PNG, same dims/pixels; color type cycles
      gray/RGB/RGBA by (d//3)%3; scanline filters cycle 0..4 so every
      unfilter path runs inside the driver gate;
    - doc_id % 3 == 2 -> mono 16-bit WAV, n=64+d%97 samples at
      rate=8000+1000*(d%5), s[i] = ((31d + 17i)*257) % 65536 - 32768.

    The DuckDB oracle recomputes the pixel/sample SUMS from the same
    formula without ever touching bytes — so the gate proves
    decode(encode(formula)) == formula through two independent paths."""
    import numpy as np

    from logagent_spark.operators import codecs

    out = []
    for d in doc_ids:
        kind = d % 3
        if kind == 2:
            n = 64 + d % 97
            i = np.arange(n, dtype=np.int64)
            s = ((31 * d + 17 * i) * 257) % 65536 - 32768
            out.append(bytearray(codecs.encode_wav(
                s.astype(np.int16), 8000 + 1000 * (d % 5))))
            continue
        w, h = 4 + d % 13, 4 + (3 * d) % 11
        nch = 3 if kind == 0 else (1, 3, 4)[(d // 3) % 3]
        y, x, c = np.mgrid[0:h, 0:w, 0:nch]
        img = ((7 * d + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)
        if kind == 0:
            out.append(bytearray(codecs.encode_bmp(img)))
        elif nch == 1:
            out.append(bytearray(
                codecs.encode_png(img[:, :, 0], filters=[0, 1, 2, 3, 4])))
        else:
            out.append(bytearray(
                codecs.encode_png(img, filters=[0, 1, 2, 3, 4])))
    return out


def _synth_media_df(spark, sf_dir):
    """(doc_id, payload binary) — payloads built batch-wise in
    mapInPandas from _synth_media_payload."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"doc_id": ids, "payload": _synth_media_payload(ids)}
            )

    return _t(spark, sf_dir, "documents").select("doc_id").mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


def q_multimodal_pipeline(spark, sf_dir):
    """The whole multimodal path in one tag-union gate:

    - `plumb`: metadata exprs (sniff/size/digest) joined to the
      frame-sampling plan — n1=frame_idx, n2=byte_offset,
      n3=media_bytes, s1=format, s2=digest;
    - `img`: REAL PNG+BMP decode (codecs.py through
      extract_image_features(fake=False)) of formula-synthesized
      payloads — n1=width, n2=height, n3=exact channel_sum,
      n4=n_channels, s1=sniffed format;
    - `wav`: REAL WAV/PCM decode (extract_audio_features) —
      n1=n_samples, n2=sample_rate, n3=sum of squared samples,
      n4=zero crossings, s1=sniffed container.

    The img/wav oracles recompute the sums from the synth formula in
    SQL — an engine-independent check that the decoders invert the
    encoders exactly (all gate values are exact integers)."""
    from logagent_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
        sniff_format,
    )

    meta = q_multimodal_meta(spark, sf_dir)
    frames = q_multimodal_frames(spark, sf_dir)
    plumb = frames.join(meta, "doc_id").select(
        F.lit("plumb").alias("tag"),
        "doc_id",
        F.col("frame_idx").alias("n1"),
        F.col("byte_offset").alias("n2"),
        F.col("media_bytes").cast("long").alias("n3"),
        F.lit(0).cast("long").alias("n4"),
        F.col("media_format").alias("s1"),
        F.col("media_digest").alias("s2"),
    )
    media = _synth_media_df(spark, sf_dir)
    img = extract_image_features(
        media.filter(F.col("doc_id") % 3 < 2), fake=False
    ).select(
        F.lit("img").alias("tag"),
        "doc_id",
        F.col("width").cast("long").alias("n1"),
        F.col("height").cast("long").alias("n2"),
        F.col("channel_sum").alias("n3"),
        F.col("n_channels").cast("long").alias("n4"),
        sniff_format(F.col("payload")).alias("s1"),
        F.lit("").alias("s2"),
    )
    wav = extract_audio_features(
        media.filter(F.col("doc_id") % 3 == 2)
    ).select(
        F.lit("wav").alias("tag"),
        "doc_id",
        F.col("n_samples").alias("n1"),
        F.col("sample_rate").cast("long").alias("n2"),
        F.col("sum_sq").alias("n3"),
        F.col("zero_crossings").alias("n4"),
        sniff_format(F.col("payload")).alias("s1"),
        F.lit("").alias("s2"),
    )
    return plumb.unionByName(img).unionByName(wav)


SQL_MULTIMODAL_PIPELINE = f"""
WITH meta AS ({SQL_MULTIMODAL_META}),
frames AS ({SQL_MULTIMODAL_FRAMES}),
img_params AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 4 + (3 * doc_id) % 11 AS h,
         CASE WHEN doc_id % 3 = 0 THEN 3
              ELSE CASE (doc_id // 3) % 3
                   WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
         END AS c,
         CASE WHEN doc_id % 3 = 0 THEN 'bmp' ELSE 'png' END AS fmt
  FROM documents WHERE doc_id % 3 < 2
),
wav_params AS (
  SELECT doc_id, 64 + doc_id % 97 AS n,
         8000 + 1000 * (doc_id % 5) AS rate
  FROM documents WHERE doc_id % 3 = 2
)
SELECT 'plumb' AS tag, frames.doc_id, frame_idx AS n1, byte_offset AS n2,
       CAST(media_bytes AS BIGINT) AS n3, CAST(0 AS BIGINT) AS n4,
       media_format AS s1, media_digest AS s2
FROM frames JOIN meta USING (doc_id)
UNION ALL
-- img leg: the pixel formula summed directly — never touches bytes
SELECT 'img' AS tag, p.doc_id, CAST(p.w AS BIGINT) AS n1,
       CAST(p.h AS BIGINT) AS n2,
       CAST(sum((7 * p.doc_id + 3 * tx.x + 5 * ty.y + 11 * tc.ch) % 256)
            AS BIGINT) AS n3,
       CAST(p.c AS BIGINT) AS n4, p.fmt AS s1, '' AS s2
FROM img_params p,
     LATERAL unnest(range(0, p.w)) AS tx(x),
     LATERAL unnest(range(0, p.h)) AS ty(y),
     LATERAL unnest(range(0, p.c)) AS tc(ch)
GROUP BY p.doc_id, p.w, p.h, p.c, p.fmt
UNION ALL
-- wav leg: the sample formula summed directly
SELECT 'wav' AS tag, p.doc_id, CAST(p.n AS BIGINT) AS n1,
       CAST(p.rate AS BIGINT) AS n2,
       CAST(sum(s.v * s.v) AS BIGINT) AS n3,
       CAST(sum(CASE WHEN s.i > 0 AND
                          ((s.v >= 0) <> (s.prev >= 0)) THEN 1 ELSE 0 END)
            AS BIGINT) AS n4,
       'riff' AS s1, '' AS s2
FROM wav_params p, LATERAL (
  SELECT ti.i,
         ((31 * p.doc_id + 17 * ti.i) * 257) % 65536 - 32768 AS v,
         ((31 * p.doc_id + 17 * (ti.i - 1)) * 257) % 65536 - 32768 AS prev
  FROM unnest(range(0, p.n)) AS ti(i)
) s
GROUP BY p.doc_id, p.n, p.rate
"""


def q_asof_join_both(spark, sf_dir):
    """Backward AND forward as-of join against DuckDB's native ASOF
    JOIN (two independent implementations per direction), one gate."""
    a = q_asof_join(spark, sf_dir).withColumn(
        "direction", F.lit("backward"))
    b = q_asof_join_forward(spark, sf_dir).withColumn(
        "direction", F.lit("forward"))
    return a.unionByName(b)


SQL_ASOF_JOIN_BOTH = f"""
SELECT *, 'backward' AS direction FROM ({SQL_ASOF_JOIN})
UNION ALL
SELECT *, 'forward' AS direction FROM ({SQL_ASOF_JOIN_FORWARD})
"""


def q_ann_ivf(spark, sf_dir):
    """Both IVF paths in one gate: seeded centroids with partial probe
    (the SQL oracle replays the argmax bucketing + probe pruning
    literally) UNION the Lloyd-refined index under full probe (whose
    oracle is exact brute force — correct whatever the data-dependent
    centroids are)."""
    a = q_ann_ivf_topk(spark, sf_dir).withColumn(
        "method", F.lit("seeded_probe"))
    b = q_ann_ivf_kmeans_fullprobe(spark, sf_dir).withColumn(
        "method", F.lit("kmeans_fullprobe"))
    return a.unionByName(b)


SQL_ANN_IVF_BOTH = f"""
SELECT *, 'seeded_probe' AS method FROM ({SQL_ANN_IVF_TOPK})
UNION ALL
SELECT *, 'kmeans_fullprobe' AS method FROM ({SQL_SIMILARITY_TOPK})
"""


# ---------------------------------------------------------------------------
# §2.8 corpus curation (decontamination / URL dedup / caps / budgets)

def q_corpus_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination over `documents`. The benchmark
    is PLANTED: a 10-token slice (tokens 4..13) of every 10th doc plays
    the eval set, so the corpus provably contains its n-grams (the
    slice's source doc and every exact dup of it). Output: every doc
    with its count of distinct 5-gram shingles found in the benchmark
    set, plus the contaminated flag — filter ~contaminated for the kept
    corpus. The benchmark set is broadcast; the corpus never shuffles
    on shingle hash (plan-gated in test_curation)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.concat_ws(
            " ", F.slice(ts.tokens(F.col("text")), 4, 10)
        ).alias("text")
    ).filter(F.size(ts.tokens(F.col("text"))) >= 5)
    # the >= 5 filter mirrors the oracle's bsh CTE, whose
    # generate_series emits NO shingle for a short slice, while
    # ts.shingles' <k fallback would emit the whole-slice md5 — a
    # data-dependent divergence if a benchmark doc ever had < 8 tokens
    # (ADVICE r6; identical output on corpora without such docs)
    out = cu.decontaminate(docs, bench, "doc_id", "text", k=5)
    return out.select(
        "doc_id",
        "lang",
        F.col("n_overlap").cast("long").alias("n_overlap"),
        "contaminated",
    )


SQL_CORPUS_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM documents
), bsh AS (
  SELECT list_distinct(list_transform(
           generate_series(1, len(list_slice(t, 4, 13)) - 4),
           i -> md5(array_to_string(
                  list_slice(list_slice(t, 4, 13), i, i + 4), ' ')))) AS s
  FROM toks WHERE doc_id % 10 = 0
), bench AS (
  SELECT DISTINCT unnest(s) AS h FROM bsh
), csh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(t) >= 5 THEN
      list_transform(generate_series(1, len(t) - 4),
                     i -> md5(array_to_string(list_slice(t, i, i + 4), ' ')))
    ELSE [md5(array_to_string(t, ' '))] END) AS s
  FROM toks
), hits AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM (SELECT doc_id, unnest(s) AS h FROM csh) c
  JOIN bench USING (h) GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# Deterministic messy-URL synthesis shared VERBATIM by both engines
# (Spark parses it via F.expr, DuckDB runs it as-is — `STRING` is a
# valid cast target in both dialects): scheme/host case noise, default
# and non-default ports, www., trailing slash, param-order variants,
# tracking params, empty segments, fragments — every normalization in
# canonicalize_url is exercised by some hex digit of md5(doc_id).
_URL_H = "md5(cast(doc_id as STRING))"


def _url_hc(i: int) -> str:
    return f"substring({_URL_H}, {i}, 1)"


_LOW8 = "('0','1','2','3','4','5','6','7')"
SQL_SYNTH_URL = f"""concat(
  CASE WHEN {_url_hc(1)} IN ('0','1','2','3') THEN 'HTTP'
       WHEN {_url_hc(1)} IN ('4','5') THEN 'https' ELSE 'http' END,
  '://',
  CASE WHEN {_url_hc(2)} IN {_LOW8} THEN 'WWW.' ELSE '' END,
  source, '.Example.COM',
  CASE WHEN {_url_hc(3)} = '0' THEN ':80'
       WHEN {_url_hc(3)} = '1' THEN ':443'
       WHEN {_url_hc(3)} = '2' THEN ':8080' ELSE '' END,
  '/', lang, '/item/', cast(doc_id % 7 as STRING),
  CASE WHEN {_url_hc(4)} IN ('0','1','2','3') THEN '/' ELSE '' END,
  '?',
  CASE WHEN {_url_hc(5)} IN {_LOW8}
       THEN concat('v=', cast(doc_id % 7 as STRING), '&cat=web')
       ELSE concat('cat=web&v=', cast(doc_id % 7 as STRING)) END,
  CASE WHEN {_url_hc(6)} IN {_LOW8} THEN '&utm_campaign=news&&' ELSE '' END,
  CASE WHEN {_url_hc(7)} IN ('0','1','2','3') THEN '&gclid=abc123' ELSE '' END,
  CASE WHEN {_url_hc(8)} IN {_LOW8}
       THEN concat('#sec-', {_url_hc(9)}) ELSE '' END
)"""


def q_corpus_select(spark, sf_dir):
    """Corpus selection passes in one tag-union gate, over synthesized
    re-crawl URLs: (1) `url_keep` — one winner per canonical URL with
    the crawl-copy count; (2) `domain_cap` — docs admitted under a
    5-per-host cap with their hash rank; (3) `budget` — docs admitted
    under a 600-token-per-source budget with the running total; (4)
    `pack` — every doc's greedy 120-token pack assignment per source
    (the oracle replays the sequential first-fit fold with a recursive
    CTE — each iteration advances every source by one doc); (5) `chunk`
    — overlapping 32-token/8-overlap context-window chunks, key =
    chunk_idx:md5(chunk_text) so content, order and coverage are all
    pinned. Unified schema (tag, doc_id, key, n)."""
    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id", "source", "lang", "text",
        F.expr(SQL_SYNTH_URL).alias("url"),
    )
    keep = cu.url_dedup_keep(urls, "doc_id", "url").select(
        F.lit("url_keep").alias("tag"),
        "doc_id",
        F.col("canonical_url").alias("key"),
        F.col("n_crawls").cast("long").alias("n"),
    )
    capped = cu.domain_cap_sample(
        urls.withColumn("host", cu.url_host(F.col("url"))),
        "host", "doc_id", cap=5,
    ).select(
        F.lit("domain_cap").alias("tag"),
        "doc_id",
        F.col("host").alias("key"),
        F.col("host_rank").cast("long").alias("n"),
    )
    budget = cu.token_budget_select(
        docs, "source", "doc_id", "text", budget=600
    ).select(
        F.lit("budget").alias("tag"),
        "doc_id",
        F.col("source").alias("key"),
        F.col("cum_tokens").cast("long").alias("n"),
    )
    packed = cu.pack_greedy(
        docs, "source", "doc_id", "text", max_len=120
    ).select(
        F.lit("pack").alias("tag"),
        "doc_id",
        F.col("source").alias("key"),
        F.col("pack_id").cast("long").alias("n"),
    )
    chunks = cu.chunk_tokens(
        docs.select("doc_id", "text"), "doc_id", "text",
        max_len=32, overlap=8,
    ).select(
        F.lit("chunk").alias("tag"),
        "doc_id",
        F.concat_ws(
            ":", F.col("chunk_idx").cast("string"), F.md5("chunk_text")
        ).alias("key"),
        F.col("n_chunk_tokens").cast("long").alias("n"),
    )
    return (
        keep.unionByName(capped).unionByName(budget)
        .unionByName(packed).unionByName(chunks)
    )


_SQL_CANON_URL = r"""
concat(
  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)),
  '://',
  regexp_replace(regexp_replace(
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
    ':(80|443)$', ''), '^www\.', ''),
  CASE WHEN regexp_replace(regexp_extract(
         url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
         '/+$', '') = '' THEN '/'
       ELSE regexp_replace(regexp_extract(
         url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
         '/+$', '') END,
  CASE WHEN array_to_string(list_sort(list_filter(
         string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
         p -> p <> '' AND NOT regexp_matches(
           p, '^(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid|ref)='))), '&') = ''
       THEN ''
       ELSE concat('?', array_to_string(list_sort(list_filter(
         string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
         p -> p <> '' AND NOT regexp_matches(
           p, '^(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid|ref)='))), '&')) END
)"""

_SQL_URL_HOST = r"""
regexp_replace(regexp_replace(
  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
  ':(80|443)$', ''), '^www\.', '')"""

SQL_CORPUS_SELECT = f"""
WITH RECURSIVE urls AS (
  SELECT doc_id, source, lang, text, {SQL_SYNTH_URL} AS url FROM documents
), canon AS (
  SELECT doc_id, source,
         {_SQL_CANON_URL} AS canonical_url,
         {_SQL_URL_HOST} AS host
  FROM urls
), ordered AS (
  SELECT doc_id, source, nt,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(cast(doc_id AS STRING)), doc_id) AS rn
  FROM (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(text, ' +'),
                           x -> x <> '')) AS nt
    FROM documents
  )
), packed AS (
  -- sequential first-fit fold, one doc per source per iteration
  SELECT source, rn, doc_id, nt, nt AS fill, CAST(0 AS BIGINT) AS pack_id
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.rn, o.doc_id, o.nt,
         CASE WHEN p.fill + o.nt > 120 THEN o.nt
              ELSE p.fill + o.nt END,
         CASE WHEN p.fill + o.nt > 120 THEN p.pack_id + 1
              ELSE p.pack_id END
  FROM packed p JOIN ordered o
    ON o.source = p.source AND o.rn = p.rn + 1
)
SELECT 'url_keep' AS tag, min(doc_id) AS doc_id, canonical_url AS key,
       CAST(count(*) AS BIGINT) AS n
FROM canon GROUP BY canonical_url
UNION ALL
SELECT 'domain_cap' AS tag, doc_id, host AS key, CAST(rnk AS BIGINT) AS n
FROM (
  SELECT doc_id, host,
         row_number() OVER (
           PARTITION BY host
           ORDER BY md5(cast(doc_id AS STRING)), doc_id) AS rnk
  FROM canon
) WHERE rnk <= 5
UNION ALL
SELECT 'budget' AS tag, doc_id, source AS key, CAST(cum AS BIGINT) AS n
FROM (
  SELECT doc_id, source,
         sum(nt) OVER (
           PARTITION BY source
           ORDER BY md5(cast(doc_id AS STRING)), doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(text, ' +'),
                           x -> x <> '')) AS nt
    FROM documents
  )
) WHERE cum <= 600
UNION ALL
SELECT 'pack' AS tag, doc_id, source AS key, CAST(pack_id AS BIGINT) AS n
FROM packed
UNION ALL
SELECT 'chunk' AS tag, doc_id,
       concat(cast(i AS STRING), ':',
              md5(array_to_string(
                    list_slice(t, i * 24 + 1, i * 24 + 32), ' '))) AS key,
       CAST(len(list_slice(t, i * 24 + 1, i * 24 + 32)) AS BIGINT) AS n
FROM (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS t
  FROM documents
), LATERAL unnest(generate_series(
     0, CAST(ceil(greatest(0, len(t) - 32) / (24.0::DOUBLE)) AS BIGINT)
   )) AS g(i)
"""


# ---------------------------------------------------------------------------
# registry

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the driver's CORRECTNESS window records the
    first 50, so every entry gets a driver row. Ordering: newest /
    least-driver-proven first, stable veterans after. Near-duplicate
    gates are merged (grok strategies, dedup stats+keep, multimodal
    meta+frames, asof directions, both IVF paths, both file
    collectors); template render is covered by route_rendered,
    brute-force top-k by knn_join/knn_join_ivf, plain region revenue by
    the bucketed variant, and per-doc simhash values by pytest
    (test_dedup) under the pairs gate. The r6 curation gates displaced
    tpch_pricing_summary / tpch_top_orders (5-round driver veterans,
    still oracle-verified in tests/test_retired_gates.py)."""
    return {
        # --- new this round (r6): corpus curation ---
        "corpus_decontaminate": q_corpus_decontaminate,
        "corpus_select": q_corpus_select,
        # --- new / never driver-verified this code (r4) ---
        "streaming_parity": q_streaming_parity,
        "knn_join_ivf": q_knn_join_ivf,
        "collector_file_dir": q_collector_file_dir,
        "degradation_sample": q_degradation_sample,
        "tpch_bucketed_revenue": q_tpch_bucketed_revenue,
        "html_extract_text": q_html_extract_text,
        "agg_rollup_counts": q_agg_rollup_counts,
        "knn_join": q_knn_join,
        "text_dup_windows": q_text_dup_windows,
        "text_excise_windows": q_text_excise_windows,
        # --- merged gates (both halves hash-checked in one row) ---
        "parse_grok_dict": q_parse_grok_dict_both,
        "dedup_exact": q_dedup_exact,
        "multimodal_pipeline": q_multimodal_pipeline,
        "asof_join": q_asof_join_both,
        "ann_ivf": q_ann_ivf,
        # --- stable, driver-verified r1-r3 ---
        "parse_regex": q_parse_regex,
        "parse_csv": q_parse_csv,
        "parse_json": q_parse_json,
        "parse_json_dynamic": q_parse_json_dynamic,
        "validate_filter": q_validate_filter,
        "validate_modes": q_validate_modes,
        "rewrite_enrich": q_rewrite_enrich,
        "rewrite_lookup_join": q_rewrite_lookup_join,
        "rewrite_jsonify_splice": q_rewrite_jsonify_splice,
        "rewrite_unjsonify": q_rewrite_unjsonify,
        "rewrite_command": q_rewrite_command,
        "rewrite_scrub": q_rewrite_scrub,
        "route_fanout_counts": q_route_fanout_counts,
        "route_rendered": q_route_rendered,
        "route_dead_letter": q_route_dead_letter,
        "agg_sink_counts": q_agg_sink_counts,
        "agg_distinct_salted": q_agg_distinct_salted,
        "agg_percentiles": q_agg_percentiles,
        "syslog_decode": q_syslog_decode,
        "text_stats": q_text_stats,
        "text_repetition": q_text_repetition,
        "fingerprint_minshingle": q_fingerprint_minshingle,
        "quality_filter": q_quality_filter,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_exact": q_embedding_near_dup_exact,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "rate_limit_admit": q_rate_limit_admit,
        "embed_text_fake": q_embed_text_fake,
        "curation_pipeline": q_curation_pipeline,
        "checkpoint_resume": q_checkpoint_resume,
        "sessionize": q_sessionize,
        "dedup_cluster_keep": q_dedup_cluster_keep,
    }


def oracle_sql() -> dict[str, str]:
    return {
        # --- new this round (r6): corpus curation ---
        "corpus_decontaminate": SQL_CORPUS_DECONTAMINATE,
        "corpus_select": SQL_CORPUS_SELECT,
        # --- new / never driver-verified this code (r4) ---
        "streaming_parity": SQL_STREAMING_PARITY,
        "knn_join_ivf": SQL_KNN_JOIN,
        "collector_file_dir": SQL_COLLECTOR_FILE_DIR,
        "degradation_sample": SQL_DEGRADATION_SAMPLE,
        "tpch_bucketed_revenue": SQL_TPCH_BUCKETED_REVENUE,
        "html_extract_text": SQL_HTML_EXTRACT_TEXT,
        "agg_rollup_counts": SQL_AGG_ROLLUP_COUNTS,
        "knn_join": SQL_KNN_JOIN,
        "text_dup_windows": SQL_TEXT_DUP_WINDOWS,
        "text_excise_windows": SQL_TEXT_EXCISE_WINDOWS,
        # --- merged gates ---
        "parse_grok_dict": SQL_PARSE_GROK_BOTH,
        "dedup_exact": SQL_DEDUP_EXACT_MERGED,
        "multimodal_pipeline": SQL_MULTIMODAL_PIPELINE,
        "asof_join": SQL_ASOF_JOIN_BOTH,
        "ann_ivf": SQL_ANN_IVF_BOTH,
        # --- stable, driver-verified r1-r3 ---
        "parse_regex": SQL_PARSE_REGEX,
        "parse_csv": SQL_PARSE_CSV,
        "parse_json": SQL_PARSE_JSON,
        "parse_json_dynamic": SQL_PARSE_JSON_DYNAMIC,
        "validate_filter": SQL_VALIDATE_FILTER,
        "validate_modes": SQL_VALIDATE_MODES,
        "rewrite_enrich": SQL_REWRITE_ENRICH,
        "rewrite_lookup_join": SQL_REWRITE_LOOKUP,
        "rewrite_jsonify_splice": SQL_REWRITE_JSONIFY_SPLICE,
        "rewrite_unjsonify": SQL_REWRITE_UNJSONIFY,
        "rewrite_command": SQL_REWRITE_COMMAND,
        "rewrite_scrub": SQL_REWRITE_SCRUB,
        "route_fanout_counts": SQL_ROUTE_FANOUT,
        "route_rendered": SQL_ROUTE_RENDERED,
        "route_dead_letter": SQL_ROUTE_DEAD_LETTER,
        "agg_sink_counts": SQL_AGG_SINK_COUNTS,
        "agg_distinct_salted": SQL_AGG_DISTINCT_SALTED,
        "agg_percentiles": SQL_AGG_PERCENTILES,
        "syslog_decode": SQL_SYSLOG_DECODE,
        "text_stats": SQL_TEXT_STATS,
        "text_repetition": SQL_TEXT_REPETITION,
        "fingerprint_minshingle": SQL_FINGERPRINT_MINSHINGLE,
        "quality_filter": SQL_QUALITY_FILTER,
        # the LSH/hash ops are fully SQL-reproducible: md5-based token
        # hashes (md5_number_upper), literal hyperplanes/centroids, and
        # a recursive CTE for the leaky-bucket recurrence
        "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
        "embedding_near_dup_exact": SQL_EMBEDDING_NEAR_DUP_EXACT,
        "dedup_minhash_pairs": SQL_DEDUP_MINHASH_PAIRS,
        "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
        "rate_limit_admit": SQL_RATE_LIMIT_ADMIT,
        "embed_text_fake": SQL_EMBED_TEXT_FAKE,
        "curation_pipeline": SQL_CURATION_PIPELINE,
        "checkpoint_resume": SQL_CHECKPOINT_RESUME,
        "sessionize": SQL_SESSIONIZE,
        "dedup_cluster_keep": SQL_DEDUP_CLUSTER_KEEP,
    }
