"""Corpus-curation operators: canonical-URL semantics, per-host caps,
token budgets, and benchmark decontamination — correctness plus the
plan shapes the 100 TB design depends on (WindowGroupLimit below the
cap's exchange, broadcast of the benchmark shingle set)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logagent_spark.operators import curation as cu
from logagent_spark.operators import textstats as ts

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(
        cu.canonicalize_url(F.col("url")).alias("c")
    ).collect()[0][0]


CANON_CASES = [
    # scheme + host case, default port, fragment
    ("HTTP://WWW.Example.COM:80/a/b#frag", "http://example.com/a/b"),
    ("https://site.org:443/x", "https://site.org/x"),
    # non-default port survives
    ("http://site.org:8080/x", "http://site.org:8080/x"),
    # trailing slashes, empty path
    ("http://a.com///", "http://a.com/"),
    ("http://a.com", "http://a.com/"),
    # param sort + tracking strip + empty segments
    (
        "http://a.com/p?z=1&a=2&utm_source=rss&&fbclid=XYZ",
        "http://a.com/p?a=2&z=1",
    ),
    ("http://a.com/p?utm_campaign=x&gclid=1&ref=tw", "http://a.com/p"),
    # a param whose VALUE mentions a tracking key is kept
    ("http://a.com/p?q=utm_source", "http://a.com/p?q=utm_source"),
    # www stripped only as a label prefix
    ("http://wwwx.com/p", "http://wwwx.com/p"),
]


@pytest.mark.parametrize("url,want", CANON_CASES)
def test_canonicalize_url_cases(spark, url, want):
    assert _canon(spark, url) == want


def test_canonicalize_url_idempotent(spark):
    for url, _ in CANON_CASES:
        once = _canon(spark, url)
        assert _canon(spark, once) == once


def test_url_dedup_keep_collapses_recrawls(spark):
    rows = [
        (1, "HTTP://WWW.A.com:80/page?b=2&a=1#x"),
        (2, "http://a.com/page/?a=1&b=2&utm_source=rss"),
        (3, "http://a.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["canonical_url"]: (r["doc_id"], r["n_crawls"])
        for r in cu.url_dedup_keep(df, "doc_id", "url").collect()
    }
    assert out["http://a.com/page?a=1&b=2"] == (1, 2)
    assert out["http://a.com/other"] == (3, 1)


def test_domain_cap_sample_caps_and_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.col("source").alias("host")
    )
    a = cu.domain_cap_sample(docs, "host", "doc_id", cap=5)
    per_host = a.groupBy("host").count().collect()
    assert per_host and all(r["count"] <= 5 for r in per_host)
    ids = sorted(r["doc_id"] for r in a.collect())
    b = cu.domain_cap_sample(docs, "host", "doc_id", cap=5)
    assert sorted(r["doc_id"] for r in b.collect()) == ids


def test_domain_cap_plan_has_window_group_limit(spark):
    """The <= cap filter must become a partial WindowGroupLimit BELOW
    the exchange (map-side cap) — the property that keeps mega-hosts
    from flooding the shuffle at corpus scale."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.col("source").alias("host")
    )
    plan = _plan(cu.domain_cap_sample(docs, "host", "doc_id", cap=5))
    assert "WindowGroupLimit" in plan
    partial = plan.split("Exchange")[-1]  # below the (last) exchange
    assert "WindowGroupLimit" in partial and "Partial" in partial


def test_token_budget_select_is_hash_order_prefix(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = cu.token_budget_select(
        docs, "source", "doc_id", "text", budget=600
    ).collect()
    assert out
    full = docs.select(
        "doc_id", "source",
        ts.token_count(F.col("text")).alias("nt"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).collect()
    by_src: dict[str, list] = {}
    for r in full:
        by_src.setdefault(r["source"], []).append(r)
    admitted = {r["doc_id"]: r for r in out}
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (r["h"], r["doc_id"]))
        cum = 0
        for r in rows:
            cum += r["nt"]
            if cum <= 600:
                got = admitted.pop(r["doc_id"])
                assert got["cum_tokens"] == cum and got["n_tokens"] == r["nt"]
            else:
                break  # strict prefix: nothing later in this group admits
    assert not admitted  # nothing admitted outside the per-group prefixes


def test_decontaminate_counts_and_clean_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with no benchmark overlap here"),
            (3, "the quick brown fox jumps elsewhere entirely now friend"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in cu.decontaminate(
            corpus, bench, "doc_id", "text", k=5
        ).collect()
    }
    # doc 1 contains all 5 benchmark 5-grams; doc 3 only the first one
    assert out[1] == (5, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)


def test_decontaminate_plan_broadcasts_benchmark(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    out = cu.decontaminate(docs, bench, "doc_id", "text", k=5)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    # the corpus-side shingle stream must never sort-merge on the hash
    assert "SortMergeJoin [h" not in plan


# ---------------------------------------------------------------------------
# pack_greedy


def _packing_df(spark, rows):
    return spark.createDataFrame(rows, "grp string, doc_id long, text string")


def test_pack_greedy_first_fit_hand_example(spark):
    """Fold replayed by hand in md5(doc_id) order against max_len=5."""
    rows = [("g", i, " ".join(["w"] * n))
            for i, n in [(0, 3), (1, 2), (2, 4), (3, 1), (4, 5), (5, 2)]]
    out = cu.pack_greedy(_packing_df(spark, rows), "grp", "doc_id", "text",
                         max_len=5).collect()
    import hashlib

    # replay the fold in the same deterministic order
    toks = {i: n for i, n in [(0, 3), (1, 2), (2, 4), (3, 1), (4, 5), (5, 2)]}
    seq = sorted(toks, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    want, p, f = {}, -1, 0
    for i in seq:
        if p < 0 or f + toks[i] > 5:
            p, f = p + 1, toks[i]
        else:
            f += toks[i]
        want[i] = (p, f)
    got = {r["doc_id"]: (r["pack_id"], r["pack_fill"]) for r in out}
    assert got == want


def test_pack_greedy_bounds_and_oversize(spark):
    """Every pack's final fill <= max_len unless it is a single oversize
    doc, which sits alone in its own over-full pack."""
    rows = [("g", i, " ".join(["w"] * n))
            for i, n in enumerate([4, 9, 2, 3, 9, 1, 2, 2])]  # 9 > max 6
    out = cu.pack_greedy(_packing_df(spark, rows), "grp", "doc_id", "text",
                         max_len=6).collect()
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for members in packs.values():
        if len(members) == 1:
            continue  # singleton may be oversize by design
        assert sum(members) <= 6
    oversize = [r["pack_id"] for r in out if r["n_tokens"] > 6]
    for p in oversize:
        assert len(packs[p]) == 1


def test_pack_greedy_deterministic_across_partitioning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = cu.pack_greedy(docs, "source", "doc_id", "text", max_len=120)
    b = cu.pack_greedy(docs.repartition(13), "source", "doc_id", "text",
                       max_len=120)
    rows_a = sorted((r["doc_id"], r["pack_id"], r["pack_fill"])
                    for r in a.collect())
    rows_b = sorted((r["doc_id"], r["pack_id"], r["pack_fill"])
                    for r in b.collect())
    assert rows_a == rows_b and rows_a


def test_pack_greedy_sharded_keeps_per_shard_semantics(spark):
    """n_shards > 1: every doc appears exactly once; within each
    (group, shard) the assignment equals the unsharded fold of that
    shard's docs alone."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sharded = cu.pack_greedy(docs, "source", "doc_id", "text",
                             max_len=120, n_shards=3)
    rows = sharded.collect()
    assert len(rows) == docs.count()
    assert {r["pack_shard"] for r in rows} <= {0, 1, 2}
    # replay one (source, shard) slice through the unsharded op
    src = rows[0]["source"]
    shard = rows[0]["pack_shard"]
    slice_ids = {r["doc_id"] for r in rows
                 if r["source"] == src and r["pack_shard"] == shard}
    redo = cu.pack_greedy(
        docs.filter(F.col("doc_id").isin(list(slice_ids))),
        "source", "doc_id", "text", max_len=120,
    ).collect()
    want = {r["doc_id"]: (r["pack_id"], r["pack_fill"]) for r in redo}
    got = {r["doc_id"]: (r["pack_id"], r["pack_fill"]) for r in rows
           if r["source"] == src and r["pack_shard"] == shard}
    assert got == want


# ---------------------------------------------------------------------------
# chunk_tokens


def test_chunk_tokens_covers_and_overlaps(spark):
    """Chunks tile the doc: chunk i drops its first `overlap` tokens
    (except chunk 0) and the concatenation reproduces the original
    token stream; consecutive chunks share exactly `overlap` tokens."""
    text = " ".join(f"t{i}" for i in range(57))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        cu.chunk_tokens(df, "doc_id", "text", max_len=32, overlap=8)
        .collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    toks = [r["chunk_text"].split(" ") for r in out]
    assert toks[0] == [f"t{i}" for i in range(32)]
    assert toks[1][:8] == toks[0][-8:]  # shared overlap
    rebuilt = toks[0] + [t for c in toks[1:] for t in c[8:]]
    assert rebuilt == text.split(" ")
    assert [r["n_chunk_tokens"] for r in out] == [32, 32, 9]


@pytest.mark.parametrize("n,want_chunks", [(0, 1), (1, 1), (32, 1),
                                           (33, 2), (56, 2), (57, 3)])
def test_chunk_tokens_chunk_count(spark, n, want_chunks):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * n))], "doc_id long, text string"
    )
    rows = cu.chunk_tokens(df, "doc_id", "text", max_len=32,
                           overlap=8).collect()
    assert len(rows) == want_chunks
    if n == 0:
        assert rows[0]["chunk_text"] == "" and rows[0]["n_chunk_tokens"] == 0
    else:  # no trailing chunk fully contained in its predecessor
        last = max(rows, key=lambda r: r["chunk_idx"])
        assert last["chunk_idx"] * 24 + last["n_chunk_tokens"] == n


def test_chunk_tokens_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(cu.chunk_tokens(docs, "doc_id", "text", max_len=32,
                                 overlap=8))
    assert "Exchange" not in plan and "Generate" in plan


def test_chunk_tokens_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cu.chunk_tokens(docs, "doc_id", "text", max_len=8, overlap=8)


def test_chunk_then_pack_bounds_every_pack(spark):
    """The composition the two operators exist for: chunk oversize docs
    at max_len (overlap=0), then pack the chunks — with no chunk longer
    than max_len, EVERY pack fill is <= max_len, no exceptions."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = cu.chunk_tokens(docs.select("doc_id", "source", "text"),
                             "doc_id", "text", max_len=24, overlap=0)
    pieces = chunks.select(
        F.concat_ws("#", F.col("doc_id").cast("string"),
                    F.col("chunk_idx").cast("string")).alias("piece_id"),
        "source",
        F.col("chunk_text").alias("text"),
    )
    packed = cu.pack_greedy(pieces, "source", "piece_id", "text",
                            max_len=24)
    fills = packed.groupBy("source", "pack_id").agg(
        F.sum("n_tokens").alias("fill")).collect()
    assert fills and all(r["fill"] <= 24 for r in fills)
    assert packed.count() == pieces.count()


def test_chunk_tokens_null_text_yields_one_empty_chunk(spark):
    """ADVICE r6: a NULL-text row must survive chunking as one empty
    chunk (like n = 0 does) — the NULL token-array size previously made
    the explode eliminate the row entirely."""
    from logagent_spark.operators.curation import chunk_tokens

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_tokens(df, "doc_id", "text", max_len=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert sorted(by_id) == [1, 2, 3]
    assert len(by_id[2]) == 1
    r = by_id[2][0]
    assert (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]) == (0, "", 0)
    assert [x["chunk_text"] for x in sorted(by_id[1],
                                            key=lambda x: x["chunk_idx"])] \
        == ["alpha beta", "gamma"]


def test_decontaminate_rejoin_broadcasts_small_hits(spark):
    """VERDICT r6 #5: the hits->corpus re-join must be a broadcast when
    the contaminated set is small (the common case). The guard is AQE's
    runtime size check — it broadcasts the hits side from its MEASURED
    size, and falls back to a shuffle join when a heavily-contaminated
    corpus makes hits ~ corpus; an unconditional F.broadcast would OOM
    exactly there, and a pre-count of hits would execute the expensive
    shingle join twice. Gate: after execution, BOTH joins (benchmark
    shingle set into the scan, hits back onto the corpus) are
    BroadcastHashJoin and no sort-merge/shuffled-hash join appears."""
    from logagent_spark.queries import q_corpus_decontaminate

    df = q_corpus_decontaminate(spark, "/root/testdata/sf0.001")
    df.count()  # let AQE finalize the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
