"""Dedup operators: exact, MinHash+LSH, SimHash, embedding near-dup —
checked against brute-force python oracles on a corpus with planted
duplicates."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from logagent_spark.operators import dedup

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "pack my box with five dozen liquor jugs before the evening train leaves",
    "a completely different document about spark catalyst optimizer internals",
    "log agents ship structured telemetry to downstream sinks for analysis",
]


@pytest.fixture(scope="module")
def corpus():
    docs = []
    i = 0
    for b in BASE:
        docs.append((i, b)); i += 1
    # exact duplicates (and a whitespace/case variant of doc 0)
    docs.append((i, BASE[0])); i += 1
    docs.append((i, "  The QUICK  brown fox jumps over the lazy dog near the river bank today")); i += 1
    # near duplicate of doc 1 (one word changed)
    docs.append((i, BASE[1].replace("liquor", "water"))); i += 1
    # near duplicate of doc 3 (word appended)
    docs.append((i, BASE[3] + " quickly")); i += 1
    return docs


def _shingle_set(text, k=5):
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)}


def _jaccard(a, b, k=5):
    sa, sb = _shingle_set(a, k), _shingle_set(b, k)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates_and_dedup(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    groups = dedup.exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert sorted(groups[0]["doc_ids"]) == [0, 4, 5]  # normalization folds case/space

    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(df, "doc_id", "text").collect())
    assert kept == [0, 1, 2, 3, 6, 7]  # smallest id survives per group


def test_minhash_near_duplicates_vs_bruteforce(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.minhash_near_duplicates(
            df, "doc_id", "text", threshold=0.3, shingle_k=5
        ).collect()
    }
    # every reported jaccard must equal the brute-force value
    by_id = dict(corpus)
    for (a, b), j in got.items():
        assert abs(j - _jaccard(by_id[a], by_id[b])) < 1e-9
    # every high-jaccard pair (where 16-band/4-row LSH detection
    # probability is ~1) must be found
    brute_high = {
        (a, b)
        for (a, ta), (b, tb) in itertools.combinations(corpus, 2)
        if _jaccard(ta, tb) >= 0.7
    }
    assert {(0, 4), (3, 7)} <= brute_high  # planted exact + appended-word dup
    assert brute_high <= set(got), f"missing: {brute_high - set(got)}"


def _py_simhash(text, num_bits=64):
    toks = text.lower().split()
    votes = [0] * num_bits
    for t in toks:
        h = dedup.token_hash_u64(t)
        for b in range(num_bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(num_bits):
        if votes[b] > 0:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig  # as int64


def test_simhash_near_duplicates(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_near_duplicates(
            df, "doc_id", "text", max_hamming=3
        ).collect()
    }
    # identical token streams -> hamming 0 (case/space-folded)
    assert pairs.get((0, 4)) == 0 and pairs.get((0, 5)) == 0
    # guarantee: every true pair with hamming <= 3 is found (pigeonhole
    # over 4x16-bit chunks), and every reported hamming is exact
    by_id = dict(corpus)
    sigs = {i: _py_simhash(t) for i, t in corpus}
    for (a, b), h in pairs.items():
        true_h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        assert h == true_h and h <= 3, (a, b, h, true_h)
    want = {
        (a, b)
        for (a, _), (b, _) in itertools.combinations(corpus, 2)
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    assert want == set(pairs), (want, set(pairs))
    _ = by_id


def test_simhash_deterministic(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    a = {r["doc_id"]: r["simhash"] for r in dedup.with_simhash(df, "text").collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.with_simhash(df, "text").collect()}
    assert a == b
    assert a[0] == a[4]  # same tokens -> same signature


def test_embedding_near_duplicates(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(6, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # plant a near-dup of vector 2
    v = base[2] + rng.randn(16) * 0.01
    rows.append((6, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = dedup.embedding_near_duplicates(
        df, "vec_id", "embedding", dim=16, threshold=0.95, n_planes=8
    ).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (2, 6) in pairs
    for r in got:
        assert r["cos"] >= 0.95


def test_minhash_bucket_cap_drops_degenerate_cluster(spark):
    """A pile of identical docs shares one signature in every band — a
    degenerate bucket that would emit O(n^2) pairs at corpus scale. The
    cap drops such buckets (they belong to exact dedup); distinct docs
    below the cap are unaffected."""
    docs = [(i, BASE[0]) for i in range(10)]
    docs += [(100, BASE[1]), (101, BASE[1] + " quickly")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    capped = dedup.minhash_near_duplicates(
        df, "doc_id", "text", threshold=0.5, num_hashes=32, bands=8,
        max_bucket_size=5,
    ).collect()
    pairs = {(r["a"], r["b"]) for r in capped}
    assert (100, 101) in pairs  # genuine near-dup survives
    assert all(a >= 100 for a, _ in pairs)  # identical cluster suppressed

    uncapped = dedup.minhash_near_duplicates(
        df, "doc_id", "text", threshold=0.5, num_hashes=32, bands=8,
    ).collect()
    assert {(r["a"], r["b"]) for r in uncapped} >= {(0, 1), (8, 9), (100, 101)}


def test_connected_components_and_cluster_dedup(spark):
    """Transitive near-dup clusters: {1,2,3} via chain 1-2, 2-3 plus
    {7,9}; winners are the min ids; untouched docs survive."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "a long, b long"
    )
    comp = {r["id"]: r["component"]
            for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.dedup_cluster(docs, pairs, "doc_id").collect()
    )
    assert kept == [0, 1, 4, 5, 6, 7, 8]


def test_connected_components_long_chain(spark):
    """A path graph needs multiple propagation rounds (min label must
    travel the chain) — exercises the DISTRIBUTED convergence loop
    (small_graph_edges=0 forces past the union-find fast path)."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a long, b long"
    )
    comp = dedup.connected_components(pairs, small_graph_edges=0).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n + 1


def test_connected_components_200_node_path(spark):
    """Diameter-200 chain on the DISTRIBUTED path: plain one-hop
    propagation would need 200 rounds and silently return split
    components at max_iters=50; pointer jumping must converge in
    O(log n) rounds instead."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a long, b long"
    )
    comp = dedup.connected_components(
        pairs, max_iters=20, small_graph_edges=0
    ).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n + 1


def test_connected_components_two_clique_bridge(spark):
    """Two 5-cliques joined by a single bridge edge collapse to one
    component labeled by the global min id — and the union-find fast
    path (default for a graph this small) must agree exactly with the
    distributed loop."""
    import itertools as it

    c1 = list(it.combinations(range(0, 5), 2))
    c2 = list(it.combinations(range(100, 105), 2))
    bridge = [(4, 100)]
    pairs = spark.createDataFrame(
        c1 + c2 + bridge, "a long, b long"
    )
    small = {r["id"]: r["component"]
             for r in dedup.connected_components(pairs).collect()}
    assert set(small.values()) == {0}
    assert len(small) == 10
    dist = {r["id"]: r["component"]
            for r in dedup.connected_components(
                pairs, small_graph_edges=0).collect()}
    assert small == dist


def test_suggest_lsh_config():
    """The scale-path config guard: high thresholds get a sparse,
    recall-sound banding; the gate config's admit-most behavior is never
    suggested; infeasible low thresholds degrade loudly (cand_frac says
    so) instead of silently under-recalling."""
    cfg = dedup.suggest_lsh_config(0.95)
    assert cfg["expected_recall"] >= 0.9
    assert cfg["expected_cand_frac"] <= 0.01
    assert cfg["n_planes"] == cfg["bits_per_band"] * cfg["n_chunks"]
    assert cfg["n_planes"] > 8  # the p8 gate config is gate-only

    # tighter threshold -> needs fewer planes for the same recall
    loose = dedup.suggest_lsh_config(0.99)
    assert loose["n_planes"] <= cfg["n_planes"]

    # low threshold: no sparse config exists; constraint relaxes and the
    # returned cand_frac is honest about it
    hard = dedup.suggest_lsh_config(0.5)
    assert hard["expected_cand_frac"] > 0.01

    sized = dedup.suggest_lsh_config(0.95, n=100_000)
    assert sized["expected_cand_pairs"] == int(
        sized["expected_cand_frac"] * 100_000 * 99_999 / 2
    )


def test_suggest_minhash_config():
    """MinHash twin of the config guard: recall-sound banding at the
    threshold, bounded background candidates, honest degradation."""
    cfg = dedup.suggest_minhash_config(0.8)
    assert cfg["expected_recall"] >= 0.9
    assert cfg["expected_cand_frac"] <= 0.01
    assert cfg["num_hashes"] == cfg["rows_per_band"] * cfg["bands"]
    # the S-curve midpoint (1/b)^(1/r) should sit near-below the
    # threshold, not far above it (that would silently drop true pairs)
    mid = (1.0 / cfg["bands"]) ** (1.0 / cfg["rows_per_band"])
    assert mid < 0.8
    # near-exact threshold needs fewer hashes than a loose one
    tight = dedup.suggest_minhash_config(0.95)
    assert tight["num_hashes"] <= cfg["num_hashes"]


def test_embedding_near_duplicates_auto_config(spark):
    """Defaults (no explicit planes/chunks) flow through
    suggest_lsh_config and still find a planted near-dup."""
    rng = np.random.RandomState(3)
    base = rng.randn(8, 16)
    rows = [(i, (v / np.linalg.norm(v)).tolist())
            for i, v in enumerate(base)]
    v = base[4] + rng.randn(16) * 0.01
    rows.append((8, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = dedup.embedding_near_duplicates(
        df, "vec_id", "embedding", dim=16, threshold=0.95
    ).collect()
    assert (4, 8) in {(r["a"], r["b"]) for r in got}


def test_hyperplane_band_keys_pandas_bit_identical(spark):
    """r7: the Arrow band-key pass must reproduce the expr fold's band
    keys bit-exactly — sequential fold over dimensions, `dot >= 0` with
    Spark's NaN-is-largest ordering — including edge vectors (NULL /
    ragged / NULL-element -> key 0 in every band; inf arithmetic whose
    dot goes NaN -> bit 1), and the two candidate strategies must emit
    the same pair set. (cos VALUES on inf vectors differ NULL-vs-NaN in
    the scorer's Arrow return — pre-existing, unreachable on real
    embeddings, out of scope here.)"""
    dim, n_planes, n_chunks = 16, 8, 3
    rng = np.random.RandomState(7)
    rows = [(str(i), rng.randn(dim).tolist()) for i in range(120)]
    base = rng.randn(dim)
    rows += [(f"c{i}", (base + 0.01 * rng.randn(dim)).tolist())
             for i in range(12)]
    rows += [
        ("e_null", None),
        ("e_ragged", [1.0] * (dim - 1)),
        ("e_nullel", [None] + [1.0] * (dim - 1)),
        ("e_zero", [0.0] * dim),
        ("e_inf", [float("inf")] + [0.0] * (dim - 1)),
        ("e_infnan", [float("inf"), float("-inf")] + [1.0] * (dim - 2)),
    ]
    df = spark.createDataFrame(rows, "vid string, emb array<double>")

    planes = dedup.seeded_planes(n_planes, dim, 42)
    chunks = dedup.plane_chunks(n_planes, n_chunks)
    got = {
        (r["_id"], r["band"]): r["key"]
        for r in dedup._hyperplane_band_keys_pandas(
            df, "vid", "emb", planes, chunks
        ).collect()
    }
    bits = dedup.hyperplane_bits(F.col("emb"), planes)
    sel = [F.col("vid")]
    for c, idxs in enumerate(chunks):
        key = F.lit(0)
        for i in idxs:
            key = key * 2 + bits[i]
        sel.append(key.alias(f"k{c}"))
    exp = {
        (r["vid"], c): r[f"k{c}"]
        for r in df.select(*sel).collect()
        for c in range(n_chunks)
    }
    assert got == exp
    # every edge vector really takes key 0 in every band
    for vid in ("e_null", "e_ragged", "e_nullel"):
        assert all(got[(vid, c)] == 0 for c in range(n_chunks))

    pair_sets = [
        {
            (r["a"], r["b"])
            for r in dedup.embedding_candidate_pairs(
                df, "vid", "emb", dim=dim, n_planes=n_planes,
                n_chunks=n_chunks, strategy=s,
            ).collect()
        }
        for s in ("pandas", "expr")
    ]
    assert pair_sets[0] == pair_sets[1]


def test_connected_components_raises_on_nonconvergence(spark):
    """Exhausting max_iters without a fixed point must raise, never
    silently return split components."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="no fixed point"):
        dedup.connected_components(pairs, max_iters=1, small_graph_edges=0)


def test_connected_components_paths_agree_on_mixed_graph(spark):
    """Union-find fast path == distributed pointer-jumping loop on a
    graph mixing chains, cliques, self-contained pairs and string ids."""
    import itertools as it

    edges = (
        [(f"c{i}", f"c{i+1}") for i in range(40)]            # chain
        + [(f"k{a}", f"k{b}") for a, b in
           it.combinations(range(6), 2)]                      # clique
        + [("x1", "x2"), ("y1", "y2"), ("x2", "x3")]          # smalls
    )
    pairs = spark.createDataFrame(edges, "a string, b string")
    small = {r["id"]: r["component"]
             for r in dedup.connected_components(pairs).collect()}
    dist = {r["id"]: r["component"]
            for r in dedup.connected_components(
                pairs, small_graph_edges=0).collect()}
    assert small == dist and len(small) == 41 + 6 + 5


def test_minhash_config_must_come_in_pairs(spark):
    """Banding math couples num_hashes and bands: passing exactly one
    raises instead of silently discarding it (ADVICE r3)."""
    docs = spark.createDataFrame([(1, "a b c d e f")], "id long, text string")
    with pytest.raises(ValueError, match="together"):
        dedup.minhash_near_duplicates(docs, "id", "text", num_hashes=32)
    with pytest.raises(ValueError, match="together"):
        dedup.minhash_near_duplicates(docs, "id", "text", bands=8)
