"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Scale design (the whole point — 10^12 docs):

  * exact dedup: hash-groupBy on a 128-bit content hash. The shuffle key
    is the hash (uniform by construction — no skew), and only (hash, id)
    pairs shuffle, never the documents;
  * MinHash+LSH: signatures are computed scan-side as pure Column
    expressions (array_min over xxhash64 of shingles — JVM, no UDF);
    banding explodes to (band, band_hash) keys and groupBys — candidate
    generation is ONE shuffle of b rows/doc of ~24 bytes each. Exact
    Jaccard verification runs only on candidate pairs (tiny);
  * SimHash: one vectorized pandas UDF (numpy bit-twiddling per Arrow
    batch) because 64 per-bit conditional sums as Columns would bloat
    codegen; near-dup pairs via banded key join on 16-bit chunks
    (Hamming<=3 => at least one of 4 chunks equal — pigeonhole);
  * embedding near-dup: random-hyperplane LSH with seeded literal
    hyperplanes — sign-bit bucket as a Column expression, cosine check
    within buckets only.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logagent_spark.operators.textstats import (
    shingles,
    shingles_from_tokens,
    tokens,
)

# ---------------------------------------------------------------------------
# exact

def content_hash(col: Column, normalize: bool = True) -> Column:
    c = (
        F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
        if normalize
        else col
    )
    return F.md5(c)


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """-> (hash, n_dups, doc_ids) for every duplicated content hash."""
    h = content_hash(F.col(text_col), normalize).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """Keep the smallest id per content hash (deterministic winner).
    Implemented as min-by aggregation — one shuffle on the uniform hash,
    never a window sort over the full corpus."""
    h = content_hash(F.col(text_col), normalize).alias("content_hash")
    winners = (
        df.select(h, F.col(id_col).alias("_id"))
        .groupBy("content_hash")
        .agg(F.min("_id").alias(id_col))
        .drop("content_hash")
    )
    return df.join(winners, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signature(
    col: Column, num_hashes: int = 64, shingle_k: int = 5
) -> Column:
    """array<long> signature: element i = min over shingles of
    xxhash64(shingle, seed_i). Pure Column expr — computed scan-side.

    Expression shape matters twice over:

    * the shingle array is the OUTER transform argument, so it is
      derived once per row; a naive per-seed expression list re-derives
      it num_hashes times (Catalyst's subexpression elimination does not
      reach inside lambda bodies — measured ~30× slower);
    * each shingle STRING is hashed exactly once; the num_hashes seeded
      variants rehash the resulting 8-byte long (`xxhash64(h, seed)` —
      the standard universal-rehash MinHash construction), not the
      ~30-byte string. Hashing the string per seed made signature
      generation the hot loop of the whole MinHash pipeline.
    """
    return minhash_signature_from_shingles(
        shingles(col, shingle_k), num_hashes
    )


def minhash_signature_from_shingles(
    sh: Column, num_hashes: int = 64
) -> Column:
    """minhash_signature from an already-built shingle array Column —
    pair with a materialized token column + shingles_from_tokens so the
    token split runs once per row (see textstats.shingles_from_tokens)."""
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    hs = F.transform(sh, lambda s: F.xxhash64(s))
    per_shingle = F.transform(
        hs, lambda h: F.transform(seeds, lambda seed: F.xxhash64(h, seed))
    )
    init = F.array(*[F.lit(9223372036854775807)] * num_hashes)
    return F.aggregate(
        per_shingle,
        init,
        lambda acc, h: F.zip_with(acc, h, lambda a, b: F.least(a, b)),
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """LSH banding -> candidate near-duplicate pairs (a < b).

    Shuffle cost: bands rows per doc of (band_id, band_hash, id) — the
    banded hash is uniform, so no skew; the self-join never happens
    (pairs are built by collecting ids per bucket, and buckets are tiny
    by construction). `max_bucket_size` guards the degenerate buckets a
    real corpus produces (every empty/boilerplate doc shares one
    signature and would emit O(n^2) pairs): oversized buckets are
    exact-duplicate clusters in disguise — handle them with
    `exact_duplicates`, not pairwise Jaccard."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_from_shingles(
        shingles_from_tokens(F.col("_tk"), shingle_k), num_hashes
    )
    banded = df.select(
        F.col(id_col).alias("_id"),
        tokens(F.col(text_col)).alias("_tk"),
    ).select(F.col("_id"), sig.alias("_sig")).select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[
                            F.col("_sig").getItem(b * rows_per_band + r)
                            for r in range(rows_per_band)
                        ]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("_bb"),
    ).select("_id", "_bb.band", "_bb.bucket")

    buckets = banded.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list("_id")).alias("ids")
    ).filter(
        (F.size("ids") > 1) & (F.size("ids") <= max_bucket_size)
    )

    # pairs within each bucket, deduped across bands
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b").distinct()
    return pairs


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs -> (a, b, jaccard).

    The corpus is first semi-joined down to ids that appear in a
    candidate pair, THEN shingle sets are materialized: a projection
    below the pair-join would compute the (large) shingle arrays for
    every corpus row, matching or not. Candidate ids are broadcast —
    they are tiny by LSH construction; at extreme candidate volumes
    drop the hint and AQE picks a shuffle semi-join."""
    cand_ids = (
        pairs.select(F.col("a").alias("_jid"))
        .union(pairs.select(F.col("b").alias("_jid")))
        .distinct()
    )
    sets_df = (
        df.join(
            F.broadcast(cand_ids),
            F.col(id_col) == F.col("_jid"),
            "left_semi",
        )
        .select(
            F.col(id_col).alias("_jid"),
            tokens(F.col(text_col)).alias("_tk"),
        )
        .select(
            F.col("_jid"),
            F.array_distinct(
                shingles_from_tokens(F.col("_tk"), shingle_k)
            ).alias("_set"),
        )
    )
    a_sets = sets_df.withColumnRenamed("_jid", "a").withColumnRenamed("_set", "_sa")
    b_sets = sets_df.withColumnRenamed("_jid", "b").withColumnRenamed("_set", "_sb")
    joined = pairs.join(a_sets, "a").join(b_sets, "b")
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size(F.array_union("_sa", "_sb"))
    return joined.select(
        "a", "b",
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """Full pipeline: LSH candidates -> exact Jaccard -> thresholded
    near-dup pairs (a, b, jaccard). num_hashes/bands default to
    `suggest_minhash_config(threshold)` — recall-sound banding with a
    bounded background candidate rate; pass BOTH explicitly to pin a
    gate/test parameterization (banding math couples them, so one
    without the other is almost certainly a mistake and raises)."""
    if (num_hashes is None) != (bands is None):
        raise ValueError(
            "pass num_hashes and bands together (banding couples them); "
            "omit both to use suggest_minhash_config(threshold)"
        )
    if num_hashes is None:
        cfg = suggest_minhash_config(threshold)
        num_hashes, bands = cfg["num_hashes"], cfg["bands"]
    cands = minhash_candidates(
        df, id_col, text_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
    )
    return jaccard_pairs(df, cands, id_col, text_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# cluster resolution: near-dup PAIRS -> connected components -> winners

def _union_find_components(edges: list[tuple]) -> dict:
    """Driver-side union-find with path compression; root = min id of
    the component (same winner rule as the distributed loop)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in edges:
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by MIN id so the root is the deterministic winner
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    pairs: DataFrame,
    max_iters: int = 50,
    small_graph_edges: int = 200_000,
) -> DataFrame:
    """(a, b) edge list -> (id, component) with component = min id
    reachable.

    Two paths with identical semantics (pytest-pinned equal):

    * **small graphs** (<= small_graph_edges undirected edges): one
      collect + driver-side union-find. The pair graph is the
      LSH-candidate output — usually orders of magnitude smaller than
      the corpus — and below this threshold the distributed loop's cost
      is pure fixed overhead (per-round jobs + checkpoints dwarf the
      microseconds of actual work; the benched 25-pair graph spent ~7 s
      on ~0 bytes). The collect is bounded by the threshold (~tens of
      MB), not by corpus size.
    * **large graphs**: iterative min-label propagation PLUS pointer
      jumping (the large-star/small-star "shortcut" step): each round
      every node adopts the min label in its neighborhood, then labels
      compress through themselves (label <- min(label, label[label])).
      Plain propagation alone moves the min one hop per round — a
      duplicate CHAIN of diameter > max_iters (realistic for sequential
      template drift across boilerplate pages) would exit unconverged;
      pointer jumping doubles the reach per round, so convergence is
      O(log diameter) and 50 rounds covers any graph smaller than 2^50.
      Raises RuntimeError if the loop exhausts max_iters without a
      fixed point — silently returning split components would make
      dedup_cluster keep multiple documents from one cluster with no
      signal. Per-round shuffles touch only the pair graph, never
      documents: one groupBy(min) + two skinny joins, convergence
      checked on a count. GraphFrames does the same dance; this keeps
      the engine dependency-free. Pass small_graph_edges=0 to force
      this path.
    """
    # materialize the PAIR list once (it is usually the whole LSH
    # pipeline's output plan): the path decision, the small-path
    # collect, and the large path's edge doubling all read this
    # checkpoint. The small path consumes raw pairs directly — the
    # x/y union + distinct shuffle existed only for the label loop, and
    # union-find is insensitive to duplicates (r7; a duplicate-heavy
    # pair list can only overcount the threshold, which errs toward the
    # distributed path, never wrong results).
    pairs_ck = pairs.select("a", "b").localCheckpoint(eager=True)
    if pairs_ck.count() <= small_graph_edges:
        spark = pairs.sparkSession
        comp = _union_find_components(
            [(r["a"], r["b"]) for r in pairs_ck.collect()]
        )
        id_t = pairs.schema["a"].dataType
        return spark.createDataFrame(
            list(comp.items()),
            T.StructType([T.StructField("id", id_t),
                          T.StructField("component", id_t)]),
        )
    edges = (
        pairs_ck.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(pairs_ck.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("x").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    for _ in range(max_iters):
        # neighbor labels (including own): min per node
        neigh = (
            edges.join(labels, edges.y == labels.id)
            .select(F.col("x").alias("id"), "component")
            .union(labels.select("id", "component"))
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping: component <- min(component, component's own
        # label). Components are node ids, so the hop is a self-join of
        # the skinny labels frame (NO edges involved — far cheaper than
        # the neighbor step); left join because a min label may be a
        # node whose own row hasn't changed (then hop == itself).
        # Applied 3x per round: each application composes the label map
        # with itself, so stale label chains collapse ~8x faster per
        # round at the cost of three skinny self-joins (measured on a
        # 600k-edge random graph: 30 rounds -> 13).
        for _ in range(3):
            hop = neigh.select(
                F.col("id").alias("component"),
                F.col("component").alias("hopped"),
            )
            neigh = neigh.join(hop, "component", "left").select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("hopped"), F.col("component")),
                ).alias("component"),
            )
        # truncate lineage EVERY round (without this the logical plan
        # nests one join+agg per iteration and Catalyst analysis blows
        # up around ~10 rounds — the classic iterative-DataFrame trap),
        # and ride the convergence check on the SAME action: the
        # old-vs-new label join feeds an Observation, so each round is
        # exactly one Spark job instead of checkpoint + a separate
        # changed-count job (measured ~0.7 s/round on a 600k-edge graph)
        from pyspark.sql import Observation

        delta = (
            neigh.alias("n")
            .join(labels.alias("l"), "id")
            .select(
                F.col("id"),
                F.col("n.component").alias("component"),
                (F.col("n.component") != F.col("l.component"))
                .cast("long").alias("_chg"),
            )
        )
        obs = Observation()
        ck = delta.observe(obs, F.max("_chg").alias("changed"))
        ck = ck.localCheckpoint(eager=True)
        labels = ck.select("id", "component")
        if obs.get["changed"] == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixed point after {max_iters} "
            "rounds — component labels would be silently split"
        )
    return labels


def dedup_cluster(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Keep one document per near-duplicate CLUSTER (transitive closure
    of the pair relation): the winner is the min id of its component —
    deterministic, matching `dedup_exact`'s winner rule. Rows never in
    any pair keep themselves (anti-join, no shuffle of their content)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash

def simhash_udf(num_bits: int = 64):
    """Vectorized SimHash: per Arrow batch, token hashes vote per bit.

    Token hash = little-endian uint64 of md5(token)[:8] — stable across
    executors/runs (no Python hash() randomization) AND reproducible in
    SQL engines (DuckDB's ``md5_number_upper``), so the operator has a
    real cross-engine oracle. The per-row numeric work is numpy over the
    whole token block; only the md5 digests are a Python loop (hashlib
    releases the GIL per call)."""

    @F.pandas_udf(T.LongType())
    def _simhash(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.int64)
        weights = np.uint64(1) << np.arange(num_bits, dtype=np.uint64)
        for i, text in enumerate(s):
            if text is None:
                continue
            toks = text.lower().split()
            if not toks:
                continue
            hs = np.frombuffer(
                b"".join(_md5_8(t) for t in toks), dtype="<u8"
            )
            bits = ((hs[:, None] >> np.arange(num_bits, dtype=np.uint64)) & 1)
            # signed arithmetic: uint64 would wrap when ones < half
            votes = bits.sum(axis=0).astype(np.int64) * 2 - len(hs)
            sig = (weights[votes > 0]).sum(dtype=np.uint64)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return _simhash


def _md5_8(s: str) -> bytes:
    import hashlib

    return hashlib.md5(s.encode("utf-8")).digest()[:8]


def token_hash_u64(s: str) -> int:
    """Python twin of the simhash token hash (little-endian md5[:8];
    DuckDB: ``md5_number_upper``) — the test/driver oracle primitive."""
    return int.from_bytes(_md5_8(s), "little")


def with_simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, simhash_udf()(F.col(text_col)))


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole banding on 4×16-bit chunks
    (hamming<=3 over 64 bits => at least one chunk identical), then exact
    hamming check within buckets. Oversized buckets (identical-signature
    boilerplate clusters) are capped — see `minhash_candidates`."""
    sh = with_simhash(df, text_col).select(
        F.col(id_col).alias("_id"), F.col("simhash")
    )
    chunks = sh.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
            for c in range(4)
        ])).alias("_c"),
    ).select("_id", "simhash", "_c.chunk", "_c.key")
    buckets = chunks.groupBy("chunk", "key").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_id").alias("id"), F.col("simhash").alias("sh")))
        ).alias("items")
    ).filter(
        (F.size("items") > 1) & (F.size("items") <= max_bucket_size)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda a, i: F.transform(
                        F.slice(F.col("items"), i + 2, F.size("items")),
                        lambda b: F.struct(
                            a["id"].alias("a"), b["id"].alias("b"),
                            a["sh"].alias("sha"), b["sh"].alias("shb"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b", "p.sha", "p.shb").distinct()
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return pairs.select(
        "a", "b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine LSH)

def seeded_planes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes — shared by the Spark exprs and
    any SQL oracle (the literals are the contract)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def hyperplane_bits(emb: Column, planes: np.ndarray) -> list[Column]:
    """Sign bit (0/1) per hyperplane, as pure Column expressions: the
    planes are literals, each dot is one zip_with/aggregate fold —
    scan-side, no UDF, no shuffle."""
    bits = []
    for p in planes:
        lit_vec = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(emb, lit_vec, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    return bits


def hyperplane_bucket(
    emb: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Full sign-bucket id (all planes concatenated)."""
    bucket = F.lit(0)
    for b in hyperplane_bits(emb, seeded_planes(n_planes, dim, seed)):
        bucket = bucket * 2 + b
    return bucket


def plane_chunks(n_planes: int, n_chunks: int = 3) -> list[list[int]]:
    """Split plane indices into n_chunks contiguous bands (multi-probe
    pigeonhole: two buckets within hamming <= n_chunks - 1 of each other
    share at least one band)."""
    base, rem = divmod(n_planes, n_chunks)
    out, start = [], 0
    for c in range(n_chunks):
        size = base + (1 if c < rem else 0)
        out.append(list(range(start, start + size)))
        start += size
    return out


def _hyperplane_band_keys_pandas(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    planes: np.ndarray,
    chunks: list[list[int]],
) -> DataFrame:
    """Banded sign-bucket keys as ONE Arrow/numpy pass (mapInPandas),
    replacing n_planes interpreted zip_with/aggregate folds per row
    (HOF exprs never codegen — the per-ROW twin of CLAUDE.md's per-PAIR
    trap). Each plane's dot accumulates as a sequential left fold over
    DIMENSIONS, vectorized across rows x planes — one rounded multiply
    + one rounded add per step, the exact rounding sequence of the
    expression fold, so band keys are bit-identical for valid vectors.
    Invalid vectors (NULL, ragged length, NULL element) take key 0 in
    every band, matching the expr's NULL-propagating fold under
    `when(dot >= 0, 1).otherwise(0)`; a NaN dot reached from inf
    arithmetic takes bit 1 (Spark orders NaN above every number). A
    literal-NaN ELEMENT is indistinguishable from a NULL element after
    Arrow and yields key 0 where the expr would emit all-ones bits —
    the documented assign_buckets_pandas divergence, unreachable on a
    real embedding corpus. The band explode rides the same pass: one
    (id, emb, band, key) row per band comes straight out of Arrow."""
    planes = np.asarray(planes, dtype=np.float64)
    n_planes, dim = planes.shape
    n_chunks = len(chunks)
    schema = T.StructType([
        T.StructField("_id", df.schema[id_col].dataType),
        T.StructField("_e", df.schema[emb_col].dataType),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("key", T.IntegerType(), False),
    ])

    def go(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            embs = list(pdf[emb_col])
            vecs = [
                None if v is None else np.asarray(v, dtype=np.float64)
                for v in embs
            ]
            valid = [
                i for i, v in enumerate(vecs)
                if v is not None and len(v) == dim
                and not np.isnan(v).any()
            ]
            keys = np.zeros((n, n_chunks), dtype=np.int32)
            if valid:
                e = np.asarray([vecs[i] for i in valid])
                dots = np.zeros((len(valid), n_planes), dtype=np.float64)
                for d in range(dim):
                    dots += e[:, d][:, None] * planes[:, d][None, :]
                bits = ((dots >= 0) | np.isnan(dots)).astype(np.int32)
                for c, idxs in enumerate(chunks):
                    k = np.zeros(len(valid), dtype=np.int32)
                    for i in idxs:
                        k = k * 2 + bits[:, i]
                    keys[valid, c] = k
            yield pd.DataFrame({
                "_id": np.repeat(pdf[id_col].to_numpy(), n_chunks),
                "_e": [v for v in embs for _ in range(n_chunks)],
                "band": np.tile(np.arange(n_chunks, dtype=np.int32), n),
                "key": keys.reshape(-1),
            })

    return df.select(id_col, emb_col).mapInPandas(go, schema)


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_candidate_pairs(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    *,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    n_chunks: int = 3,
    max_bucket_size: int = 4096,
    strategy: str = "pandas",
) -> DataFrame:
    """Candidate embedding pairs (a, b, cos) via banded hyperplane LSH.

    Multi-probe by pigeonhole banding: the n_planes sign bits split into
    n_chunks bands; a pair is a candidate iff SOME band matches — i.e.
    every pair whose full buckets differ in fewer than n_chunks bits is
    guaranteed found (single-probe bucketing misses any pair straddling
    ONE hyperplane; banding trades more candidates for that recall).

    Two scoring strategies with BIT-IDENTICAL cos values (the same
    sequential-fold rounding sequence — the knn_join_ivf precedent):

    * ``pandas`` (default, the scale path) — embeddings ride the band
      explode once, buckets score ALL their pairs in one Arrow/numpy
      pass per (band, key) group (`_seq` folds over dimensions,
      vectorized across the pair matrix), and the oversized-bucket cap
      is a per-group length check — no per-pair join ever materializes
      vectors. The band keys themselves come from the same Arrow
      family (`_hyperplane_band_keys_pandas`): n_planes interpreted
      zip_with/aggregate folds per row became one numpy pass with the
      identical fold rounding sequence (r7). r6's expr path joined the 66.7M-candidate pair list back
      to the embeddings (TWO shuffles of vectors keyed by pair id) and
      scored each pair with an INTERPRETED HOF fold (~10 us/pair; see
      CLAUDE.md) — that join + fold dominated the 100k-vector bench.
    * ``expr`` — the r6 shape (skinny pair self-join, embeddings
      re-attached, JVM Column fold). Kept because it is the
      oracle-shaped plan and the right form when vectors are huge
      relative to the candidate count.

    Degenerate buckets (near-constant embedding clusters) are capped in
    both strategies — they are exact-dup clusters in disguise.
    """
    if strategy == "pandas":
        with_keys = _hyperplane_band_keys_pandas(
            df, id_col, emb_col,
            seeded_planes(n_planes, dim, seed),
            plane_chunks(n_planes, n_chunks),
        )
        scored = with_keys.groupBy("band", "key").applyInPandas(
            _score_bucket_pairs_fn(max_bucket_size),
            T.StructType([
                T.StructField("a", df.schema[id_col].dataType),
                T.StructField("b", df.schema[id_col].dataType),
                T.StructField("cos", T.DoubleType()),
            ]),
        )
        return scored.distinct()
    if strategy != "expr":
        raise ValueError(f"unknown strategy `{strategy}`")

    bits = hyperplane_bits(F.col(emb_col), seeded_planes(n_planes, dim, seed))
    chunk_keys = []
    for c, idxs in enumerate(plane_chunks(n_planes, n_chunks)):
        key = F.lit(0)
        for i in idxs:
            key = key * 2 + bits[i]
        chunk_keys.append(
            F.struct(F.lit(c).alias("band"), key.alias("key"))
        )

    skinny = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array(*chunk_keys)).alias("_bk"),
    ).select("_id", "_bk.band", "_bk.key")

    sizes = skinny.groupBy("band", "key").agg(F.count(F.lit(1)).alias("_n"))
    bounded = skinny.join(
        sizes.filter(F.col("_n") <= max_bucket_size), ["band", "key"]
    )
    a = bounded.select("band", "key", F.col("_id").alias("a"))
    b = bounded.select("band", "key", F.col("_id").alias("b"))
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

    # norms hoisted to the per-VECTOR projection: computing them inside
    # the per-pair cosine would evaluate two squared-sum folds per
    # candidate pair (~2/3 of the verify cost at high cand_frac) instead
    # of once per vector; the arithmetic is unchanged (dot / (na * nb))
    # so results are bit-identical
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(emb_col), lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    emb = df.select(
        F.col(id_col).alias("_eid"), F.col(emb_col).alias("_e"),
        norm.alias("_n"),
    )
    ea = emb.select(F.col("_eid").alias("a"), F.col("_e").alias("_ea"),
                    F.col("_n").alias("_na"))
    eb = emb.select(F.col("_eid").alias("b"), F.col("_e").alias("_eb"),
                    F.col("_n").alias("_nb"))
    dot = F.aggregate(
        F.zip_with(F.col("_ea"), F.col("_eb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0),
        dot / (F.col("_na") * F.col("_nb")),
    ).otherwise(F.lit(0.0))
    return (
        pairs.join(ea, "a")
        .join(eb, "b")
        .select("a", "b", cos.alias("cos"))
    )


def _fold_cos_pair(va, vb):
    """Scalar twin of the expr-path cosine for one pair, reproducing the
    JVM fold's NULL semantics exactly: a NULL/None-element vector has a
    NULL norm (cos -> 0.0 via the otherwise branch), a zero norm yields
    0.0, and a LENGTH-MISMATCHED pair with valid norms yields NULL
    (zip_with pads with null, the fold goes sticky-null). Python float
    arithmetic is the same IEEE double sequence as the fold."""
    def norm2(v):
        if v is None:
            return None
        acc = 0.0
        for x in v:
            if x is None:
                return None
            acc = acc + x * x
        return acc

    na2, nb2 = norm2(va), norm2(vb)
    if na2 is None or nb2 is None:
        return 0.0
    na, nb = math.sqrt(na2), math.sqrt(nb2)
    if not (na > 0 and nb > 0):
        return 0.0
    if len(va) != len(vb):
        return None  # padded null poisons the dot fold
    acc = 0.0
    for x, y in zip(va, vb):
        acc = acc + x * y
    return acc / (na * nb)


def _score_bucket_pairs_fn(max_bucket_size: int):
    """applyInPandas scorer for one LSH bucket: all pairs (a < b) with
    the sequential-fold cosine (bit-identical to the expr strategy).
    Groups over the cap emit nothing (the degenerate-bucket guard)."""

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2 or n > max_bucket_size:
            return pd.DataFrame({"a": [], "b": [], "cos": []})
        pdf = pdf.sort_values("_id", kind="mergesort", ignore_index=True)
        ids = pdf["_id"].to_numpy()
        vecs = list(pdf["_e"])
        uniform = all(
            v is not None and len(v) == len(vecs[0])
            and not any(x is None for x in v)
            for v in vecs
        )
        ii, jj = np.triu_indices(n, k=1)
        keep = ids[ii] != ids[jj]  # a < b is STRICT in the expr path
        ii, jj = ii[keep], jj[keep]
        if uniform and len(vecs[0]) > 0:
            e = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs]
            )
            # sequential left folds over dimensions (vectorized across
            # the pair matrix): one rounded multiply + one rounded add
            # per step, the exact expr/DuckDB rounding sequence
            dot = np.zeros((n, n), dtype=np.float64)
            n2 = np.zeros(n, dtype=np.float64)
            for d in range(e.shape[1]):
                col = e[:, d]
                dot += col[:, None] * col[None, :]
                n2 += col * col
            en = np.sqrt(n2)
            denom = en[:, None] * en[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cosm = dot / denom
            valid = (en[:, None] > 0) & (en[None, :] > 0)
            cosm = np.where(valid, cosm, 0.0)
            cos_vals = cosm[ii, jj]
        else:
            cos_vals = [
                _fold_cos_pair(vecs[i], vecs[j]) for i, j in zip(ii, jj)
            ]
        return pd.DataFrame({"a": ids[ii], "b": ids[jj], "cos": cos_vals})

    return score


def suggest_minhash_config(
    threshold: float,
    *,
    target_recall: float = 0.9,
    background_jaccard: float = 0.05,
    max_cand_frac: float = 0.01,
) -> dict:
    """Pick (num_hashes, bands) for MinHash-LSH banding from the Jaccard
    threshold — the twin of `suggest_lsh_config` for the shingle family.

    Model: a pair at Jaccard j collides in one band of r rows with j^r;
    with b bands P(candidate) = 1 - (1 - j^r)^b. Unlike hyperplane LSH
    (random pairs collide per bit at exactly 1/2), the background
    collision rate depends on the corpus's typical non-dup Jaccard —
    `background_jaccard` (default 0.05, a web-corpus-ish shingle
    overlap) stands in for it when estimating the candidate fraction.
    The search returns the config with the fewest hashes whose recall at
    `threshold` meets `target_recall` while background pairs stay under
    `max_cand_frac`; infeasible thresholds relax the cap by doubling
    (the returned `expected_cand_frac` is honest about it).
    """
    cap = max_cand_frac
    while True:
        best = None
        for r in range(1, 17):
            bg = background_jaccard ** r
            for b in range(1, 65):
                if min(1.0, b * bg) > cap:
                    continue
                recall = 1.0 - (1.0 - threshold ** r) ** b
                if recall < target_recall:
                    continue
                key = (r * b, b * bg)
                if best is None or key < best[0]:
                    best = (key, r, b, recall, min(1.0, b * bg))
        if best is not None:
            break
        cap *= 2.0
        if cap > 2.0:
            r, b = 1, 64
            best = ((64, 1.0), r, b,
                    1.0 - (1.0 - threshold) ** b,
                    min(1.0, 64 * background_jaccard))
            break
    _, r, b, recall, cand = best
    return {
        "num_hashes": r * b,
        "bands": b,
        "rows_per_band": r,
        "expected_recall": recall,
        "expected_cand_frac": cand,
    }


def suggest_lsh_config(
    threshold: float,
    *,
    n: int | None = None,
    target_recall: float = 0.9,
    max_cand_frac: float = 0.01,
) -> dict:
    """Pick (n_planes, n_chunks) for banded hyperplane LSH from the
    similarity threshold — the guard that stops anyone running a
    gate/test config (e.g. 8 planes / 4 chunks, which admits ~68% of all
    pairs) against a real corpus.

    Model (standard SimHash/hyperplane analysis): two vectors at cosine
    s agree on one sign bit with p = 1 - arccos(s)/pi; with r bits per
    band and b bands, P(candidate) = 1 - (1 - p^r)^b. Random pairs
    (s ~ 0, p = 1/2) collide with ~b * 2^-r — the expected candidate
    FRACTION of all n^2/2 pairs. The search takes the cheapest (fewest
    planes = fewest dot products per row) config whose recall at
    `threshold` meets `target_recall` while the random-pair candidate
    fraction stays under `max_cand_frac`; if no config can (low
    thresholds are inherently hard for hyperplane LSH), the constraint
    relaxes by doubling and the returned `expected_cand_frac` says so.

    Returns {n_planes, n_chunks, bits_per_band, expected_recall,
    expected_cand_frac, expected_cand_pairs (when n given)} — feed the
    first two straight into `embedding_near_duplicates` /
    `embedding_candidate_pairs`.
    """
    p_t = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    cap = max_cand_frac
    while True:
        best = None
        for r in range(2, 33):
            rand = 0.5 ** r
            for b in range(1, 17):
                if b * rand > cap:
                    continue
                recall = 1.0 - (1.0 - p_t ** r) ** b
                if recall < target_recall:
                    continue
                key = (r * b, b * rand)  # fewest planes, then sparsest
                if best is None or key < best[0]:
                    best = (key, r, b, recall, b * rand)
        if best is not None:
            break
        cap *= 2.0
        if cap > 2.0:  # give up: even cand_frac ~ 1 can't hit recall
            r, b = 2, 16
            best = ((32, 4.0), r, b,
                    1.0 - (1.0 - p_t ** r) ** b, min(1.0, b * 0.5 ** r))
            break
    _, r, b, recall, cand = best
    out = {
        "n_planes": r * b,
        "n_chunks": b,
        "bits_per_band": r,
        "expected_recall": recall,
        "expected_cand_frac": min(1.0, cand),
    }
    if n is not None:
        out["expected_cand_pairs"] = int(min(1.0, cand) * n * (n - 1) / 2)
    return out


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    *,
    dim: int,
    threshold: float = 0.95,
    n_planes: int | None = None,
    seed: int = 42,
    n_chunks: int | None = None,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """Near-dup embedding pairs (a, b, cos >= threshold): banded
    hyperplane LSH candidates + exact cosine. Brute-force all-pairs in
    queries.py is the exact baseline this approximates.

    With n_planes/n_chunks unset, the config comes from
    `suggest_lsh_config(threshold)` — sized for recall ~0.9 at the
    threshold with a bounded random-pair candidate fraction. Explicit
    small configs (the correctness gate uses 8 planes so its DuckDB
    oracle stays enumerable) are GATE-ONLY: 8 planes / 4 chunks admits
    ~68% of all pairs at threshold 0.4 and must not run at corpus
    scale."""
    if n_planes is None:
        cfg = suggest_lsh_config(threshold)
        n_planes, n_chunks = cfg["n_planes"], cfg["n_chunks"]
    elif n_chunks is None:
        n_chunks = 3
    return embedding_candidate_pairs(
        df, id_col, emb_col, dim=dim, n_planes=n_planes, seed=seed,
        n_chunks=n_chunks, max_bucket_size=max_bucket_size,
    ).filter(F.col("cos") >= threshold)
