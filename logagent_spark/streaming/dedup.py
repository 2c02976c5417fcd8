"""Streaming exact deduplication — first-arrival-wins across
micro-batches, the incremental twin of ``operators/dedup.dedup_exact``.

A training-data ingest that tails a crawl feed cannot re-scan the corpus
per batch; it needs "have I ever admitted this content before?" as
engine state. ``applyInPandasWithState`` keyed by the normalized content
hash holds ONE boolean per distinct content (state volume is
O(distinct contents), 16 hash bytes + flag — no rows, no text), so:

  * the first row of a hash in stream order is admitted;
  * every later row of that hash — same batch or any later batch — is
    flagged a duplicate (kept + flagged, not dropped, so drop accounting
    rides the usual counters);
  * within one micro-batch the winner is deterministic: rows are sorted
    by `order_cols` (default the id column) before the scan, matching
    dedup_exact's min-id winner when ids arrive in one batch.

Unbounded mode is the default: dedup state is NOT watermark-evictable
because a duplicate may arrive arbitrarily late, so state grows with
distinct corpus content by design — at 10^12 documents that is ~16 TB
of hash state across the cluster, the honest cost of exact streaming
dedup. Two BOUNDED modes cap it when business rules allow:

  * hash-space sharding (``n_shards`` + ``shard``): the state key
    becomes (shard, content_hash) with shard = crc32(hash) % n_shards,
    and a job given ``shard`` processes only its slice — n_shards jobs
    over disjoint slices each hold 1/n of the state and their admitted
    sets union to exactly the unsharded answer (shard is a pure
    function of the hash, so no content spans jobs);
  * event-time TTL (``ttl_s`` + ``ts_col``): GroupStateTimeout.
    EventTimeTimeout evicts a content's state once the watermark passes
    its LAST sighting + ttl_s. Inside the horizon parity with the
    unbounded mode is exact; a duplicate arriving after eviction is
    re-admitted (``is_dup`` False again) — the documented forgetting
    semantics, bounding state to O(distinct contents per TTL window).

Batch oracle: running ``dedup_exact`` (min-id winners) over the union of
all batches equals the streaming admitted set whenever ids are assigned
in arrival order — pytest pins this equivalence across triggers, and
pins eviction + inside-horizon parity for the TTL mode.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logagent_spark.operators.dedup import content_hash

__all__ = ["streaming_dedup_exact"]

_STATE_SCHEMA = T.StructType([
    T.StructField("seen", T.BooleanType()),
    # last sighting (event-time ms) — the TTL horizon anchor; null in
    # unbounded mode
    T.StructField("last_ms", T.LongType()),
])


def streaming_dedup_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    normalize: bool = True,
    payload_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    n_shards: int | None = None,
    shard: int | None = None,
    ttl_s: float | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Streaming DataFrame -> same rows + `content_hash` + `is_dup`
    (False exactly once per distinct content, on its first arrival).
    Filter on ``~is_dup`` for the admitted stream.

    ``n_shards``/``shard`` and ``ttl_s``/``ts_col`` select the bounded
    modes (see module docstring; they compose). The TTL mode requires
    the input stream to carry a watermark on ``ts_col`` — eviction is
    driven by watermark progress, exactly like windowed-aggregation
    state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if (ttl_s is None) != (ts_col is None):
        raise ValueError(
            "ttl_s and ts_col must be passed together: event-time TTL "
            "needs the event-time column, and the column alone does "
            "nothing"
        )
    if shard is not None and n_shards is None:
        raise ValueError("shard requires n_shards")

    cols = [id_col, text_col, *(payload_cols or [])]
    if ts_col is not None and ts_col not in cols:
        cols.append(ts_col)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in cols]
        + [T.StructField("content_hash", T.StringType(), False),
           T.StructField("is_dup", T.BooleanType(), False)]
    )
    sort_cols = order_cols or [id_col]

    hashed = df.select(
        *cols, content_hash(F.col(text_col), normalize).alias("content_hash")
    )

    group_keys = ["content_hash"]
    if n_shards is not None:
        hashed = hashed.withColumn(
            "_shard",
            (F.crc32(F.col("content_hash").cast("binary"))
             % F.lit(n_shards)).cast("int"),
        )
        group_keys = ["_shard", "content_hash"]
        if shard is not None:
            hashed = hashed.filter(F.col("_shard") == shard)

    ttl_ms = int(ttl_s * 1000) if ttl_s is not None else None
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    out_names = [f.name for f in out_schema.fields if f.name != "is_dup"]

    def func(key, pdf_iter, state):
        if state.hasTimedOut:
            # watermark passed last sighting + ttl: forget this content
            state.remove()
            return
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(sort_cols, kind="stable", ignore_index=True)
        prev_last = state.get[1] if state.exists else None
        seen = state.exists and state.get[0]
        if seen and ttl_ms is not None:
            # in-band horizon check: hasTimedOut only fires for keys
            # WITHOUT data in the expiring batch, so a re-arrival in
            # that same batch would still see stale state — consult the
            # horizon directly against the current watermark
            if prev_last is not None and state.getCurrentWatermarkMs() > prev_last + ttl_ms:
                seen = False
        is_dup = [True] * len(pdf)
        if not seen and len(pdf):
            is_dup[0] = False  # first arrival of this content wins
        if ttl_ms is not None:
            # horizon runs from the LAST sighting; a timeout timestamp
            # at or below the current watermark is rejected by the
            # engine, so clamp just above it. The anchor is MONOTONE:
            # a late-but-valid duplicate (ts above watermark but below
            # the stored last sighting) must not move last_ms backward
            # and shrink the documented "last sighting + ttl" horizon
            batch_max = int(pdf[ts_col].max().value // 1_000_000)
            last_ms = batch_max if prev_last is None else max(prev_last, batch_max)
            state.update((True, last_ms))
            state.setTimeoutTimestamp(
                max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.update((True, None))
        out = pdf[out_names].copy()
        out["is_dup"] = is_dup
        yield out

    return (
        hashed.groupBy(*group_keys)
        .applyInPandasWithState(
            func, out_schema, _STATE_SCHEMA, "append", timeout,
        )
    )
