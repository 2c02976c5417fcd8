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

Unlike the sessionization/rate-limit state, dedup state is NOT
watermark-evictable: a duplicate may arrive arbitrarily late, so state
grows with distinct corpus content by design. At 10^12 documents that is
~16 TB of hash state across the cluster — the documented cost of exact
streaming dedup; bound it by sharding the hash space across jobs or by
TTL-ing state (GroupStateTimeout) when business rules allow forgetting.

Batch oracle: running ``dedup_exact`` (min-id winners) over the union of
all batches equals the streaming admitted set whenever ids are assigned
in arrival order — pytest pins this equivalence across triggers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logagent_spark.operators.dedup import content_hash

__all__ = ["streaming_dedup_exact"]

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def streaming_dedup_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    normalize: bool = True,
    payload_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming DataFrame -> same rows + `content_hash` + `is_dup`
    (False exactly once per distinct content, on its first arrival).
    Filter on ``~is_dup`` for the admitted stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    cols = [id_col, text_col, *(payload_cols or [])]
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in cols]
        + [T.StructField("content_hash", T.StringType(), False),
           T.StructField("is_dup", T.BooleanType(), False)]
    )
    sort_cols = order_cols or [id_col]

    hashed = df.select(
        *cols, content_hash(F.col(text_col), normalize).alias("content_hash")
    )

    def func(key, pdf_iter, state):
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(sort_cols, kind="stable", ignore_index=True)
        seen = state.exists and state.get[0]
        is_dup = [True] * len(pdf)
        if not seen and len(pdf):
            is_dup[0] = False  # first arrival of this content wins
        state.update((True,))
        out = pdf.copy()
        out["is_dup"] = is_dup
        yield out

    return (
        hashed.groupBy("content_hash")
        .applyInPandasWithState(
            func, out_schema, _STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
