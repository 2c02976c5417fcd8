"""Bucketed tables — shuffle-free co-located joins for the hot join keys.

At 100 TB the orders⋈lineitem-shaped join is the recurring cost: both
sides shuffle on the key EVERY run. Bucketing pays that shuffle once at
ingest (`bucketBy(n, key)` + `sortBy`): subsequent equi-joins between
tables bucketed on the same key with the same bucket count compile to a
SortMergeJoin with NO Exchange on either side (and no sort, when
sortBy matched). The multiplex sink layout stays hive-partitioned by
`sink`; bucketing is for the FACT tables the routed output joins
against.

Bucket-count sizing: buckets are the unit of join parallelism AND the
file count per partition — target 100-500 MB per bucket file at the
production scale, and keep the count identical across co-joined tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str | list[str],
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (+ sorted) catalog table. `path` makes it
    an external table (parquet files under path, bucket metadata in the
    catalog — the catalog entry is what lets the planner elide the
    Exchange)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-count bucketed tables: with bucketing
    enabled (default) the plan carries the bucket spec as the output
    partitioning, so no Exchange is inserted."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
