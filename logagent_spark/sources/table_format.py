"""TableFormat seam (SURVEY.md §7): Iceberg when a runtime is on the
classpath, parquet directory layout otherwise.

The engine's sink layout (hive-style `sink=<name>/` partitions + the
checkpoint runner's JSON manifests) is deliberately Iceberg-shaped:
partition spec on the routing column, per-commit file manifests with
row counts. When `iceberg-spark-runtime` is available (detected via the
catalog implementation class), the same calls route to real Iceberg
tables and the manifests become Iceberg snapshots — no pipeline changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    target: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """target: an `catalog.db.table` identifier (Iceberg path) or a
    filesystem path (parquet path)."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        w = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if "/" not in target and iceberg_available(spark):
        return spark.read.table(target)
    return spark.read.parquet(target)
