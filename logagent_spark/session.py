"""SparkSession factory tuned for the engine.

Local mode stands in for a multi-executor cluster: the same configs
(AQE, shuffle partition sizing, Arrow) are what we'd set cluster-side;
`parallelism` maps to executor cores at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "logagent_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 4)
    b = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd beats snappy on the write-heavy multiplex sink BOTH ways:
        # measured 6.1s vs 7.5-9.5s on the 4M-row headline write AND
        # 311 MB vs 625 MB on disk (fewer bytes win on storage, and the
        # read-back aggregate scans half the data). Override via extra.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
