"""TableFormat seam: parquet fallback path (no Iceberg jar in this env)."""

from logagent_spark.sources.table_format import (
    iceberg_available,
    read_table,
    write_table,
)


def test_parquet_fallback_roundtrip(spark, tmp_path):
    assert iceberg_available(spark) is False  # env has no Iceberg runtime
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "k string, v long"
    )
    target = str(tmp_path / "tbl")
    write_table(df, target, partition_by=["k"])
    got = read_table(spark, target)
    assert got.count() == 3
    assert sorted(got.columns) == ["k", "v"]


def test_partition_predicate_prunes_at_scan(spark, tmp_path):
    """The property the Iceberg seam exists to preserve (VERDICT r4 #6):
    a predicate on the partition column must become a scan-level
    PartitionFilter (directory pruning — at 100 TB the difference
    between listing one partition and scanning the table), not a
    post-scan Filter; a data-column predicate must be a PushedFilter."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("k"), F.col("id").alias("v")
    )
    target = str(tmp_path / "tbl")
    write_table(df, target, partition_by=["k"])

    q = read_table(spark, target).filter((F.col("k") == "1") & (F.col("v") > 10))
    plan = q._jdf.queryExecution().executedPlan().toString()

    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, plan
    pf = scan_lines[0].split("PartitionFilters:")[1].split("]")[0]
    assert "(k" in pf, plan                       # partition predicate AT the scan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "GreaterThan(v" in pushed, plan        # data predicate pushed to parquet

    # behavioral proof: only the k=1 directory's files are read
    # (inputFiles() lists pre-pruning; the scan's numFiles metric is
    # the post-pruning truth)
    q.collect()
    leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
    scan = leaves.apply(0)
    read_files = scan.metrics().apply("numFiles").value()
    total_files = len([
        f for f in q.inputFiles()  # all partitions' files
    ])
    assert 0 < read_files < total_files, (read_files, total_files)
