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
