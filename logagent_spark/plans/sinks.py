"""Sink-side extras: the reference's `database` handler table DDL and
catalog registration (handler.go:50-132, database.go:17-104).

The reference optionally issues `CREATE TABLE IF NOT EXISTS t (fields)`
from the handler's `Fields` DDL strings (database.go:31-45) and then
per-row prepared INSERTs with lowercased quoted identifiers
(database.go:66-69, 81-84). The Spark-native equivalent: the multiplex
writer lands per-sink parquet partitions; this module gives those
partitions a catalog identity so `spark.sql("SELECT ... FROM t")` works —
the DDL surface users of the reference expect.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from logagent_spark.config import HandlerSpec


def create_table_sql(h: HandlerSpec, location: str) -> str:
    """CREATE TABLE IF NOT EXISTS from the handler's Fields DDL strings
    (each entry is one column definition, e.g. "src_ip varchar(64)").
    Identifiers are lowercased like the reference's quoted inserts."""
    if h.fields:
        cols = ", ".join(f.lower() for f in h.fields)
    elif h.columns:
        cols = ", ".join(f"{c.lower()} string" for c in h.columns)
    else:
        raise ValueError("database handler needs Fields or Columns for DDL")
    table = (h.table or h.name).lower()
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) "
        f"USING parquet LOCATION '{location}'"
    )


def register_sink_table(
    spark: SparkSession, h: HandlerSpec, location: str
) -> str:
    """Issue the DDL; returns the table name. Mirrors the reference's
    createTable-on-connect (database.go:27-46) at plan time."""
    sql = create_table_sql(h, location)
    spark.sql(sql)
    return (h.table or h.name).lower()
