"""JDBC database-sink seam.

The reference's `database` handler connects by URI scheme
(postgresql/mysql/sqlite — /root/reference/agent/task/handler.go:70-91),
optionally issues CREATE TABLE from the `Fields` DDL strings, and
inserts per row with LOWERCASED quoted identifiers
(/root/reference/agent/task/database.go:31-104). The Spark-native sink
is `DataFrameWriter.jdbc`: one distributed write, per-partition batched
inserts — the semantics the reference approximates with its 10-conn
pool, minus the per-row round-trip.

This environment ships no JDBC driver jars or DB servers, so the write
itself stays behind this seam: URI translation, identifier mapping, and
SQL generation are pure functions (unit-tested); `write_jdbc` wires them
to `format("jdbc")` and is exercised the first time a driver jar is on
the executor classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scheme (reference URI) -> (jdbc subprotocol, driver class)
_DRIVERS = {
    "postgresql": ("postgresql", "org.postgresql.Driver"),
    "postgres": ("postgresql", "org.postgresql.Driver"),
    "mysql": ("mysql", "com.mysql.cj.jdbc.Driver"),
    "sqlite": ("sqlite", "org.sqlite.JDBC"),
    "sqlite3": ("sqlite", "org.sqlite.JDBC"),
}


def parse_db_uri(uri: str) -> tuple[str, str, str]:
    """Reference URI -> (scheme, jdbc_url, driver_class).

    Mirrors handler.go:70-75 (scheme = SplitN(uri, ":", 2)[0]; bad URI is
    fatal). The Go mysql driver needs its host wrapped in `tcp(...)`
    (handler.go:84-90); JDBC URLs keep the plain `host:port/db` form, so
    only the subprotocol prefix changes here.
    """
    parts = uri.split(":", 1)
    if len(parts) < 2:
        raise ValueError("bad database URI")
    scheme, rest = parts[0], parts[1]
    if scheme not in _DRIVERS:
        raise ValueError(f"unsupported database scheme `{scheme}`")
    sub, driver = _DRIVERS[scheme]
    return scheme, f"jdbc:{sub}:{rest}", driver


def insert_sql(scheme: str, table: str, columns: list[str]) -> str:
    """The reference's prepared INSERT, verbatim semantics
    (database.go:48-88): identifiers lowercased; postgres quotes with
    `"` and numbers placeholders $1..$n, everything else backticks + `?`.
    Kept for parity checks — Spark's JDBC writer generates its own
    batched INSERTs."""
    low = [c.lower() for c in columns]
    if scheme in ("postgres", "postgresql"):
        idents = ",".join(f'"{c}"' for c in low)
        marks = ",".join(f"${i}" for i in range(1, len(low) + 1))
    else:
        idents = ",".join(f"`{c}`" for c in low)
        marks = ",".join("?" * len(low))
    return f"INSERT INTO {table}({idents})values({marks})"


def sink_frame(df: DataFrame, columns: list[str]) -> DataFrame:
    """Project the handler's configured columns, lowercased; a column
    missing from the frame inserts NULL (database.go:96-104)."""
    present = set(df.columns)
    return df.select(*[
        (F.col(c) if c in present else F.lit(None)).alias(c.lower())
        for c in columns
    ])


def write_jdbc(
    df: DataFrame,
    uri: str,
    table: str,
    columns: list[str],
    *,
    mode: str = "append",
    batchsize: int = 10_000,
) -> None:
    """Distributed JDBC write of the handler's column projection.

    Partition count bounds the DB connection fan-in (the reference caps
    at 10 conns, database.go:26-27) — coalesce upstream if the target
    can't take one connection per task."""
    _, url, driver = parse_db_uri(uri)
    (
        sink_frame(df, columns)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table.lower())
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )
