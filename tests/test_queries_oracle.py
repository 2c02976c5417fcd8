"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "item"):  # numpy scalars from duckdb
        return _norm(v.item())
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


QUERY_NAMES = sorted(entry_mod.queries())
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in ORACLES:
        # rows-only contract: must run and return a stable schema
        assert scols, name
        assert all(len(r) == len(scols) for r in srows)
        return
    res = ddb.sql(ORACLES[name])
    drows = res.fetchall()
    dcols = [c for c in res.columns]
    assert sorted(scols) == sorted(dcols), (name, scols, dcols)
    assert len(srows) == len(drows), (name, len(srows), len(drows))
    a = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    b = _rows_to_set(dcols, [list(r) for r in drows])
    # dict lookup per column index for duckdb ordering
    bcols_sorted = sorted(dcols)
    _ = bcols_sorted
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert a == b, (name, mism[:3], a[mism[0]] if mism else None,
                    b[mism[0]] if mism else None)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
