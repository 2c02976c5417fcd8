"""JDBC seam: URI translation, reference INSERT parity, NULL-fill
projection. (No driver jar / DB server in this env — the write itself is
behind `write_jdbc` and exercised when a jar is present.)"""

from __future__ import annotations

import pytest

from logagent_spark.plans import jdbc


def test_parse_db_uri_schemes():
    s, url, drv = jdbc.parse_db_uri("postgresql://u:p@h:5432/db")
    assert (s, url, drv) == (
        "postgresql", "jdbc:postgresql://u:p@h:5432/db",
        "org.postgresql.Driver",
    )
    s, url, drv = jdbc.parse_db_uri("mysql://u:p@h:3306/db")
    assert url == "jdbc:mysql://u:p@h:3306/db"
    assert drv == "com.mysql.cj.jdbc.Driver"
    s, url, drv = jdbc.parse_db_uri("sqlite:/var/lib/x.db")
    assert url == "jdbc:sqlite:/var/lib/x.db"


def test_parse_db_uri_rejects_bad():
    # handler.go:71-73: no scheme separator is fatal
    with pytest.raises(ValueError):
        jdbc.parse_db_uri("just-a-path")
    with pytest.raises(ValueError):
        jdbc.parse_db_uri("oracle://h/db")


def test_insert_sql_reference_parity():
    # database.go:48-88: postgres $n + double quotes, default ? + backticks;
    # identifiers lowercased in BOTH dialects
    assert jdbc.insert_sql("postgres", "t", ["Src_IP", "N"]) == (
        'INSERT INTO t("src_ip","n")values($1,$2)'
    )
    assert jdbc.insert_sql("mysql", "t", ["Src_IP", "N"]) == (
        "INSERT INTO t(`src_ip`,`n`)values(?,?)"
    )


def test_sink_frame_null_fill(spark):
    # genSortFunc (database.go:92-104) looks keys up EXACT-CASE and only
    # the SQL identifier lowercases: a wrong-case configured column reads
    # as missing -> NULL, same as a truly absent one
    df = spark.createDataFrame([(1, "a")], "id long, msg string")
    out = jdbc.sink_frame(df, ["msg", "MSG", "missing_col", "id"])
    assert out.columns == ["msg", "msg", "missing_col", "id"]
    row = out.collect()[0]
    assert row[0] == "a" and row[1] is None
    assert row[2] is None and row[3] == 1
