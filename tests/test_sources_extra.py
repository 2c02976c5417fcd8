"""dir collector (whole-file), degradation sampling, database DDL, CLI."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from logagent_spark.config import HandlerSpec
from logagent_spark.plans.sinks import create_table_sql, register_sink_table
from logagent_spark.sources import degradation_sample, read_whole_files


def test_read_whole_files(spark, tmp_path):
    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.log").write_text("file a body\nwith lines")
    (d / "b.log").write_text("file b")
    (d / "skip.txt").write_text("not matched")
    df = read_whole_files(spark, str(d), "*.log")
    rows = {r["message"] for r in df.collect()}
    assert rows == {"file a body\nwith lines", "file b"}
    assert all(r["device_id"] for r in df.collect())


def test_degradation_sample(spark):
    df = spark.range(10_000)
    # below the limit: no shedding
    assert degradation_sample(df, 50.0, 80.0).count() == 10_000
    # above: survive with p = (100-cpu)/100
    n = degradation_sample(df, 90.0, 80.0).count()
    assert 700 <= n <= 1300  # ~10% of 10k, seeded


def test_create_table_sql_from_fields():
    h = HandlerSpec(mode="database", table="Protection",
                    fields=["Src_IP varchar(64)", "Dst_Port int"])
    sql = create_table_sql(h, "/tmp/x")
    assert sql.startswith(
        "CREATE TABLE IF NOT EXISTS protection "
        "(src_ip varchar(64), dst_port int)"
    )


def test_register_sink_table_roundtrip(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    spark.createDataFrame([("a", 1), ("b", 2)], "src_ip string, dst_port int") \
        .write.parquet(loc)
    h = HandlerSpec(mode="database", table="t_reg",
                    fields=["src_ip string", "dst_port int"])
    name = register_sink_table(spark, h, loc)
    got = spark.sql(f"SELECT src_ip, dst_port FROM {name} ORDER BY src_ip")
    assert [tuple(r) for r in got.collect()] == [("a", 1), ("b", 2)]
    spark.sql(f"DROP TABLE {name}")


@pytest.mark.slow
def test_cli_end_to_end(spark, tmp_path):
    from logagent_spark.datagen import WAF_REGEX, write_pages

    inp = str(tmp_path / "pages")
    write_pages(spark, inp, 500, seed=9, n_hosts=10, partitions=4)
    cfg = tmp_path / "job.json"
    cfg.write_text(json.dumps({
        "tasks": [{
            "Parser": {"Mode": "regex", "Regex": WAF_REGEX},
            "Handlers": [
                {"Mode": "stream", "Name": "all", "Template": "${message}"},
            ],
        }],
    }))
    p = subprocess.run(
        [sys.executable, "-m", "logagent_spark", "-f", str(cfg),
         "--input", inp, "--out", str(tmp_path / "out"),
         "--chunks", "2", "--cpus", "4", "--keep", "url,lang"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-1500:]
    summary = json.loads(p.stdout[p.stdout.index("{"):])
    assert summary["task_0"]["rows_in"] == 500
    assert summary["task_0"]["sink_counts"]["all"] == 500
