from __future__ import annotations

import pytest

from logagent_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("logagent_spark_tests", parallelism=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_rows():
    """Deterministic F1 fixture rows (small golden set) as python dicts."""
    from logagent_spark.datagen import gen_pages

    pdf = gen_pages(400, seed=7, n_hosts=50)
    rows = pdf.to_dict("records")
    for r in rows:
        r["warc_ts"] = r["warc_ts"].to_pydatetime()
    return rows


@pytest.fixture(scope="session")
def pages_sdf(spark, pages_rows):
    from logagent_spark.datagen import pages_df

    return pages_df(spark, 400, seed=7, n_hosts=50)
