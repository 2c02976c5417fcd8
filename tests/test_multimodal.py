"""Multimodal plumbing: binary columns, metadata exprs, mapInPandas
feature extraction (fake decode), frame-sample plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from logagent_spark.operators import multimodal as mm

ROWS = [
    (0, b"\x89PNG\r\n\x1a\n" + b"x" * 100),
    (1, b"\xff\xd8\xff\xe0" + b"y" * 5000),
    (2, b"GIF89a" + b"z" * 10),
    (3, b"<html><body>hi</body></html>"),
    (4, b"RIFF....WAVE"),
    (5, b"completely unknown bytes"),
    (6, None),
]


@pytest.fixture(scope="module")
def bin_df(spark):
    return spark.createDataFrame(ROWS, "id long, payload binary")


def test_media_meta(bin_df):
    got = {r["id"]: r for r in mm.with_media_meta(bin_df).collect()}
    assert got[0]["media_format"] == "png"
    assert got[1]["media_format"] == "jpeg"
    assert got[2]["media_format"] == "gif"
    assert got[3]["media_format"] == "html"
    assert got[4]["media_format"] == "riff"
    assert got[5]["media_format"] == "unknown"
    assert got[6]["media_format"] is None or got[6]["media_bytes"] is None
    for i, payload in ROWS:
        if payload is not None:
            assert got[i]["media_bytes"] == len(payload)
            assert got[i]["media_digest"] == hashlib.md5(payload).hexdigest()


def test_fake_image_features_deterministic(bin_df):
    a = {r["id"]: (r["width"], r["height"], r["mean_luma"])
         for r in mm.extract_image_features(bin_df, fake=True).collect()}
    b = {r["id"]: (r["width"], r["height"], r["mean_luma"])
         for r in mm.extract_image_features(bin_df, fake=True).collect()}
    assert a == b
    assert a[0][0] >= 64 and a[0][1] >= 64
    assert a[6] == (None, None, None)


def test_real_decode_raises(bin_df):
    with pytest.raises(Exception) as exc:
        mm.extract_image_features(bin_df, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_frame_sample_plan(bin_df):
    plan = mm.frame_sample_plan(bin_df, every_n_bytes=1000, max_frames=4)
    got = plan.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("byte_offset").alias("max_off"),
    ).collect()
    by_id = {r["id"]: r for r in got}
    assert by_id[1]["n"] == 4           # 5000 bytes capped at 4 frames
    assert by_id[1]["max_off"] == 3000
    assert by_id[0]["n"] == 1           # small payload -> 1 frame
    assert 6 not in by_id or by_id[6]["n"] <= 1


def test_fake_embedding_plus_ann(spark):
    from logagent_spark.operators import similarity as sim

    docs = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    emb = mm.embed_text_fake(docs, "text", dim=16)
    q_row = emb.filter(F.col("doc_id") == 5).select("embedding").collect()[0]
    top = sim.brute_force_topk(emb, "embedding", q_row["embedding"], k=3,
                               id_col="doc_id").collect()
    assert top[0]["doc_id"] == 5 and abs(top[0]["cos"] - 1.0) < 1e-6
