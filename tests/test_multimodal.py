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


def test_real_decode_png_bmp_through_spark(spark):
    """fake=False REALLY decodes PNG/BMP payloads (codecs.py) through
    the mapInPandas path; codec-needing formats yield NULL rows."""
    import numpy as np

    from logagent_spark.operators import codecs as C

    rng = np.random.default_rng(5)
    png_img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    gray_img = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    bmp_img = rng.integers(0, 256, (3, 9, 3), dtype=np.uint8)
    rows = [
        (0, bytearray(C.encode_png(png_img, filters=[0, 1, 2, 3, 4]))),
        (1, bytearray(C.encode_png(gray_img, filters=4))),
        (2, bytearray(C.encode_bmp(bmp_img))),
        (3, bytearray(b"\xff\xd8\xff\xe0" + b"jpeg-needs-a-codec")),
        # cut into the IDAT chunk itself ([-7] would only drop IEND,
        # which a lenient decoder forgives)
        (4, bytearray(C.encode_png(png_img)[:-20])),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in
           mm.extract_image_features(df, fake=False).collect()}
    for i, img in [(0, png_img), (1, gray_img), (2, bmp_img)]:
        assert got[i]["width"] == img.shape[1]
        assert got[i]["height"] == img.shape[0]
        assert got[i]["n_channels"] == (1 if img.ndim == 2 else img.shape[2])
        assert got[i]["channel_sum"] == int(img.sum(dtype="int64"))
        assert abs(got[i]["mean_luma"] - img.mean()) < 1e-9
    for i in (3, 4, 5):  # codec-needing / corrupt / null -> NULL features
        assert got[i]["width"] is None and got[i]["channel_sum"] is None


def test_real_audio_features_through_spark(spark):
    import numpy as np

    from logagent_spark.operators import codecs as C

    rng = np.random.default_rng(6)
    mono = rng.integers(-32768, 32768, 50, dtype=np.int16)
    stereo = rng.integers(-32768, 32768, (30, 2), dtype=np.int16)
    rows = [
        (0, bytearray(C.encode_wav(mono, 8000))),
        (1, bytearray(C.encode_wav(stereo, 44100))),
        (2, bytearray(b"RIFF....AVI not audio")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in mm.extract_audio_features(df).collect()}
    ch0 = mono.astype("int64")
    neg = ch0 < 0
    assert got[0]["n_samples"] == 50
    assert got[0]["sample_rate"] == 8000
    assert got[0]["sum_sq"] == int((ch0 * ch0).sum())
    assert got[0]["zero_crossings"] == int((neg[1:] != neg[:-1]).sum())
    assert abs(got[0]["duration_s"] - 50 / 8000) < 1e-12
    assert got[1]["n_audio_channels"] == 2
    assert got[2]["n_samples"] is None and got[3]["n_samples"] is None


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


def test_drop_payload_excludes_binary_from_output(spark):
    import numpy as np

    from logagent_spark.operators import codecs as C

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    wav = rng.integers(-32768, 32768, 40, dtype=np.int16)
    df = spark.createDataFrame(
        [(0, bytearray(C.encode_png(img))), (1, bytearray(C.encode_wav(wav, 8000)))],
        "id long, payload binary",
    )
    slim = mm.extract_image_features(df, fake=False, drop_payload=True)
    assert "payload" not in slim.columns
    full = mm.extract_image_features(df, fake=False)
    assert {r["id"]: r["channel_sum"] for r in slim.collect()} == \
           {r["id"]: r["channel_sum"] for r in full.collect()}
    slim_a = mm.extract_audio_features(df, drop_payload=True)
    assert "payload" not in slim_a.columns
    assert {r["id"]: r["sum_sq"] for r in slim_a.collect()} == \
           {r["id"]: r["sum_sq"] for r in mm.extract_audio_features(df).collect()}


def test_malformed_payloads_yield_null_rows_not_task_kill(spark):
    """ADVICE r6: undecodable bytes must yield NULL feature rows through
    the REAL decode path — garbage zlib under a valid CRC, a short IHDR
    and a 0-channel WAV previously raised past the ValueError catch."""
    import struct
    import zlib as _z  # noqa: F401

    from logagent_spark.operators import codecs as C
    from logagent_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
    )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    png_garbage = (C._PNG_SIG + C._png_chunk(b"IHDR", ihdr)
                   + C._png_chunk(b"IDAT", b"not zlib")
                   + C._png_chunk(b"IEND", b""))
    png_short_ihdr = (C._PNG_SIG + C._png_chunk(b"IHDR", ihdr[:12])
                      + C._png_chunk(b"IEND", b""))
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    wav0 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    img = spark.createDataFrame(
        [(1, bytearray(png_garbage)), (2, bytearray(png_short_ihdr))],
        "doc_id long, payload binary",
    )
    rows = extract_image_features(img, fake=False).collect()
    assert len(rows) == 2 and all(r["width"] is None for r in rows)
    aud = spark.createDataFrame(
        [(3, bytearray(wav0))], "doc_id long, payload binary"
    )
    arows = extract_audio_features(aud).collect()
    assert len(arows) == 1 and arows[0]["sample_rate"] is None
