"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codec LIBRARIES, but PNG/BMP/WAV need
none (stdlib zlib/struct + numpy — operators/codecs.py), so the DECODE
step is REAL for those formats: `fake=False` decodes actual pixel/sample
arrays and emits true width/height/channel sums; payloads in formats
that do need a codec (JPEG/GIF/video) yield NULL features per row — a
100 TB run must not die on one undecodable blob (same philosophy as the
dead-letter route). The deterministic fake path (`fake=True`) remains
for plumbing-only tests. Everything Spark-side is real and tested
either way: the schema, the Arrow batch shape through mapInPandas, the
partitioning of binary-heavy frames, and the metadata extraction
expressions.

Scale notes: binary payloads ride in parquet as byte arrays; metadata
extraction (`sniff_format`, sizes) is a Column expression over the first
bytes — no UDF, so a metadata-only query never deserializes payloads in
Python. Decode/feature steps batch through mapInPandas with
`maxRecordsPerBatch` tuned down (big rows -> small batches).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",   # wav/avi containers
    "html": b"<htm",
    "pdf": b"%PDF",
    "bmp": b"BM",
}


def sniff_format(binary: Column) -> Column:
    """Magic-byte format sniff as a Column expression (hex-prefix
    comparison — JVM-side, no Python)."""
    head = F.hex(F.substring(binary, 1, 4))
    expr = F.lit("unknown")
    for name, magic in reversed(MAGIC.items()):
        prefix = magic.hex().upper()
        expr = F.when(
            F.substring(head, 1, len(prefix)) == F.lit(prefix), F.lit(name)
        ).otherwise(expr)
    return expr


def with_media_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    b = F.col(bin_col)
    return df.select(
        "*",
        F.octet_length(b).alias("media_bytes"),
        sniff_format(b).alias("media_format"),
        F.md5(b).alias("media_digest"),
    )


IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("channel_sum", T.LongType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def decode_image_batch(payloads: pd.Series, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of image payloads -> feature rows.

    `fake=False` REALLY decodes PNG and BMP (operators/codecs.py —
    stdlib zlib + numpy, no codec library needed): width/height/
    n_channels are the true image dims, channel_sum the exact integer
    sum over every channel sample (so a SQL oracle can re-derive it),
    mean_luma = channel_sum / samples. A payload in a format that needs
    a real codec (JPEG/GIF), or undecodable bytes, yields NULLs for
    that row — never an exception that would kill the job.

    `fake=True` derives deterministic pseudo-features from the byte
    head so plumbing tests run on arbitrary blobs."""
    from logagent_spark.operators import codecs

    raw = payloads.to_numpy(dtype=object)
    n = len(raw)
    present = np.zeros(n, dtype=bool)
    if not fake:
        width = np.zeros(n, dtype=np.int64)
        height = np.zeros(n, dtype=np.int64)
        nchan = np.zeros(n, dtype=np.int64)
        csum = np.zeros(n, dtype=np.int64)
        for i, p in enumerate(raw):
            if p is None:
                continue
            b = bytes(p)
            try:
                if b[:4] == MAGIC["png"]:
                    img = codecs.decode_png(b)
                elif b[:2] == b"BM":
                    img = codecs.decode_bmp(b)
                else:
                    continue
            except (ValueError, zlib.error, struct.error):
                continue
            present[i] = True
            height[i], width[i] = img.shape[:2]
            nchan[i] = 1 if img.ndim == 2 else img.shape[2]
            csum[i] = int(img.sum(dtype=np.int64))
        luma = csum / np.maximum(width * height * nchan, 1)
        out = pd.DataFrame(
            {
                "width": pd.array(width, dtype="Int32"),
                "height": pd.array(height, dtype="Int32"),
                "n_channels": pd.array(nchan, dtype="Int32"),
                "channel_sum": pd.array(csum, dtype="Int64"),
                "mean_luma": luma,
            },
            index=payloads.index,
        )
        out.loc[~present, list(out.columns)] = None
        return out
    # fake: one pass extracts the ragged byte heads (unavoidable per-row
    # slicing); ALL arithmetic is vectorized numpy over the batch —
    # no per-row pandas writes in the loop.
    head8 = np.zeros(n, dtype=np.uint64)
    lumsum = np.zeros(n, dtype=np.int64)
    for i, p in enumerate(raw):
        if p is None:
            continue
        b = bytes(p)
        present[i] = True
        head8[i] = int.from_bytes(b[:8].ljust(8, b"\0"), "little")
        lumsum[i] = int(np.frombuffer(b[:256], dtype=np.uint8).sum())
    width = (64 + head8 % 1920).astype("int64")
    height = (64 + (head8 >> np.uint64(16)) % 1080).astype("int64")
    luma = (lumsum % 2560) / 10.0
    out = pd.DataFrame(
        {
            "width": pd.array(np.where(present, width, 0), dtype="Int32"),
            "height": pd.array(np.where(present, height, 0), dtype="Int32"),
            "n_channels": pd.array(np.where(present, 3, 0), dtype="Int32"),
            "channel_sum": pd.array(lumsum, dtype="Int64"),
            "mean_luma": luma,
        },
        index=payloads.index,
    )
    out.loc[~present, list(out.columns)] = None
    return out


def extract_image_features(
    df: DataFrame, bin_col: str = "payload", *, fake: bool = False,
    drop_payload: bool = False,
) -> DataFrame:
    """mapInPandas image feature extraction: schema = input + features.
    Keeps partitioning; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch. ``drop_payload``
    removes the binary column from the OUTPUT inside the worker — a
    decode job that only wants features must not ship the bytes back
    through Arrow (at media scale the payloads dominate the transfer)."""
    keep = [f for f in df.schema.fields
            if not (drop_payload and f.name == bin_col)]
    out_schema = T.StructType(keep + list(IMAGE_FEATURES_SCHEMA.fields))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf[bin_col], fake)
            if drop_payload:
                pdf = pdf.drop(columns=[bin_col])
            yield pd.concat(
                [pdf.reset_index(drop=True), feats.reset_index(drop=True)],
                axis=1,
            )

    return df.mapInPandas(op, schema=out_schema)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("n_samples", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_audio_channels", T.IntegerType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("zero_crossings", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
])


def decode_audio_batch(payloads: pd.Series) -> pd.DataFrame:
    """REAL WAV/PCM decode for one Arrow batch (codecs.decode_wav) ->
    per-payload features. sum_sq and zero_crossings are exact integers
    over channel-0 samples (zc counts sign-bit flips between adjacent
    samples, >= 0 vs < 0) so a SQL oracle can re-derive both;
    non-WAV/undecodable payloads yield NULLs for the row."""
    from logagent_spark.operators import codecs

    raw = payloads.to_numpy(dtype=object)
    n = len(raw)
    present = np.zeros(n, dtype=bool)
    nsamp = np.zeros(n, dtype=np.int64)
    rate = np.zeros(n, dtype=np.int64)
    nchan = np.zeros(n, dtype=np.int64)
    sumsq = np.zeros(n, dtype=np.int64)
    zc = np.zeros(n, dtype=np.int64)
    for i, p in enumerate(raw):
        if p is None:
            continue
        try:
            r, samples = codecs.decode_wav(bytes(p))
        except (ValueError, zlib.error, struct.error):
            continue
        present[i] = True
        nsamp[i], nchan[i] = samples.shape
        rate[i] = r
        ch0 = samples[:, 0].astype(np.int64)
        sumsq[i] = int((ch0 * ch0).sum())
        neg = ch0 < 0
        zc[i] = int((neg[1:] != neg[:-1]).sum())
    dur = nsamp / np.maximum(rate, 1)
    out = pd.DataFrame(
        {
            "n_samples": pd.array(nsamp, dtype="Int64"),
            "sample_rate": pd.array(rate, dtype="Int32"),
            "n_audio_channels": pd.array(nchan, dtype="Int32"),
            "sum_sq": pd.array(sumsq, dtype="Int64"),
            "zero_crossings": pd.array(zc, dtype="Int64"),
            "duration_s": dur,
        },
        index=payloads.index,
    )
    out.loc[~present, list(out.columns)] = None
    return out


def extract_audio_features(df: DataFrame, bin_col: str = "payload", *,
                           drop_payload: bool = False) -> DataFrame:
    """mapInPandas audio feature extraction (real WAV decode): schema =
    input + AUDIO_FEATURES_SCHEMA. Same batch/partitioning and
    ``drop_payload`` notes as extract_image_features."""
    keep = [f for f in df.schema.fields
            if not (drop_payload and f.name == bin_col)]
    out_schema = T.StructType(keep + list(AUDIO_FEATURES_SCHEMA.fields))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_audio_batch(pdf[bin_col])
            if drop_payload:
                pdf = pdf.drop(columns=[bin_col])
            yield pd.concat(
                [pdf.reset_index(drop=True), feats.reset_index(drop=True)],
                axis=1,
            )

    return df.mapInPandas(op, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    bin_col: str = "payload",
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling PLAN: emit (frame_idx, byte_offset) rows per
    payload — pure Column exprs (sequence + explode). The actual frame
    decode would plug into extract_image_features; offsets are computed
    without touching Python."""
    n_frames = F.least(
        F.greatest(
            (F.octet_length(F.col(bin_col)) / every_n_bytes).cast("int"),
            F.lit(1),
        ),
        F.lit(max_frames),
    )
    return df.select(
        "*",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * every_n_bytes,
            )
        ).alias("frame_idx", "byte_offset"),
    )


def embed_text_fake(df: DataFrame, text_col: str, dim: int = 16) -> DataFrame:
    """Deterministic fake text-embedding — stands in for a model server
    call; exercises the array<double> plumbing + ANN ops.

    Formula (dim <= 16): component i = (md5(text)[i] - 128) / sqrt(sum_j
    (md5(text)[j] - 128)^2). The integer sums are exact in float64, so
    the vector is reproducible bit-for-bit by any engine with md5 (the
    DuckDB oracle rebuilds it from the hex digest). Vectorized: one md5
    per row (hashlib, GIL-released) then batch numpy — no per-row pandas.
    """
    if dim > 16:
        raise ValueError("fake embedder derives from md5's 16 bytes")

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(s: pd.Series) -> pd.Series:
        import hashlib

        raw = s.to_numpy(dtype=object)
        n = len(raw)
        present = np.zeros(n, dtype=bool)
        digests = bytearray()
        for i, t in enumerate(raw):
            if t is None:
                digests += b"\0" * 16
                continue
            present[i] = True
            digests += hashlib.md5(t.encode("utf-8")).digest()
        mat = (
            np.frombuffer(bytes(digests), dtype=np.uint8)
            .reshape(n, 16)[:, :dim]
            .astype(np.float64)
            - 128.0
        )
        norm2 = (mat * mat).sum(axis=1)  # integer-valued, exact in f64
        safe = np.where(norm2 > 0, np.sqrt(norm2), 1.0)
        vecs = mat / safe[:, None]
        out = [vecs[i].tolist() if present[i] else None for i in range(n)]
        return pd.Series(out, index=s.index)

    return df.withColumn("embedding", _embed(F.col(text_col)))
