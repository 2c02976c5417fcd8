"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake behind `fake=True`, NotImplementedError otherwise) —
but everything Spark-side is real and tested: the schema, the Arrow batch
shape through mapInPandas, the partitioning of binary-heavy frames, and
the metadata extraction expressions.

Scale notes: binary payloads ride in parquet as byte arrays; metadata
extraction (`sniff_format`, sizes) is a Column expression over the first
bytes — no UDF, so a metadata-only query never deserializes payloads in
Python. Decode/feature steps batch through mapInPandas with
`maxRecordsPerBatch` tuned down (big rows -> small batches).
"""

from __future__ import annotations

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
    T.StructField("mean_luma", T.DoubleType()),
])


def decode_image_batch(payloads: pd.Series, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of image payloads -> feature rows.

    Real decode requires an image codec (Pillow/cv2 — not in this
    container). `fake=True` derives deterministic pseudo-features from
    the bytes so the distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec; run with fake=True "
            "or install a decoder on the executors"
        )
    # One pass extracts the ragged byte heads (unavoidable per-row
    # slicing); ALL arithmetic is vectorized numpy over the batch —
    # no per-row pandas writes in the loop.
    raw = payloads.to_numpy(dtype=object)
    n = len(raw)
    present = np.zeros(n, dtype=bool)
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
            "mean_luma": luma,
        },
        index=payloads.index,
    )
    out.loc[~present, ["width", "height", "mean_luma"]] = None
    return out


def extract_image_features(
    df: DataFrame, bin_col: str = "payload", *, fake: bool = False
) -> DataFrame:
    """mapInPandas image feature extraction: schema = input + features.
    Keeps partitioning; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    out_schema = T.StructType(
        list(df.schema.fields) + list(IMAGE_FEATURES_SCHEMA.fields)
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf[bin_col], fake)
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
