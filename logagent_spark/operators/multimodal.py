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
    n = len(payloads)
    out = pd.DataFrame(index=payloads.index, columns=["width", "height", "mean_luma"])
    for i, (idx, p) in enumerate(payloads.items()):
        if p is None:
            out.loc[idx] = (None, None, None)
            continue
        b = bytes(p)
        h = int.from_bytes(b[:8].ljust(8, b"\0"), "little")
        out.loc[idx] = (
            64 + h % 1920,
            64 + (h >> 16) % 1080,
            float((sum(b[:256]) % 2560) / 10.0),
        )
    _ = n
    out["width"] = out["width"].astype("Int32")
    out["height"] = out["height"].astype("Int32")
    out["mean_luma"] = out["mean_luma"].astype("float64")
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
    """Deterministic fake text-embedding (hash-seeded) — stands in for a
    model server call; exercises the array<double> plumbing + ANN ops."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            import hashlib

            seed = int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:4], "little"
            )
            rng = np.random.RandomState(seed % (2**31))
            v = rng.randn(dim)
            return (v / np.linalg.norm(v)).tolist()

        return s.map(one)

    return df.withColumn("embedding", _embed(F.col(text_col)))
