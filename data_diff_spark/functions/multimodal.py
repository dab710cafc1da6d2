"""Multimodal (image/audio/video) column plumbing.

Media lives in the engine as an opaque `binary` column plus a typed metadata
struct — the layout a 100 TB multimodal training pipeline needs: parquet
stores the bytes inline (or a reference), Spark never interprets them until
an explicit decode/feature stage, and that stage runs as Arrow-batched
`mapInPandas` so the bytes cross into Python once per batch, not per row.

The actual codec work (image decode, resize, audio frame-sampling) requires
libraries this container does not ship (PIL/cv2/librosa), so the decoders
are STUBS behind `NotImplementedError` with a deterministic fake
(`fake_decode`) that exercises the identical plumbing — schema, batch
iteration, partitioning — and is what the tests and the oracle-checked
workload entry run.

MEDIA_SCHEMA:
    media:    binary                      raw encoded bytes
    media_meta: struct<format string, width int, height int, n_frames int>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic binary media column + metadata from the text
    corpus (the container has no real image fixtures). The bytes are the
    utf-8 text; the metadata is a pure function of the id — good enough to
    exercise every piece of multimodal plumbing end-to-end."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            F.element_at(
                F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
                (F.col(id_col) % 3 + 1).cast("int"),
            ).alias("format"),
            ((F.col(id_col) % 8 + 1) * 64).cast("int").alias("width"),
            ((F.col(id_col) % 4 + 1) * 64).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


# --- decoders ---------------------------------------------------------------


def decode_image(data: bytes):  # pragma: no cover - stub
    """Real image decode. STUB: PIL/cv2 are not available in this
    environment; swap in `PIL.Image.open(io.BytesIO(data))` on a cluster
    that ships them."""
    raise NotImplementedError(
        "image decoding requires PIL/cv2, not available in this environment; "
        "use fake_decode for plumbing tests"
    )


def sample_frames(data: bytes, every_n: int = 30):  # pragma: no cover - stub
    """Real video frame sampling. STUB (needs pyav/cv2)."""
    raise NotImplementedError("video frame sampling requires pyav/cv2")


def resize_image(data: bytes, width: int, height: int):  # pragma: no cover - stub
    """Real image resize. STUB: swap in PIL's Image.resize on a cluster
    shipping PIL; runs inside the same mapInPandas template as
    extract_features (bytes in, bytes out, batch at a time)."""
    raise NotImplementedError("image resize requires PIL/cv2")


def fake_decode(data: bytes) -> dict:
    """Deterministic stand-in for decode: byte stats + digest. Exercises the
    same data path (raw bytes in a pandas batch -> per-item python compute)
    as a real decoder."""
    n = len(data)
    return {
        "n_bytes": n,
        "content_md5": hashlib.md5(data).hexdigest(),
        "byte_mean": (sum(data) / n) if n else 0.0,
    }


# --- Arrow-batched feature extraction ---------------------------------------


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the media column: one Arrow batch
    of (id, media) enters Python at a time, features come back as a typed
    frame. This is the template for any real decoder — replace fake_decode
    and extend FEATURE_SCHEMA.

    Scale shape: map-only (no shuffle); batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory holds
    one batch of raw bytes, never a whole partition of media."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(bytes(b) if b is not None else b"") for b in pdf["media"]]
            out = pd.DataFrame(feats or None, columns=["n_bytes", "content_md5", "byte_mean"])
            out.insert(0, "doc_id", pdf[id_col].values)
            out["n_bytes"] = out["n_bytes"].astype("int64")
            yield out

    return df.select(F.col(id_col), "media").mapInPandas(_extract, FEATURE_SCHEMA)
