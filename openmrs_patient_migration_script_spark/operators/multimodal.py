"""Multimodal column plumbing (builder-brief extension): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

What is REAL here — and tested: the schema contract (binary payload +
typed metadata), the ``mapInPandas`` signature (iterator of pandas
batches in, iterator out, so one task never materializes its whole
partition), row-explosion (frame sampling yields multiple output rows per
input row), and the partitioning story (media rows are processed where
they sit; no shuffle is introduced by any transform in this module).

What is STUBBED — clearly: the actual codec work. Image/audio libraries
(PIL, librosa, ffmpeg) are not in this environment, so ``decode_media``
raises ``NotImplementedError`` on the real path and every feature
extractor below uses :func:`fake_decode` — a DETERMINISTIC fake that
derives "decoded" properties from the md5 of the payload bytes. That
choice is what makes the Pandas-UDF path hash-checkable against a DuckDB
oracle (md5 is pure SQL), i.e. the plumbing is verified end-to-end even
though the codec is fake. Swapping in a real decoder only changes the
body of ``fake_decode``'s callers, not the Spark plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def decode_media(content: bytes, media_type: str) -> Any:
    """The real decode hook. Not implementable in this environment (no
    codec libraries are installed); kept as the single swap-in point."""
    raise NotImplementedError(
        "codec libraries (PIL/librosa/ffmpeg) are not available in this "
        "environment; feature extractors use fake_decode() instead"
    )


def fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for a codec: 'decoded' properties are pure
    functions of the payload's md5, so results are reproducible across
    runs, engines, and task retries."""
    h = hashlib.md5(content).hexdigest()
    return {
        "width": 16 + int(h[0:4], 16) % 512,
        "height": 16 + int(h[4:8], 16) % 512,
        "mean_intensity": round(int(h[8:12], 16) % 10000 / 10000.0, 6),
        "n_frames": 1 + int(h[12:14], 16) % 8,
        "duration_s": 1 + int(h[14:16], 16) % 300,
        "sample_rate": (8000, 16000, 22050, 44100)[int(h[16:18], 16) % 4],
        "n_channels": 1 + int(h[18:19], 16) % 2,
        "rms_db": round(-(int(h[19:23], 16) % 6000) / 100.0, 6),
    }


def make_media_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Build an opaque-binary media table from any source column (the
    harness has no binary fixture; UTF-8 text bytes stand in for an
    encoded image). Narrow projection — the binary column is born
    partitioned exactly like its source."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(F.encode(F.col(payload_col), "UTF-8")).alias("n_bytes"),
    )


_IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image feature extraction as an Arrow-batched ``mapInPandas``:
    the UDF sees an ITERATOR of record batches (bounded memory per task
    regardless of partition size) and yields one feature row per media
    row. No shuffle — features are computed where the bytes live."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fake_decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                }
            )

    return media.mapInPandas(extract, schema=_IMAGE_FEATURES_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ts_s", DoubleType()),
    ]
)


def frame_sample(media: DataFrame) -> DataFrame:
    """Video frame sampling as a row-exploding ``mapInPandas``: each media
    row yields n_frames output rows (evenly spaced timestamps across the
    'decoded' duration). The 1→N fan-out happens inside the task — the
    input is never duplicated through a shuffle."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                f = fake_decode(bytes(content))
                n, dur = f["n_frames"], f["duration_s"]
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(round(i * dur / n, 6))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_ts_s": tss}
            )

    return media.mapInPandas(sample, schema=_FRAME_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plan: computes the target geometry from the (fake-)decoded
    dims and passes the payload through unchanged — a real implementation
    would re-encode bytes in the same UDF body. Keeps the binary column's
    schema stable so downstream stages are unaffected."""
    schema = StructType(
        media.schema.fields
        + [
            StructField("target_width", IntegerType()),
            StructField("target_height", IntegerType()),
        ]
    )

    def resize(batches: Iterator) -> Iterator:
        for pdf in batches:
            dims = [fake_decode(bytes(c)) for c in pdf["content"]]
            scale = [
                min(1.0, max_side / max(d["width"], d["height"])) for d in dims
            ]
            out = pdf.copy()
            out["target_width"] = [
                max(1, int(d["width"] * s)) for d, s in zip(dims, scale)
            ]
            out["target_height"] = [
                max(1, int(d["height"] * s)) for d, s in zip(dims, scale)
            ]
            yield out

    return media.mapInPandas(resize, schema=schema)


_AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_s", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms_db", DoubleType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio feature extraction — same Arrow-batched
    ``mapInPandas`` contract as ``image_features`` (iterator in/out,
    bounded task memory, zero shuffle); a real path would swap
    librosa/ffmpeg into the decode call without changing the plan."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fake_decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "duration_s": [f["duration_s"] for f in feats],
                    "n_samples": [
                        f["sample_rate"] * f["duration_s"] * f["n_channels"]
                        for f in feats
                    ],
                    "rms_db": [f["rms_db"] for f in feats],
                }
            )

    return media.mapInPandas(extract, schema=_AUDIO_FEATURES_SCHEMA)
