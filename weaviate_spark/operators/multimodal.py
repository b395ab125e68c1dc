"""Multimodal (image/audio/video) column handling (BASELINE.json north
star: "multimodal columns ... STUB the decode step ... make the
Spark-side plumbing real and tested").

Data model: media are opaque ``binary`` columns with a typed metadata
struct — the weaviate `blob` dataType (entities/schema/data_types.go:43-44)
generalized with the metadata a pipeline needs for partitioning and
pruning without touching bytes:

    media: binary
    media_meta: struct<mime: string, width: int, height: int,
                       duration_ms: long, sample_rate: int>

Processing runs as Arrow-batched ``mapInPandas`` stages — the right
shape for expensive per-item Python work at scale: batch size bounds
memory, the iterator contract never materializes a partition, and the
UDF sees pandas Series of raw bytes (no per-row Python call overhead).

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
``decode_image`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic md5-seeded "decoder" producing stable
pseudo-features. Everything around the stub — schemas, batch iteration,
null handling, output shapes — is real and unit-tested, so swapping in
a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("decode_ok", T.BooleanType()),
])


def attach_media_meta(df: DataFrame, mime: str = "application/octet-stream") -> DataFrame:
    """Synthesize the typed metadata struct for a raw binary column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_decode(data: bytes, dim: int) -> list[float]:
    """Deterministic md5-seeded pseudo-feature — the stub decoder."""
    out = []
    seed = data or b""
    for d in range(dim):
        h = hashlib.md5(seed + d.to_bytes(4, "little")).digest()
        out.append(int.from_bytes(h[:4], "little") / 0xFFFFFFFF - 0.5)
    return out


def decode_image_features(
    df: DataFrame,
    id_col: str,
    media_col: str,
    dim: int = 8,
    batch_size: int = 256,
    fake: bool = False,
) -> DataFrame:
    """media bytes -> feature vector via Arrow-batched mapInPandas.

    With ``fake=False`` this raises NotImplementedError at execution
    time (image codecs are not available in this environment); the
    plumbing — schema, batching, null rows -> decode_ok=False — is
    identical for a real decoder.
    """

    def _decode(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            # honor batch_size inside the partition iterator
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                feats, oks = [], []
                for data in chunk[media_col]:
                    if data is None or len(data) == 0:
                        feats.append(None)
                        oks.append(False)
                        continue
                    if not fake:
                        raise NotImplementedError(
                            "image decode requires PIL/ffmpeg (not in this "
                            "container); pass fake=True for the deterministic stub"
                        )
                    feats.append(_fake_decode(bytes(data), dim))
                    oks.append(True)
                yield pd.DataFrame({
                    "media_id": chunk[id_col].values,
                    "feature": feats,
                    "decode_ok": oks,
                })

    return df.select(id_col, media_col).mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    media_col: str,
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, frame_ts_ms, frame: binary). The stub emits
    md5-derived 16-byte pseudo-frames for a fake 5-second clip."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def _sample(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                if data is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg (not in this container); "
                        "pass fake=True for the deterministic stub"
                    )
                duration_ms = 5000
                for idx, ts in enumerate(range(0, duration_ms, every_ms)):
                    frame = hashlib.md5(bytes(data) + ts.to_bytes(8, "little")).digest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(_sample, schema)
