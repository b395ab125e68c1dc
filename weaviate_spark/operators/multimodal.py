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

Decoders: REAL pure-python/numpy codecs ship for the container-friendly
formats — uncompressed 24-bit BMP and binary PPM (P6) images (struct
header parse + numpy pixel array, nearest-neighbor resize), and PCM WAV
audio via the stdlib ``wave`` module (sample rate / channels / duration
/ RMS / zero-crossing features). Formats that require external codecs
(JPEG/PNG/MP3/video) raise NotImplementedError unless ``fake=True``,
which substitutes a deterministic md5-seeded pseudo-decoder; the
surrounding plumbing — schemas, batching, null handling, output shapes
— is identical, so swapping in PIL/ffmpeg is a one-function change.
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


def decode_image_array(data: bytes):
    """REAL image decode for the pure-python-friendly formats: returns a
    numpy (height, width, 3) uint8 array for binary PPM (P6) and
    uncompressed 24-bit BMP bytes; None if the format is not one of
    those (callers fall back to the stub or raise)."""
    import struct

    import numpy as np

    if data[:2] == b"P6":
        # P6 <ws> width <ws> height <ws> maxval \n raw RGB
        parts, i, vals = [], 2, []
        while len(vals) < 3:
            while i < len(data) and data[i : i + 1].isspace():
                i += 1
            if data[i : i + 1] == b"#":          # comment line
                while data[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            vals.append(int(data[i:j]))
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = vals
        if maxval > 255:
            return None
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
        return px.reshape(h, w, 3).copy()
    if data[:2] == b"BM":
        off = struct.unpack_from("<I", data, 10)[0]
        w, h = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
        if bpp != 24 or compression != 0:
            return None
        flip = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3                # rows pad to 4 bytes
        rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
        rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]                   # BGR -> RGB
        return (rgb[::-1] if flip else rgb).copy()  # bottom-up -> top-down
    return None


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (h, w, c) array — the standard
    pre-embedding normalization step, in pure numpy."""
    import numpy as np

    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def _image_feature(img, dim: int) -> list[float]:
    """Deterministic dim-length feature: mean-pooled grayscale over a
    nearest-neighbor grid plus global channel means, scaled to [0, 1]."""
    import numpy as np

    grid = max(1, int((dim - 3) ** 0.5)) if dim > 3 else 1
    small = resize_nearest(img, grid, grid).astype(np.float64) / 255.0
    gray = small.mean(axis=2).ravel()
    chans = img.reshape(-1, 3).mean(axis=0) / 255.0
    feat = np.concatenate([chans, gray])
    if len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    return [float(x) for x in feat[:dim]]


def decode_wav_info(data: bytes) -> dict:
    """REAL PCM WAV decode via the stdlib ``wave`` module: header fields
    plus RMS amplitude and zero-crossing rate over the samples."""
    import io
    import wave as wave_mod

    import numpy as np

    with wave_mod.open(io.BytesIO(data)) as wf:
        sr = wf.getframerate()
        ch = wf.getnchannels()
        n = wf.getnframes()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        x -= 128.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    rms = float(np.sqrt((x ** 2).mean())) if len(x) else 0.0
    zc = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    return {
        "sample_rate": sr,
        "channels": ch,
        "duration_ms": int(n * 1000 / sr) if sr else 0,
        "rms": rms,
        "zero_crossing_rate": zc,
    }


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
    on_error: str = "raise",
) -> DataFrame:
    """media bytes -> feature vector via Arrow-batched mapInPandas.

    BMP (24-bit uncompressed) and PPM (P6) bytes decode for REAL
    (`decode_image_array`); other formats raise NotImplementedError
    unless ``fake=True`` substitutes the deterministic stub, or
    ``on_error='skip'`` marks the row decode_ok=False instead (per-row
    codec failures must never kill a 100 TB pass). Null/empty rows come
    back with decode_ok=False either way.
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
                    try:
                        img = decode_image_array(bytes(data))
                    except Exception:
                        img = None
                    if img is not None:
                        feats.append(_image_feature(img, dim))
                        oks.append(True)
                        continue
                    if fake:
                        feats.append(_fake_decode(bytes(data), dim))
                        oks.append(True)
                        continue
                    if on_error == "skip":
                        feats.append(None)
                        oks.append(False)
                        continue
                    raise NotImplementedError(
                        "only BMP/PPM decode without external codecs; "
                        "JPEG/PNG need PIL (not in this container) — "
                        "pass fake=True for the deterministic stub or "
                        "on_error='skip' to drop undecodable rows"
                    )
                yield pd.DataFrame({
                    "media_id": chunk[id_col].values,
                    "feature": feats,
                    "decode_ok": oks,
                })

    return df.select(id_col, media_col).mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossing_rate", T.DoubleType()),
    T.StructField("decode_ok", T.BooleanType()),
])


def decode_audio_features(
    df: DataFrame, id_col: str, media_col: str
) -> DataFrame:
    """PCM WAV bytes -> (sample_rate, channels, duration, RMS,
    zero-crossing rate) — a REAL decoder (stdlib `wave`), Arrow-batched.
    Non-WAV / corrupt rows return decode_ok=False rather than failing
    the job (per-row codec errors must never kill a 100 TB pass)."""

    def _decode(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                rows["media_id"].append(mid)
                try:
                    info = decode_wav_info(bytes(data)) if data else None
                except Exception:
                    info = None
                if info is None:
                    for k in ("sample_rate", "channels", "duration_ms", "rms",
                              "zero_crossing_rate"):
                        rows[k].append(None)
                    rows["decode_ok"].append(False)
                else:
                    for k in ("sample_rate", "channels", "duration_ms", "rms",
                              "zero_crossing_rate"):
                        rows[k].append(info[k])
                    rows["decode_ok"].append(True)
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(_decode, AUDIO_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, id_col: str, media_col: str, out_h: int, out_w: int
) -> DataFrame:
    """Decode BMP/PPM -> nearest-neighbor resize -> re-encode as PPM
    (P6) binary. The standard pre-embedding normalization pass as a
    narrow Arrow-batched map; undecodable rows pass through as null."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ])

    def _resize(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            ids, outs = [], []
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                ids.append(mid)
                img = decode_image_array(bytes(data)) if data else None
                if img is None:
                    outs.append(None)
                    continue
                small = resize_nearest(img, out_h, out_w)
                header = f"P6\n{out_w} {out_h}\n255\n".encode()
                outs.append(header + small.astype("uint8").tobytes())
            yield pd.DataFrame({"media_id": ids, "resized": outs})

    return df.select(id_col, media_col).mapInPandas(_resize, schema)


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


def near_media_vector(data: bytes, dim: int = 8) -> list[float]:
    """Query-side near-media (nearImage/nearAudio, modules/img2vec &
    multi2vec query path): decode the query blob with the REAL codecs
    and produce the same feature vector the ingest side computes, so
    query and corpus share one space. BMP/PPM -> pooled-grayscale image
    feature; WAV -> [sample_rate/48k, channels/2, log-duration, rms/2^15,
    zero-crossing] padded to `dim`."""
    img = decode_image_array(data)
    if img is not None:
        return _image_feature(img, dim)
    try:
        info = decode_wav_info(data)
    except Exception:
        info = None
    if info is not None:
        import math

        feat = [
            info["sample_rate"] / 48_000.0,
            info["channels"] / 2.0,
            math.log1p(info["duration_ms"]) / 10.0,
            info["rms"] / 32768.0,
            info["zero_crossing_rate"],
        ]
        return [float(x) for x in (feat + [0.0] * dim)[:dim]]
    raise NotImplementedError(
        "query blob is neither BMP/PPM nor PCM WAV; other codecs need "
        "PIL/ffmpeg (not in this container)"
    )


def decode_media_features(
    df: DataFrame, id_col: str, media_col: str, dim: int = 8
) -> DataFrame:
    """Corpus blobs -> the shared query/corpus feature space, routed per
    blob by magic bytes exactly like the query side (near_media_vector):
    decodable images take the pooled-grayscale feature, PCM WAV the
    audio feature, anything else decode_ok=False. This is the corpus
    decoder for near_media_search — routing everything through the
    image decoder silently dropped every audio row."""

    def _decode(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            ids, feats, oks = [], [], []
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                ids.append(mid)
                feat = None
                if data is not None and len(data) > 0:
                    try:
                        feat = near_media_vector(bytes(data), dim)
                    except Exception:
                        feat = None
                feats.append(feat)
                oks.append(feat is not None)
            yield pd.DataFrame({"media_id": ids, "feature": feats, "decode_ok": oks})

    return df.select(id_col, media_col).mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


def near_media_search(
    df: DataFrame,
    id_col: str,
    media_col: str,
    query_blob: bytes,
    limit: int = 10,
    dim: int = 8,
) -> DataFrame:
    """nearImage/nearAudio search: corpus blobs feature-extract via the
    Arrow-batched decoder (an ingest-time artifact in a standing
    deployment — persist the feature table and reuse), the query blob
    encodes driver-side, cosine top-k via TakeOrdered. Undecodable
    corpus rows (decode_ok=false) are excluded, mirroring the
    reference's skip-on-vectorize-error ingest behavior."""
    from weaviate_spark.functions.distance import distance

    q = F.array(*[F.lit(float(x)) for x in near_media_vector(query_blob, dim)])
    feats = decode_media_features(df, id_col, media_col, dim=dim)
    return (
        feats.where(F.col("decode_ok"))
        .withColumn("_distance", F.round(distance(F.col("feature"), q, "cosine"), 6))
        .orderBy(F.col("_distance").asc(), F.col("media_id").asc())
        .limit(limit)
        .select("media_id", "_distance")
    )
