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
/ RMS / zero-crossing features), plus baseline-sequential JPEG and
8-bit PNG decoders written here in pure python/numpy (stdlib zlib for
the PNG inflate), and Y4M (YUV4MPEG2) video (header parse, frame
offset scan, planar-YUV -> RGB with the same JFIF matrix as the JPEG
path, fps-aware frame sampling). Formats that still require external
codecs (16-bit PNG, MP3, compressed video containers like MP4/WebM)
raise NotImplementedError unless
``fake=True``, which substitutes a deterministic md5-seeded
pseudo-decoder (frame sampling instead skips unknown containers); the
surrounding plumbing — schemas, batching, null handling, output shapes
— is identical, so swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

from weaviate_spark.cache import lit_double_array
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
    """REAL image decode: returns a numpy (height, width, 3) uint8 array
    for binary PPM (P6), uncompressed 24-bit BMP, JPEG (baseline AND
    progressive), 8-bit PNG (incl. Adam7 interlaced), and GIF87a/89a
    (LZW, incl. 4-pass interlace; first frame) bytes
    (pure-numpy decoders below); None if the
    format is none of those OR the bytes are truncated/corrupt — a
    per-row codec failure must never kill a 100 TB pass (fuzz-tested:
    tests/test_jpeg.py), so malformed structures surface as None, not
    exceptions (callers fall back to the stub or raise)."""
    import struct

    try:
        return _decode_image_array_strict(data)
    except (IndexError, KeyError, ValueError, struct.error,
            OverflowError, ZeroDivisionError):
        return None


def _decode_image_array_strict(data: bytes):
    import struct

    import numpy as np

    if data[:2] in (b"P6", b"P5"):
        # P6/P5 <ws> width <ws> height <ws> maxval \n raw pixels
        # (P5 = single-channel graymap: the storage shape of depth and
        # thermal frames — replicated to 3 channels like grayscale
        # JPEG/PNG, so depth/thermal blobs ride the shared image path)
        nch = 3 if data[:2] == b"P6" else 1
        parts, i, vals = [], 2, []
        while len(vals) < 3:
            while i < len(data) and data[i : i + 1].isspace():
                i += 1
            if data[i : i + 1] == b"#":          # comment line
                while i < len(data) and data[i : i + 1] != b"\n":
                    i += 1
                if i >= len(data):
                    # unterminated comment at EOF: decline (the bounded
                    # loop matters — an infinite header scan would pin
                    # an executor core instead of yielding None)
                    raise ValueError("truncated PNM header")
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
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * nch, offset=i)
        px = px.reshape(h, w, nch)
        if nch == 1:
            return np.repeat(px, 3, axis=2)
        return px.copy()
    if data[:2] == b"\xff\xd8":
        return _decode_jpeg(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(data)
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
    if data[:4] == b"GIF8":
        return decode_gif_frame_rgb(data, 0)     # first frame, like video
    return None


# ---------------------------------------------------------------------------
# JPEG decode, pure python/numpy (public JFIF/ITU T.81). Real corpora are
# JPEG-dominated; the container has no PIL/libjpeg, so this implements the
# format for real: marker parse, Huffman entropy decode (with byte
# unstuffing + restart markers) into a per-component coefficient store,
# BOTH baseline-sequential (SOF0) and progressive (SOF2 — DC/AC first +
# successive-approximation refinement scans with EOB runs, T.81 G.2),
# then dequantize, de-zigzag, 8x8 IDCT as a numpy matrix product,
# nearest-neighbor chroma upsample (documented divergence: libjpeg's
# default is a triangular "fancy" upsample), JFIF YCbCr->RGB. Arithmetic
# coding / 12-bit / lossless return None — callers skip or raise exactly
# as for other unsupported codecs.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    import math

    import numpy as np

    M = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            M[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return M


class _HuffTable:
    """Canonical JPEG Huffman table: (length, code) -> symbol via the
    standard mincode/maxcode/valptr walk (T.81 F.2.2.3)."""

    def __init__(self, counts, symbols):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code, k = 0, 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            self.maxcode[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n

    def decode(self, reader):
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.symbols[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("bad huffman code")


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops (raises) at any real marker."""

    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise StopIteration  # real marker: scan over
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.nbits = 0


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the n-bit magnitude to its signed value."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def _entropy_end(data: bytes, pos: int) -> int:
    """First byte offset at/after `pos` holding a real marker (0xFF
    followed by anything but 0x00 stuffing or an RSTn)."""
    while pos < len(data) - 1:
        if (
            data[pos] == 0xFF
            and data[pos + 1] != 0x00
            and not (0xD0 <= data[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return len(data)


def _decode_scan(data, pos, frame, scomps, Ss, Se, Ah, Al, huff, coefs,
                 restart_interval):
    """One entropy-coded scan into the per-component coefficient store
    (zigzag order, int32). Handles the baseline full-band scan and all
    four progressive passes (T.81 G.2 / the IJG jdphuff procedures):
    DC first (<< Al), DC successive-approximation refinement, AC first
    with EOB runs, AC refinement with correction bits."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0
    p1, m1 = 1 << Al, -1 << Al

    def dc_first(blk, ci, dc_t):
        t = dc_t.decode(reader)
        diff = _extend(reader.receive(t), t)
        pred[ci] += diff
        blk[0] = pred[ci] << Al

    def full_band_ac(blk, ac_t):
        # baseline AC loop (Al == 0, no EOB runs)
        k = 1
        while k <= Se:
            rs = ac_t.decode(reader)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > Se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.receive(s), s)
            k += 1

    def ac_first(blk, ac_t):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = Ss
        while k <= Se:
            rs = ac_t.decode(reader)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += 16
                continue
            k += r
            if k > Se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.receive(s), s) << Al
            k += 1

    def ac_refine(blk, ac_t):
        nonlocal eobrun
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = ac_t.decode(reader)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    s = p1 if reader.read_bit() else m1
                while k <= Se:
                    c = int(blk[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= Se:
                    blk[k] = s
                k += 1
        if eobrun > 0:
            while k <= Se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1

    def decode_block(blk, ci, dc_id, ac_id):
        if Ss == 0:
            if Ah == 0:
                dc_first(blk, ci, huff[(0, dc_id)])
                if Se > 0:
                    full_band_ac(blk, huff[(1, ac_id)])
            else:
                if reader.read_bit():
                    blk[0] = int(blk[0]) | p1
        else:
            if Ah == 0:
                ac_first(blk, huff[(1, ac_id)])
            else:
                ac_refine(blk, huff[(1, ac_id)])

    def restart(unit_count):
        nonlocal pred, eobrun
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            reader.align()
            while (
                data[reader.pos] == 0xFF
                and 0xD0 <= data[reader.pos + 1] <= 0xD7
            ):
                reader.pos += 2
            pred = [0] * len(comps)
            eobrun = 0

    if len(scomps) > 1:
        # interleaved: MCU order, h*v blocks per component per MCU
        units = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart(units)
                units += 1
                for ci, dc_id, ac_id in scomps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                coefs[ci][my * c["v"] + by, mx * c["h"] + bx],
                                ci, dc_id, ac_id,
                            )
    else:
        # non-interleaved: the component's own block grid, one block per
        # "MCU" (T.81 A.2.2 — NOT padded to interleave MCU boundaries)
        ci, dc_id, ac_id = scomps[0]
        c = comps[ci]
        compw = (frame["w"] * c["h"] + hmax - 1) // hmax
        comph = (frame["h"] * c["v"] + vmax - 1) // vmax
        wb = (compw + 7) // 8
        hb = (comph + 7) // 8
        units = 0
        for by in range(hb):
            for bx in range(wb):
                restart(units)
                units += 1
                decode_block(coefs[ci][by, bx], ci, dc_id, ac_id)


def _decode_jpeg(data: bytes):
    import numpy as np

    if data[:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple, _HuffTable] = {}
    frame = None
    restart_interval = 0
    coefs = None
    got_scan = False
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        ln = int.from_bytes(data[i:i + 2], "big")
        seg = data[i + 2:i + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec != 0:
                    return None  # 16-bit tables: not 8-bit huffman JPEG
                qt[tid] = np.array(list(seg[p:p + 64]), dtype=np.int32)
                p += 64
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended / lossless / arithmetic / hierarchical
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1:p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17:p + 17 + nsym])
                huff[(tc, th)] = _HuffTable(counts, symbols)
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None or coefs is None:
                return None
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    (idx for idx, cc in enumerate(frame["comps"])
                     if cc["id"] == cs), None,
                )
                if ci is None:
                    return None
                scomps.append((ci, tables >> 4, tables & 0xF))
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            A = seg[3 + 2 * ns]
            try:
                _decode_scan(
                    data, i + ln, frame, scomps, Ss, Se, A >> 4, A & 0xF,
                    huff, coefs, restart_interval,
                )
            except (StopIteration, IndexError, ValueError, KeyError):
                return None  # truncated / corrupt entropy data
            got_scan = True
            i = _entropy_end(data, i + ln)
            continue
        i += ln
    if frame is None or coefs is None or not got_scan:
        return None
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    M = _idct_matrix()
    # dequantize + de-zigzag + IDCT (same per-block arithmetic as the
    # former single-pass baseline decoder — bit-identical output)
    h, w = frame["h"], frame["w"]
    out_planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]]
        arr = coefs[ci]
        vb, hb_ = arr.shape[:2]
        plane = np.zeros((vb * 8, hb_ * 8))
        for by in range(vb):
            for bx in range(hb_):
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = arr[by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    M.T @ coef.reshape(8, 8) @ M + 128.0
                )
        # upsample to full resolution (pixel replication) and crop
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if len(comps) == 3:
        Y, Cb, Cr = out_planes
        r = Y + 1.402 * (Cr - 128.0)
        g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
        b = Y + 1.772 * (Cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
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


def _y4m_parse(data: bytes):
    """Parse a YUV4MPEG2 (Y4M) stream — the public uncompressed video
    interchange format (mjpegtools spec): ASCII stream header
    ``YUV4MPEG2 W<w> H<h> F<num>:<den> [I.] [A.:.] [C<cs>] [X..]\\n``
    followed by ``FRAME[ params]\\n`` + planar YUV bytes per frame.

    Returns ``(info, frame_offsets)`` where info has width/height/
    fps_num/fps_den/colorspace/n_frames/duration_ms and each offset
    points at the first plane byte of a complete frame, or ``None`` if
    the bytes are not a well-formed Y4M stream. Truncated final frames
    are dropped rather than erroring (per-row codec failures must never
    kill a 100 TB pass)."""
    if not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"
    try:
        for tag in data[9:nl].split(b" "):
            if not tag:
                continue
            k, v = tag[:1], tag[1:]
            if k == b"W":
                w = int(v)
            elif k == b"H":
                h = int(v)
            elif k == b"F":
                num, den = v.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif k == b"C":
                colorspace = v.decode("ascii")
            # I (interlace), A (aspect), X (extension) don't change layout
    except (ValueError, UnicodeDecodeError):
        return None
    if not w or not h or w <= 0 or h <= 0 or fps_num <= 0 or fps_den <= 0:
        return None
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if colorspace.startswith("420"):
        chroma = (ch, cw)
    elif colorspace.startswith("422"):
        chroma = (h, cw)
    elif colorspace.startswith("444"):
        chroma = (h, w)
    elif colorspace.startswith("mono"):
        chroma = None
    else:
        return None
    frame_size = w * h + (2 * chroma[0] * chroma[1] if chroma else 0)
    offsets = []
    pos = nl + 1
    while pos < len(data):
        if not data.startswith(b"FRAME", pos):
            break  # garbage after last complete frame: keep what we have
        fnl = data.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_size > len(data):
            break  # truncated frame header or plane data
        offsets.append(fnl + 1)
        pos = fnl + 1 + frame_size
    info = {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "n_frames": len(offsets),
        "duration_ms": len(offsets) * 1000 * fps_den // fps_num,
        "chroma": chroma,
    }
    return info, offsets


def decode_y4m_info(data: bytes):
    """Y4M header + frame-count metadata (the video analogue of
    decode_wav_info), or None for non-Y4M bytes."""
    parsed = _y4m_parse(data)
    if parsed is None:
        return None
    info = dict(parsed[0])
    info.pop("chroma")
    return info


def _y4m_frame_rgb(data: bytes, info: dict, offset: int):
    """Decode one planar YUV frame at `offset` to an (h, w, 3) uint8 RGB
    array. Chroma upsamples by pixel replication and YCbCr->RGB uses the
    same full-range JFIF matrix as the JPEG decoder (C420jpeg is JFIF
    chroma siting), so video frames land in the exact feature space the
    image pipeline uses."""
    import numpy as np

    w, h, chroma = info["width"], info["height"], info["chroma"]
    ysz = w * h
    Y = np.frombuffer(data, dtype=np.uint8, count=ysz, offset=offset)
    Y = Y.reshape(h, w).astype(np.float64)
    if chroma is None:
        g = Y.astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    csz = chroma[0] * chroma[1]
    Cb = np.frombuffer(data, np.uint8, csz, offset + ysz).reshape(chroma)
    Cr = np.frombuffer(data, np.uint8, csz, offset + ysz + csz).reshape(chroma)
    Cb = np.repeat(np.repeat(Cb, (h + chroma[0] - 1) // chroma[0], axis=0),
                   (w + chroma[1] - 1) // chroma[1], axis=1)[:h, :w].astype(np.float64)
    Cr = np.repeat(np.repeat(Cr, (h + chroma[0] - 1) // chroma[0], axis=0),
                   (w + chroma[1] - 1) // chroma[1], axis=1)[:h, :w].astype(np.float64)
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def decode_y4m_frame_rgb(data: bytes, frame_idx: int):
    """Decode frame `frame_idx` of a Y4M stream to RGB, or None."""
    parsed = _y4m_parse(data)
    if parsed is None:
        return None
    info, offsets = parsed
    if not 0 <= frame_idx < len(offsets):
        return None
    return _y4m_frame_rgb(data, info, offsets[frame_idx])


# ---------------------------------------------------------------------------
# AVI / MJPEG video: RIFF container walk (public AVI 1.0 / OpenDML
# layout) + the in-repo JPEG decoder for Motion-JPEG frame data. The
# second real video path next to Y4M — MJPEG-in-AVI is the common
# "almost raw" capture format, and each '##dc' chunk is just a complete
# JPEG (baseline or progressive), so the frame decode is free.

def _avi_parse(data: bytes):
    """Walk a RIFF-AVI container: returns (info, frames) where frames
    is a list of (offset, size) spans of the FIRST video stream's
    '##dc'/'##db' chunks inside 'movi', and info carries width/height/
    fps/codec/frame count. None if the bytes are not a well-formed AVI.
    Truncated trailing chunks are dropped, not fatal."""
    import struct

    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    width = height = 0
    fps_num, fps_den = 0, 1
    codec = ""
    video_stream = -1
    stream_no = 0
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, fps_num, fps_den, codec, video_stream, stream_no
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = pos + 8
            if body + size > end:
                break  # truncated chunk: keep what we have
            if fourcc == b"LIST":
                ltype = data[body:body + 4]
                walk(body + 4, body + size, in_movi or ltype == b"movi")
            elif fourcc == b"avih" and size >= 40:
                (us_pf,) = struct.unpack_from("<I", data, body)
                w, h = struct.unpack_from("<II", data, body + 32)
                width, height = width or w, height or h
                if us_pf and not fps_num:
                    fps_num, fps_den = 1_000_000, us_pf
            elif fourcc == b"strh" and size >= 28:
                ftype = data[body:body + 4]
                if ftype == b"vids" and video_stream < 0:
                    video_stream = stream_no
                    codec = data[body + 4:body + 8].decode("latin1").strip().upper()
                    scale, rate = struct.unpack_from("<II", data, body + 20)
                    if scale and rate:
                        fps_num, fps_den = rate, scale
                stream_no += 1
            elif in_movi and len(fourcc) == 4 and fourcc[2:4] in (b"dc", b"db"):
                try:
                    sno = int(fourcc[:2])
                except ValueError:
                    sno = -1
                if sno == video_stream:
                    frames.append((body, size))
            pos = body + size + (size & 1)  # chunks pad to even

    try:
        walk(12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0]), False)
    except struct.error:
        return None
    if video_stream < 0 or not width or not height or not fps_num:
        return None
    info = {
        "width": width, "height": height,
        "fps_num": fps_num, "fps_den": fps_den,
        "codec": codec, "n_frames": len(frames),
        "duration_ms": len(frames) * 1000 * fps_den // fps_num if fps_num else 0,
    }
    return info, frames


def _avi_frame_rgb(data: bytes, info: dict, span: tuple):
    off, size = span
    if info["codec"] in ("MJPG", "JPEG", ""):
        return decode_image_array(data[off:off + size])
    return None  # DIB/compressed handlers would need external codecs


def decode_avi_info(data: bytes):
    """AVI header + frame-count metadata (the container analogue of
    decode_y4m_info), or None for non-AVI bytes."""
    parsed = _avi_parse(data)
    if parsed is None:
        return None
    return parsed[0]


def decode_avi_frame_rgb(data: bytes, frame_idx: int):
    """Decode frame `frame_idx` of an MJPEG-AVI to RGB, or None."""
    parsed = _avi_parse(data)
    if parsed is None:
        return None
    info, frames = parsed
    if not 0 <= frame_idx < len(frames):
        return None
    return _avi_frame_rgb(data, info, frames[frame_idx])


def avi_from_jpegs(jpegs, width: int, height: int, fps=(25, 1)) -> bytes:
    """Fixture writer: wrap complete JPEG blobs as an MJPEG AVI (RIFF +
    hdrl(avih, strl(strh vids/MJPG, strf)) + movi with '00dc' chunks)."""
    import struct

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b"")

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    us_pf = 1_000_000 * fps[1] // fps[0]
    avih = struct.pack("<14I", us_pf, 0, 0, 0, len(jpegs), 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    # flags, wPriority, wLanguage, dwInitialFrames, dwScale, dwRate,
    # dwStart, dwLength, dwSuggestedBufferSize, dwQuality, dwSampleSize
    strh = (b"vids" + b"MJPG"
            + struct.pack("<I2H8I", 0, 0, 0, 0, fps[1], fps[0],
                          0, len(jpegs), 0, 0, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<I2i2H2I2i2I", 40, width, height, 1, 24,
                       0x47504A4D, width * height * 3, 0, 0, 0, 0)  # 'MJPG'
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def y4m_from_planes(planes, width: int, height: int,
                    fps=(25, 1), colorspace: str = "444") -> bytes:
    """Encode raw YCbCr plane tuples into Y4M bytes (test/fixture
    helper, the video analogue of solid_jpeg). `planes` is a list of
    frames; each frame is (Y,) for mono or (Y, Cb, Cr) byte-like planes
    already at the colorspace's plane sizes."""
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    out = [head.encode("ascii")]
    for frame in planes:
        out.append(b"FRAME\n")
        for p in frame:
            out.append(bytes(p))
    return b"".join(out)


def solid_y4m(yccs, width: int = 8, height: int = 6, fps=(25, 1),
              colorspace: str = "420jpeg") -> bytes:
    """Y4M clip of solid-color frames: one (y, cb, cr) triple per frame."""
    cw, ch = (width + 1) // 2, (height + 1) // 2
    if colorspace.startswith("420"):
        cdims = cw * ch
    elif colorspace.startswith("422"):
        cdims = cw * height
    elif colorspace.startswith("444"):
        cdims = width * height
    else:
        raise ValueError(colorspace)
    frames = [
        (bytes([y]) * (width * height), bytes([cb]) * cdims, bytes([cr]) * cdims)
        for y, cb, cr in yccs
    ]
    return y4m_from_planes(frames, width, height, fps, colorspace)


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
                        "only BMP/PPM/JPEG (baseline + progressive)/"
                        "8-bit-PNG (incl. Adam7) decode without external "
                        "codecs; 16-bit PNG and arithmetic JPEG need PIL "
                        "(not in this container) — pass fake=True for the "
                        "deterministic stub or on_error='skip' to drop "
                        "undecodable rows"
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
    (media_id, frame_idx, frame_ts_ms, frame: binary).

    Y4M (YUV4MPEG2) blobs decode for REAL: the clip's fps maps each
    sample timestamp (every `every_ms` across the true duration) to its
    source frame, which is decoded to RGB and re-emitted as PPM (P6)
    binary — so sampled frames feed directly into decode_image_features
    / resize_images / near-media search. Compressed containers (MP4/
    WebM) would need ffmpeg (not in this container): those rows are
    skipped, or with ``fake=True`` emit the legacy md5-derived
    pseudo-frames for a fake 5-second clip (Y4M still decodes for real
    under fake=True)."""
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
                data = bytes(data)
                parsed = _y4m_parse(data)
                avi = None if parsed is not None else _avi_parse(data)
                if parsed is not None or (avi is not None and avi[1]):
                    if parsed is not None:
                        info, offsets = parsed
                        frame_of = lambda i: _y4m_frame_rgb(data, info, offsets[i])  # noqa: E731
                    else:
                        info, offsets = avi
                        frame_of = lambda i: _avi_frame_rgb(data, info, offsets[i])  # noqa: E731
                    if not offsets:
                        continue
                    ppm_head = f"P6\n{info['width']} {info['height']}\n255\n".encode()
                    for idx, ts in enumerate(range(0, info["duration_ms"], every_ms)):
                        src = min(len(offsets) - 1,
                                  ts * info["fps_num"] // (1000 * info["fps_den"]))
                        rgb = frame_of(src)
                        if rgb is None:
                            continue  # undecodable frame: drop, never kill
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(idx)
                        rows["frame_ts_ms"].append(ts)
                        rows["frame"].append(ppm_head + rgb.tobytes())
                    continue
                if not fake:
                    continue  # unknown container: skip, never kill the pass
                duration_ms = 5000
                for idx, ts in enumerate(range(0, duration_ms, every_ms)):
                    frame = hashlib.md5(data + ts.to_bytes(8, "little")).digest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(_sample, schema)


IMU_MAGIC = b"IMU1"


def decode_imu_info(data: bytes):
    """Decode the canonical IMU blob: b"IMU1" + u32 sample_rate_hz +
    u32 n_samples + n*3 float32 LE (ax, ay, az interleaved) — the
    opaque-sensor-blob shape of the reference's near_imu input
    (search_get.proto NearIMUSearch: base64 sensor payload; the bind
    module treats it as an opaque modality). Returns sample-rate /
    count / duration plus per-axis RMS and mean magnitude, or None for
    non-IMU or truncated bytes."""
    import struct

    import numpy as np

    if data[:4] != IMU_MAGIC or len(data) < 12:
        return None
    rate, n = struct.unpack_from("<II", data, 4)
    if rate == 0 or n == 0 or len(data) < 12 + n * 12:
        return None
    arr = np.frombuffer(data, dtype="<f4", count=n * 3, offset=12)
    xyz = arr.reshape(n, 3).astype(np.float64)
    rms = np.sqrt((xyz * xyz).mean(axis=0))
    mag = np.sqrt((xyz * xyz).sum(axis=1))
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "duration_ms": int(n * 1000 // rate),
        "rms": [float(v) for v in rms],
        "mean_magnitude": float(mag.mean()),
    }


def imu_blob(samples, sample_rate: int = 100) -> bytes:
    """Fixture writer for the canonical IMU blob."""
    import struct

    import numpy as np

    xyz = np.asarray(samples, dtype="<f4").reshape(-1, 3)
    return (
        IMU_MAGIC + struct.pack("<II", sample_rate, xyz.shape[0])
        + xyz.tobytes()
    )


def near_media_vector(data: bytes, dim: int = 8) -> list[float]:
    """Query-side near-media (nearImage/nearAudio, modules/img2vec &
    multi2vec query path): decode the query blob with the REAL codecs
    and produce the same feature vector the ingest side computes, so
    query and corpus share one space. BMP/PPM/JPEG/PNG -> pooled-
    grayscale image feature; Y4M video -> image feature of the middle
    frame (nearVideo, modules/multi2vec video path); WAV ->
    [sample_rate/48k, channels/2, log-duration, rms/2^15,
    zero-crossing] padded to `dim`."""
    img = decode_image_array(data)
    if img is not None:
        return _image_feature(img, dim)
    y4m = _y4m_parse(data)
    if y4m is not None and y4m[1]:
        info, offsets = y4m
        mid = _y4m_frame_rgb(data, info, offsets[len(offsets) // 2])
        return _image_feature(mid, dim)
    avi = _avi_parse(data)
    if avi is not None and avi[1]:
        info, frames = avi
        mid = _avi_frame_rgb(data, info, frames[len(frames) // 2])
        if mid is not None:
            return _image_feature(mid, dim)
    imu = decode_imu_info(data)
    if imu is not None:
        import math

        feat = [
            imu["sample_rate"] / 1000.0,
            math.log1p(imu["duration_ms"]) / 10.0,
            *imu["rms"],
            imu["mean_magnitude"],
        ]
        return [float(x) for x in (feat + [0.0] * dim)[:dim]]
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

    q = lit_double_array(near_media_vector(query_blob, dim))
    feats = decode_media_features(df, id_col, media_col, dim=dim)
    return (
        feats.where(F.col("decode_ok"))
        .withColumn("_distance", F.round(distance(F.col("feature"), q, "cosine"), 6))
        .orderBy(F.col("_distance").asc(), F.col("media_id").asc())
        .limit(limit)
        .select("media_id", "_distance")
    )


# Adam7 pass layout: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, pos: int, w: int, h: int, channels: int):
    """Unfilter one (sub-)image of `h` scanlines of `w` pixels starting
    at `pos` in the inflated stream (RFC 2083 filters None/Sub/Up/
    Average/Paeth). Returns ((h, w*channels) uint8 array, next pos);
    raises ValueError on truncation or an unknown filter type."""
    import numpy as np

    stride = w * channels
    if len(raw) < pos + h * (stride + 1):
        raise ValueError("truncated image data")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel (8-bit depth)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos + 1).astype(np.int32)
        pos += stride + 1
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out, pos


def _decode_png(data: bytes):
    """PNG decode via stdlib zlib (public RFC 2083): chunk parse,
    inflate, per-scanline unfilter (None/Sub/Up/Average/Paeth), 8-bit
    gray / RGB / palette / gray+alpha / RGBA, both non-interlaced and
    Adam7 interlaced (each of the seven passes is an independently
    filtered sub-image scattered back on its pass grid). Alpha is
    dropped (media features read color planes)."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln, ctype = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk)
            if depth != 8 or comp != 0 or filt != 0 or interlace not in (0, 1):
                return None
            ihdr = (w, h, color, interlace)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        return None
    w, h, color, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None or (color == 3 and palette is None):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    try:
        if interlace == 0:
            out, _ = _png_unfilter(raw, 0, w, h, channels)
        else:  # Adam7
            out = np.zeros((h, w * channels), dtype=np.uint8)
            px_view = out.reshape(h, w, channels)
            rpos = 0
            for x0, y0, xs, ys in _ADAM7:
                pw = (w - x0 + xs - 1) // xs
                ph = (h - y0 + ys - 1) // ys
                if pw <= 0 or ph <= 0:
                    continue  # empty pass has no bytes at all
                sub, rpos = _png_unfilter(raw, rpos, pw, ph, channels)
                px_view[y0::ys, x0::xs] = sub.reshape(ph, pw, channels)
    except ValueError:
        return None
    px = out.reshape(h, w, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px.copy()
    if color == 3:
        return palette[px[:, :, 0]]
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGBA -> RGB


# ---------------------------------------------------------------------------
# Minimal baseline-JPEG WRITER for fixtures/tests: solid-color 16x16
# 4:2:0 images built from DC-only blocks (every byte hand-placed, so
# decoder tests can assert exact pixel values computed by hand).

def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


_JPEG_DC_COUNTS = [0, 0, 4] + [0] * 13     # four 3-bit codes
_JPEG_DC_SYMS = [0, 2, 4, 5]               # -> categories 0/2/4/5
_JPEG_AC_COUNTS = [1] + [0] * 15           # one 1-bit code
_JPEG_AC_SYMS = [0x00]                     # EOB


def _jpeg_dc_bits(v: int) -> str:
    if v == 0:
        return "000"
    n = abs(v)
    cat = n.bit_length()
    code = {2: "001", 4: "010", 5: "011"}[cat]
    vb = format(v if v > 0 else (1 << cat) - 1 + v, f"0{cat}b")
    return code + vb


def solid_jpeg(y_dc: int, cb_dc: int, cr_dc: int) -> bytes:
    """16x16 4:2:0 baseline JPEG whose decoded planes are exactly
    Y = 2*y_dc + 128, Cb = 2*cb_dc + 128, Cr = 2*cr_dc + 128 (flat
    quant table of 16s, DC-only blocks). DC values must fall in
    categories {0,2,4,5} (0, ±2..3, ±8..15, ±16..31)."""
    data = b"\xff\xd8"
    data += _jpeg_seg(0xDB, bytes([0]) + bytes([16] * 64))
    data += _jpeg_seg(0xDB, bytes([1]) + bytes([16] * 64))
    data += _jpeg_seg(
        0xC0,
        bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    data += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMS))
    data += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMS))
    data += _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bits = _jpeg_dc_bits(y_dc) + "0"
    for _ in range(3):
        bits += _jpeg_dc_bits(0) + "0"       # Y blocks 2-4: diff 0
    bits += _jpeg_dc_bits(cb_dc) + "0"
    bits += _jpeg_dc_bits(cr_dc) + "0"
    while len(bits) % 8:
        bits += "1"
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i:i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return data + bytes(out) + b"\xff\xd9"


def _jpeg_entropy_bytes(bits: str) -> bytes:
    while len(bits) % 8:
        bits += "1"
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i:i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def solid_jpeg_progressive(y_dc: int, cb_dc: int, cr_dc: int) -> bytes:
    """16x16 4:2:0 PROGRESSIVE (SOF2) JPEG decoding to the same solid
    color as solid_jpeg(y_dc, cb_dc, cr_dc): scan 1 is an interleaved
    DC-first pass at successive-approximation Al=1 carrying v>>1, scan 2
    is the DC refinement pass carrying the low bit (v & 1). DC halves
    must fall in huffman categories {0,2,4,5}."""
    data = b"\xff\xd8"
    data += _jpeg_seg(0xDB, bytes([0]) + bytes([16] * 64))
    data += _jpeg_seg(0xDB, bytes([1]) + bytes([16] * 64))
    data += _jpeg_seg(
        0xC2,
        bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    data += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMS))
    # scan 1: DC first, all three components interleaved, Al=1
    data += _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    bits = _jpeg_dc_bits(y_dc >> 1)
    for _ in range(3):
        bits += _jpeg_dc_bits(0)             # Y blocks 2-4: diff 0
    bits += _jpeg_dc_bits(cb_dc >> 1)
    bits += _jpeg_dc_bits(cr_dc >> 1)
    data += _jpeg_entropy_bytes(bits)
    # scan 2: DC refinement (one raw bit per block, MCU order), Ah=1 Al=0
    data += _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    # every Y block holds the same (accumulated) DC, so each of the four
    # needs the same low bit
    refine = str(y_dc & 1) * 4 + str(cb_dc & 1) + str(cr_dc & 1)
    data += _jpeg_entropy_bytes(refine)
    return data + b"\xff\xd9"


AUDIO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
])


def decode_wav_samples(data: bytes):
    """PCM WAV bytes -> mono float64 samples normalized to [-1, 1)
    (int16 /2^15, uint8 (x-128)/2^7, int32 /2^31; channels averaged)."""
    import io
    import wave as wave_mod

    import numpy as np

    with wave_mod.open(io.BytesIO(data)) as wf:
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(1 << (width * 8 - 1))
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x


def audio_frame_features(
    df: DataFrame, id_col: str, media_col: str, frame_samples: int = 400
) -> DataFrame:
    """Frame-level audio analysis over PCM WAV blobs: non-overlapping
    ``frame_samples`` windows, per frame the RMS level (normalized
    amplitude) and zero-crossing rate — the silence-detection /
    speech-segmentation primitive an audio training pipeline runs
    before trimming or chunking (low-RMS frames = silence, ZCR
    separates voiced/unvoiced). REAL decode (stdlib ``wave``),
    Arrow-batched mapInPandas; undecodable rows yield zero frames
    instead of failing the pass.

    Returns (id, frame_idx, n_samples, rms, zcr) rounded to 6dp; zcr =
    fraction of consecutive-sample sign changes within the frame
    (n-1 denominator), matching decode_wav_info's whole-file ZCR."""
    import numpy as np

    def _frames(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            out = {k.name: [] for k in AUDIO_FRAME_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                try:
                    x = decode_wav_samples(bytes(data)) if data else None
                except Exception:
                    x = None
                if x is None:
                    continue
                for fi in range(0, max((len(x) + frame_samples - 1), 1) // frame_samples):
                    w = x[fi * frame_samples:(fi + 1) * frame_samples]
                    if not len(w):
                        continue
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["n_samples"].append(len(w))
                    out["rms"].append(round(float(np.sqrt((w ** 2).mean())), 6))
                    out["zcr"].append(
                        round(float((np.diff(np.signbit(w)) != 0).mean()), 6)
                        if len(w) > 1 else 0.0
                    )
            yield pd.DataFrame(out)

    return (
        df.select(F.col(id_col).alias(id_col), F.col(media_col))
        .mapInPandas(_frames, AUDIO_FRAME_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Perceptual-hash image near-dup (dHash)

DHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("dhash", T.LongType()),
    T.StructField("n_bits", T.IntegerType()),
    T.StructField("decode_ok", T.BooleanType()),
])


def image_dhash(
    df: DataFrame,
    id_col: str,
    media_col: str,
    batch_size: int = 256,
) -> DataFrame:
    """Difference hash over REAL image decode: per image, one bit per
    horizontally adjacent pixel pair — bit = 1 iff the left pixel's
    integer gray sum (r+g+b) is LESS than its right neighbor's. Pure
    integer comparisons, so the hash is exactly reproducible from the
    pixel bytes by any engine (no float gray conversion). For an h x w
    image the hash has h*(w-1) bits, row-major, bit k = row*(w-1)+col.

    The standard perceptual-hash near-dup primitive for image corpora
    (brightness/contrast shifts preserve most orderings, so edited
    copies land within a small Hamming distance). Arrow-batched
    mapInPandas over the binary column; undecodable rows emit
    decode_ok=False rather than failing the pass."""

    def _hash(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in iterator:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                hashes, nbits, oks = [], [], []
                for data in chunk[media_col]:
                    img = (
                        decode_image_array(bytes(data))
                        if data is not None and len(data) > 0
                        else None
                    )
                    if img is None:
                        hashes.append(None)
                        nbits.append(None)
                        oks.append(False)
                        continue
                    gs = img.astype(np.int64).sum(axis=2)  # (h, w) gray sums
                    bits = (gs[:, :-1] < gs[:, 1:]).ravel()  # row-major
                    h = 0
                    for k, b in enumerate(bits):
                        if b:
                            h |= 1 << k
                    hashes.append(h)
                    nbits.append(int(bits.size))
                    oks.append(True)
                yield pd.DataFrame({
                    "media_id": chunk[id_col].values,
                    "dhash": pd.array(hashes, dtype="Int64"),
                    "n_bits": pd.array(nbits, dtype="Int32"),
                    "decode_ok": oks,
                })

    return df.select(id_col, media_col).mapInPandas(_hash, DHASH_SCHEMA)


def dhash_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    n_bits: int = 20,
    max_hamming: int = 2,
) -> DataFrame:
    """(media_a, media_b, hamming) for every pair within ``max_hamming``
    bit flips — EXACT, via pigeonhole LSH banding: the hash splits into
    ``max_hamming + 1`` disjoint bit bands, and any pair within budget
    must agree on at least one band, so the band-equality join has
    recall 1 (no probabilistic miss, unlike minhash banding). Bucket
    join + exact Hamming rescore + distinct — one shuffle on the
    (band, value) key, never all-pairs; uniform hashes spread buckets,
    and the same ``max_bucket_size``-style skew logic as simhash
    applies if a degenerate corpus (all-identical images) ever
    concentrates one bucket."""
    from weaviate_spark.cache import register_checkpoint

    bands = max_hamming + 1
    width = -(-n_bits // bands)  # ceil
    # The hash frame is referenced (bands x 2 join sides) times below;
    # without truncation each reference re-executes its lineage — for
    # the image pipeline that meant SIX repeated Arrow decode passes
    # over the media column (measured: 12 parquet scans, 6 MapInPandas
    # nodes in one executed plan). Checkpoint the narrow (id, hash)
    # projection once: decode runs a single time, and every band/side
    # reads the two-column leaf (guide §8: decide on small rows; never
    # re-derive them from the heavy payload per consumer).
    h = register_checkpoint(
        hashes.where(F.col(hash_col).isNotNull()).select(
            F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
        )
    )
    parts = []
    for b in range(bands):
        lo = b * width
        w = min(width, n_bits - lo)
        if w <= 0:
            break
        parts.append(
            h.select(
                "_id",
                "_h",
                F.lit(b).alias("_band"),
                F.shiftright(F.col("_h"), lo).bitwiseAND(
                    F.lit((1 << w) - 1)
                ).alias("_key"),
            )
        )
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    a, b_ = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._key") == F.col("b._key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("media_a"),
            F.col("b._id").alias("media_b"),
            F.expr("bit_count(a._h ^ b._h)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


AUDIO_BAND_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("freq_hz", T.DoubleType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("energy", T.DoubleType()),
])


def audio_band_energy(
    df: DataFrame,
    id_col: str,
    media_col: str,
    freqs_hz: Sequence[float],
    frame_samples: int = 400,
) -> DataFrame:
    """Per-frame spectral energy at the probe frequencies — the
    tone/voicing detector an audio pipeline runs after the RMS/ZCR
    pass (audio_frame_features): for each non-overlapping frame and
    each probe frequency f, the normalized DFT-bin power

        E = [ (sum_n x_n cos(2*pi*f*n/sr))^2
            + (sum_n x_n sin(2*pi*f*n/sr))^2 ] / N^2

    with n the frame-local sample index and sr from the WAV header.
    The direct two-sum form (not an FFT, not the Goertzel recurrence)
    is chosen deliberately: it is a plain weighted aggregation, so any
    engine can reproduce it exactly — the contract oracle regenerates
    the signal and evaluates the same sums in SQL. A sine at f shows
    E ~ (amp/2)^2 in its own bin and ~0 elsewhere.

    REAL decode (stdlib ``wave``), Arrow-batched mapInPandas, narrow
    (no shuffle); per-row decode failures drop the row, never the
    pass."""
    import numpy as np

    probe = [float(f) for f in freqs_hz]

    def _bands(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            out = {k.name: [] for k in AUDIO_BAND_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                try:
                    blob = bytes(data) if data else None
                    x = decode_wav_samples(blob) if blob else None
                    sr = decode_wav_info(blob)["sample_rate"] if blob else None
                except Exception:
                    x = None
                if x is None or not sr:
                    continue
                nf = max(len(x) + frame_samples - 1, 1) // frame_samples
                for fi in range(nf):
                    w = x[fi * frame_samples:(fi + 1) * frame_samples]
                    if not len(w):
                        continue
                    n = np.arange(len(w), dtype=np.float64)
                    for f in probe:
                        ang = 2.0 * np.pi * f * n / sr
                        c = float((w * np.cos(ang)).sum())
                        s = float((w * np.sin(ang)).sum())
                        out["media_id"].append(mid)
                        out["frame_idx"].append(fi)
                        out["freq_hz"].append(f)
                        out["n_samples"].append(len(w))
                        out["energy"].append(
                            round((c * c + s * s) / (len(w) * len(w)), 6)
                        )
            yield pd.DataFrame(out)

    return (
        df.select(F.col(id_col).alias(id_col), F.col(media_col))
        .mapInPandas(_bands, AUDIO_BAND_SCHEMA)
    )


SCENE_CUT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("mad", T.DoubleType()),
    T.StructField("scene_cut", T.BooleanType()),
])


def video_scene_cuts(
    df: DataFrame,
    id_col: str,
    media_col: str,
    threshold: float = 48.0,
) -> DataFrame:
    """Shot-boundary detection over real video decode: for every
    consecutive frame pair the mean absolute pixel difference (MAD,
    over all RGB samples), flagged as a scene cut when it exceeds
    ``threshold`` — the frame-sampling pipeline's segmentation step (a
    training pipeline samples per SHOT, not per fixed stride, so one
    long static shot doesn't dominate). Y4M and MJPEG-AVI containers
    route by magic bytes to the same pure-numpy codecs the rest of the
    video path uses. Arrow-batched mapInPandas, narrow; rows start at
    frame_idx 1 (the diff against the previous frame); undecodable
    blobs contribute no rows."""
    import numpy as np

    thr = float(threshold)

    def _cuts(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            out = {k.name: [] for k in SCENE_CUT_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                try:
                    blob = bytes(data) if data else None
                    if not blob:
                        continue
                    if blob[:9] == b"YUV4MPEG2":
                        info = decode_y4m_info(blob)
                        frames = [
                            decode_y4m_frame_rgb(blob, i)
                            for i in range(info["n_frames"])
                        ]
                    elif blob[:4] == b"RIFF":
                        info = decode_avi_info(blob)
                        frames = [
                            decode_avi_frame_rgb(blob, i)
                            for i in range(info["n_frames"])
                        ]
                    else:
                        continue
                except Exception:
                    continue
                prev = None
                for fi, img in enumerate(frames):
                    if img is None:
                        prev = None
                        continue
                    cur = img.astype(np.int64)
                    if prev is not None and prev.shape == cur.shape:
                        mad = round(
                            float(np.abs(cur - prev).mean()), 6
                        )
                        out["media_id"].append(mid)
                        out["frame_idx"].append(fi)
                        out["mad"].append(mad)
                        out["scene_cut"].append(mad > thr)
                    prev = cur
            yield pd.DataFrame(out)

    return (
        df.select(F.col(id_col).alias(id_col), F.col(media_col))
        .mapInPandas(_cuts, SCENE_CUT_SCHEMA)
    )


IMG_QUALITY_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_pixels", T.IntegerType()),
    T.StructField("mean_gray", T.DoubleType()),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("entropy", T.DoubleType()),
    T.StructField("dominant_bin", T.IntegerType()),
    T.StructField("decode_ok", T.BooleanType()),
])


def image_quality_stats(
    df: DataFrame,
    id_col: str,
    media_col: str,
    batch_size: int = 256,
) -> DataFrame:
    """Per-image quality statistics from REAL decode: mean and
    population std of the integer gray sums (r+g+b per pixel), Shannon
    entropy of the 8-bin gray histogram (bin = min(gs // 96, 7) — pure
    integer binning over the 0..765 gray-sum range), and the dominant
    bin (argmax count, lowest bin on ties). The flat/blank-image and
    low-information filter of an image-corpus curation pipeline: a
    screenshot of a solid color has entropy ~0; natural photos spread
    across bins.

    Exactness contract (what lets an analytic SQL oracle replay it):
    mean/std come from integer moment sums in fixed-order double
    expressions; each histogram term p*ln(p) is rounded to 6dp and
    accumulated in exact integer micro-units, so the entropy is
    order-invariant. Arrow-batched mapInPandas; undecodable rows emit
    decode_ok=False rather than failing the scan."""

    def _stats(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in iterator:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                out = {k: [] for k in ("n_pixels", "mean_gray", "std_gray",
                                       "entropy", "dominant_bin", "decode_ok")}
                for data in chunk[media_col]:
                    img = (
                        decode_image_array(bytes(data))
                        if data is not None and len(data) > 0
                        else None
                    )
                    if img is None:
                        for k in out:
                            out[k].append(False if k == "decode_ok" else None)
                        continue
                    gs = img.astype(np.int64).sum(axis=2).ravel()
                    n = int(gs.size)
                    s1 = int(gs.sum())
                    s2 = int((gs * gs).sum())
                    mean = round(s1 / n, 6)
                    var = (s2 - s1 * s1 / n) / n
                    std = round(math.sqrt(max(var, 0.0)), 6)
                    counts = np.bincount(
                        np.minimum(gs // 96, 7).astype(np.int64), minlength=8
                    )
                    acc = 0  # exact micro-unit accumulator
                    for c in counts:
                        if c > 0:
                            t = round((c / n) * math.log(c / n), 6)
                            acc += int(round(t * 1e6))
                    entropy = -acc / 1e6
                    dom = int(np.argmax(counts))
                    out["n_pixels"].append(n)
                    out["mean_gray"].append(mean)
                    out["std_gray"].append(std)
                    out["entropy"].append(entropy)
                    out["dominant_bin"].append(dom)
                    out["decode_ok"].append(True)
                yield pd.DataFrame({
                    "media_id": chunk[id_col].values,
                    "n_pixels": pd.array(out["n_pixels"], dtype="Int32"),
                    "mean_gray": pd.array(out["mean_gray"], dtype="Float64"),
                    "std_gray": pd.array(out["std_gray"], dtype="Float64"),
                    "entropy": pd.array(out["entropy"], dtype="Float64"),
                    "dominant_bin": pd.array(out["dominant_bin"], dtype="Int32"),
                    "decode_ok": out["decode_ok"],
                })

    return df.select(id_col, media_col).mapInPandas(_stats, IMG_QUALITY_SCHEMA)


def audio_silence_runs(
    df: DataFrame,
    id_col: str,
    media_col: str,
    frame_samples: int = 400,
    rms_threshold: float = 0.01,
) -> DataFrame:
    """Silence-run detection over real PCM decode: frame-level RMS
    (audio_frame_features — Arrow-batched WAV decode), threshold at
    ``rms_threshold``, then gaps-and-islands over consecutive silent
    frames. One row per silent run: (media_id, run_start, run_frames)
    — the trim/segmentation primitive of an audio curation pipeline
    (leading/trailing silence, long dead air inside a clip).

    Determinism: frame RMS is already 6dp-rounded by the feature
    kernel, so the threshold comparison — and therefore the island
    structure — is engine-portable; island arithmetic is all-integer."""
    from pyspark.sql import Window

    frames = audio_frame_features(
        df, id_col, media_col, frame_samples=frame_samples
    )
    silent = frames.where(
        F.col("rms") < F.lit(float(rms_threshold))
    ).select("media_id", "frame_idx")
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    isl = silent.withColumn(
        "_grp", F.col("frame_idx") - F.row_number().over(w)
    )
    return isl.groupBy("media_id", "_grp").agg(
        F.min("frame_idx").cast("long").alias("run_start"),
        F.count(F.lit(1)).cast("long").alias("run_frames"),
    ).select("media_id", "run_start", "run_frames")


# ---------------------------------------------------------------------------
# GIF decode, pure python/numpy (public GIF89a spec + the LZW variant it
# mandates: LSB-first variable-width codes, clear/EOI, 12-bit cap).
# Real web corpora carry GIFs alongside JPEG/PNG; the container has no
# PIL, so the format is implemented for real: header + logical screen
# descriptor, global/local color tables, extension-block skipping
# (graphic control delay is surfaced), multi-frame image descriptors,
# the 4-pass GIF row interlace, and full LZW with dictionary growth,
# rebuild-after-clear, and the kwkwk self-referencing-code case.
# The paired writer exists so tests and synthetic corpora can build
# bit-exact inputs without external tools (same role as avi_from_jpegs).

def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    growing when the table fills, capped at 12 bits until a clear code
    rebuilds it. Returns exactly `expected` index bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base_n = clear + 2
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i: byte_i + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            del table[base_n:]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]          # the kwkwk case
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < expected:
        raise ValueError("GIF LZW: truncated stream")
    return bytes(out[:expected])


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Standard GIF LZW encoder (the decoder's exact mirror: same
    growth rule, clear-and-rebuild when the 12-bit table fills)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wb] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                # the decoder grows when ITS table (one entry behind)
                # reaches 2^size; from here our emitted codes may be
                # next_code-1 == 2^size, which needs the wider width
                code_size += 1
        else:
            emit(clear, code_size)
            table = fresh()
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(height: int) -> list:
    rows = []
    for start, step in _GIF_INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def _gif_parse(data: bytes):
    """Parse the container: returns (width, height, gct, frames) where
    frames = [(left, top, w, h, interlaced, palette, min_code_size,
    lzw_bytes, delay_ms)]."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", data, 6)
    packed, _bg, _aspect = struct.unpack_from("<BBB", data, 10)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos: pos + 3 * n]
        pos += 3 * n
    frames = []
    delay_ms = 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:                       # trailer
            break
        if b0 == 0x21:                       # extension
            label = data[pos]
            pos += 1
            while True:
                size = data[pos]
                if label == 0xF9 and size >= 3:
                    delay_ms = struct.unpack_from(
                        "<H", data, pos + 2)[0] * 10
                pos += 1 + size
                if size == 0:
                    break
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = data[pos: pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without a color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            size = data[pos]
            pos += 1
            if size == 0:
                break
            lzw += data[pos: pos + size]
            pos += size
        frames.append((left, top, fw, fh, bool(fpacked & 0x40), pal,
                       min_code_size, bytes(lzw), delay_ms))
        delay_ms = 0
    return w, h, gct, frames


def decode_gif_info(data: bytes) -> dict:
    """Metadata-only parse (no LZW work — the 'metadata queries never
    touch pixel bytes' rule): screen size, frame count, per-frame
    delays, palette size."""
    w, h, gct, frames = _gif_parse(data)
    return {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "palette_size": (len(gct) // 3) if gct else 0,
        "delays_ms": [f[8] for f in frames],
        "interlaced": any(f[4] for f in frames),
        "version": data[3:6].decode("ascii"),
    }


def decode_gif_frame_rgb(data: bytes, frame_idx: int):
    """REAL decode of one frame to a numpy (h, w, 3) uint8 array:
    LZW-expand the index stream, undo the 4-pass row interlace if
    flagged, map through the frame's color table. Frames are decoded
    standalone (no disposal compositing — each synthetic/test frame is
    full-size, and per-frame pixels are what the feature kernels want)."""
    import numpy as np

    _w, _h, _gct, frames = _gif_parse(data)
    if not 0 <= frame_idx < len(frames):
        raise ValueError(f"GIF has {len(frames)} frames, not {frame_idx + 1}")
    _l, _t, fw, fh, interlaced, pal, mcs, lzw, _d = frames[frame_idx]
    idx = np.frombuffer(
        _gif_lzw_decode(lzw, mcs, fw * fh), dtype=np.uint8
    ).reshape(fh, fw)
    if interlaced:
        out = np.empty_like(idx)
        out[_gif_interlace_order(fh), :] = idx
        idx = out
    palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    if idx.max() >= len(palette):
        raise ValueError("GIF index outside color table")
    return palette[idx]


def gif_from_frames(frames, palette: bytes, delay_ms: int = 100,
                    interlaced: bool = False) -> bytes:
    """Encode index-array frames (each a (h, w) uint8 numpy array or
    nested list, all the same size) into a GIF89a blob against one
    global color table. Deterministic — the test/synthetic-corpus
    counterpart of decode_gif_frame_rgb."""
    import math
    import struct

    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    n_colors = len(palette) // 3
    depth = max(1, math.ceil(math.log2(max(n_colors, 2))))
    pal = palette + b"\x00" * (3 * ((1 << depth) - n_colors))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += pal
    min_code_size = max(2, depth)
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all GIF frames must share one size")
        # GCE: introducer, label, size=4, packed, delay (1/100 s),
        # transparent index, block terminator
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_ms // 10, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlaced else 0)
        rows = f[_gif_interlace_order(h), :] if interlaced else f
        lzw = _gif_lzw_encode(rows.tobytes(), min_code_size)
        out.append(min_code_size)
        for i in range(0, len(lzw), 255):
            block = lzw[i: i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frame_stats(
    df: DataFrame, id_col: str = "media_id", media_col: str = "media"
) -> DataFrame:
    """Per-frame channel means over a binary GIF column via the real
    container parse + LZW decode (Arrow-batched mapInPandas iterator —
    one python worker init per batch, not per row). Undecodable blobs
    drop out (per-row codec failure must never kill a 100 TB pass).
    Means are (integer pixel sum / n_pixels) / 255 in IEEE double —
    the order the analytical oracles mirror."""
    import struct

    import pandas as pd

    def _kernel(iterator):
        for pdf in iterator:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                b = bytes(blob)
                try:
                    info = decode_gif_info(b)
                    for fi in range(info["n_frames"]):
                        rgb = decode_gif_frame_rgb(b, fi).astype("int64")
                        n = int(rgb.shape[0] * rgb.shape[1])
                        means = [
                            float(rgb[:, :, c].sum()) / n / 255.0
                            for c in range(3)
                        ]
                        rows.append((mid, fi, info["delays_ms"][fi], *means))
                except (ValueError, IndexError, KeyError,
                        struct.error, OverflowError):
                    # per-row codec failure must never kill a 100 TB
                    # pass — truncated headers raise struct.error from
                    # unpack_from, matching decode_image_array's tuple
                    continue
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_idx", "delay_ms",
                         "mean_r", "mean_g", "mean_b"],
            )

    return df.mapInPandas(
        _kernel,
        f"{id_col} long, frame_idx long, delay_ms long, "
        "mean_r double, mean_g double, mean_b double",
    )


# fixed 4-color table for synthetic GIF corpora (mirrored as literals
# in the analytical oracle)
GIF_TEST_PALETTE = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51])


def synth_gif_corpus(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deterministic 2-frame 4x4 GIF blobs from md5-derived palette
    indices (frame f pixels = bytes of md5(text || 'g<f+1>') mod 4 —
    the PPM corpus recipe, so DuckDB recomputes every index from its
    own md5()). Odd ids store interlaced, even ids sequential: the
    4-pass interlace path is exercised inside the hash-checked contract
    and must cancel exactly."""
    import hashlib

    import numpy as np
    import pandas as pd

    def _kernel(iterator):
        for pdf in iterator:
            out_ids, blobs = [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                frames = []
                for salt in ("g1", "g2"):
                    dig = hashlib.md5(
                        (str(text) + salt).encode("utf-8")).digest()
                    idx = (np.frombuffer(dig, dtype=np.uint8) % 4).reshape(4, 4)
                    frames.append(idx)
                blobs.append(gif_from_frames(
                    frames, GIF_TEST_PALETTE, delay_ms=100,
                    interlaced=bool(int(mid) % 2),
                ))
                out_ids.append(mid)
            yield pd.DataFrame({id_col: out_ids, "media": blobs})

    return df.mapInPandas(_kernel, f"{id_col} long, media binary")
