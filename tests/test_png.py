"""PNG decoder: exact-value tests. The test writes PNG bytes chunk by
chunk (stdlib zlib for the IDAT stream) with explicitly chosen filter
types per scanline, so every unfilter path is exercised against
hand-verifiable pixels."""

from __future__ import annotations

import struct
import zlib

import numpy as np

from weaviate_spark.operators.multimodal import decode_image_array


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        len(payload).to_bytes(4, "big") + ctype + payload
        + zlib.crc32(ctype + payload).to_bytes(4, "big")
    )


def _png(w, h, color, raw_scanlines, palette=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", bytes(palette))
    out += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    out += _chunk(b"IEND", b"")
    return out


def test_rgb_filters_exact():
    """2x2 RGB: row 0 Sub-filtered, row 1 Up-filtered — unfilter must
    reconstruct the exact chosen pixels."""
    # target pixels: row0 = (10,20,30), (13,24,35); row1 = (110,120,130), (114,125,137)
    row0 = bytes([1]) + bytes([10, 20, 30, 3, 4, 5])          # Sub: d = p[x]-p[x-3]
    row1 = bytes([2]) + bytes([100, 100, 100, 101, 101, 102]) # Up: d = p - prev_row
    img = decode_image_array(_png(2, 2, 2, row0 + row1))
    assert img is not None and img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[0, 1].tolist() == [13, 24, 35]
    assert img[1, 0].tolist() == [110, 120, 130]
    assert img[1, 1].tolist() == [114, 125, 137]


def test_average_and_paeth_filters():
    """Average (3) and Paeth (4) rows reconstruct known values."""
    # 2x2 grayscale. Row0: filter None, pixels 40, 80.
    # Row1 Average: recon[x] = line[x] + (a + b)//2
    #   want row1 = 60, 90 -> line[0] = 60 - (0+40)//2 = 40; line[1] = 90 - (60+80)//2 = 20
    # (a = left recon in same row, b = above)
    row0 = bytes([0, 40, 80])
    row1 = bytes([3, 40, 20])
    img = decode_image_array(_png(2, 2, 0, row0 + row1))
    assert img[:, :, 0].tolist() == [[40, 80], [60, 90]]

    # Paeth row: predictor of (a=left, b=up, c=up-left)
    # row1 want 50, 95: x=0: a=0,b=40,c=0 -> p=40, preds |p-a|=40,|p-b|=0,|p-c|=40 -> b=40; line=10
    #   x=1: a=50,b=80,c=40 -> p=90, pa=40,pb=10,pc=50 -> b=80; line=15
    row1p = bytes([4, 10, 15])
    img2 = decode_image_array(_png(2, 2, 0, row0 + row1p))
    assert img2[:, :, 0].tolist() == [[40, 80], [50, 95]]


def test_palette_and_alpha_variants():
    pal = [255, 0, 0, 0, 0, 255]                     # idx0 red, idx1 blue
    rows = bytes([0, 0, 1]) + bytes([0, 1, 0])       # 2x2 indexed
    img = decode_image_array(_png(2, 2, 3, rows, palette=pal))
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 0, 255]

    # RGBA: alpha dropped
    rows = bytes([0, 9, 8, 7, 128, 1, 2, 3, 0])
    img = decode_image_array(_png(2, 1, 6, rows))
    assert img[0, 0].tolist() == [9, 8, 7]
    assert img[0, 1].tolist() == [1, 2, 3]

    # gray+alpha
    rows = bytes([0, 200, 50, 100, 255])
    img = decode_image_array(_png(2, 1, 4, rows))
    assert img[0, 0].tolist() == [200, 200, 200]
    assert img[0, 1].tolist() == [100, 100, 100]


def test_unsupported_png_returns_none():
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    assert decode_image_array(bad) is None
    # interlaced header with NO image data still declines cleanly
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    assert decode_image_array(bad) is None
    # corrupt deflate stream
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    ) + _chunk(b"IDAT", b"garbage") + _chunk(b"IEND", b"")
    assert decode_image_array(out) is None


def test_png_feature_pipeline(spark):
    """PNG rows decode inside the Arrow-batched feature stage alongside
    other codecs."""
    from weaviate_spark.operators.multimodal import decode_image_features

    red = _png(2, 2, 2, bytes([0, 255, 0, 0, 255, 0, 0]) * 2)
    rows = [(1, bytearray(red)), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: (r["decode_ok"], r["feature"]) for r in
           decode_image_features(df, "media_id", "media", on_error="skip").collect()}
    assert got[1][0] is True and got[2][0] is False
    # channel means of a solid red image: feature[0]=1.0 (R), 0, 0
    assert abs(got[1][1][0] - 1.0) < 1e-6
    assert abs(got[1][1][1]) < 1e-6


# ---------------------------------------------------------------------------
# Adam7 interlaced decode: the test ENCODES a known image pass by pass
# (each pass an independently filtered sub-image) and asserts the
# decoder's deinterlaced output equals the original pixels exactly.

_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_encode(px: np.ndarray, filters_by_pass=None) -> bytes:
    """Serialize (h, w, c) uint8 pixels as an Adam7 IDAT stream with
    per-pass filter type 0 (or Sub=1 when requested)."""
    h, w, c = px.shape
    raw = bytearray()
    for pi, (x0, y0, xs, ys) in enumerate(_ADAM7):
        sub = px[y0::ys, x0::xs]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        ft = (filters_by_pass or {}).get(pi, 0)
        for y in range(ph):
            line = sub[y].reshape(-1).astype(np.int32)
            if ft == 1:  # Sub filter: d[x] = p[x] - p[x-bpp]
                shifted = np.concatenate([np.zeros(c, np.int32), line[:-c]])
                enc = (line - shifted) & 0xFF
            else:
                enc = line
            raw.append(ft)
            raw.extend(int(v) for v in enc)
    return bytes(raw)


def _png_interlaced(px: np.ndarray, color=2, filters_by_pass=None) -> bytes:
    h, w, c = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_adam7_encode(px, filters_by_pass)))
        + _chunk(b"IEND", b"")
    )


def test_adam7_rgb_exact():
    """9x9 RGB gradient (hits all seven passes, incl. edge-partial
    ones): deinterlaced output must equal the source exactly."""
    h = w = 9
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (y * 20 + x, 255 - x * 9, (x * y) % 256)
    img = decode_image_array(_png_interlaced(px))
    assert img is not None and img.shape == (9, 9, 3)
    assert (img == px).all()


def test_adam7_sub_filter_and_tiny_image():
    """Sub-filtered passes decode exactly; a 1x1 image exercises the
    six empty passes (which contribute zero bytes)."""
    px = (np.arange(8 * 10 * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(8, 10, 3)
    img = decode_image_array(_png_interlaced(px, filters_by_pass={i: 1 for i in range(7)}))
    assert img is not None and (img == px).all()

    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    img1 = decode_image_array(_png_interlaced(one))
    assert img1 is not None and img1.shape == (1, 1, 3)
    assert (img1[0, 0] == [7, 8, 9]).all()


def test_adam7_gray_and_truncated():
    """Grayscale Adam7 replicates to 3 channels; a truncated pass
    stream returns None rather than a partial image."""
    px = (np.arange(25, dtype=np.uint8) * 9).reshape(5, 5, 1)
    img = decode_image_array(_png_interlaced(px, color=0))
    assert img is not None and img.shape == (5, 5, 3)
    assert (img[:, :, 0] == px[:, :, 0]).all() and (img[:, :, 1] == px[:, :, 0]).all()

    full = _adam7_encode(np.repeat(px, 1, axis=2))
    ihdr = struct.pack(">IIBBBBB", 5, 5, 8, 0, 0, 0, 1)
    bad = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(full[: len(full) // 2]))
        + _chunk(b"IEND", b"")
    )
    assert decode_image_array(bad) is None
