"""Baseline-sequential JPEG decoder: exact-value tests on hand-crafted
bitstreams (every marker/bit placed by the test, expected pixels computed
by hand or from the closed-form IDCT definition — no codec round-trip)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from weaviate_spark.operators.multimodal import (
    decode_image_array,
    solid_jpeg,
)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht(tc, th, counts, symbols):
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols))


def _bits_to_bytes(bits):
    while len(bits) % 8:
        bits += "1"
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i:i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


DC_COUNTS = [0, 0, 4] + [0] * 13
DC_SYMS = [0, 2, 4, 5]          # categories, codes 000/001/010/011


def _dc_bits(v):
    if v == 0:
        return "000"
    cat = abs(v).bit_length()
    code = {2: "001", 4: "010", 5: "011"}[cat]
    return code + format(v if v > 0 else (1 << cat) - 1 + v, f"0{cat}b")


def _gray_header(w, h, ac_counts, ac_syms):
    data = b"\xff\xd8"
    data += _seg(0xDB, bytes([0]) + bytes([16] * 64))
    data += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                 + bytes([1, 1, 0x11, 0]))
    data += _dht(0, 0, DC_COUNTS, DC_SYMS)
    data += _dht(1, 0, ac_counts, ac_syms)
    data += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return data


def test_gray_dc_only_exact():
    """Single 8x8 DC-only block: F(0,0) = 10*16 -> every pixel exactly
    2*10 + 128 = 148 (only the cos(0) basis term contributes)."""
    data = _gray_header(8, 8, [1] + [0] * 15, [0x00])
    data += _bits_to_bytes(_dc_bits(10) + "0")  # DC cat4=1010, AC EOB
    data += b"\xff\xd9"
    img = decode_image_array(data)
    assert img.shape == (8, 8, 3)
    assert (img == 148).all()


def test_gray_single_ac_exact():
    """One AC coefficient (zigzag 1 -> F(0,1) horizontal wave): pixels
    must equal the closed-form IDCT evaluated per column."""
    # AC table: '00' -> EOB, '01' -> (run 0, size 3)
    data = _gray_header(8, 8, [0, 2] + [0] * 14, [0x00, 0x03])
    bits = _dc_bits(0) + "01" + "101" + "00"  # DC 0; AC +5 (3 bits); EOB
    data += _bits_to_bytes(bits)
    data += b"\xff\xd9"
    img = decode_image_array(data)
    assert img is not None
    coef = 5 * 16
    for x in range(8):
        expect = (coef * math.sqrt(0.5) * 0.5 * 0.5
                  * math.cos((2 * x + 1) * math.pi / 16)) + 128
        expect = int(np.clip(round(expect), 0, 255))
        col = img[:, x, 0]
        assert (col == expect).all(), (x, expect, col)


def test_color_420_exact_and_fixture_writer():
    """solid_jpeg: 4:2:0 three-component decode hits the exact JFIF
    YCbCr->RGB conversion of the hand-placed DC values."""
    img = decode_image_array(solid_jpeg(20, -12, 8))
    assert img.shape == (16, 16, 3)
    Y, Cb, Cr = 168.0, 104.0, 144.0
    r = round(Y + 1.402 * (Cr - 128))
    g = round(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128))
    b = round(Y + 1.772 * (Cb - 128))
    assert (img[:, :, 0] == r).all()
    assert (img[:, :, 1] == g).all()
    assert (img[:, :, 2] == b).all()


def test_restart_markers_reset_predictors():
    """DRI=1 with an RST0 between two MCUs: the second block's DC diff
    is measured from a RESET predictor, not the first block's value."""
    data = b"\xff\xd8"
    data += _seg(0xDB, bytes([0]) + bytes([16] * 64))
    data += _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
                 + bytes([1, 1, 0x11, 0]))
    data += _dht(0, 0, DC_COUNTS, DC_SYMS)
    data += _dht(1, 0, [1] + [0] * 15, [0x00])
    data += _seg(0xDD, (1).to_bytes(2, "big"))       # DRI = 1 MCU
    data += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    data += _bits_to_bytes(_dc_bits(10) + "0")       # MCU 1: DC 10 -> 148
    data += b"\xff\xd0"                              # RST0
    data += _bits_to_bytes(_dc_bits(2) + "0")        # MCU 2: DC 2 (from 0!) -> 132
    data += b"\xff\xd9"
    img = decode_image_array(data)
    assert img is not None and img.shape == (8, 16, 3)
    assert (img[:, :8, 0] == 148).all()
    assert (img[:, 8:, 0] == 132).all()


def test_unsupported_and_corrupt_return_none():
    # progressive (SOF2) declines rather than mis-decodes
    prog = b"\xff\xd8" + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    assert decode_image_array(prog) is None
    # truncated entropy data
    data = _gray_header(8, 8, [1] + [0] * 15, [0x00])
    assert decode_image_array(data + b"\xff\xd9") is None  # no entropy bits
    assert decode_image_array(b"\xff\xd8\xff") is None


def test_jpeg_flows_through_feature_pipeline(spark):
    """JPEG rows decode inside the Arrow-batched feature stage alongside
    PPM rows, and near-media retrieval ranks by actual pixel content."""
    from weaviate_spark.operators.multimodal import near_media_search

    def ppm(rgb, w=4, h=4):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes(list(rgb) * (w * h))

    reddish = solid_jpeg(20, -12, 31)    # high Cr -> red-dominant
    bluish = solid_jpeg(20, 31, -12)     # high Cb -> blue-dominant
    rows = [
        (1, bytearray(reddish)),
        (2, bytearray(bluish)),
        (3, bytearray(ppm((255, 40, 40)))),
        (4, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = [r["media_id"] for r in
           near_media_search(df, "media_id", "media", reddish, limit=3).collect()]
    assert out[0] == 1              # exact JPEG match first
    assert 4 not in out
    assert set(out) == {1, 2, 3}    # all decodable media compete


def test_decoders_never_crash_on_corrupt_bytes():
    """Robustness contract for the 100 TB media pass: arbitrary and
    truncated inputs must decode to an image or None — never raise."""
    import random

    from weaviate_spark.operators.multimodal import solid_jpeg

    rng = random.Random(99)
    good = solid_jpeg(20, -12, 8)
    samples = []
    # truncations of a valid file at every marker-ish boundary
    for cut in range(0, len(good), 7):
        samples.append(good[:cut])
    # random corruption of single bytes
    for _ in range(200):
        b = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        samples.append(bytes(b))
    # pure noise with codec magics prepended
    for magic in (b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"BM", b"P6"):
        for _ in range(50):
            samples.append(magic + bytes(rng.randrange(256) for _ in range(rng.randrange(200))))
    for s in samples:
        img = decode_image_array(s)  # must not raise
        assert img is None or img.ndim == 3


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode — hand-crafted multi-scan bitstreams, exact
# expected values (T.81 G.2 successive approximation + spectral selection).

def _prog_gray_header(w, h):
    """SOF2 grayscale header with DC table 0 only (scans append their own
    AC tables + SOS as needed)."""
    data = b"\xff\xd8"
    data += _seg(0xDB, bytes([0]) + bytes([16] * 64))
    data += _seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                 + bytes([1, 1, 0x11, 0]))
    data += _dht(0, 0, DC_COUNTS, DC_SYMS)
    return data


def _sos1(ss, se, ah, al, tables=0x00):
    return _seg(0xDA, bytes([1, 1, tables, ss, se, (ah << 4) | al]))


def test_progressive_dc_first_plus_refine_exact():
    """DC 10 at Al=1 (-> 20), refinement bit 1 (-> 21): every pixel is
    exactly 21*16/8 + 128 = 170."""
    data = _prog_gray_header(8, 8)
    data += _sos1(0, 0, 0, 1)
    data += _bits_to_bytes(_dc_bits(10))          # no AC, no EOB in DC scan
    data += _sos1(0, 0, 1, 0)
    data += _bits_to_bytes("1")                   # refinement bit
    data += b"\xff\xd9"
    img = decode_image_array(data)
    assert img is not None and img.shape == (8, 8, 3)
    assert (img == 170).all()


def test_progressive_ac_first_and_refine_exact():
    """Spectral-selection AC scan sets zigzag-1 to 5 at Al=1 (-> 10); the
    refinement scan's EOB + correction bit bumps it to 11. Pixels follow
    the closed-form single-coefficient IDCT."""
    data = _prog_gray_header(8, 8)
    # scan 1: DC first, value 0
    data += _sos1(0, 0, 0, 0)
    data += _bits_to_bytes(_dc_bits(0))
    # scan 2: AC first over band [1..5], Al=1; table: '00'->(0,3), '01'->EOB
    data += _dht(1, 0, [0, 2] + [0] * 14, [0x03, 0x00])
    data += _sos1(1, 5, 0, 1)
    data += _bits_to_bytes("00" + "101" + "01")   # +5 at k=1, then EOB
    # scan 3: AC refine same band, Al=0: EOB(run 1) then correction bit 1
    data += _sos1(1, 5, 1, 0)
    data += _bits_to_bytes("01" + "1")
    data += b"\xff\xd9"
    img = decode_image_array(data)
    assert img is not None
    coef = 11 * 16
    for x in range(8):
        expect = (coef * math.sqrt(0.5) * 0.5 * 0.5
                  * math.cos((2 * x + 1) * math.pi / 16)) + 128
        expect = int(np.clip(round(expect), 0, 255))
        assert (img[:, x, 0] == expect).all(), (x, expect)


def test_progressive_ac_refine_places_new_coefficient():
    """AC refinement inserting a NEW +-1 coefficient behind a
    zero-history run (the G.2.2 correction-bit walk): run 2 skips k=2,3,
    lands +1 at k=4 while k=1's correction bit reads 0 (unchanged)."""
    data = _prog_gray_header(8, 8)
    data += _sos1(0, 0, 0, 0)
    data += _bits_to_bytes(_dc_bits(0))
    data += _dht(1, 0, [0, 2] + [0] * 14, [0x03, 0x00])
    data += _sos1(1, 5, 0, 1)
    data += _bits_to_bytes("00" + "101" + "01")   # k=1 := 5<<1 = 10
    # refine table: '00'->(2,1), '01'->EOB
    data += _dht(1, 1, [0, 2] + [0] * 14, [0x21, 0x00])
    data += _sos1(1, 5, 1, 0, tables=0x01)
    # (2,1): sign 1 -> +1; correction bit 0 for k=1; lands at k=4; EOB
    data += _bits_to_bytes("00" + "1" + "0" + "01")
    data += b"\xff\xd9"
    img = decode_image_array(data)
    assert img is not None
    # expected: zigzag 1 -> natural (0,1) = 160; zigzag 4 -> natural (1,1) = 16
    C = np.zeros((8, 8))
    C[0, 1] = 10 * 16
    C[1, 1] = 1 * 16
    M = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            M[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    expect = np.clip(np.round(M.T @ C @ M + 128.0), 0, 255).astype(np.uint8)
    assert (img[:, :, 0] == expect).all()


def test_progressive_color_420_solid():
    """Interleaved progressive DC scans on a 4:2:0 color image decode to
    the exact solid color of the equivalent baseline fixture."""
    from weaviate_spark.operators.multimodal import solid_jpeg_progressive

    img = decode_image_array(solid_jpeg_progressive(20, -24, 24))
    base = decode_image_array(solid_jpeg(20, -24, 24))
    assert img is not None and img.shape == (16, 16, 3)
    assert (img == base).all()
    # odd DC values exercise the refinement low bit
    img2 = decode_image_array(solid_jpeg_progressive(21, -23, 25))
    assert img2 is not None
    Y, Cb, Cr = 2 * 21 / 2 * 2 + 128.0, 128.0 + 2 * -23, 128.0 + 2 * 25
    r = int(np.clip(round(Y + 1.402 * (Cr - 128)), 0, 255))
    assert (img2[:, :, 0] == r).all()
