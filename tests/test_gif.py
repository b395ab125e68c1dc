"""GIF codec: LZW encode/decode symmetry, container parse, interlace,
multi-frame, dictionary growth/reset, and the shared-image-path
dispatch (operators/multimodal.py; public GIF89a spec)."""

import random

import numpy as np
import pytest

from weaviate_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif_frame_rgb,
    decode_gif_info,
    decode_image_array,
    gif_from_frames,
)

PALETTE4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51])


def test_lzw_roundtrip_small():
    data = bytes([0, 1, 2, 3, 0, 1, 2, 3, 3, 3, 3, 0])
    enc = _gif_lzw_encode(data, 2)
    assert _gif_lzw_decode(enc, 2, len(data)) == data


def test_lzw_roundtrip_kwkwk():
    # aaaa... forces the self-referencing code == len(table) case
    data = bytes([1] * 50)
    enc = _gif_lzw_encode(data, 2)
    assert _gif_lzw_decode(enc, 2, len(data)) == data


@pytest.mark.parametrize("seed,n,alphabet", [
    (1, 300, 4), (2, 5000, 16), (3, 40000, 128), (4, 120000, 256),
])
def test_lzw_roundtrip_random(seed, n, alphabet):
    """Random streams large enough to walk the code width up (9..12
    bits at alphabet=256) and, at n=120000, to FILL the 12-bit table
    and exercise the clear-and-rebuild path."""
    import math

    rng = random.Random(seed)
    data = bytes(rng.randrange(alphabet) for _ in range(n))
    mcs = max(2, math.ceil(math.log2(alphabet)))
    enc = _gif_lzw_encode(data, mcs)
    assert _gif_lzw_decode(enc, mcs, n) == data


def test_gif_container_roundtrip_multiframe():
    rng = random.Random(7)
    f0 = np.array([[rng.randrange(4) for _ in range(10)]
                   for _ in range(6)], dtype=np.uint8)
    f1 = (f0 + 1) % 4
    blob = gif_from_frames([f0, f1], PALETTE4, delay_ms=120)
    info = decode_gif_info(blob)
    assert (info["width"], info["height"]) == (10, 6)
    assert info["n_frames"] == 2
    assert info["delays_ms"] == [120, 120]
    assert info["version"] == "89a"
    pal = np.frombuffer(PALETTE4, dtype=np.uint8).reshape(-1, 3)
    assert (decode_gif_frame_rgb(blob, 0) == pal[f0]).all()
    assert (decode_gif_frame_rgb(blob, 1) == pal[f1]).all()


def test_gif_interlaced_roundtrip():
    """Interlaced storage decodes to the original row order (the 4-pass
    permutation is its own round trip)."""
    f = np.arange(13 * 4, dtype=np.uint8).reshape(13, 4) % 4
    blob = gif_from_frames([f], PALETTE4, interlaced=True)
    assert decode_gif_info(blob)["interlaced"] is True
    pal = np.frombuffer(PALETTE4, dtype=np.uint8).reshape(-1, 3)
    assert (decode_gif_frame_rgb(blob, 0) == pal[f]).all()


def test_gif_first_frame_via_shared_image_path():
    f0 = np.zeros((3, 3), dtype=np.uint8)
    f1 = np.ones((3, 3), dtype=np.uint8)
    blob = gif_from_frames([f0, f1], PALETTE4)
    img = decode_image_array(blob)
    assert img.shape == (3, 3, 3)
    assert (img == np.array([255, 0, 0], dtype=np.uint8)).all()


def test_gif_truncated_and_corrupt_return_none_via_dispatch():
    blob = gif_from_frames([np.zeros((4, 4), dtype=np.uint8)], PALETTE4)
    assert decode_image_array(blob[: len(blob) // 2]) is None
    assert decode_image_array(b"GIF89a\x00") is None


def test_gif_256_color_8bit_codes():
    rng = random.Random(9)
    pal = bytes(rng.randrange(256) for _ in range(256 * 3))
    f = np.array([[rng.randrange(256) for _ in range(16)]
                  for _ in range(16)], dtype=np.uint8)
    blob = gif_from_frames([f], pal)
    out = decode_gif_frame_rgb(blob, 0)
    expect = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[f]
    assert (out == expect).all()


def test_gif_fuzz_never_raises():
    """Random mutations/truncations of a valid GIF must surface as None
    (or a decoded array) through the shared image path, never as an
    uncaught exception — a per-row codec failure cannot kill a pass."""
    rng = random.Random(42)
    f = np.array([[rng.randrange(4) for _ in range(8)]
                  for _ in range(8)], dtype=np.uint8)
    blob = bytearray(gif_from_frames([f, (f + 2) % 4], PALETTE4))
    for trial in range(300):
        mutated = bytearray(blob)
        if trial % 3 == 0:
            mutated = mutated[: rng.randrange(1, len(blob))]
        for _ in range(rng.randrange(1, 4)):
            if mutated:
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        out = decode_image_array(bytes(mutated))
        assert out is None or (
            hasattr(out, "shape") and out.ndim == 3 and out.shape[2] == 3
        )
