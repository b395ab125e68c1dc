"""MJPEG-AVI container: RIFF walk + frame decode through the in-repo
JPEG decoder. Fixtures are written chunk-by-chunk by avi_from_jpegs, so
every header field and expected pixel value is hand-placed."""

from __future__ import annotations

import struct

import numpy as np

from weaviate_spark.operators.multimodal import (
    avi_from_jpegs,
    decode_avi_frame_rgb,
    decode_avi_info,
    decode_image_array,
    near_media_vector,
    solid_jpeg,
    solid_jpeg_progressive,
)


def _clip(fps=(30, 1)):
    frames = [solid_jpeg(20, -12, 8), solid_jpeg(-8, 14, -3),
              solid_jpeg_progressive(-6, 16, -4)]
    return avi_from_jpegs(frames, 16, 16, fps=fps), frames


def test_avi_info_and_frame_decode_exact():
    data, frames = _clip()
    info = decode_avi_info(data)
    assert info is not None
    assert (info["width"], info["height"]) == (16, 16)
    assert info["codec"] == "MJPG" and info["n_frames"] == 3
    assert (info["fps_num"], info["fps_den"]) == (30, 1)
    assert info["duration_ms"] == 100  # 3 frames at 30fps
    # every frame — including the PROGRESSIVE one — decodes to exactly
    # the pixels of its standalone JPEG
    for i, j in enumerate(frames):
        got = decode_avi_frame_rgb(data, i)
        want = decode_image_array(j)
        assert got is not None and (got == want).all(), i
    assert decode_avi_frame_rgb(data, 3) is None


def test_avi_odd_chunk_padding():
    """RIFF chunks pad to even byte counts; an odd-length JPEG must not
    desync the walk."""
    j = solid_jpeg(3, 2, 26)
    odd = j + b"\x00" if len(j) % 2 == 0 else j  # force odd payload
    data = avi_from_jpegs([odd, j], 16, 16)
    info = decode_avi_info(data)
    assert info["n_frames"] == 2
    assert decode_avi_frame_rgb(data, 1) is not None


def test_avi_truncated_and_garbage():
    data, _ = _clip()
    assert decode_avi_info(b"RIFFxxxx") is None
    assert decode_avi_info(b"\x00" * 64) is None
    # cut mid-movi: trailing frames drop, no exception
    cut = data[: len(data) * 2 // 3]
    info = decode_avi_info(cut)
    assert info is None or info["n_frames"] < 3


def test_avi_near_media_and_frame_sampling(spark):
    from weaviate_spark.operators.multimodal import sample_frames

    data, frames = _clip(fps=(10, 1))  # 3 frames -> 300 ms
    # near-media feature = middle frame's image feature
    v = near_media_vector(data, dim=8)
    mid = near_media_vector(frames[1], dim=8)
    assert v == mid

    df = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, media binary")
    rows = sample_frames(df, "media_id", "media", every_ms=100).collect()
    assert [r["frame_ts_ms"] for r in rows] == [0, 100, 200]
    # sampled frames re-emit as PPM and round-trip the exact pixels
    f0 = decode_image_array(bytes(rows[0]["frame"]))
    want0 = decode_image_array(frames[0])
    assert (f0 == want0).all()


def test_avi_writer_header_layout():
    """strh scale/rate land where the parser reads them (offset 20/24
    past the fourccs) — guards the struct layout against drift."""
    data, _ = _clip(fps=(24, 1))
    i = data.find(b"strh")
    body = i + 8
    assert data[body:body + 4] == b"vids"
    scale, rate = struct.unpack_from("<II", data, body + 20)
    assert (rate, scale) == (24, 1)
