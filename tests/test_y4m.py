"""Y4M (YUV4MPEG2) video decoder: exact-value tests. Y4M is the public
uncompressed interchange format (mjpegtools spec) — planar YUV frames
behind an ASCII header — so frames are hand-constructable byte-exact.

Reference behavior modeled: weaviate's multi2vec video modules treat
video as an opaque blob vectorized at ingest (modules/multi2vec-bind);
our engine decodes Y4M for real and samples frames into the shared
image feature space.
"""

from __future__ import annotations

import numpy as np
import pytest

from weaviate_spark.operators.multimodal import (
    decode_image_array,
    decode_y4m_frame_rgb,
    decode_y4m_info,
    near_media_vector,
    sample_frames,
    solid_y4m,
    y4m_from_planes,
)


def _jfif_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return [int(np.clip(round(v), 0, 255)) for v in (r, g, b)]


def test_header_parse():
    clip = solid_y4m([(10, 128, 128), (20, 128, 128), (30, 128, 128)],
                     width=8, height=6, fps=(30000, 1001))
    info = decode_y4m_info(clip)
    assert info == {
        "width": 8, "height": 6, "fps_num": 30000, "fps_den": 1001,
        "colorspace": "420jpeg", "n_frames": 3,
        "duration_ms": 3 * 1000 * 1001 // 30000,
    }


def test_not_y4m_and_corrupt_header():
    assert decode_y4m_info(b"\x00\x01\x02") is None
    assert decode_y4m_info(b"YUV4MPEG2 W8 H6") is None  # no newline
    assert decode_y4m_info(b"YUV4MPEG2 W8 Hx F25:1\n") is None  # bad int
    assert decode_y4m_info(b"YUV4MPEG2 W8 H6 F25:1 C999\n") is None  # bad cs
    assert decode_y4m_info(b"YUV4MPEG2 H6 F25:1\n") is None  # missing W


def test_truncated_final_frame_dropped():
    clip = solid_y4m([(10, 128, 128), (20, 128, 128)], width=4, height=4)
    info = decode_y4m_info(clip[:-3])
    assert info["n_frames"] == 1
    # and the surviving frame still decodes
    assert decode_y4m_frame_rgb(clip[:-3], 0) is not None
    assert decode_y4m_frame_rgb(clip[:-3], 1) is None


def test_mono_exact():
    y = bytes(range(12))
    clip = y4m_from_planes([(y,)], 4, 3, colorspace="mono")
    rgb = decode_y4m_frame_rgb(clip, 0)
    expect = np.frombuffer(y, np.uint8).reshape(3, 4)
    assert (rgb[:, :, 0] == expect).all()
    assert (rgb == rgb[:, :, :1]).all()  # gray replicated to 3 channels


def test_c444_solid_exact():
    clip = solid_y4m([(90, 240, 110)], width=4, height=2, colorspace="444")
    rgb = decode_y4m_frame_rgb(clip, 0)
    assert rgb.shape == (2, 4, 3)
    assert rgb[0, 0].tolist() == _jfif_rgb(90, 240, 110)
    assert (rgb == rgb[0, 0]).all()


def test_c420_gradient_y_neutral_chroma_exact():
    # Cb=Cr=128 makes RGB == Y exactly, so a gradient Y plane checks
    # plane offsets and reshape without rounding ambiguity.
    w, h = 6, 4
    y = bytes(range(w * h))
    clip = y4m_from_planes(
        [(y, bytes([128]) * (w // 2 * h // 2), bytes([128]) * (w // 2 * h // 2))],
        w, h, colorspace="420jpeg")
    rgb = decode_y4m_frame_rgb(clip, 0)
    expect = np.frombuffer(y, np.uint8).reshape(h, w)
    assert (rgb[:, :, 0] == expect).all()
    assert (rgb[:, :, 1] == expect).all()
    assert (rgb[:, :, 2] == expect).all()


def test_c420_chroma_upsample_replication():
    # one chroma sample per 2x2 luma block — replication means all four
    # pixels of a block share the block's chroma.
    w, h = 4, 4
    y = bytes([100]) * (w * h)
    cb = bytes([100, 200, 30, 250])   # 2x2 chroma plane
    cr = bytes([128]) * 4
    clip = y4m_from_planes([(y, cb, cr)], w, h, colorspace="420jpeg")
    rgb = decode_y4m_frame_rgb(clip, 0)
    for (by, bx), cbv in zip([(0, 0), (0, 1), (1, 0), (1, 1)], [100, 200, 30, 250]):
        block = rgb[by * 2:by * 2 + 2, bx * 2:bx * 2 + 2]
        assert (block == _jfif_rgb(100, cbv, 128)).all()


def test_c422_layout():
    w, h = 4, 2
    y = bytes([50]) * (w * h)
    clip = y4m_from_planes(
        [(y, bytes([128]) * (w // 2 * h), bytes([128]) * (w // 2 * h))],
        w, h, colorspace="422")
    rgb = decode_y4m_frame_rgb(clip, 0)
    assert (rgb == 50).all()


def test_frame_params_and_multiframe_offsets():
    # FRAME lines may carry parameters; offsets must still line up.
    w, h = 2, 2
    head = f"YUV4MPEG2 W{w} H{h} F10:1 Cmono\n".encode()
    clip = head + b"FRAME\n" + bytes([11] * 4) + b"FRAMEXsome=param\n" + bytes([22] * 4)
    assert decode_y4m_info(clip)["n_frames"] == 2
    assert (decode_y4m_frame_rgb(clip, 1)[:, :, 0] == 22).all()


def test_near_media_vector_routes_y4m_middle_frame():
    clip = solid_y4m([(10, 128, 128), (200, 128, 128), (30, 128, 128)],
                     width=4, height=4)
    feat = near_media_vector(clip, dim=8)
    # middle frame is solid gray 200 -> channel means = 200/255
    assert feat[0] == pytest.approx(200 / 255)
    assert feat[1] == pytest.approx(200 / 255)
    assert feat[2] == pytest.approx(200 / 255)


def test_sample_frames_real_y4m(spark):
    # 10 fps, 10 frames = 1000 ms; sample every 250 ms -> ts 0,250,500,750
    # -> source frames 0,2,5,7; frames come back as decodable PPM.
    clip = solid_y4m([(10 * i, 128, 128) for i in range(1, 11)],
                     width=4, height=4, fps=(10, 1))
    df = spark.createDataFrame([(1, bytearray(clip))], "media_id long, media binary")
    rows = sample_frames(df, "media_id", "media", every_ms=250).orderBy("frame_idx").collect()
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [
        (0, 0), (1, 250), (2, 500), (3, 750)]
    lumas = []
    for r in rows:
        img = decode_image_array(bytes(r.frame))
        assert img is not None and img.shape == (4, 4, 3)
        lumas.append(int(img[0, 0, 0]))
    assert lumas == [10, 30, 60, 80]  # frames 0, 2, 5, 7


def test_sample_frames_skips_unknown_container_unless_fake(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x18ftypmp42-not-decodable"))],
        "media_id long, media binary")
    assert sample_frames(df, "media_id", "media").count() == 0
    fake = sample_frames(df, "media_id", "media", every_ms=1000, fake=True)
    assert fake.count() == 5  # legacy md5 pseudo-frames, 5s clip


def test_sample_frames_feeds_image_pipeline(spark):
    from weaviate_spark.operators.multimodal import decode_image_features

    clip = solid_y4m([(60, 128, 128), (180, 128, 128)], width=4, height=4,
                     fps=(2, 1))
    df = spark.createDataFrame([(7, bytearray(clip))], "media_id long, media binary")
    frames = sample_frames(df, "media_id", "media", every_ms=500)
    feats = decode_image_features(
        frames.select(F_col("frame_idx").alias("media_id"), "frame"),
        "media_id", "frame").orderBy("media_id").collect()
    assert [r.decode_ok for r in feats] == [True, True]
    assert feats[0].feature[0] == pytest.approx(60 / 255)
    assert feats[1].feature[0] == pytest.approx(180 / 255)


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_video_scene_cuts_y4m_and_avi(spark):
    from weaviate_spark.operators.multimodal import (
        avi_from_jpegs,
        solid_jpeg,
        solid_y4m,
        video_scene_cuts,
    )

    # Y4M: lumas 10, 20, 200 -> diffs 10 (no cut), 180 (cut)
    y4m = solid_y4m([(10, 128, 128), (20, 128, 128), (200, 128, 128)],
                    width=4, height=4, fps=(10, 1))
    # AVI: two solid JPEG frames with identical DCs -> MAD 0, no cut
    j = solid_jpeg(20, 0, 0)
    avi = avi_from_jpegs([j, j], width=16, height=16)
    df = spark.createDataFrame(
        [(1, bytearray(y4m)), (2, bytearray(avi)), (3, b"junk"), (4, None)],
        "media_id long, media binary",
    )
    rows = {(r["media_id"], r["frame_idx"]): r
            for r in video_scene_cuts(df, "media_id", "media", 48.0).collect()}
    assert rows[(1, 1)]["mad"] == 10.0 and rows[(1, 1)]["scene_cut"] is False
    assert rows[(1, 2)]["mad"] == 180.0 and rows[(1, 2)]["scene_cut"] is True
    assert rows[(2, 1)]["mad"] == 0.0 and rows[(2, 1)]["scene_cut"] is False
    assert not any(k[0] in (3, 4) for k in rows)
