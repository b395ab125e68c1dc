"""Remaining near-media modalities of search_get.proto (near_depth /
near_thermal as single-channel P5 graymaps; near_imu as the canonical
sensor blob) — exact-value decode + shared-feature-space routing."""

from __future__ import annotations

import numpy as np

from weaviate_spark.operators.multimodal import (
    decode_image_array,
    decode_imu_info,
    imu_blob,
    near_media_vector,
)


def _p5(w, h, vals):
    return f"P5\n{w} {h}\n255\n".encode() + bytes(vals)


def test_p5_graymap_exact_and_comments():
    img = decode_image_array(_p5(3, 2, [10, 20, 30, 40, 50, 60]))
    assert img.shape == (2, 3, 3)
    # grayscale replicates into all three channels
    assert (img[:, :, 0] == img[:, :, 1]).all()
    assert img[0].tolist() == [[10] * 3, [20] * 3, [30] * 3]
    withc = b"P5\n# depth frame\n2 1\n255\n" + bytes([7, 9])
    img2 = decode_image_array(withc)
    assert img2[0, 0, 0] == 7 and img2[0, 1, 2] == 9
    # truncated pixel data -> None, 16-bit maxval -> None
    assert decode_image_array(b"P5\n4 4\n255\n\x01") is None
    assert decode_image_array(b"P5\n1 1\n65535\n\x01\x01") is None


def test_imu_blob_roundtrip_exact():
    samples = [[1.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]]
    info = decode_imu_info(imu_blob(samples, sample_rate=50))
    assert info["sample_rate"] == 50 and info["n_samples"] == 3
    assert info["duration_ms"] == 60
    want_rms = [np.sqrt(1.0 / 3), np.sqrt(4.0 / 3), np.sqrt(4.0 / 3)]
    assert np.allclose(info["rms"], want_rms)
    assert np.isclose(info["mean_magnitude"], (1.0 + 2.0 + 2.0) / 3)
    # non-IMU / truncated decline cleanly
    assert decode_imu_info(b"IMU1\x00") is None
    assert decode_imu_info(imu_blob(samples)[:20]) is None
    assert decode_imu_info(b"WAVE....") is None


def test_modalities_share_the_near_media_space():
    depth = near_media_vector(_p5(2, 2, [0, 64, 128, 255]), dim=8)
    thermal = near_media_vector(_p5(2, 2, [0, 64, 128, 255]), dim=8)
    assert depth == thermal  # same bytes -> same feature (deterministic)
    imu = near_media_vector(imu_blob([[0.1, 0.2, 0.3]] * 4), dim=8)
    assert len(imu) == 8 and imu != depth


def test_imu_near_media_search(spark):
    """near_imu query path: a tiny IMU corpus ranked against an IMU
    query blob through the shared near-media search."""
    from weaviate_spark.operators.multimodal import near_media_search

    blobs = [
        (1, imu_blob([[1.0, 0.0, 0.0]] * 8, 100)),
        (2, imu_blob([[0.9, 0.1, 0.0]] * 8, 100)),
        (3, imu_blob([[0.0, 0.0, 5.0]] * 4, 10)),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs], "media_id long, media binary")
    q = imu_blob([[1.0, 0.0, 0.0]] * 8, 100)
    top = near_media_search(df, "media_id", "media", q, limit=3, dim=8).collect()
    assert top[0]["media_id"] == 1 and top[0]["_distance"] == 0.0
    assert [r["media_id"] for r in top][:2] == [1, 2]


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup (image_dhash / dhash_neardup_pairs)


def _ppm(pixels):
    """pixels: list of rows of (r,g,b) tuples -> P6 bytes."""
    h, w = len(pixels), len(pixels[0])
    body = bytes(v for row in pixels for px in row for v in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def test_image_dhash_bits_and_brightness_invariance(spark):
    from weaviate_spark.operators.multimodal import image_dhash

    # 1x3 image with gray sums 10 < 20 > 15 -> bits [1, 0] -> hash 1
    img = _ppm([[(10, 0, 0), (20, 0, 0), (5, 5, 5)]])
    # +50 brightness, no clipping: orderings (and the hash) unchanged
    bright = _ppm([[(60, 50, 50), (70, 50, 50), (55, 55, 55)]])
    # saturated: first two pixels collapse equal -> strict < -> bit 0 is 0
    clipped = _ppm([[(255, 255, 255), (255, 255, 255), (0, 0, 0)]])
    df = spark.createDataFrame(
        [(1, img), (2, bright), (3, clipped), (4, None), (5, b"notanimage")],
        "media_id long, media binary",
    )
    got = {r["media_id"]: r for r in image_dhash(df, "media_id", "media").collect()}
    assert got[1]["dhash"] == 1 and got[1]["n_bits"] == 2
    assert got[2]["dhash"] == 1
    assert got[3]["dhash"] == 0
    assert got[4]["decode_ok"] is False and got[4]["dhash"] is None
    assert got[5]["decode_ok"] is False


def test_dhash_banding_matches_brute_force(spark):
    """Pigeonhole banding must find EVERY pair within budget."""
    import itertools
    import random

    from pyspark.sql import functions as F  # noqa: F401
    from weaviate_spark.operators.multimodal import dhash_neardup_pairs

    rng = random.Random(7)
    base = rng.getrandbits(20)
    rows = [(0, base)]
    # neighbors at hamming 1, 2, 3 and random strangers
    rows.append((1, base ^ 0b1))
    rows.append((2, base ^ 0b101))
    rows.append((3, base ^ 0b10101))
    for i in range(4, 40):
        rows.append((i, rng.getrandbits(20)))
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in dhash_neardup_pairs(df, n_bits=20, max_hamming=2).collect()
    }
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 2:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2
    assert (0, 3) not in got


def test_image_quality_stats_known_pixels(spark):
    """4x1 PPM with gray sums [0, 96, 765, 96]: hand-derived moments,
    8-bin entropy, and dominant bin."""
    from weaviate_spark.operators.multimodal import image_quality_stats

    body = bytes([0, 0, 0, 96, 0, 0, 255, 255, 255, 96, 0, 0])
    ppm = b"P6\n4 1\n255\n" + body
    df = spark.createDataFrame([(1, bytearray(ppm))],
                               "media_id long, media binary")
    r = image_quality_stats(df, "media_id", "media").collect()[0]
    assert r["decode_ok"] and r["n_pixels"] == 4
    assert r["mean_gray"] == 239.25
    assert r["std_gray"] == 306.061575
    assert r["entropy"] == 1.039722
    assert r["dominant_bin"] == 1


def test_image_quality_stats_flat_image_zero_entropy(spark):
    from weaviate_spark.operators.multimodal import image_quality_stats

    ppm = b"P6\n2 2\n255\n" + bytes([10, 10, 10] * 4)
    df = spark.createDataFrame([(7, bytearray(ppm))],
                               "media_id long, media binary")
    r = image_quality_stats(df, "media_id", "media").collect()[0]
    assert r["entropy"] == 0.0 and r["std_gray"] == 0.0
    assert r["dominant_bin"] == 0


def test_image_quality_stats_undecodable(spark):
    from weaviate_spark.operators.multimodal import image_quality_stats

    df = spark.createDataFrame([(9, bytearray(b"notanimage"))],
                               "media_id long, media binary")
    r = image_quality_stats(df, "media_id", "media").collect()[0]
    assert r["decode_ok"] is False and r["entropy"] is None


def test_audio_silence_runs_islands(spark):
    """Gated sine (silent frames 2,3,6,7 of 8) yields two 2-frame runs;
    an ungated clip yields none."""
    import __spark_entry__ as E
    from weaviate_spark.operators.multimodal import audio_silence_runs
    from weaviate_spark.entry_queries import _gated_sine_wav

    rows = [(1, bytearray(_gated_sine_wav(443, 4, (2, 3)))),
            (2, bytearray(_gated_sine_wav(700, 1, (9,))))]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {(r["media_id"], r["run_start"]): r["run_frames"]
           for r in audio_silence_runs(df, "media_id", "blob").collect()}
    assert out == {(1, 2): 2, (1, 6): 2}
