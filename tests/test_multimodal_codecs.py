"""Real container decoders (BMP/WAV) in the multimodal path.

These formats are parseable with struct+numpy alone, so — unlike the
honestly-stubbed JPEG/PNG/MP4 path — the decode here is REAL: pixel
and sample values drive the assertions.
"""

from __future__ import annotations

import math
import struct

from s3_rds_bq_airflow_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    extract_audio_features,
    extract_image_features,
)


def make_bmp(width: int, height: int, rgb) -> bytes:
    """Minimal 24-bit bottom-up BMP with a solid color."""
    row = bytes(bytearray([rgb[2], rgb[1], rgb[0]] * width))
    pad = b"\x00" * ((4 - (len(row) % 4)) % 4)
    pixels = (row + pad) * height
    header_size = 14 + 40
    file_size = header_size + len(pixels)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
        + pixels
    )


def make_wav(rate: int, samples) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_decode_bmp_exact_pixels():
    w, h, r, g, b = decode_bmp(make_bmp(5, 3, (200, 100, 50)))
    assert (w, h) == (5, 3)
    assert (r, g, b) == (200.0, 100.0, 50.0)


def test_decode_wav_exact_samples():
    rate, n, dur, rms = decode_wav(make_wav(8000, [1000, -1000, 1000, -1000]))
    assert (rate, n) == (8000, 4)
    assert abs(dur - 4 / 8000) < 1e-12
    assert abs(rms - 1000.0) < 1e-9


def test_image_features_distributed_with_dead_letter(spark):
    rows = [
        (1, make_bmp(4, 4, (255, 0, 0))),
        (2, make_bmp(2, 8, (0, 0, 255))),
        (3, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: r for r in extract_image_features(df).collect()}
    assert got[1]["decode_status"] == "ok"
    assert (got[1]["width"], got[1]["height"], got[1]["mean_r"]) == (4, 4, 255.0)
    assert got[2]["mean_b"] == 255.0 and got[2]["height"] == 8
    assert got[3]["decode_status"].startswith("error:") and got[3]["width"] is None


def test_audio_features_distributed(spark):
    sine = [int(10000 * math.sin(2 * math.pi * 440 * t / 8000)) for t in range(800)]
    df = spark.createDataFrame(
        [(1, make_wav(8000, sine)), (2, b"RIFFjunk")], "doc_id LONG, payload BINARY"
    )
    got = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert got[1]["decode_status"] == "ok"
    assert got[1]["sample_rate"] == 8000 and got[1]["n_samples"] == 800
    assert abs(got[1]["duration_s"] - 0.1) < 1e-9
    # Sine RMS ≈ amplitude / sqrt(2), loose bound (integer quantization).
    assert abs(got[1]["rms"] - 10000 / math.sqrt(2)) < 100
    assert got[2]["decode_status"].startswith("error:")


def test_resize_bmp_geometry_and_pixels():
    from s3_rds_bq_airflow_spark.operators.multimodal import decode_bmp, resize_bmp

    big = make_bmp(8, 6, (10, 20, 30))
    small = resize_bmp(big, 2)
    w, h, r, g, b = decode_bmp(small)
    assert (w, h) == (4, 3)
    assert (r, g, b) == (10.0, 20.0, 30.0)  # solid color survives resample
    # factor 1 is identity geometry.
    assert decode_bmp(resize_bmp(big, 1))[:2] == (8, 6)


def test_resize_images_distributed(spark):
    from s3_rds_bq_airflow_spark.operators.multimodal import (
        extract_image_features,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, make_bmp(8, 4, (200, 150, 100))), (2, b"junk")],
        "doc_id LONG, payload BINARY",
    )
    resized = resize_images(df, factor=2)
    feats = {r["doc_id"]: r for r in extract_image_features(
        resized.where(resized["resize_status"] == "ok")
    ).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (4, 2)
    assert feats[1]["mean_g"] == 150.0
    bad = resized.where(resized["resize_status"] != "ok").collect()
    assert len(bad) == 1 and bad[0]["payload"] is None


# ---- perceptual hash + spectral additions ----


def test_gray8_roundtrip_and_ahash_bits():
    import numpy as np

    from s3_rds_bq_airflow_spark.operators.multimodal import (
        _bmp_pixel_grid,
        ahash64_hex,
        make_gray8_bmp,
    )

    values = [(i * 37 + 11) % 256 for i in range(64)]
    payload = make_gray8_bmp(values)
    grid = _bmp_pixel_grid(payload)
    assert grid.shape == (8, 8, 3)
    # top-down row-major decode must return exactly the input values
    assert [int(grid[y, x, 0]) for y in range(8) for x in range(8)] == values

    # reference aHash: strict integer above-average rule, MSB = pixel 0
    s = sum(values)
    bits = [1 if 64 * v > s else 0 for v in values]
    val = 0
    for b in bits:
        val = (val << 1) | b
    assert ahash64_hex(payload) == (format(val, "016x"),)


def test_ahash_solid_image_is_all_zero_bits():
    from s3_rds_bq_airflow_spark.operators.multimodal import ahash64_hex

    # strict '>' means a constant image (any geometry -> nearest
    # sample path for non-8x8) has NO above-average pixel
    assert ahash64_hex(make_bmp(5, 3, (77, 77, 77))) == ("0" * 16,)


def test_spectral_peak_recovers_tone_bin():
    from s3_rds_bq_airflow_spark.operators.multimodal import spectral_peak

    for k in (5, 37, 104):
        samples = [
            int(round(12000 * math.sin(2 * math.pi * k * n / 256))) for n in range(256)
        ]
        rate, n, peak_bin, peak_freq = spectral_peak(make_wav(8000, samples))
        assert (rate, n, peak_bin) == (8000, 256, k)
        assert peak_freq == k * 8000 / 256


def test_hamming_neardup_pairs_banded(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from s3_rds_bq_airflow_spark.operators.multimodal import hamming_neardup_pairs
    from s3_rds_bq_airflow_spark.plans.inspect import plan_nodes

    rows = [
        (1, "00000000000000ff"),
        (2, "00000000000000fe"),  # hamming 1 from id 1
        (3, "ffffffffffffffff"),  # far from both
        (4, "fffffffffffffff0"),  # hamming 4 from id 3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ahash"])
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neardup_pairs(df).collect()
    }
    assert got == {(1, 2): 1, (3, 4): 4}
    # banded equi-join, never a cartesian product
    assert not any(
        "CartesianProduct" in n for n in plan_nodes(hamming_neardup_pairs(df))
    )


def test_hamming_pigeonhole_guard():
    import pytest

    from s3_rds_bq_airflow_spark.operators.multimodal import hamming_neardup_pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_neardup_pairs(None, max_hamming=8, bands=8)


def _tone_wav(tones, amp=12000):
    samples = []
    for k in tones:
        samples.extend(
            int(round(amp * math.sin(2 * math.pi * k * n / 256))) for n in range(256)
        )
    return make_wav(8000, samples)


def test_constellation_landmarks_exact(spark):
    from s3_rds_bq_airflow_spark.operators.multimodal import constellation_landmarks

    tones = [10, 20, 30, 40]
    df = spark.createDataFrame([(1, _tone_wav(tones))], ["doc_id", "payload"])
    got = {
        (r["f"], r["lhash"])
        for r in constellation_landmarks(df).collect()
    }
    want = {
        (f, tones[f] * 65536 + tones[f + dt] * 16 + dt)
        for f, dt in [(0, 1), (1, 1), (2, 1), (0, 2), (1, 2)]
    }
    assert got == want


def test_constellation_match_offset_vote(spark):
    from s3_rds_bq_airflow_spark.operators.multimodal import (
        constellation_landmarks,
        constellation_match,
    )

    rows = [
        (1, _tone_wav([10, 20, 30, 40])),
        (2, _tone_wav([20, 30, 40, 50])),  # doc 1 shifted one frame
        (3, _tone_wav([71, 83, 97, 61])),  # unrelated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    got = {
        (r["id_a"], r["id_b"], r["delta"]): r["votes"]
        for r in constellation_match(constellation_landmarks(df)).collect()
    }
    # shared landmarks: (20,30,1),(30,40,1),(20,40,2) at consistent
    # frame offset +1 (doc1's frame f matches doc2's frame f-1)
    assert got == {(1, 2, 1): 3}


def test_video_frame_ahash_splits_and_hashes(spark):
    from s3_rds_bq_airflow_spark.operators.multimodal import (
        ahash64_hex,
        make_gray8_bmp,
        video_frame_ahash,
    )

    f0 = make_gray8_bmp([(i * 3) % 256 for i in range(64)])
    f1 = make_gray8_bmp([(i * 5 + 7) % 256 for i in range(64)])
    df = spark.createDataFrame([(9, f0 + f1 + f0)], ["doc_id", "payload"])
    got = {
        (r["f"], r["ahash"])
        for r in video_frame_ahash(df, frame_bytes=len(f0)).collect()
    }
    assert got == {
        (0, ahash64_hex(f0)[0]),
        (1, ahash64_hex(f1)[0]),
        (2, ahash64_hex(f0)[0]),
    }
