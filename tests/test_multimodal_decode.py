"""Real PPM/BMP image decode: byte-level format parsing verified against
hand-constructed images with known pixels, and the opt-in real feature
path checked end-to-end through mapInPandas."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.multimodal import (
    _decode_one,
    decode_image_array,
    extract_features,
    extract_features_real,
    image_stats_features,
)


def _ppm(w: int, h: int, pixels: bytes) -> bytes:
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + pixels


def _bmp24(w: int, h: int, rows_topdown: list[bytes]) -> bytes:
    stride = (w * 3 + 3) // 4 * 4
    pix = b"".join(
        row + b"\x00" * (stride - len(row)) for row in reversed(rows_topdown)
    )  # bottom-up
    off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    return header + pix


def test_ppm_decode_exact_pixels():
    # 2x2: red, green / blue, white
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    arr = decode_image_array(_ppm(2, 2, px))
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [255, 255, 255]


def test_bmp_decode_exact_pixels():
    # BMP stores BGR bottom-up; builder takes top-down RGB rows
    top = bytes([0, 0, 255, 0, 255, 0])      # BGR: red, green
    bottom = bytes([255, 0, 0, 255, 255, 255])  # BGR: blue, white
    arr = decode_image_array(_bmp24(2, 2, [top, bottom]))
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]   # red (RGB)
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [255, 255, 255]


def test_undecodable_returns_none():
    assert decode_image_array(b"not an image, just text bytes") is None
    assert decode_image_array(b"P6\n2 2\n65535\n" + b"\x00" * 24) is None  # 16-bit
    assert decode_image_array(b"BM" + b"\x00" * 60) is None  # bpp 0
    assert image_stats_features(b"nope nope nope...") is None


def test_image_stats_features_values():
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    w, h, mr, mg, mb, gstd, aspect, gmean = image_stats_features(_ppm(2, 2, px))
    assert (w, h, aspect) == (2.0, 2.0, 1.0)
    # each channel: two 255s and two 0s... r: 255,0,0,255 -> 127.5
    assert mr == mg == mb == pytest.approx(127.5)
    gray = np.array([255, 255, 255, 765]) / 3.0
    assert gmean == pytest.approx(gray.mean())
    assert gstd == pytest.approx(gray.std())


def test_extract_features_real_mixed_corpus(spark):
    px = bytes([10, 20, 30] * 4)
    rows = [
        (1, "image", _ppm(2, 2, px)),          # decodable -> real stats
        (2, "image", b"JPEG soup \xff\xd8"),  # undecodable -> stub
        (3, "audio", b"RIFF...."),             # non-image -> stub
    ]
    media = spark.createDataFrame(rows, ["media_id", "kind", "payload"])
    got = {r["media_id"]: r["features"] for r in extract_features_real(media).collect()}
    assert got[1][:2] == [2.0, 2.0] and got[1][2] == pytest.approx(10.0)
    assert got[2] == pytest.approx(_decode_one(rows[1][2], "image"))
    assert got[3] == pytest.approx(_decode_one(rows[2][2], "audio"))


def test_default_path_unchanged_by_real_decoders(spark):
    # gate stability: the DEFAULT extract_features must keep the
    # deterministic stub even for decodable payloads
    media = spark.createDataFrame(
        [(1, "image", _ppm(1, 1, b"\x00\x01\x02"))],
        ["media_id", "kind", "payload"],
    )
    got = extract_features(media).collect()[0]["features"]
    assert got == pytest.approx(_decode_one(_ppm(1, 1, b"\x00\x01\x02"), "image"))


def _wav16(rate: int, samples) -> bytes:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.asarray(samples) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_decode_and_features():
    from iotgp_func_raw_data_ingest_spark.operators.multimodal import (
        audio_stats_features,
        decode_audio_array,
    )

    # 1 second of a square-ish wave at 8 kHz: +0.5 / -0.5 alternating
    samples = ([0.5, -0.5] * 4000)[:8000]
    payload = _wav16(8000, samples)
    arr, rate = decode_audio_array(payload)
    assert rate == 8000 and arr.shape == (8000, 1)
    dur, srate, ch, rms, peak, zcr, dc, rng = audio_stats_features(payload)
    assert (dur, srate, ch) == (pytest.approx(1.0), 8000.0, 1.0)
    assert rms == pytest.approx(0.5, abs=1e-3)
    assert peak == pytest.approx(0.5, abs=1e-3)
    assert zcr == pytest.approx(1.0, abs=1e-3)  # alternates every sample
    assert dc == pytest.approx(0.0, abs=1e-3)
    assert audio_stats_features(b"RIFFxxxxWAVE but broken") is None
    assert audio_stats_features(b"not audio at all, nope") is None


def test_extract_features_real_decodes_wav(spark):
    from iotgp_func_raw_data_ingest_spark.operators.multimodal import (
        extract_features_real,
    )

    payload = _wav16(4000, [0.25] * 4000)
    media = spark.createDataFrame(
        [(1, "audio", payload)], ["media_id", "kind", "payload"]
    )
    feats = extract_features_real(media).collect()[0]["features"]
    assert feats[0] == pytest.approx(1.0)      # duration
    assert feats[1] == pytest.approx(4000.0)   # rate
    assert feats[3] == pytest.approx(0.25, abs=1e-3)  # rms
