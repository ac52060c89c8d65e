"""The real-codec decode branch, exercised via the vendored
mini-decoders (round-3 stretch ask: no PIL/soundfile/av in this
container, so 24bpp BMP and PCM WAV containers drive the
``fake_decode=False`` path end-to-end through Spark)."""

from __future__ import annotations

import io
import struct
import wave

from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.operators.multimodal import (
    MAGIC,
    decode_bmp_rgb,
    decode_wav_pcm,
    extract_features,
)


def make_bmp(pixels_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal 24bpp bottom-up BMP from a row-major RGB pixel grid."""
    h, w = len(pixels_rgb), len(pixels_rgb[0])
    stride = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for row in reversed(pixels_rgb):  # bottom-up storage
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))  # stored BGR
        line += b"\x00" * (stride - len(line))
        body += line
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + dib + bytes(body)


def make_wav(samples: list[int], rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


PIXELS = [
    [(255, 0, 0), (0, 255, 0)],
    [(0, 0, 255), (10, 20, 30)],
]
SAMPLES = [0, 1000, -1000, 32767, -32768, 42]


def test_bmp_mini_decoder_rgb_order():
    raw = decode_bmp_rgb(make_bmp(PIXELS))
    want = b"".join(bytes(p) for row in PIXELS for p in row)
    assert raw == want  # top-to-bottom rows, RGB channel order


def test_wav_mini_decoder_pcm_bytes():
    raw = decode_wav_pcm(make_wav(SAMPLES))
    assert raw == struct.pack(f"<{len(SAMPLES)}h", *SAMPLES)


def test_extract_features_real_branch(spark):
    """fake_decode=False must run green on decodable containers — the
    previously dead-by-environment branch, now driven by the vendored
    decoders through the full mapInPandas plumbing."""
    bmp, wav = make_bmp(PIXELS), make_wav(SAMPLES)
    assets = spark.createDataFrame(
        [
            (1, "image", MAGIC["image"] + bmp),
            (2, "audio", MAGIC["audio"] + wav),
        ],
        "asset_id long, kind string, content binary",
    )
    rows = {r["asset_id"]: r for r in extract_features(assets, fake_decode=False).collect()}
    img, aud = rows[1], rows[2]
    # image: stats over decoded RGB bytes, not the container bytes
    rgb = [c for row in PIXELS for p in row for c in p]
    assert img["n_bytes"] == len(rgb)
    assert img["byte_min"] == min(rgb) and img["byte_max"] == max(rgb)
    assert abs(img["byte_mean"] - sum(rgb) / len(rgb)) < 1e-12
    # audio: stats over raw PCM16 sample bytes
    pcm = struct.pack(f"<{len(SAMPLES)}h", *SAMPLES)
    assert aud["n_bytes"] == len(pcm)
    assert aud["byte_min"] == min(pcm) and aud["byte_max"] == max(pcm)


def test_real_branch_still_raises_on_undecodable():
    import pytest

    from aws_kinesis_data_ingestion_restapi_spark.operators.multimodal import (
        _decode_real,
    )

    with pytest.raises(NotImplementedError):
        _decode_real("video", b"VID0notavideo")
