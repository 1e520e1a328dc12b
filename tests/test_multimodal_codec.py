"""Real PNG/GIF/JPEG header codec (stdlib struct, no PIL) — closes the
round-1/2 decode_real seam. Spec references: PNG W3C §11.2.2 (IHDR),
GIF89a §18 (logical screen descriptor), ITU T.81 §B.2.2 (SOFn frame)."""

import struct

import pytest

from webcrawler_spark.fixtures import real_image_bytes
from webcrawler_spark.operators.multimodal import _decode_one, decode_real


@pytest.mark.parametrize("fmt", ["png", "gif", "jpeg"])
@pytest.mark.parametrize("w,h", [(16, 16), (1015, 815), (640, 1)])
def test_decode_real_roundtrip(fmt, w, h):
    assert decode_real(real_image_bytes(w, h, fmt)) == (w, h, fmt)


def test_jpeg_sof_after_many_segments():
    """SOF0 must be found past APPn/DQT/COM segments and RST markers."""
    app1 = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    sof = (
        b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 99, 123) + b"\x01" + b"\x01\x11\x00"
    )  # progressive SOF2 counts too
    payload = b"\xff\xd8" + app1 + dqt + com + sof + b"\xff\xd9"
    assert decode_real(payload) == (123, 99, "jpeg")


def test_jpeg_dht_not_mistaken_for_sof():
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x00\x00"
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 7, 9) + b"\x01" + b"\x01\x11\x00"
    )
    assert decode_real(b"\xff\xd8" + dht + sof + b"\xff\xd9") == (9, 7, "jpeg")


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"IMG:64:48:png:PPP",          # fixture header is NOT a real image
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 4,   # truncated before IHDR
        b"GIF89a" + b"\x01",                   # truncated descriptor
        b"\xff\xd8\xff\xd9",                   # JPEG with no SOF
        b"RIFF....WEBP",                       # unsupported container
    ],
)
def test_decode_real_rejects_non_images(payload):
    with pytest.raises(ValueError):
        decode_real(payload)


def test_decode_one_priority_real_then_fixture_then_pseudo():
    assert _decode_one(real_image_bytes(20, 30, "gif")) == (20, 30, "gif")
    assert _decode_one(b"IMG:64:48:png:" + b"P" * 10) == (64, 48, "png")
    w, h, fmt = _decode_one(b"\x00" * 100)
    assert fmt == "bin" and w == 1 + 100 % 640 and h == 1 + 100 % 480


def test_decode_meta_real_payloads(spark):
    from webcrawler_spark.operators.multimodal import decode_meta

    rows = [
        (0, real_image_bytes(100, 50, "png")),
        (1, real_image_bytes(320, 240, "gif")),
        (2, real_image_bytes(77, 33, "jpeg")),
    ]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    got = {
        r["id"]: (r["width"], r["height"], r["format"])
        for r in decode_meta(df).collect()
    }
    assert got == {0: (100, 50, "png"), 1: (320, 240, "gif"), 2: (77, 33, "jpeg")}
