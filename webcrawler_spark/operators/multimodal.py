"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The crawl engine already lands image bytes in the pages table (the
reference writes them to disk via savePicture, exampes/finder/bm1365Model/
bmProcessor.go:14-65; we keep them columnar — SURVEY.md §2.5). These
operators are the downstream pipeline: decode / feature-extract /
resize / frame-sample, all as Arrow-batched ``mapInPandas`` so the driver
never sees payload bytes and each task processes one Arrow batch of blobs.

The header codec is REAL for PNG / GIF / JPEG — stdlib ``struct`` over the
IHDR chunk, the logical screen descriptor, and an SOFn marker walk
(``decode_real``; no PIL needed for dimensions+format). Pixel DECODE
(resample, color transform) would still need a codec library; those
operators stay pure-plan (resize_plan) by design. Payloads that are none
of the three formats fall back to the deterministic fixture header
(``IMG:<w>:<h>:<fmt>:`` — fixtures.fake_image_bytes) and then to
pseudo-metadata from the byte length, keeping every fixture testable.

Scale notes: blobs ride a ``binary`` column ⇒ parquet keeps them column-
chunked and scans prune them unless selected; ``maxRecordsPerBatch`` should
be lowered (e.g. 256) when blobs are MB-sized so Arrow batches stay within
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def decode_real(payload: bytes) -> tuple[int, int, str]:
    """(width, height, format) from real image headers, stdlib-only.

    * PNG: 8-byte signature, then the IHDR chunk's big-endian w/h
      (PNG spec §11.2.2 — public W3C spec).
    * GIF: 'GIF87a'/'GIF89a', then the logical screen descriptor's
      little-endian w/h (GIF89a spec §18).
    * JPEG: marker walk from SOI past APPn/DQT/... to the first SOFn
      (C0-CF except C4/C8/CC); frame header carries BE height, width
      (ITU T.81 §B.2.2). Standalone markers (RST, TEM) have no length.

    Raises ValueError when the payload is none of the three.
    """
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24 \
            and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h, "png"
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "gif"
    if payload[:2] == b"\xff\xd8":
        pos, n = 2, len(payload)
        while pos + 4 <= n and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                pos += 2
                continue
            if marker == 0xD9:  # EOI before any SOF
                break
            seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 <= n:
                    h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
                    return w, h, "jpeg"
                break
            pos += 2 + seg_len
    raise ValueError("not a PNG/GIF/JPEG header")


def _decode_one(payload: bytes) -> tuple[int, int, str]:
    """Real header first, then fixture header, else pseudo-metadata."""
    try:
        return decode_real(payload)
    except ValueError:
        pass
    if payload[:4] == b"IMG:":
        try:
            _, w, h, fmt, _rest = payload.split(b":", 4)
            return int(w), int(h), fmt.decode("ascii")
        except (ValueError, UnicodeDecodeError):
            pass
    n = len(payload)
    return 1 + n % 640, 1 + n % 480, "bin"


def decode_meta(df: DataFrame, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """binary payload -> typed metadata rows, one Arrow batch at a time."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                w, h, fmt = _decode_one(b)
                rows.append(
                    (
                        int(rid),
                        len(b),
                        w,
                        h,
                        fmt,
                        hashlib.md5(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "byte_len", "width", "height", "format", "content_md5"],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(batches, schema=META_SCHEMA)


def resize_plan(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-plan resize: target dims preserving aspect ratio (native exprs;
    the pixel work would happen inside the decode_real seam)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return meta.withColumn(
        "target_width", F.greatest(F.lit(1), F.floor(F.col("width") * scale).cast("int"))
    ).withColumn(
        "target_height", F.greatest(F.lit(1), F.floor(F.col("height") * scale).cast("int"))
    )


def frame_sample_plan(meta: DataFrame, every_n: int = 10, fps: int = 30) -> DataFrame:
    """Video-style frame sampling plan: pretend byte_len/1024 frames; emit
    one row per sampled frame index (explode of a sequence — no Python)."""
    n_frames = F.greatest(F.lit(1), (F.col("byte_len") / 1024).cast("int"))
    return meta.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))),
    ).withColumn("frame_ts_s", F.round(F.col("frame_idx") / F.lit(float(fps)), 4))
