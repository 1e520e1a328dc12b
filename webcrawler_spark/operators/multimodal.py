"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The crawl engine already lands image bytes in the pages table (the
reference writes them to disk via savePicture, exampes/finder/bm1365Model/
bmProcessor.go:14-65; we keep them columnar — SURVEY.md §2.5). These
operators are the downstream pipeline: decode / feature-extract /
resize / frame-sample, all as Arrow-batched ``mapInPandas`` so the driver
never sees payload bytes and each task processes one Arrow batch of blobs.

The actual codec step is STUBBED (no PIL/ffmpeg in this container):
``decode_meta`` understands the deterministic fixture header
(``IMG:<w>:<h>:<fmt>:`` — fixtures.fake_image_bytes) and otherwise derives
deterministic pseudo-metadata from the byte length, so the Spark-side
plumbing (schema, batching, partitioning) is real and testable end-to-end.
``decode_real`` is the marked seam where a codec library would plug in.

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
    """The real-codec seam. Plug PIL/ffmpeg here when available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use decode_meta (deterministic fake) instead"
        ) from exc
    raise NotImplementedError("real decode not wired yet")


def _decode_one(payload: bytes) -> tuple[int, int, str]:
    """Fixture header if present, else deterministic pseudo-metadata."""
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
