"""Multimodal-column operators: image/audio/video as opaque binary +
typed metadata (north-star "multimodal columns"; SURVEY.md §2 E9).

The decode step needs PIL/ffmpeg-class libraries that are NOT in this
container, so decode is stubbed two ways:
- ``decode_images(..., decoder="stub")``: deterministic fake decode
  (dimensions derived from a byte hash) — keeps the whole Spark plan real
  and testable: schema, ``mapInPandas`` batching, partitioning.
- ``decoder="pil"``: the real path, raising ``NotImplementedError`` with
  a clear message until PIL is importable on executors.

Everything else (metadata extraction, byte sampling) is pure column
expressions over the ``binaryFile`` scan schema.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# JPEG/PNG magic prefixes for cheap format sniffing without decode
_MAGIC = {"ffd8ff": "jpeg", "89504e47": "png", "47494638": "gif"}


def extract_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Columnar metadata over opaque bytes: size, checksum, sniffed format.

    No decode, no Python: runs in codegen over the binary column."""
    content = F.col(content_col)
    magic = F.lower(F.hex(F.substring(content, 1, 4)))
    fmt = F.when(magic.startswith("ffd8ff"), "jpeg")
    for prefix, name in _MAGIC.items():
        fmt = fmt.when(magic.startswith(prefix), name)
    return df.withColumns(
        {
            "n_bytes": F.length(content),
            "content_md5": F.md5(content),
            "format": fmt.otherwise("unknown"),
        }
    )


def sample_bytes(df: DataFrame, content_col: str = "content", n: int = 64) -> DataFrame:
    """First-n-bytes sample column (hex) — frame-sample/header-probe
    analog that stays columnar."""
    return df.withColumn(
        "head_hex", F.lower(F.hex(F.substring(F.col(content_col), 1, n)))
    )


DECODED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


def decode_images(
    df: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    decoder: str = "stub",
) -> DataFrame:
    """Decode image binaries → (path, n_bytes, width, height, mode) via
    ``mapInPandas`` (Arrow-batched; executor-side; never on the driver).

    ``stub`` decoder: width/height deterministically derived from the
    content hash — the Spark plumbing (batch shape, schema, partition
    preservation) is real; only the pixel math is fake."""

    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PIL decode requires pillow on executors; use decoder='stub' "
                "in this environment"
            ) from e

    cols = [path_col, content_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pil":  # pragma: no cover - env-dependent
            import io

            from PIL import Image

            def one(content: bytes):
                img = Image.open(io.BytesIO(content))
                return img.width, img.height, img.mode
        else:

            def one(content: bytes):
                h = hashlib.md5(content).digest()
                # deterministic fake dimensions in a plausible range
                return 64 + h[0] * 8, 64 + h[1] * 8, "RGB"

        for pdf in it:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    w, hgt, mode = one(bytes(content))
                    rows.append((path, len(content), w, hgt, mode))
                except Exception:
                    # NMR:211-213 semantics: tolerate bad rows, keep going
                    rows.append((path, len(content) if content else 0, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select(*cols).mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    path_col: str = "path",
    content_col: str = "content",
    decoder: str = "stub",
) -> DataFrame:
    """Resize image binaries to (width, height) → (path, width, height,
    content) via ``mapInPandas``.

    Stub path: output bytes are a deterministic function of (input bytes,
    target size) with length proportional to the pixel count — the
    transform's Spark shape (Arrow batching, binary-out schema, row
    tolerance) is real; only the resampling math is fake. ``decoder="pil"``
    raises until pillow is importable on executors."""
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PIL resize requires pillow on executors; use decoder='stub' "
                "in this environment"
            ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pil":  # pragma: no cover - env-dependent
            import io

            from PIL import Image

            def one(content: bytes) -> bytes:
                img = Image.open(io.BytesIO(content)).resize((width, height))
                out = io.BytesIO()
                img.save(out, format=img.format or "PNG")
                return out.getvalue()
        else:

            def one(content: bytes) -> bytes:
                seed = hashlib.md5(
                    content + f"{width}x{height}".encode()
                ).digest()
                # fake pixel buffer: 3 bytes/px header-tagged, deterministic
                reps = (width * height * 3) // len(seed) + 1
                return (b"\x89STUB" + seed * reps)[: width * height * 3]

        for pdf in it:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    rows.append((path, width, height, one(bytes(content))))
                except Exception:
                    rows.append((path, width, height, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select(path_col, content_col).mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 16,
    path_col: str = "path",
    content_col: str = "content",
    decoder: str = "stub",
) -> DataFrame:
    """Sample frames from video binaries → one row PER FRAME
    (path, frame_idx, ts_ms, frame) via ``mapInPandas`` — the one
    multimodal op whose Spark shape is a flat-map (output rows ≠ input
    rows), which ``mapInPandas`` expresses natively.

    Stub decoder: frame count is derived from the byte length (1 fake
    frame per 4 KiB, capped at ``max_frames``); each frame's bytes are a
    deterministic hash of (content, index). ``decoder="ffmpeg"`` raises
    until an ffmpeg binding is importable on executors."""
    if decoder == "ffmpeg":
        raise NotImplementedError(
            "ffmpeg frame sampling requires an ffmpeg binding on executors; "
            "use decoder='stub' in this environment"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    raw = bytes(content)
                    n = min(max_frames, max(1, len(raw) // 4096))
                    for i in range(n):
                        # index appended as ASCII digits so the stub
                        # derivation is replayable in a SQL oracle
                        # (md5(payload || CAST(i AS VARCHAR)))
                        frame = hashlib.md5(
                            raw + str(i).encode("ascii")
                        ).digest()
                        rows.append((path, i, i * every_ms, frame))
                except Exception:
                    rows.append((path, 0, 0, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select(path_col, content_col).mapInPandas(batches, FRAME_SCHEMA)
