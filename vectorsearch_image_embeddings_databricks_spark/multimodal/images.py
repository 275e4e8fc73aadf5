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

    return df.select(*cols).mapInPandas(batches, DECODED_SCHEMA)
