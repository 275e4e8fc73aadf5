"""Audio-column operators: opaque binary waveform payloads chunked /
feature-stubbed via Arrow-batched ``mapInPandas`` (north-star
"multimodal columns"; SURVEY.md §2 E9 — the audio sibling of
``images.sample_frames``, which covers video).

Same stubbing contract as images.py: the real decode (resample /
spectrogram) needs librosa/ffmpeg-class libraries that are NOT in this
container, so ``decoder="librosa"`` raises ``NotImplementedError`` with a
clear message, while the default ``decoder="stub"`` treats the raw bytes
as the PCM stream directly — which keeps every Spark-side property real
and testable: the flat-map batch shape (output rows ≠ input rows), the
typed output schema, per-row error tolerance, and partition-parallel
execution. Byte-window chunking itself is decode-independent (real audio
pipelines chunk the encoded stream the same way for shipping), so the
chunker's output is value-exact verifiable against a SQL oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("start_byte", LongType()),
        StructField("n_bytes", LongType()),
        StructField("chunk_md5", StringType()),
    ]
)


def chunk_audio(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    chunk_bytes: int = 4096,
    decoder: str = "stub",
) -> DataFrame:
    """Split audio binaries into fixed-size byte windows → one row PER
    CHUNK ``(id, chunk_idx, start_byte, n_bytes, chunk_md5)`` via
    ``mapInPandas`` (flat-map: output cardinality is Σ ceil(len/chunk),
    not the input row count).

    Empty payloads emit a single zero-length chunk so every input row
    stays observable downstream. A row whose payload cannot be read at
    all degrades to one null-md5 chunk (per-row error tolerance — the
    same contract as the image decode stub).

    Scale shape: no shuffle — chunking is partition-local; downstream
    per-chunk work (feature extraction, embedding) inherits the source
    partitioning, and a corpus-sized repartition before the chunker is
    only needed when the source is a few huge files.
    """
    if decoder == "librosa":
        raise NotImplementedError(
            "librosa decode requires an audio stack on executors; use "
            "decoder='stub' in this environment"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    raw = bytes(content) if content is not None else b""
                    n = max(1, -(-len(raw) // chunk_bytes))  # ceil, ≥1
                    for i in range(n):
                        chunk = raw[i * chunk_bytes : (i + 1) * chunk_bytes]
                        rows.append(
                            (
                                rid,
                                i,
                                i * chunk_bytes,
                                len(chunk),
                                hashlib.md5(chunk).hexdigest(),
                            )
                        )
                except Exception:
                    rows.append((rid, 0, 0, 0, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_CHUNK_SCHEMA.fields]
            )

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return df.select(id_col, content_col).mapInPandas(
        batches, AUDIO_CHUNK_SCHEMA
    )
