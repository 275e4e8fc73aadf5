"""Pluggable embedding encoders (SURVEY.md §2.4).

The reference loads HF models as driver globals and embeds one row at a
time in a Python loop (``Nomic MultiModal Retrieval.py``:188–189 vision
model, :350–352 text model, :236–245 loop) — the exact anti-pattern its own
markdown flags ("not efficient if there are thousands of images", NMR:235).
Here encoders are objects constructed once *per executor* inside an
iterator pandas UDF, and they consume Arrow batches.

Real model encoders (torch/transformers) aren't installable in this
environment, so they are gated behind import-try stubs; the deterministic
stub encoders make the full pipeline testable and reproducible without
downloads. The Spark-side plumbing (schemas, batching, null-on-error) is
identical either way — swapping in a real model is a constructor argument.
"""

from __future__ import annotations

import hashlib
from typing import Protocol

import numpy as np
import pandas as pd


class Encoder(Protocol):
    """Batch encoder: a pandas Series of inputs → list-of-float32 rows.

    Implementations must be constructible inside the executor process
    (no captured JVM/driver state) and deterministic for testing."""

    dim: int

    def encode_batch(self, batch: pd.Series) -> list[list[float] | None]: ...


def _seeded_unit_vector(payload: bytes, dim: int) -> list[float]:
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    return [float(x) for x in v.astype(np.float32)]


class StubTextEncoder:
    """Deterministic fake text embedder: md5-seeded gaussian unit vector.

    Mirrors the *contract* of ``generate_text_embedding`` (NMR:369–378):
    unit-norm float vector of fixed dim; None on unencodable input (the
    per-row error tolerance at NMR:211–213)."""

    def __init__(self, dim: int = 64) -> None:
        self.dim = dim

    def encode_batch(self, batch: pd.Series) -> list[list[float] | None]:
        out: list[list[float] | None] = []
        for text in batch:
            if text is None:
                out.append(None)
                continue
            try:
                out.append(_seeded_unit_vector(str(text).encode("utf-8"), self.dim))
            except Exception:
                out.append(None)
        return out


class StubImageEncoder:
    """Deterministic fake image embedder over opaque binary content.

    Stands in for ``generate_image_embedding`` (NMR:202–213: PIL open →
    vision model forward → CLS token → L2 normalize). Real decode requires
    PIL/torch (not in this container) — ``RealImageEncoder`` below raises
    until those are present; the stub hashes the bytes instead so the
    distributed plumbing is fully exercised."""

    def __init__(self, dim: int = 64) -> None:
        self.dim = dim

    def encode_batch(self, batch: pd.Series) -> list[list[float] | None]:
        out: list[list[float] | None] = []
        for content in batch:
            if content is None:
                out.append(None)
                continue
            try:
                out.append(_seeded_unit_vector(bytes(content), self.dim))
            except Exception:
                out.append(None)
        return out


class RealImageEncoder:
    """Placeholder for a real vision encoder (nomic-embed-vision-class,
    NMR:188–189). Requires torch + transformers + PIL at executor import
    time; deliberately NOT installed here."""

    def __init__(self, model_name: str = "nomic-ai/nomic-embed-vision-v1.5", dim: int = 768):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "RealImageEncoder needs torch/transformers/PIL; use "
                "StubImageEncoder in this environment"
            ) from e
        self.model_name = model_name
        self.dim = dim

    def encode_batch(self, batch: pd.Series):  # pragma: no cover
        raise NotImplementedError("real model inference is out of scope here")
