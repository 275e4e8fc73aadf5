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


# --------------------------------------------------------------------- #
# Pooling math shared by the real encoders — pure numpy, so the exact
# NMR:364–378 semantics are unit-testable without torch. The real
# encoders run the model forward in torch and hand the hidden states to
# these functions.
# --------------------------------------------------------------------- #


def masked_mean_pool(
    token_embeddings: np.ndarray, attention_mask: np.ndarray
) -> np.ndarray:
    """Attention-masked token mean (``mean_pooling``, NMR:364–367):
    sum of unmasked token vectors / count of unmasked tokens, clamped
    away from zero exactly like the reference's ``clamp(min=1e-9)``.

    token_embeddings: (batch, tokens, dim); attention_mask: (batch, tokens).
    """
    mask = attention_mask[..., None].astype(token_embeddings.dtype)
    summed = (token_embeddings * mask).sum(axis=1)
    counts = np.clip(mask.sum(axis=1), 1e-9, None)
    return summed / counts


def layer_norm(x: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Per-row layer normalization over the last axis (``F.layer_norm``
    with ``normalized_shape=[dim]``, NMR:375): zero mean, unit variance,
    no learned affine."""
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def l2_normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Row-wise L2 normalization (``F.normalize(p=2, dim=1)``,
    NMR:209/376)."""
    norms = np.clip(np.linalg.norm(x, axis=-1, keepdims=True), eps, None)
    return x / norms


def _require_torch(what: str):
    try:
        import torch
        import transformers
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            f"{what} needs torch/transformers; use the Stub encoders in "
            "this environment"
        ) from e
    return torch, transformers


class RealImageEncoder:
    """Real vision encoder (nomic-embed-vision-class, NMR:188–213):
    bytes → PIL decode → processor → model forward (no grad) → CLS token
    (``last_hidden_state[:, 0]``, NMR:208) → L2 normalize (NMR:209).

    Unlike the reference's driver-global model + per-row loop
    (NMR:188–189, 236–245), this object is built once per executor by
    the iterator pandas UDF and consumes whole Arrow batches. Requires
    torch + transformers + PIL at executor import time; deliberately NOT
    installed here — construction raises and tests skipif."""

    def __init__(
        self,
        model_name: str = "nomic-ai/nomic-embed-vision-v1.5",
        dim: int = 768,
        device: str | None = None,
    ):
        torch, transformers = _require_torch("RealImageEncoder")
        self.model_name = model_name
        self.dim = dim
        # device selection lives inside the encoder plugin (NMR:177–178)
        self.device = device or (
            "cuda" if torch.cuda.is_available() else "cpu"
        )
        self.processor = transformers.AutoImageProcessor.from_pretrained(
            model_name
        )
        self.model = (
            transformers.AutoModel.from_pretrained(
                model_name, trust_remote_code=True
            )
            .to(self.device)
            .eval()
        )

    def encode_batch(self, batch: pd.Series) -> list[list[float] | None]:
        import io

        import torch
        from PIL import Image

        # per-row decode tolerance (NMR:211–213): failures become None
        images, slots = [], []
        out: list[list[float] | None] = [None] * len(batch)
        for i, content in enumerate(batch):
            if content is None:
                continue
            try:
                images.append(
                    Image.open(io.BytesIO(bytes(content))).convert("RGB")
                )
                slots.append(i)
            except Exception:
                pass
        if not images:
            return out
        inputs = self.processor(images, return_tensors="pt").to(self.device)
        with torch.no_grad():
            hidden = self.model(**inputs).last_hidden_state.cpu().numpy()
        cls = hidden[:, 0]  # NMR:208
        vecs = l2_normalize(cls).astype(np.float32)
        for slot, v in zip(slots, vecs):
            out[slot] = [float(x) for x in v]
        return out


class RealTextEncoder:
    """Real text encoder (nomic-embed-text-class, NMR:350–378), the
    symmetric twin of ``RealImageEncoder``: tokenize (pad/truncate) →
    model forward (no grad) → attention-masked mean pooling (NMR:364–367)
    → layer_norm (NMR:375) → L2 normalize (NMR:376).

    Pure function of its input batch — the reference's
    ``generate_text_embedding`` tokenizes the *global* ``question``
    instead of its argument (NMR:369–370, a bug SURVEY §1.4 pins as
    do-not-replicate); nothing here reads ambient state. Task prefixes
    ('search_query: …', NMR:399/403) are the caller's concern — text
    passes through opaquely."""

    def __init__(
        self,
        model_name: str = "nomic-ai/nomic-embed-text-v1.5",
        dim: int = 768,
        device: str | None = None,
        max_length: int = 8192,
    ):
        torch, transformers = _require_torch("RealTextEncoder")
        self.model_name = model_name
        self.dim = dim
        self.max_length = max_length
        self.device = device or (
            "cuda" if torch.cuda.is_available() else "cpu"
        )
        self.tokenizer = transformers.AutoTokenizer.from_pretrained(model_name)
        self.model = (
            transformers.AutoModel.from_pretrained(
                model_name, trust_remote_code=True
            )
            .to(self.device)
            .eval()
        )

    def encode_batch(self, batch: pd.Series) -> list[list[float] | None]:
        import torch

        texts, slots = [], []
        out: list[list[float] | None] = [None] * len(batch)
        for i, text in enumerate(batch):
            if text is None:
                continue
            texts.append(str(text))
            slots.append(i)
        if not texts:
            return out
        enc = self.tokenizer(
            texts,
            padding=True,
            truncation=True,
            max_length=self.max_length,
            return_tensors="pt",
        ).to(self.device)
        with torch.no_grad():
            hidden = self.model(**enc).last_hidden_state.cpu().numpy()
        mask = enc["attention_mask"].cpu().numpy()
        pooled = masked_mean_pool(hidden, mask)  # NMR:364–367
        vecs = l2_normalize(layer_norm(pooled)).astype(np.float32)  # NMR:375–376
        for slot, v in zip(slots, vecs):
            out[slot] = [float(x) for x in v]
        return out
