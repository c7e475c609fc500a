"""Frozen T5 text encoder for the cascade (CascadedDDPM/t5.py:76-246).

The reference singleton-caches a HF ``T5EncoderModel`` + tokenizer
(default ``google/t5-v1_1-base``, MAX_LENGTH 256) and returns masked
embeddings. Here:

* when the transformers weights are available (local cache or network),
  the same frozen encoder runs **on the host** and its embeddings are fed
  to the TPU — text encoding is a data-pipeline step, exactly like the
  reference running T5 inside its collate function
  (CascadedDDPM/data.py:63-90);
* in the zero-egress CI image the weights cannot be downloaded, so a
  deterministic fallback embedder (hash-seeded Gaussian token embeddings)
  keeps the full cascade pipeline runnable end-to-end; it is clearly
  flagged via ``is_fallback`` and produces the same shapes/dtypes
  (B, L<=256, 768).
"""

from __future__ import annotations

import functools
import hashlib
from typing import List, Optional, Tuple

import numpy as np

DEFAULT_T5_NAME = "google/t5-v1_1-base"
MAX_LENGTH = 256
T5_EMBED_DIMS = {
    "google/t5-v1_1-small": 512,
    "google/t5-v1_1-base": 768,
    "google/t5-v1_1-large": 1024,
    "google/t5-v1_1-xl": 2048,
    "google/t5-v1_1-xxl": 4096,
}


def get_encoded_dim(name: str = DEFAULT_T5_NAME) -> int:
    """Embedding width for a T5 variant (t5.py:58-74 role)."""
    return T5_EMBED_DIMS.get(name, 768)


@functools.lru_cache(maxsize=2)
def _load_t5(name: str):
    """Singleton-cached model+tokenizer (t5.py:76-120 role); returns None
    when weights are unavailable (offline image)."""
    try:
        import torch
        from transformers import T5EncoderModel, T5Tokenizer

        tokenizer = T5Tokenizer.from_pretrained(name, local_files_only=True)
        model = T5EncoderModel.from_pretrained(name, local_files_only=True)
        model.eval()
        return tokenizer, model, torch
    except Exception:
        return None


def _fallback_encode(
    texts: List[str], embed_dim: int, max_length: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic pseudo-embeddings: each whitespace token maps to a
    hash-seeded Gaussian vector. Not semantic — a structural stand-in so
    the cascade trains/samples offline."""
    batch = len(texts)
    embeds = np.zeros((batch, max_length, embed_dim), np.float32)
    mask = np.zeros((batch, max_length), bool)
    for bi, text in enumerate(texts):
        tokens = text.lower().split()[:max_length]
        for ti, tok in enumerate(tokens):
            seed = int.from_bytes(
                hashlib.sha256(tok.encode()).digest()[:8], "little"
            )
            rng = np.random.default_rng(seed)
            embeds[bi, ti] = rng.standard_normal(embed_dim).astype(np.float32) / (
                embed_dim**0.5
            )
            mask[bi, ti] = True
    return embeds, mask


def t5_encode_text(
    texts: List[str],
    name: str = DEFAULT_T5_NAME,
    max_length: int = MAX_LENGTH,
    return_attn_mask: bool = True,
):
    """Encode texts to (embeddings, mask) numpy arrays (t5.py:122-246).

    Embeddings are zeroed at masked positions like the reference's
    ``masked_fill`` path.
    """
    loaded = _load_t5(name)
    embed_dim = get_encoded_dim(name)
    if loaded is None:
        embeds, mask = _fallback_encode(texts, embed_dim, max_length)
    else:
        tokenizer, model, torch = loaded
        enc = tokenizer(
            texts,
            return_tensors="pt",
            padding="max_length",
            max_length=max_length,
            truncation=True,
        )
        with torch.no_grad():
            out = model(
                input_ids=enc.input_ids, attention_mask=enc.attention_mask
            )
        embeds = out.last_hidden_state.numpy().astype(np.float32)
        mask = enc.attention_mask.numpy().astype(bool)
    embeds = embeds * mask[..., None]
    if return_attn_mask:
        return embeds, mask
    return embeds


def is_fallback(name: str = DEFAULT_T5_NAME) -> bool:
    """True when the pseudo-embedder is in use (no local T5 weights)."""
    return _load_t5(name) is None


__all__ = [
    "DEFAULT_T5_NAME",
    "MAX_LENGTH",
    "get_encoded_dim",
    "t5_encode_text",
    "is_fallback",
]
