"""Frozen T5 text encoder for the cascade (CascadedDDPM/t5.py:76-246).

The reference singleton-caches a HF ``T5EncoderModel`` + tokenizer
(default ``google/t5-v1_1-base``, MAX_LENGTH 256) and returns masked
embeddings. Here:

* when cached weights are available, the frozen encoder runs NATIVELY in
  JAX via ``FlaxT5EncoderModel`` (XLA-compiled, TPU-capable) — the clean
  path the round-1 review asked for; a torch host encoder is the second
  choice (text encoding as a data-pipeline step, like the reference's
  T5-in-collate, CascadedDDPM/data.py:63-90);
* in the zero-egress CI image the weights cannot be downloaded, so a
  deterministic fallback embedder (hash-seeded Gaussian token embeddings)
  keeps the full cascade pipeline runnable end-to-end; it is clearly
  flagged via ``is_fallback``, emits a visible warning once, and produces
  the same shapes/dtypes (B, L<=256, 768).
"""

from __future__ import annotations

import functools
import hashlib
import warnings
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
def _load_t5_flax(name: str):
    """Singleton-cached JAX-native encoder (FlaxT5EncoderModel) +
    tokenizer; None when weights are unavailable (offline image)."""
    try:
        from transformers import AutoTokenizer, FlaxT5EncoderModel

        tokenizer = AutoTokenizer.from_pretrained(name, local_files_only=True)
        model = FlaxT5EncoderModel.from_pretrained(name, local_files_only=True)
        return tokenizer, model
    except Exception:
        return None


@functools.lru_cache(maxsize=2)
def _load_t5(name: str):
    """Singleton-cached torch model+tokenizer (t5.py:76-120 role); returns
    None when weights are unavailable (offline image)."""
    try:
        import torch
        from transformers import T5EncoderModel, T5Tokenizer

        tokenizer = T5Tokenizer.from_pretrained(name, local_files_only=True)
        model = T5EncoderModel.from_pretrained(name, local_files_only=True)
        model.eval()
        return tokenizer, model, torch
    except Exception:
        return None


def encode_tokenized_flax(model, input_ids, attention_mask) -> np.ndarray:
    """Run the flax encoder on pre-tokenized ids (testable without a
    tokenizer); returns masked last_hidden_state as float32 numpy."""
    out = model(input_ids=input_ids, attention_mask=attention_mask)
    hidden = np.asarray(out.last_hidden_state, np.float32)
    return hidden * np.asarray(attention_mask, np.float32)[..., None]


_warned_fallback = False


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
    embed_dim = get_encoded_dim(name)
    flax_loaded = _load_t5_flax(name)
    if flax_loaded is not None:
        # JAX-native path: encoder runs under XLA on the default backend
        tokenizer, model = flax_loaded
        enc = tokenizer(
            texts,
            return_tensors="np",
            padding="max_length",
            max_length=max_length,
            truncation=True,
        )
        mask = enc["attention_mask"].astype(bool)
        embeds = encode_tokenized_flax(model, enc["input_ids"], enc["attention_mask"])
    elif (loaded := _load_t5(name)) is not None:
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
    else:
        global _warned_fallback
        if not _warned_fallback:
            warnings.warn(
                f"T5 weights for {name!r} are not cached locally; using the "
                "NON-SEMANTIC hash fallback embedder. Text conditioning will "
                "be structurally valid but meaningless.",
                stacklevel=2,
            )
            _warned_fallback = True
        embeds, mask = _fallback_encode(texts, embed_dim, max_length)
    embeds = embeds * mask[..., None]
    if return_attn_mask:
        return embeds, mask
    return embeds


def is_fallback(name: str = DEFAULT_T5_NAME) -> bool:
    """True when the pseudo-embedder is in use (no local T5 weights)."""
    return _load_t5_flax(name) is None and _load_t5(name) is None


__all__ = [
    "DEFAULT_T5_NAME",
    "MAX_LENGTH",
    "get_encoded_dim",
    "t5_encode_text",
    "encode_tokenized_flax",
    "is_fallback",
]
