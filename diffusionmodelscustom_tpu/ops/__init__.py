"""Reusable compute ops: embeddings, attention (Pallas), norms, resizing."""

from .attention import ImageSelfAttention, MultiHeadSelfAttention, attention_core
from .embeddings import (
    learned_sinusoidal_embedding,
    pos_encoding_block,
    sinusoidal_embedding,
)
from .norms import GroupNormSiLU, instance_norm
from .packed_conv import PackedConv3x3, pack_conv_weights, packed_pair_conv3x3
from .resize import pixel_shuffle, resize_image, upsample_2x

__all__ = [
    "ImageSelfAttention",
    "MultiHeadSelfAttention",
    "attention_core",
    "GroupNormSiLU",
    "PackedConv3x3",
    "pack_conv_weights",
    "packed_pair_conv3x3",
    "instance_norm",
    "learned_sinusoidal_embedding",
    "pixel_shuffle",
    "pos_encoding_block",
    "resize_image",
    "sinusoidal_embedding",
    "upsample_2x",
]
