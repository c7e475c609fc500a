"""Imagen cascade: UNets, orchestrators, T5 text encoding."""

from .cascade import (
    ElucidatedImagen,
    Imagen,
    normalize_neg_one_to_one,
    unnormalize_zero_to_one,
)
from .t5 import (
    DEFAULT_T5_NAME,
    MAX_LENGTH,
    get_encoded_dim,
    is_fallback,
    t5_encode_text,
)
from .blocks import (
    CosineSimAttention,
    CrossEmbedLayer,
    GlobalContext,
    LinearAttention,
    LinearCrossAttention,
    PerceiverResampler,
    PixelShuffleUpsample,
    UpsampleCombiner,
)
from .unet3d import (
    ImagenUNet3D,
    TemporalAttention,
    TemporalConv,
    TemporalDownsample,
    TemporalPixelShuffleUpsample,
)
from .unet import (
    CrossAttention,
    ImagenUNet,
    NullUnet,
    ResnetBlock,
    TransformerBlock,
    base_unet_64,
    sr_unet_256,
)

__all__ = [
    "CosineSimAttention",
    "CrossAttention",
    "CrossEmbedLayer",
    "GlobalContext",
    "LinearAttention",
    "LinearCrossAttention",
    "UpsampleCombiner",
    "ImagenUNet3D",
    "PerceiverResampler",
    "PixelShuffleUpsample",
    "TemporalAttention",
    "TemporalConv",
    "TemporalDownsample",
    "TemporalPixelShuffleUpsample",
    "DEFAULT_T5_NAME",
    "ElucidatedImagen",
    "Imagen",
    "ImagenUNet",
    "MAX_LENGTH",
    "NullUnet",
    "ResnetBlock",
    "TransformerBlock",
    "base_unet_64",
    "get_encoded_dim",
    "is_fallback",
    "normalize_neg_one_to_one",
    "sr_unet_256",
    "t5_encode_text",
    "unnormalize_zero_to_one",
]
