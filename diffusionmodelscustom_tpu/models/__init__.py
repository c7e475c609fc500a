"""UNet model family: DANRA parity nets and the flagship TPU UNet."""

from .danra_unet import Decoder, DecoderBlock, DiffusionNet, Encoder
from .unet import ConditionalUNet, DoubleConv, Down, Up

__all__ = [
    "ConditionalUNet",
    "Decoder",
    "DecoderBlock",
    "DiffusionNet",
    "DoubleConv",
    "Down",
    "Encoder",
    "Up",
]
