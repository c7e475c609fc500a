"""Image resizing and upsampling ops (NHWC).

* ``resize_image`` — bilinear/bicubic/nearest resize via jax.image; the
  conditioning-image upsample path (``F.interpolate`` in
  DDPM_clean_application/src/unet_ms.py:156 and torchvision
  ``Resize(antialias=True)`` in data_DANRA_conditional.py:1031-1042, and
  the cascade's ``resize_image_to``, CascadedDDPM/imagen_pytorch.py:427).
* ``pixel_shuffle_upsample`` output path of Imagen's anti-checkerboard
  ``PixelShuffleUpsample`` (imagen_pytorch.py:1320-1350): a conv produces
  4C channels which are rearranged to 2x spatial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_METHODS = {
    "nearest": "nearest",
    "bilinear": "linear",
    "bicubic": "cubic",
    "linear": "linear",
    "cubic": "cubic",
}


def resize_image(
    x: jnp.ndarray,
    height: int,
    width: int,
    method: str = "bilinear",
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC batch to (height, width)."""
    b, _, _, c = x.shape
    return jax.image.resize(
        x,
        (b, height, width, c),
        method=_METHODS.get(method, method),
        antialias=antialias,
    ).astype(x.dtype)


def upsample_2x(x: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    """2x spatial upsample (the clean-app Up block's ``nn.Upsample``,
    src/unet_ms.py:81)."""
    b, h, w, c = x.shape
    return resize_image(x, 2 * h, 2 * w, method=method)


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Depth-to-space: (B, H, W, C*r^2) -> (B, H*r, W*r, C)."""
    b, h, w, c = x.shape
    r = factor
    assert c % (r * r) == 0, "channels must divide factor^2"
    c_out = c // (r * r)
    x = x.reshape(b, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c_out)


def resize_video(
    x: jnp.ndarray,
    frames: int,
    height: int,
    width: int,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Resize (B, F, H, W, C) video in frame count AND spatial size — the
    cascade's resize_video_to used to retime lowres conditioning videos
    between stages (CascadedDDPM/imagen_video.py frame-count resizing)."""
    import jax

    b, f, h, w, c = x.shape
    if (f, h, w) == (frames, height, width):
        return x
    return jax.image.resize(x, (b, frames, height, width, c), method=method)


__all__ = ["resize_image", "upsample_2x", "pixel_shuffle", "resize_video"]
