"""Import reference PyTorch DANRA checkpoints into this framework.

The reference saves ``{'network_params': model.state_dict(), ...}`` as
``*.pth.tar`` (training_DANRA_conditional.py:755-772). This module maps
that state_dict onto our ``models.danra_unet.DiffusionNet`` variables so a
user migrating from the reference can load a trained model directly.

Weight-layout conversions (verified numerically by the full-net golden
test in tests/test_golden_torch.py):

* Conv2d  (out, in, kh, kw)      -> flax (kh, kw, in, out)
* ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out) with the
  spatial taps FLIPPED (flax ConvTranspose convention)
* Linear  (out, in)              -> flax kernel (in, out)
* LayerNorm weight/bias          -> scale/bias
* BatchNorm weight/bias/running_mean/running_var
                                 -> params scale/bias + batch_stats mean/var
* MultiheadAttention in_proj_weight/out_proj -> fused qkv / out Dense
* Embedding weight               -> embedding
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _convT(w) -> np.ndarray:
    return np.ascontiguousarray(_np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _linear(w) -> np.ndarray:
    return _np(w).T


def _attn(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """ImageSelfAttention (layernorm + nn.MultiheadAttention) -> our
    ImageSelfAttention (ln + mha{qkv,out})."""
    return {
        "ln": {
            "scale": _np(sd[f"{prefix}.layernorm.weight"]),
            "bias": _np(sd[f"{prefix}.layernorm.bias"]),
        },
        "mha": {
            "qkv": {
                "kernel": _linear(sd[f"{prefix}.attention.in_proj_weight"]),
                "bias": _np(sd[f"{prefix}.attention.in_proj_bias"]),
            },
            "out": {
                "kernel": _linear(sd[f"{prefix}.attention.out_proj.weight"]),
                "bias": _np(sd[f"{prefix}.attention.out_proj.bias"]),
            },
        },
    }


def _bn(sd: Mapping[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def import_danra_torch_checkpoint(
    state_dict: Mapping[str, Any],
    *,
    block_layers=(2, 2, 2, 2),
) -> Dict[str, Any]:
    """Reference DiffusionNet state_dict -> ``{"params", "batch_stats"}``
    variables for ``models.danra_unet.DiffusionNet`` (g2 architecture; the
    g3 attention-FFN variant has no shipped checkpoints).

    Accepts either the raw ``state_dict`` or the reference checkpoint
    bundle (uses its 'network_params' entry).
    """
    if "network_params" in state_dict:
        state_dict = state_dict["network_params"]
    sd = dict(state_dict)
    # the architecture is a 4-stage ResNet trunk with 5 feature-map scales
    # (stem + 4 stages); block_layers varies blocks-per-stage only
    assert len(block_layers) == 4, (
        "block_layers must have 4 stages (ResNet trunk); got "
        f"{len(block_layers)}"
    )

    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}

    enc_p["conv1"] = {"kernel": _conv(sd["encoder.conv1.weight"])}
    enc_p["conv2"] = {"kernel": _conv(sd["encoder.conv2.weight"])}
    enc_p["bn1"], enc_s["bn1"] = _bn(sd, "encoder.bn1")

    for li, n_blocks in enumerate(block_layers, start=1):
        for bi in range(n_blocks):
            tp = f"encoder.layer{li}.{bi}"
            ours = f"layer{li}_block{bi}"
            block_p: Dict[str, Any] = {
                "conv1": {"kernel": _conv(sd[f"{tp}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{tp}.conv2.weight"])},
            }
            block_s: Dict[str, Any] = {}
            block_p["bn1"], block_s["bn1"] = _bn(sd, f"{tp}.bn1")
            block_p["bn2"], block_s["bn2"] = _bn(sd, f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                block_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{tp}.downsample.0.weight"])
                }
                (
                    block_p["downsample_bn"],
                    block_s["downsample_bn"],
                ) = _bn(sd, f"{tp}.downsample.1")
            enc_p[ours] = block_p
            enc_s[ours] = block_s

    if "encoder.label_emb.weight" in sd:
        enc_p["label_emb"] = {"embedding": _np(sd["encoder.label_emb.weight"])}

    for i in range(5):
        enc_p[f"time_proj_{i}"] = {
            "kernel": _linear(sd[f"encoder.time_projection_layers.{i}.1.weight"]),
            "bias": _np(sd[f"encoder.time_projection_layers.{i}.1.bias"]),
        }
        enc_p[f"attn_{i}"] = _attn(sd, f"encoder.attention_layers.{i}")

    dec_p: Dict[str, Any] = {}
    for i in range(4):
        tp = f"decoder.residual_layers.{i}"
        dec_p[f"residual_{i}"] = {
            "transpose": {
                "kernel": _convT(sd[f"{tp}.transpose.weight"]),
                "bias": _np(sd[f"{tp}.transpose.bias"]),
            },
            "conv": {
                "kernel": _conv(sd[f"{tp}.conv.weight"]),
                "bias": _np(sd[f"{tp}.conv.bias"]),
            },
            "time_proj": {
                "kernel": _linear(sd[f"{tp}.time_projection_layer.1.weight"]),
                "bias": _np(sd[f"{tp}.time_projection_layer.1.bias"]),
            },
            "attn": _attn(sd, f"{tp}.attention"),
        }
    # the reference's final_layer constructs (but never calls) a time
    # projection since Decoder.forward passes no t; only transpose + conv
    # carry used weights (modules_DANRA_conditional.py:503-509,526-531)
    dec_p["final"] = {
        "transpose": {
            "kernel": _convT(sd["decoder.final_layer.transpose.weight"]),
            "bias": _np(sd["decoder.final_layer.transpose.bias"]),
        },
        "conv": {
            "kernel": _conv(sd["decoder.final_layer.conv.weight"]),
            "bias": _np(sd["decoder.final_layer.conv.bias"]),
        },
    }

    return {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s},
    }


def load_pth_tar(path) -> Dict[str, Any]:
    """Load a reference ``*.pth.tar`` checkpoint file and import it
    (requires torch for deserialization)."""
    import torch

    bundle = torch.load(path, map_location="cpu", weights_only=False)
    return import_danra_torch_checkpoint(bundle)


__all__ = ["import_danra_torch_checkpoint", "load_pth_tar"]
