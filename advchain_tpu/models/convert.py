"""PyTorch -> Flax checkpoint conversion for the UNet family.

Loads the reference's shipped ``.pth`` state dicts (models/unet.py:17-36,
example/saved_checkpoints/) into the Flax UNet defined here, so the
notebooks' trained-model workloads run bit-faithfully on TPU.

Key mapping (torch Sequential indices from unet_parts.py double_conv:
[Conv2d, BN, ReLU, Conv2d, BN, ReLU] -> 0, 1, 3, 4):

    torch                               flax
    inc.conv.conv.0.{weight,bias}       inc/conv1
    inc.conv.conv.1.*                   inc/bn1 (+batch_stats)
    inc.conv.conv.3.*                   inc/conv2
    inc.conv.conv.4.*                   inc/bn2
    downK.mpconv.1.conv.{0,1,3,4}.*     downK/conv/{conv1,bn1,conv2,bn2}
    upK.conv.conv.{0,1,3,4}.*           upK/conv/{conv1,bn1,conv2,bn2}
    outc.conv.{weight,bias}             outc/conv

Conv weights transpose (O, I, kH, kW) -> (kH, kW, I, O).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from advchain_tpu.models.unet import UNet
from advchain_tpu.models.wrapper import SegmentationModel

__all__ = ["torch_unet_state_to_flax", "get_unet_model"]


def _conv(entry: Dict[str, np.ndarray], prefix: str):
    w = entry[prefix + ".weight"]
    out = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if prefix + ".bias" in entry:
        out["bias"] = jnp.asarray(entry[prefix + ".bias"])
    return out


def _bn(entry: Dict[str, np.ndarray], prefix: str):
    params = {"scale": jnp.asarray(entry[prefix + ".weight"]),
              "bias": jnp.asarray(entry[prefix + ".bias"])}
    stats = {"mean": jnp.asarray(entry[prefix + ".running_mean"]),
             "var": jnp.asarray(entry[prefix + ".running_var"])}
    return params, stats


def _double_conv(entry, prefix):
    params, stats = {}, {}
    params["conv1"] = _conv(entry, prefix + ".0")
    params["bn1"], stats["bn1"] = _bn(entry, prefix + ".1")
    params["conv2"] = _conv(entry, prefix + ".3")
    params["bn2"], stats["bn2"] = _bn(entry, prefix + ".4")
    return params, stats


def torch_unet_state_to_flax(state_dict) -> Tuple[dict, dict]:
    """Torch UNet state dict (tensors or ndarrays) -> (params, batch_stats)
    pytrees for :class:`advchain_tpu.models.unet.UNet`."""
    entry = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
             for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["inc"], stats["inc"] = _double_conv(entry, "inc.conv.conv")
    for k in range(1, 5):
        p, s = _double_conv(entry, f"down{k}.mpconv.1.conv")
        params[f"down{k}"] = {"conv": p}
        stats[f"down{k}"] = {"conv": s}
    for k in range(1, 5):
        p, s = _double_conv(entry, f"up{k}.conv.conv")
        params[f"up{k}"] = {"conv": p}
        stats[f"up{k}"] = {"conv": s}
    params["outc"] = {"conv": _conv(entry, "outc.conv")}
    if "self_atn.query_conv.weight" in entry:
        params["self_atn"] = {
            "query_conv": _conv(entry, "self_atn.query_conv"),
            "key_conv": _conv(entry, "self_atn.key_conv"),
            "value_conv": _conv(entry, "self_atn.value_conv"),
            "gamma": jnp.asarray(entry["self_atn.gamma"]),
        }
    return params, stats


def get_unet_model(model_path: str, num_classes: int = 2, device=None,
                   model_arch: str = "UNet_16",
                   compute_dtype=None) -> SegmentationModel:
    """Load a trained reference checkpoint into a Flax UNet
    (reference models/unet.py:17-36).  ``device`` accepted for API parity.
    ``compute_dtype`` (e.g. jnp.bfloat16) enables the wrapper's reduced-
    precision speed mode for the network forward/backward."""
    assert os.path.exists(model_path), f"{model_path} does not exist"
    import torch  # local import: torch is a test/convert-time dependency
    state = torch.load(model_path, map_location="cpu")
    if model_arch == "UNet_16":
        module = UNet(input_channel=1, num_classes=num_classes,
                      feature_scale=4)
    elif model_arch == "UNet_64":
        module = UNet(input_channel=1, num_classes=num_classes,
                      feature_scale=1)
    else:
        raise NotImplementedError(model_arch)
    params, batch_stats = torch_unet_state_to_flax(state)
    return SegmentationModel(module, params, batch_stats,
                             compute_dtype=compute_dtype)
