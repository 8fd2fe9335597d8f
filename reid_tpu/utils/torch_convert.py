"""torch -> Flax weight conversion for the ResNet18-IBN-a trunk.

The reference initializes SERes18-IBN from the pretrained IBN-Net
`resnet18_ibn_a` torch.hub checkpoint (ref SERes18_IBN.py:201) — matching
its accuracy requires loading those weights. This module converts a torch
state_dict (loaded from a local .pt/.pth file; this environment has no
network egress) into the `reid_tpu.models.seres18.SERes18IBN` parameter
tree. SE blocks / BNNeck / classifier / cam_bias have no pretrained
counterpart and keep their fresh initialization, exactly like the reference
(which adds them on top of the pretrained trunk).

Key layout mapping (torch -> flax):
  conv weights  (O, I, kh, kw) -> (kh, kw, I, O)
  linear weight (O, I)         -> (I, O)
  bn weight/bias/running_*     -> scale/bias + batch_stats mean/var
  layerX.Y.*                   -> blockXY.*  (conv1, bn1[.IN/.BN], conv2,
                                  bn2, downsample.0/1 -> down_conv/down_bn)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        if k not in node:
            return False
        node = node[k]
    if path[-1] not in node:
        return False
    target = node[path[-1]]
    value = np.asarray(value, dtype=np.asarray(target).dtype)
    if value.shape != tuple(np.shape(target)):
        return False
    node[path[-1]] = value
    return True


def convert_resnet18_ibn(
    state_dict: Mapping[str, Any], variables: Dict
) -> Dict:
    """Merge a torch `resnet18_ibn_a` state_dict into SERes18IBN variables.

    `variables` = {"params": ..., "batch_stats": ...} from model.init;
    returns a new dict (input trees are copied). Unmatched torch keys are
    ignored (strict=False spirit, ref image_reid_train.py:45).
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def bn(prefix_t, flax_path):
        _set(params, flax_path + ("scale",), sd[prefix_t + ".weight"])
        _set(params, flax_path + ("bias",), sd[prefix_t + ".bias"])
        _set(stats, flax_path + ("mean",), sd[prefix_t + ".running_mean"])
        _set(stats, flax_path + ("var",), sd[prefix_t + ".running_var"])

    # stem
    _set(params, ("conv0", "kernel"), _conv(sd["conv1.weight"]))
    bn("bn1", ("bn0",))

    for stage in range(1, 5):
        for blk in range(2):
            t = f"layer{stage}.{blk}"
            f = f"block{stage}{blk + 1}"
            _set(params, (f, "conv1", "kernel"), _conv(sd[f"{t}.conv1.weight"]))
            _set(params, (f, "conv2", "kernel"), _conv(sd[f"{t}.conv2.weight"]))
            if f"{t}.bn1.IN.weight" in sd:  # IBN block (stages 1-3)
                _set(params, (f, "bn1", "IN", "scale"), sd[f"{t}.bn1.IN.weight"])
                _set(params, (f, "bn1", "IN", "bias"), sd[f"{t}.bn1.IN.bias"])
                bn(f"{t}.bn1.BN", (f, "bn1", "BN"))
            else:
                bn(f"{t}.bn1", (f, "bn1"))
            bn(f"{t}.bn2", (f, "bn2"))
            if f"{t}.downsample.0.weight" in sd:
                _set(params, (f, "down_conv", "kernel"),
                     _conv(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", (f, "down_bn"))

    import jax.numpy as jnp
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file to numpy (no CUDA needed)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}
