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


def convert_seres18_full(
    state_dict: Mapping[str, Any], variables: Dict
) -> Dict:
    """Merge a FULL reference `SERse18_IBN` checkpoint (the format of the
    reference's `cnn_net_checkpoint_*.pt`, ref SERes18_IBN.py:186-277) into
    SERes18IBN variables — trunk + SE gates + GeM p + BNNeck + classifier +
    cam_bias, i.e. end-to-end weight parity, not just the trunk.

    Reference state_dict naming:
      conv0.weight / bn0.*                       (stem)
      basicBlockXY.block_pre.{conv1,bn1[.IN/.BN],conv2,bn2}.*
      basicBlockXY.block_post.{conv,bn}.*        (downsample)
      basicBlockXY.seblock.{fc1,fc2}.weight      (fc1 1x1 conv, fc2 linear)
      avgpooling.p / bnneck.* / classifier.0.weight / cam_bias
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def bn(prefix_t, flax_path):
        if prefix_t + ".weight" not in sd:
            return
        _set(params, flax_path + ("scale",), sd[prefix_t + ".weight"])
        _set(params, flax_path + ("bias",), sd[prefix_t + ".bias"])
        _set(stats, flax_path + ("mean",), sd[prefix_t + ".running_mean"])
        _set(stats, flax_path + ("var",), sd[prefix_t + ".running_var"])

    _set(params, ("conv0", "kernel"), _conv(sd["conv0.weight"]))
    bn("bn0", ("bn0",))

    for stage in range(1, 5):
        for blk in range(1, 3):
            t = f"basicBlock{stage}{blk}"
            f = f"block{stage}{blk}"
            pre = f"{t}.block_pre"
            _set(params, (f, "conv1", "kernel"),
                 _conv(sd[f"{pre}.conv1.weight"]))
            _set(params, (f, "conv2", "kernel"),
                 _conv(sd[f"{pre}.conv2.weight"]))
            if f"{pre}.bn1.IN.weight" in sd:
                _set(params, (f, "bn1", "IN", "scale"),
                     sd[f"{pre}.bn1.IN.weight"])
                _set(params, (f, "bn1", "IN", "bias"),
                     sd[f"{pre}.bn1.IN.bias"])
                bn(f"{pre}.bn1.BN", (f, "bn1", "BN"))
            else:
                bn(f"{pre}.bn1", (f, "bn1"))
            bn(f"{pre}.bn2", (f, "bn2"))
            if f"{t}.block_post.conv.weight" in sd:
                _set(params, (f, "down_conv", "kernel"),
                     _conv(sd[f"{t}.block_post.conv.weight"]))
                bn(f"{t}.block_post.bn", (f, "down_bn"))
            # SE gate: fc1 is a 1x1 conv (mip, C, 1, 1) -> Dense (C, mip);
            # fc2 is a Linear (C, mip) -> Dense (mip, C)
            if f"{t}.seblock.fc1.weight" in sd:
                w1 = sd[f"{t}.seblock.fc1.weight"]
                if w1.ndim == 4:
                    w1 = w1[:, :, 0, 0]
                _set(params, (f, "seblock", "fc1", "kernel"), w1.T)
                _set(params, (f, "seblock", "fc2", "kernel"),
                     sd[f"{t}.seblock.fc2.weight"].T)

    if "avgpooling.p" in sd:
        _set(params, ("gem", "p"), sd["avgpooling.p"].reshape(()))
    # BNNeck: reference bias is frozen at 0 (weights_init_kaiming), matching
    # our use_bias=False BatchNorm.
    _set(params, ("bnneck", "scale"), sd["bnneck.weight"])
    _set(stats, ("bnneck", "mean"), sd["bnneck.running_mean"])
    _set(stats, ("bnneck", "var"), sd["bnneck.running_var"])
    if "classifier.0.weight" in sd:
        _set(params, ("classifier", "kernel"), sd["classifier.0.weight"].T)
    if "cam_bias" in sd:
        _set(params, ("cam_bias",), sd["cam_bias"])

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def convert_osnet(state_dict: Mapping[str, Any], variables: Dict) -> Dict:
    """Merge a torchreid-layout OSNet state_dict into reid_tpu OSNet
    variables (the reference's gdown-pretrained osnet_x1_0 trunk,
    ref osnet.py:319-382).

    torchreid naming -> flax naming:
      conv1.conv/bn                  -> conv1.conv/bn (stem)
      convN.M.* (OSBlock)            -> convN_M.* with streams
        conv1 (1x1)                  -> conv1.{conv,bn}
        conv2a / conv2b.K ...        -> conv2_{t}_{k}.{conv1,conv2,bn}
        gate.fc1/fc2                 -> gate.fc1/fc2 (conv1x1 -> dense)
        conv3                        -> conv3.{conv,bn}
        downsample                   -> down.{conv,bn}
      convN+1 transition (Conv1x1)   -> transN.{conv,bn}
      conv5                          -> conv5.{conv,bn}
      fc.0 / fc.1 (linear+bn)        -> fc / fc_bn
    Classifier keeps its fresh init (class count differs).
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def bn(prefix_t, flax_path):
        if prefix_t + ".weight" not in sd:
            return
        _set(params, flax_path + ("scale",), sd[prefix_t + ".weight"])
        _set(params, flax_path + ("bias",), sd[prefix_t + ".bias"])
        _set(stats, flax_path + ("mean",), sd[prefix_t + ".running_mean"])
        _set(stats, flax_path + ("var",), sd[prefix_t + ".running_var"])

    def cbr(prefix_t, flax_name):
        if prefix_t + ".conv.weight" in sd:
            _set(params, (flax_name, "conv", "kernel"),
                 _conv(sd[prefix_t + ".conv.weight"]))
            bn(prefix_t + ".bn", (flax_name, "bn"))

    def light(prefix_t, flax_name):
        _set(params, (flax_name, "conv1", "kernel"),
             _conv(sd[prefix_t + ".conv1.weight"]))
        _set(params, (flax_name, "conv2", "kernel"),
             _conv(sd[prefix_t + ".conv2.weight"]))
        bn(prefix_t + ".bn", (flax_name, "bn"))

    def osblock(prefix_t, flax_name):
        # flax submodule path is nested: params[flax_name]["conv1"]...
        if flax_name not in params:
            return
        blk = params[flax_name]
        blk_stats = stats.get(flax_name, {})

        def bset(tree, path, val):
            _set(tree, path, val)

        # conv1
        bset(blk, ("conv1", "conv", "kernel"),
             _conv(sd[prefix_t + ".conv1.conv.weight"]))
        _osnet_bn(sd, prefix_t + ".conv1.bn", blk, blk_stats, ("conv1", "bn"))
        # streams: torchreid conv2a (1 conv), conv2b (2), conv2c (3), conv2d (4)
        for t, letter in enumerate("abcd", start=1):
            for k in range(t):
                tp = f"{prefix_t}.conv2{letter}" + (f".{k}" if t > 1 else "")
                fname = (f"conv2_{t}_{k}",)
                bset(blk, fname + ("conv1", "kernel"),
                     _conv(sd[tp + ".conv1.weight"]))
                bset(blk, fname + ("conv2", "kernel"),
                     _conv(sd[tp + ".conv2.weight"]))
                _osnet_bn(sd, tp + ".bn", blk, blk_stats, fname + ("bn",))
        # gate: torchreid fc1/fc2 are 1x1 convs -> dense kernels
        for fc in ("fc1", "fc2"):
            wkey = f"{prefix_t}.gate.{fc}.weight"
            if wkey in sd:
                wt = sd[wkey]
                if wt.ndim == 4:
                    wt = wt[:, :, 0, 0]
                bset(blk, ("gate", fc, "kernel"), wt.T)
                bkey = f"{prefix_t}.gate.{fc}.bias"
                if bkey in sd:
                    bset(blk, ("gate", fc, "bias"), sd[bkey])
        # conv3 + downsample
        bset(blk, ("conv3", "conv", "kernel"),
             _conv(sd[prefix_t + ".conv3.conv.weight"]))
        _osnet_bn(sd, prefix_t + ".conv3.bn", blk, blk_stats, ("conv3", "bn"))
        if prefix_t + ".downsample.conv.weight" in sd:
            bset(blk, ("down", "conv", "kernel"),
                 _conv(sd[prefix_t + ".downsample.conv.weight"]))
            _osnet_bn(sd, prefix_t + ".downsample.bn", blk, blk_stats,
                      ("down", "bn"))

    # stem
    cbr("conv1", "conv1")
    # stages: torch conv2.{0,1} blocks + conv2.2 transition? torchreid puts the
    # transition as convN[2] (Conv1x1) + avgpool inside the sequential; our
    # names: conv{s}_{i} blocks, trans{s} transitions.
    for s, tname in ((2, "trans2"), (3, "trans3")):
        for i in range(2):
            osblock(f"conv{s}.{i}", f"conv{s}_{i}")
        cbr(f"conv{s}.2", tname)
    for i in range(2):
        osblock(f"conv4.{i}", f"conv4_{i}")
    cbr("conv5", "conv5")
    # fc head: torchreid fc = Sequential(Linear, BN1d, ReLU)
    if "fc.0.weight" in sd:
        _set(params, ("fc", "kernel"), sd["fc.0.weight"].T)
        _set(params, ("fc", "bias"), sd["fc.0.bias"])
        bn("fc.1", ("fc_bn",))

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def _osnet_bn(sd, prefix_t, blk_params, blk_stats, path):
    if prefix_t + ".weight" not in sd:
        return
    _set(blk_params, path + ("scale",), sd[prefix_t + ".weight"])
    _set(blk_params, path + ("bias",), sd[prefix_t + ".bias"])
    _set(blk_stats, path + ("mean",), sd[prefix_t + ".running_mean"])
    _set(blk_stats, path + ("var",), sd[prefix_t + ".running_var"])


def convert_yolov5(state_dict: Mapping[str, Any], variables: Dict) -> Dict:
    """Merge a yolov5-family torch state_dict into `models.yolo.YOLOv5`
    variables (the reference's detection engine, ref track_yolov5.py:135
    DetectMultiBackend + yolov5-crowdhuman weights).

    Torch layout (DetectionModel.state_dict(), 'model.' prefix optional):
      model.{i}.conv.weight / model.{i}.bn.*        plain Conv blocks
      model.{i}.cv{1,2,3}.conv.weight, .m.{j}.cv*   C3 blocks
      model.9.cv{1,2}.*                             SPPF
      model.24.m.{k}.weight/.bias                   Detect head convs
    Flax layout: l{i} modules with cv1/cv2/cv3/m{j} children; det_m{k} head.
    BN weight/bias/running_* -> scale/bias + batch_stats mean/var; conv
    kernels (O,I,kh,kw) -> (kh,kw,I,O). Unmatched keys are ignored
    (strict=False spirit); returns (new variables, n_loaded) semantics via
    attribute on the dict is avoided — raises if NOTHING matched (wrong
    variant width is a footgun worth failing loudly on).
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    loaded = 0

    for key, val in state_dict.items():
        k = key
        if k.startswith("model.model."):
            k = k[len("model."):]
        if not k.startswith("model."):
            # bare DetectionModel state_dict ('0.conv.weight', ...): the
            # layer index is the first segment — normalize to 'model.{i}.'
            if k.split(".", 1)[0].isdigit():
                k = "model." + k
            else:
                continue
        parts = k.split(".")
        idx = parts[1]
        rest = parts[2:]
        if not idx.isdigit() or not rest:
            continue
        val = np.asarray(val)
        if idx == "24":  # Detect head: m.{k}.weight/bias
            if rest[0] == "m" and len(rest) == 3:
                name = f"det_m{rest[1]}"
                if rest[2] == "weight":
                    loaded += _set(params, (name, "kernel"), _conv(val))
                elif rest[2] == "bias":
                    loaded += _set(params, (name, "bias"), val)
            continue
        # fold ".m.{j}." bottleneck lists into "m{j}" module names
        path: list = [f"l{idx}"]
        i = 0
        while i < len(rest):
            if rest[i] == "m" and i + 1 < len(rest) and rest[i + 1].isdigit():
                path.append(f"m{rest[i + 1]}")
                i += 2
            else:
                path.append(rest[i])
                i += 1
        leaf = path[-1]
        mod = tuple(path[:-1])
        if len(mod) >= 1 and mod[-1] == "conv" and leaf == "weight":
            loaded += _set(params, mod + ("kernel",), _conv(val))
        elif len(mod) >= 1 and mod[-1] == "bn":
            if leaf == "weight":
                loaded += _set(params, mod + ("scale",), val)
            elif leaf == "bias":
                loaded += _set(params, mod + ("bias",), val)
            elif leaf == "running_mean":
                loaded += _set(stats, mod + ("mean",), val)
            elif leaf == "running_var":
                loaded += _set(stats, mod + ("var",), val)

    if loaded == 0:
        raise ValueError(
            "convert_yolov5: no tensor in the state_dict matched the model "
            "(wrong variant width/depth, or not a yolov5-family checkpoint)")
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def convert_deeplabv3(state_dict: Mapping[str, Any], variables: Dict) -> Dict:
    """Merge a torchvision `deeplabv3_resnet50` state_dict into
    `models.deeplab.DeepLabV3` variables (the reference's hub segmenter,
    ref reid/segmentation.py:12-14).

    torchvision layout -> flax:
      backbone.conv1/bn1                    -> conv1/bn1
      backbone.layerL.B.{conv,bn}{1..3},
        .downsample.{0,1}                   -> layerL_B.{...}, down_conv/bn
      classifier.0.convs.{0..3}.{0,1}       -> aspp.b{i}_{conv,bn}
      classifier.0.convs.4.{1,2}            -> aspp.pool_{conv,bn}
      classifier.0.project.{0,1}            -> aspp.project_{conv,bn}
      classifier.{1,2,4}                    -> head_conv/head_bn/classifier
    aux_classifier.* is ignored. Raises if nothing matched.
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    loaded = 0

    def bn(prefix_t, flax_path):
        nonlocal loaded
        if prefix_t + ".weight" not in sd:
            return
        loaded += _set(params, flax_path + ("scale",), sd[prefix_t + ".weight"])
        loaded += _set(params, flax_path + ("bias",), sd[prefix_t + ".bias"])
        loaded += _set(stats, flax_path + ("mean",),
                       sd[prefix_t + ".running_mean"])
        loaded += _set(stats, flax_path + ("var",),
                       sd[prefix_t + ".running_var"])

    def conv(prefix_t, flax_path):
        nonlocal loaded
        if prefix_t not in sd:
            return
        loaded += _set(params, flax_path + ("kernel",), _conv(sd[prefix_t]))

    conv("backbone.conv1.weight", ("conv1",))
    bn("backbone.bn1", ("bn1",))
    for li, blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for bi in range(blocks):
            t = f"backbone.layer{li}.{bi}"
            f = f"layer{li}_{bi}"
            for ci in (1, 2, 3):
                conv(f"{t}.conv{ci}.weight", (f, f"conv{ci}"))
                bn(f"{t}.bn{ci}", (f, f"bn{ci}"))
            conv(f"{t}.downsample.0.weight", (f, "down_conv"))
            bn(f"{t}.downsample.1", (f, "down_bn"))
    for i in range(4):  # ASPP 1x1 + three atrous branches
        conv(f"classifier.0.convs.{i}.0.weight", ("aspp", f"b{i}_conv"))
        bn(f"classifier.0.convs.{i}.1", ("aspp", f"b{i}_bn"))
    conv("classifier.0.convs.4.1.weight", ("aspp", "pool_conv"))
    bn("classifier.0.convs.4.2", ("aspp", "pool_bn"))
    conv("classifier.0.project.0.weight", ("aspp", "project_conv"))
    bn("classifier.0.project.1", ("aspp", "project_bn"))
    conv("classifier.1.weight", ("head_conv",))
    bn("classifier.2", ("head_bn",))
    conv("classifier.4.weight", ("classifier",))
    if "classifier.4.bias" in sd:
        loaded += _set(params, ("classifier", "bias"), sd["classifier.4.bias"])

    if loaded == 0:
        raise ValueError(
            "convert_deeplabv3: no tensor matched (wrong width, or not a "
            "torchvision deeplabv3_resnet50 checkpoint)")
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def convert_torchvision_resnet(
    state_dict: Mapping[str, Any], variables: Dict,
    blocks=(2, 2, 2, 2), bottleneck: bool = False,
) -> Dict:
    """Merge a torchvision ResNet state_dict (resnet18/34/50) into
    `models.baseline.ResNetReID` variables — the reference's ImageNet
    trunks for ft_baseline / ft_net / AGW (ref baseline_lite.py:33,
    resnet50.py:70, AGW_MODEL.py backbone). Heads (ClassBlock BNNeck,
    classifier, non-local, GeM) keep their fresh init, exactly like the
    reference which builds them on top of the pretrained trunk.

    torchvision -> flax:  conv1/bn1 -> conv1/bn1;
    layerL.B.{conv,bn}{1..3}, .downsample.{0,1} -> layerL_B.{...},
    down_conv/down_bn. `blocks`/`bottleneck` must match the trunk
    (resnet18: (2,2,2,2) basic; resnet50: (3,4,6,3) bottleneck).
    Raises if nothing matched.
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    loaded = 0

    def bn(prefix_t, flax_path):
        nonlocal loaded
        if prefix_t + ".weight" not in sd:
            return
        loaded += _set(params, flax_path + ("scale",), sd[prefix_t + ".weight"])
        loaded += _set(params, flax_path + ("bias",), sd[prefix_t + ".bias"])
        loaded += _set(stats, flax_path + ("mean",),
                       sd[prefix_t + ".running_mean"])
        loaded += _set(stats, flax_path + ("var",),
                       sd[prefix_t + ".running_var"])

    def conv(prefix_t, flax_path):
        nonlocal loaded
        if prefix_t in sd:
            loaded += _set(params, flax_path + ("kernel",),
                           _conv(sd[prefix_t]))

    conv("conv1.weight", ("conv1",))
    bn("bn1", ("bn1",))
    n_convs = 3 if bottleneck else 2
    for li, nb in enumerate(blocks, start=1):
        for bi in range(nb):
            t = f"layer{li}.{bi}"
            f = f"layer{li}_{bi}"
            for ci in range(1, n_convs + 1):
                conv(f"{t}.conv{ci}.weight", (f, f"conv{ci}"))
                bn(f"{t}.bn{ci}", (f, f"bn{ci}"))
            conv(f"{t}.downsample.0.weight", (f, "down_conv"))
            bn(f"{t}.downsample.1", (f, "down_bn"))

    if loaded == 0:
        raise ValueError(
            "convert_torchvision_resnet: no tensor matched (wrong "
            "blocks/bottleneck for this checkpoint?)")
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
