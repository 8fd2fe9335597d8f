"""Model factory — name -> Flax module builder.

Mirrors the reference's per-name dispatch in `reid/image_reid_train.py:595-697`
and `modification_tracking/models/__init__.py:79-121` (build_model).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def build_model(name: str, num_classes: int, num_cams: int = 6, **kw):
    """Build a Flax module by backbone name.

    Supported names track the reference CLI `--backbone` choices plus the
    tracking factory: seres18, cares18, emares18, plr_osnet, osnet variants,
    vit, swin_v1, swin_v2, baseline, resnet50, agw, video_resnet50.
    """
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown backbone '{name}'; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](num_classes=num_classes, num_cams=num_cams, **kw)


def _dtype(kw):
    kw.setdefault("dtype", jnp.float32)
    return kw


@register("seres18")
def _seres18(num_classes, num_cams=6, **kw):
    from .seres18 import SERes18IBN
    return SERes18IBN(num_classes=num_classes, num_cams=num_cams,
                      attention="se", **_dtype(kw))


@register("cares18")
def _cares18(num_classes, num_cams=6, **kw):
    """CARes18: same skeleton, TripletAttention blocks (ref CARes18.py:145)."""
    from .seres18 import SERes18IBN
    return SERes18IBN(num_classes=num_classes, num_cams=num_cams,
                      attention="triplet", **_dtype(kw))


@register("emares18")
def _emares18(num_classes, num_cams=6, **kw):
    """EMARes18: EMA multi-scale attention blocks (ref EMA_Res18.py:10-37)."""
    from .seres18 import SERes18IBN
    return SERes18IBN(num_classes=num_classes, num_cams=num_cams,
                      attention="ema", **_dtype(kw))


def _osnet_channels(mult: float):
    base = (64, 256, 384, 512)
    return tuple(max(16, int(c * mult)) for c in base)


@register("osnet")
@register("osnet_x1_0")
def _osnet(num_classes, num_cams=6, **kw):
    from .osnet import OSNet
    return OSNet(num_classes=num_classes, num_cams=num_cams, **_dtype(kw))


@register("osnet_x0_5")
def _osnet_half(num_classes, num_cams=6, **kw):
    from .osnet import OSNet
    return OSNet(num_classes=num_classes, num_cams=num_cams,
                 channels=_osnet_channels(0.5), **_dtype(kw))


@register("osnet_x0_25")
def _osnet_quarter(num_classes, num_cams=6, **kw):
    from .osnet import OSNet
    return OSNet(num_classes=num_classes, num_cams=num_cams,
                 channels=_osnet_channels(0.25), **_dtype(kw))


@register("plr_osnet")
def _plr_osnet(num_classes, num_cams=6, **kw):
    from .osnet import PLROSNet
    return PLROSNet(num_classes=num_classes, num_cams=num_cams, **_dtype(kw))


@register("vit")
def _vit(num_classes, num_cams=6, num_seqs=0, **kw):
    from .vit import vit_t
    return vit_t(num_classes=num_classes, num_cams=num_cams,
                 num_seqs=num_seqs, **_dtype(kw))


@register("swin_v1")
def _swin_v1(num_classes, num_cams=6, **kw):
    from .swin import swin_t
    return swin_t(num_classes=num_classes, num_cams=num_cams, version="v1",
                  **_dtype(kw))


@register("swin_v2")
def _swin_v2(num_classes, num_cams=6, **kw):
    from .swin import swin_t
    return swin_t(num_classes=num_classes, num_cams=num_cams, version="v2",
                  **_dtype(kw))


@register("video_resnet50")
def _video_r50(num_classes, num_cams=6, **kw):
    from .video3d import video_resnet50
    return video_resnet50(num_classes=num_classes, **_dtype(kw))


@register("video_resnet18")
def _video_r18(num_classes, num_cams=6, **kw):
    from .video3d import video_resnet18
    return video_resnet18(num_classes=num_classes, **_dtype(kw))


@register("baseline")
def _baseline(num_classes, num_cams=6, **kw):
    """ft_baseline: ResNet18 + ClassBlock (ref baseline_lite.py:33-60)."""
    from .baseline import ResNetReID
    return ResNetReID(num_classes=num_classes, num_cams=num_cams,
                      block="basic", blocks=(2, 2, 2, 2), **_dtype(kw))


@register("resnet50")
def _resnet50(num_classes, num_cams=6, **kw):
    """ft_net: ResNet50 + ClassBlock (ref resnet50.py:70-95)."""
    from .baseline import ResNetReID
    return ResNetReID(num_classes=num_classes, num_cams=num_cams,
                      block="bottleneck", blocks=(3, 4, 6, 3), **_dtype(kw))


@register("agw")
def _agw(num_classes, num_cams=6, **kw):
    """AGW: ResNet50 + non-local + GeM pooling (ref AGW_MODEL.py)."""
    from .baseline import ResNetReID
    return ResNetReID(num_classes=num_classes, num_cams=num_cams,
                      block="bottleneck", blocks=(3, 4, 6, 3),
                      non_local=True, pooling="gem", bottleneck_dim=0,
                      **_dtype(kw))
