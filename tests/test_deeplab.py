"""DeepLabV3: forward parity vs a hand-built torch mirror in the
torchvision `deeplabv3_resnet50` module/state_dict layout — validates both
the architecture (output-stride-8 dilation schedule, ASPP, pooled branch)
and `convert_deeplabv3` (ref reid/segmentation.py:12-14 hub model role)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from reid_tpu.models.deeplab import DeepLabV3, extract_foreground
from reid_tpu.utils.torch_convert import convert_deeplabv3  # noqa: E402


class TBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        self.relu = tnn.ReLU()

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TASPP(tnn.Module):
    def __init__(self, cin, ch, rates=(12, 24, 36)):
        super().__init__()
        mods = [tnn.Sequential(tnn.Conv2d(cin, ch, 1, bias=False),
                               tnn.BatchNorm2d(ch), tnn.ReLU())]
        for r in rates:
            mods.append(tnn.Sequential(
                tnn.Conv2d(cin, ch, 3, padding=r, dilation=r, bias=False),
                tnn.BatchNorm2d(ch), tnn.ReLU()))
        mods.append(tnn.Sequential(
            tnn.AdaptiveAvgPool2d(1),
            tnn.Conv2d(cin, ch, 1, bias=False),
            tnn.BatchNorm2d(ch), tnn.ReLU()))
        self.convs = tnn.ModuleList(mods)
        self.project = tnn.Sequential(
            tnn.Conv2d(5 * ch, ch, 1, bias=False),
            tnn.BatchNorm2d(ch), tnn.ReLU(), tnn.Dropout(0.5))

    def forward(self, x):
        size = x.shape[-2:]
        outs = [m(x) for m in self.convs[:-1]]
        pooled = self.convs[-1](x)
        outs.append(F.interpolate(pooled, size=size, mode="bilinear",
                                  align_corners=False))
        return self.project(torch.cat(outs, dim=1))


class TBackbone(tnn.Module):
    def __init__(self, w):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, w, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)

        def layer(cin, planes, blocks, stride, dil, prev_dil):
            mods = [TBottleneck(cin, planes, stride, prev_dil, True)]
            for _ in range(1, blocks):
                mods.append(TBottleneck(planes * 4, planes, 1, dil))
            return tnn.Sequential(*mods)

        self.layer1 = layer(w, w, 3, 1, 1, 1)
        self.layer2 = layer(4 * w, 2 * w, 4, 2, 1, 1)
        self.layer3 = layer(8 * w, 4 * w, 6, 1, 2, 1)   # dilated (os 8)
        self.layer4 = layer(16 * w, 8 * w, 3, 1, 4, 2)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class TorchDeepLab(tnn.Module):
    def __init__(self, w=8, ch=32, nc=21):
        super().__init__()
        self.backbone = TBackbone(w)
        self.classifier = tnn.Sequential(
            TASPP(32 * w, ch), tnn.Conv2d(ch, ch, 3, padding=1, bias=False),
            tnn.BatchNorm2d(ch), tnn.ReLU(), tnn.Conv2d(ch, nc, 1))

    def forward(self, x):
        size = x.shape[-2:]
        y = self.classifier(self.backbone(x))
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


def test_deeplabv3_forward_parity_with_torch_mirror():
    tm = TorchDeepLab(w=8, ch=32, nc=21).eval()
    _randomize(tm)
    fm = DeepLabV3(num_classes=21, width=8, head_ch=32)
    variables = jax.jit(lambda k, x: fm.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_deeplabv3(sd, variables)

    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_out = jax.jit(lambda v, xx: fm.apply(v, xx, train=False))(
        variables, jnp.asarray(x))
    tn = np.transpose(t_out.numpy(), (0, 2, 3, 1))
    fn = np.asarray(f_out)
    assert tn.shape == fn.shape
    assert np.max(np.abs(tn - fn)) < 1e-3, np.max(np.abs(tn - fn))


def test_convert_deeplabv3_rejects_mismatch():
    fm = DeepLabV3(num_classes=21, width=8, head_ch=32)
    variables = jax.jit(lambda k, x: fm.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    with pytest.raises(ValueError, match="no tensor"):
        convert_deeplabv3(
            {"backbone.conv1.weight": np.zeros((99, 3, 7, 7))}, variables)


def test_extract_foreground_mask():
    logits = np.zeros((1, 4, 4, 21), np.float32)
    logits[0, 1, 1, 15] = 5.0   # person class hot at one pixel
    logits[0, 2, 2, 3] = 5.0    # some other class elsewhere
    mask = np.asarray(extract_foreground(jnp.asarray(logits)))
    assert mask[0, 1, 1] and not mask[0, 2, 2] and not mask[0, 0, 0]
