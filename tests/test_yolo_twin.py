"""Numerical torch-twin parity for the YOLOv8 perceptual-loss family
(VERDICT round-2 weak item 5): C2f, SPPF, and the full backbone+neck tap
set are validated against inline torch twins built to the public
ultralytics architecture (Conv = conv+BN(eps=1e-3)+SiLU, C2f chunk/dense
bottlenecks, SPPF triple 5x5 maxpool, nearest-up + concat neck), the same
style as the ResNet twins in test_perceptual_loss.py. Reference taps:
core/engine/losses.py:168-239."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from vcm_ts_tpu.train.yolo_v8 import C2f, SPPF, YOLOv8Backbone
from vcm_ts_tpu.utils.weight_import import import_state_dict


class TConv(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return tnn.functional.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, cin, cout, n=1, shortcut=False):
        super().__init__()
        self.c = cout // 2
        self.cv1 = TConv(cin, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, cout, 1)
        self.m = tnn.ModuleList(
            TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        c_ = cin // 2
        self.cv1 = TConv(cin, c_, 1)
        self.cv2 = TConv(c_ * 4, cout, 1)
        self.m = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))


def _randomize_bn(mod):
    for m in mod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.2)


def _to_sd(tm, strip=""):
    return {k[len(strip):] if strip and k.startswith(strip) else k:
            v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


def _run_pair(fmod, tmod, x_nhwc, strip=""):
    tmod.eval()
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))
    params = import_state_dict(params, _to_sd(tmod, strip))
    ours = np.asarray(fmod.apply(params, jnp.asarray(x_nhwc)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    return ours, ref.numpy().transpose(0, 2, 3, 1)


def test_c2f_matches_torch_twin():
    torch.manual_seed(1)
    tm = TC2f(12, 16, n=2, shortcut=True)
    _randomize_bn(tm)
    x = np.random.default_rng(1).normal(
        size=(2, 8, 8, 12)).astype(np.float32)
    ours, ref = _run_pair(C2f(16, n=2, shortcut=True), tm, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_c2f_no_shortcut_matches_torch_twin():
    torch.manual_seed(2)
    tm = TC2f(16, 8, n=1, shortcut=False)
    _randomize_bn(tm)
    x = np.random.default_rng(2).normal(
        size=(1, 6, 6, 16)).astype(np.float32)
    ours, ref = _run_pair(C2f(8, n=1, shortcut=False), tm, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_sppf_matches_torch_twin():
    torch.manual_seed(3)
    tm = TSPPF(16, 24)
    _randomize_bn(tm)
    x = np.random.default_rng(3).normal(
        size=(1, 9, 9, 16)).astype(np.float32)
    ours, ref = _run_pair(SPPF(24), tm, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TYoloBackbone(tnn.Module):
    """Full DetectionModel graph (minus Detect) at a given scale, taps as
    losses.py:195-204. Layer indices follow the ultralytics yaml."""

    def __init__(self, width=0.125, depth=0.34, max_channels=768):
        super().__init__()

        def c(ch):
            return min(int(round(ch * width)), max_channels)

        def d(n):
            return max(int(round(n * depth)), 1)

        self.layers = tnn.ModuleDict({
            "0": TConv(3, c(64), 3, 2),
            "1": TConv(c(64), c(128), 3, 2),
            "2": TC2f(c(128), c(128), d(3), True),
            "3": TConv(c(128), c(256), 3, 2),
            "4": TC2f(c(256), c(256), d(6), True),
            "5": TConv(c(256), c(512), 3, 2),
            "6": TC2f(c(512), c(512), d(6), True),
            "7": TConv(c(512), c(1024), 3, 2),
            "8": TC2f(c(1024), c(1024), d(3), True),
            "9": TSPPF(c(1024), c(1024)),
            "12": TC2f(c(1024) + c(512), c(512), d(3), False),
            "15": TC2f(c(512) + c(256), c(256), d(3), False),
            "16": TConv(c(256), c(256), 3, 2),
            "18": TC2f(c(256) + c(512), c(512), d(3), False),
            "19": TConv(c(512), c(512), 3, 2),
            "21": TC2f(c(512) + c(1024), c(1024), d(3), False),
        })

    def forward(self, x):
        up = tnn.functional.interpolate
        L = self.layers
        taps = {}
        x0 = L["0"](x)
        taps["1"] = x0
        x1 = L["1"](x0)
        taps["2"] = x1
        x2 = L["2"](x1)
        x3 = L["3"](x2)
        taps["3"] = x3
        x4 = L["4"](x3)
        x5 = L["5"](x4)
        taps["4"] = x5
        x6 = L["6"](x5)
        x7 = L["7"](x6)
        taps["5"] = x7
        x8 = L["8"](x7)
        x9 = L["9"](x8)
        x12 = L["12"](torch.cat([up(x9, scale_factor=2), x6], 1))
        x15 = L["15"](torch.cat([up(x12, scale_factor=2), x4], 1))
        taps["3_deep"] = x15
        x16 = L["16"](x15)
        x18 = L["18"](torch.cat([x16, x12], 1))
        taps["4_deep"] = x18
        x19 = L["19"](x18)
        x21 = L["21"](torch.cat([x19, x9], 1))
        taps["5_deep"] = x21
        return taps


def test_full_backbone_taps_match_torch_twin():
    torch.manual_seed(4)
    tm = TYoloBackbone()
    _randomize_bn(tm)
    tm.eval()

    fm = YOLOv8Backbone(width=0.125, depth=0.34, max_channels=768)
    x = np.random.default_rng(4).random((1, 64, 64, 3)).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = import_state_dict(params, _to_sd(tm, strip="layers."))
    ours = fm.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref[k].numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4, err_msg=f"tap {k}")
