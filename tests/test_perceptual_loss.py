"""Perceptual-loss tests: the Flax ResNet-50 trunk is validated against an
inline torchvision-free torch twin for one bottleneck, and the loss obeys
its metric properties. Full-checkpoint import is covered by a synthetic
reference-style state dict (torchvision itself is not in the image)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn as tnn

from vcm_ts_tpu.train.losses import (Bottleneck, FasterRCNNFPNPerceptualLoss,
                                     FasterRCNNResNetPerceptualLoss,
                                     ResNet50Body)
from vcm_ts_tpu.utils.weight_import import import_state_dict


class TorchBottleneck(tnn.Module):
    """torchvision-style bottleneck twin for parity checking."""

    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
            tnn.BatchNorm2d(width * 4))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + self.downsample(x))


def test_bottleneck_matches_torch_twin(tmp_path):
    torch.manual_seed(0)
    tm = TorchBottleneck(8, 4, 2)
    # randomize BN stats so frozen-BN import is actually exercised
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    tm.eval()
    sd_path = tmp_path / "b.pth"
    torch.save(tm.state_dict(), sd_path)

    fm = Bottleneck(4, 2, True)
    x = np.random.default_rng(0).normal(size=(1, 8, 8, 8)).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    from vcm_ts_tpu.utils.weight_import import load_torch_state_dict
    params = import_state_dict(params, load_torch_state_dict(str(sd_path)))

    out = fm.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cls", [FasterRCNNResNetPerceptualLoss,
                                 FasterRCNNFPNPerceptualLoss])
def test_perceptual_loss_metric_properties(cls):
    model = cls()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, x)

    same = np.asarray(model.apply(params, x, x))
    assert same.shape == (2,)
    np.testing.assert_allclose(same, 0.0, atol=1e-8)

    y = jnp.clip(x + 0.1 * rng.standard_normal(x.shape).astype(np.float32),
                 0, 1)
    diff = np.asarray(model.apply(params, x, y))
    assert np.all(diff > 0)

    # gradients flow to the decoded input (the codec output)
    g = jax.grad(lambda a: jnp.sum(model.apply(params, a, y)))(x)
    assert float(jnp.abs(g).max()) > 0


def test_resnet50_body_has_torchvision_key_structure():
    model = ResNet50Body()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    p = params["params"]
    assert "conv1" in p and "bn1" in p
    assert set(p["layer1"].keys()) == {"0", "1", "2"}
    assert "downsample" in p["layer1"]["0"]
    assert "running_mean" in p["layer1"]["0"]["bn1"]
    assert p["layer4"]["2"]["conv3"]["kernel"].shape == (1, 1, 512, 2048)


def test_yolov8_backbone_structure_and_loss():
    """YOLOv8 graph at a tiny scale: tap shapes follow the architecture
    (P1..P5 + three neck levels) and the loss obeys metric properties."""
    from vcm_ts_tpu.train.yolo_v8 import YOLOv8Backbone, YOLOV8PerceptualLoss

    net = YOLOv8Backbone(width=0.125, depth=0.34, max_channels=768)
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    taps = net.apply(params, x)
    assert set(taps) == {"1", "2", "3", "4", "5", "3_deep", "4_deep",
                         "5_deep"}
    assert taps["1"].shape == (1, 32, 32, 8)       # P1/2, 64*0.125
    assert taps["3"].shape == (1, 8, 8, 32)        # P3/8
    assert taps["5"].shape == (1, 2, 2, 128)       # P5/32
    assert taps["3_deep"].shape == (1, 8, 8, 32)   # neck C2f @ P3
    assert taps["5_deep"].shape == (1, 2, 2, 128)  # neck C2f @ P5
    # ultralytics state-dict-shaped param tree
    p = params["params"]
    assert "0" in p and "conv" in p["0"] and "bn" in p["0"]
    assert "m.0" in p["2"] and "cv1" in p["2"]["m.0"]

    pl = YOLOV8PerceptualLoss(width=0.125, depth=0.34)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((2, 60, 60, 3)), jnp.float32)  # pads to 64
    pp = pl.init(jax.random.PRNGKey(1), a, a)
    same = np.asarray(pl.apply(pp, a, a))
    np.testing.assert_allclose(same, 0.0, atol=1e-10)
    b = jnp.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32),
                 0, 1)
    assert np.all(np.asarray(pl.apply(pp, a, b)) > 0)
