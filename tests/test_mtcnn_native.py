"""Native MTCNN tests: P/R/O-Net torch-twin parity (facenet_pytorch graph
semantics: VALID convs, PReLU, ceil-mode pools, (W,H,C) dense flatten),
pipeline math (PNet box generation, Union/Min NMS, bbreg, rerec), the
torch-free .npz load path, and end-to-end detect() plumbing.

Reference counterpart: facenet_pytorch MTCNN at video_coder.py:296-310."""

import json

import numpy as np
import pytest
import torch
from torch import nn as tnn

from vcm_ts_tpu.eval import mtcnn_native as mn
from vcm_ts_tpu.utils.weight_import import import_state_dict

cv = pytest.importorskip("cv2")


class TPNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 10, 3)
        self.prelu1 = tnn.PReLU(10)
        self.pool1 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(10, 16, 3)
        self.prelu2 = tnn.PReLU(16)
        self.conv3 = tnn.Conv2d(16, 32, 3)
        self.prelu3 = tnn.PReLU(32)
        self.conv4_1 = tnn.Conv2d(32, 2, 1)
        self.conv4_2 = tnn.Conv2d(32, 4, 1)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        a = torch.softmax(self.conv4_1(x), dim=1)
        b = self.conv4_2(x)
        return b, a


class TRNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 28, 3)
        self.prelu1 = tnn.PReLU(28)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(28, 48, 3)
        self.prelu2 = tnn.PReLU(48)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(48, 64, 2)
        self.prelu3 = tnn.PReLU(64)
        self.dense4 = tnn.Linear(576, 128)
        self.prelu4 = tnn.PReLU(128)
        self.dense5_1 = tnn.Linear(128, 2)
        self.dense5_2 = tnn.Linear(128, 4)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = x.permute(0, 3, 2, 1).contiguous()
        x = self.prelu4(self.dense4(x.view(x.shape[0], -1)))
        a = torch.softmax(self.dense5_1(x), dim=1)
        b = self.dense5_2(x)
        return b, a


class TONet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 32, 3)
        self.prelu1 = tnn.PReLU(32)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(32, 64, 3)
        self.prelu2 = tnn.PReLU(64)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(64, 64, 3)
        self.prelu3 = tnn.PReLU(64)
        self.pool3 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = tnn.Conv2d(64, 128, 2)
        self.prelu4 = tnn.PReLU(128)
        self.dense5 = tnn.Linear(1152, 256)
        self.prelu5 = tnn.PReLU(256)
        self.dense6_1 = tnn.Linear(256, 2)
        self.dense6_2 = tnn.Linear(256, 4)
        self.dense6_3 = tnn.Linear(256, 10)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.pool3(self.prelu3(self.conv3(x)))
        x = self.prelu4(self.conv4(x))
        x = x.permute(0, 3, 2, 1).contiguous()
        x = self.prelu5(self.dense5(x.view(x.shape[0], -1)))
        a = torch.softmax(self.dense6_1(x), dim=1)
        b = self.dense6_2(x)
        c = self.dense6_3(x)
        return b, c, a


def _randomize(tm):
    for p in tm.parameters():
        p.data.normal_(0, 0.3)


def _sd(tm):
    return {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


def _pair(flax_net, torch_net, x_nhwc, init_shape):
    import jax
    import jax.numpy as jnp

    torch_net.eval()
    params = flax_net.init(jax.random.PRNGKey(0), jnp.zeros(init_shape))
    params = import_state_dict(params, _sd(torch_net))
    ours = flax_net.apply(params, jnp.asarray(x_nhwc))
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    return ours, ref


def _check(ours, ref):
    for o, r in zip(ours, ref):
        r = r.numpy()
        if r.ndim == 4:
            r = r.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-4, atol=1e-5)


def test_pnet_matches_torch_twin():
    torch.manual_seed(20)
    tm = TPNet()
    _randomize(tm)
    pnet, _, _ = mn._build_nets()
    x = np.random.default_rng(20).normal(
        size=(1, 21, 27, 3)).astype(np.float32)  # odd sizes: ceil pool path
    ours, ref = _pair(pnet, tm, x, (1, 12, 12, 3))
    _check(ours, ref)


def test_rnet_matches_torch_twin():
    torch.manual_seed(21)
    tm = TRNet()
    _randomize(tm)
    _, rnet, _ = mn._build_nets()
    x = np.random.default_rng(21).normal(
        size=(2, 24, 24, 3)).astype(np.float32)
    ours, ref = _pair(rnet, tm, x, (1, 24, 24, 3))
    _check(ours, ref)


def test_onet_matches_torch_twin():
    torch.manual_seed(22)
    tm = TONet()
    _randomize(tm)
    _, _, onet = mn._build_nets()
    x = np.random.default_rng(22).normal(
        size=(2, 48, 48, 3)).astype(np.float32)
    ours, ref = _pair(onet, tm, x, (1, 48, 48, 3))
    _check(ours, ref)


def test_generate_bounding_boxes_math():
    probs = np.zeros((4, 5), np.float32)
    probs[1, 2] = 0.9  # cell (y=1, x=2)
    reg = np.zeros((4, 5, 4), np.float32)
    reg[1, 2] = [0.1, 0.2, 0.3, 0.4]
    out = mn.generate_bounding_boxes(reg, probs, scale=0.5, thresh=0.6)
    assert out.shape == (1, 9)
    # q1 = (stride*idx + 1)/scale, q2 = (stride*idx + 12)/scale
    np.testing.assert_allclose(out[0, :4], [(2 * 2 + 1) / 0.5,
                                            (2 * 1 + 1) / 0.5,
                                            (2 * 2 + 12) / 0.5,
                                            (2 * 1 + 12) / 0.5])
    assert out[0, 4] == pytest.approx(0.9)
    np.testing.assert_allclose(out[0, 5:], [0.1, 0.2, 0.3, 0.4])


def test_nms_union_vs_min_modes():
    boxes = np.array([[0, 0, 10, 10],
                      [0, 0, 5, 10]], np.float32)  # small inside big
    scores = np.array([0.9, 0.8], np.float32)
    # IoU = 66/121 ~ 0.55 ; Min = 66/66 = 1.0
    assert mn.nms_mtcnn(boxes, scores, 0.6, "union").tolist() == [0, 1]
    assert mn.nms_mtcnn(boxes, scores, 0.6, "min").tolist() == [0]


def test_bbreg_and_rerec():
    boxes = np.array([[10., 20., 19., 39., 0.9]])
    reg = np.array([[0.1, 0.1, -0.1, -0.1]])
    out = mn.bbreg(boxes, reg)  # w=10, h=20
    np.testing.assert_allclose(out[0, :4], [11, 22, 18, 37])
    sq = mn.rerec(np.array([[0., 0., 10., 20., 0.9]]))
    np.testing.assert_allclose(sq[0, :4], [-5, 0, 15, 20])  # square side 20


def _twin_npz(tmp_path):
    torch.manual_seed(23)
    nets = {"pnet": TPNet(), "rnet": TRNet(), "onet": TONet()}
    sd = {}
    for name, tm in nets.items():
        _randomize(tm)
        tm.eval()
        for k, v in _sd(tm).items():
            sd[f"{name}.{k}"] = v
    path = str(tmp_path / "mtcnn.npz")
    np.savez(path, __meta__=json.dumps({"format": "mtcnn-v1"}), **sd)
    return path, nets


def test_npz_load_and_detect_end_to_end(tmp_path):
    """Torch-free load path + the full cascade on a real frame size: with
    open thresholds the pipeline must produce well-formed in-bounds boxes
    through all three stages (random weights: plumbing, not accuracy)."""
    path, nets = _twin_npz(tmp_path)
    det = mn.MTCNNNativeDetector.load(path, thresholds=(0.0, 0.0, 0.0))

    # loaded params reproduce the torch twin (PNet spot check)
    import jax.numpy as jnp

    x = np.random.default_rng(23).normal(
        size=(1, 15, 17, 3)).astype(np.float32)
    reg, probs = det.pnet.apply(det.params["pnet"], jnp.asarray(x))
    with torch.no_grad():
        rb, ra = nets["pnet"](torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(reg),
                               rb.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs),
                               ra.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)

    frame = (np.random.default_rng(24).random((60, 80, 3)) * 255
             ).astype(np.uint8)
    boxes, scores = det.detect(frame)
    assert boxes.shape[0] > 0 and boxes.shape[1] == 4
    assert scores.shape == (boxes.shape[0],)
    assert (boxes[:, [0, 2]] >= 0).all() and (boxes[:, [0, 2]] <= 80).all()
    assert (boxes[:, [1, 3]] >= 0).all() and (boxes[:, [1, 3]] <= 60).all()

    adapter = mn.build_face_adapter(path)
    b, s = adapter(frame)
    assert b.shape[1] == 4 and s.ndim == 1
