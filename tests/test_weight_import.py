"""Weight-import tests: torch modules written inline (mirroring reference
layer semantics) -> state_dict -> flax import -> output parity.

This validates the full porting chain the BD-rate-parity goal depends on
(SURVEY.md hard part 5): name resolution (incl. Sequential indices and
ModuleList dotted names), OIHW->HWIO, Linear transpose, (1,C,1,1)->(1,1,1,C).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn

from vcm_ts_tpu.models.intra import IntraNoAR
from vcm_ts_tpu.ops import layers as L
from vcm_ts_tpu.utils.weight_import import (import_state_dict,
                                            load_torch_state_dict)


def nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


class TorchRBWS(nn.Module):
    """torch twin of ResidualBlockWithStride (reference layers.py:42-73)."""

    def __init__(self, in_ch, out_ch, stride=2):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1)
        self.downsample = nn.Conv2d(in_ch, out_ch, 1, stride)

    def forward(self, x):
        out = torch.nn.functional.leaky_relu(self.conv1(x), 0.01)
        out = torch.nn.functional.leaky_relu(self.conv2(out), 0.1)
        return out + self.downsample(x)


def test_import_residual_block_with_stride(tmp_path):
    tm = TorchRBWS(5, 7)
    pth = os.path.join(tmp_path, "m.pth")
    torch.save(tm.state_dict(), pth)

    fm = L.ResidualBlockWithStride(7, 2)
    x = np.random.default_rng(0).normal(size=(1, 8, 10, 5)).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = import_state_dict(params, load_torch_state_dict(pth))

    out = fm.apply(params, jnp.asarray(x))
    ref = tm(nchw(x))
    np.testing.assert_allclose(np.asarray(out), nhwc(ref), rtol=2e-5, atol=2e-5)


class TorchSE(nn.Module):
    """torch twin of SELayer (reference video_net.py:149-162)."""

    def __init__(self, ch, red=4):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(ch, ch // red, bias=False), nn.ReLU(inplace=True),
            nn.Linear(ch // red, ch, bias=False), nn.Sigmoid())

    def forward(self, x):
        y = torch.mean(x, dim=(-1, -2))
        return x * self.fc(y)[:, :, None, None]


def test_import_se_layer_with_sequential_indices(tmp_path):
    tm = TorchSE(8)
    pth = os.path.join(tmp_path, "se.pth")
    torch.save(tm.state_dict(), pth)

    fm = L.SELayer(8, reduction=4)
    x = np.random.default_rng(1).normal(size=(2, 4, 4, 8)).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = import_state_dict(params, load_torch_state_dict(pth))
    out = fm.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), nhwc(tm(nchw(x))),
                               rtol=2e-5, atol=2e-5)


def test_import_full_intra_model_synthetic(tmp_path):
    """Round-trip the whole IntraNoAR tree through a synthetic reference-style
    state dict (exact key names, torch layouts): strict import must cover
    every leaf and reproduce values."""
    model = IntraNoAR(N=32, anchor_num=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), 1.0)

    rng = np.random.default_rng(2)
    sd = {}

    def walk(node, prefix):
        for k, v in node.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
                continue
            arr = rng.normal(size=v.shape).astype(np.float32)
            if k == "kernel":
                tkey = path.rsplit(".", 1)[0] + ".weight"
                if arr.ndim == 4:
                    sd[tkey] = torch.from_numpy(arr.transpose(3, 2, 0, 1).copy())
                else:
                    sd[tkey] = torch.from_numpy(arr.T.copy())
            elif k == "bias":
                sd[path.rsplit(".", 1)[0] + ".bias"] = torch.from_numpy(arr)
            elif arr.ndim == 4 and arr.shape[:3] == (1, 1, 1):
                sd[path] = torch.from_numpy(arr.transpose(0, 3, 1, 2).copy())
            else:
                sd[path] = torch.from_numpy(arr)

    walk(params["params"], "")
    pth = os.path.join(tmp_path, "intra.pth")
    torch.save(sd, pth)

    imported = import_state_dict(params, load_torch_state_dict(pth))

    # spot-check value fidelity through both transforms
    k = np.asarray(imported["params"]["enc"]["0"]["conv1"]["kernel"])
    tk = sd["enc.0.conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(k, tk)
    qb = np.asarray(imported["params"]["q_basic"])
    np.testing.assert_array_equal(qb, sd["q_basic"].numpy().transpose(0, 2, 3, 1))
    h = np.asarray(imported["params"]["bit_estimator_z"]["f1"]["h"])
    np.testing.assert_array_equal(h, sd["bit_estimator_z.f1.h"].numpy()
                                  .transpose(0, 2, 3, 1))


def test_checkpointer_save_load_resume(tmp_path):
    from vcm_ts_tpu.train.checkpoint import CheckPointer

    model = L.ResidualBlock(4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    cp = CheckPointer(str(tmp_path))
    cp.save("ep3", params, None, epoch=3)

    fresh = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 4)))
    loaded, _, extra = cp.load(fresh)
    assert extra == {"epoch": 3}
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["conv1"]["kernel"]),
        np.asarray(params["params"]["conv1"]["kernel"]))
    assert cp.has_checkpoint()


def test_import_full_dmc_model_synthetic(tmp_path):
    """Strict full-tree import for DMC (the real checkpoint's structure):
    every leaf must be covered by a reference-style torch state dict."""
    from vcm_ts_tpu.models.dmc import DMC, make_dpb

    model = DMC(anchor_num=4, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")

    rng = np.random.default_rng(5)
    sd = {}

    def walk(node, prefix):
        for k, v in node.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
                continue
            arr = rng.normal(size=v.shape).astype(np.float32)
            if k == "kernel":
                tkey = path.rsplit(".", 1)[0] + ".weight"
                if arr.ndim == 4:
                    sd[tkey] = torch.from_numpy(arr.transpose(3, 2, 0, 1).copy())
                else:
                    sd[tkey] = torch.from_numpy(arr.T.copy())
            elif k == "bias":
                sd[path.rsplit(".", 1)[0] + ".bias"] = torch.from_numpy(arr)
            elif arr.ndim == 4 and arr.shape[:3] == (1, 1, 1):
                sd[path] = torch.from_numpy(arr.transpose(0, 3, 1, 2).copy())
            else:
                sd[path] = torch.from_numpy(arr)

    walk(params["params"], "")
    pth = os.path.join(tmp_path, "dmc.pth")
    torch.save(sd, pth)

    imported = import_state_dict(params, load_torch_state_dict(pth))
    # strict import succeeded => full coverage both directions; spot-check
    k = np.asarray(imported["params"]["optic_flow"]["moduleBasic.2"]["conv1"]["kernel"])
    tk = sd["optic_flow.moduleBasic.2.conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(k, tk)
    qb = np.asarray(imported["params"]["mv_y_q_basic"])
    np.testing.assert_array_equal(
        qb, sd["mv_y_q_basic"].numpy().transpose(0, 2, 3, 1))


def test_export_import_round_trip():
    """flax -> torch layout -> flax must be the identity (weight interop)."""
    from vcm_ts_tpu.models.intra import IntraNoAR
    from vcm_ts_tpu.utils.weight_export import flax_to_torch_state_dict

    model = IntraNoAR(N=32, anchor_num=4)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)), 1.0)
    sd = {k: torch.from_numpy(v)
          for k, v in flax_to_torch_state_dict(params).items()}
    back = import_state_dict(params, {k: v.numpy() for k, v in sd.items()})
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0][:20],
            jax.tree_util.tree_flatten_with_path(back)[0][:20]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _write_ultralytics_style_ckpt(path):
    """torch.save a checkpoint whose pickle references ultralytics-style
    classes, WITHOUT ultralytics installed: fake modules are registered in
    sys.modules just long enough for pickling (pickle's save_global
    verifies importability at save time)."""
    import sys
    import types

    fake_tasks = types.ModuleType("ultralytics.nn.tasks")

    class DetectionModel(nn.Module):
        pass

    DetectionModel.__module__ = "ultralytics.nn.tasks"
    DetectionModel.__qualname__ = "DetectionModel"
    fake_tasks.DetectionModel = DetectionModel

    fake_conv = types.ModuleType("ultralytics.nn.modules.conv")

    class Conv(nn.Module):
        def __init__(self, c1=3, c2=8):
            super().__init__()
            self.conv = nn.Conv2d(c1, c2, 3, padding=1, bias=False)
            self.bn = nn.BatchNorm2d(c2)

    Conv.__module__ = "ultralytics.nn.modules.conv"
    Conv.__qualname__ = "Conv"
    fake_conv.Conv = Conv

    model = DetectionModel()
    seq = nn.Sequential(Conv(3, 8), Conv(8, 16))
    model.add_module("model", seq)
    # a non-tensor ultralytics object in the ckpt dict, like train_args
    fake_cfg = types.ModuleType("ultralytics.cfg")

    class IterableSimpleNamespace:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    IterableSimpleNamespace.__module__ = "ultralytics.cfg"
    IterableSimpleNamespace.__qualname__ = "IterableSimpleNamespace"
    fake_cfg.IterableSimpleNamespace = IterableSimpleNamespace

    mods = {"ultralytics": types.ModuleType("ultralytics"),
            "ultralytics.nn": types.ModuleType("ultralytics.nn"),
            "ultralytics.nn.tasks": fake_tasks,
            "ultralytics.nn.modules": types.ModuleType(
                "ultralytics.nn.modules"),
            "ultralytics.nn.modules.conv": fake_conv,
            "ultralytics.cfg": fake_cfg}
    mods["ultralytics"].nn = mods["ultralytics.nn"]
    sys.modules.update(mods)
    try:
        torch.save({"model": model,
                    "train_args": IterableSimpleNamespace(imgsz=640),
                    "epoch": 3}, path)
        expect = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    finally:
        for k in mods:
            sys.modules.pop(k, None)
    return expect


def test_weights_only_unpickler_without_ultralytics(tmp_path):
    """VERDICT r4 next-step 7: yolov8m.pt-style checkpoints must load with
    no ultralytics importable. The load runs in a subprocess so no fake
    sys.modules entries can leak in and cheat."""
    import subprocess
    import sys

    pt = os.path.join(tmp_path, "fake_yolo.pt")
    expect = _write_ultralytics_style_ckpt(pt)
    out_npz = os.path.join(tmp_path, "out.npz")
    code = f"""
import sys
assert "ultralytics" not in sys.modules
import numpy as np
from vcm_ts_tpu.utils.weight_import import (
    extract_module_state_dict, load_torch_pickle_weights_only)
try:
    import ultralytics  # noqa: F401
    raise SystemExit("ultralytics importable - test proves nothing")
except ImportError:
    pass
ckpt = load_torch_pickle_weights_only({pt!r})
assert ckpt["epoch"] == 3
assert type(ckpt["model"]).__name__ == "DetectionModel"
assert ckpt["train_args"].__dict__.get("imgsz") == 640
sd = extract_module_state_dict(ckpt["model"])
np.savez({out_npz!r}, **sd)
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-4000:]
    got = dict(np.load(out_npz))
    assert set(got) == set(expect), (sorted(got)[:5], sorted(expect)[:5])
    for k in expect:
        np.testing.assert_array_equal(got[k], expect[k])


def test_import_yolo_weights_via_shim(tmp_path, monkeypatch):
    """import_yolo_weights end-to-end on a shim-loaded checkpoint: a tiny
    torch twin of the Flax YOLOv8 backbone's first layer family, saved
    under ultralytics-style class names, must land in the Flax params."""
    import sys
    import types

    from vcm_ts_tpu.train.yolo_v8 import YOLOv8Backbone
    from vcm_ts_tpu.utils.weight_import import (
        extract_module_state_dict, import_state_dict,
        load_torch_pickle_weights_only)

    # full-size torch twin is heavy; instead verify the mechanical chain:
    # shim-load -> extract -> import_state_dict covers a sub-tree template.
    fake_tasks = types.ModuleType("ultralytics.nn.tasks")

    class DetectionModel(nn.Module):
        pass

    DetectionModel.__module__ = "ultralytics.nn.tasks"
    DetectionModel.__qualname__ = "DetectionModel"
    fake_tasks.DetectionModel = DetectionModel
    mods = {"ultralytics": types.ModuleType("ultralytics"),
            "ultralytics.nn": types.ModuleType("ultralytics.nn"),
            "ultralytics.nn.tasks": fake_tasks}
    sys.modules.update(mods)
    try:
        tm = DetectionModel()
        inner = nn.Sequential()
        conv0 = nn.Module()
        conv0.add_module("conv", nn.Conv2d(3, 4, 3, stride=2,
                                           padding=1, bias=False))
        bn = nn.BatchNorm2d(4, eps=1e-3)
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.uniform_(-0.5, 0.5)
        bn.running_mean.uniform_(-0.1, 0.1)
        bn.running_var.uniform_(0.8, 1.2)
        conv0.add_module("bn", bn)
        inner.add_module("0", conv0)
        tm.add_module("model", inner)
        pt = os.path.join(tmp_path, "tiny.pt")
        torch.save({"model": tm}, pt)
    finally:
        for k in mods:
            sys.modules.pop(k, None)

    ckpt = load_torch_pickle_weights_only(pt)
    sd = {k: v for k, v in extract_module_state_dict(ckpt["model"]).items()
          if not k.endswith("num_batches_tracked")}
    assert "model.0.conv.weight" in sd

    import flax.linen as fnn

    class TinyFlax(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            from vcm_ts_tpu.train.yolo_v8 import ConvBnSiLU
            return ConvBnSiLU(4, 3, 2, name="model.0")(x)

    fm = TinyFlax()
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    imported = import_state_dict(params, sd, strict="cover")
    k = np.asarray(
        jax.tree_util.tree_leaves_with_path(imported)[0][1])
    assert np.isfinite(k).all()
    # torch twin forward parity
    x = np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        tm.eval()
        ty = torch.nn.functional.silu(
            bn(conv0.conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))))
    fy = fm.apply(imported, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fy),
                               ty.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-5, atol=2e-5)
