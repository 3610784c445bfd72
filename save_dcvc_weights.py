"""Export trained weights as a standalone DCVC-HEM-format .pth.

Port of the reference save_dcvc_weights.py:6-41: strips the `dmc.` prefix
from torch checkpoints, and additionally exports this framework's native
.ckpt files to the reference's torch layout (OIHW etc.) via
vcm_ts_tpu/utils/weight_export.py — so models trained on TPU are loadable
by the upstream PyTorch ecosystem.
"""

from __future__ import annotations

import argparse


def save_weights(weights_path: str, out_path: str):
    import torch

    if weights_path.endswith(".ckpt"):
        import jax
        import jax.numpy as jnp

        from vcm_ts_tpu.models.dmc import DMC, make_dpb
        from vcm_ts_tpu.train.checkpoint import CheckPointer
        from vcm_ts_tpu.utils.weight_export import save_torch_state_dict

        model = DMC()
        x0 = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0),
                            1.0, 1.0, method="init_all")
        params, _, _ = CheckPointer().load(params, path=weights_path,
                                           use_latest=False)
        return save_torch_state_dict(params, out_path)

    weights = torch.load(weights_path, map_location="cpu")
    if "model" in weights:
        weights = weights["model"]
    new_state_dict = {name.replace("dmc.", ""): param
                      for name, param in weights.items()}
    torch.save(new_state_dict, out_path)
    return new_state_dict


def main():
    parser = argparse.ArgumentParser(
        description="Save trained weights in pth file for DCVC-HEM model")
    parser.add_argument("--weights-path", dest="weights_path", type=str,
                        required=True)
    parser.add_argument("--out-path", dest="out_path", type=str, required=True)
    args = parser.parse_args()

    sd = save_weights(args.weights_path, args.out_path)
    print("Save DCVC-HEM weights in " + args.out_path)
    for name in sorted(sd):
        print(name)


if __name__ == "__main__":
    main()
