"""Extract SpyNet (optic_flow) weights from a DCVC-HEM checkpoint.

Port of the reference save_spynet_weights.py:9-61 with its load-back
verification, supporting both reference .pth files and this framework's
.ckpt files.
"""

from __future__ import annotations

import argparse

import numpy as np


def save_weights(weights_path: str, out_path: str):
    import torch

    if weights_path.endswith(".ckpt"):
        import jax
        import jax.numpy as jnp

        from vcm_ts_tpu.models.dmc import DMC, make_dpb
        from vcm_ts_tpu.train.checkpoint import CheckPointer
        from vcm_ts_tpu.utils.weight_export import flax_to_torch_state_dict

        model = DMC()
        x0 = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0),
                            1.0, 1.0, method="init_all")
        params, _, _ = CheckPointer().load(params, path=weights_path,
                                           use_latest=False)
        sd = flax_to_torch_state_dict(params)
        new_state_dict = {k: torch.from_numpy(v) for k, v in sd.items()
                          if "optic_flow" in k}
    else:
        weights = torch.load(weights_path, map_location="cpu")
        new_state_dict = {name: param for name, param in weights.items()
                          if "optic_flow" in name}
    torch.save(new_state_dict, out_path)

    # load-back verification: importing only these weights into a fresh model
    # must change exactly the optic_flow parameters
    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.utils.weight_import import (import_state_dict,
                                                load_torch_state_dict)

    model = DMC()
    x0 = jnp.zeros((1, 64, 64, 3))
    fresh = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0),
                       1.0, 1.0, method="init_all")
    loaded = import_state_dict(fresh, load_torch_state_dict(out_path),
                               strict=False)
    for key in fresh["params"]:
        a = jax.tree_util.tree_leaves(fresh["params"][key])
        b = jax.tree_util.tree_leaves(loaded["params"][key])
        changed = any(not np.array_equal(np.asarray(x), np.asarray(y))
                      for x, y in zip(a, b))
        if key == "optic_flow":
            assert changed, "optic_flow weights were not loaded"
        else:
            assert not changed, f"unexpected change in {key}"
    return new_state_dict


def main():
    parser = argparse.ArgumentParser(
        description="Save SpyNet weights in pth file from DCVC-HEM model")
    parser.add_argument("--weights-path", dest="weights_path", type=str,
                        required=True)
    parser.add_argument("--out-path", dest="out_path", type=str, required=True)
    args = parser.parse_args()
    sd = save_weights(args.weights_path, args.out_path)
    print("Save SpyNet weights in " + args.out_path)
    for name in sorted(sd):
        print(name)


if __name__ == "__main__":
    main()
