"""Mixed-precision inference policy (utils/precision.py).

The policy: bf16 everywhere except the reconstruction-path modules and
the q-scale scalars, which stay f32 so Flax's promote-dtype semantics
run their compute in f32. These tests pin (a) which leaves the cast
touches, (b) that the mixed forward runs end-to-end and its recon lands
between the f32 and bf16 operating points in agreement with f32 (the
whole point of the policy), (c) output dtype promotion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcm_ts_tpu.models.dmc import DMC, make_dpb
from vcm_ts_tpu.utils.precision import (RECON_F32_MODULES, cast_params,
                                        cast_params_mixed)


@pytest.fixture(scope="module")
def tiny():
    model = DMC(anchor_num=4, channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = make_dpb(x, 16, 24)
    params = model.init(jax.random.PRNGKey(0), x, dpb, 1.0, 1.0,
                        method="init_all")
    return model, params


def test_cast_respects_module_list(tiny):
    _, params = tiny
    mixed = cast_params_mixed(params)

    kept, cast = [], []

    def walk(path, v):
        keys = {getattr(p, "key", None) for p in path}
        if v.dtype == jnp.float32:
            kept.append(keys)
        elif v.dtype == jnp.bfloat16:
            cast.append(keys)
        return v

    jax.tree_util.tree_map_with_path(walk, mixed)
    assert kept and cast
    # every surviving f32 leaf is inside a listed module/param
    for keys in kept:
        assert keys & set(RECON_F32_MODULES), keys
    # no listed module leaked into the bf16 set
    for keys in cast:
        assert not (keys & set(RECON_F32_MODULES)), keys
    # the heavies are on the right sides
    assert any("recon_generation_net" in k for k in kept)
    assert any("contextual_encoder" in k for k in cast)


def test_wholesale_cast(tiny):
    _, params = tiny
    b = cast_params(params, jnp.bfloat16)
    dtypes = {v.dtype for v in jax.tree_util.tree_leaves(b)}
    assert jnp.float32 not in dtypes


def test_mixed_forward_tracks_f32(tiny):
    model, params = tiny
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)

    def recon(p, dt):
        dpb = jax.tree_util.tree_map(lambda v: v.astype(dt),
                                     make_dpb(ref, 16, 24))
        out = model.apply(p, x.astype(dt), dpb, 1.0, 1.0, is_first_p=True)
        return np.asarray(out["dpb"]["ref_frame"], np.float64)

    r_f32 = recon(params, jnp.float32)
    r_bf16 = recon(cast_params(params, jnp.bfloat16), jnp.bfloat16)
    r_mixed = recon(cast_params_mixed(params), jnp.bfloat16)

    def agree_db(a, b):
        mse = np.mean((a - b) ** 2)
        return -10.0 * np.log10(mse + 1e-12)

    db_bf16, db_mixed = agree_db(r_f32, r_bf16), agree_db(r_f32, r_mixed)
    # mixed must agree with f32 strictly better than wholesale bf16 does
    assert db_mixed > db_bf16 + 3.0, (db_mixed, db_bf16)


def test_mixed_recon_promotes_to_f32(tiny):
    model, params = tiny
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    dpb = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                 make_dpb(x, 16, 24))
    out = model.apply(cast_params_mixed(params), x, dpb, 1.0, 1.0,
                      is_first_p=True)
    # f32 params in the recon path promote the output back to f32
    assert out["dpb"]["ref_frame"].dtype == jnp.float32
