"""Remat policies (SAC equivalents) and dtype-policy robustness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.models import dit as dit_lib
from tests.test_dit import TINY, _inputs, _randomize


def _loss(params, cfg, args):
    out = dit_lib.dit_forward(params, cfg, *args)
    return jnp.sum(out.astype(jnp.float32) ** 2)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["full", "matmul_only"])
def test_remat_modes_match_values_and_grads(mode):
    """jax.checkpoint policies must not change math — only memory."""
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))

    cfg_r = dataclasses.replace(TINY, remat=mode)
    v0, g0 = jax.value_and_grad(_loss)(params, TINY, args)
    v1, g1 = jax.value_and_grad(_loss)(params, cfg_r, args)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bf16_compute_close_to_fp32():
    """bf16 stream with fp32 norms (the production dtype policy) stays close
    to the all-fp32 forward."""
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    ref = dit_lib.dit_forward(params, TINY, *args)
    cfg_bf16 = dataclasses.replace(TINY, dtype=jnp.bfloat16)
    out = dit_lib.dit_forward(params, cfg_bf16, *args).astype(jnp.float32)
    # bf16 has ~8 bits of mantissa; relative agreement ~1e-2 on O(1) outputs
    err = float(jnp.abs(out - ref).max())
    scale = float(jnp.abs(ref).max())
    assert err < 0.05 * scale, (err, scale)


def test_per_frame_timesteps_differ_from_shared():
    """Distinct per-frame timesteps must actually change per-frame outputs
    (the native training API, wan2pt1.py timesteps_B_T)."""
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, _, text, img = _inputs(TINY)
    args = (jnp.asarray(x),)
    shared = dit_lib.dit_forward(params, TINY, jnp.asarray(x),
                                 jnp.asarray([100.0]), jnp.asarray(text),
                                 jnp.asarray(img))
    per_frame = dit_lib.dit_forward(params, TINY, jnp.asarray(x),
                                    jnp.asarray([[100.0, 900.0]]),
                                    jnp.asarray(text), jnp.asarray(img))
    # uniform per-frame vector == scalar broadcast (consistency)
    uniform = dit_lib.dit_forward(params, TINY, jnp.asarray(x),
                                  jnp.asarray([[100.0, 100.0]]),
                                  jnp.asarray(text), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(uniform), np.asarray(shared), atol=1e-6)
    # distinct per-frame timesteps change the output (both frames: self-
    # attention mixes tokens across frames, so even frame 0 shifts)
    assert float(jnp.abs(per_frame - shared).max()) > 1e-3
