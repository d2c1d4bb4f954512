"""Ring/Ulysses context-parallel attention wired inside the DiT must match
the GSPMD path and the single-device reference exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.parallel import MeshConfig, make_mesh, shard_params
from chronoedit_tpu.parallel.sharding import dit_param_sharding
from tests.test_dit import TINY, _inputs, _randomize


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_cp_attention_modes_match_reference(mode):
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY, b=2, t=2, h=4, w=4)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    ref = dit_lib.dit_forward(params, TINY, *args)

    cfg = dataclasses.replace(TINY, context_parallel=mode)
    mesh = make_mesh(MeshConfig(data=4, context=2))
    sharded = shard_params(params, mesh, dit_param_sharding(mesh))
    with mesh:
        fwd = jax.jit(lambda p, *a: dit_lib.dit_forward(p, cfg, *a, mesh=mesh))
        out = fwd(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_head_sharded_attention_matches_reference():
    """With a tensor axis > 1 and a mesh passed, attention runs inside a
    head-axis shard_map (the Pallas-under-GSPMD path) — output must be
    identical."""
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY, b=2)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    ref = dit_lib.dit_forward(params, TINY, *args)

    mesh = make_mesh(MeshConfig(data=4, tensor=2))  # heads=2 % 2 == 0
    sharded = shard_params(params, mesh, dit_param_sharding(mesh))
    with mesh:
        fwd = jax.jit(lambda p, *a: dit_lib.dit_forward(p, TINY, *a, mesh=mesh))
        out = fwd(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_cp_falls_back_when_seq_indivisible():
    """Sequence not divisible by the context size -> dense attention path,
    same result."""
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY, b=1, t=3, h=2, w=2)  # S = 3*1*1 = 3
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    ref = dit_lib.dit_forward(params, TINY, *args)
    cfg = dataclasses.replace(TINY, context_parallel="ring")
    mesh = make_mesh(MeshConfig(data=4, context=2))
    with mesh:
        out = dit_lib.dit_forward(params, cfg, *args, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
