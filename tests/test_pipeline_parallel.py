"""GPipe pipeline parallelism over the pipe mesh axis: stage-sharded block
scan must match the plain scan exactly, forward and backward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.parallel import MeshConfig, make_mesh, shard_params
from chronoedit_tpu.parallel.pipeline_parallel import gpipe_scan
from chronoedit_tpu.parallel.sharding import dit_param_sharding
from tests.test_dit import TINY, _inputs, _randomize


@pytest.mark.slow
def test_gpipe_scan_matches_plain_scan():
    """Generic harness: toy per-layer affine blocks, 4 stages, grads too."""
    mesh = make_mesh(MeshConfig(data=2, pipe=4))
    L, B, D = 8, 4, 16
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((L, D, D)).astype(np.float32) * 0.2)
    bctx = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    def block(lp, x_cur, ctx):
        return jnp.tanh(x_cur @ lp + ctx)

    def plain(w, x, bctx):
        def body(c, lp):
            return block(lp, c, bctx), None
        return jax.lax.scan(body, x, w)[0]

    with mesh:
        got = gpipe_scan(block, w, x, bctx, mesh)
    want = plain(w, x, bctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def loss_pp(w, x, bctx):
        with mesh:
            return jnp.sum(gpipe_scan(block, w, x, bctx, mesh) ** 2)

    def loss_plain(w, x, bctx):
        return jnp.sum(plain(w, x, bctx) ** 2)

    g1 = jax.grad(loss_pp, argnums=(0, 1, 2))(w, x, bctx)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(w, x, bctx)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("cp_mode", [
    pytest.param("ulysses", marks=pytest.mark.slow),  # 14 s: full tier
    "ring",
])
def test_dit_pipe_context_composed(cp_mode):
    """PP x CP (round-3, VERDICT #5): tokens context-sharded INSIDE pipeline
    stages, ring/Ulysses attention over the context axis name, per-frame
    modulation and RoPE sliced to the shard — must bit-match the
    single-device forward."""
    cfg = dataclasses.replace(TINY, context_parallel=cp_mode)
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(cfg, b=4)
    args = [jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img)]
    ref = dit_lib.dit_forward(params, cfg, *args)

    mesh = make_mesh(MeshConfig(data=2, pipe=2, context=2))
    sharded = shard_params(params, mesh, dit_param_sharding(mesh))
    with mesh:
        fwd = jax.jit(lambda p, *a: dit_lib.dit_forward(p, cfg, *a, mesh=mesh))
        out = fwd(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dit_pipe_context_reasoning_shape():
    """8-frame (temporal-reasoning) geometry under a pipe x context mesh:
    whole-frames-per-shard regime of the in-stage frame slicing."""
    cfg = TINY
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(2), cfg),
                        jax.random.PRNGKey(3))
    x, ts, text, img = _inputs(cfg, b=2, t=8)
    args = [jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img)]
    ref = dit_lib.dit_forward(params, cfg, *args)

    mesh = make_mesh(MeshConfig(data=1, pipe=2, context=4))
    sharded = shard_params(params, mesh, dit_param_sharding(mesh))
    with mesh:
        fwd = jax.jit(lambda p, *a: dit_lib.dit_forward(p, cfg, *a, mesh=mesh))
        out = fwd(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pipe,layer_mask", [
    (2, False),
    pytest.param(4, False, marks=pytest.mark.slow),  # 16 s: full tier
    (2, True),
])
def test_dit_pipeline_parallel_matches_single_device(pipe, layer_mask):
    cfg = dataclasses.replace(TINY, num_layers=4) if pipe == 4 else TINY
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(cfg, b=4)
    args = [jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img)]
    mask = None
    if layer_mask:
        mask = jnp.asarray([1.0, 0.0])  # SLG skip of block 1
    ref = dit_lib.dit_forward(params, cfg, *args, layer_mask=mask)

    mesh = make_mesh(MeshConfig(data=8 // pipe, pipe=pipe))
    sharded = shard_params(params, mesh, dit_param_sharding(mesh))
    with mesh:
        fwd = jax.jit(lambda p, *a: dit_lib.dit_forward(
            p, cfg, *a, layer_mask=mask, mesh=mesh))
        out = fwd(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
