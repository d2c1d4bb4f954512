"""Sharded fused-norm dispatch (ops/fused_norms.py, mesh= path).

On the 8-device CPU mesh the Pallas kernels fall back to the jnp bodies, so
these tests exercise the *sharding* machinery — shard_map specs, per-shard
frame slicing (both regimes of :func:`local_frame_slice`), the tensor-axis
psum for the "across heads" rms statistics, and gradient flow — against the
unsharded formulations.  The kernels themselves are covered by
``tools/check_fused_norms.py`` on TPU and the AOT HLO assertions in
``test_tpu_aot_compile.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from chronoedit_tpu.ops import fused_norms as F
from chronoedit_tpu.ops import layers as L

B, D = 2, 128


def _mesh(shape, axes):
    return Mesh(np.array(jax.devices()).reshape(shape), axes)


def _data(t, hw, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    x = jax.random.normal(ks[0], (B, t * hw, D), jnp.float32)
    sc = jax.random.normal(ks[1], (B, t, D), jnp.float32)
    sh = jax.random.normal(ks[2], (B, t, D), jnp.float32)
    return x, sc, sh


@pytest.mark.parametrize("t,hw", [(8, 64), (2, 64)])
def test_lnmod_sharded_matches_unsharded(t, hw):
    """cp=4 with T=8 -> whole frames per shard; T=2 -> shards within frame."""
    mesh = _mesh((2, 4), ("tensor", "context"))
    x, sc, sh = _data(t, hw)
    ref = F._lnmod_jnp(x, sc, sh, hw, 1e-6)
    out = jax.jit(
        lambda *a: F.layer_norm_modulate(*a, hw, 1e-6, mesh=mesh))(x, sc, sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("t,hw", [(8, 64), (2, 64)])
def test_gated_residual_sharded(t, hw):
    mesh = _mesh((2, 4), ("tensor", "context"))
    x, gate, _ = _data(t, hw, key=1)
    delta = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)
    ref = F._gate_jnp(x, delta, gate, hw)
    out = jax.jit(
        lambda *a: F.gated_residual(*a, hw, mesh=mesh))(x, delta, gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rms_sharded_tensor_psum():
    """Feature dim tensor-sharded: the full-D statistics need the psum."""
    mesh = _mesh((4, 2), ("tensor", "context"))
    x, _, _ = _data(2, 64, key=2)
    w = {"scale": jax.random.normal(jax.random.PRNGKey(3), (D,), jnp.float32)}
    ref = L.rms_norm(w, x, 1e-6)
    out = jax.jit(lambda w, x: F.rms_norm_fused(w, x, 1e-6, mesh=mesh))(w, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_lnmod_sharded_grads():
    mesh = _mesh((2, 4), ("tensor", "context"))
    x, sc, sh = _data(2, 64, key=4)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g = jax.grad(loss(lambda *a: F.layer_norm_modulate(
        *a, 64, 1e-6, mesh=mesh)), argnums=(0, 1, 2))(x, sc, sh)
    g_ref = jax.grad(loss(lambda *a: F._lnmod_jnp(*a, 64, 1e-6)),
                     argnums=(0, 1, 2))(x, sc, sh)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4)


def test_indivisible_sequence_falls_back():
    """S not divisible by cp: dispatch must fall back to the GSPMD-
    partitionable jnp path, not crash in shard_map."""
    mesh = _mesh((2, 4), ("tensor", "context"))
    hw = 36  # S = 72, cp = 4 -> 72 % 4 == 0 but s_local=18, hw=36: 36%18==0 ok
    hw = 33  # S = 66, 66 % 4 != 0 -> fallback
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (B, 2 * hw, D), jnp.float32)
    sc = jax.random.normal(ks[1], (B, 2, D), jnp.float32)
    sh = jax.random.normal(ks[2], (B, 2, D), jnp.float32)
    ref = F._lnmod_jnp(x, sc, sh, hw, 1e-6)
    out = F.layer_norm_modulate(x, sc, sh, hw, 1e-6, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_frames_map_locally():
    assert F.frames_map_locally(7200, 3600, 4)      # edit 720p, t2c4
    assert F.frames_map_locally(28800, 3600, 4)     # reasoning
    assert F.frames_map_locally(28800, 3600, 8)
    assert not F.frames_map_locally(66, 33, 4)      # S % cp != 0
    assert not F.frames_map_locally(7200, 2400, 4)  # 1800 vs 2400: neither


def test_quantize_idempotent():
    """advisor r2: pipeline.quantize() twice must be a no-op, not a KeyError."""
    import dataclasses

    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.ops.quant import quantize_dit_params

    cfg = dataclasses.replace(
        chronoedit_14b().dit, num_heads=1, head_dim=128, ffn_dim=256,
        text_dim=64, image_dim=None, num_layers=2)
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
    q1 = quantize_dit_params(params)
    q2 = quantize_dit_params(q1)
    a = jax.tree_util.tree_leaves(q1)
    b = jax.tree_util.tree_leaves(q2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
