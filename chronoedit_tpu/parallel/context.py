"""Context (sequence) parallelism: ring + Ulysses attention over a mesh axis.

The reference's main model-parallel axis is CP: latent-frame-sharded
activations with TransformerEngine ring-P2P attention (SURVEY §2.10,
wan2pt1.py:301-353) and, in the DiffSynth stack, xDiT "USP" Ulysses
all-to-all (wan_video_new_chronoedit.py:330-356).  TPU-native equivalents:

- :func:`ring_attention` — K/V blocks rotate around the ``context`` ring via
  ``jax.lax.ppermute`` with a numerically-stable online-softmax merge; the
  python loop is unrolled so XLA overlaps each hop with the previous block's
  compute over ICI.
- :func:`ulysses_attention` — two ``all_to_all`` reshards (seq <-> heads):
  each device attends over the full sequence for heads/C heads.  Usually the
  better choice on ICI for moderate head counts.

Both are exposed as "inner" functions (for use inside an existing
``jax.shard_map``) and as self-contained wrappers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chronoedit_tpu.parallel.mesh import AXIS_CONTEXT


# ------------------------------------------------------------------ inner

def ring_attention_inner(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    axis_name: str, axis_size: int, scale: float | None = None,
) -> jnp.ndarray:
    """Ring attention on sequence-sharded q/k/v (B, S_local, H, D).

    Each of ``axis_size`` steps attends q against the currently-held K/V
    block, then rotates K/V to the next ring neighbor. Online-softmax carry
    (acc, row-max, row-sum) makes the result exact.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale
    b, s, h, d = q.shape

    acc = jnp.zeros((b, s, h, d), jnp.float32)
    m = jnp.full((b, s, h, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, s, h, 1), jnp.float32)
    k_cur, v_cur = k, v
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    for step in range(axis_size):
        s_blk = jnp.einsum("bqhd,bkhd->bqhk", qf, k_cur.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s_blk, axis=-1, keepdims=True))
        p = jnp.exp(s_blk - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bqhk,bkhd->bqhd", p,
                                       v_cur.astype(jnp.float32),
                                       preferred_element_type=jnp.float32)
        m = m_new
        if step != axis_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
    return (acc / l).astype(q.dtype)


def ulysses_attention_inner(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    axis_name: str, axis_size: int, scale: float | None = None,
    attn_fn=None,
) -> jnp.ndarray:
    """Ulysses attention on sequence-sharded q/k/v (B, S_local, H, D).

    all_to_all reshards seq->heads, runs dense local attention over the full
    sequence with H/axis_size heads, then reshards back.
    """
    from chronoedit_tpu.ops.attention import dot_product_attention

    attn_fn = attn_fn or dot_product_attention
    if q.shape[2] % axis_size:
        raise ValueError(f"heads {q.shape[2]} not divisible by axis size {axis_size}")

    def fwd(x):  # (B, S_loc, H, D) -> (B, S_glob, H_loc, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    def bwd(x):  # inverse reshard
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    out = attn_fn(fwd(q), fwd(k), fwd(v), scale=scale)
    return bwd(out)


# ------------------------------------------------------------------ wrappers

def _wrap(inner, q, k, v, mesh: Mesh, scale=None, axis: str = AXIS_CONTEXT):
    axis_size = mesh.shape[axis]
    spec = P(None, axis, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )
    def run(qi, ki, vi):
        return inner(qi, ki, vi, axis, axis_size, scale)

    return run(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, scale=None, axis: str = AXIS_CONTEXT):
    """Self-contained ring attention; q/k/v (B, S, H, D) sharded (or to be
    sharded) on the sequence dim over ``axis``."""
    return _wrap(ring_attention_inner, q, k, v, mesh, scale, axis)


def ulysses_attention(q, k, v, mesh: Mesh, scale=None, axis: str = AXIS_CONTEXT):
    return _wrap(ulysses_attention_inner, q, k, v, mesh, scale, axis)


# ------------------------------------------------------------------ seq split

def split_sequence(x: jnp.ndarray, mesh: Mesh, seq_dim: int = 2,
                   axis: str = AXIS_CONTEXT) -> jnp.ndarray:
    """Lay a tensor out sharded along its sequence dim over the context axis
    (the reference's broadcast_split_tensor, context_parallel.py:27-55)."""
    spec = [None] * x.ndim
    spec[seq_dim] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def gather_sequence(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Re-replicate (cat_outputs_cp, context_parallel.py:58-89)."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))
