"""Context (sequence) parallelism: ring + Ulysses attention over a mesh axis.

The reference's main model-parallel axis is CP: latent-frame-sharded
activations with TransformerEngine ring-P2P attention (SURVEY §2.10,
wan2pt1.py:301-353) and, in the DiffSynth stack, xDiT "USP" Ulysses
all-to-all (wan_video_new_chronoedit.py:330-356).  TPU-native equivalents:

- :func:`ring_attention` — K/V blocks rotate around the ``context`` ring via
  ``jax.lax.ppermute``. When the head dim is MXU-shaped (D % 128 == 0) each
  hop runs the Pallas flash kernel (online-softmax tiles, O(block) VMEM) and
  hops are merged by logsumexp reweighting — so reasoning-mode 720p
  sequences (28.8k tokens) fit under CP without ever materializing a score
  block. Exact gradients come from a custom VJP that re-rotates K/V and
  feeds the *global* logsumexp to the flash backward kernels per hop
  (p = exp(q·k_hop - lse_global) is the globally-normalized probability
  block, so per-hop dq sums locally and dk/dv accumulate in buffers that
  rotate home with the ring). Small/odd head dims fall back to an exact
  dense per-hop merge.
- :func:`ulysses_attention` — two ``all_to_all`` reshards (seq <-> heads):
  each device attends over the full sequence for heads/C heads, through the
  normal attention dispatch (Pallas flash on TPU). Usually the better
  choice on ICI for moderate head counts.

Both are exposed as "inner" functions (for use inside an existing
``jax.shard_map``) and as self-contained wrappers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chronoedit_tpu.parallel.mesh import AXIS_CONTEXT


def _ring_perm(axis_size: int):
    return [(i, (i + 1) % axis_size) for i in range(axis_size)]


# ------------------------------------------------------------ dense ring

def ring_attention_dense_inner(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    axis_name: str, axis_size: int, scale: float | None = None,
) -> jnp.ndarray:
    """Dense-per-hop ring attention on sequence-sharded q/k/v (B,S_loc,H,D).

    Materializes one (B, S_loc, H, S_blk) fp32 score block per hop — exact
    and autodiff-friendly, but only viable at small sizes (tests, odd head
    dims). Production sizes use :func:`ring_flash_attention_inner`.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale
    b, s, h, d = q.shape

    acc = jnp.zeros((b, s, h, d), jnp.float32)
    m = jnp.full((b, s, h, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, s, h, 1), jnp.float32)
    k_cur, v_cur = k, v
    perm = _ring_perm(axis_size)

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


# ------------------------------------------------------------ flash ring

def _ring_flash_fwd_loop(q, k, v, axis_name, axis_size, scale):
    """axis_size flash hops merged by logsumexp reweighting.

    Per hop i the kernel returns a *normalized* block output o_i and its
    logsumexp lse_i; the exact total is sum_i exp(lse_i - lse_total) * o_i.
    The python loop is unrolled so XLA overlaps each ppermute hop with the
    previous block's kernel over ICI (TE ring P2P equivalent,
    wan2pt1.py:301-353).
    """
    from chronoedit_tpu.ops.flash_attention import flash_attention_with_lse

    perm = _ring_perm(axis_size)
    k_cur, v_cur = k, v
    out_f = lse_acc = None
    for step in range(axis_size):
        o_i, lse_i = flash_attention_with_lse(q, k_cur, v_cur, scale)
        if step == 0:
            out_f = o_i.astype(jnp.float32)
            lse_acc = lse_i
        else:
            lse_new = jnp.logaddexp(lse_acc, lse_i)
            out_f = (out_f * jnp.exp(lse_acc - lse_new)[..., None]
                     + o_i.astype(jnp.float32)
                     * jnp.exp(lse_i - lse_new)[..., None])
            lse_acc = lse_new
        if step != axis_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
    return out_f.astype(q.dtype), lse_acc


@functools.lru_cache(maxsize=None)
def _make_ring_flash(axis_name: str, axis_size: int, scale: float):
    @jax.custom_vjp
    def ring(q, k, v):
        out, _ = _ring_flash_fwd_loop(q, k, v, axis_name, axis_size, scale)
        return out

    def fwd(q, k, v):
        out, lse = _ring_flash_fwd_loop(q, k, v, axis_name, axis_size, scale)
        return out, (q, k, v, out, lse)

    def bwd(res, g):
        from chronoedit_tpu.ops.flash_attention import flash_attention_bwd

        q, k, v, out, lse = res
        perm = _ring_perm(axis_size)
        k_cur, v_cur = k, v
        dq = jnp.zeros(q.shape, jnp.float32)
        # dk/dv accumulate in fp32 buffers that rotate *with* their K/V
        # block: at hop t device i holds block (i-t) mod n and adds its
        # local contribution to it; after the final extra rotation each
        # buffer lands back on the block's owner.
        dk_rot = jnp.zeros(k.shape, jnp.float32)
        dv_rot = jnp.zeros(v.shape, jnp.float32)
        for step in range(axis_size):
            dq_h, dk_h, dv_h = flash_attention_bwd(
                q, k_cur, v_cur, out, g, lse, scale)
            dq = dq + dq_h.astype(jnp.float32)
            dk_rot = dk_rot + dk_h.astype(jnp.float32)
            dv_rot = dv_rot + dv_h.astype(jnp.float32)
            if step != axis_size - 1:
                k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
                v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
                dk_rot = jax.lax.ppermute(dk_rot, axis_name, perm)
                dv_rot = jax.lax.ppermute(dv_rot, axis_name, perm)
        dk_rot = jax.lax.ppermute(dk_rot, axis_name, perm)
        dv_rot = jax.lax.ppermute(dv_rot, axis_name, perm)
        return (dq.astype(q.dtype), dk_rot.astype(k.dtype),
                dv_rot.astype(v.dtype))

    ring.defvjp(fwd, bwd)
    return ring


def ring_flash_attention_inner(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    axis_name: str, axis_size: int, scale: float | None = None,
) -> jnp.ndarray:
    """Flash-kernel ring attention (Pallas hops + exact custom VJP)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _make_ring_flash(axis_name, axis_size, float(scale))(q, k, v)


def ring_attention_inner(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    axis_name: str, axis_size: int, scale: float | None = None,
) -> jnp.ndarray:
    """Ring attention on sequence-sharded q/k/v (B, S_local, H, D).

    Dispatches to the Pallas flash ring when the head dim is MXU-shaped,
    else the exact dense-per-hop merge.
    """
    if q.shape[-1] % 128 == 0:
        return ring_flash_attention_inner(q, k, v, axis_name, axis_size, scale)
    return ring_attention_dense_inner(q, k, v, axis_name, axis_size, scale)


# ------------------------------------------------------------ ulysses

def ulysses_attention_inner(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    axis_name: str, axis_size: int, scale: float | None = None,
    attn_fn=None,
) -> jnp.ndarray:
    """Ulysses attention on sequence-sharded q/k/v (B, S_local, H, D).

    all_to_all reshards seq->heads, runs local attention over the full
    sequence with H/axis_size heads (Pallas flash on TPU via the normal
    dispatch), then reshards back.
    """
    import functools as _ft

    from chronoedit_tpu.ops.attention import dot_product_attention

    # _sharded: this body already runs inside the CP shard_map, so the
    # Pallas kernel is legal here — without the flag the multi-device-world
    # guard would silently degrade it to dense XLA attention
    attn_fn = attn_fn or _ft.partial(dot_product_attention, _sharded=True)
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
    # under tensor parallelism the head axis is already TP-sharded (col-split
    # qkv projections) — keep it sharded inside the CP shard_map. Speccing
    # only the context axis would make GSPMD all-gather all heads over
    # `tensor` around every attention (round-2 HLO audit: 2 full-head f32
    # all-gathers per block on a tensor=2,context=4 mesh).
    tp_axis = "tensor" if "tensor" in mesh.shape else None
    tp = mesh.shape.get(tp_axis, 1) if tp_axis else 1
    head_axis = tp_axis if (tp > 1 and q.shape[2] % tp == 0) else None
    # likewise keep the batch dim data/fsdp-sharded (training meshes): an
    # unspecced batch would make GSPMD all-gather every rank's batch rows
    # around each attention
    import math

    batch_axes = tuple(a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1)
    if batch_axes and q.shape[0] % math.prod(mesh.shape[a] for a in batch_axes):
        batch_axes = ()
    spec = P(batch_axes if batch_axes else None, axis, head_axis, None)

    # check_vma=False: Pallas calls inside the body can't declare how their
    # outputs vary across mesh axes, so the vma checker rejects them.
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
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
