"""Pallas TPU flash-attention kernel.

Replaces the reference's TransformerEngine/flash-attn/cuDNN attention stack
(SURVEY §2.9) with a single online-softmax kernel tiled for the MXU.

Layout: (B, S, H, D). The kernel computes over a (batch*head, q_block) grid
with K/V streamed block-by-block through VMEM; softmax statistics (running
max / sum) live in VMEM scratch. Falls back (raises NotImplementedError) for
shapes the kernel does not support so the XLA path can take over.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables: q tile rows and kv tile rows. 512x512 keeps VMEM well under
# budget at D=128 (q 512*128*2B = 128KB; k/v same; f32 accum 512*128*4B).
_BLOCK_Q = 512
_BLOCK_KV = 512


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """One (q_block, full KV) flash-attention pass.

    Grid: (batch*heads, num_q_blocks). K/V arrive as full (padded) sequences
    in VMEM for the current batch*head; the kernel loops over KV tiles with
    an online softmax.
    """
    q = q_ref[...].astype(jnp.float32) * scale  # (Bq, D)
    bq = q.shape[0]
    d = q.shape[1]

    num_kv_blocks = pl.cdiv(kv_len, _BLOCK_KV)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        start = i * _BLOCK_KV
        k = k_ref[pl.ds(start, _BLOCK_KV), :].astype(jnp.float32)  # (Bk, D)
        v = v_ref[pl.ds(start, _BLOCK_KV), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, Bk)
        # mask out padded kv rows
        kv_ids = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_ids < kv_len, s, -jnp.inf)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc, m0, l0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Flash attention, (B, S, H, D) layout, full (unmasked) attention.

    Query padding rows produce garbage that is sliced off; KV padding is
    masked inside the kernel.
    """
    if q.ndim != 4 or q.shape[-1] % 128 != 0:
        raise NotImplementedError("flash_attention expects (B,S,H,D) with D%128==0")
    b, sq, h, d = q.shape
    kv_len = k.shape[1]

    # (B, S, H, D) -> (B*H, S, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    qb = _pad_to(qb, 1, _BLOCK_Q)
    kb = _pad_to(kb, 1, _BLOCK_KV)
    vb = _pad_to(vb, 1, _BLOCK_KV)
    sq_pad, skv_pad = qb.shape[1], kb.shape[1]

    grid = (b * h, sq_pad // _BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, _BLOCK_Q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, _BLOCK_Q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
    )(qb, kb, vb)

    out = out[:, :sq, :].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out
