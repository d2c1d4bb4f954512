"""Pallas TPU flash-attention kernel.

Replaces the reference's TransformerEngine/flash-attn/cuDNN attention stack
(SURVEY §2.9) with a single online-softmax kernel tiled for the MXU.

Layout: (B, S, H, D). Grid is (batch*heads, q_blocks); K/V for the current
batch*head live in VMEM and the KV loop is **statically unrolled** with the
padding mask applied only to the final partial block — full blocks run
branch-free. Falls back (raises NotImplementedError) for shapes the kernel
does not support so the XLA path can take over.

Note the XLA fallback is not viable at production sizes: materializing the
(B, H, S, S) score tensor for the 720p edit sequence needs ~15.7 GB — this
kernel is the only path that fits HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables: q tile rows / kv tile rows. Swept with tools/tune_attention.py on
# v5e (720p edit shapes, B2 S7200 H40 D128): bq=256 hits 128 TFLOP/s (~65% of
# peak); larger q tiles fail to compile (VMEM) or run slower.
_BLOCK_Q = 256
_BLOCK_KV = 1024


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                 block_kv: int):
    """One (q_block x full-KV) flash-attention pass, KV loop unrolled."""
    q = q_ref[...].astype(jnp.float32) * scale  # (Bq, D)
    bq, d = q.shape

    kv_pad_len = k_ref.shape[0]
    num_blocks = kv_pad_len // block_kv
    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)

    for i in range(num_blocks):
        start = i * block_kv
        k = k_ref[pl.ds(start, block_kv), :].astype(jnp.float32)
        v = v_ref[pl.ds(start, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, Bk)
        if start + block_kv > kv_len:  # only the final partial block masks
            kv_ids = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_ids < kv_len, s, -jnp.inf)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        if i == 0:
            m = m_cur
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            m_new = jnp.maximum(m, m_cur)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new

    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    block_q: int = _BLOCK_Q, block_kv: int = _BLOCK_KV,
) -> jnp.ndarray:
    """Flash attention, (B, S, H, D) layout, full (unmasked) attention.

    Query padding rows produce garbage that is sliced off; KV padding is
    masked inside the kernel.
    """
    if q.ndim != 4 or q.shape[-1] % 128 != 0:
        raise NotImplementedError("flash_attention expects (B,S,H,D) with D%128==0")
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    # small-KV fast path: shrink the kv tile to avoid wasted padding compute
    block_kv = min(block_kv, max(128, ((kv_len + 127) // 128) * 128))
    block_q = min(block_q, max(128, ((sq + 127) // 128) * 128))

    # (B, S, H, D) -> (B*H, S, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    qb = _pad_to(qb, 1, block_q)
    kb = _pad_to(kb, 1, block_kv)
    vb = _pad_to(vb, 1, block_kv)
    sq_pad, skv_pad = qb.shape[1], kb.shape[1]

    grid = (b * h, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
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
