"""Pallas TPU flash-attention kernel (forward + backward).

Replaces the reference's TransformerEngine/flash-attn/cuDNN attention stack
(SURVEY §2.9) with online-softmax kernels tiled for the MXU:

- forward: (batch*head, q_block) grid, KV resident in VMEM, statically
  unrolled KV loop with padding masked only in the final partial block;
  also emits the per-row logsumexp for the backward.
- backward: the standard two-kernel flash backward — a dq kernel gridded
  over q blocks and a dk/dv kernel gridded over kv blocks, both recomputing
  probabilities from (q, k, lse) instead of materializing S x S.

Exposed through ``jax.custom_vjp`` so the DiT trains through it on TPU.
Falls back (raises NotImplementedError) for unsupported shapes so the XLA
path can take over — note the XLA path is not viable at production sizes
(the 720p edit sequence's score tensor alone is ~15.7 GB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables swept with tools/tune_attention.py on v5e (720p edit shapes):
# bq=256 hits 128 TFLOP/s (~65% of peak); larger q tiles fail to compile
# (VMEM) or run slower.
_BLOCK_Q = 256
_BLOCK_KV = 512


def _pick_blocks(sq: int, kv_len: int, block_q: int, block_kv: int):
    block_kv = min(block_kv, max(128, ((kv_len + 127) // 128) * 128))
    block_q = min(block_q, max(128, ((sq + 127) // 128) * 128))
    return block_q, block_kv


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _to_bh(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_bh(x: jnp.ndarray, b: int, h: int, sq: int) -> jnp.ndarray:
    return x[:, :sq, :].reshape(b, h, sq, x.shape[-1]).transpose(0, 2, 1, 3)


# ================================================================ forward

def _dot_precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                kv_len: int, block_kv: int):
    # bf16 MXU inputs with fp32 accumulation (single-pass matmuls — fp32
    # inputs force the multi-pass MXU path); softmax statistics in fp32,
    # probabilities cast to the input dtype for the PV dot (flash-attn
    # practice); scale folded into the fp32 scores
    q = q_ref[...]  # (Bq, D), input dtype
    bq, d = q.shape
    num_blocks = k_ref.shape[0] // block_kv

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)

    for i in range(num_blocks):
        start = i * block_kv
        k = k_ref[pl.ds(start, block_kv), :]
        v = v_ref[pl.ds(start, block_kv), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype)) * scale
        if start + block_kv > kv_len:  # only the final partial block masks
            kv_ids = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_ids < kv_len, s, -jnp.inf)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        if i == 0:
            m = m_cur
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(p.astype(q.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype))
        else:
            m_new = jnp.maximum(m, m_cur)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype))
            m = m_new

    o_ref[...] = (acc / l).astype(o_ref.dtype)
    # lse replicated across 8 sublanes (TPU block shapes need sublane%8==0)
    lse_ref[...] = jnp.broadcast_to((m + jnp.log(l))[:, 0][None, :],
                                    lse_ref.shape)


def _forward(qb, kb, vb, scale, block_q, block_kv, kv_len, out_dtype):
    bh, sq_pad, d = qb.shape
    skv_pad = kb.shape[1]
    grid = (bh, sq_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len,
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
        out_specs=(
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d), out_dtype),
            jax.ShapeDtypeStruct((bh, 8, sq_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_pad * skv_pad * d,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=bh * sq_pad * skv_pad,
        ),
    )(qb, kb, vb)
    return out, lse


# ================================================================ backward

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref, *,
               scale: float, kv_len: int, block_kv: int):
    q = q_ref[...]  # (Bq, D), input dtype
    do = do_ref[...]
    lse = lse_ref[0][:, None]  # (Bq, 1)
    dsum = dsum_ref[0][:, None]
    bq, d = q.shape
    num_blocks = k_ref.shape[0] // block_kv

    dq = jnp.zeros((bq, d), jnp.float32)
    for i in range(num_blocks):
        start = i * block_kv
        k = k_ref[pl.ds(start, block_kv), :]
        v = v_ref[pl.ds(start, block_kv), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype)) * scale
        if start + block_kv > kv_len:
            kv_ids = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_ids < kv_len, s, -jnp.inf)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype))
        ds = (p * (dp - dsum) * scale).astype(q.dtype)
        dq = dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype))
    dq_ref[...] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                dk_ref, dv_ref, *, scale: float, block_q: int):
    k = k_ref[...]  # (Bk, D), input dtype
    v = v_ref[...]
    bk, d = k.shape
    num_blocks = q_ref.shape[0] // block_q

    dk = jnp.zeros((bk, d), jnp.float32)
    dv = jnp.zeros((bk, d), jnp.float32)
    for i in range(num_blocks):
        start = i * block_q
        q = q_ref[pl.ds(start, block_q), :]
        do = do_ref[pl.ds(start, block_q), :]
        lse = lse_ref[0, pl.ds(start, block_q)][None, :]  # (1, Bq)
        dsum = dsum_ref[0, pl.ds(start, block_q)][None, :]
        # p^T: (Bk, Bq); padded q rows carry lse=+inf -> p=0
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype)) * scale
        pt = jnp.exp(st - lse)
        dv = dv + jax.lax.dot_general(pt.astype(k.dtype), do,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype))
        dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype))
        dst = (pt * (dpt - dsum) * scale).astype(k.dtype)
        dk = dk + jax.lax.dot_general(dst, q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                precision=_dot_precision(q.dtype))
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _backward(qb, kb, vb, ob, dob, lse, scale, block_q, block_kv, kv_len):
    bh, sq_pad, d = qb.shape
    skv_pad = kb.shape[1]
    dsum = jnp.sum(dob.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1)
    dsum = jnp.broadcast_to(dsum[:, None, :], (bh, 8, sq_pad))

    full_spec = lambda s: pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    row_full = pl.BlockSpec((None, 8, sq_pad), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv),
        grid=(bh, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            full_spec(skv_pad), full_spec(skv_pad),
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), qb.dtype),
    )(qb, kb, vb, dob, lse, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q),
        grid=(bh, skv_pad // block_kv),
        in_specs=[
            full_spec(sq_pad),
            pl.BlockSpec((None, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            full_spec(sq_pad),
            row_full, row_full,
        ],
        out_specs=(
            pl.BlockSpec((None, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv_pad, d), kb.dtype),
            jax.ShapeDtypeStruct((bh, skv_pad, d), vb.dtype),
        ),
    )(qb, kb, vb, dob, lse, dsum)
    return dq, dk, dv


# ================================================================ public

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, scale, block_q, block_kv):
    out, _ = _flash_fwd_res(q, k, v, scale, block_q, block_kv)
    return out


def _flash_fwd_res(q, k, v, scale, block_q, block_kv):
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    qb = _pad_to(_to_bh(q), 1, block_q)
    kb = _pad_to(_to_bh(k), 1, block_kv)
    vb = _pad_to(_to_bh(v), 1, block_kv)
    ob, lse = _forward(qb, kb, vb, scale, block_q, block_kv, kv_len, q.dtype)
    return _from_bh(ob, b, h, sq), (qb, kb, vb, ob, lse)


def _flash_vjp_fwd(q, k, v, scale, block_q, block_kv):
    out, res = _flash_fwd_res(q, k, v, scale, block_q, block_kv)
    b, sq, h, _ = q.shape
    kv_len = k.shape[1]
    return out, (res, (b, sq, h, kv_len))


def _flash_vjp_bwd(scale, block_q, block_kv, carry, g):
    (qb, kb, vb, ob, lse), (b, sq, h, kv_len) = carry
    sq_pad = qb.shape[1]
    # zero-pad the cotangent and +inf the padded-row lse so padded q rows
    # contribute nothing
    dob = _pad_to(_to_bh(g), 1, block_q)
    if sq_pad > sq:
        row_ids = jnp.arange(sq_pad)
        lse = jnp.where(row_ids[None, None, :] < sq, lse, jnp.inf)
    dq, dk, dv = _backward(qb, kb, vb, ob, dob, lse, scale, block_q,
                           block_kv, kv_len)
    return (_from_bh(dq, b, h, sq), _from_bh(dk, b, h, kv_len),
            _from_bh(dv, b, h, kv_len))


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    block_q: int = _BLOCK_Q, block_kv: int = _BLOCK_KV,
) -> jnp.ndarray:
    """Flash attention, (B, S, H, D) layout, full (unmasked) attention,
    differentiable (custom flash backward kernels)."""
    if q.ndim != 4 or q.shape[-1] % 128 != 0:
        raise NotImplementedError("flash_attention expects (B,S,H,D) with D%128==0")
    block_q, block_kv = _pick_blocks(q.shape[1], k.shape[1], block_q, block_kv)
    # KV is VMEM-resident per (batch*head): guard the fp32 long-sequence case
    # (production runs bf16; fp32 exists for parity tooling at small sizes)
    itemsize = jnp.dtype(q.dtype).itemsize
    skv_pad = -(-k.shape[1] // block_kv) * block_kv
    vmem_est = (2 * skv_pad + 4 * block_q) * q.shape[-1] * itemsize
    if vmem_est > 12 * 1024 * 1024:
        raise NotImplementedError(
            f"KV-resident flash_attention would need ~{vmem_est >> 20} MiB "
            "VMEM; use bf16 inputs or shorter sequences")
    return _flash(q, k, v, scale, block_q, block_kv)
