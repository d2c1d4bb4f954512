#!/usr/bin/env python
"""Experiment: paired-KV streamed flash forward — two KV blocks per grid
step, delivered as SEPARATE refs (static, contiguous), one combined
online-softmax update.

Motivation: the streamed kernel sits at ~125-126 TFLOP/s on the 28.8k-token
reasoning shape vs ~141 for the VMEM-resident kernel, whose static unroll
lets Mosaic overlap sub-block t's softmax (VPU) with t+1's score matmul
(MXU). The recorded negative result (flash_attention.py:_fwd_kernel_streamed
docstring) showed that splitting ONE streamed block with dynamic sub-slices
HALVES throughput; this variant avoids sub-slices entirely — the pipeline
fetches two independent 1024-blocks per step (k_a/k_b, v_a/v_b via two
BlockSpecs) and the kernel hoists both score matmuls before the softmax so
they can overlap it, then applies a single combined max/rescale (half the
alpha/acc-rescale VPU traffic of two sequential updates).

Run on TPU: python tools/exp_flash_paired.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chronoedit_tpu.ops.flash_attention import (
    _NEG_INF, _dot, _pad_to, _to_bh, _from_bh, _interpret, flash_attention)

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _grouped_kernel(*refs, scale: float, n: int):
    (q_ref, *kvb), (o_ref, lse_ref, acc_ref, m_ref, l_ref) = \
        refs[:1 + 2 * n + 1], refs[1 + 2 * n + 1:]
    k_refs, v_refs, bias_ref = kvb[:n], kvb[n:2 * n], kvb[2 * n]
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # q-prescale (diet)
    bkv = k_refs[0].shape[0]
    # all n score matmuls hoisted before any softmax work, so the MXU can
    # run dot i+1 while the VPU works on block i's softmax
    ss = [_dot(q, kr[...], ((1,), (1,)), q.dtype)
          + bias_ref[:1, i * bkv:(i + 1) * bkv]
          for i, kr in enumerate(k_refs)]

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = ss[0].max(axis=1, keepdims=True)
    for s in ss[1:]:
        m_cur = jnp.maximum(m_cur, s.max(axis=1, keepdims=True))
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    ps = [jnp.exp(s - m_new) for s in ss]
    l_new = l_prev * alpha
    for p in ps:
        l_new = l_new + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
    acc = acc_ref[...] * alpha
    for p, vr in zip(ps, v_refs):
        acc = acc + _dot(p.astype(q.dtype), vr[...], ((1,), (0,)), q.dtype)
    acc_ref[...] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        l_fin = l_ref[:, :1]
        o_ref[...] = (acc_ref[...] / l_fin).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(l_fin)
        lse_ref[...] = jnp.broadcast_to(lse[:, 0][None, :], lse_ref.shape)


def paired_flash(q, k, v, scale, block_q=1024, block_kv=1024, n=2):
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    qb = _pad_to(_to_bh(q), 1, block_q)
    kb = _pad_to(_to_bh(k), 1, n * block_kv)
    vb = _pad_to(_to_bh(v), 1, n * block_kv)
    bh, sq_pad, _ = qb.shape
    skv_pad = kb.shape[1]
    bias = jnp.where(jnp.arange(skv_pad) < kv_len, 0.0,
                     _NEG_INF).astype(jnp.float32)
    bias = jnp.broadcast_to(bias[None, :], (8, skv_pad))

    grid = (bh, sq_pad // block_q, skv_pad // (n * block_kv))

    def kv_spec(off):
        return pl.BlockSpec((None, block_kv, d),
                            lambda i, j, ki: (i, n * ki + off, 0),
                            memory_space=pltpu.VMEM)

    kv_specs = [kv_spec(off) for off in range(n)]
    ob, lse = pl.pallas_call(
        functools.partial(_grouped_kernel, scale=scale, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            *kv_specs, *kv_specs,
            pl.BlockSpec((8, n * block_kv), lambda i, j, ki: (0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, block_q), lambda i, j, ki: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qb, *([kb] * n), *([vb] * n), bias)
    return _from_bh(ob, b, h, sq)


def main(B=2, S=28800, H=40, D=128, iters=6, reps=12):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    scale = D ** -0.5
    flops = 4 * B * H * S * S * D

    # correctness vs the production kernel
    ref = flash_attention(q[:, :256], k, v, scale=scale)
    got = paired_flash(q[:, :256], k, v, scale)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"maxerr vs production: {err:.2e}", flush=True)

    def timed(fn, nreps, **kw):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                o = fn(c, k, v, scale, **kw)
                return c + 1e-6, jnp.sum(o.astype(jnp.float32))
            return jnp.sum(jax.lax.scan(body, q, None, length=nreps)[1])
        for _ in range(2):
            s = float(run(q, k, v))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(run(q, k, v))
        assert s == s
        return (time.perf_counter() - t0) / iters

    for name, fn, kw in [
        ("paired(2x512)", paired_flash, {"block_kv": 512}),
        ("tri(3x512)", paired_flash, {"block_kv": 512, "n": 3}),
        ("tri(3x768)", paired_flash, {"block_kv": 768, "n": 3}),
        ("quad(4x512)", paired_flash, {"block_kv": 512, "n": 4}),
        ("quad(4x768)", paired_flash, {"block_kv": 768, "n": 4}),
        ("tri(3x1024)", paired_flash, {"block_kv": 1024, "n": 3}),
        ("quad(4x1024)", paired_flash, {"block_kv": 1024, "n": 4}),
    ]:
        try:
            t_long = timed(fn, reps, **kw)
            t_short = timed(fn, reps // 2, **kw)
        except Exception as e:  # e.g. scoped-VMEM OOM at large n*block_kv
            print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        dt = (t_long - t_short) / (reps - reps // 2)
        print(f"{name:18s}: {dt * 1e3:7.2f} ms ({flops / dt / 1e12:6.1f} "
              f"TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
