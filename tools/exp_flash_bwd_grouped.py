#!/usr/bin/env python
"""Experiment: grouped-stream flash BACKWARD — n independent blocks per
grid step for the dq kernel (streams KV) and the dkv kernel (streams Q),
mirroring the forward's grouped fetch (flash_attention.py, round 4:
125.5 -> 138.8 TFLOP/s at 28.8k tokens).

The backward kernels already run 3-4 matmuls per grid step (score, dp/dpt,
ds·k / dst·q, pt·do), so their MXU/VPU overlap may be healthier than the
old forward's — this measures whether hoisting n blocks' score+dp matmuls
ahead of the exp/mul VPU chain still buys throughput, at the two block
regimes the production planner emits:

- training/edit shape (7.2k tokens): resident plan -> 256x256 blocks
- reasoning shape (28.8k tokens): stream plan -> bq=1024, bkv=512

Run on TPU: python tools/exp_flash_bwd_grouped.py [--shapes edit|reasoning|both]
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
    _NEG_INF, _backward, _dot, _flash_fwd_res, _interpret, _pad_to, _to_bh)

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


# ------------------------------------------------- grouped dq kernel

def _dq_kernel_grouped(*refs, scale: float, kv_len: int, block_kv: int,
                       masked: bool, n: int):
    (q_ref, *kv), (dq_ref, dq_acc) = refs[:1 + 2 * n + 3], refs[1 + 2 * n + 3:]
    k_refs, v_refs = kv[:n], kv[n:2 * n]
    do_ref, lse_ref, dsum_ref = kv[2 * n:]
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[...]
    do = do_ref[...]
    lse = lse_ref[0][:, None]
    dsum = dsum_ref[0][:, None]
    # hoist all score and dp matmuls ahead of the exp/mul VPU chain
    ss = [_dot(q, kr[...], ((1,), (1,)), q.dtype) * scale for kr in k_refs]
    dps = [_dot(do, vr[...], ((1,), (1,)), q.dtype) for vr in v_refs]
    if masked:
        ss = [jnp.where((ki * n + i) * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1) < kv_len, s, _NEG_INF)
            for i, s in enumerate(ss)]
    acc = dq_acc[...]
    for s, dp, kr in zip(ss, dps, k_refs):
        p = jnp.exp(s - lse)
        ds = (p * (dp - dsum) * scale).astype(q.dtype)
        acc = acc + _dot(ds, kr[...], ((1,), (0,)), q.dtype)
    dq_acc[...] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[...] = dq_acc[...].astype(dq_ref.dtype)


# ------------------------------------------------- grouped dkv kernel

def _dkv_kernel_grouped(*refs, scale: float, n: int):
    (k_ref, v_ref, *qs), (dk_ref, dv_ref, dk_acc, dv_acc) = \
        refs[:2 + 4 * n], refs[2 + 4 * n:]
    q_refs, do_refs = qs[:n], qs[n:2 * n]
    lse_refs, dsum_refs = qs[2 * n:3 * n], qs[3 * n:4 * n]
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[...]
    v = v_ref[...]
    sts = [_dot(k, qr[...], ((1,), (1,)), k.dtype) * scale for qr in q_refs]
    dpts = [_dot(v, dor[...], ((1,), (1,)), k.dtype) for dor in do_refs]
    dka = dk_acc[...]
    dva = dv_acc[...]
    for st, dpt, qr, dor, lr, dr in zip(sts, dpts, q_refs, do_refs,
                                        lse_refs, dsum_refs):
        lse = lr[0][None, :]  # padded q rows carry lse=+inf -> pt=0
        dsum = dr[0][None, :]
        pt = jnp.exp(st - lse)
        dva = dva + _dot(pt.astype(k.dtype), dor[...], ((1,), (0,)), k.dtype)
        dst = (pt * (dpt - dsum) * scale).astype(k.dtype)
        dka = dka + _dot(dst, qr[...], ((1,), (0,)), k.dtype)
    dk_acc[...] = dka
    dv_acc[...] = dva

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def grouped_backward(qb, kb, vb, ob, dob, lse, scale, block_q, block_kv,
                     kv_len, n_dq=2, n_dkv=2):
    bh, sq_pad, d = qb.shape
    skv_pad = kb.shape[1]
    assert skv_pad % (n_dq * block_kv) == 0
    assert sq_pad % (n_dkv * block_q) == 0
    dsum = jnp.sum(dob.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1)
    dsum = jnp.broadcast_to(dsum[:, None, :], (bh, 8, sq_pad))
    masked = skv_pad != kv_len

    q_blk = pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM)
    row_blk_q = pl.BlockSpec((None, 8, block_q), lambda i, j, ki: (i, 0, j),
                             memory_space=pltpu.VMEM)

    def kv_blk_off(off):
        return pl.BlockSpec(
            (None, block_kv, d),
            lambda i, j, ki, off=off: (i, n_dq * ki + off, 0),
            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel_grouped, scale=scale, kv_len=kv_len,
                          block_kv=block_kv, masked=masked, n=n_dq),
        grid=(bh, sq_pad // block_q, skv_pad // (n_dq * block_kv)),
        in_specs=[q_blk,
                  *[kv_blk_off(o) for o in range(n_dq)],
                  *[kv_blk_off(o) for o in range(n_dq)],
                  q_blk, row_blk_q, row_blk_q],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), qb.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qb, *([kb] * n_dq), *([vb] * n_dq), dob, lse, dsum)

    kv_blk = pl.BlockSpec((None, block_kv, d), lambda i, j, qi: (i, j, 0),
                          memory_space=pltpu.VMEM)

    def q_blk_off(off):
        return pl.BlockSpec(
            (None, block_q, d),
            lambda i, j, qi, off=off: (i, n_dkv * qi + off, 0),
            memory_space=pltpu.VMEM)

    def row_blk_off(off):
        return pl.BlockSpec(
            (None, 8, block_q),
            lambda i, j, qi, off=off: (i, 0, n_dkv * qi + off),
            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_grouped, scale=scale, n=n_dkv),
        grid=(bh, skv_pad // block_kv, sq_pad // (n_dkv * block_q)),
        in_specs=[kv_blk, kv_blk,
                  *[q_blk_off(o) for o in range(n_dkv)],
                  *[q_blk_off(o) for o in range(n_dkv)],
                  *[row_blk_off(o) for o in range(n_dkv)],
                  *[row_blk_off(o) for o in range(n_dkv)]],
        out_specs=(kv_blk, kv_blk),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv_pad, d), kb.dtype),
            jax.ShapeDtypeStruct((bh, skv_pad, d), vb.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(kb, vb, *([qb] * n_dkv), *([dob] * n_dkv),
      *([lse] * n_dkv), *([dsum] * n_dkv))
    return dq, dk, dv


def run_shape(S, block_q, block_kv, B=2, H=40, D=128, iters=5, reps=10):
    """Time production _backward vs grouped variants at one shape. Buffers
    are padded to the largest group multiple so every variant sees the SAME
    inputs (pad-waste differences are a separate, forward-owned axis)."""
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = [jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
               for kk in ks[:3]]
    scale = D ** -0.5
    out, (qb, kb, vb, ob, lse) = _flash_fwd_res(q, k, v, scale, block_q,
                                                block_kv)
    g = jax.random.normal(ks[3], out.shape, jnp.bfloat16)
    dob = _pad_to(_to_bh(g), 1, block_q)
    max_mult = 4
    qb = _pad_to(qb, 1, max_mult * block_q)
    dob = _pad_to(dob, 1, max_mult * block_q)
    ob = _pad_to(ob, 1, max_mult * block_q)
    kb = _pad_to(kb, 1, max_mult * block_kv)
    vb = _pad_to(vb, 1, max_mult * block_kv)
    sq_pad = qb.shape[1]
    lse = _pad_to(lse, 2, max_mult * block_q)
    row_ids = jnp.arange(sq_pad)
    lse = jnp.where(row_ids[None, None, :] < S, lse, jnp.inf)
    # 5 bwd matmuls per (q, kv) tile pair
    flops = 5 * B * H * S * S * D * 2
    print(f"== S={S} bq={block_q} bkv={block_kv}", flush=True)

    def timed(fn, nreps):
        @jax.jit
        def run(qb, kb, vb, ob, dob, lse):
            def body(c, _):
                dq, dk, dv = fn(c, kb, vb, ob, dob, lse)
                return c + 1e-6, (jnp.sum(dq.astype(jnp.float32))
                                  + jnp.sum(dk.astype(jnp.float32))
                                  + jnp.sum(dv.astype(jnp.float32)))
            return jnp.sum(jax.lax.scan(body, qb, None, length=nreps)[1])
        for _ in range(2):
            s = float(run(qb, kb, vb, ob, dob, lse))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(run(qb, kb, vb, ob, dob, lse))
        assert s == s
        return (time.perf_counter() - t0) / iters, s

    def production(qb, kb, vb, ob, dob, lse):
        return _backward(qb, kb, vb, ob, dob, lse, scale, block_q, block_kv,
                         S)

    variants = [("production", production)]
    for n_dq, n_dkv in ((2, 1), (1, 2), (2, 2), (4, 1), (4, 4), (2, 4)):
        def fn(qb, kb, vb, ob, dob, lse, n_dq=n_dq, n_dkv=n_dkv):
            return grouped_backward(qb, kb, vb, ob, dob, lse, scale,
                                    block_q, block_kv, S,
                                    n_dq=n_dq, n_dkv=n_dkv)
        variants.append((f"dq x{n_dq}, dkv x{n_dkv}", fn))

    ref_sum = None
    for name, fn in variants:
        try:
            t_long, s = timed(fn, reps)
            t_short, _ = timed(fn, reps // 2)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            continue
        dt = (t_long - t_short) / (reps - reps // 2)
        if ref_sum is None:
            ref_sum = s
        ok = abs(s - ref_sum) < abs(ref_sum) * 1e-3 + 1.0
        print(f"{name:16s}: {dt * 1e3:7.2f} ms ({flops / dt / 1e12:6.1f} "
              f"TFLOP/s) sum_ok={ok}", flush=True)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="both",
                   choices=["edit", "reasoning", "both"])
    a = p.parse_args()
    if a.shapes in ("edit", "both"):
        run_shape(7200, 256, 256)  # the resident plan's blocks
    if a.shapes in ("reasoning", "both"):
        run_shape(28800, 1024, 512, iters=3, reps=6)  # the stream plan's


if __name__ == "__main__":
    main()
