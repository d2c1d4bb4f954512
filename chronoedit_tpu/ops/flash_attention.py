"""Pallas TPU flash-attention kernels (forward + backward), streamed KV.

Replaces the reference's TransformerEngine/flash-attn/cuDNN attention stack
(SURVEY §2.9) with online-softmax kernels tiled for the MXU:

- forward: ``(batch*head, q_block, kv_block)`` grid. KV blocks are *streamed*
  HBM->VMEM by the Pallas pipeline (the innermost grid dim walks KV), with
  the online-softmax state (acc, row-max, row-sum) carried across kv steps
  in VMEM scratch. VMEM residency is O(block sizes) only, so the kernel
  covers arbitrarily long sequences — including the 29-frame 720p reasoning
  mode (~28.8k tokens) the reference hits via its 40-block self-attention
  hot loop (chronoedit_diffusers/transformer_chronoedit.py:267-295).
  Also emits the per-row logsumexp for the backward and for ring attention.
- backward: the standard two-kernel flash backward — a dq kernel gridded
  over (bh, q, kv) and a dk/dv kernel gridded over (bh, kv, q), both
  recomputing probabilities from (q, k, lse) instead of materializing S x S,
  accumulating in VMEM scratch across the streamed inner dim.

Exposed through ``jax.custom_vjp`` so the DiT trains through it on TPU.
The same dq/dkv kernels power the exact ring-attention backward in
``chronoedit_tpu.parallel.context`` (they take an explicit lse, which the
ring pass supplies globally).

Falls back (raises NotImplementedError) only for unsupported layouts
(D % 128 != 0) so the XLA path can take over.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables swept on v5e (720p edit + reasoning shapes, honest scan-chained
# timing): the streamed path fetches KV in *groups* of `_STREAM_GROUP`
# independent `_STREAM_BKV` blocks per grid step (see the grouped kernel's
# docstring for the sweep table — 137.8 TFLOP/s at 28.8k tokens vs 125.5
# for the old single 1024-block stream); the resident path plans 256-blocks
# *before* padding (123 TFLOP/s at 7.2k, 13% over the old
# pad-to-1024-then-reduce flow).
_BLOCK_Q = 1024
_BLOCK_KV = 1024
_STREAM_GROUP = 3
_STREAM_BKV = 512

# k-major (K fed to the kernels as (D, S), one XLA transpose outside the
# kernel so every score matmul sees an MXU-native contract-on-dim-0 rhs).
# Measured on v5e (tools/tune_attention.py --kt-ab, scan-chained, bitwise-
# identical sums): edit/7.2k 140.0 -> 140.9 TFLOP/s (+0.6%), reasoning/28.8k
# 125.1 -> 126.2 (+0.9%) — Mosaic already feeds the MXU the (Bkv, D) block
# nearly free, so the layout buys ~nothing. Default OFF: the gain is inside
# run-to-run noise while the XLA-level K transpose adds a ~0.6 GB HBM
# transient at the 28.8k reasoning shape, which sits on the single-chip
# OOM feasibility edge (w4a8 depth 28 fits, 32 does not).
_K_MAJOR_DEFAULT = False

_NEG_INF = float("-inf")


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests drive the same kernels)."""
    return _platform() != "tpu"


def _platform() -> str:
    from chronoedit_tpu.utils.platform import target_platform

    return target_platform()


def _pick_blocks(sq: int, kv_len: int, block_q: int, block_kv: int):
    block_kv = min(block_kv, max(128, ((kv_len + 127) // 128) * 128))
    block_q = min(block_q, max(128, ((sq + 127) // 128) * 128))
    return block_q, block_kv


def _plan_blocks(sq: int, skv: int, d: int, itemsize: int,
                 block_q: int, block_kv: int,
                 group: int | None = None) -> tuple[int, int, int]:
    """Final ``(block_q, block_kv, group)``, decided BEFORE padding.

    The resident path caps q blocks at 256 and only needs 128-aligned KV;
    planning that after padding to the streamed 1024 default wasted ~11%
    masked work at the flagship 7.2k-token edit shape (round-2 review).
    Buffers are padded to ``block_kv * group``, so forward and backward
    grids stay consistent (the backward reuses ``block_kv`` alone — a
    group-multiple pad is also a block multiple).

    ``group=None`` plans the grouped streamed kernel (round 4) at the
    full-scale streamed default — explicit small test blocks and resident
    shapes keep group 1. An explicit ``group`` is honored verbatim with the
    caller's block sizes (e.g. ``group=1, block_kv=1024`` is the ungrouped
    baseline for A/Bs)."""
    # decide residency from the size the buffers will actually be padded to
    # (the resident path's kv block), so this check and _forward's re-check
    # agree — a 128-aligned check here with 256-padding there sent gap shapes
    # down the streamed kernel with resident-tuned 256-blocks (advisor r2)
    bkv = min(block_kv, 256)
    skv_res = -(-skv // bkv) * bkv
    if 2 * skv_res * d * itemsize <= _RESIDENT_KV_BYTES:
        if group is not None and group > 1:
            # advisor r4: silently discarding an explicit group here made
            # tools/tune_attention.py --group-ab A/B the resident kernel
            # against itself at resident-planned shapes (a null result that
            # read as "grouping doesn't help")
            import warnings

            warnings.warn(
                f"explicit group={group} ignored: KV ({skv} x {d}) fits "
                "resident in VMEM, so the ungrouped resident kernel is "
                "used; grouping only applies to the streamed path",
                stacklevel=3)
        bq = 256 if sq >= 256 else 128
        return min(block_q, bq), bkv, 1
    bq, bkv = _pick_blocks(sq, skv, block_q, block_kv)
    if group is not None:
        return bq, bkv, max(group, 1)
    if bkv == _BLOCK_KV:  # full-scale stream (skv > resident ceiling)
        return bq, _STREAM_BKV, _STREAM_GROUP
    return bq, bkv, 1


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


def _dot_precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _dot(a, b, dims, dtype):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_dot_precision(dtype))


# ================================================================ forward

# KV small enough to keep resident in VMEM per (batch*head): use the
# unrolled-resident kernel — Mosaic overlaps sub-block t's softmax (VPU)
# with sub-block t+1's score matmul (MXU) across the static unroll, which
# grid-streamed steps don't get (measured 141 vs 101 TFLOP/s at 7.2k
# tokens on v5e). Above the threshold, stream KV blocks through the grid.
_RESIDENT_KV_BYTES = 6 * 1024 * 1024
_SUB_BLOCK = 512


def _online_step(q, k, v, s_mask, scale, acc, m_prev, l_prev,
                 k_major=False):
    """One online-softmax update with an optional (static) column mask.
    ``scale=None`` means q arrives pre-scaled (the VPU-diet path).
    ``k_major``: k arrives (D, Bkv) so the score matmul contracts the rhs on
    dim 0 — the MXU-native orientation — instead of requiring an in-VMEM
    transpose of the (Bkv, D) block each step."""
    s = _dot(q, k, ((1,), (0,) if k_major else (1,)), q.dtype)
    if scale is not None:
        s = s * scale
    if s_mask is not None:
        s = jnp.where(s_mask, s, _NEG_INF)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_new = acc * alpha + _dot(p.astype(q.dtype), v, ((1,), (0,)), q.dtype)
    return acc_new, m_new, l_new


def _fwd_kernel_resident(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                         scale: float, kv_len: int, sub: int,
                         diet: bool = True, k_major: bool = False):
    # bf16 MXU inputs with fp32 accumulation (single-pass matmuls — fp32
    # inputs force the multi-pass MXU path); softmax statistics in fp32,
    # probabilities cast to the input dtype for the PV dot (flash-attn
    # practice); scale folded into the fp32 scores. Whole KV resident in
    # VMEM; the KV loop is a static python unroll with the padding mask
    # applied only to the final partial sub-block.
    q = q_ref[...]  # (Bq, D), input dtype
    if diet:  # fold the softmax scale into the q block once (VPU diet)
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
        scale = None
    bq, d = q.shape
    skv = k_ref.shape[1] if k_major else k_ref.shape[0]

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    for start in range(0, skv, sub):
        size = min(sub, skv - start)  # final sub-block may be ragged
        if k_major:
            k = k_ref[:, pl.ds(start, size)]
        else:
            k = k_ref[pl.ds(start, size), :]
        v = v_ref[pl.ds(start, size), :]
        mask = None
        if start + size > kv_len:  # static: only the boundary sub-block
            kv_ids = start + jax.lax.broadcasted_iota(jnp.int32, (bq, size), 1)
            mask = kv_ids < kv_len
        acc, m, l = _online_step(q, k, v, mask, scale, acc, m, l,
                                 k_major=k_major)

    o_ref[...] = (acc / l).astype(o_ref.dtype)
    # lse replicated across 8 sublanes (TPU block sublane%8==0)
    lse_ref[...] = jnp.broadcast_to((m + jnp.log(l))[:, 0][None, :],
                                    lse_ref.shape)


def _fwd_kernel_streamed(q_ref, *rest, scale: float, kv_len: int,
                         block_kv: int, masked: bool, diet: bool,
                         group: int = 1, k_major: bool = False):
    # Same math as the resident kernel, with the online-softmax state
    # (acc, m, l) carried across the streamed kv grid dim in VMEM scratch.
    # The padding mask is applied unconditionally when the sequence is
    # padded — a lax.cond boundary-only variant measured *slower* (74 vs
    # 126 TFLOP/s at 28.8k tokens): the conditional blocks Mosaic's
    # scheduling, while the mask itself is ~3 cheap VPU ops/token.
    #
    # ``group`` (round 4, grouped stream): each grid step fetches `group`
    # INDEPENDENT kv blocks — delivered as separate refs by `group` aliased
    # operands whose BlockSpecs stride the same buffer — hoists all `group`
    # score matmuls before any softmax work (so the MXU can run block i+1's
    # scores under block i's exp/max VPU ops), then applies ONE combined
    # max/rescale/accumulate update (1/group of the alpha + acc-rescale
    # traffic). Swept at the 28.8k reasoning shape, B=2 H=40 D=128, v5e
    # (tools/exp_flash_paired.py, scan-chained):
    #     1x1024 (old)  125.5 TFLOP/s        2x512   116.4
    #     2x768         137.2                2x1024  132.3
    #     3x512         137.8  <- shipped    3x768   129.9
    #     4x512         137.1 (16MB scoped-VMEM cliff: OOMed 1 of 2 runs)
    #     3x1024, 4x768, 4x1024: scoped-VMEM OOM (score stack 2*n*Bq*Bkv*4B)
    # ~+4.5% is the combined update + matmul hoisting at equal padding;
    # the rest is the finer 1536-token pad granularity at 28.8k tokens.
    # Earlier negative result stands: splitting ONE streamed block with
    # dynamic sub-slices (local unroll, no extra operands) HALVED
    # throughput — the grouped variant works precisely because the blocks
    # arrive as separate static refs through the pipeline, not as in-kernel
    # slices. Don't retry the sub-slice form.
    #
    # ``diet`` (round 4 VPU diet): shave per-score VPU work by (a) folding
    # the softmax scale into the q block ONCE per q block instead of
    # scaling the (Bq, Bkv) score matrix every kv step, and (b) masking via
    # one precomputed additive 0/-inf bias row instead of
    # iota+compare+select (3 ops -> 1). Measured (tune_attention --diet-ab,
    # scan-chained): resident/edit shape 138.8 -> 142.6 TFLOP/s (+2.7%);
    # streamed/28.8k shape unchanged. Default ON: exact in fp32, one
    # standard flash-attn q-prescale rounding in bf16.
    n = group
    k_refs, v_refs, rest = rest[:n], rest[n:2 * n], rest[2 * n:]
    if masked and diet:
        bias_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = rest
        bias_ref = None
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]  # (Bq, D), input dtype
    if diet:
        # fp32 scaling then cast back: exact for fp32 q; for bf16 the one
        # rounding of q*scale is the standard flash-attn q-prescale
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    # all score matmuls hoisted ahead of the softmax chain (MXU/VPU overlap)
    ss = [_dot(q, kr[...], ((1,), (0,) if k_major else (1,)), q.dtype)
          for kr in k_refs]
    if not diet:
        ss = [s * scale for s in ss]
    if masked:
        if diet:  # (1, i-th Bkv slice) broadcast add, 0 or -inf
            ss = [s + bias_ref[:1, i * block_kv:(i + 1) * block_kv]
                  for i, s in enumerate(ss)]
        else:
            ss = [jnp.where((ki * n + i) * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1) < kv_len, s, _NEG_INF)
                for i, s in enumerate(ss)]

    m_prev = m_ref[:, :1]  # lanes replicated; col 0 is canonical
    l_prev = l_ref[:, :1]
    m_new = m_prev
    for s in ss:
        m_new = jnp.maximum(m_new, jnp.max(s, axis=1, keepdims=True))
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


def _fwd_kernel_streamed_qk8(q_ref, *rest, scale: float, kv_len: int,
                             block_kv: int, masked: bool, group: int = 1):
    """Grouped streamed forward with int8 q/k score matmuls (round 5).

    Same online-softmax structure as :func:`_fwd_kernel_streamed`; the score
    dots run s8 x s8 -> s32 on the MXU (double the bf16 rate on v5e) and are
    dequantized per score tile by the rank-1 outer product of the per-token
    q and k scales (SageAttention-style per-token quantization, arXiv:
    2410.02367 — stronger than its per-block scales; K is mean-centered by
    the caller, which softmax row-invariance makes exact). P·V stays bf16:
    quantizing P costs measurable dB for ~12% more MXU at most, and V rows
    are consumed once. Replaces the reference's fp16 fused-attention serving
    path (TE backend, chronoedit/_src/modules/attention.py:90-181) with a
    TPU-native quantized one."""
    n = group
    k_refs, v_refs, rest = rest[:n], rest[n:2 * n], rest[2 * n:]
    qs_ref, ks_ref = rest[0], rest[1]
    rest = rest[2:]
    if masked:
        bias_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = rest
        bias_ref = None
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]                          # (Bq, D) int8
    pv_dtype = v_refs[0].dtype
    # per-q-token dequant scale with the softmax scale folded in: one
    # (Bq, 1) column, broadcast over each score tile
    row_mult = qs_ref[0, :][:, None] * scale
    ss = []
    for i, kr in enumerate(k_refs):
        s32 = jax.lax.dot_general(q, kr[...], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        col = ks_ref[:1, i * block_kv:(i + 1) * block_kv]  # (1, Bkv)
        s = s32.astype(jnp.float32) * row_mult * col
        if masked:
            s = s + bias_ref[:1, i * block_kv:(i + 1) * block_kv]
        ss.append(s)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = m_prev
    for s in ss:
        m_new = jnp.maximum(m_new, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    ps = [jnp.exp(s - m_new) for s in ss]
    l_new = l_prev * alpha
    for p in ps:
        l_new = l_new + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
    acc = acc_ref[...] * alpha
    for p, vr in zip(ps, v_refs):
        acc = acc + _dot(p.astype(pv_dtype), vr[...], ((1,), (0,)), pv_dtype)
    acc_ref[...] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        l_fin = l_ref[:, :1]
        o_ref[...] = (acc_ref[...] / l_fin).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(l_fin)
        lse_ref[...] = jnp.broadcast_to(lse[:, 0][None, :], lse_ref.shape)


def _forward_qk8(q8b, k8b, vb, qs, ks, scale, block_q, block_kv, kv_len,
                 out_dtype, group: int = 1):
    """Streamed-grouped launch for the int8-score kernel. q8b/k8b are int8
    (BH, S_pad, D); qs/ks are fp32 (BH, 8, S_pad) per-token dequant scales
    (8 replicated sublanes, the lse layout); vb stays bf16/f32."""
    bh, sq_pad, d = q8b.shape
    skv_pad = k8b.shape[1]
    n = group
    assert skv_pad % (n * block_kv) == 0
    grid = (bh, sq_pad // block_q, skv_pad // (n * block_kv))
    masked = skv_pad != kv_len
    cost = pl.CostEstimate(
        flops=4 * bh * sq_pad * skv_pad * d,
        bytes_accessed=q8b.size + k8b.size + vb.size * vb.dtype.itemsize,
        transcendentals=bh * sq_pad * skv_pad,
    )
    out_shape = (
        jax.ShapeDtypeStruct((bh, sq_pad, d), out_dtype),
        jax.ShapeDtypeStruct((bh, 8, sq_pad), jnp.float32),
    )

    def k_spec(off):
        return pl.BlockSpec((None, block_kv, d),
                            lambda i, j, ki, off=off: (i, n * ki + off, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                     memory_space=pltpu.VMEM),
        *[k_spec(off) for off in range(n)],
        *[k_spec(off) for off in range(n)],  # v walks the same offsets
        pl.BlockSpec((None, 8, block_q), lambda i, j, ki: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 8, n * block_kv), lambda i, j, ki: (i, 0, ki),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q8b, *([k8b] * n), *([vb] * n), qs, ks]
    if masked:
        bias = jnp.where(jnp.arange(skv_pad) < kv_len,
                         0.0, _NEG_INF).astype(jnp.float32)
        operands.append(jnp.broadcast_to(bias[None, :], (8, skv_pad)))
        in_specs.append(pl.BlockSpec((8, n * block_kv),
                                     lambda i, j, ki: (0, ki),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_streamed_qk8, scale=scale,
                          kv_len=kv_len, block_kv=block_kv, masked=masked,
                          group=n),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, block_q), lambda i, j, ki: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=_interpret(),
    )(*operands)


def _forward(qb, kb, vb, scale, block_q, block_kv, kv_len, out_dtype,
             diet: bool = True, k_major: bool = False, group: int = 1):
    # ``k_major``: kb arrives (BH, D, Skv_pad) — transposed once at the XLA
    # level by the caller — so every kernel score matmul sees the rhs in the
    # MXU-native (contract-on-dim-0) orientation instead of paying an
    # in-VMEM transpose of each (Bkv, D) block.
    # ``group``: kv blocks fetched per streamed grid step (buffers must be
    # padded to ``group * block_kv``); see _fwd_kernel_streamed.
    bh, sq_pad, d = qb.shape
    skv_pad = kb.shape[1] if not k_major else kb.shape[2]
    itemsize = jnp.dtype(qb.dtype).itemsize
    cost = pl.CostEstimate(
        flops=4 * bh * sq_pad * skv_pad * d,
        bytes_accessed=(qb.size + kb.size + vb.size) * itemsize,
        transcendentals=bh * sq_pad * skv_pad,
    )
    out_shape = (
        jax.ShapeDtypeStruct((bh, sq_pad, d), out_dtype),
        jax.ShapeDtypeStruct((bh, 8, sq_pad), jnp.float32),
    )

    if 2 * skv_pad * d * itemsize <= _RESIDENT_KV_BYTES:
        sub = min(_SUB_BLOCK, skv_pad)
        # callers plan block_q <= 256 for this path (_plan_blocks); guard
        # against a direct caller handing the streamed default
        if block_q > 256:
            block_q = 256 if sq_pad % 256 == 0 else 128
        k_spec = (pl.BlockSpec((None, d, skv_pad), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM) if k_major else
                  pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(_fwd_kernel_resident, scale=scale,
                              kv_len=kv_len, sub=sub, diet=diet,
                              k_major=k_major),
            grid=(bh, sq_pad // block_q),
            in_specs=[
                pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                k_spec,
                pl.BlockSpec((None, skv_pad, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 8, block_q), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qb, kb, vb)

    n = group
    assert skv_pad % (n * block_kv) == 0
    grid = (bh, sq_pad // block_q, skv_pad // (n * block_kv))
    masked = skv_pad != kv_len

    def k_spec(off):
        if k_major:
            return pl.BlockSpec((None, d, block_kv),
                                lambda i, j, ki, off=off: (i, 0, n * ki + off),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((None, block_kv, d),
                            lambda i, j, ki, off=off: (i, n * ki + off, 0),
                            memory_space=pltpu.VMEM)

    def v_spec(off):
        return pl.BlockSpec((None, block_kv, d),
                            lambda i, j, ki, off=off: (i, n * ki + off, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                     memory_space=pltpu.VMEM),
        *[k_spec(off) for off in range(n)],
        *[v_spec(off) for off in range(n)],
    ]
    # the same kb/vb buffer backs all n K (resp. V) operands; each operand's
    # BlockSpec walks a different offset within the group stride, so every
    # block is still fetched exactly once
    operands = [qb, *([kb] * n), *([vb] * n)]
    if masked and diet:
        # additive mask: 0 on real columns, -inf on padding (8 sublanes to
        # satisfy the TPU block layout; the kernel reads row 0)
        bias = jnp.where(jnp.arange(skv_pad) < kv_len,
                         0.0, _NEG_INF).astype(jnp.float32)
        operands.append(jnp.broadcast_to(bias[None, :], (8, skv_pad)))
        in_specs.append(pl.BlockSpec((8, n * block_kv),
                                     lambda i, j, ki: (0, ki),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_streamed, scale=scale, kv_len=kv_len,
                          block_kv=block_kv, masked=masked, diet=diet,
                          group=n, k_major=k_major),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, block_q), lambda i, j, ki: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),    # acc
            pltpu.VMEM((block_q, 128), jnp.float32),  # running row max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running row sum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=_interpret(),
    )(*operands)


# ================================================================ backward

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
               dq_acc, *, scale: float, kv_len: int, block_kv: int,
               masked: bool):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[...]  # (Bq, D), input dtype
    do = do_ref[...]
    lse = lse_ref[0][:, None]  # (Bq, 1)
    dsum = dsum_ref[0][:, None]
    k = k_ref[...]
    v = v_ref[...]
    s = _dot(q, k, ((1,), (1,)), q.dtype) * scale
    if masked:
        kv_ids = ki * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_ids < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dp = _dot(do, v, ((1,), (1,)), q.dtype)
    ds = (p * (dp - dsum) * scale).astype(q.dtype)
    dq_acc[...] = dq_acc[...] + _dot(ds, k, ((1,), (0,)), q.dtype)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[...] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[...]  # (Bk, D), input dtype
    v = v_ref[...]
    q = q_ref[...]  # (Bq, D)
    do = do_ref[...]
    lse = lse_ref[0][None, :]  # (1, Bq); padded q rows carry lse=+inf -> p=0
    dsum = dsum_ref[0][None, :]
    # p^T: (Bk, Bq)
    st = _dot(k, q, ((1,), (1,)), q.dtype) * scale
    pt = jnp.exp(st - lse)
    dv_acc[...] = dv_acc[...] + _dot(pt.astype(k.dtype), do, ((1,), (0,)),
                                     q.dtype)
    dpt = _dot(v, do, ((1,), (1,)), q.dtype)
    dst = (pt * (dpt - dsum) * scale).astype(k.dtype)
    dk_acc[...] = dk_acc[...] + _dot(dst, q, ((1,), (0,)), q.dtype)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _backward(qb, kb, vb, ob, dob, lse, scale, block_q, block_kv, kv_len):
    """Flash backward on padded (BH, S, D) buffers.

    ``lse`` must already be +inf on padded q rows (so p=0 there); it may be
    the *global* logsumexp when used per-hop by ring attention — the math is
    identical, p is then the globally-normalized probability.
    """
    bh, sq_pad, d = qb.shape
    skv_pad = kb.shape[1]
    dsum = jnp.sum(dob.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1)
    dsum = jnp.broadcast_to(dsum[:, None, :], (bh, 8, sq_pad))
    masked = skv_pad != kv_len

    q_blk = pl.BlockSpec((None, block_q, d), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kv_blk_q = pl.BlockSpec((None, block_kv, d), lambda i, j, ki: (i, ki, 0),
                            memory_space=pltpu.VMEM)
    row_blk_q = pl.BlockSpec((None, 8, block_q), lambda i, j, ki: (i, 0, j),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=kv_len,
                          block_kv=block_kv, masked=masked),
        grid=(bh, sq_pad // block_q, skv_pad // block_kv),
        in_specs=[q_blk, kv_blk_q, kv_blk_q, q_blk, row_blk_q, row_blk_q],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), qb.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qb, kb, vb, dob, lse, dsum)

    q_blk_i = pl.BlockSpec((None, block_q, d), lambda i, j, qi: (i, qi, 0),
                           memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((None, block_kv, d), lambda i, j, qi: (i, j, 0),
                          memory_space=pltpu.VMEM)
    row_blk_i = pl.BlockSpec((None, 8, block_q), lambda i, j, qi: (i, 0, qi),
                             memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid=(bh, skv_pad // block_kv, sq_pad // block_q),
        in_specs=[q_blk_i, kv_blk, kv_blk, q_blk_i, row_blk_i, row_blk_i],
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
    )(qb, kb, vb, dob, lse, dsum)
    return dq, dk, dv


# ================================================================ public

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, scale, block_q, block_kv, diet, k_major, group):
    out, _ = _flash_fwd_res(q, k, v, scale, block_q, block_kv, diet, k_major,
                            group)
    return out


def _flash_fwd_res(q, k, v, scale, block_q, block_kv, diet=True,
                   k_major=False, group=1):
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    qb = _pad_to(_to_bh(q), 1, block_q)
    kb = _pad_to(_to_bh(k), 1, group * block_kv)
    vb = _pad_to(_to_bh(v), 1, group * block_kv)
    # one XLA-level transpose (HBM read+write of KV, ~µs against the
    # attention itself) buys every kernel step an MXU-native rhs
    kb_in = kb.transpose(0, 2, 1) if k_major else kb
    ob, lse = _forward(qb, kb_in, vb, scale, block_q, block_kv, kv_len,
                       q.dtype, diet, k_major, group)
    return _from_bh(ob, b, h, sq), (qb, kb, vb, ob, lse)


def _flash_vjp_fwd(q, k, v, scale, block_q, block_kv, diet, k_major, group):
    out, res = _flash_fwd_res(q, k, v, scale, block_q, block_kv, diet,
                              k_major, group)
    b, sq, h, _ = q.shape
    kv_len = k.shape[1]
    return out, (res, (b, sq, h, kv_len))


def _flash_vjp_bwd(scale, block_q, block_kv, diet, k_major, group, carry, g):
    # group shapes only the forward fetch pattern; the backward grids run on
    # plain block_kv blocks (a group-multiple pad is also a block multiple)
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


def _check_layout(q):
    if q.ndim != 4 or q.shape[-1] % 128 != 0:
        raise NotImplementedError(
            "flash_attention expects (B,S,H,D) with D%128==0")


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    block_q: int = _BLOCK_Q, block_kv: int = _BLOCK_KV, diet: bool = True,
    k_major: bool | None = None, group: int | None = None,
) -> jnp.ndarray:
    """Flash attention, (B, S, H, D) layout, full (unmasked) attention,
    differentiable (custom flash backward kernels). KV is streamed from HBM
    block-by-block, so sequence length is bounded by HBM, not VMEM.
    ``diet`` applies the forward VPU diet (q-prescale + additive pad mask);
    exact for fp32, one standard q-rounding for bf16. ``k_major`` feeds the
    kernels a (D, S)-transposed K (bitwise-identical math, different
    layout); ``None`` uses the swept per-path default. ``group`` overrides
    the streamed kv-blocks-per-grid-step count (``None``: planned; explicit
    values keep the caller's block sizes)."""
    _check_layout(q)
    block_q, block_kv, group = _plan_blocks(
        q.shape[1], k.shape[1], q.shape[-1], jnp.dtype(q.dtype).itemsize,
        block_q, block_kv, group)
    if k_major is None:
        k_major = _K_MAJOR_DEFAULT
    return _flash(q, k, v, scale, block_q, block_kv, diet, k_major, group)


def flash_attention_qk_int8(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    block_q: int = _BLOCK_Q, block_kv: int = _BLOCK_KV,
    group: int | None = None,
) -> jnp.ndarray:
    """Serving-path flash attention with int8 q/k score matmuls.

    Per-token symmetric quantization of q and of the mean-centered k
    (subtracting the per-(B,H) token-mean from K shifts every row of the
    score matrix by a constant, so softmax output is exact while K's
    dynamic range collapses — SageAttention's smoothing, arXiv:2410.02367);
    scores dequantized per tile by the rank-1 outer product of the kept
    fp32 per-token scales; softmax statistics fp32; P·V in bf16 as before.
    The s8 MXU runs at twice the bf16 rate on v5e, and the score dot is
    half the kernel's FLOPs — the attention lever for the quantized
    serving modes (int8/w4a8), where attention dominates the 28.8k-token
    reasoning program. Forward-only (no VJP): quality is gated by the
    pipeline PSNR machinery (tests/test_quant.py), like every other quant
    feature.

    Shapes the planner keeps resident in VMEM (short edit sequences) fall
    back to the bf16 resident kernel: its MXU/VPU overlap already runs at
    ~72% of peak and an int8 resident variant has not been swept.

    MEASURED NEGATIVE RESULT on v5e (round 5, tools/tune_attention.py
    --qk8-ab, scan-chained, 28.8k tokens B=2 H=40 D=128): 126.2 TFLOP/s vs
    the bf16 kernel's 138.4 — 9% SLOWER. If Mosaic ran the s8 score dots at
    the MXU's nominal double rate the kernel would land ~+25% (scores are
    half its FLOPs); the observed -9% is consistent with s8 x s8 -> s32
    executing at the bf16 rate plus the rank-1 dequant VPU work. (The XLA
    w8a8 linear path's measured gains come from halved weight HBM traffic,
    which attention doesn't have.) Kept as a tested, PSNR-gated option
    (DiTConfig.attn_qk_int8, default OFF) in case a future Mosaic exposes
    the int8 rate; do not enable for latency on current v5e.
    """
    _check_layout(q)
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    block_q, block_kv, group = _plan_blocks(
        sq, kv_len, d, jnp.dtype(q.dtype).itemsize, block_q, block_kv,
        group if group and group > 1 else None)
    bkv_res = min(block_kv, 256)
    skv_res = -(-kv_len // bkv_res) * bkv_res
    if 2 * skv_res * d * jnp.dtype(q.dtype).itemsize <= _RESIDENT_KV_BYTES:
        return flash_attention(q, k, v, scale)

    kf = k.astype(jnp.float32)
    kc = kf - jnp.mean(kf, axis=1, keepdims=True)  # (B,S,H,D), exact shift
    ks = jnp.maximum(jnp.max(jnp.abs(kc), axis=-1, keepdims=True),
                     1e-20) / 127.0
    k8 = jnp.round(kc / ks).astype(jnp.int8)
    qf = q.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                     1e-20) / 127.0
    q8 = jnp.round(qf / qs).astype(jnp.int8)

    q8b = _pad_to(_to_bh(q8), 1, block_q)
    k8b = _pad_to(_to_bh(k8), 1, group * block_kv)
    vb = _pad_to(_to_bh(v), 1, group * block_kv)

    def scales_bh(s, pad_to):
        sb = _pad_to(_to_bh(s)[..., 0], 1, pad_to)  # (BH, S_pad)
        return jnp.broadcast_to(sb[:, None, :], (sb.shape[0], 8, sb.shape[1]))

    qs_b = scales_bh(qs, block_q)
    ks_b = scales_bh(ks, group * block_kv)
    ob, _ = _forward_qk8(q8b, k8b, vb, qs_b, ks_b, scale, block_q, block_kv,
                         kv_len, v.dtype, group)
    return _from_bh(ob, b, h, sq)


def flash_attention_with_lse(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    block_q: int = _BLOCK_Q, block_kv: int = _BLOCK_KV,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-only flash attention returning ``(out, lse)``.

    ``lse`` is (B, S, H) fp32 logsumexp of the scaled scores. NOT
    differentiable — ring attention (parallel/context.py) wraps per-hop
    calls in its own custom_vjp and supplies exact gradients itself.
    """
    _check_layout(q)
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    block_q, block_kv, group = _plan_blocks(sq, kv_len, d,
                                            jnp.dtype(q.dtype).itemsize,
                                            block_q, block_kv)
    qb = _pad_to(_to_bh(q), 1, block_q)
    kb = _pad_to(_to_bh(k), 1, group * block_kv)
    vb = _pad_to(_to_bh(v), 1, group * block_kv)
    ob, lse = _forward(qb, kb, vb, scale, block_q, block_kv, kv_len, q.dtype,
                       group=group)
    out = _from_bh(ob, b, h, sq)
    lse_bsh = lse[:, 0, :sq].reshape(b, h, sq).transpose(0, 2, 1)
    return out, lse_bsh


def flash_attention_bwd(
    q, k, v, out, dout, lse, scale: float,
    block_q: int = _BLOCK_Q, block_kv: int = _BLOCK_KV,
):
    """Raw flash backward given an explicit (possibly *global*) lse.

    All of q/k/v/out/dout are (B, S, H, D); lse is (B, S, H) fp32. Used by
    ring attention: per hop, p is recomputed as exp(q·k_hop - lse_global),
    which is exactly the globally-normalized probability block, so summing
    per-hop dq (locally) and dk/dv (in rotating buffers) is exact.
    """
    _check_layout(q)
    b, sq, h, d = q.shape
    kv_len = k.shape[1]
    block_q, block_kv, _ = _plan_blocks(sq, kv_len, d,
                                        jnp.dtype(q.dtype).itemsize,
                                        block_q, block_kv)
    qb = _pad_to(_to_bh(q), 1, block_q)
    kb = _pad_to(_to_bh(k), 1, block_kv)
    vb = _pad_to(_to_bh(v), 1, block_kv)
    ob = _pad_to(_to_bh(out), 1, block_q)
    dob = _pad_to(_to_bh(dout), 1, block_q)
    sq_pad = qb.shape[1]
    lse_b = lse.transpose(0, 2, 1).reshape(b * h, sq)  # (BH, S)
    lse_b = jnp.pad(lse_b, ((0, 0), (0, sq_pad - sq)),
                    constant_values=jnp.inf)
    lse_b = jnp.broadcast_to(lse_b[:, None, :], (b * h, 8, sq_pad))
    dq, dk, dv = _backward(qb, kb, vb, ob, dob, lse_b, scale, block_q,
                           block_kv, kv_len)
    return (_from_bh(dq, b, h, sq), _from_bh(dk, b, h, kv_len),
            _from_bh(dv, b, h, kv_len))
