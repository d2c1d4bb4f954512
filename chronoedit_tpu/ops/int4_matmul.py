"""Pallas fused int4 dequant-matmul (w4a16) for the DiT's quantized path.

An alternative execution path for ``ops/quant.py``'s grouped int4 scheme:
the packed (in_pad/2, out) nibble kernel and its (g, out) per-group scales
stay int4/f32 in HBM, and each weight tile is unpacked + dequantized
**in VMEM** right before the MXU dot, so

- a ``pallas_call`` operand takes the default layout — XLA's layout
  assignment cannot relayout the packed weight stack into transposed
  tiling (the HLO ``copy.*`` temps that OOMed the r3 40-layer single-chip
  pipeline, tools/diag_int4_oom.py);
- bf16 weights never materialize in HBM (the dequant lives and dies in a
  VMEM tile);
- the unpack amortizes over a large M tile (the per-element dequant tax is
  ~1/bm of the MXU work per reuse).

The r4 split-half repacking fixed the relayout problem in the XLA fallback
too, and the committed sweep (tools/tune_int4_matmul.py) measured the
XLA-fused dequant FASTER than this kernel at the serving shapes — so the
kernel ships OFF by default (``CHRONOEDIT_INT4_KERNEL=1`` opts in) as the
escape hatch and as the measured baseline the dispatch decision cites.

Layout contract (quantize_linear_params_int4): packed row i holds original
row i in its LOW nibble and row i + in_pad/2 in its HIGH nibble; the first
half's groups are ``scales[:g//2]`` and the second half's ``scales[g//2:]``.
The kernel grids over (m, n, kp) where kp indexes PACKED rows — each step
unpacks both nibbles and issues two MXU dots (x's lo and hi column slices
against the two dequantized halves), so the packed bytes are read once.

Upstream role parity: this is the MXU-throughput slot TransformerEngine
fills for the reference's projections
(/root/reference/chronoedit/_src/networks/wan2pt1.py:269-308); the
reference has no quantized path at all.

Tile sweep: tools/tune_int4_matmul.py (committed results in its docstring).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chronoedit_tpu.utils.platform import multi_device_world, on_tpu

_GROUP = 128


def _pick(dim: int, cands: tuple[int, ...]) -> int | None:
    for c in cands:
        if dim % c == 0:
            return c
    return None


def int4_matmul_supported(x: jnp.ndarray, packed: jnp.ndarray) -> bool:
    """Kernel engages on single-device TPU programs with tileable shapes.

    Multi-device programs fall back to the XLA path: a Mosaic kernel cannot
    be auto-partitioned by GSPMD, so inside a sharded jit it would force a
    full all-gather of the weight operand — the opposite of what the int4
    capacity scheme wants. (int4 is the ONE-chip serving recipe; the 8-chip
    recipe is int8, docs/SERVING.md.)

    ``CHRONOEDIT_INT4_KERNEL=1`` opts the kernel in; the default is the XLA
    fallback, which the committed tune_int4_matmul sweep measured FASTER at
    the serving shapes (1.73 vs 2.73 ms at 7200x5120x5120 — XLA pipelines
    its fused dequant into the matmul operand stream better than the
    kernel's per-tile VPU dequant). With the r4 split-half packing the
    fallback no longer provokes the relayout copies that motivated the
    kernel, so the kernel's remaining role is an escape hatch if a future
    XLA regression brings the copies back.
    """
    if os.environ.get("CHRONOEDIT_INT4_KERNEL", "0") != "1":
        return False
    if not on_tpu() or multi_device_world():
        return False
    half, dout = packed.shape
    return (x.dtype in (jnp.bfloat16, jnp.float32)
            and half % _GROUP == 0
            and _pick(half, (512, 256, 128)) is not None
            and _pick(dout, (512, 256, 128)) is not None)


def _kernel(x_lo_ref, x_hi_ref, packed_ref, s_lo_ref, s_hi_ref, o_ref,
            acc_ref, *, k_tiles: int, out_dtype):
    kp = pl.program_id(2)

    @pl.when(kp == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = packed_ref[:]                               # (bk, bn) int8
    bk, bn = packed.shape
    groups = bk // _GROUP

    def dq(nib, s_ref):
        w = nib.astype(jnp.float32).reshape(groups, _GROUP, bn)
        w = w * s_ref[:]  # (groups, 1, bn) broadcasts over the group dim
        return w.reshape(bk, bn).astype(x_lo_ref.dtype)

    # nibble extraction in int32 arithmetic — Mosaic has no vector shifts
    # for i8 ('arith.shli' fails to legalize); floor_divide rounds toward
    # -inf, which IS the arithmetic right shift, and the low nibble
    # sign-extends via the >=8 wrap
    p32 = packed.astype(jnp.int32)
    hi = jnp.floor_divide(p32, 16)
    lo = p32 - hi * 16
    lo = lo - jnp.where(lo >= 8, 16, 0)
    w_lo = dq(lo, s_lo_ref)
    w_hi = dq(hi, s_hi_ref)
    acc_ref[:] += jnp.dot(x_lo_ref[:], w_lo,
                          preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(x_hi_ref[:], w_hi,
                          preferred_element_type=jnp.float32)

    @pl.when(kp == k_tiles - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                bm: int = 512, bn: int | None = None,
                bk: int | None = None, interpret: bool = False) -> jnp.ndarray:
    """``x @ dequant(packed, scales)`` with in-VMEM dequant.

    x: (..., K) bf16/f32 with K == 2 * packed.shape[0];
    packed: (K/2, N) int8 split-half nibbles; scales: (g, N) float32.
    Returns (..., N) in x.dtype.
    """
    half, dout = packed.shape
    g = scales.shape[0]
    assert g % 2 == 0 and half == (g // 2) * _GROUP
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    m = x2.shape[0]
    bm = min(bm, max(128, -(-m // 128) * 128))
    bn = bn or _pick(dout, (512, 256, 128))
    bk = bk or _pick(half, (512, 256, 128))
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    k_tiles = half // bk
    grid = (m_pad // bm, dout // bn, k_tiles)
    sg = bk // _GROUP  # scale rows per k tile

    out = pl.pallas_call(
        functools.partial(_kernel, k_tiles=k_tiles, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            # x passed twice: lo columns [0, half), hi columns [half, 2half)
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k + k_tiles),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            # scales ride a (g, 1, N) view: the Mosaic last-two-dims tiling
            # rule sees (1, bn) and the sg group rows ride the leading axis
            pl.BlockSpec((sg, 1, bn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, 1, bn), lambda i, j, k: (k + k_tiles, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * 2 * half * dout,
            bytes_accessed=(m_pad * 2 * half * x.dtype.itemsize
                            + half * dout + m_pad * dout * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x2, x2, packed, scales[:, None, :], scales[:, None, :])
    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, dout)
