"""Fused Pallas kernels for the DiT's norm/modulation elementwise chain.

Profiling the 14B block on v5e shows ~10 ms/layer spent in XLA's
fp32-upcast norm/modulate/gate fusions (multiply_reduce / convert_reduce
fusions) — each is HBM-bound work that should cost ~0.2 ms. These kernels
do each chain in one VMEM pass:

- :func:`layer_norm_modulate` — fp32 LayerNorm (no affine) + AdaLN
  ``(1+scale)*x_hat + shift`` with **per-frame** scale/shift, bf16 in/out.
- :func:`gated_residual` — ``x + delta * gate`` accumulated in fp32 with a
  per-frame gate.
- :func:`rms_norm_fused` — the qk "rms_norm_across_heads" (fp32 stats,
  learned weight).

All fall back to the unfused jnp implementations for shapes the kernels
don't support (CPU tests, indivisible grids).

Multi-device programs (``mesh=`` passed): GSPMD cannot partition Mosaic
kernels, so each op wraps itself in a ``jax.shard_map`` whose specs match the
DiT's activation layout — tokens context-sharded, batch data/fsdp-sharded,
features replicated (tensor-sharded for the qk rms norm). The per-frame
scale/shift/gate tensors enter replicated and are sliced to the shard's
frames inside the body (:func:`local_frame_slice`), which handles both
whole-frames-per-shard and shards-within-a-frame splits. This keeps the
fused kernels in the sharded program instead of silently degrading to the
plain-XLA chain (round-2 weakness #3).
"""

from __future__ import annotations

import contextlib
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from chronoedit_tpu.ops import layers as L

_ROW_BLOCK = 128

# trace-time switch: Mosaic kernels cannot be auto-partitioned by GSPMD, so
# multi-device programs (dit_forward with a >1-device mesh) must trace the
# plain jnp implementations instead — XLA fuses those and partitions them
# freely.  (Caught by the v5e AOT compile of the sharded step; single-chip
# TPU runs keep the fused kernels.)
_FUSED_ENABLED = True


@contextlib.contextmanager
def plain_norms():
    """Trace the plain-XLA norm implementations inside this context."""
    global _FUSED_ENABLED
    prev = _FUSED_ENABLED
    _FUSED_ENABLED = False
    try:
        yield
    finally:
        _FUSED_ENABLED = prev


def _pick_rows(n: int, cap: int = _ROW_BLOCK) -> int | None:
    """Largest divisor of ``n`` that is <= cap and sublane-aligned (mult of
    8). Production token grids are rarely powers of two (720p: hw = 3600),
    so a fixed 256 silently fell back to the unfused XLA path — the row
    block must *divide* the frame size."""
    for r in range(min(cap, n), 7, -1):
        if n % r == 0 and r % 8 == 0:
            return r
    return None


def _supported(x: jnp.ndarray, hw: int, rows: int | None) -> bool:
    from chronoedit_tpu.utils.platform import on_tpu

    if not _FUSED_ENABLED or not on_tpu():
        return False
    b, s, d = x.shape
    return rows is not None and d % 128 == 0 and s % hw == 0


# ----------------------------------------------------------- ln + modulate

def _lnmod_kernel(x_ref, scale_ref, shift_ref, o_ref, *, eps: float):
    ti = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (R, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + eps)
    sc = scale_ref[0, ti].astype(jnp.float32)  # (D,)
    sh = shift_ref[0, ti].astype(jnp.float32)
    o_ref[0] = (xhat * (1.0 + sc) + sh).astype(o_ref.dtype)


def _lnmod_jnp(x, scale, shift, hw, eps):
    b, s, d = x.shape
    t = s // hw
    xf = L.layer_norm({}, x, eps)  # fp32
    xt = xf.reshape(b, t, hw, d)
    out = xt * (1.0 + scale[:, :, None].astype(jnp.float32)) \
        + shift[:, :, None].astype(jnp.float32)
    return out.reshape(b, s, d).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _lnmod_local(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                 hw: int, eps: float = 1e-6) -> jnp.ndarray:
    """Single-shard LN+modulate (Pallas on TPU). Backward runs the
    (identical-math) jnp formulation, so the Pallas forward stays
    autodiff-compatible."""
    return _lnmod_fwd_impl(x, scale, shift, hw, eps)


def _lnmod_vjp_fwd(x, scale, shift, hw, eps):
    return _lnmod_fwd_impl(x, scale, shift, hw, eps), (x, scale, shift)


def _lnmod_vjp_bwd(hw, eps, res, g):
    x, scale, shift = res
    _, vjp = jax.vjp(lambda *a: _lnmod_jnp(*a, hw, eps), x, scale, shift)
    return vjp(g)


_lnmod_local.defvjp(_lnmod_vjp_fwd, _lnmod_vjp_bwd)


def layer_norm_modulate(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                        hw: int, eps: float = 1e-6, mesh=None) -> jnp.ndarray:
    """x (B, S, D) bf16; scale/shift (B, T, D) fp32 with S = T*hw.
    Returns (B, S, D) in x.dtype.  With a >1-device ``mesh`` the op runs
    inside a shard_map matching the DiT activation layout so the Pallas
    kernel survives in the multi-chip program."""
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        out = _framewise_sharded(
            lambda xl, sc, sh, hwl: _lnmod_local(xl, sc, sh, hwl, eps),
            mesh, (x,), (scale, shift), hw)
        if out is not None:
            return out
        return _lnmod_jnp(x, scale, shift, hw, eps)  # GSPMD partitions this
    return _lnmod_local(x, scale, shift, hw, eps)


def _lnmod_fwd_impl(x, scale, shift, hw, eps):
    b, s, d = x.shape
    t = s // hw
    rows = _pick_rows(hw)
    if not _supported(x, hw, rows):
        return _lnmod_jnp(x, scale, shift, hw, eps)

    grid = (b, t, hw // rows)
    return pl.pallas_call(
        functools.partial(_lnmod_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, d),
                         lambda bi, ti, j: (bi, ti * (hw // rows) + j, 0),
                         memory_space=pltpu.VMEM),
            # full (T, D) per batch: a (1, 1, D) block would violate the
            # sublane tiling rule when T > 1; the kernel indexes frame ti
            pl.BlockSpec((1, t, d), lambda bi, ti, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda bi, ti, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, d),
                               lambda bi, ti, j: (bi, ti * (hw // rows) + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
    )(x, scale, shift)


# ----------------------------------------------------------- gated residual

def _gate_kernel(x_ref, delta_ref, gate_ref, o_ref):
    ti = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    dlt = delta_ref[0].astype(jnp.float32)
    g = gate_ref[0, ti].astype(jnp.float32)
    o_ref[0] = (x + dlt * g).astype(o_ref.dtype)


def _gate_jnp(x, delta, gate, hw):
    b, s, d = x.shape
    t = s // hw
    xt = x.astype(jnp.float32).reshape(b, t, hw, d)
    dt = delta.astype(jnp.float32).reshape(b, t, hw, d)
    out = xt + dt * gate[:, :, None].astype(jnp.float32)
    return out.reshape(b, s, d).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gate_local(x: jnp.ndarray, delta: jnp.ndarray, gate: jnp.ndarray,
                hw: int) -> jnp.ndarray:
    """Single-shard gated residual (Pallas on TPU)."""
    return _gate_fwd_impl(x, delta, gate, hw)


def _gate_vjp_fwd(x, delta, gate, hw):
    return _gate_fwd_impl(x, delta, gate, hw), (x, delta, gate)


def _gate_vjp_bwd(hw, res, g):
    x, delta, gate = res
    _, vjp = jax.vjp(lambda *a: _gate_jnp(*a, hw), x, delta, gate)
    return vjp(g)


_gate_local.defvjp(_gate_vjp_fwd, _gate_vjp_bwd)


def gated_residual(x: jnp.ndarray, delta: jnp.ndarray, gate: jnp.ndarray,
                   hw: int, mesh=None) -> jnp.ndarray:
    """x + delta*gate in fp32; gate (B, T, D) per-frame; output x.dtype."""
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        out = _framewise_sharded(
            lambda xl, dl, g, hwl: _gate_local(xl, dl, g, hwl),
            mesh, (x, delta), (gate,), hw)
        if out is not None:
            return out
        return _gate_jnp(x, delta, gate, hw)
    return _gate_local(x, delta, gate, hw)


def _gate_fwd_impl(x, delta, gate, hw):
    b, s, d = x.shape
    t = s // hw
    rows = _pick_rows(hw)
    if not _supported(x, hw, rows):
        return _gate_jnp(x, delta, gate, hw)

    grid = (b, t, hw // rows)
    row_spec = pl.BlockSpec((1, rows, d),
                            lambda bi, ti, j: (bi, ti * (hw // rows) + j, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gate_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec,
                  pl.BlockSpec((1, t, d), lambda bi, ti, j: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
    )(x, delta, gate)


# ----------------------------------------------------------- rms norm

def _rms_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    o_ref[0] = ((x * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)
                * w_ref[0].astype(o_ref.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rms_local(params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Single-shard rms norm (Pallas on TPU)."""
    return _rms_fwd_impl(params, x, eps)


def _rms_vjp_fwd(params, x, eps):
    return _rms_fwd_impl(params, x, eps), (params, x)


def _rms_vjp_bwd(eps, res, g):
    params, x = res
    _, vjp = jax.vjp(lambda p, xx: L.rms_norm(p, xx, eps), params, x)
    return vjp(g)


_rms_local.defvjp(_rms_vjp_fwd, _rms_vjp_bwd)


def rms_norm_fused(params, x: jnp.ndarray, eps: float = 1e-6,
                   mesh=None) -> jnp.ndarray:
    """Drop-in for ops.layers.rms_norm on (B, S, D).

    With a >1-device ``mesh`` the op shard_maps over the activation layout.
    The qk projections are column-split under tensor parallelism, so the
    feature dim enters tensor-sharded and the "across heads" statistics are
    completed with one tiny psum over the tensor axis (the same collective
    GSPMD inserts for the plain formulation — but here the surrounding
    elementwise work stays explicit and fused)."""
    if mesh is None or getattr(mesh, "size", 1) <= 1:
        return _rms_local(params, x, eps)

    b, s, d = x.shape
    cp = mesh.shape.get("context", 1)
    tp = mesh.shape.get("tensor", 1)
    cp_ok = cp > 1 and s % cp == 0
    tp_ok = tp > 1 and d % tp == 0
    batch = _mesh_batch_axes(mesh, b)
    bspec = batch if batch else None
    xspec = P(bspec, "context" if cp_ok else None,
              "tensor" if tp_ok else None)
    wspec = P("tensor" if tp_ok else None)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(wspec, xspec),
                       out_specs=xspec, check_vma=False)
    def run(w_l, x_l):
        if not tp_ok:
            return _rms_local({"scale": w_l}, x_l, eps)
        xf = x_l.astype(jnp.float32)
        ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
        ss = jax.lax.psum(ss, "tensor")
        y = (xf * jax.lax.rsqrt(ss / d + eps)).astype(x_l.dtype)
        return y * w_l.astype(x_l.dtype)

    return run(params["scale"], x)


def _rms_fwd_impl(params, x, eps):
    from chronoedit_tpu.utils.platform import on_tpu

    b, s, d = x.shape
    rows = _pick_rows(s)
    if not _FUSED_ENABLED or not on_tpu() or d % 128 != 0 or rows is None:
        return L.rms_norm(params, x, eps)
    w = params["scale"].reshape(1, d)
    return pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(b, s // rows),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda bi, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bi, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda bi, j: (bi, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
    )(x, w)


# ----------------------------------------------------- sharded dispatch

def _mesh_batch_axes(mesh, b: int) -> tuple[str, ...]:
    axes = tuple(a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1)
    if axes and b % math.prod(mesh.shape[a] for a in axes):
        axes = ()
    return axes


def local_frame_slice(mods, hw: int, s_local: int, axis_name: str):
    """Slice per-frame modulation tensors to a context shard's frames.

    Inside a shard_map whose token axis is split over ``axis_name`` into
    contiguous blocks of ``s_local`` tokens, a (B, T, ...) modulation tensor
    maps onto the local tokens in one of two regimes:

    - whole frames per shard (``s_local % hw == 0``): the shard holds
      ``s_local // hw`` consecutive frames;
    - shard within a frame (``hw % s_local == 0``): every token of the shard
      belongs to the single frame ``shard_idx * s_local // hw``.

    Returns ``(mods_local, hw_local)`` where each mod is (B, T_local, ...)
    and ``hw_local`` is the per-local-frame token count. Callers must have
    verified one of the two regimes holds (see :func:`frames_map_locally`).
    """
    idx = jax.lax.axis_index(axis_name)
    if s_local % hw == 0:
        t_local, hw_local = s_local // hw, hw
        start = idx * t_local
    else:
        t_local, hw_local = 1, s_local
        start = idx * s_local // hw
    out = tuple(jax.lax.dynamic_slice_in_dim(m, start, t_local, 1)
                for m in mods)
    return out, hw_local


def frames_map_locally(s: int, hw: int, cp: int) -> bool:
    """Can a (B, T*hw, D) stream split into ``cp`` contiguous token blocks be
    frame-modulated shard-locally?"""
    if s % cp:
        return False
    s_local = s // cp
    return s_local % hw == 0 or hw % s_local == 0


def _framewise_sharded(local_fn, mesh, streams, mods, hw: int):
    """Run a frame-modulated elementwise op under shard_map.

    streams: (B, S, D) tensors sharded P(batch, context, None);
    mods: (B, T, D) tensors, replicated in and sliced per shard.
    Returns None when the layout cannot be mapped (caller falls back to the
    GSPMD-partitionable jnp formulation).
    """
    b, s, _ = streams[0].shape
    cp = mesh.shape.get("context", 1)
    cp_ok = cp > 1 and s % cp == 0
    if cp_ok and not frames_map_locally(s, hw, cp):
        return None
    batch = _mesh_batch_axes(mesh, b)
    bspec = batch if batch else None
    xspec = P(bspec, "context" if cp_ok else None, None)
    mspec = P(bspec, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(tuple(xspec for _ in streams), tuple(mspec for _ in mods)),
        out_specs=xspec, check_vma=False)
    def run(streams_l, mods_l):
        hw_l = hw
        if cp_ok:
            mods_l, hw_l = local_frame_slice(
                mods_l, hw, streams_l[0].shape[1], "context")
        return local_fn(*streams_l, *mods_l, hw_l)

    return run(tuple(streams), tuple(mods))
