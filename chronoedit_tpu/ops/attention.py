"""Attention entry point: one function, hardware-aware dispatch.

The reference dispatches across four CUDA backends by compute capability
(``chronoedit/_src/modules/attention.py:90-181``: FA3 -> cuDNN SDPA -> FA2 ->
xformers).  On TPU the dispatch collapses to:

- a Pallas flash-attention kernel when running on TPU with shapes the kernel
  supports (``chronoedit_tpu.ops.flash_attention``),
- ``jax.nn.dot_product_attention`` otherwise (XLA fuses this well on CPU and
  is the safe fallback everywhere).

Layout is (B, S, H, D) ["BSHD"] throughout the codebase.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    from chronoedit_tpu.utils.platform import on_tpu

    return on_tpu()


def _xla_attention(q, k, v, scale):
    return jax.nn.dot_product_attention(q, k, v, scale=scale)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    backend: str | None = None,
    mesh=None,
    head_axis: str = "tensor",
    qk_int8: bool = False,
    _sharded: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention, (B, S, H, D) layout, no mask (the DiT
    uses full bidirectional attention; padding is handled upstream by the
    padding-mask input channel as in the reference).

    Args:
      q: (B, Sq, H, D); k/v: (B, Sk, H, D).
      scale: softmax scale; defaults to D**-0.5.
      backend: force "pallas" or "xla" (None = auto).
      mesh/head_axis: with a mesh whose ``head_axis`` size > 1, attention is
        shard_mapped over the head dimension — heads are embarrassingly
        parallel, and Pallas calls don't auto-partition under GSPMD, so this
        keeps the kernel local to each tensor-parallel shard.  When the mesh
        also has a context axis that divides Sq, the *query* sequence stays
        context-sharded inside the shard_map while K/V are replicated per
        context group: each shard attends its local queries against full KV.
        Without this, GSPMD must all-gather Q over the context axis and every
        context group redundantly computes full-sequence attention — for the
        DiT's per-block cross-attention that was a 73 MB f32 gather per block
        (~29% of the sharded forward's total collective bytes).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if mesh is not None and getattr(mesh, "size", 1) > 1:
        import math

        from jax.sharding import PartitionSpec as P

        heads_ok = (mesh.shape.get(head_axis, 1) > 1
                    and q.shape[2] % mesh.shape[head_axis] == 0)
        batch_axes = tuple(a for a in ("data", "fsdp")
                           if mesh.shape.get(a, 1) > 1)
        if batch_axes and q.shape[0] % math.prod(
                mesh.shape[a] for a in batch_axes):
            batch_axes = ()
        seq_ok = (mesh.shape.get("context", 1) > 1
                  and q.shape[1] % mesh.shape["context"] == 0)
        # Mosaic kernels cannot be auto-partitioned by GSPMD: on TPU the
        # kernel must always live inside a shard_map (fully-replicated specs
        # are fine); off-TPU the XLA fallback only needs one when an axis is
        # actually exploitable.
        if heads_ok or batch_axes or seq_ok or _on_tpu():
            bspec = batch_axes if batch_axes else None
            hspec = head_axis if heads_ok else None
            qspec = P(bspec, "context" if seq_ok else None, hspec, None)
            kvspec = P(bspec, None, hspec, None)

            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(qspec, kvspec, kvspec),
                               out_specs=qspec, check_vma=False)
            def sharded(qi, ki, vi):
                return dot_product_attention(qi, ki, vi, scale=scale,
                                             backend=backend,
                                             qk_int8=qk_int8, _sharded=True)

            return sharded(q, k, v)

    # Pallas is safe at top level only when the program cannot span devices
    # (GSPMD can't partition Mosaic kernels); mesh-less calls in a
    # multi-device world (pure-GSPMD sharding via input shardings) take the
    # partitionable XLA path instead.  For a deliberately single-device
    # program on a multi-chip host, pass ``mesh=single_device_mesh()`` (or
    # backend="pallas") to keep the flash kernel.
    if not _sharded and mesh is None and backend is None:
        from chronoedit_tpu.utils.platform import multi_device_world

        if multi_device_world():
            return _xla_attention(q, k, v, scale)

    use_pallas = backend == "pallas" or (backend is None and _on_tpu())
    if use_pallas:
        try:
            from chronoedit_tpu.ops.flash_attention import (
                flash_attention, flash_attention_qk_int8)

            if qk_int8:
                # serving-only int8 q/k score matmuls (forward-only, no
                # VJP; short resident-planned sequences fall back to bf16
                # inside) — the quantized-mode attention lever, PSNR-gated
                # in tests/test_quant.py
                return flash_attention_qk_int8(q, k, v, scale=scale)
            return flash_attention(q, k, v, scale=scale)
        except NotImplementedError:
            if backend == "pallas":
                raise
    return _xla_attention(q, k, v, scale)
