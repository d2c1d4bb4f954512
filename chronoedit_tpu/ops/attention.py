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


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


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
        keeps the kernel local to each tensor-parallel shard.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if (mesh is not None and mesh.shape.get(head_axis, 1) > 1
            and q.shape[2] % mesh.shape[head_axis] == 0):
        from jax.sharding import PartitionSpec as P

        spec = P(None, None, head_axis, None)

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(spec, spec, spec), out_specs=spec,
                           check_vma=False)
        def sharded(qi, ki, vi):
            return dot_product_attention(qi, ki, vi, scale=scale,
                                         backend=backend)

        return sharded(q, k, v)

    use_pallas = backend == "pallas" or (backend is None and _on_tpu())
    if use_pallas:
        try:
            from chronoedit_tpu.ops.flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except NotImplementedError:
            if backend == "pallas":
                raise
    return _xla_attention(q, k, v, scale)
