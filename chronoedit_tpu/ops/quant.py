"""Dynamic int8 (w8a8) quantization for the DiT's hot matmuls.

v5e's MXU runs s8 x s8 -> s32 at twice the bf16 rate (394 vs 197 TOPS), and
the DiT block is matmul-bound: at 720p edit shapes ~80% of per-block FLOPs
are the qkvo/ffn projections. Quantizing just those (attention itself and
the small conditioning embedders stay bf16) approaches a 2x block-time win
on the serving path.

Scheme (standard dynamic per-token / per-channel, SmoothQuant-style scale
placement without the offline calibration):

- **Weights**: symmetric int8 with one scale per *output channel*,
  quantized once at load time (:func:`quantize_linear_params`).
- **Activations**: symmetric int8 with one scale per *token*, computed on
  the fly from the running absmax (a cheap VPU reduction XLA fuses into the
  surrounding elementwise work).
- Accumulation in int32, dequantized by the rank-1 outer product of the two
  scale vectors; bias added in fp32.

The reference has no quantized path (it serves bf16 through cuDNN/TE); this
is a TPU-native serving accelerator, opt-in via
``models.weights.quantize_dit_params`` / ``pipeline.quantize()`` and exact
in expectation only — validated to ~1% relative error on random weights in
``tests/test_quant.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

_EPS = 1e-8


def quantize_linear_params(p: Params) -> Params:
    """{"kernel": (in, out) float, "bias"?} -> int8 kernel + per-out-channel
    scales. Safe to call under jit or on host numpy arrays."""
    k = p["kernel"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0), _EPS) / 127.0  # (out,)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantized_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """w8a8 linear: dynamic per-token activation quant, int32 MXU accumulate,
    fp32 dequant. Output in ``x.dtype``."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, _EPS) / 127.0  # (..., 1) per-token scale
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * p["kernel_scale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def is_quantized(p: Params) -> bool:
    return isinstance(p, dict) and "kernel_q" in p


# DiT block linears worth quantizing: the per-token projections. The tiny
# per-context kv projections and the fp32-sensitive edges (patch/time/text
# embedders, zero-init head) stay bf16.
_BLOCK_LINEARS = (
    ("self_attn", "q"), ("self_attn", "k"), ("self_attn", "v"),
    ("self_attn", "o"),
    ("cross_attn", "q"), ("cross_attn", "o"),
    ("ffn", "fc1"), ("ffn", "fc2"),
)


def quantize_dit_params(params: Params,
                        skip: tuple[tuple[str, str], ...] = ()) -> Params:
    """Quantize the stacked DiT block projections in-place-shaped: returns a
    new pytree where each targeted linear carries ``kernel_q``/``kernel_scale``
    instead of ``kernel``. Stacked (L, in, out) kernels get per-(layer, out)
    scales via vmap.

    ``skip`` lists (module, name) projections to keep bf16 — the sensitivity
    escape hatch when the int8 PSNR gate fails for a given checkpoint (use
    :func:`rank_projection_sensitivity` to pick). Per-*projection* rather
    than per-layer granularity: the scan over weight-stacked blocks needs a
    homogeneous pytree across layers, so a projection is either int8 in
    every layer or bf16 in every layer."""
    out = dict(params)
    blocks = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in params["blocks"].items()}
    for mod, name in _BLOCK_LINEARS:
        if mod not in blocks or name not in blocks[mod]:
            continue
        if (mod, name) in skip:
            continue
        if is_quantized(blocks[mod][name]):
            continue  # idempotent: pipeline.quantize() may be called twice
        sub = dict(blocks[mod])
        sub[name] = jax.vmap(quantize_linear_params)(sub[name])
        blocks[mod] = sub
    out["blocks"] = blocks
    return out


def rank_projection_sensitivity(params: Params) -> list[tuple[tuple[str, str], float]]:
    """Rank the quantizable projections by weight-quantization error (worst
    first): max over layers of the per-channel relative int8 error. Feed the
    top-K into ``quantize_dit_params(skip=...)`` when a checkpoint fails the
    pipeline-level PSNR gate (docs/SERVING.md)."""
    scores = []
    for mod, name in _BLOCK_LINEARS:
        sub = params["blocks"].get(mod, {})
        if name not in sub or is_quantized(sub[name]):
            continue
        errs = jax.vmap(lambda p: quantization_error_j(p))(sub[name])
        scores.append(((mod, name), float(jnp.max(errs))))
    return sorted(scores, key=lambda kv: -kv[1])


def dequantize_linear_params(p: Params) -> Params:
    """Inverse (lossy) of :func:`quantize_linear_params` — for tests and for
    re-export paths that need a float kernel back."""
    k = p["kernel_q"].astype(jnp.float32) * p["kernel_scale"]
    out = {"kernel": k}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantization_error_j(p: Params) -> jnp.ndarray:
    """Max relative per-channel weight error introduced by int8 (traced)."""
    deq = dequantize_linear_params(quantize_linear_params(p))["kernel"]
    k = p["kernel"].astype(jnp.float32)
    denom = jnp.maximum(jnp.max(jnp.abs(k), axis=0), _EPS)
    return jnp.max(jnp.max(jnp.abs(deq - k), axis=0) / denom)


def quantization_error(p: Params) -> float:
    """Host-side :func:`quantization_error_j` (diagnostic)."""
    return float(quantization_error_j(p))
