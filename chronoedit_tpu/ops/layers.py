"""Primitive layers as pure functions over parameter dicts.

Conventions:
- Linear params: ``{"kernel": (in, out), "bias": (out,)}`` (bias optional).
- LayerNorm/RMSNorm statistics always accumulate in float32 and results are
  cast back to the input dtype — mirroring the reference's FP32LayerNorm /
  fp32-upcast RMSNorm policy (transformer_chronoedit.py:32, :279-293).
- Initializers return parameter trees; apply functions are jit-friendly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ------------------------------------------------------------------ linear

def linear_init(key, d_in: int, d_out: int, bias: bool = True,
                dtype=jnp.float32, scale: float | None = None) -> Params:
    """Xavier-uniform kernel (reference init_weights uses xavier_uniform for
    attention/ffn projections, wan2pt1.py:865-906)."""
    if scale is None:
        limit = float(np.sqrt(6.0 / (d_in + d_out)))
    else:
        limit = scale
    k = jax.random.uniform(key, (d_in, d_out), dtype, -limit, limit)
    p = {"kernel": k}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p:  # int8 w8a8 serving path (ops/quant.py)
        from chronoedit_tpu.ops.quant import quantized_linear

        y = quantized_linear(p, x)
    elif "kernel_q4" in p:  # int4 w4a16 capacity path (ops/quant.py)
        from chronoedit_tpu.ops.quant import quantized_linear_int4

        y = quantized_linear_int4(p, x)
    else:
        y = x @ p["kernel"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
    if "lora_a" in p:
        # unmerged (side-branch) LoRA: y += (x @ a) @ b, the adapter scaling
        # pre-folded into b (models/lora.attach_lora). This is the
        # QLoRA-style path — the base kernel may be a packed int8/int4 leaf
        # with no float kernel to merge into; rank is tiny, so the fp32
        # side matmuls are noise next to the base matmul
        xf = x.astype(jnp.float32)
        d = (xf @ p["lora_a"].astype(jnp.float32)) @ p["lora_b"].astype(
            jnp.float32)
        y = y + d.astype(y.dtype)
    return y


# ------------------------------------------------------------------ norms

def layer_norm_init(dim: int, affine: bool = True, dtype=jnp.float32) -> Params:
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6,
               out_dtype=None) -> jnp.ndarray:
    """fp32 LayerNorm. ``out_dtype=None`` keeps float32 output (callers doing
    AdaLN modulation want to stay in fp32 until after the modulate)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in p:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(out_dtype) if out_dtype is not None else y


def rms_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with fp32 statistics, output in input dtype (diffusers RMSNorm
    semantics used for qk-norm "rms_norm_across_heads")."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["scale"].astype(x.dtype)


# ------------------------------------------------------------------ misc

def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """gelu-approximate / gelu_tanh, the DiT FFN + text-embedder activation."""
    return jax.nn.gelu(x, approximate=True)


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10_000.0,
    flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """diffusers ``Timesteps`` embedding (flip_sin_to_cos=True, shift=0 for
    Wan; transformer_chronoedit.py:137).  Input (...,) -> output (..., dim),
    float32.
    """
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def mlp_init(key, d_in: int, d_hidden: int, d_out: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, d_in, d_hidden, dtype=dtype),
        "fc2": linear_init(k2, d_hidden, d_out, dtype=dtype),
    }
