#!/usr/bin/env python
"""On-device correctness check: fused Pallas norm kernels vs the jnp
fallbacks (run on TPU; CPU runs are vacuous since kernels fall back)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.ops import fused_norms as F
from chronoedit_tpu.ops import layers as L


def main():
    assert jax.devices()[0].platform == "tpu", "run on TPU"
    B, T, HW, D = 2, 2, 3600, 5120
    S = T * HW
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, S, D), jnp.bfloat16)
    scale = jax.random.normal(ks[1], (B, T, D), jnp.float32) * 0.1
    shift = jax.random.normal(ks[2], (B, T, D), jnp.float32) * 0.1
    gate = jax.random.normal(ks[3], (B, T, D), jnp.float32) * 0.1
    delta = jax.random.normal(ks[4], (B, S, D), jnp.bfloat16)
    w = {"scale": jnp.ones((D,)) + 0.1}

    def ref_lnmod(x, scale, shift):
        xf = L.layer_norm({}, x, 1e-6)
        xt = xf.reshape(B, T, HW, D)
        out = xt * (1 + scale[:, :, None]) + shift[:, :, None]
        return out.reshape(B, S, D).astype(x.dtype)

    a = np.asarray(F.layer_norm_modulate(x, scale, shift, HW), np.float32)
    b = np.asarray(ref_lnmod(x, scale, shift), np.float32)
    print("layer_norm_modulate max diff:", np.abs(a - b).max())
    assert np.abs(a - b).max() < 2e-2

    def ref_gate(x, delta, gate):
        xt = x.astype(jnp.float32).reshape(B, T, HW, D)
        dt = delta.astype(jnp.float32).reshape(B, T, HW, D)
        return (xt + dt * gate[:, :, None]).reshape(B, S, D).astype(x.dtype)

    a = np.asarray(F.gated_residual(x, delta, gate, HW), np.float32)
    b = np.asarray(ref_gate(x, delta, gate), np.float32)
    print("gated_residual max diff:", np.abs(a - b).max())
    assert np.abs(a - b).max() < 2e-2

    a = np.asarray(F.rms_norm_fused(w, x), np.float32)
    b = np.asarray(L.rms_norm(w, x), np.float32)
    print("rms_norm max diff:", np.abs(a - b).max())
    assert np.abs(a - b).max() < 2e-2
    print("fused norm kernels match fallbacks on TPU ✔")


if __name__ == "__main__":
    main()
