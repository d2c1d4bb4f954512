#!/usr/bin/env python
"""A/B alternative lowerings of the VAE's causal 3D convs on the real chip.

The decoder runs at ~50 TFLOP/s (25% of v5e bf16 peak; XLA cost analysis:
32.1 TFLOP / 260 GB over a measured 0.64 s), so its convs are the last big
single-chip e2e slice with headroom. Candidate lowerings, all exactly the
same math as ``causal_conv3d`` (models/vae.py):

- conv3d:   the current ``lax.conv_general_dilated`` NDHWC 3D conv
- conv2d3:  temporal taps decomposed into 3 shifted 2D convs (T folded into
            batch), summed — tests whether XLA's 3D lowering is the problem
- conv2dcat: the 3 shifted inputs concatenated on channels -> ONE 2D conv
            with a (3, 3, 3*Cin, Cout) kernel — one big MXU contraction per
            output tile at the cost of materializing the 3x concat
- conv3d_pad128: output channels zero-padded to 128 multiples (more FLOPs,
            full MXU tiles), then sliced

Run on TPU: python tools/tune_vae_conv.py

MEASURED (v5e, 2026-08-19, scan-differenced): the current 3D conv WINS at
every decoder level — 84.4 / 108.1 / 171.6 TFLOP/s at C=96/192/384 vs
39-63 for the 3-tap 2D decomposition, 35-57 for the channel-concat form,
and no change from cout-padding to 128. XLA's NDHWC 3D lowering is already
the right one; the decoder's remaining gap to its ~0.32 s bandwidth floor
is elementwise/norm traffic between convs, not conv lowering. Negative
result recorded so nobody re-derives it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.tune_int4_matmul import time_op

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def conv3d(x, kernel):
    kt, kh, kw = kernel.shape[:3]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1),
        padding=[(2 * (kt // 2), 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _shifted(x, kt):
    """Causal-padded temporal taps: list of kt views, each (B,T,H,W,C)."""
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2 * (kt // 2), 0), (0, 0), (0, 0), (0, 0)))
    return [xp[:, i:i + t] for i in range(kt)]


def conv2d3(x, kernel):
    kt, kh, kw, cin, cout = kernel.shape
    b, t, h, w, c = x.shape
    taps = _shifted(x, kt)
    out = None
    for i, xi in enumerate(taps):
        yi = jax.lax.conv_general_dilated(
            xi.reshape(b * t, h, w, c), kernel[i],
            window_strides=(1, 1),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = yi if out is None else out + yi
    return out.reshape(b, t, h, w, cout)


def conv2dcat(x, kernel):
    kt, kh, kw, cin, cout = kernel.shape
    b, t, h, w, c = x.shape
    xcat = jnp.concatenate(_shifted(x, kt), axis=-1)  # (B,T,H,W,kt*C)
    kcat = kernel.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kt * cin, cout)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * t, h, w, kt * c), kcat,
        window_strides=(1, 1),
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, t, h, w, cout)


def conv3d_pad128(x, kernel):
    kt, kh, kw, cin, cout = kernel.shape
    cpad = (-cout) % 128
    if cpad:
        kernel = jnp.pad(kernel, ((0, 0),) * 4 + ((0, cpad),))
    y = conv3d(x, kernel)
    return y[..., :cout] if cpad else y


VARIANTS = {"conv3d": conv3d, "conv2d3": conv2d3, "conv2dcat": conv2dcat,
            "conv3d_pad128": conv3d_pad128}

# the decoder's FLOP-dominant res-block conv shapes at 720p / 2 latent
# frames (each level: C doubles as HxW quarters -> equal FLOPs per conv)
SHAPES = [
    ((1, 5, 704, 1280, 96), 96),
    ((1, 5, 352, 640, 192), 192),
    ((1, 5, 176, 320, 384), 384),
]


def main():
    for xshape, cout in SHAPES:
        cin = xshape[-1]
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, xshape, jnp.bfloat16)
        kernel = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16)
                  * (27 * cin) ** -0.5)
        flops = 2 * (xshape[1] * xshape[2] * xshape[3]) * 27 * cin * cout
        print(f"== x={xshape} cout={cout} ({flops / 1e12:.2f} TFLOP)",
              flush=True)
        ref = None
        for name, fn in VARIANTS.items():
            y = jax.jit(fn)(x, kernel)
            if ref is None:
                ref = y
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - ref.astype(jnp.float32))))
            dt = time_op(fn, x, kernel, reps=(2, 6), iters=3)
            print(f"{name:14s}: {dt * 1e3:7.2f} ms "
                  f"({flops / dt / 1e12:6.1f} TFLOP/s) maxerr={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
