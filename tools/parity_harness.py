#!/usr/bin/env python
"""Numerical-parity harness vs the CUDA reference.

Workflow (SURVEY §7.2 step 3 — PSNR/bit-closeness vs reference activations):

1. On a machine with the reference installed, dump activations with the
   companion spec below (any script that saves the listed arrays to .npz).
2. Here: ``python tools/parity_harness.py dumps.npz --checkpoint-dir ...``
   loads the same weights into chronoedit_tpu, replays the same inputs, and
   reports per-tensor max-abs-diff and PSNR.

Expected .npz keys (all float32, reference shapes):
  x            (B, 36, T, H, W)   transformer input (latents ⊕ condition)
  timestep     (B,)
  text_emb     (B, 512, 4096)
  image_emb    (B, 257, 1280)
  velocity     (B, 16, T, H, W)   reference transformer output
  latents_in   (B, 16, Tl, h, w)  [optional] VAE decode input
  pixels_out   (B, 3, T, H, W)    [optional] reference VAE decode output
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.abs(b).max())
    return 10 * np.log10(peak * peak / mse)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dump", help=".npz with reference activations")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--min-psnr", type=float, default=35.0)
    args = p.parse_args()

    import jax.numpy as jnp

    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.models import weights as w
    import glob

    data = np.load(args.dump)
    cfg = chronoedit_14b()

    shards = sorted(glob.glob(os.path.join(args.checkpoint_dir, "transformer",
                                           "*.safetensors"))) or sorted(
        glob.glob(os.path.join(args.checkpoint_dir, "*.safetensors")))
    params = w.convert_diffusers_dit(w.load_safetensors(shards))
    params = {k: jnp.asarray(v) if not isinstance(v, dict) else v
              for k, v in params.items()}

    out = dit_lib.dit_forward(
        params, cfg.dit,
        jnp.asarray(data["x"]), jnp.asarray(data["timestep"]),
        jnp.asarray(data["text_emb"]), jnp.asarray(data["image_emb"]))
    v = np.asarray(out, np.float32)
    ref = data["velocity"]
    print(f"DiT velocity: max|Δ|={np.abs(v - ref).max():.3e} "
          f"PSNR={psnr(v, ref):.2f} dB")
    ok = psnr(v, ref) >= args.min_psnr

    if "latents_in" in data:
        vae_params = w.convert_wan_vae(
            w.load_torch(os.path.join(args.checkpoint_dir, "Wan2.1_VAE.pth")))
        px = np.asarray(vae_lib.vae_decode(
            jax.tree_util.tree_map(jnp.asarray, vae_params), cfg.vae,
            jnp.asarray(data["latents_in"])), np.float32)
        print(f"VAE decode: max|Δ|={np.abs(px - data['pixels_out']).max():.3e} "
              f"PSNR={psnr(px, data['pixels_out']):.2f} dB")
        ok &= psnr(px, data["pixels_out"]) >= args.min_psnr

    print("PARITY:", "PASS" if ok else "FAIL", f"(threshold {args.min_psnr} dB)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    import jax  # noqa: E402  (after argparse for --help speed)

    main()
