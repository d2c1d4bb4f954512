#!/usr/bin/env python
"""Mid-size parity run vs the reference (round-3, VERDICT #8).

The tiny-geometry full-pipeline crosscheck (tests/test_reference_pipeline_
e2e.py, 129 dB) proves the numerics; this tool pushes the same evidence
toward production shapes: **full 14B hidden geometry** (dim 5120, 40 heads x
128, ffn 13824) at reduced depth (2 layers) and a **full-channel Wan VAE**
(dim 96, z 16) at 256px, executing the reference's own torch modules on CPU
against ``ChronoEditPipeline`` with converted weights.

Reports per-stage PSNR: VAE encode (condition latents), one DiT velocity
forward, the denoise trajectory (post-solver latents), VAE decode, and the
full pipeline's pixels.  Results are recorded in PARITY.md.

Usage:  JAX_PLATFORMS=cpu python tools/parity_midsize.py [--size 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.abs(b).max())
    return 10 * np.log10(peak * peak / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256, help="square image px")
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--shift", type=float, default=5.0)
    ap.add_argument("--guidance", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platform_name", "cpu")

    from tests.test_reference_crosscheck import REFERENCE, _stub_modules
    from tests.test_reference_dit import _stub_te_and_flash
    from tests.test_reference_unipc import _stub_diffusers

    assert os.path.isdir(REFERENCE), "reference tree unavailable"
    _stub_modules()
    _stub_te_and_flash()
    _stub_diffusers()
    import torch

    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from chronoedit._src.models.fm_solvers_unipc import FlowUniPCMultistepScheduler
    from chronoedit._src.modules.selective_activation_checkpoint import SACConfig
    from chronoedit._src.networks.chronoedit_14b import EditWanModel
    from chronoedit._src.tokenizers.wan2pt1 import WanVAE_

    import jax.numpy as jnp

    from chronoedit_tpu.core.rope import Rope3DSpec
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.models import weights as weights_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline
    from chronoedit_tpu.pipeline.edit_pipeline import PipelineConfig

    torch.manual_seed(11)
    torch.set_num_threads(os.cpu_count() or 8)
    px = args.size
    t0 = time.time()

    # ---- FULL 14B hidden geometry, reduced depth; full-channel Wan VAE
    print(f"[parity] building reference nets (dim 5120, {args.layers} "
          f"layers; VAE dim 96 z 16) ...", flush=True)
    ref_net = EditWanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=512, in_dim=36,
        dim=5120, ffn_dim=13824, freq_dim=256, text_dim=4096, out_dim=16,
        num_heads=40, num_layers=args.layers, qk_norm=True,
        cross_attn_norm=True, eps=1e-6, temporal_skip_p=True,
        temporal_skip_len=8, sac_config=SACConfig(mode="none"),
        postpone_checkpoint=True,
    ).eval().float()
    with torch.no_grad():
        for p in ref_net.parameters():
            p.uniform_(-0.02, 0.02)
    ref_vae = WanVAE_(dim=96, z_dim=16, dim_mult=[1, 2, 4, 4],
                      num_res_blocks=2, attn_scales=[],
                      temperal_downsample=[False, True, True],
                      dropout=0.0).eval().float()

    vae_cfg = vae_lib.VAEConfig()  # full Wan defaults (dim 96, z 16)
    dit_cfg = dit_lib.DiTConfig(num_layers=args.layers, dtype=jnp.float32,
                                rope=Rope3DSpec(head_dim=128,
                                                temporal_skip_len=8))
    pipe_cfg = PipelineConfig(dit=dit_cfg, vae=vae_cfg, num_steps=args.steps,
                              guidance_scale=args.guidance,
                              flow_shift=args.shift, num_frames=5)

    print(f"[parity] converting weights ... ({time.time()-t0:.0f}s)",
          flush=True)
    dit_params = jax.tree_util.tree_map(jnp.asarray, weights_lib.convert_native_dit(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()},
        num_layers=args.layers))
    vae_params = jax.tree_util.tree_map(jnp.asarray, weights_lib.convert_wan_vae(
        {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()},
        dim_mult=vae_cfg.dim_mult, num_res_blocks=vae_cfg.num_res_blocks,
        temporal_downsample=vae_cfg.temporal_downsample))

    # ---- shared inputs: 5 pixel frames -> 2 latent frames (edit mode)
    rng = np.random.default_rng(12)
    num_frames = 5
    hl = wl = px // 8
    image = rng.uniform(-1, 1, (1, 3, px, px)).astype(np.float32)
    text = (rng.standard_normal((1, 512, 4096)) * 0.3).astype(np.float32)
    img_emb = (rng.standard_normal((1, 257, 1280)) * 0.1).astype(np.float32)
    lat0 = rng.standard_normal((1, 16, 2, hl, wl)).astype(np.float32)

    stages: dict[str, float] = {}

    # ---- reference rollout with per-stage dumps.  z_dim == 16 engages the
    # Wan latent-statistics normalization on our side (models/vae.py:393),
    # so the reference must be driven with the same scale=[mean, 1/std] the
    # real reference pipeline uses (wan2pt1.py:502-549) — scale=[0.0, 1.0]
    # here produced a spurious 5.8 dB "mismatch" in the first run.
    from chronoedit_tpu.models.vae import WAN_LATENT_MEAN, WAN_LATENT_STD

    ref_scale = [torch.tensor(WAN_LATENT_MEAN, dtype=torch.float32),
                 1.0 / torch.tensor(WAN_LATENT_STD, dtype=torch.float32)]
    tfac = 4
    with torch.no_grad():
        print(f"[parity] reference VAE encode ... ({time.time()-t0:.0f}s)",
              flush=True)
        video_cond = torch.cat(
            [torch.from_numpy(image).unsqueeze(2),
             torch.zeros(1, 3, num_frames - 1, px, px)], dim=2)
        cond_lat = ref_vae.encode(video_cond, scale=ref_scale)
        mask = torch.ones(1, 1, num_frames, hl, wl)
        mask[:, :, 1:] = 0
        ff = torch.repeat_interleave(mask[:, :, 0:1], dim=2, repeats=tfac)
        mask = torch.cat([ff, mask[:, :, 1:]], dim=2)
        mask = mask.view(1, -1, tfac, hl, wl).transpose(1, 2)
        y = torch.cat([mask, cond_lat], dim=1)

        print(f"[parity] reference denoise ({args.steps} steps) ... "
              f"({time.time()-t0:.0f}s)", flush=True)
        sched = FlowUniPCMultistepScheduler(
            num_train_timesteps=1000, solver_order=2, shift=1.0)
        sched.set_timesteps(args.steps, device="cpu", shift=args.shift)
        lat = torch.from_numpy(lat0.copy())
        ref_v0 = None
        for t in sched.timesteps:
            t_in = torch.full((1, 1), float(t))
            v = ref_net(x_B_C_T_H_W=lat, timesteps_B_T=t_in,
                        crossattn_emb=torch.from_numpy(text),
                        frame_cond_crossattn_emb_B_L_D=torch.from_numpy(img_emb),
                        y_B_C_T_H_W=y)
            if ref_v0 is None:
                ref_v0 = v.numpy().copy()
            lat = sched.step(v, t, lat, return_dict=False)[0]
        ref_lat = lat.numpy().copy()
        print(f"[parity] reference VAE decode ... ({time.time()-t0:.0f}s)",
              flush=True)
        ref_pixels = ref_vae.decode(lat, scale=ref_scale).numpy()

    # ---- our side, stage by stage (same weights/inputs)
    from chronoedit_tpu.pipeline.edit_pipeline import prepare_condition

    print(f"[parity] chronoedit_tpu stages ... ({time.time()-t0:.0f}s)",
          flush=True)
    cond = prepare_condition(vae_params, pipe_cfg, jnp.asarray(image),
                             num_frames)
    stages["vae_encode_cond"] = psnr(np.asarray(cond[:, tfac:], np.float32),
                                     cond_lat.numpy())

    x_in = jnp.concatenate([jnp.asarray(lat0), cond], axis=1)
    ts0 = jnp.full((1,), float(np.asarray(sched.timesteps[0])), jnp.float32)
    v0 = dit_lib.dit_forward(dit_params, dit_cfg, x_in, ts0,
                             jnp.asarray(text), jnp.asarray(img_emb))
    stages["dit_velocity_fwd"] = psnr(np.asarray(v0, np.float32), ref_v0)

    pipe = ChronoEditPipeline(pipe_cfg, dit_params, vae_params)
    final_lat = pipe(jnp.asarray(image), jnp.asarray(text),
                     image_emb=jnp.asarray(img_emb), num_frames=num_frames,
                     latents=jnp.asarray(lat0), output_type="latent")
    stages["denoise_trajectory"] = psnr(np.asarray(final_lat, np.float32),
                                        ref_lat)

    dec = vae_lib.vae_decode(vae_params, vae_cfg, jnp.asarray(ref_lat))
    stages["vae_decode"] = psnr(np.asarray(dec, np.float32), ref_pixels)

    out = pipe(jnp.asarray(image), jnp.asarray(text),
               image_emb=jnp.asarray(img_emb), num_frames=num_frames,
               latents=jnp.asarray(lat0))
    stages["full_pipeline_pixels"] = psnr(np.asarray(out, np.float32),
                                          ref_pixels)

    print(f"\n[parity] mid-size geometry: dim 5120 x {args.layers} layers, "
          f"{px}px, {args.steps} steps, shift {args.shift}, "
          f"guidance {args.guidance} ({time.time()-t0:.0f}s total)")
    for k, v in stages.items():
        print(f"  {k:24s} {v:7.1f} dB")
    ok = all(v >= 35.0 for v in stages.values())
    print(f"[parity] all stages >= 35 dB: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
