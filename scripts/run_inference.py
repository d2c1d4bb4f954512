#!/usr/bin/env python
"""ChronoEdit-TPU inference CLI (reference: scripts/run_inference_diffusers.py).

Examples:
  # single edit with real weights
  python scripts/run_inference.py --input image.png --prompt "..." \
      --checkpoint-dir ./checkpoints/ChronoEdit-14B --output edit.png

  # smoke-run the full pipeline on random weights (no checkpoints needed)
  python scripts/run_inference.py --experiment tiny --smoke --output out.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", type=str, help="input image path")
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative-prompt", type=str, default="")
    p.add_argument("--output", type=str, default="output.png")
    p.add_argument("--experiment", type=str, default="chronoedit_14b_distilled")
    p.add_argument("--checkpoint-dir", type=str, default=None,
                   help="dir with diffusers DiT shards + Wan2.1_VAE.pth + "
                        "models_t5_umt5-xxl-enc-bf16.pth + CLIP pth")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--flow-shift", type=float, default=None)
    p.add_argument("--lora", type=str, action="append", default=[],
                   help="LoRA safetensors path[:scale], repeatable")
    p.add_argument("--enable-temporal-reasoning", action="store_true")
    p.add_argument("--num-temporal-reasoning-steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--mesh", type=str, default=None,
                   help="parallelism spec, e.g. 'tensor=8' or 'fsdp=4,context=2'")
    p.add_argument("--quantize", nargs="?", const="int8", default=None,
                   choices=("int8", "int4", "int4_a8"),
                   help="quantize DiT projections: 'int8' (w8a8 serving "
                        "accel; also the bare-flag default), 'int4' "
                        "(w4a16 — the full 14B model fits ONE v5e chip), or "
                        "'int4_a8' (int4 storage + int8 compute: single-chip "
                        "capacity at ~w8a8 speed; docs/SERVING.md)")
    p.add_argument("--cache-thresh", type=float, default=None,
                   help="adaptive block-cache refresh: refresh blocks [A,B) "
                        "when the latents' accumulated relative change since "
                        "the last refresh crosses this value (overrides the "
                        "fixed period; requires --cache-blocks)")
    p.add_argument("--cache-blocks", type=str, default=None,
                   help="A:B[:period] — Δ-DiT block cache over blocks [A,B) "
                        "refreshed every `period` solver steps")
    p.add_argument("--smoke", action="store_true",
                   help="random weights, tiny input — end-to-end smoke test")
    return p.parse_args()


def build_pipeline(args):
    import jax

    from chronoedit_tpu.configs import get_experiment
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    cfg = get_experiment(args.experiment)
    mesh = None
    if args.mesh:
        from chronoedit_tpu.parallel import MeshConfig, make_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        mesh = make_mesh(MeshConfig(**{k: int(v) for k, v in spec.items()}))

    if args.checkpoint_dir:
        pipe = load_pretrained_pipeline(cfg, args.checkpoint_dir, mesh)
    else:
        if not args.smoke:
            raise SystemExit("--checkpoint-dir required unless --smoke")
        dit_params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit)
        vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae)
        pipe = ChronoEditPipeline(cfg, dit_params, vae_params, mesh=mesh)

    for spec in args.lora:
        path, _, scale = spec.partition(":")
        attach_lora(pipe, path, float(scale or 1.0))

    if args.cache_blocks:
        import dataclasses

        parts = [int(x) for x in args.cache_blocks.split(":")]
        a, b = parts[0], parts[1]
        period = parts[2] if len(parts) > 2 else 2
        pipe.config = dataclasses.replace(pipe.config, cache_blocks=(a, b),
                                          cache_period=period,
                                          cache_thresh=getattr(
                                              args, "cache_thresh", None))

    if args.quantize:
        pipe.quantize(mode=args.quantize)  # re-shards when a mesh is attached

    if mesh is not None:
        from chronoedit_tpu.parallel import shard_params
        from chronoedit_tpu.parallel.sharding import dit_param_sharding, replicate

        pipe.dit_params = shard_params(pipe.dit_params, mesh,
                                       dit_param_sharding(mesh))
        pipe.vae_params = replicate(pipe.vae_params, mesh)
    return pipe


def load_pretrained_pipeline(cfg, ckpt_dir, mesh=None):
    from chronoedit_tpu.pipeline import load_pipeline

    return load_pipeline(cfg, ckpt_dir, mesh=mesh)


def attach_lora(pipe, path: str, scale: float):
    from chronoedit_tpu.models import lora as lora_lib
    from chronoedit_tpu.models import weights as w

    sd = w.load_safetensors(path) if path.endswith(".safetensors") else w.load_torch(path)
    try:
        lora, scaling = w.convert_diffusers_lora(sd, pipe.config.dit.num_layers)
    except ValueError:
        lora, scaling = w.convert_musubi_lora(sd, pipe.config.dit.num_layers)
    pipe.dit_params = lora_lib.merge_lora(pipe.dit_params, lora, scale * scaling)
    print(f"fused LoRA {path} (scale {scale * scaling:.2f})")


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    pipe = build_pipeline(args)
    cfg = pipe.config

    if args.input:
        from PIL import Image

        from chronoedit_tpu.data.edit_dataset import ImageCropAndResize, ToArray

        img = Image.open(args.input).convert("RGB")
        crop = ImageCropAndResize(args.height, args.width, max_pixels=1280 * 720)
        image = jnp.asarray(ToArray()(crop(img)))[None]
    else:
        if not args.smoke:
            raise SystemExit("--input required unless --smoke")
        image = jax.random.uniform(jax.random.PRNGKey(7), (1, 3, 32, 32),
                                   minval=-1, maxval=1)

    if pipe.text_encoder is not None and args.prompt:
        prompt_emb = pipe.encode_prompt(args.prompt)
        neg_emb = pipe.encode_prompt(args.negative_prompt)
    else:
        d = cfg.dit.text_dim
        prompt_emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, d))
        neg_emb = jax.random.normal(jax.random.PRNGKey(2), (1, 8, d))
    image_emb = (pipe.encode_image(image) if pipe.image_encoder is not None
                 else (jax.random.normal(jax.random.PRNGKey(3),
                                         (1, cfg.dit.image_tokens, cfg.dit.image_dim))
                       if cfg.dit.image_dim else None))

    video = pipe(
        image, prompt_emb, neg_prompt_emb=neg_emb, image_emb=image_emb,
        num_steps=args.num_steps, guidance_scale=args.guidance_scale,
        flow_shift=args.flow_shift, prompt=args.prompt,
        enable_temporal_reasoning=args.enable_temporal_reasoning,
        num_temporal_reasoning_steps=args.num_temporal_reasoning_steps,
        key=jax.random.PRNGKey(args.seed),
    )
    # edit result = last frame; reasoning mode additionally exports the
    # trajectory video (run_inference_diffusers.py:453-467)
    arr = np.asarray(video[0, :, -1]).transpose(1, 2, 0)
    arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
    from PIL import Image

    Image.fromarray(arr).save(args.output)
    print(f"saved edit -> {args.output} ({arr.shape[1]}x{arr.shape[0]})")
    if args.enable_temporal_reasoning:
        from chronoedit_tpu.utils.visualize import save_video

        vid_path = save_video(os.path.splitext(args.output)[0] + ".mp4",
                              np.asarray(video[0]), fps=8)
        print(f"saved reasoning video -> {vid_path} ({video.shape[2]} frames)")


if __name__ == "__main__":
    main()
