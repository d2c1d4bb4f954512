"""Diagnose the int4 40-layer single-chip OOM (VERDICT r3 #2).

Round 3's flagship claim — "the full 40-layer 14B DiT fits one chip in
int4" — was contradicted by the driver's run: bench_e2e_pipeline_s(40,
"int4") raised RESOURCE_EXHAUSTED on the real v5e. This tool reproduces
the failure in stages and prints where the HBM actually goes:

  stage 1: build the int4 param tree layer-by-layer; report live bytes
  stage 2: AOT-lower the full pipeline jit and print memory_analysis()
           (argument + output + temp + generated code sizes)
  stage 3: (if stage 2 fits) run it and report peak_bytes_in_use

Usage: python tools/diag_int4_oom.py [--layers 40] [--height 704]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def mem(tag: str) -> None:
    try:
        s = jax.local_devices()[0].memory_stats()
        print(f"[{tag}] bytes_in_use={s.get('bytes_in_use', 0)/1e9:.2f} GB "
              f"peak={s.get('peak_bytes_in_use', 0)/1e9:.2f} GB "
              f"limit={s.get('bytes_limit', 0)/1e9:.2f} GB", flush=True)
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=40)
    ap.add_argument("--height", type=int, default=704)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--mode", default="int4",
                    choices=("int4", "int4_a8", "int8"),
                    help="quantization scheme to diagnose")
    ap.add_argument("--reasoning", action="store_true",
                    help="diagnose the temporal-reasoning program (29-frame "
                         "trajectory, reasoning steps = all, dual decode)")
    ap.add_argument("--stage", default="full",
                    choices=("full", "denoise", "decode", "encode"),
                    help="isolate the denoise scan (output_type=latent), "
                         "the VAE decode, or the conditioning encode alone "
                         "to localise the OOM")
    ap.add_argument("--run", action="store_true", help="execute after AOT")
    ap.add_argument("--ffn-chunks", type=int, default=1,
                    help="token-chunked ffn (capacity diet, models/dit.py)")
    args = ap.parse_args()

    import dataclasses as dc

    from bench import _init_quantized_dit
    from chronoedit_tpu.configs import chronoedit_14b_distilled
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    cfg = chronoedit_14b_distilled()
    cfg = dc.replace(cfg, dit=dc.replace(cfg.dit, num_layers=args.layers,
                                         param_dtype=jnp.bfloat16,
                                         ffn_chunks=args.ffn_chunks))
    mem("start")
    dit_params = _init_quantized_dit(cfg.dit, mode=args.mode)
    w_bytes = sum(l.size * l.dtype.itemsize
                  for l in jax.tree_util.tree_leaves(dit_params))
    print(f"[weights] {args.mode} DiT param bytes: {w_bytes/1e9:.2f} GB",
          flush=True)
    mem("after-quant-init")

    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae)
    mem("after-vae-init")

    pipe = ChronoEditPipeline(cfg, dit_params, vae_params)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    image = jax.random.uniform(ks[0], (1, 3, args.height, args.width),
                               jnp.float32, minval=-1, maxval=1)
    prompt = jax.random.normal(ks[1], (1, 512, cfg.dit.text_dim), jnp.float32)
    clip = jax.random.normal(ks[2], (1, cfg.dit.image_tokens,
                                     cfg.dit.image_dim), jnp.float32)

    # AOT-lower the same program __call__ would jit, then inspect its memory
    # plan WITHOUT executing (compile alone reveals the temp budget).
    num_frames = cfg.resolve_num_frames(None, args.reasoning)
    tl = cfg.vae.latent_frames(num_frames)
    hl = args.height // cfg.vae.spatial_factor
    wl = args.width // cfg.vae.spatial_factor
    latents = jax.random.normal(jax.random.PRNGKey(3),
                                (1, cfg.latent_channels, tl, hl, wl),
                                jnp.float32)
    if args.stage == "encode":
        from chronoedit_tpu.pipeline.edit_pipeline import prepare_condition

        def run(dit_params, vae_params, image, prompt, neg, clip, latents):
            return prepare_condition(vae_params, cfg, image, num_frames)
    elif args.stage == "decode":
        # dual decode alone, as _make_run's reasoning tail performs it
        def run(dit_params, vae_params, image, prompt, neg, clip, final):
            idx = jnp.array([0, final.shape[2] - 1])
            video_edit = vae_lib.vae_decode(vae_params, cfg.vae,
                                            final[:, :, idx])
            video_reason = vae_lib.vae_decode(vae_params, cfg.vae,
                                              final[:, :, :-1])
            return jnp.concatenate([video_reason, video_edit[:, :, 1:]],
                                   axis=2)
    else:
        run = pipe._make_run(
            num_frames=num_frames, num_steps=cfg.num_steps,
            guidance=cfg.guidance_scale, shift=cfg.flow_shift,
            reasoning=args.reasoning,
            k_reason=cfg.num_steps if args.reasoning else 0,
            slg_layers=(),
            output_type="latent" if args.stage == "denoise" else "video")
    lowered = jax.jit(run).lower(dit_params, vae_params, image, prompt,
                                 None, clip, latents)
    print("[lowered] compiling...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        print(f"[memory_analysis] args={ma.argument_size_in_bytes/1e9:.2f} GB "
              f"out={ma.output_size_in_bytes/1e9:.2f} GB "
              f"temp={ma.temp_size_in_bytes/1e9:.2f} GB "
              f"alias={ma.alias_size_in_bytes/1e9:.2f} GB "
              f"code={ma.generated_code_size_in_bytes/1e6:.1f} MB", flush=True)
    mem("after-compile")
    if args.run:
        out = compiled(dit_params, vae_params, image, prompt, None, clip,
                       latents)
        out = jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        mem("after-run")
    print("OK", flush=True)


if __name__ == "__main__":
    main()
