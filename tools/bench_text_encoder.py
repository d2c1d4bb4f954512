"""Measure the conditioning encoders' latency on one TPU chip.

The serving numbers in docs/SERVING.md measure denoise + VAE; a live request
also runs UMT5-xxl (512-token prompt -> (1, 512, 4096) embedding,
umt5.py / reference t5.py) and CLIP ViT-H (image -> 257 tokens, clip.py)
once per request. This tool measures both so the end-to-end request budget
in the docs is fully accounted. Random weights — latency only.

Usage:  python tools/bench_text_encoder.py [--iters 5]
Prints one JSON line: {"umt5_encode_s": ..., "clip_encode_s": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/jax_cache", exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402


def _timeit(fn, *args, warmup=2, iters=5):
    # scalar readback as the fence (see bench.py: block_until_ready is not
    # reliable on the tunneled runtime); differenced against its overhead
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from chronoedit_tpu.models import clip as clip_lib
    from chronoedit_tpu.models import umt5 as umt5_lib

    readback = _timeit(jax.jit(lambda x: jnp.sum(x)),
                       jnp.ones((8, 8), jnp.float32), warmup=3, iters=10)

    # UMT5-xxl at serving shape: one 512-token prompt, bf16 params (~11.6 GB
    # — fits one v5e chip alone; on the serving mesh it is TP-sharded)
    tcfg = umt5_lib.umt5_xxl_config(param_dtype=jnp.bfloat16)
    # init under jit (stays on device) and pass params as an ARGUMENT —
    # closing over them bakes 11.4 GB of constants into the lowered program
    # and the lowering alone blows a 10-minute budget on the tunneled link
    tparams = jax.jit(
        lambda k: umt5_lib.init_umt5_params(k, tcfg))(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, tcfg.text_len),
                             0, tcfg.vocab_size)
    mask = jnp.ones((1, tcfg.text_len), jnp.int32)
    enc = jax.jit(lambda p, i, m: jnp.sum(
        umt5_lib.umt5_encode(p, tcfg, i, m).astype(jnp.float32)))
    umt5_s = max(_timeit(enc, tparams, ids, mask, iters=args.iters) - readback,
                 0.0)
    del tparams, enc
    jax.clear_caches()

    ccfg = clip_lib.CLIPVisionConfig()
    cparams = jax.jit(
        lambda k: clip_lib.init_clip_vision_params(k, ccfg))(jax.random.PRNGKey(2))
    img = jax.random.normal(jax.random.PRNGKey(3),
                            (1, 3, ccfg.image_size, ccfg.image_size),
                            jnp.float32)
    cenc = jax.jit(lambda p, x: jnp.sum(
        clip_lib.clip_vision_forward(p, ccfg, x).astype(jnp.float32)))
    clip_s = max(_timeit(cenc, cparams, img, iters=args.iters) - readback, 0.0)

    print(json.dumps({
        "device": str(jax.devices()[0]),
        "umt5_encode_s": round(umt5_s, 4),
        "umt5_tokens": tcfg.text_len,
        "clip_encode_s": round(clip_s, 4),
        "readback_s": round(readback, 5),
        "iters": args.iters,
    }), flush=True)


if __name__ == "__main__":
    main()
