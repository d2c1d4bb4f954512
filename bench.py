"""Benchmark: ChronoEdit-14B edit-mode hot path on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric: estimated end-to-end seconds per 720p edit with the 8-step distilled
LoRA on a v5e-8, derived from single-chip measurements (the harness exposes
one chip):

- DiT per-block latency at full 14B geometry (dim 5120, 40 heads x 128,
  ffn 13824, CFG-batched 720p edit sequence = 2 x 7200 tokens), measured by
  timing stacks of L1 and L2 blocks and differencing to cancel embed/head
  overhead;
- Wan VAE encode (5x720p frames) + decode (2 latent frames) latency;
- extrapolation: 8 denoise steps x (40 blocks + overhead), ideal-scaled
  across 8 chips with a 15% communication penalty (conservative for
  tensor-parallel psums on ICI), plus VAE cost.

vs_baseline = (5 s target) / estimate — >1 means faster than the BASELINE.md
target. The reference publishes no GPU latency numbers (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import time

import os

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat bench runs skip the multi-minute
# 14B-geometry compiles
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N_CHIPS_TARGET = 8
TARGET_SEC = 5.0
DENOISE_STEPS = 8  # distilled LoRA


def _timeit(fn, *args, warmup=2, iters=5):
    """Time a jitted function that returns a SCALAR, via host readback.

    On this image's tunneled TPU runtime, ``block_until_ready`` alone is not
    a reliable fence for some dispatch patterns — forcing a scalar
    device->host read is. The readback latency is a constant; use
    :func:`_readback_overhead` to subtract it, or difference two configs so
    it cancels.
    """
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(fn(*args))
    assert s == s, "non-finite benchmark output"
    return (time.perf_counter() - t0) / iters


def _readback_overhead() -> float:
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 8), jnp.float32)
    return _timeit(f, x, warmup=3, iters=10)


def bench_dit_block_ms(batch: int) -> dict:
    """Per-block DiT latency at 720p edit shapes.

    batch=1 is the 8-step distilled path (guidance 1.0 -> single forward);
    batch=2 is the CFG-batched base-model path.
    NOTE: random data, not zeros — the runtime fast-paths all-zero buffers
    and timings collapse to dispatch overhead.
    """
    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib

    base = chronoedit_14b().dit
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(ks[0], (batch, base.in_channels, 2, 90, 160), jnp.bfloat16)
    ts = jnp.full((batch,), 500.0, jnp.float32)
    text = jax.random.normal(ks[1], (batch, 512, base.text_dim), jnp.bfloat16)
    img = jax.random.normal(ks[2], (batch, base.image_tokens, base.image_dim),
                            jnp.bfloat16)

    readback = _readback_overhead()
    times = {}
    for layers in (1, 3):
        cfg = dataclasses.replace(base, num_layers=layers)
        params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)

        def fwd(p, *a, _cfg=cfg):
            return jnp.sum(dit_lib.dit_forward(p, _cfg, *a).astype(jnp.float32))

        times[layers] = _timeit(jax.jit(fwd), params, x, ts, text, img)
        del params
    per_block = (times[3] - times[1]) / 2  # readback constant cancels
    overhead = max(times[1] - per_block - readback, 0.0)
    return {"per_block_s": per_block, "overhead_s": overhead,
            "readback_s": readback}


def bench_vae_s() -> dict:
    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import vae as vae_lib

    cfg = chronoedit_14b().vae
    params = vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    video = jax.random.normal(k1, (1, 3, 5, 704, 1280), jnp.bfloat16)
    latents = jax.random.normal(k2, (1, 16, 2, 88, 160), jnp.bfloat16)
    readback = _readback_overhead()
    enc = jax.jit(lambda v: jnp.sum(vae_lib.vae_encode(params, cfg, v).astype(jnp.float32)))
    dec = jax.jit(lambda z: jnp.sum(vae_lib.vae_decode(params, cfg, z).astype(jnp.float32)))
    t_enc = max(_timeit(enc, video, warmup=1, iters=2) - readback, 0.0)
    t_dec = max(_timeit(dec, latents, warmup=1, iters=2) - readback, 0.0)
    return {"encode_s": t_enc, "decode_s": t_dec}


def bench_e2e_pipeline_s(layers: int = 8) -> dict:
    """Measured end-to-end 8-step distilled edit at 720p on ONE chip with a
    reduced-depth (but full-width) model that fits one chip (16 layers OOMs at 18 GB with pipeline activations) — captures the
    scan/solver/pipeline overheads the per-block method misses. The 40-layer
    estimate scales only the block-loop portion."""
    import dataclasses as dc

    from chronoedit_tpu.configs import chronoedit_14b_distilled
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    cfg = chronoedit_14b_distilled()
    cfg = dc.replace(cfg, dit=dc.replace(cfg.dit, num_layers=layers,
                                         param_dtype=jnp.bfloat16))
    dit_params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae)
    pipe = ChronoEditPipeline(cfg, dit_params, vae_params)

    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    image = jax.random.uniform(ks[0], (1, 3, 704, 1280), jnp.float32,
                               minval=-1, maxval=1)
    prompt = jax.random.normal(ks[1], (1, 512, cfg.dit.text_dim), jnp.float32)
    clip = jax.random.normal(ks[2], (1, cfg.dit.image_tokens, cfg.dit.image_dim),
                             jnp.float32)

    def run():
        video = pipe(image, prompt, image_emb=clip, key=jax.random.PRNGKey(3))
        return float(jnp.sum(video.astype(jnp.float32)))

    run()  # compile + warm
    t0 = time.perf_counter()
    run()
    measured = time.perf_counter() - t0
    del dit_params, vae_params, pipe
    return {"layers": layers, "measured_s": measured}


def main():
    dev = jax.devices()[0]
    dit1 = bench_dit_block_ms(batch=1)  # distilled: guidance 1.0, no CFG
    dit2 = bench_dit_block_ms(batch=2)  # base model: CFG-batched
    vae = bench_vae_s()
    e2e = bench_e2e_pipeline_s()

    comm_penalty = 1.15
    # VAE is spatially sharded over the mesh (H-axis GSPMD halo exchange;
    # bit-exact vs unsharded, tests/test_vae_sharded.py) — scale with a
    # conservative 1.4x halo/comm penalty
    vae_penalty = 1.4
    vae_8chip = (vae["encode_s"] + vae["decode_s"]) / N_CHIPS_TARGET * vae_penalty

    def estimate(dit, steps):
        step_1chip = 40 * dit["per_block_s"] + dit["overhead_s"]
        return steps * step_1chip / N_CHIPS_TARGET * comm_penalty + vae_8chip

    total = estimate(dit1, DENOISE_STEPS)
    total_cfg50 = estimate(dit2, 50)
    # measured e2e (1-chip, reduced depth) scaled to 40 layers: non-DiT time
    # is measured directly, block-loop scales by depth
    block_part = DENOISE_STEPS * e2e["layers"] * dit1["per_block_s"]
    e2e_40_1chip = (e2e["measured_s"] - block_part
                    + DENOISE_STEPS * 40 * dit1["per_block_s"])

    print(json.dumps({
        "metric": "estimated sec/edit, 720p, 8-step distilled (guidance 1.0), v5e-8 (extrapolated from 1-chip)",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(TARGET_SEC / total, 3),
        "detail": {
            "device": str(dev),
            "dit_block_s_1chip_b1": round(dit1["per_block_s"], 5),
            "dit_block_s_1chip_b2_cfg": round(dit2["per_block_s"], 5),
            "est_sec_per_edit_50step_cfg": round(total_cfg50, 3),
            f"e2e_measured_s_1chip_{e2e['layers']}layer": round(e2e["measured_s"], 3),
            "e2e_est_s_1chip_40layer": round(e2e_40_1chip, 3),
            "vae_encode_s": round(vae["encode_s"], 4),
            "vae_decode_s": round(vae["decode_s"], 4),
            "assumptions": (f"{N_CHIPS_TARGET}-chip scaling: DiT x{comm_penalty} "
                            f"comm penalty, VAE spatially sharded x{vae_penalty} "
                            "halo penalty"),
        },
    }))


if __name__ == "__main__":
    main()
