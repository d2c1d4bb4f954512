#!/usr/bin/env python
"""Training-step throughput on real TPU: full-width reduced-depth model.

Measures the jitted rectified-flow train step (fwd+bwd+AdamW+EMA) and a
LoRA step at 720p edit shapes; reports per-step time and the 40-layer
extrapolation. Run on TPU:  python tools/bench_train.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from chronoedit_tpu.configs import chronoedit_14b
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import lora as lora_lib
from chronoedit_tpu.train import TrainConfig, make_train_state, make_train_step
from chronoedit_tpu.train.lora_train import make_lora_train_state, make_lora_train_step


def batch_720p(dit_cfg):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "latents": jax.random.normal(ks[0], (1, 16, 2, 88, 160), jnp.float32),
        "condition": jax.random.normal(ks[1], (1, 20, 2, 88, 160), jnp.float32),
        "text_emb": jax.random.normal(ks[2], (1, 512, dit_cfg.text_dim),
                                      jnp.float32),
        "image_emb": jax.random.normal(
            ks[3], (1, dit_cfg.image_tokens, dit_cfg.image_dim), jnp.float32),
    }


def time_steps(step_fn, state, *args, iters=3):
    key = jax.random.PRNGKey(1)
    state, m = step_fn(state, *args, key)  # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, *args, sub)
        float(m["loss"])
    return (time.perf_counter() - t0) / iters


def main(layers=2):
    base = chronoedit_14b().dit
    cfg = dataclasses.replace(base, num_layers=layers,
                              param_dtype=jnp.bfloat16, remat="full")
    tcfg = TrainConfig(warmup_steps=1)
    batch = batch_720p(cfg)

    # full fine-tune step
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
    state = make_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg, donate=True)
    t_full = time_steps(step, state, batch)
    del state, params

    # LoRA step
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_lib.LoRAConfig(rank=32)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), params, lcfg)
    lstate = make_lora_train_state(lora, tcfg)
    lstep = make_lora_train_step(cfg, tcfg, lcfg, donate=True)
    t_lora = time_steps(lstep, lstate, params, batch)

    print(json.dumps({
        "layers": layers,
        "full_step_s_1chip": round(t_full, 3),
        "lora_step_s_1chip": round(t_lora, 3),
        "full_step_s_40layer_est": round(t_full * 40 / layers, 3),
        "lora_step_s_40layer_est": round(t_lora * 40 / layers, 3),
        "note": "720p edit batch=1, bf16 params, full remat",
    }))


if __name__ == "__main__":
    main()
