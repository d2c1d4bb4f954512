#!/usr/bin/env python
"""Single-chip bound on the v5e-8 wire model (VERDICT r4 #6).

The serving estimates bill each denoise step as

    step_compute / 8  +  wire_seconds(HLO collective bytes)     (bench.py)

with NO compute/wire overlap. The compute half is calibrated against a real
full-depth run (``extrapolation_error`` in BENCH_DETAIL.json); this tool
bounds the model's OTHER structural assumption on the hardware we have:
that collective time is ADDITIVE with compute — XLA neither hides the
serialized collectives behind MXU work (which would make the no-overlap
estimate a safe upper bound) nor pays extra scheduling latency around them.

ICI itself cannot be measured on one chip. The stand-in: each DiT block is
followed by an HBM-resident stream op whose standalone duration equals the
wire model's per-block collective share (at the measured HBM bandwidth),
threaded through the layer chain exactly the way a TP all-reduce sits on
the real critical path (block output feeds the stream op feeds the next
block — reference comm pattern: megatron-style column/row parallel linear,
which the GSPMD partitioner reproduces; SURVEY §2.10). Then:

    wire_model_error = t(chain + stand-ins) / (t(chain) + t(stand-ins))

~1.0 validates additivity. <1 means XLA overlaps serialized memory traffic
with compute and the serving estimates are conservative. The one constant
this cannot validate is the 90 GB/s/chip ICI ring bandwidth — a v5e
hardware spec, cited as such in BASELINE.md/README.

Writes tools-local JSON and (with --commit) wire_bound.json at the repo
root, which bench._assemble folds into the detail line.

Run on the real chip:  python tools/wire_bound.py [--layers 8] [--commit]
"""

import argparse
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


def _timeit(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def measure_hbm_gbs(nbytes: int = 1 << 30) -> float:
    """Achieved HBM stream bandwidth: one read + one write of ``nbytes``."""
    x = jnp.zeros(nbytes // 4, jnp.float32) + 1.5

    @jax.jit
    def stream(v):
        return v * jnp.float32(1.000001)

    t = _timeit(stream, x, warmup=2, iters=6)
    return 2 * nbytes / t / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8,
                    help="chain depth (additivity is per-link; 8 is plenty)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--commit", action="store_true",
                    help="write wire_bound.json at the repo root")
    args = ap.parse_args()

    from bench import ICI_BW_PER_CHIP, wire_seconds
    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib

    # ---- wire model inputs: the serving walk's chosen edit mesh bytes
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = json.load(open(os.path.join(here, "bench_cache.json")))["entries"]
    mesh_key = "--mesh tensor=4,context=2 --frames 2"
    report = cache.get(mesh_key, {}).get("report")
    if report is None:
        sys.exit(f"no AOT report cached for {mesh_key!r}; run bench first")
    wire_fwd_s = wire_seconds(report)      # one 40-layer forward, per chip
    layers_total = report.get("layers", 40)
    wire_block_s = wire_fwd_s / layers_total

    # ---- single-layer block inputs at the 720p edit shape (7.2k tokens)
    cfg = dataclasses.replace(chronoedit_14b().dit, num_layers=1,
                              param_dtype=jnp.bfloat16)
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x5d = jax.random.normal(ks[0], (1, cfg.in_channels, 2, 90, 160),
                            jnp.bfloat16)
    ts = jnp.full((1, 2), 500.0, jnp.float32)
    text = jax.random.normal(ks[1], (1, 512, cfg.text_dim), jnp.bfloat16)
    img = jax.random.normal(ks[2], (1, cfg.image_tokens, cfg.image_dim),
                            jnp.bfloat16)

    # one-time eager setup (grid/hw must stay Python ints for dit_block)
    tokens, grid = dit_lib._patchify(x5d.astype(cfg.dtype), cfg)
    gt, gh, gw = grid
    hw = gh * gw
    tokens = dit_lib.L.linear(params["patch_embed"], tokens)
    if cfg.temporal_skip:
        cos, sin = dit_lib.temporal_skip_rope_tables(cfg.rope, gt, gh, gw)
    else:
        cos, sin = dit_lib.rope_3d_tables(cfg.rope, gt, gh, gw)
    _, t_proj, text_ctx, img_ctx = dit_lib._condition_embeddings(
        params, cfg, ts, text, img)
    bp = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])

    L = args.layers

    # ---- t(chain): L dependent blocks, full width (the real per-chip block
    # is 1/8-width; additivity is a scheduling property, not a shape one —
    # the stand-in below is scaled to keep the real wire:compute RATIO)
    @jax.jit
    def chain(bp, tok):
        def body(t, _):
            t = dit_lib.dit_block(bp, t, text_ctx, img_ctx, t_proj,
                                  cos, sin, hw, cfg)
            return t, ()
        t, _ = jax.lax.scan(body, tok, None, length=L)
        return jnp.sum(t.astype(jnp.float32))

    t_chain = _timeit(chain, bp, tokens, iters=args.iters)
    t_block = t_chain / L

    # real deployment ratio: per-block wire share vs per-chip block compute
    ratio = wire_block_s / (t_block / 8)
    standin_target_s = ratio * t_block  # keep the on-chip ratio identical

    hbm_gbs = measure_hbm_gbs()
    standin_bytes = int(standin_target_s * hbm_gbs * 1e9 / 2)
    buf = jnp.zeros(max(standin_bytes // 4, 1 << 20), jnp.float32) + 1.5

    @jax.jit
    def standins(b):
        def body(v, _):
            return v * jnp.float32(1.000001), ()
        v, _ = jax.lax.scan(body, b, None, length=L)
        return jnp.sum(v[:8])

    t_standins = _timeit(standins, buf, iters=args.iters)

    # ---- combined: block -> stream -> block, every link data-dependent
    @jax.jit
    def combined(bp, tok, b):
        def body(carry, _):
            t, v = carry
            t = dit_lib.dit_block(bp, t, text_ctx, img_ctx, t_proj,
                                  cos, sin, hw, cfg)
            # stream op must consume the block output (critical path, like a
            # TP all-reduce) and the next block must consume the stream's
            v = v * jnp.float32(1.000001) + t[0, 0, 0].astype(jnp.float32) * 0
            t = t + v[0].astype(t.dtype) * 0
            return (t, v), ()
        (t, v), _ = jax.lax.scan(body, (tok, b), None, length=L)
        return jnp.sum(t.astype(jnp.float32)) + jnp.sum(v[:8])

    t_combined = _timeit(combined, bp, tokens, buf, iters=args.iters)

    err = t_combined / (t_chain + t_standins)
    out = {
        "wire_model_error": round(err, 4),
        "t_chain_s": round(t_chain, 5),
        "t_standins_s": round(t_standins, 5),
        "t_combined_s": round(t_combined, 5),
        "layers": L,
        "block_s": round(t_block, 5),
        "standin_target_s": round(standin_target_s, 5),
        "wire_block_s": round(wire_block_s, 6),
        "wire_fwd_s": round(wire_fwd_s, 5),
        "hbm_stream_gbs": round(hbm_gbs, 1),
        "ici_bw_assumed_gbs": ICI_BW_PER_CHIP / 1e9,
        "mesh": mesh_key,
        "note": "additivity of serialized memory-bound links with MXU-bound "
                "blocks on one chip; stand-in sized to the deployment "
                "wire:compute ratio. <1 = XLA overlaps some traffic and the "
                "no-overlap serving estimates are conservative. Does not "
                "validate the ICI bandwidth constant (hardware spec).",
    }
    print(json.dumps(out, indent=1))
    if args.commit:
        with open(os.path.join(here, "wire_bound.json"), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
