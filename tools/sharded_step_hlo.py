#!/usr/bin/env python
"""Compile the full-geometry sharded DiT forward on a virtual mesh and report
the collectives XLA actually inserted (measured bytes, not assumptions).

Grounds bench.py's multi-chip scaling: instead of asserting a communication
penalty, we compile the real 40-layer TP/FSDP(-CP) sharded denoise forward
over an N-device virtual CPU mesh, walk the optimized HLO, and sum the bytes
moved by all-reduce / all-gather / reduce-scatter / collective-permute /
all-to-all. Collectives inside the scan-over-blocks while body are counted
once per layer.

Prints one JSON object, e.g.:
  {"mesh": {...}, "layers": 40, "collective_bytes": 1.2e9,
   "per_op": {"all-gather": ...}, "flops": ...}

Backends:
  --backend tpu-aot (preferred): AOT-compile against a detached v5e topology
    (jax.experimental.topologies) — the *real* TPU SPMD program, with native
    bf16 collectives and XLA's TPU cost model. No TPU hardware needed.
  --backend cpu: compile on a virtual N-device CPU mesh. Upper-bound bias:
    the CPU backend promotes bf16 compute to f32, so collectives that stay
    bf16 on TPU are measured at 2x bytes.

Usage (standalone; bench.py shells out to this):
  python tools/sharded_step_hlo.py --mesh tensor=4,context=2 --frames 2
"""
from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
# --backend tpu-aot loads libtpu for topology-only AOT compilation; several
# measurement processes may do so concurrently (no chip is touched)
os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "1")

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

# a shaped buffer like bf16[2,3600,5120]{2,1,0} or f32[] (scalar)
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _shape_bytes(text: str) -> int:
    """Sum buffer bytes over every shape literal in ``text`` (handles
    tuple-typed results)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collect_collectives(hlo_text: str, loop_trips: int):
    """Walk optimized HLO; returns {op: {"count": n, "bytes": b}}.

    Collectives whose ``op_name`` metadata places them inside the
    scan-over-blocks while loop (``.../while/...``) are multiplied by
    ``loop_trips`` — the HLO shows the loop body once but it executes once
    per layer.

    TPU HLO emits *async* collectives (``all-gather-start``/``-done``):
    the ``-start`` op is counted (normalized to the sync name) and the
    ``-done`` ignored.  An async start's result is a tuple carrying the
    operand buffer(s) too, so only the final (output) shape is counted.
    """
    per_op: dict[str, dict[str, float]] = {}
    for line in hlo_text.splitlines():
        for op in _COLLECTIVES:
            # match the op as the instruction opcode, not inside metadata
            m = re.search(rf"=\s*(?:\([^=]*?\)|\S+)\s+{op}(-start|-done)?[(\.]",
                          line)
            if m:
                if m.group(1) == "-done":
                    break
                mult = loop_trips if "/while/" in line else 1
                rhs = line.split("=", 1)[1]
                result_part = rhs.split(op)[0]
                if m.group(1) == "-start":
                    # tuple (operands..., outputs...): count the second half
                    shapes = _SHAPE_RE.findall(result_part)
                    half = shapes[len(shapes) // 2:] if len(shapes) > 1 else shapes
                    b = sum(
                        _DTYPE_BYTES[dt] * math.prod(
                            int(d) for d in dims.split(",") if d)
                        for dt, dims in half)
                else:
                    b = _shape_bytes(result_part)
                d = per_op.setdefault(op, {"count": 0, "bytes": 0})
                d["count"] += mult
                d["bytes"] += b * mult
                break
    return per_op


def _vae_report(args, mesh):
    """Collective bytes of the H-sharded VAE decode (halo exchanges)."""
    import jax.numpy as jnp

    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import vae as vae_lib

    cfg = chronoedit_14b().vae
    params_abs = jax.eval_shape(
        lambda k: vae_lib.init_vae_params(k, cfg), jax.random.PRNGKey(0))
    # --frames means *latent* frames here; --height/--width are latent dims
    z = jax.ShapeDtypeStruct((args.batch, cfg.z_dim, args.frames,
                              args.height, args.width), jnp.bfloat16)

    def dec(p, z):
        return vae_lib.vae_decode(p, cfg, z, mesh=mesh)

    with mesh:
        compiled = jax.jit(dec).lower(params_abs, z).compile()
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    per_op = collect_collectives(hlo, 1)
    total = sum(d["bytes"] for d in per_op.values())
    print(json.dumps({
        "mesh": dict(mesh.shape), "model": "vae_decode",
        "latent_frames": args.frames,
        "collective_bytes": total, "per_op": per_op,
    }))


def _pipeline_report(args, mesh, dit_cfg):
    """Compile the FULL serving program — 8-step distilled denoise scan +
    condition prep + VAE decode, as one jitted function — for the target
    topology.  Stronger feasibility evidence than the forward-only compile:
    solver carries, condition latents and the decode all share HBM with the
    sharded weights."""
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chronoedit_tpu.configs import chronoedit_14b_distilled
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.parallel.sharding import dit_param_sharding
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    cfg = chronoedit_14b_distilled()
    cfg = dataclasses.replace(cfg, dit=dit_cfg)
    if args.cache:
        L = dit_cfg.num_layers
        cfg = dataclasses.replace(cfg, cache_blocks=(L // 5, L - L // 5),
                                  cache_period=2)

    spec_fn = dit_param_sharding(mesh)
    dit_shapes = jax.eval_shape(lambda k: dit_lib.init_dit_params(k, cfg.dit),
                                jax.random.PRNGKey(0))
    if args.quantize:
        from chronoedit_tpu.ops.quant import quantize_dit_params

        dit_shapes = jax.eval_shape(quantize_dit_params, dit_shapes)
    dit_abs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype, sharding=spec_fn(path, leaf)),
        dit_shapes)
    repl = NamedSharding(mesh, P())
    vae_abs = jax.tree_util.tree_map(
        lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=repl),
        jax.eval_shape(lambda k: vae_lib.init_vae_params(k, cfg.vae),
                       jax.random.PRNGKey(1)))

    b = args.batch
    num_frames = 5  # edit mode
    tl = cfg.vae.latent_frames(num_frames)
    hl, wl = args.height, args.width  # latent grid
    h_px, w_px = hl * cfg.vae.spatial_factor, wl * cfg.vae.spatial_factor
    image = jax.ShapeDtypeStruct((b, 3, h_px, w_px), jnp.float32, sharding=repl)
    prompt = jax.ShapeDtypeStruct((b, 512, cfg.dit.text_dim), jnp.float32,
                                  sharding=repl)
    img_emb = jax.ShapeDtypeStruct(
        (b, cfg.dit.image_tokens, cfg.dit.image_dim), jnp.float32,
        sharding=repl)
    latents = jax.ShapeDtypeStruct((b, cfg.latent_channels, tl, hl, wl),
                                   jnp.float32, sharding=repl)

    pipe = ChronoEditPipeline(cfg, dit_abs, vae_abs, mesh=mesh)
    run = pipe._make_run(num_frames=num_frames, num_steps=cfg.num_steps,
                         guidance=cfg.guidance_scale, shift=cfg.flow_shift,
                         reasoning=False, k_reason=0, slg_layers=(),
                         output_type="video")
    with mesh:
        compiled = jax.jit(run).lower(dit_abs, vae_abs, image, prompt, None,
                                      img_emb, latents).compile()
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    per_op = collect_collectives(hlo, args.layers)
    total = sum(d["bytes"] for d in per_op.values())
    print(json.dumps({
        "mesh": dict(mesh.shape), "backend": args.backend,
        "model": "pipeline", "layers": args.layers,
        "quantize": bool(args.quantize),
        "steps": cfg.num_steps, "latent": [tl, hl, wl],
        # NOTE: per_op bytes under-count the nested step x layer scans (a
        # collective inside both loops is multiplied by layers only) — the
        # pipeline compile's primary product is HBM *feasibility*; use
        # --model dit for per-forward collective accounting.
        "collective_bytes": total, "per_op": per_op,
    }))


def _train_report(args, mesh, dit_cfg):
    """Collective bytes of the full sharded TRAIN step (fwd + bwd + AdamW +
    EMA) — proves the training program compiles for the target topology
    (Pallas flash backward under CP, GSPMD resharding of optimizer mirrors)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.parallel.sharding import dit_param_sharding
    from chronoedit_tpu.train import (
        TrainConfig, make_train_state, make_train_step)

    tcfg = TrainConfig(warmup_steps=1)
    params_abs = jax.eval_shape(
        lambda k: dit_lib.init_dit_params(k, dit_cfg), jax.random.PRNGKey(0))
    state_abs = jax.eval_shape(lambda p: make_train_state(p, tcfg), params_abs)
    spec_fn = dit_param_sharding(mesh)
    state_abs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype, sharding=spec_fn(path, leaf)), state_abs)

    b, t, h, w = args.batch, args.frames, args.height, args.width
    z = dit_cfg.out_channels
    cond_ch = dit_cfg.in_channels - z
    cp = mesh.shape.get("context", 1)
    vid_spec = [None] * 5
    vid_spec[0] = "data" if mesh.shape.get("data", 1) > 1 else None
    if cp > 1 and t % cp == 0:
        vid_spec[2] = "context"

    def vid(ch):
        return jax.ShapeDtypeStruct(
            (b, ch, t, h, w), jnp.float32,
            sharding=NamedSharding(mesh, P(*vid_spec)))

    repl = NamedSharding(mesh, P(*vid_spec[:1], None, None))
    batch_abs = {
        "latents": vid(z),
        "condition": vid(cond_ch),
        "text_emb": jax.ShapeDtypeStruct((b, 8, dit_cfg.text_dim),
                                         jnp.float32, sharding=repl),
        "image_emb": jax.ShapeDtypeStruct(
            (b, dit_cfg.image_tokens, dit_cfg.image_dim), jnp.float32,
            sharding=repl),
    }
    key_abs = jax.eval_shape(jax.random.PRNGKey, 1)

    with mesh:
        step = make_train_step(dit_cfg, tcfg, donate=False, mesh=mesh)
        compiled = step.lower(state_abs, batch_abs, key_abs).compile()
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    per_op = collect_collectives(hlo, args.layers)
    total = sum(d["bytes"] for d in per_op.values())
    print(json.dumps({
        "mesh": dict(mesh.shape), "backend": args.backend, "model": "train",
        "layers": args.layers, "collective_bytes": total, "per_op": per_op,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--mesh", default="tensor=4,context=2",
                    help="comma-separated axis=size (data/fsdp/tensor/context)")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--height", type=int, default=90)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--layers", type=int, default=40)
    ap.add_argument("--model", default="dit",
                    choices=("dit", "vae", "train", "pipeline"))
    ap.add_argument("--cache", action="store_true",
                    help="engage the Δ-DiT block cache (middle 60% of "
                         "blocks, period 2) in the --model pipeline program")
    ap.add_argument("--quantize", action="store_true",
                    help="pipeline model: int8 w8a8 DiT projections")
    ap.add_argument("--remat", default=None,
                    choices=(None, "none", "full", "matmul_only"),
                    help="activation remat policy; --model train defaults "
                         "to 'full' (the production 14B training setting — "
                         "without remat the 40-layer saved activations "
                         "alone exceed v5e HBM at any fsdp width)")
    ap.add_argument("--preset", default="14b", choices=("14b", "small"),
                    help="small = 2x128 heads / 1024 ffn: fast compiles for "
                         "regression tests of the sharded TPU program")
    ap.add_argument("--backend", default="cpu", choices=("cpu", "tpu-aot"),
                    help="cpu = virtual CPU mesh (f32-promotion upper bound); "
                         "tpu-aot = detached v5e topology AOT compile (exact)")
    ap.add_argument("--topology", default="v5e:2x4",
                    help="detached TPU topology for --backend tpu-aot")
    ap.add_argument("--dump-hlo", default=None)
    args = ap.parse_args()

    jax.config.update("jax_num_cpu_devices", args.devices)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.parallel import MeshConfig, make_mesh
    from chronoedit_tpu.parallel.sharding import dit_param_sharding

    spec = dict(kv.split("=") for kv in args.mesh.split(","))
    mesh_cfg = MeshConfig(**{k: int(v) for k, v in spec.items()})
    if args.backend == "tpu-aot":
        from jax.experimental import topologies

        # kernel dispatch must target the TPU we compile FOR, not this
        # process's CPU devices — otherwise the measured HLO contains the
        # dense-attention fallback instead of the Pallas flash kernels
        os.environ["CHRONOEDIT_TARGET_PLATFORM"] = "tpu"
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name=args.topology)
        assert len(topo.devices) == args.devices, (
            f"topology {args.topology} has {len(topo.devices)} devices, "
            f"--devices={args.devices}")
        mesh = make_mesh(mesh_cfg, devices=np.array(topo.devices))
    else:
        mesh = make_mesh(mesh_cfg)

    if args.model == "vae":
        _vae_report(args, mesh)
        return

    remat = args.remat or ("full" if args.model == "train" else "none")
    cfg = dataclasses.replace(chronoedit_14b().dit, num_layers=args.layers,
                              param_dtype=jnp.bfloat16, remat=remat)
    if args.preset == "small":
        # full-width kernels (head_dim 128, lane-aligned dims) at a fraction
        # of the weights, so the Pallas-in-shard_map paths are exercised
        # without multi-minute 14B compiles
        from chronoedit_tpu.core.rope import Rope3DSpec

        cfg = dataclasses.replace(
            cfg, num_heads=2, head_dim=128, ffn_dim=1024, text_dim=256,
            image_dim=256, rope=Rope3DSpec(head_dim=128, temporal_skip_len=8))

    if args.model == "train":
        _train_report(args, mesh, cfg)
        return
    if args.model == "pipeline":
        _pipeline_report(args, mesh, cfg)
        return
    param_shapes = jax.eval_shape(
        lambda k: dit_lib.init_dit_params(k, cfg), jax.random.PRNGKey(0))
    spec_fn = dit_param_sharding(mesh)
    params_abs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype, sharding=spec_fn(path, leaf)),
        param_shapes)

    b, t, h, w = args.batch, args.frames, args.height, args.width
    repl = NamedSharding(mesh, P())
    # shard the first latent axis the context size divides (frames -> H -> W),
    # mirroring pipeline._shard's token-axis fallback for short edits
    x_spec = P()
    cp = mesh.shape["context"]
    if cp > 1:
        for axis, size in ((2, t), (3, h), (4, w)):
            if size % cp == 0:
                spec = [None] * 5
                spec[axis] = "context"
                x_spec = P(*spec)
                break
    x = jax.ShapeDtypeStruct((b, cfg.in_channels, t, h, w), jnp.bfloat16,
                             sharding=NamedSharding(mesh, x_spec))
    ts = jax.ShapeDtypeStruct((b,), jnp.float32, sharding=repl)
    text = jax.ShapeDtypeStruct((b, 512, cfg.text_dim), jnp.bfloat16, sharding=repl)
    img = jax.ShapeDtypeStruct((b, cfg.image_tokens, cfg.image_dim),
                               jnp.bfloat16, sharding=repl)

    def fwd(p, x, ts, text, img):
        return dit_lib.dit_forward(p, cfg, x, ts, text, img, mesh=mesh)

    with mesh:
        lowered = jax.jit(fwd).lower(params_abs, x, ts, text, img)
        compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)

    per_op = collect_collectives(hlo, args.layers)
    total = sum(d["bytes"] for d in per_op.values())
    try:
        cost = compiled.cost_analysis()
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = float("nan")

    try:
        opt_s = float(cost.get("optimal_seconds", float("nan")))
        if opt_s < 0:  # TPU cost model returns -inf/negatives for some ops
            opt_s = float("nan")
    except Exception:
        opt_s = float("nan")
    print(json.dumps({
        "mesh": dict(mesh.shape),
        "backend": args.backend,
        "layers": args.layers,
        "tokens": b * t * (h // 2) * (w // 2),
        "collective_bytes": total,
        "per_op": per_op,
        "flops": None if math.isnan(flops) else flops,
        "xla_optimal_seconds": None if math.isnan(opt_s) else opt_s,
    }))


if __name__ == "__main__":
    main()
