"""Benchmark: ChronoEdit-14B edit-mode hot path on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric: estimated end-to-end seconds per 720p edit with the 8-step distilled
LoRA on a v5e-8, derived from single-chip measurements (the harness exposes
one chip) plus *measured* collective volume:

- DiT per-block latency at full 14B geometry (dim 5120, 40 heads x 128,
  ffn 13824) for the 720p edit sequence (7200 tokens) and the 29-frame
  reasoning sequence (28800 tokens), measured by timing stacks of L1 and L3
  blocks and differencing to cancel embed/head overhead;
- Wan VAE encode (5x720p frames) + decode (2 latent frames) latency;
- multi-chip scaling: the real 40-layer sharded forward is AOT-compiled for
  a detached v5e-8 topology (tools/sharded_step_hlo.py --backend tpu-aot —
  the exact TPU SPMD program; virtual-CPU fallback) and the collectives XLA
  actually inserted are summed from the optimized HLO; the communication
  penalty is derived as wire-bytes / ICI bandwidth instead of being
  asserted. Same for the H-sharded VAE's halo exchanges;
- deployment-mesh choice is gated on the FULL serving program (denoise scan
  + VAE decode in one jit) compiling within v5e HBM, per weight precision —
  the bare forward can fit where serving does not.

vs_baseline = (5 s target) / estimate — >1 means faster than the BASELINE.md
target. The reference publishes no GPU latency numbers (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

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

# v5e ICI: 2D torus, ~45 GB/s per link per direction, 2 usable links per
# ring direction -> ~90 GB/s effective per-chip wire bandwidth (assumption;
# applied to MEASURED collective bytes from the compiled sharded HLO).
ICI_BW_PER_CHIP = 90e9

# per-chip wire bytes per buffer byte for ring algorithms over N=8 chips
_WIRE_FACTOR = {
    "all-reduce": 2 * 7 / 8,
    "all-gather": 7 / 8,
    "reduce-scatter": 7 / 8,
    "all-to-all": 7 / 8,
    "collective-permute": 1.0,
}


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


def bench_dit_block_ms(batch: int, frames: int = 2, iters: int = 5,
                       quantize: bool = False, plain_norms: bool = False) -> dict:
    """Per-block DiT latency at 720p shapes.

    batch=1 is the 8-step distilled path (guidance 1.0 -> single forward);
    batch=2 is the CFG-batched base-model path. frames=2 is edit mode,
    frames=8 the temporal-reasoning sequence (28.8k tokens).
    quantize=True measures the int8 w8a8 serving path (ops/quant.py).
    plain_norms=True traces the unfused XLA norm chain — what the *sharded*
    program runs (Pallas norms live outside shard_maps, so multi-device
    programs use the plain path); the fused/plain delta feeds the multi-chip
    estimate's norm correction.
    NOTE: random data, not zeros — the runtime fast-paths all-zero buffers
    and timings collapse to dispatch overhead.
    """
    import contextlib

    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.ops import fused_norms

    base = chronoedit_14b().dit
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(ks[0], (batch, base.in_channels, frames, 90, 160),
                          jnp.bfloat16)
    ts = jnp.full((batch,), 500.0, jnp.float32)
    text = jax.random.normal(ks[1], (batch, 512, base.text_dim), jnp.bfloat16)
    img = jax.random.normal(ks[2], (batch, base.image_tokens, base.image_dim),
                            jnp.bfloat16)

    readback = _readback_overhead()
    times = {}
    for layers in (1, 3):
        cfg = dataclasses.replace(base, num_layers=layers)
        params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
        if quantize:
            from chronoedit_tpu.ops.quant import quantize_dit_params

            params = jax.jit(quantize_dit_params)(params)

        def fwd(p, *a, _cfg=cfg):
            return jnp.sum(dit_lib.dit_forward(p, _cfg, *a).astype(jnp.float32))

        with (fused_norms.plain_norms() if plain_norms
              else contextlib.nullcontext()):
            times[layers] = _timeit(jax.jit(fwd), params, x, ts, text, img,
                                    warmup=2, iters=iters)
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
    reduced-depth (but full-width) model that fits one chip (16 layers OOMs
    at 18 GB with pipeline activations) — captures the scan/solver/pipeline
    overheads the per-block method misses. The 40-layer estimate scales only
    the block-loop portion."""
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


def measured_collectives(extra_args: list[str], aot_only: bool = False,
                         timeout: int = 1200) -> dict | None:
    """Compile the sharded program in a subprocess and return the measured
    collective bytes from the optimized HLO.  Prefers the detached-topology
    TPU AOT compile (exact: native bf16 collectives); falls back to the
    virtual-CPU mesh (f32-promotion upper bound) if AOT is unavailable —
    unless ``aot_only`` (feasibility checks: the CPU backend has no HBM
    limit, so its success proves nothing)."""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               ALLOW_MULTIPLE_LIBTPU_LOAD="1",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    tool = os.path.join(here, "tools", "sharded_step_hlo.py")
    backends = ("tpu-aot",) if aot_only else ("tpu-aot", "cpu")
    for backend in backends:
        try:
            out = subprocess.run(
                [sys.executable, tool, "--backend", backend, *extra_args],
                env=env, capture_output=True, text=True, timeout=timeout,
                check=True)
            return json.loads(out.stdout.strip().splitlines()[-1])
        except subprocess.CalledProcessError as e:
            if backend == "tpu-aot" and "RESOURCE_EXHAUSTED" in (e.stderr or ""):
                # the real v5e compiler proved this layout doesn't fit HBM —
                # an infeasible deployment mesh, not a measurement failure;
                # do NOT fall back to the CPU mesh (which has no HBM limit
                # and would report bytes for a program that cannot run)
                print(f"[bench] mesh infeasible on v5e (HBM OOM): {extra_args}",
                      file=sys.stderr)
                return None
            print(f"[bench] {backend} collective measurement failed: {e}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - bench must still print a line
            print(f"[bench] {backend} collective measurement failed: {e}",
                  file=sys.stderr)
    return None


def wire_seconds(report: dict | None) -> float | None:
    """Per-chip wire time for one forward, from measured collective bytes.

    HLO instruction shapes in the SPMD-partitioned module are *per-device*
    buffers, so factor x bytes is already the per-chip wire traffic — do NOT
    divide by the chip count again (round-2 review caught an 8x undercount
    here). Factors assume 8-wide rings; for smaller groups (e.g. tensor=4)
    they are a mild upper bound."""
    if report is None:
        return None
    total = 0.0
    for op, d in report["per_op"].items():
        total += _WIRE_FACTOR.get(op, 1.0) * d["bytes"]
    return total / ICI_BW_PER_CHIP


def main():
    dev = jax.devices()[0]
    dit1 = bench_dit_block_ms(batch=1)  # distilled: guidance 1.0, no CFG
    dit1_q = bench_dit_block_ms(batch=1, quantize=True)  # int8 serving path
    dit2 = bench_dit_block_ms(batch=2)  # base model: CFG-batched
    dit_r = bench_dit_block_ms(batch=2, frames=8, iters=2)  # reasoning 28.8k
    # sharded programs run the plain (GSPMD-partitionable) norm chain, not
    # the single-chip Pallas fused kernels — the delta feeds a per-mesh norm
    # correction on the multi-chip estimate (scaled by the context shard's
    # token count; HBM-bound work)
    dit1_p = bench_dit_block_ms(batch=1, iters=3, plain_norms=True)
    norm_delta_s = max(dit1_p["per_block_s"] - dit1["per_block_s"], 0.0)
    vae = bench_vae_s()
    e2e = bench_e2e_pipeline_s()

    # measured collective volume of the real sharded programs (VERDICT r1:
    # derive the scaling penalty, don't assert it), over candidate deployment
    # meshes — the 8-chip estimate uses the cheapest measured layout
    import concurrent.futures as cf

    # serving-mesh candidates. fsdp layouts are omitted: the v5e AOT compiler
    # proved fsdp=2,context=4 exceeds HBM (19.2 G > 15.75 G — per-block weight
    # all-gathers on top of 14 G resident), and per-block gathers are pure
    # overhead for serving anyway; fsdp is a *training* axis here.
    MESHES = ("tensor=8", "tensor=4,context=2", "tensor=2,context=4")
    PIPE_ARGS = ["--model", "pipeline", "--height", "88", "--width", "160"]

    # serving feasibility: the FULL pipeline program (denoise scan + VAE
    # decode, one jit) must fit HBM on the mesh — the bare forward can fit
    # where the pipeline does not (t2c4 at bf16: 17.5 G fwd vs 19.1 G pipe).
    # Walk meshes lowest-wire-first (static order: wire cost is monotone in
    # the candidates); one compile usually settles it.  AOT only (the CPU
    # backend has no HBM limit); a timeout counts as unproven and the walk
    # moves on.  The walks start immediately so they overlap the forward
    # measurements — the one uncachable compile (a mesh the compiler
    # rejects) dominates bench wall time otherwise.
    WALK_ORDER = ("tensor=2,context=4", "tensor=4,context=2", "tensor=8")
    feasibility: dict[str, dict[str, bool]] = {m: {} for m in MESHES}

    def serving_mesh(quantize: bool) -> str | None:
        for m in WALK_ORDER:
            rep = measured_collectives(
                ["--mesh", m, *PIPE_ARGS] + (["--quantize"] if quantize else []),
                aot_only=True, timeout=2400)
            feasibility[m]["int8" if quantize else "bf16"] = rep is not None
            if rep is not None:
                return m
        return None

    jobs = {}
    with cf.ThreadPoolExecutor(max_workers=6) as pool:
        f_bf16 = pool.submit(serving_mesh, False)
        f_int8 = pool.submit(serving_mesh, True)
        for m in MESHES:
            jobs[("edit", m)] = pool.submit(
                measured_collectives, ["--mesh", m, "--frames", "2"])
            jobs[("reason", m)] = pool.submit(
                measured_collectives,
                ["--mesh", m, "--frames", "8", "--batch", "2"])
        jobs[("vae", "tensor=8")] = pool.submit(
            measured_collectives,
            ["--model", "vae", "--mesh", "tensor=8", "--frames", "2",
             "--height", "88", "--width", "160"])
        results = {k: f.result() for k, f in jobs.items()}

    def _cp_of(mesh_name: str) -> int:
        d = dict(kv.split("=") for kv in mesh_name.split(","))
        return int(d.get("context", 1))

    def norm_extra(mesh_name: str) -> float:
        """Per-step cost of the unfused norm chain the sharded program runs.

        Norm work is HBM-bound and scales with tokens per chip: only the
        context axis shards tokens (1/cp vs the 1/8 the naive per-block
        division assumes), so the correction is delta x 40 x (1/cp - 1/8)."""
        cp = _cp_of(mesh_name)
        return 40 * norm_delta_s * max(1.0 / cp - 1.0 / N_CHIPS_TARGET, 0.0)

    def best(kind):
        """Pick the mesh minimizing wire + norm-correction step cost."""
        cands = {}
        for m in MESHES:
            s = wire_seconds(results.get((kind, m)))
            if s is not None:
                cands[m] = s + norm_extra(m)
        if not cands:
            return None, None, {}
        m = min(cands, key=cands.get)
        return m, cands[m], {k: round(v, 4) for k, v in cands.items()}

    edit_mesh0, _, edit_cands = best("edit")
    reason_mesh, comm_reason, reason_cands = best("reason")

    edit_mesh = f_bf16.result() or edit_mesh0
    int8_mesh = f_int8.result() or edit_mesh
    comm_edit = edit_cands.get(edit_mesh)
    comm_int8 = edit_cands.get(int8_mesh, comm_edit)
    hlo_edit = results.get(("edit", edit_mesh)) if edit_mesh else None
    hlo_reason = results.get(("reason", reason_mesh)) if reason_mesh else None
    hlo_vae = results.get(("vae", "tensor=8"))
    comm_vae = wire_seconds(hlo_vae) or 0.0

    vae_1chip = vae["encode_s"] + vae["decode_s"]
    vae_8chip = vae_1chip / N_CHIPS_TARGET + comm_vae

    def estimate(dit, steps, comm_s):
        step_compute = (40 * dit["per_block_s"] + dit["overhead_s"]) / N_CHIPS_TARGET
        if comm_s is None:
            comm_s = step_compute * 0.15  # fallback: old asserted penalty
        return steps * (step_compute + comm_s) + vae_8chip

    total = estimate(dit1, DENOISE_STEPS, comm_edit)
    total_int8 = estimate(dit1_q, DENOISE_STEPS, comm_int8)
    total_cfg50 = estimate(dit2, 50, comm_edit)
    # batch-2 distilled serving throughput: the b=2 forward is the same
    # program as CFG-batched (two images per step); collective bytes scale
    # with batch, so 2x the measured b=1 overhead is the upper bound
    total_b2 = estimate(dit2, DENOISE_STEPS,
                        None if comm_edit is None else 2 * comm_edit)
    throughput_b2 = 2.0 / (total_b2 + vae_8chip)  # 2nd image's VAE pass
    total_reason50 = estimate(dit_r, 50, comm_reason)

    # measured e2e (1-chip, reduced depth) scaled to 40 layers: non-DiT time
    # is measured directly, block-loop scales by depth
    block_part = DENOISE_STEPS * e2e["layers"] * dit1["per_block_s"]
    e2e_40_1chip = (e2e["measured_s"] - block_part
                    + DENOISE_STEPS * 40 * dit1["per_block_s"])

    def penalty(dit, comm_s):
        step_compute = (40 * dit["per_block_s"] + dit["overhead_s"]) / N_CHIPS_TARGET
        return None if comm_s is None else round(1 + comm_s / step_compute, 3)

    print(json.dumps({
        "metric": "estimated sec/edit, 720p, 8-step distilled (guidance 1.0), v5e-8 (1-chip compute + measured collective bytes, best deployment mesh)",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(TARGET_SEC / total, 3),
        "detail": {
            "device": str(dev),
            "dit_block_s_1chip_b1": round(dit1["per_block_s"], 5),
            "dit_block_s_1chip_b1_int8": round(dit1_q["per_block_s"], 5),
            "est_sec_per_edit_int8_serving": round(total_int8, 3),
            "dit_block_s_1chip_b2_cfg": round(dit2["per_block_s"], 5),
            "dit_block_s_1chip_b2_reasoning28k": round(dit_r["per_block_s"], 5),
            "est_sec_per_edit_50step_cfg": round(total_cfg50, 3),
            "est_edits_per_s_batch2_distilled": round(throughput_b2, 3),
            "est_sec_per_edit_50step_reasoning": round(total_reason50, 3),
            f"e2e_measured_s_1chip_{e2e['layers']}layer": round(e2e["measured_s"], 3),
            "e2e_est_s_1chip_40layer": round(e2e_40_1chip, 3),
            "vae_encode_s": round(vae["encode_s"], 4),
            "vae_decode_s": round(vae["decode_s"], 4),
            "edit_mesh": edit_mesh,
            "int8_mesh": int8_mesh,
            "reasoning_mesh": reason_mesh,
            # mesh -> can the FULL serving program (8-step denoise + VAE
            # decode, one jit) compile within v5e HBM? (bf16/int8 weights;
            # meshes past the first feasible one are not checked)
            "serving_feasible_by_mesh": feasibility,
            # per-step overhead = measured wire time + plain-norm correction
            # (the sharded program can't run the single-chip fused norms)
            "edit_step_overhead_s_by_mesh": edit_cands,
            "reasoning_step_overhead_s_by_mesh": reason_cands,
            "plain_norm_delta_s_per_block_1chip": round(norm_delta_s, 5),
            "collective_bytes_edit_fwd": (
                hlo_edit and hlo_edit["collective_bytes"]),
            "collective_bytes_reasoning_fwd": (
                hlo_reason and hlo_reason["collective_bytes"]),
            "collective_bytes_vae_decode": (
                hlo_vae and hlo_vae["collective_bytes"]),
            "derived_overhead_penalty_edit": penalty(dit1, comm_edit),
            "derived_overhead_penalty_reasoning": penalty(dit_r, comm_reason),
            "hlo_backend": hlo_edit and hlo_edit.get("backend"),
            "assumptions": (
                f"ICI {ICI_BW_PER_CHIP/1e9:.0f} GB/s per chip applied to "
                "HLO-measured per-device collective buffer bytes x ring wire "
                "factors (8-wide; mild upper bound for smaller groups); "
                "hlo_backend tpu-aot = exact v5e SPMD program (native bf16 "
                "collectives, detached-topology AOT compile); cpu fallback "
                "overstates bytes ~2x (f32 promotion)"),
        },
    }))


if __name__ == "__main__":
    main()
