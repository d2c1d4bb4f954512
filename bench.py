"""Benchmark: ChronoEdit-14B edit-mode hot path on real TPU hardware.

Prints ONE SHORT JSON line (hard-capped well under the driver's tail
capture — BENCH_r02/r03 both lost their scoreboard because the line
outgrew it):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "headline": {...~15 key numbers...}, "detail_file": "BENCH_DETAIL.json"}

The FULL measurement detail is written to ``BENCH_DETAIL.json`` next to
this file (tracked in git; committed after bench runs — the driver's
end-of-round snapshot commit picks up changes from its own run).
``tests/test_bench_assemble.py`` asserts the printed line stays < 1500
bytes for a fully-populated measurement state.

Metric: estimated end-to-end seconds per 720p edit with the 8-step distilled
LoRA on a v5e-8, derived from single-chip measurements (the harness exposes
one chip) plus *measured* collective volume:

- DiT per-block latency at full 14B geometry (dim 5120, 40 heads x 128,
  ffn 13824) for the 720p edit sequence (7200 tokens) and the 29-frame
  reasoning sequence (28800 tokens), measured by timing stacks of L1 and L3
  blocks and differencing to cancel embed/head overhead;
- Wan VAE encode (5x720p frames) + decode (2 latent frames) latency;
- MEASURED full-pipeline e2es on one chip: the FULL 40-layer model via the
  int4 w4a16 capacity path (~9.1 GB weights; r4's split-half packing made
  the program fit — tools/diag_int4_oom.py), the deepest int8 depth that
  fits HBM (the int8 model is ~20.5 GB, so int8 serves sharded), the
  temporal-reasoning trajectory, and each with the Δ-DiT block cache;
  remaining 40-layer bf16 figures are extrapolated from reduced-depth runs,
  labeled as such, and calibrated by the measured int4 depth scaling
  (``extrapolation_error``);
- multi-chip scaling: the real 40-layer sharded forward is AOT-compiled for
  a detached v5e-8 topology (tools/sharded_step_hlo.py --backend tpu-aot —
  the exact TPU SPMD program; virtual-CPU fallback) and the collectives XLA
  actually inserted are summed from the optimized HLO; the communication
  penalty is derived as wire-bytes / ICI bandwidth instead of being
  asserted. Same for the H-sharded VAE's halo exchanges. int8 serving uses
  collectives measured from the *quantized* program (advisor r2);
- deployment-mesh choice is gated on the FULL serving program (denoise scan
  + VAE decode in one jit) compiling within v5e HBM, per weight precision.

Wall-time discipline (rounds 3-5; VERDICT r4 #1 — three straight driver
runs ended with nothing parseable):

- the bench prints MANY JSON lines: one within seconds of start (the
  previous run's BENCH_DETAIL.json re-emitted with ``partial: true``),
  one after every completed stage (current best partial assembly), and
  the final full line at exit. The driver takes the LAST line, so any
  kill after the first seconds still leaves a scoreboard;
- every stage runs under one global deadline (CHRONOEDIT_BENCH_BUDGET_S,
  default 1500 s — r4's driver kill landed before the old 2100+180 alarm);
  AOT-walk subprocesses get ``min(cap, remaining)`` timeouts and are
  skipped outright when the budget is nearly spent;
- compile-service flakes (remote_compile HTTP 500) are NOT treated as
  HBM OOM: one cooldown retry, then the stage is skipped without marking
  the depth infeasible and without descending the depth ladder (r4's
  driver run died re-probing 14B ladders on HTTP 500s);
- cold depth probes (depths not already known feasible) are capped per
  family per run, so one run can never re-derive a whole ladder;
- feasibility/collective results persist to ``bench_cache.json`` — the
  expensive uncachable compiles are the *failed* (HBM-infeasible) ones,
  which the XLA persistent cache cannot help with; repeat runs skip them
  entirely. CACHE POLICY (VERDICT r3 #8): the file is TRACKED and
  committed after every bench run, including learnings from the driver's
  end-of-round run (its snapshot commit picks them up) — builder and
  driver share one view of what is known. Single-chip e2e feasibility
  entries are stamped with FEASIBILITY_EPOCH (a manually-bumped int —
  bump it when quant/DiT/pipeline/VAE/kernel changes can alter HBM
  feasibility); tests/test_bench_assemble.py fails when committed cache
  entries don't match the tree's epoch, so a stale cache is
  uncommittable (r4's source-hash keying silently invalidated the whole
  cache 20 minutes before the driver ran);
- a SIGALRM fires ``budget + 60 s`` as a last resort and emits the best
  line assemblable from whatever has been measured (``partial: true``);
- after printing, the process hard-exits (os._exit) so straggler compile
  subprocesses cannot hold the exit.

vs_baseline = (5 s target) / estimate — >1 means faster than the BASELINE.md
target. The reference publishes no GPU latency numbers (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
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

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("CHRONOEDIT_BENCH_BUDGET_S", 1500))
_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE_PATH = os.path.join(_HERE, "bench_cache.json")
# bump when the sharded program materially changes (new collectives/kernels):
# cached HLO measurements are only valid for the program version they came
# from. r3: fused norms shard_mapped into the multi-chip program.
_CACHE_VERSION = 3

# everything measured so far — the SIGALRM emitter assembles its line from
# this, so keep it updated as results land
PARTIAL: dict = {}
_PRINTED = False


def _load_history() -> dict:
    """Previous run's BENCH_DETAIL detail dict, captured at import time
    (before this run overwrites the file). Fields a deadline-skipped stage
    leaves None inherit the last run's value via :func:`_merge_history`, so
    one budget-bound run can never regress the committed detail to null
    (round 5: a warm rehearsal that skipped every flagship e2e stage
    overwrote all measured 40-layer rows with null)."""
    try:
        with open(os.path.join(_HERE, "BENCH_DETAIL.json")) as f:
            prev = json.load(f)
        detail = prev.get("detail", {})
        return detail if isinstance(detail, dict) else {}
    except Exception:
        return {}


# fields that must always reflect THIS run, never the previous one
_NO_HISTORY_FIELDS = frozenset({
    "elapsed_s", "partial", "walk_timed_out", "assumptions", "device",
    "fields_from_history", "error",
})

_HISTORY = _load_history()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


# headline detail fields promoted into the printed line (everything else
# lives only in BENCH_DETAIL.json). Keep this list short: the test caps the
# printed line at 1500 bytes.
_HEADLINE_FIELDS = (
    "e2e_measured_s_1chip_40layer_int4",
    "e2e_measured_s_1chip_40layer_int4_blockcache",
    "e2e_measured_s_1chip_40layer_int4a8",
    "e2e_measured_s_1chip_40layer_int4a8_blockcache",
    "e2e_measured_s_1chip_40layer_mixed",
    "e2e_measured_s_1chip_40layer_mixed_blockcache",
    "e2e_measured_s_1chip_40layer_mixed2",
    "est_edits_per_s_v5e8_int4a8_cached_replicated",
    "e2e_measured_s_1chip_int8",
    "e2e_measured_int8_layers",
    "e2e_measured_s_1chip_int8_blockcache",
    "est_sec_per_edit_int8_serving",
    "est_sec_per_edit_int8_blockcache_serving",
    "est_sec_per_edit_50step_reasoning_int8",
    "e2e_measured_s_1chip_reasoning",
    "est_sec_per_edit_50step_reasoning_int8_blockcache",
    "e2e_measured_s_1chip_reasoning_int4a8",
    "e2e_reasoning_int4a8_layers",
    "dit_block_s_1chip_b1",
    "dit_block_s_1chip_b1_int8",
    "vae_encode_s",
    "vae_decode_s",
    "edit_mesh",
    "extrapolation_error",
    "elapsed_s",
)


def _shorten(full: dict) -> dict:
    """The printed line: scoreboard fields + a small headline dict. The full
    ``detail`` goes to BENCH_DETAIL.json (see :func:`_emit`)."""
    detail = full.get("detail", {})
    line = {k: full.get(k) for k in ("metric", "value", "unit", "vs_baseline")}
    line["headline"] = {k: detail[k] for k in _HEADLINE_FIELDS if k in detail}
    if full.get("partial") or detail.get("partial"):
        line["partial"] = True
    line["detail_file"] = "BENCH_DETAIL.json"
    return line


def _emit(obj: dict) -> None:
    global _PRINTED
    if _PRINTED:
        return
    _PRINTED = True
    try:
        with open(os.path.join(_HERE, "BENCH_DETAIL.json"), "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
    except Exception as e:  # pragma: no cover - detail is best-effort
        print(f"[bench] detail save failed: {e}", file=sys.stderr)
    print(json.dumps(_shorten(obj)), flush=True)


def _emit_early() -> None:
    """VERDICT r4 #1(a): print a parseable line within seconds of start —
    the previous run's BENCH_DETAIL.json re-shortened with ``partial``/
    ``stale_from_previous_run`` flags. The driver takes the LAST JSON line
    on stdout, so every later emit supersedes this one; a kill at any point
    after startup still leaves a scoreboard (r2/r3/r4 all left none)."""
    try:
        with open(os.path.join(_HERE, "BENCH_DETAIL.json")) as f:
            prev = json.load(f)
        if prev.get("value") is None:
            return
        line = _shorten(prev)
        line["partial"] = True
        line["stale_from_previous_run"] = True
        print(json.dumps(line), flush=True)
    except Exception:  # no previous detail — nothing to pre-emit
        pass


def _emit_progress() -> None:
    """Reprint the current best partial line after each completed stage so
    the driver's capture always ends near a parseable scoreboard, and
    persist feasibility learnings incrementally (a kill must not lose
    them)."""
    if _PRINTED:
        return
    try:
        obj = _assemble(PARTIAL)
        line = _shorten(obj)
        line["partial"] = True
        print(json.dumps(line), flush=True)
    except Exception as e:  # pragma: no cover - progress is best-effort
        print(f"[bench] progress emit failed: {e}", file=sys.stderr)
    _save_cache()


# ------------------------------------------------------------------ cache

def _load_cache() -> dict:
    try:
        with open(_CACHE_PATH) as f:
            c = json.load(f)
        if c.get("version") == _CACHE_VERSION:
            return c.get("entries", {})
    except Exception:
        pass
    return {}


_CACHE = _load_cache()
_CACHE_DIRTY = False


# Feasibility epoch (VERDICT r4 #1c): bump this int MANUALLY whenever a
# change to the quant/DiT/pipeline/VAE source or the Pallas kernels can
# alter single-chip HBM feasibility, then re-run bench.py to re-stamp the
# depth ladders. The old scheme (a hash of 7 source files) invalidated the
# whole cache on perf-neutral edits — r4's driver run cold-re-probed every
# ladder and was killed with nothing parseable. A fast-tier test
# (tests/test_bench_assemble.py::test_bench_cache_epoch_matches_tree) fails
# when committed bench_cache.json entries don't match this value, making a
# stale cache uncommittable.
FEASIBILITY_EPOCH = 5


def _feasibility_entry(key: str) -> dict:
    """Cached e2e feasibility entry, empty if stamped at an older epoch."""
    hist = dict(_CACHE.get(key, {}))
    if hist.get("epoch") != FEASIBILITY_EPOCH:
        return {"epoch": FEASIBILITY_EPOCH}
    return hist


def _save_cache() -> None:
    global _CACHE_DIRTY
    if not _CACHE_DIRTY:
        return
    try:
        with open(_CACHE_PATH, "w") as f:
            json.dump({"version": _CACHE_VERSION, "entries": _CACHE}, f,
                      indent=1, sort_keys=True)
        _CACHE_DIRTY = False
    except Exception as e:  # pragma: no cover
        print(f"[bench] cache save failed: {e}", file=sys.stderr)


# ---------------------------------------------- failure triage + probe caps

def _classify_failure(e: Exception) -> str:
    """Triage a failed e2e attempt (VERDICT r4 #1b).

    'oom'   — the runtime proved the program doesn't fit: descend the ladder
              and remember the depth as infeasible.
    'infra' — the tunneled compile service flaked (remote_compile HTTP 500 /
              tpu_compile_helper exit). Says NOTHING about HBM: r4's driver
              died descending a 14B depth ladder, one multi-minute compile
              per rung, on HTTP 500s. Retry once after a cooldown, then skip
              WITHOUT marking infeasible and WITHOUT descending.
    'other' — a real bug; stop the family and report."""
    s = str(e)
    if "RESOURCE_EXHAUSTED" in s:
        return "oom"
    if ("remote_compile" in s or "HTTP 5" in s
            or "tpu_compile_helper" in s):
        return "infra"
    return "other"


# Cold probes = e2e attempts at depths not already known feasible (each one
# is a multi-minute 14B compile when the XLA cache is cold). Cap them per
# feasibility-cache family per run so one bench run can never re-derive a
# whole ladder inside the driver's kill window (VERDICT r4 #1d). Climbing
# toward deeper depths resumes across runs: feasibility persists, so each
# run pays at most _COLD_CAP rungs and starts where the last one ended.
_COLD_PROBES: dict[str, int] = {}
_COLD_CAP = 2

# skip a depth whose compile has infra-flaked in this many separate runs at
# the current epoch (see _attempt_e2e's quarantine bookkeeping)
_INFRA_SKIP_AFTER = 2


def _cold_allowed(family: str) -> bool:
    return _COLD_PROBES.get(family, 0) < _COLD_CAP


def _note_cold(family: str) -> None:
    _COLD_PROBES[family] = _COLD_PROBES.get(family, 0) + 1


def _infra_skip(hist: dict, layers: int) -> bool:
    return hist.get("infra_flaky", {}).get(str(layers), 0) >= _INFRA_SKIP_AFTER


def _attempt_e2e(family: str, hist: dict, cache_key: str, layers: int,
                 **pipeline_kwargs) -> tuple[dict | None, str]:
    """One e2e measurement try with infra-error quarantine.

    Returns ``(result, status)``, status in {'ok', 'oom', 'infra', 'other'}.
    Updates the feasibility entry ('feasible' on success, 'infeasible' list
    on a genuine OOM; infra flakes record nothing)."""
    global _CACHE_DIRTY
    for retry in (False, True):
        failure = None
        try:
            res = bench_e2e_pipeline_s(layers=layers, **pipeline_kwargs)
            hist["feasible"] = layers
            _CACHE[cache_key] = hist
            _CACHE_DIRTY = True
            return res, "ok"
        except Exception as e:  # noqa: BLE001 - the line must still print
            failure = (_classify_failure(e), type(e).__name__, str(e)[:300])
        # outside the except block: inside it, e.__traceback__ pins the
        # failed attempt's on-device params and nothing frees (r4 rehearsal)
        _release_device_memory()
        kind, ename, emsg = failure
        if kind == "infra" and not retry and _remaining() > 240:
            print(f"[bench] {family} at {layers} layers: infra flake "
                  f"({emsg[:120]}); cooling down 20 s, one retry",
                  file=sys.stderr)
            time.sleep(20)
            continue
        if kind == "oom":
            infeasible = set(hist.get("infeasible", []))
            infeasible.add(layers)
            hist["infeasible"] = sorted(infeasible)
            _CACHE[cache_key] = hist
            _CACHE_DIRTY = True
            print(f"[bench] {family} OOM at {layers} layers "
                  f"({emsg[:120]})", file=sys.stderr)
        elif kind == "infra":
            # Persist the flake count: the int8@24 compile flaked identically
            # across 3+ runs (r5), burning two multi-minute attempts per run.
            # After _INFRA_SKIP_AFTER flaky RUNS at one depth within an
            # epoch, later runs skip that depth outright (a new epoch, or a
            # manual cache wipe, retries it; it is never marked infeasible).
            flaky = dict(hist.get("infra_flaky", {}))
            flaky[str(layers)] = flaky.get(str(layers), 0) + 1
            hist["infra_flaky"] = flaky
            _CACHE[cache_key] = hist
            _CACHE_DIRTY = True
            print(f"[bench] {family} at {layers} layers: infra flake "
                  f"persisted ({flaky[str(layers)]} runs); skipping "
                  "(NOT marked infeasible)", file=sys.stderr)
        else:
            print(f"[bench] {family} failed at {layers} layers: "
                  f"{ename}: {emsg}", file=sys.stderr)
        return None, kind
    return None, "infra"  # pragma: no cover - loop always returns


# ------------------------------------------------------- single-chip timing

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
                       quantize=False) -> dict:
    """Per-block DiT latency at 720p shapes.

    batch=1 is the 8-step distilled path (guidance 1.0 -> single forward);
    batch=2 is the CFG-batched base-model path. frames=2 is edit mode,
    frames=8 the temporal-reasoning sequence (28.8k tokens).
    quantize=True/"int8" measures the int8 w8a8 serving path, "int4" the
    w4a16 capacity path (ops/quant.py).
    NOTE: random data, not zeros — the runtime fast-paths all-zero buffers
    and timings collapse to dispatch overhead.
    """
    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib

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

            mode = quantize if isinstance(quantize, str) else "int8"
            params = jax.jit(
                lambda p: quantize_dit_params(p, **_qspec(mode)))(params)

        def fwd(p, *a, _cfg=cfg):
            return jnp.sum(dit_lib.dit_forward(p, _cfg, *a).astype(jnp.float32))

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


def _qspec(mode: str) -> dict:
    """Map a bench mode string to quantize_dit_params kwargs. 'int4_a8_mixed'
    is the round-5 fidelity flagship: w4a8 base + the measured-sensitivity
    int8 upgrades (quant.INT4_MIXED_UPGRADE, >=30 dB pipeline gate)."""
    if mode == "int4_a8_mixed":
        from chronoedit_tpu.ops.quant import INT4_MIXED_UPGRADE

        return {"mode": "int4_a8", "upgrade": INT4_MIXED_UPGRADE}
    if mode == "int4_a8_mixed2":
        from chronoedit_tpu.ops.quant import INT4_MIXED2_UPGRADE

        return {"mode": "int4_a8", "upgrade": INT4_MIXED2_UPGRADE}
    return {"mode": mode}


def _init_quantized_dit(dit_cfg, mode: str = "int8"):
    """Build a quantized DiT param tree WITHOUT materializing the full bf16
    stack first: the int8 stack is preallocated on device and one layer at a
    time is initialized, quantized, and written in with a donated
    dynamic-update-slice (peak residency = int8 stack + one bf16 layer's
    init workspace). The naive init-then-quantize path peaks at bf16+int8
    residency (42 GB at 40 layers) and OOMed even 10-layer attempts on a
    16 GB chip; a host-side accumulate works but moves the full stack twice
    through the tunneled device link (~4 min at 20 layers)."""
    import dataclasses as dc
    from functools import partial

    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.ops.quant import quantize_dit_params

    one = dc.replace(dit_cfg, num_layers=1)
    qinit = jax.jit(lambda k: quantize_dit_params(
        dit_lib.init_dit_params(k, one), **_qspec(mode)))

    stacked = jax.eval_shape(
        lambda k: quantize_dit_params(dit_lib.init_dit_params(k, dit_cfg),
                                      **_qspec(mode)),
        jax.random.PRNGKey(0))
    blocks = jax.jit(lambda: jax.tree_util.tree_map(
        lambda l: jnp.zeros(l.shape, l.dtype), stacked["blocks"]))()

    @partial(jax.jit, donate_argnums=0)
    def set_layer(st, b1, i):
        return jax.tree_util.tree_map(
            lambda s, b: jax.lax.dynamic_update_slice_in_dim(s, b, i, axis=0),
            st, b1)

    params = None
    for i in range(dit_cfg.num_layers):
        q1 = qinit(jax.random.PRNGKey(100 + i))
        blocks = set_layer(blocks, q1["blocks"], jnp.int32(i))
        if params is None:  # non-block leaves (embedders/head) from layer 0
            params = {k: v for k, v in q1.items() if k != "blocks"}
        del q1
    params["blocks"] = blocks
    return params


def quantized_dit_bytes(layers: int, mode: str = "int8") -> int:
    """Exact parameter bytes of the quantized DiT at ``layers`` depth (from
    eval_shape — no allocation). int8 keeps the context kv projections bf16
    (0.21 GB/layer), so 'int8 weights' are ~0.51 GB/layer, not 0.3: the full
    40-layer model is ~20.5 GB even in int8 and cannot fit one v5e chip.
    int4 (w4a16 grouped, ops/quant.py) packs everything: ~9.1 GB at 40
    layers — the whole 14B model on ONE chip."""
    import dataclasses as dc

    from chronoedit_tpu.configs import chronoedit_14b
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.ops.quant import quantize_dit_params

    cfg = dc.replace(chronoedit_14b().dit, num_layers=layers,
                     param_dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: quantize_dit_params(dit_lib.init_dit_params(k, cfg),
                                      **_qspec(mode)),
        jax.random.PRNGKey(0))
    return sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(shapes))


def bench_e2e_pipeline_s(layers: int = 8, quantize=False,
                         cache: tuple | None = None,
                         reasoning: bool = False) -> dict:
    """Measured end-to-end 8-step distilled edit at 720p on ONE chip.

    bf16 at 40 layers does not fit one chip (28 GB weights), so the bf16
    run uses a reduced depth and the 40-layer figure scales the block-loop
    portion only. ``quantize=True`` (int8) or ``quantize="int4"`` builds
    quantized params layer-by-layer (see :func:`_init_quantized_dit`) so
    the deepest HBM-feasible depth is set by the *quantized* footprint, not
    a transient bf16 copy.
    ``cache=((a, b), k)`` engages the Δ-DiT block cache — blocks [a, b)
    reuse their cached token delta except every k-th solver step.
    ``reasoning=True`` runs temporal-reasoning mode — the 29-pixel-frame /
    8-latent-frame 28.8k-token trajectory, reasoning steps = all steps (the
    reference CLI default 50/50, pipeline_chronoedit.py:700-709) with the
    dual decode."""
    import dataclasses as dc

    from chronoedit_tpu.configs import chronoedit_14b_distilled
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    cfg = chronoedit_14b_distilled()
    cfg = dc.replace(cfg, dit=dc.replace(cfg.dit, num_layers=layers,
                                         param_dtype=jnp.bfloat16,
                                         # capacity diet at the 28.8k shape:
                                         # token-chunked ffn (identical math)
                                         ffn_chunks=4 if reasoning else 1))
    if cache is not None:
        cfg = dc.replace(cfg, cache_blocks=tuple(cache[0]),
                         cache_period=cache[1])
    # capacity-squeezed configs tile the VAE (round 5): the mixed recipe's
    # +1.18 GB of upgraded weights put the untiled decode's 1.3 GB fp32
    # norm temps over the edge (the r5 OOM dump); shallower quantized depths
    # measured fine untiled in r4 and keep the faster untiled VAE.
    # int8 >= 24 layers (VERDICT r4 #5): the r5 diag pinned the 24-layer
    # int8 OOM to the SAME cause — 12.7 GB of int8 arguments leave only
    # ~3 GB of temp headroom and the untiled decode wants 5.3 GB (two
    # 1.77 GB fp32 square temps, vae.py:113) — not to any DiT relayout,
    # so the split-half repacking port the verdict guessed at is moot.
    if (quantize == "int4_a8_mixed" and layers >= 32) or (
            quantize == "int4_a8_mixed2" and layers >= 24) or (
            quantize in (True, "int8") and layers >= 24):
        cfg = dc.replace(cfg, vae_spatial_tiles=4)
    if quantize:
        mode = quantize if isinstance(quantize, str) else "int8"
        dit_params = _init_quantized_dit(cfg.dit, mode=mode)
    else:
        dit_params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae)
    pipe = ChronoEditPipeline(cfg, dit_params, vae_params)

    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    image = jax.random.uniform(ks[0], (1, 3, 704, 1280), jnp.float32,
                               minval=-1, maxval=1)
    prompt = jax.random.normal(ks[1], (1, 512, cfg.dit.text_dim), jnp.float32)
    clip = jax.random.normal(ks[2], (1, cfg.dit.image_tokens, cfg.dit.image_dim),
                             jnp.float32)
    kw = {}
    if reasoning:
        kw = {"enable_temporal_reasoning": True,
              "num_temporal_reasoning_steps": cfg.num_steps}

    def run():
        video = pipe(image, prompt, image_emb=clip, key=jax.random.PRNGKey(3),
                     **kw)
        return float(jnp.sum(video.astype(jnp.float32)))

    run()  # compile + warm
    t0 = time.perf_counter()
    run()
    measured = time.perf_counter() - t0
    del dit_params, vae_params, pipe
    _release_device_memory()
    out = {"layers": layers, "quantize": quantize, "measured_s": measured}
    if reasoning:
        out["reasoning"] = True
    if cache is not None:
        out["cache_blocks"] = list(cache[0])
        out["cache_period"] = cache[1]
    return out


def _release_device_memory() -> None:
    """Actually free a finished stage's HBM: the pipeline's per-instance jit
    cache closes over the pipeline itself (a reference cycle), so ``del``
    alone leaves the full param tree alive until a collector pass; and jax's
    global pjit caches pin compiled executables. Skipping this OOMed the VAE
    stage after the 10.7 GB int8 e2e."""
    import gc

    jax.clear_caches()
    gc.collect()


def bench_e2e_int8_deepest() -> dict | None:
    """Measure the deepest int8 single-chip e2e that fits HBM.

    Depths whose exact quantized parameter bytes (eval_shape) exceed the
    weight budget are skipped without compiling — the quantized 40-layer
    model is ~20.5 GB (context kv projections stay bf16) and can never fit
    one 16 GB chip, so "deepest fitting" is the honest flagship measurement
    (VERDICT r2 #2 anticipated this: 'if HBM rejects it, bisect to the
    deepest fitting depth and say so')."""
    # ~15.75 GB usable HBM minus VAE params, pipeline activations and
    # compile workspace at 720p (~2.5 GB measured headroom needed)
    weight_budget = 13.2e9
    hist = _feasibility_entry("int8_e2e_depth")
    known = hist.get("feasible")
    infra_seen = False
    for layers in range(40, 7, -4):
        if (quantized_dit_bytes(layers) > weight_budget
                or layers in set(hist.get("infeasible", []))
                or _infra_skip(hist, layers)):
            continue
        cold = layers != known
        # after an infra flake, keep walking down but only to WARM rungs:
        # the known depth still gets its measurement (r5b regression: one
        # flake at cold 24 nulled the whole int8 row, 20 included), while no
        # further multi-minute cold compiles are risked on a flaky service
        if cold and (infra_seen or not _cold_allowed("int8_e2e_depth")):
            if not infra_seen:
                print("[bench] int8 e2e: cold-probe cap reached",
                      file=sys.stderr)
            continue
        if _remaining() < 300:
            print(f"[bench] skipping int8 e2e at {layers} layers "
                  "(deadline)", file=sys.stderr)
            return None
        if cold:
            _note_cold("int8_e2e_depth")
        res, status = _attempt_e2e("int8 e2e", hist, "int8_e2e_depth",
                                   layers, quantize=True)
        if res is not None:
            return res
        if status == "infra":
            infra_seen = True
            continue
        if status != "oom":
            return None
    return None


def bench_e2e_reasoning_deepest(cache: bool = False,
                                mode: str = "int8") -> dict | None:
    """Measured temporal-reasoning e2e on ONE chip (VERDICT r3 #4): the
    29-pixel-frame / 8-latent-frame 28.8k-token trajectory, int8
    projections, 8 distilled steps, reasoning steps = all steps (the
    reference CLI default, pipeline_chronoedit.py:700-709). Runs at the
    deepest depth whose HBM feasibility is known/probed — reasoning
    activations are ~4x the edit mode's, so the feasible depth can sit
    below the edit path's. ``cache=True`` additionally engages the Δ-DiT
    block cache at the middle-60% recipe for whatever depth the probe
    lands on (the measured accelerated reasoning recipe, docs/SERVING.md;
    the serving derivation in _assemble uses it only when it matched the
    uncached run's depth). ``mode="int4_a8"`` swaps the projections to w4a8
    (int4 storage, per-column-int8 requantized compute): ~0.23 GB/layer of
    weights vs int8's ~0.51, so the measured reasoning depth climbs — the
    capacity lever for the activation-dominated 28.8k-token regime."""
    tag = {"int8": "int8", "int4_a8": "int4a8"}[mode]
    # separate feasibility key when the cache is engaged: the delta carry
    # bills extra HBM, and an OOM there must not mark the uncached depth
    # infeasible (round-4 review)
    key = f"{tag}_reason_depth" + ("_cached" if cache else "")
    hist = _feasibility_entry(key)
    known = hist.get("feasible")
    start = (known
             or _feasibility_entry(f"{tag}_reason_depth").get("feasible"))
    if start is None:
        int8_known = (_feasibility_entry("int8_reason_depth").get("feasible")
                      or _feasibility_entry("int8_e2e_depth").get("feasible")
                      or 20)
        if mode == "int8":
            start = int8_known
        else:
            # seed the w4a8 probe by weight-budget equivalence with the
            # int8-known depth: reasoning temps are ~depth-independent
            # (scan-carried), so the weight bytes freed by int4 storage
            # convert directly into extra layers
            budget = quantized_dit_bytes(int8_known, mode="int8")
            start = int8_known
            while (start + 4 <= 40 and
                   quantized_dit_bytes(start + 4, mode=mode) <= budget):
                start += 4

    def attempt(layers: int) -> tuple[dict | None, str]:
        return _attempt_e2e(
            f"reasoning e2e [{key}]", hist, key, layers,
            quantize=mode, reasoning=True,
            cache=((layers // 5, layers - layers // 5), 2) if cache
            else None)

    res = None
    infra_seen = False
    for layers in range(start, 7, -4):
        if (quantized_dit_bytes(layers, mode=mode) > 13.2e9
                or layers in set(hist.get("infeasible", []))
                or _infra_skip(hist, layers)):
            continue
        cold = layers != known
        # infra flake -> no more cold compiles this run, but the warm known
        # depth still gets measured (see bench_e2e_int8_deepest)
        if cold and (infra_seen or not _cold_allowed(key)):
            if not infra_seen:
                print(f"[bench] reasoning e2e [{key}]: cold-probe cap "
                      "reached", file=sys.stderr)
            continue
        if _remaining() < 420:
            print(f"[bench] skipping reasoning e2e at {layers} layers "
                  "(deadline)", file=sys.stderr)
            return None
        if cold:
            _note_cold(key)
        res, status = attempt(layers)
        if res is not None:
            break
        if status == "infra":
            infra_seen = True
            continue
        if status != "oom":
            return None
        print(f"[bench] reasoning e2e descending below {layers}",
              file=sys.stderr)
    if res is None:
        return None
    # climb upward (round 4): the weight-budget seed is conservative — a
    # first-try success (e.g. w4a8 at its seeded depth 28) leaves deeper
    # depths unexplored. Probe +4 while weights plausibly fit, the deadline
    # allows, and the per-run cold cap isn't spent; feasibility persists, so
    # each run pays at most _COLD_CAP rungs and resumes where the last ended.
    nxt = hist["feasible"] + 4
    while (not infra_seen and nxt <= 40
           and nxt not in set(hist.get("infeasible", []))
           and not _infra_skip(hist, nxt)
           and quantized_dit_bytes(nxt, mode=mode) <= 13.2e9
           and _remaining() >= 900 and _cold_allowed(key)):
        print(f"[bench] reasoning e2e climbing to {nxt} layers",
              file=sys.stderr)
        _note_cold(key)
        deeper, status = attempt(nxt)
        if deeper is None:
            break
        res = deeper
        nxt += 4
    return res


def bench_e2e_int4_full(mode: str = "int4") -> dict | None:
    """Measured FULL-DEPTH (40-layer) single-chip e2e via the grouped int4
    storage path (ops/quant.py): ~9.1 GB of weights, so the whole 14B model
    fits ONE v5e chip and the flagship depth is measured, not extrapolated.
    ``mode="int4"`` is w4a16 (bf16 compute); ``mode="int4_a8"`` requantizes
    per layer to per-column int8 and rides the MXU double-rate int8 matmul
    — same capacity, ~w8a8 speed. Quality gates:
    tests/test_quant.py::test_int4_pipeline_psnr_gate resp.
    test_int4_a8_pipeline_psnr_gate. Feasibility persists to
    bench_cache.json like the int8 probe."""
    cache_key = {"int4": "int4_e2e_40", "int4_a8": "int4a8_e2e_40",
                 "int4_a8_mixed": "int4a8mix_e2e_40",
                 "int4_a8_mixed2": "int4a8mix2_e2e_40"}[mode]
    hist = _feasibility_entry(cache_key)
    if hist.get("infeasible"):
        print(f"[bench] cached: {mode} 40-layer e2e infeasible at this "
              "epoch", file=sys.stderr)
        return None
    if _infra_skip(hist, 40):
        print(f"[bench] cached: {mode} 40-layer e2e compile infra-flaky at "
              "this epoch; skipping", file=sys.stderr)
        return None
    res, _status = _attempt_e2e(f"{mode} 40-layer e2e", hist, cache_key, 40,
                                quantize=mode)
    return res


# ------------------------------------------------- sharded-program metrics

def measured_collectives(extra_args: list[str], aot_only: bool = False,
                         cap: int = 1200) -> dict | None:
    """Compile the sharded program in a subprocess and return the measured
    collective bytes from the optimized HLO.  Prefers the detached-topology
    TPU AOT compile (exact: native bf16 collectives); falls back to the
    virtual-CPU mesh (f32-promotion upper bound) if AOT is unavailable —
    unless ``aot_only`` (feasibility checks: the CPU backend has no HBM
    limit, so its success proves nothing).

    Results (including HBM-infeasibility) are cached in bench_cache.json;
    subprocess timeouts are clamped to the global deadline and near-deadline
    calls are skipped (returning the cached/None result)."""
    key = " ".join(extra_args) + (" aot_only" if aot_only else "")
    if key in _CACHE:
        hit = _CACHE[key]
        if hit.get("infeasible"):
            print(f"[bench] cached: mesh infeasible on v5e: {extra_args}",
                  file=sys.stderr)
            return None
        if hit.get("report") is not None:
            return hit["report"]
        # cached transient failure: retry below

    global _CACHE_DIRTY
    tool = os.path.join(_HERE, "tools", "sharded_step_hlo.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               ALLOW_MULTIPLE_LIBTPU_LOAD="1",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    backends = ("tpu-aot",) if aot_only else ("tpu-aot", "cpu")
    for backend in backends:
        budget = min(cap, _remaining() - 90)
        if budget < 120:
            print(f"[bench] skipping {extra_args} (deadline)", file=sys.stderr)
            return None
        try:
            out = subprocess.run(
                [sys.executable, tool, "--backend", backend, *extra_args],
                env=env, capture_output=True, text=True, timeout=budget,
                check=True)
            rep = json.loads(out.stdout.strip().splitlines()[-1])
            if backend == "tpu-aot":
                _CACHE[key] = {"report": rep}
                _CACHE_DIRTY = True
            return rep
        except subprocess.CalledProcessError as e:
            if backend == "tpu-aot" and "RESOURCE_EXHAUSTED" in (e.stderr or ""):
                # the real v5e compiler proved this layout doesn't fit HBM —
                # an infeasible deployment mesh, not a measurement failure;
                # do NOT fall back to the CPU mesh (no HBM limit there)
                print(f"[bench] mesh infeasible on v5e (HBM OOM): {extra_args}",
                      file=sys.stderr)
                _CACHE[key] = {"infeasible": True}
                _CACHE_DIRTY = True
                return None
            print(f"[bench] {backend} collective measurement failed: {e}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[bench] {backend} {extra_args} hit its {budget:.0f}s "
                  "clamp (deadline-bounded); unproven", file=sys.stderr)
            return None
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


# ------------------------------------------------------------------- main

MESHES = ("tensor=8", "tensor=4,context=2", "tensor=2,context=4")
PIPE_ARGS = ["--model", "pipeline", "--height", "88", "--width", "160"]
WALK_ORDER = ("tensor=2,context=4", "tensor=4,context=2", "tensor=8")


def _wire_bound_field() -> float | None:
    """wire_model_error from the committed tools/wire_bound.py artifact."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "wire_bound.json")) as f:
            return json.load(f).get("wire_model_error")
    except Exception:  # noqa: BLE001 - optional artifact
        return None


def _train_bench_fields() -> dict | None:
    """Headline training rows from the committed tools/bench_train.py
    artifact (TRAIN_BENCH.json), measured offline on the real chip — the
    driver-captured line carries the train numbers too (VERDICT r4 #4).
    Training is not re-measured inside the serving bench's budget."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "TRAIN_BENCH.json")) as f:
            tb = json.load(f)
    except Exception:  # noqa: BLE001 - optional artifact
        return None
    rows = {k: v for k, v in tb.items() if k != "note"}
    return rows or None


def _assemble(partial: dict) -> dict:
    """Build the one-line JSON from whatever has been measured.  Usable both
    on the happy path (everything present) and from the SIGALRM emitter."""
    dit1 = partial.get("dit1")
    if dit1 is None:
        return {
            "metric": "estimated sec/edit, 720p, 8-step distilled, v5e-8",
            "value": None, "unit": "s", "vs_baseline": None, "partial": True,
            "detail": {"error": "no single-chip measurement completed "
                                "within the bench budget",
                       "elapsed_s": round(time.monotonic() - _T0, 1)},
        }

    # stages may record None on failure — fall back past both absent and None
    vae = partial.get("vae") or {"encode_s": 0.35, "decode_s": 0.25}
    comm = partial.get("comm", {})
    feasibility = partial.get("feasibility", {})
    edit_mesh = partial.get("edit_mesh")
    int8_mesh = partial.get("int8_mesh")
    reason_mesh = partial.get("reason_mesh")
    edit_cands = partial.get("edit_cands", {})
    reason_cands = partial.get("reason_cands", {})
    comm_edit = edit_cands.get(edit_mesh)
    comm_int8 = partial.get("comm_int8")
    if comm_int8 is None:
        comm_int8 = edit_cands.get(int8_mesh, comm_edit)
    comm_reason = reason_cands.get(reason_mesh)
    comm_vae = partial.get("comm_vae", 0.0)

    vae_1chip = vae["encode_s"] + vae["decode_s"]
    vae_8chip = vae_1chip / N_CHIPS_TARGET + comm_vae

    def estimate(dit, steps, comm_s):
        if dit is None:
            return None
        step_compute = (40 * dit["per_block_s"] + dit["overhead_s"]) / N_CHIPS_TARGET
        if comm_s is None:
            comm_s = step_compute * 0.15  # fallback: asserted penalty
        return steps * (step_compute + comm_s) + vae_8chip

    dit1_q = partial.get("dit1_q")
    dit1_q4 = partial.get("dit1_q4")
    dit2 = partial.get("dit2")
    dit_r = partial.get("dit_r")
    dit_r_q = partial.get("dit_r_q")
    e2e = partial.get("e2e")
    e2e_int8 = partial.get("e2e_int8")
    e2e_int8_c = partial.get("e2e_int8_cached")
    e2e_int4 = partial.get("e2e_int4_40")
    e2e_int4_c = partial.get("e2e_int4_40_cached")
    e2e_int4a8 = partial.get("e2e_int4a8_40")
    e2e_int4a8_c = partial.get("e2e_int4a8_40_cached")
    e2e_mixed = partial.get("e2e_mixed_40")
    e2e_mixed_c = partial.get("e2e_mixed_40_cached")
    dit1_q4a8 = partial.get("dit1_q4a8")
    e2e_int4_8 = partial.get("e2e_int4_8")
    e2e_reason = partial.get("e2e_reason")
    e2e_reason_c = partial.get("e2e_reason_cached")
    e2e_reason_a8 = partial.get("e2e_reason_a8")
    e2e_reason_a8_c = partial.get("e2e_reason_a8_cached")

    # VERDICT r3 #3: calibrate the depth-extrapolation model. Predict the
    # full-depth int4 e2e exactly the way the bf16 40-layer estimate is
    # produced (shallow e2e + per-block time x added layers), then compare
    # with the measurement. measured/predicted near 1.0 validates every
    # remaining extrapolated field; the ratio is reported either way.
    extrap_err = None
    e2e_int4_pred = None
    if e2e_int4_8 is not None and dit1_q4 is not None:
        e2e_int4_pred = (e2e_int4_8["measured_s"]
                         + DENOISE_STEPS * (40 - e2e_int4_8["layers"])
                         * dit1_q4["per_block_s"])
        if e2e_int4 is not None:
            extrap_err = e2e_int4["measured_s"] / e2e_int4_pred

    total = estimate(dit1, DENOISE_STEPS, comm_edit)
    total_int8 = estimate(dit1_q, DENOISE_STEPS, comm_int8)
    total_cfg50 = estimate(dit2, 50, comm_edit)
    total_b2 = estimate(dit2, DENOISE_STEPS,
                        None if comm_edit is None else 2 * comm_edit)
    throughput_b2 = (None if total_b2 is None
                     else 2.0 / (total_b2 + vae_8chip))
    total_reason50 = estimate(dit_r, 50, comm_reason)
    # int8 reasoning reuses the bf16-measured reasoning collectives: the
    # collectives carry activations, not weights, and the edit-mode
    # measurement proved the quantized program's bytes are byte-identical
    # (collective_bytes_edit_fwd_int8 == bf16 on every mesh walked)
    total_reason50_int8 = estimate(dit_r_q, 50, comm_reason)

    # accelerated reasoning recipe (VERDICT r3 #4): the MEASURED 1-chip
    # cached-vs-uncached reasoning delta at depth L, scaled by the 40-layer
    # recipe's cached-block span and by steps (the saving is per-cached-
    # block per-step), spread across chips; wire time unchanged
    # (conservative — reuse steps move fewer bytes too). Only derived when
    # both runs measured the SAME depth (the cached probe may land
    # shallower if the cache carry tips HBM).
    _RECIPE_SPAN_40 = 24

    def _cache_saving_40(uncached, cached):
        span = cached["cache_blocks"][1] - cached["cache_blocks"][0]
        return ((uncached["measured_s"] - cached["measured_s"])
                * _RECIPE_SPAN_40 / max(span, 1))

    total_reason50_int8_cached = None
    if (total_reason50_int8 is not None and e2e_reason is not None
            and e2e_reason_c is not None
            and e2e_reason["layers"] == e2e_reason_c["layers"]):
        saving = (_cache_saving_40(e2e_reason, e2e_reason_c)
                  * (50 / DENOISE_STEPS))
        total_reason50_int8_cached = (total_reason50_int8
                                      - saving / N_CHIPS_TARGET)

    e2e_40_1chip = None
    if e2e is not None:
        block_part = DENOISE_STEPS * e2e["layers"] * dit1["per_block_s"]
        e2e_40_1chip = (e2e["measured_s"] - block_part
                        + DENOISE_STEPS * 40 * dit1["per_block_s"])

    # serving estimate with the Δ-DiT block cache engaged: the measured
    # 1-chip cached-vs-uncached delta at depth L is proportional to the
    # number of CACHED blocks, not the depth (round-4 review: at shallow L
    # the middle-60% recipe caches a higher fraction, so scaling by 40/L
    # overstated the saving by up to 25%) — scale by the 40-layer recipe's
    # span (blocks 8:32 -> 24) over the measured run's span, and spread the
    # (compute-only) saving over the chips; wire time is left unchanged
    # (conservative: reuse steps actually move fewer bytes too)
    total_int8_cached = None
    if (total_int8 is not None and e2e_int8 is not None
            and e2e_int8_c is not None
            and e2e_int8["layers"] == e2e_int8_c["layers"]):
        total_int8_cached = (total_int8
                             - _cache_saving_40(e2e_int8, e2e_int8_c)
                             / N_CHIPS_TARGET)

    def penalty(dit, comm_s):
        if dit is None or comm_s is None:
            return None
        step_compute = (40 * dit["per_block_s"] + dit["overhead_s"]) / N_CHIPS_TARGET
        return round(1 + comm_s / step_compute, 3)

    def r(v, nd=4):
        return None if v is None else round(v, nd)

    hlo_edit = comm.get(("edit", edit_mesh)) if edit_mesh else None
    hlo_reason = comm.get(("reason", reason_mesh)) if reason_mesh else None
    hlo_vae = comm.get(("vae", "tensor=8"))

    detail = {
        "device": partial.get("device"),
        "dit_block_s_1chip_b1": r(dit1["per_block_s"], 5),
        "dit_block_s_1chip_b1_int8": r(dit1_q and dit1_q["per_block_s"], 5),
        "est_sec_per_edit_int8_serving": r(total_int8, 3),
        "dit_block_s_1chip_b2_cfg": r(dit2 and dit2["per_block_s"], 5),
        "dit_block_s_1chip_b2_reasoning28k": r(dit_r and dit_r["per_block_s"], 5),
        "dit_block_s_1chip_b2_reasoning28k_int8": r(
            dit_r_q and dit_r_q["per_block_s"], 5),
        "est_sec_per_edit_50step_cfg": r(total_cfg50, 3),
        "est_edits_per_s_batch2_distilled": r(throughput_b2, 3),
        "est_sec_per_edit_50step_reasoning": r(total_reason50, 3),
        "est_sec_per_edit_50step_reasoning_int8": r(total_reason50_int8, 3),
        # measured 1-chip reasoning e2e (8-step distilled, 28.8k tokens,
        # int8, reasoning steps = all) and the block-cache-accelerated
        # variant; the delta calibrates the 50-step serving estimate
        "e2e_measured_s_1chip_reasoning": r(
            e2e_reason and e2e_reason["measured_s"], 3),
        "e2e_reasoning_layers": e2e_reason and e2e_reason["layers"],
        "e2e_measured_s_1chip_reasoning_blockcache": r(
            e2e_reason_c and e2e_reason_c["measured_s"], 3),
        "est_sec_per_edit_50step_reasoning_int8_blockcache": r(
            total_reason50_int8_cached, 3),
        # w4a8 reasoning (round 4): int4 storage frees ~0.28 GB/layer of
        # weight HBM vs int8, buying extra measured depth in the
        # activation-dominated 28.8k-token regime (quality gate:
        # tests/test_quant.py::test_int4_a8_pipeline_psnr_gate)
        "e2e_measured_s_1chip_reasoning_int4a8": r(
            e2e_reason_a8 and e2e_reason_a8["measured_s"], 3),
        "e2e_reasoning_int4a8_layers": (
            e2e_reason_a8 and e2e_reason_a8["layers"]),
        "e2e_measured_s_1chip_reasoning_int4a8_blockcache": r(
            e2e_reason_a8_c and e2e_reason_a8_c["measured_s"], 3),
        "e2e_measured_s_1chip_8layer_bf16": r(e2e and e2e["measured_s"], 3),
        "e2e_est_s_1chip_40layer_bf16_extrapolated": r(e2e_40_1chip, 3),
        # round-3: MEASURED, not extrapolated (VERDICT #2) — full 8-step
        # 720p pipeline at the stated depth with int8 projections, one chip
        "e2e_measured_s_1chip_int8": r(e2e_int8 and e2e_int8["measured_s"], 3),
        "e2e_measured_int8_layers": e2e_int8 and e2e_int8["layers"],
        # FULL 40-layer model on one chip via w4a16 grouped int4 (~9.1 GB
        # weights) — the flagship depth MEASURED, and the zero-collective
        # throughput recipe: one replica per chip, 8 requests in flight
        "e2e_measured_s_1chip_40layer_int4": r(
            e2e_int4 and e2e_int4["measured_s"], 3),
        "est_edits_per_s_v5e8_int4_replicated": r(
            e2e_int4 and N_CHIPS_TARGET / e2e_int4["measured_s"], 3),
        # int4 + Δ-cache on the full model: best single-chip throughput
        # recipe (quality gate: tests/test_quant.py int4+cache PSNR)
        "e2e_measured_s_1chip_40layer_int4_blockcache": r(
            e2e_int4_c and e2e_int4_c["measured_s"], 3),
        "est_edits_per_s_v5e8_int4_cached_replicated": r(
            e2e_int4_c and N_CHIPS_TARGET / e2e_int4_c["measured_s"], 3),
        # w4a8 (round 4): int4 storage, per-column-int8 requantized compute
        # — full depth on one chip at ~w8a8 block speed (quality gate:
        # tests/test_quant.py::test_int4_a8_pipeline_psnr_gate)
        "e2e_measured_s_1chip_40layer_int4a8": r(
            e2e_int4a8 and e2e_int4a8["measured_s"], 3),
        "e2e_measured_s_1chip_40layer_int4a8_blockcache": r(
            e2e_int4a8_c and e2e_int4a8_c["measured_s"], 3),
        "est_edits_per_s_v5e8_int4a8_replicated": r(
            e2e_int4a8 and N_CHIPS_TARGET / e2e_int4a8["measured_s"], 3),
        "est_edits_per_s_v5e8_int4a8_cached_replicated": r(
            e2e_int4a8_c and N_CHIPS_TARGET / e2e_int4a8_c["measured_s"], 3),
        # round-5 fidelity flagship: w4a8 + measured-sensitivity int8
        # upgrades (quant.INT4_MIXED_UPGRADE), the full 14B on one chip at a
        # >=30 dB pipeline gate (tests/test_quant.py mixed gate)
        "e2e_measured_s_1chip_40layer_mixed": r(
            e2e_mixed and e2e_mixed["measured_s"], 3),
        "e2e_measured_s_1chip_40layer_mixed_blockcache": r(
            e2e_mixed_c and e2e_mixed_c["measured_s"], 3),
        "est_edits_per_s_v5e8_mixed_cached_replicated": r(
            e2e_mixed_c and N_CHIPS_TARGET / e2e_mixed_c["measured_s"], 3),
        "dit_block_s_1chip_b1_int4a8": r(
            dit1_q4a8 and dit1_q4a8["per_block_s"], 5),
        # extrapolation-model calibration (VERDICT r3 #3): full-depth int4
        # prediction from the shallow int4 e2e + per-block scaling, and the
        # measured/predicted ratio (1.0 = the scaling model is exact)
        "e2e_measured_s_1chip_int4_shallow": r(
            e2e_int4_8 and e2e_int4_8["measured_s"], 3),
        "e2e_int4_shallow_layers": e2e_int4_8 and e2e_int4_8["layers"],
        "dit_block_s_1chip_b1_int4": r(dit1_q4 and dit1_q4["per_block_s"], 5),
        "e2e_predicted_s_1chip_40layer_int4": r(e2e_int4_pred, 3),
        "extrapolation_error": r(extrap_err, 3),
        # Δ-DiT block cache engaged (middle 60% of blocks, period 2) at the
        # same depth — measured speedup for SERVING.md lever #4
        "e2e_measured_s_1chip_int8_blockcache": r(
            e2e_int8_c and e2e_int8_c["measured_s"], 3),
        "blockcache": e2e_int8_c and {
            "blocks": e2e_int8_c["cache_blocks"],
            "period": e2e_int8_c["cache_period"]},
        # derived: int8 serving with the cache's measured compute saving
        # scaled to 40 layers and divided across chips (wire unchanged)
        "est_sec_per_edit_int8_blockcache_serving": r(total_int8_cached, 3),
        "vae_encode_s": r(vae["encode_s"]),
        "vae_decode_s": r(vae["decode_s"]),
        "edit_mesh": edit_mesh,
        "int8_mesh": int8_mesh,
        "reasoning_mesh": reason_mesh,
        "serving_feasible_by_mesh": feasibility,
        "edit_step_overhead_s_by_mesh": edit_cands,
        "int8_step_overhead_s": r(comm_int8, 4),
        "reasoning_step_overhead_s_by_mesh": reason_cands,
        "collective_bytes_edit_fwd": hlo_edit and hlo_edit["collective_bytes"],
        "collective_bytes_edit_fwd_int8": (
            partial.get("hlo_int8") and partial["hlo_int8"]["collective_bytes"]),
        "collective_bytes_reasoning_fwd": (
            hlo_reason and hlo_reason["collective_bytes"]),
        "collective_bytes_vae_decode": hlo_vae and hlo_vae["collective_bytes"],
        "derived_overhead_penalty_edit": penalty(dit1, comm_edit),
        "derived_overhead_penalty_reasoning": penalty(dit_r, comm_reason),
        "hlo_backend": hlo_edit and hlo_edit.get("backend"),
        # wire-model additivity bound (VERDICT r4 #6): measured offline on
        # the real chip by tools/wire_bound.py (committed wire_bound.json) —
        # chained DiT blocks + HBM stand-ins sized to the deployment
        # wire:compute ratio vs the sum of their standalone times. ~1.0
        # validates the no-overlap additive model; <1 means the serving
        # estimates above are conservative. Does not validate the ICI
        # bandwidth constant itself (v5e hardware spec).
        "wire_model_error": _wire_bound_field(),
        # measured training rows (offline artifact, see _train_bench_fields)
        "train": _train_bench_fields(),
        "elapsed_s": round(time.monotonic() - _T0, 1),
        "assumptions": (
            f"ICI {ICI_BW_PER_CHIP/1e9:.0f} GB/s per chip applied to "
            "HLO-measured per-device collective buffer bytes x ring wire "
            "factors (8-wide; mild upper bound for smaller groups); "
            "hlo_backend tpu-aot = exact v5e SPMD program (fused norms now "
            "shard_mapped in, so no norm correction term); int8 collectives "
            "measured from the quantized program (reasoning int8 reuses the "
            "bf16-measured reasoning bytes — the quantized edit fwd proved "
            "collective bytes are weight-independent)"),
    }
    if partial.get("walk_timed_out"):
        detail["walk_timed_out"] = True
    if not partial.get("complete"):
        detail["partial"] = True
    _merge_history(detail)
    return {
        "metric": ("estimated sec/edit, 720p, 8-step distilled (guidance "
                   "1.0), v5e-8 (1-chip compute + measured collective "
                   "bytes, best deployment mesh)"),
        "value": r(total),
        "unit": "s",
        "vs_baseline": None if total is None else round(TARGET_SEC / total, 3),
        "detail": detail,
    }


def _merge_history(detail: dict) -> None:
    """Fill None detail fields from the previous run's committed detail.

    Provenance stays explicit: every inherited field name is listed in
    ``detail["fields_from_history"]``. Fresh measurements always win; only a
    field this run produced no value for (stage deadline-skipped, failed, or
    infra-flaked) falls back. ``_NO_HISTORY_FIELDS`` (run metadata) never
    inherit."""
    inherited = []
    for k, old in _HISTORY.items():
        if k in _NO_HISTORY_FIELDS or old is None:
            continue
        if detail.get(k) is None:
            detail[k] = old
            inherited.append(k)
    if inherited:
        detail["fields_from_history"] = sorted(inherited)


def _alarm_handler(signum, frame):  # pragma: no cover - last resort
    print("[bench] HARD DEADLINE: emitting partial result", file=sys.stderr)
    _emit(_assemble(PARTIAL))
    _save_cache()
    os._exit(0)


def _watchdog():  # pragma: no cover - last resort
    """Hard-deadline enforcement that survives a HUNG remote call.

    SIGALRM's Python handler only runs when the main interpreter loop
    resumes — a remote-runtime RPC that blocks forever in C (observed
    r5: dit1's compile call futex-waited 13+ min with 4 s of CPU) defers
    it indefinitely and the driver's kill then leaves only the early
    emit. A daemon thread is immune: it emits the best partial line,
    persists the cache, and hard-exits."""
    print("[bench] WATCHDOG DEADLINE (main thread may be hung): emitting "
          "partial result", file=sys.stderr)
    try:
        _emit(_assemble(PARTIAL))
        _save_cache()
    finally:
        os._exit(0)


def main():
    import threading

    signal.signal(signal.SIGALRM, _alarm_handler)
    signal.alarm(int(BUDGET_S) + 60)
    wd = threading.Timer(BUDGET_S + 90, _watchdog)
    wd.daemon = True
    wd.start()

    # scoreboard insurance before any device work (VERDICT r4 #1a)
    _emit_early()

    PARTIAL["device"] = str(jax.devices()[0])

    # ---- AOT walk: starts immediately so the subprocess compiles overlap
    # the single-chip measurements below
    import concurrent.futures as cf

    feasibility: dict[str, dict[str, bool]] = {m: {} for m in MESHES}
    PARTIAL["feasibility"] = feasibility

    def serving_mesh(quantize: bool) -> str | None:
        for m in WALK_ORDER:
            rep = measured_collectives(
                ["--mesh", m, *PIPE_ARGS] + (["--quantize"] if quantize else []),
                aot_only=True, cap=1200)
            feasibility[m]["int8" if quantize else "bf16"] = rep is not None
            if rep is not None:
                return m
        return None

    jobs: dict = {}
    # memory r2: >4 concurrent 14B AOT compiles starve each other
    pool = cf.ThreadPoolExecutor(max_workers=4)
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
    # int8 forward collectives for the int8 serving estimate (advisor r2:
    # bf16 wire bytes overstate the quantized program's)
    f_hlo_int8: dict[str, cf.Future] = {
        m: pool.submit(measured_collectives,
                       ["--mesh", m, "--frames", "2", "--quantize"])
        for m in WALK_ORDER
    }

    # ---- single-chip measurements (priority order; deadline-checked).
    # Each stage is exception-proofed: a stage OOM/fault costs that field,
    # never the JSON line. The flagship measured number — the
    # deepest-fitting int8 pipeline on one chip — runs right after the cheap
    # stages it pairs with, BEFORE the secondary estimates (a cold 20-layer
    # compile is ~10 min; leaving it last is how it gets squeezed out of the
    # budget).
    def stage(name, fn, *a, min_remaining=0.0, **kw):
        if _remaining() < min_remaining:
            print(f"[bench] skipping {name} (deadline)", file=sys.stderr)
            return None
        t_stage = time.monotonic()
        try:
            res = fn(*a, **kw)
            print(f"[bench] stage {name}: "
                  f"{time.monotonic() - t_stage:.0f}s", file=sys.stderr)
            return res
        except Exception as e:  # noqa: BLE001 - the line must still print
            print(f"[bench] stage {name} failed after "
                  f"{time.monotonic() - t_stage:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
        # release OUTSIDE the except block: inside it, e.__traceback__ pins
        # the failed call's frames — including a probe's multi-GB on-device
        # param tree — so clear_caches+gc there frees nothing and every
        # later stage inherits a poisoned chip (r4 rehearsal: one leaked
        # 24-layer int8 init cascaded into 9 spurious stage OOMs and false
        # 'infeasible' cache entries for programs PROVEN to fit)
        _release_device_memory()
        return None

    PARTIAL["dit1"] = stage("dit1", bench_dit_block_ms, batch=1)
    _emit_progress()
    PARTIAL["dit1_q"] = stage("dit1_q", bench_dit_block_ms, batch=1,
                              quantize=True)
    _release_device_memory()
    PARTIAL["vae"] = stage("vae", bench_vae_s)
    _emit_progress()
    PARTIAL["e2e_int8"] = stage("e2e_int8", bench_e2e_int8_deepest)
    _emit_progress()
    # serving lever: Δ-DiT block cache at the measured int8 depth — middle
    # 60% of blocks reuse their cached token delta on odd steps. Runs
    # IMMEDIATELY after the int8 e2e it extends (same depth, warm VAE/embed
    # programs): r3 rehearsal showed leaving it last gets it deadline-cut.
    e2e_int8 = PARTIAL.get("e2e_int8")
    if e2e_int8:
        L = e2e_int8["layers"]
        PARTIAL["e2e_int8_cached"] = stage(
            "e2e_int8_cached", bench_e2e_pipeline_s, layers=L, quantize=True,
            cache=((L // 5, L - L // 5), 2), min_remaining=300)
    # flagship MEASURED number: the FULL 40-layer model on one chip (int4
    # w4a16 capacity path) — no extrapolation, no collectives; also the
    # throughput recipe (replicate per chip, 8 independent requests/v5e-8)
    PARTIAL["e2e_int4_40"] = stage("e2e_int4_40", bench_e2e_int4_full,
                                   min_remaining=480)
    _emit_progress()
    _release_device_memory()
    # int4 + Δ-cache composition: the best single-chip throughput recipe
    # (full model resident, cache trims the 40-block compute)
    if PARTIAL.get("e2e_int4_40"):
        PARTIAL["e2e_int4_40_cached"] = stage(
            "e2e_int4_40_cached", bench_e2e_pipeline_s, layers=40,
            quantize="int4", cache=((8, 32), 2), min_remaining=480)
    _release_device_memory()
    # w4a8 (round 4): int4 storage requantized per layer to per-column int8
    # compute — the full 40-layer model on one chip at ~w8a8 block speed.
    # Expected to supersede w4a16 as the single-chip flagship.
    PARTIAL["e2e_int4a8_40"] = stage(
        "e2e_int4a8_40", bench_e2e_int4_full, mode="int4_a8",
        min_remaining=480)
    _emit_progress()
    _release_device_memory()
    if PARTIAL.get("e2e_int4a8_40"):
        PARTIAL["e2e_int4a8_40_cached"] = stage(
            "e2e_int4a8_40_cached", bench_e2e_pipeline_s, layers=40,
            quantize="int4_a8", cache=((8, 32), 2), min_remaining=420)
    _emit_progress()
    _release_device_memory()
    # round-5 fidelity flagship: w4a8 + measured-sensitivity int8 upgrades
    # (>=30 dB pipeline gate vs pure int4's 28.5) — +1.18 GB of weights
    PARTIAL["e2e_mixed_40"] = stage(
        "e2e_mixed_40", bench_e2e_int4_full, mode="int4_a8_mixed",
        min_remaining=420)
    _emit_progress()
    _release_device_memory()
    if PARTIAL.get("e2e_mixed_40"):
        PARTIAL["e2e_mixed_40_cached"] = stage(
            "e2e_mixed_40_cached", bench_e2e_pipeline_s, layers=40,
            quantize="int4_a8_mixed", cache=((8, 32), 2), min_remaining=360)
    _emit_progress()
    _release_device_memory()
    # measured accelerated reasoning (VERDICT r3 #4): the 28.8k-token
    # trajectory e2e with int8 projections, then the same depth with the
    # Δ-DiT block cache — the cached/uncached delta calibrates the 50-step
    # reasoning serving estimate
    PARTIAL["e2e_reason"] = stage("e2e_reason", bench_e2e_reasoning_deepest,
                                  min_remaining=480)
    _emit_progress()
    if PARTIAL.get("e2e_reason"):
        PARTIAL["e2e_reason_cached"] = stage(
            "e2e_reason_cached", bench_e2e_reasoning_deepest, cache=True,
            min_remaining=360)
    _release_device_memory()
    # w4a8 reasoning (round 4): int4 storage frees ~0.28 GB/layer of weight
    # HBM vs int8, so the measured reasoning depth climbs toward full model
    PARTIAL["e2e_reason_a8"] = stage(
        "e2e_reason_a8", bench_e2e_reasoning_deepest, mode="int4_a8",
        min_remaining=480)
    _emit_progress()
    if PARTIAL.get("e2e_reason_a8"):
        PARTIAL["e2e_reason_a8_cached"] = stage(
            "e2e_reason_a8_cached", bench_e2e_reasoning_deepest, cache=True,
            mode="int4_a8", min_remaining=360)
    _emit_progress()
    _release_device_memory()
    # extrapolation-model calibration inputs (VERDICT r3 #3): a shallow int4
    # e2e + the int4 per-block time let _assemble predict the 40-layer run
    # the way every extrapolated field is produced, and report the ratio
    PARTIAL["dit1_q4"] = stage("dit1_q4", bench_dit_block_ms, batch=1,
                               quantize="int4", min_remaining=360)
    PARTIAL["dit1_q4a8"] = stage("dit1_q4a8", bench_dit_block_ms, batch=1,
                                 quantize="int4_a8", min_remaining=330)
    if PARTIAL.get("e2e_int4_40"):
        PARTIAL["e2e_int4_8"] = stage(
            "e2e_int4_8", bench_e2e_pipeline_s, layers=8, quantize="int4",
            min_remaining=360)
    _release_device_memory()
    PARTIAL["e2e"] = stage("e2e", bench_e2e_pipeline_s, min_remaining=240)
    _emit_progress()
    PARTIAL["dit2"] = stage("dit2", bench_dit_block_ms, batch=2,
                            min_remaining=300)
    PARTIAL["dit_r"] = stage("dit_r", bench_dit_block_ms, batch=2, frames=8,
                             iters=2, min_remaining=300)
    PARTIAL["dit_r_q"] = stage("dit_r_q", bench_dit_block_ms, batch=2,
                               frames=8, iters=2, quantize=True,
                               min_remaining=300)
    _emit_progress()

    # ---- gather the walk within what's left of the budget
    walk_deadline = max(_remaining() - 30, 0)
    done, not_done = cf.wait(
        list(jobs.values()) + [f_bf16, f_int8] + list(f_hlo_int8.values()),
        timeout=walk_deadline)
    PARTIAL["walk_timed_out"] = bool(not_done)

    def _res(fut, default=None):
        return fut.result(timeout=0) if fut in done else default

    comm = {k: _res(f) for k, f in jobs.items()}
    PARTIAL["comm"] = comm

    def best(kind):
        cands = {}
        for m in MESHES:
            s = wire_seconds(comm.get((kind, m)))
            if s is not None:
                cands[m] = round(s, 4)
        if not cands:
            return None, {}
        return min(cands, key=cands.get), cands

    edit_mesh0, edit_cands = best("edit")
    reason_mesh, reason_cands = best("reason")
    PARTIAL["edit_cands"] = edit_cands
    PARTIAL["reason_cands"] = reason_cands
    PARTIAL["reason_mesh"] = reason_mesh

    edit_mesh = _res(f_bf16) or edit_mesh0
    int8_mesh = _res(f_int8) or edit_mesh
    PARTIAL["edit_mesh"] = edit_mesh
    PARTIAL["int8_mesh"] = int8_mesh
    hlo_int8 = _res(f_hlo_int8[int8_mesh]) if int8_mesh in f_hlo_int8 else None
    PARTIAL["hlo_int8"] = hlo_int8
    PARTIAL["comm_int8"] = wire_seconds(hlo_int8)
    PARTIAL["comm_vae"] = wire_seconds(comm.get(("vae", "tensor=8"))) or 0.0
    PARTIAL["complete"] = not not_done

    signal.alarm(0)
    _emit(_assemble(PARTIAL))
    _save_cache()
    os._exit(0)


if __name__ == "__main__":
    main()
