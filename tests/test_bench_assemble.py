"""bench._assemble: the one-line JSON must be derivable from any partial
measurement state (VERDICT r2 #1 — the bench may never fail to emit)."""

import sys

import pytest

sys.path.insert(0, ".")
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _no_history(monkeypatch):
    """Keep the repo's real BENCH_DETAIL.json out of every test: the
    history merge (round 5) would otherwise fill fields these tests assert
    stay None. Tests of the merge itself set bench._HISTORY explicitly."""
    monkeypatch.setattr(bench, "_HISTORY", {})


def test_assemble_with_no_measurements_is_partial():
    out = bench._assemble({})
    assert out["value"] is None and out["vs_baseline"] is None
    assert out["partial"] is True
    assert "error" in out["detail"]


def _full_partial():
    return {
        "device": "TPU v5 lite0",
        "dit1": {"per_block_s": 0.040, "overhead_s": 0.010, "readback_s": 0.0},
        "dit1_q": {"per_block_s": 0.027, "overhead_s": 0.010, "readback_s": 0.0},
        "vae": {"encode_s": 0.40, "decode_s": 0.64},
        "e2e_int8": {"layers": 20, "quantize": True, "measured_s": 5.42},
        "e2e_int8_cached": {"layers": 20, "quantize": True, "measured_s": 4.26,
                            "cache_blocks": [4, 16], "cache_period": 2},
        "edit_mesh": "tensor=4,context=2",
        "int8_mesh": "tensor=2,context=4",
        "edit_cands": {"tensor=4,context=2": 0.1004},
        "comm_int8": 0.0577,
        "comm_vae": 0.001,
        "complete": True,
    }


def test_assemble_estimate_formula():
    out = bench._assemble(_full_partial())
    # steps * ((40*block + overhead)/8 + comm) + vae/8 + comm_vae
    step = (40 * 0.040 + 0.010) / 8
    expect = 8 * (step + 0.1004) + (0.40 + 0.64) / 8 + 0.001
    assert abs(out["value"] - expect) < 1e-3
    assert out["vs_baseline"] == round(5.0 / out["value"], 3)
    assert "partial" not in out["detail"]


def test_assemble_blockcache_serving_derivation():
    d = bench._assemble(_full_partial())["detail"]
    int8 = d["est_sec_per_edit_int8_serving"]
    cached = d["est_sec_per_edit_int8_blockcache_serving"]
    # measured 1-chip saving at 20 layers, scaled to 40, across 8 chips
    assert abs((int8 - cached) - (5.42 - 4.26) * 2 / 8) < 1e-3


def test_assemble_int4_fullmodel_fields():
    p = _full_partial()
    p["e2e_int4_40"] = {"layers": 40, "quantize": "int4", "measured_s": 18.2}
    d = bench._assemble(p)["detail"]
    assert d["e2e_measured_s_1chip_40layer_int4"] == 18.2
    # replicated-serving throughput: 8 independent single-chip replicas
    assert abs(d["est_edits_per_s_v5e8_int4_replicated"] - 8 / 18.2) < 1e-3
    # absent measurement leaves the fields None, never raises
    del p["e2e_int4_40"]
    d = bench._assemble(p)["detail"]
    assert d["e2e_measured_s_1chip_40layer_int4"] is None
    assert d["est_edits_per_s_v5e8_int4_replicated"] is None


def test_assemble_missing_cache_leaves_field_none():
    p = _full_partial()
    del p["e2e_int8_cached"]
    d = bench._assemble(p)["detail"]
    assert d["est_sec_per_edit_int8_blockcache_serving"] is None
    assert d["e2e_measured_s_1chip_int8"] == 5.42


def _maximal_partial():
    """Every field populated — the worst case for the printed line size."""
    p = _full_partial()
    p.update({
        "dit2": {"per_block_s": 0.077, "overhead_s": 0.01, "readback_s": 0.0},
        "dit_r": {"per_block_s": 0.518, "overhead_s": 0.9, "readback_s": 0.0},
        "dit_r_q": {"per_block_s": 0.446, "overhead_s": 0.9, "readback_s": 0.0},
        "dit1_q4": {"per_block_s": 0.031, "overhead_s": 0.01, "readback_s": 0.0},
        "e2e": {"layers": 8, "quantize": False, "measured_s": 3.383},
        "e2e_int4_40": {"layers": 40, "quantize": "int4", "measured_s": 11.2},
        "e2e_mixed_40": {"layers": 40, "quantize": "int4_a8_mixed",
                         "measured_s": 10.9},
        "e2e_mixed_40_cached": {"layers": 40, "quantize": "int4_a8_mixed",
                                "measured_s": 8.4, "cache_blocks": [8, 32],
                                "cache_period": 2},
        "e2e_int4_8": {"layers": 8, "quantize": "int4", "measured_s": 3.1},
        "e2e_reason": {"layers": 20, "quantize": True, "measured_s": 71.0,
                       "reasoning": True},
        "e2e_reason_cached": {"layers": 20, "quantize": True,
                              "measured_s": 58.0, "reasoning": True,
                              "cache_blocks": [4, 16], "cache_period": 2},
        "reason_mesh": "tensor=4,context=2",
        "edit_cands": {"tensor=8": 0.1721, "tensor=4,context=2": 0.1004,
                       "tensor=2,context=4": 0.0577},
        "reason_cands": {"tensor=8": 1.3768, "tensor=4,context=2": 0.8031},
        "feasibility": {"tensor=8": {}, "tensor=4,context=2": {"bf16": True},
                        "tensor=2,context=4": {"bf16": False, "int8": True}},
        "comm": {("edit", "tensor=4,context=2"):
                 {"collective_bytes": 5900091040, "backend": "tpu-aot",
                  "per_op": {}},
                 ("reason", "tensor=4,context=2"):
                 {"collective_bytes": 47199990080, "backend": "tpu-aot",
                  "per_op": {}},
                 ("vae", "tensor=8"):
                 {"collective_bytes": 164905384, "backend": "tpu-aot",
                  "per_op": {}}},
        "hlo_int8": {"collective_bytes": 3726324640, "per_op": {}},
    })
    return p


def test_printed_line_stays_under_driver_capture():
    """BENCH_r02/r03 both lost the scoreboard because the one-line JSON
    outgrew the driver's tail capture. The printed line must stay short for
    ANY measurement state — the full detail goes to BENCH_DETAIL.json."""
    import json

    for p in ({}, _full_partial(), _maximal_partial()):
        line = json.dumps(bench._shorten(bench._assemble(p)))
        assert len(line) < 1500, f"printed line {len(line)}B for state {p.keys()}"


def test_shorten_keeps_scoreboard_fields():
    out = bench._assemble(_maximal_partial())
    line = bench._shorten(out)
    assert line["value"] == out["value"] and line["value"] is not None
    assert line["vs_baseline"] == out["vs_baseline"]
    assert line["unit"] == "s"
    assert line["detail_file"] == "BENCH_DETAIL.json"
    assert line["headline"]["e2e_measured_s_1chip_40layer_int4"] == 11.2
    # partial flag propagates
    short_empty = bench._shorten(bench._assemble({}))
    assert short_empty["partial"] is True


def test_assemble_extrapolation_calibration():
    p = _maximal_partial()
    d = bench._assemble(p)["detail"]
    pred = 3.1 + 8 * 32 * 0.031
    assert abs(d["e2e_predicted_s_1chip_40layer_int4"] - pred) < 1e-3
    assert abs(d["extrapolation_error"] - 11.2 / pred) < 1e-3
    # missing measurement -> ratio None, prediction still reported
    del p["e2e_int4_40"]
    d = bench._assemble(p)["detail"]
    assert d["extrapolation_error"] is None
    assert d["e2e_predicted_s_1chip_40layer_int4"] is not None


def test_assemble_reasoning_blockcache_derivation():
    """round-4 (VERDICT r3 #4): the measured cached-vs-uncached reasoning
    delta at depth L scales by (40/L)*(50/8), spreads over the chips, and
    subtracts from the 50-step int8 reasoning estimate."""
    p = _maximal_partial()
    out = bench._assemble(p)
    d = out["detail"]
    assert d["e2e_measured_s_1chip_reasoning"] == 71.0
    assert d["e2e_reasoning_layers"] == 20
    assert d["e2e_measured_s_1chip_reasoning_blockcache"] == 58.0
    base = d["est_sec_per_edit_50step_reasoning_int8"]
    saving = (71.0 - 58.0) * (40 / 20) * (50 / 8)
    want = base - saving / bench.N_CHIPS_TARGET
    assert abs(d["est_sec_per_edit_50step_reasoning_int8_blockcache"] - want) < 1e-2
    # headline carries the recipe number
    line = bench._shorten(out)
    assert ("est_sec_per_edit_50step_reasoning_int8_blockcache"
            in line["headline"])
    # cached run missing -> derived field None, measured field intact
    del p["e2e_reason_cached"]
    d = bench._assemble(p)["detail"]
    assert d["est_sec_per_edit_50step_reasoning_int8_blockcache"] is None
    assert d["e2e_measured_s_1chip_reasoning"] == 71.0


def test_assemble_int4_blockcache_fields():
    p = _maximal_partial()
    p["e2e_int4_40_cached"] = {"layers": 40, "quantize": "int4",
                               "measured_s": 8.9, "cache_blocks": [8, 32],
                               "cache_period": 2}
    out = bench._assemble(p)
    d = out["detail"]
    assert d["e2e_measured_s_1chip_40layer_int4_blockcache"] == 8.9
    assert abs(d["est_edits_per_s_v5e8_int4_cached_replicated"]
               - 8 / 8.9) < 1e-3
    line = bench._shorten(out)
    assert len(__import__("json").dumps(line)) < 1500
    assert "e2e_measured_s_1chip_40layer_int4_blockcache" in line["headline"]


def test_bench_cache_epoch_matches_tree():
    """VERDICT r4 #1c: a committed bench_cache.json stamped at an older
    FEASIBILITY_EPOCH is dead weight the driver silently ignores — that is
    exactly how BENCH_r04 cold-re-probed every depth ladder and died. Any
    entry carrying feasibility state must match the tree's epoch, making a
    stale cache uncommittable."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                        "bench_cache.json")
    with open(path) as f:
        blob = json.load(f)
    assert blob["version"] == bench._CACHE_VERSION
    for key, entry in blob["entries"].items():
        if isinstance(entry, dict) and ("feasible" in entry or "epoch" in entry):
            assert entry.get("epoch") == bench.FEASIBILITY_EPOCH, (
                f"bench_cache.json entry {key!r} is stamped epoch "
                f"{entry.get('epoch')} but the tree is at "
                f"{bench.FEASIBILITY_EPOCH}; re-run bench.py to re-stamp "
                "(or delete the entry) before committing")


def test_feasibility_entry_epoch_gating(monkeypatch):
    old = bench.FEASIBILITY_EPOCH - 1
    monkeypatch.setattr(bench, "_CACHE", {"k": {"epoch": old, "feasible": 20}})
    assert bench._feasibility_entry("k") == {"epoch": bench.FEASIBILITY_EPOCH}
    monkeypatch.setattr(
        bench, "_CACHE",
        {"k": {"epoch": bench.FEASIBILITY_EPOCH, "feasible": 20}})
    assert bench._feasibility_entry("k")["feasible"] == 20


def test_probe_infra_flake_quarantine(monkeypatch):
    """VERDICT r4 #1b: a remote-compile HTTP 500 is an infra flake, not an
    HBM OOM — one cooldown retry, then skip WITHOUT marking the depth
    infeasible and WITHOUT descending the ladder (each rung is a
    multi-minute 14B compile; r4's driver died exactly this way)."""
    calls = []
    fresh = {}
    monkeypatch.setattr(bench, "_CACHE", fresh)
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    monkeypatch.setattr(bench, "_remaining", lambda: 1e9)
    monkeypatch.setattr(bench, "_release_device_memory", lambda: None)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "quantized_dit_bytes",
                        lambda layers, mode="int8": int(layers * 0.51e9))

    def fake_pipeline(layers, quantize, **kw):
        calls.append(layers)
        raise RuntimeError(
            "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit code 1")

    monkeypatch.setattr(bench, "bench_e2e_pipeline_s", fake_pipeline)
    assert bench.bench_e2e_int8_deepest() is None
    # one depth tried twice (the retry), never descended
    assert calls == [calls[0], calls[0]] and len(calls) == 2
    assert "infeasible" not in fresh.get("int8_e2e_depth", {})


def test_probe_cold_cap_bounds_ladder_descent(monkeypatch):
    """VERDICT r4 #1d: at most _COLD_CAP uncached depths are probed per
    family per run — a fully-invalidated cache can no longer make one run
    re-derive a whole ladder inside the driver's kill window."""
    calls = []
    fresh = {}
    monkeypatch.setattr(bench, "_CACHE", fresh)
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    monkeypatch.setattr(bench, "_remaining", lambda: 1e9)
    monkeypatch.setattr(bench, "_release_device_memory", lambda: None)
    monkeypatch.setattr(bench, "quantized_dit_bytes",
                        lambda layers, mode="int8": int(layers * 0.51e9))

    def fake_pipeline(layers, quantize, **kw):
        calls.append(layers)
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    monkeypatch.setattr(bench, "bench_e2e_pipeline_s", fake_pipeline)
    assert bench.bench_e2e_int8_deepest() is None
    assert len(calls) == bench._COLD_CAP  # descent stops at the cap
    # the genuinely-OOM depths ARE recorded, so the next run resumes deeper
    assert fresh["int8_e2e_depth"]["infeasible"] == sorted(set(calls))


def test_reasoning_probe_w4a8_seeds_deeper_and_keys_per_mode(monkeypatch):
    """round-4: the w4a8 reasoning probe must (a) seed its start depth from
    the int8-known depth's WEIGHT budget (int4 storage frees ~0.28 GB/layer,
    so the start climbs), (b) descend on OOM, and (c) record feasibility
    under its own cache key so int8 history is never clobbered."""
    calls = []
    fresh = {}
    monkeypatch.setattr(bench, "_CACHE", fresh)
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    monkeypatch.setattr(bench, "_remaining", lambda: 1e9)
    monkeypatch.setattr(bench, "_release_device_memory", lambda: None)
    # weight model: int8 ~0.55 GB/layer, w4a8 ~0.23 GB/layer (ratios match
    # the real eval_shape numbers at 14B width)
    monkeypatch.setattr(
        bench, "quantized_dit_bytes",
        lambda layers, mode="int8": int(
            layers * (0.55e9 if mode == "int8" else 0.23e9)))
    int8_entry = bench._feasibility_entry("int8_reason_depth")
    int8_entry["feasible"] = 12
    fresh["int8_reason_depth"] = int8_entry

    def fake_pipeline(layers, quantize, reasoning, cache=None):
        calls.append((layers, quantize))
        if layers > 24:  # chip fits w4a8 reasoning at 24, not 28
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return {"layers": layers, "quantize": quantize, "measured_s": 30.0}

    monkeypatch.setattr(bench, "bench_e2e_pipeline_s", fake_pipeline)
    res = bench.bench_e2e_reasoning_deepest(mode="int4_a8")
    # int8@12 budget = 6.6 GB -> w4a8 start = 28 (28*0.23=6.44 <= 6.6)
    assert calls == [(28, "int4_a8"), (24, "int4_a8")]
    assert res["layers"] == 24
    assert fresh["int4a8_reason_depth"]["feasible"] == 24
    assert fresh["int4a8_reason_depth"]["infeasible"] == [28]
    # int8 history untouched
    assert fresh["int8_reason_depth"]["feasible"] == 12
    # a rerun starts straight at the known depth
    calls.clear()
    assert bench.bench_e2e_reasoning_deepest(mode="int4_a8")["layers"] == 24
    assert calls == [(24, "int4_a8")]


def test_reasoning_probe_climbs_after_first_try_success(monkeypatch):
    """round-4: the weight-budget seed is conservative — when the seeded
    depth succeeds on the first try, the probe must climb +4 toward 40
    instead of leaving deeper depths unexplored. Round-5 refinement
    (VERDICT r4 #1d): each RUN spends at most _COLD_CAP cold probes on the
    family; feasibility persists, so the climb resumes across runs and
    every run starts at the deepest known-good depth."""
    calls = []
    fresh = {}
    monkeypatch.setattr(bench, "_CACHE", fresh)
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    monkeypatch.setattr(bench, "_remaining", lambda: 1e9)
    monkeypatch.setattr(bench, "_release_device_memory", lambda: None)
    monkeypatch.setattr(
        bench, "quantized_dit_bytes",
        lambda layers, mode="int8": int(
            layers * (0.55e9 if mode == "int8" else 0.23e9)))
    int8_entry = bench._feasibility_entry("int8_reason_depth")
    int8_entry["feasible"] = 12
    fresh["int8_reason_depth"] = int8_entry

    def fake_pipeline(layers, quantize, reasoning, cache=None):
        calls.append(layers)
        if layers > 36:  # chip fits w4a8 reasoning up to 36
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return {"layers": layers, "quantize": quantize, "measured_s": 30.0}

    monkeypatch.setattr(bench, "bench_e2e_pipeline_s", fake_pipeline)
    # run 1: seed 28 (cold #1) ok -> climb 32 (cold #2) ok -> cap reached
    res = bench.bench_e2e_reasoning_deepest(mode="int4_a8")
    assert calls == [28, 32]
    assert res["layers"] == 32
    assert fresh["int4a8_reason_depth"]["feasible"] == 32
    # run 2 (fresh cold budget): starts at known 32, climbs 36 ok, 40 OOM
    calls.clear()
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    res = bench.bench_e2e_reasoning_deepest(mode="int4_a8")
    assert calls == [32, 36, 40]
    assert res["layers"] == 36
    assert fresh["int4a8_reason_depth"]["feasible"] == 36
    assert fresh["int4a8_reason_depth"]["infeasible"] == [40]
    # run 3: measures the known depth only; 40 is remembered infeasible
    calls.clear()
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    assert bench.bench_e2e_reasoning_deepest(mode="int4_a8")["layers"] == 36
    assert calls == [36]
    # deadline guard: with little time left the climb is skipped
    calls.clear()
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    fresh.pop("int4a8_reason_depth")
    monkeypatch.setattr(bench, "_remaining", lambda: 600)
    assert bench.bench_e2e_reasoning_deepest(mode="int4_a8")["layers"] == 28
    assert calls == [28]


def test_probe_infra_flake_falls_back_to_known_depth(monkeypatch):
    """round 5: an infra flake at a COLD rung must not null the family —
    the ladder keeps walking down to the known-feasible (warm-compile)
    depth and measures it (r5b regression: one flake at cold 24 left the
    whole int8 row null, including the proven depth 20)."""
    calls = []
    fresh = {"int8_e2e_depth": {"epoch": bench.FEASIBILITY_EPOCH,
                                "feasible": 20}}
    monkeypatch.setattr(bench, "_CACHE", fresh)
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    monkeypatch.setattr(bench, "_remaining", lambda: 1e9)
    monkeypatch.setattr(bench, "_release_device_memory", lambda: None)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "quantized_dit_bytes",
                        lambda layers, mode="int8": int(layers * 0.51e9))

    def fake_pipeline(layers, quantize, **kw):
        calls.append(layers)
        if layers != 20:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
                "tpu_compile_helper subprocess exit code 1")
        return {"layers": layers, "quantize": quantize, "measured_s": 5.4}

    monkeypatch.setattr(bench, "bench_e2e_pipeline_s", fake_pipeline)
    res = bench.bench_e2e_int8_deepest()
    # cold 24 flaked (tried twice), then the warm 20 was still measured
    assert calls == [24, 24, 20]
    assert res["layers"] == 20
    hist = fresh["int8_e2e_depth"]
    assert "infeasible" not in hist  # a flake is not an OOM
    assert hist["infra_flaky"] == {"24": 1}
    assert hist["feasible"] == 20


def test_probe_skips_depth_flaky_across_runs(monkeypatch):
    """round 5: a depth that infra-flaked in >= 2 separate runs at this
    epoch is skipped outright — the deterministic int8@24 compile flake was
    burning two multi-minute attempts in EVERY bench run."""
    calls = []
    fresh = {"int8_e2e_depth": {"epoch": bench.FEASIBILITY_EPOCH,
                                "feasible": 20,
                                "infra_flaky": {"24": 2}}}
    monkeypatch.setattr(bench, "_CACHE", fresh)
    monkeypatch.setattr(bench, "_COLD_PROBES", {})
    monkeypatch.setattr(bench, "_remaining", lambda: 1e9)
    monkeypatch.setattr(bench, "_release_device_memory", lambda: None)
    monkeypatch.setattr(bench, "quantized_dit_bytes",
                        lambda layers, mode="int8": int(layers * 0.51e9))

    def fake_pipeline(layers, quantize, **kw):
        calls.append(layers)
        return {"layers": layers, "quantize": quantize, "measured_s": 5.4}

    monkeypatch.setattr(bench, "bench_e2e_pipeline_s", fake_pipeline)
    res = bench.bench_e2e_int8_deepest()
    assert calls == [20]  # 24 never attempted
    assert res["layers"] == 20


def test_merge_history_fills_skipped_fields_with_provenance(monkeypatch):
    """round 5: a budget-bound run must never regress committed detail to
    null — fields this run produced no value for inherit the previous
    BENCH_DETAIL value and are listed in fields_from_history; fresh
    measurements always win and are never flagged."""
    monkeypatch.setattr(bench, "_HISTORY", {
        "e2e_measured_s_1chip_40layer_int4": 14.739,
        "e2e_measured_s_1chip_int8": 99.0,   # stale; this run re-measured
        "elapsed_s": 1305.2,                 # run metadata: never inherited
        "device": "TPU v5 lite0",
        "fields_from_history": ["e2e_measured_s_1chip_40layer_int4"],
    })
    p = _full_partial()  # measures e2e_int8 fresh, no int4_40 stage
    d = bench._assemble(p)["detail"]
    assert d["e2e_measured_s_1chip_40layer_int4"] == 14.739
    assert d["e2e_measured_s_1chip_int8"] == 5.42  # fresh wins
    assert d["fields_from_history"] == ["e2e_measured_s_1chip_40layer_int4"]
    assert d["elapsed_s"] != 1305.2
