"""Measure bench stages the serving bench's budget cannot reach.

The in-budget bench spends ~1250 s on the warm priority stages (dit1's
14B init + compile alone is ~340 s; int4 packing ~650 s), so stages late
in the order — notably the round-5 fidelity flagship ``e2e_mixed_40``
(w4a8 + measured-sensitivity int8 upgrades, >=30 dB gate) — never get
chip time inside the 1500 s budget. This tool runs the SAME bench stage
functions outside that budget and writes the results into
BENCH_DETAIL.json under the exact field names the bench uses, so
subsequent bench runs (including the driver's) inherit them via the
fields_from_history mechanism with honest provenance.

Run on the real chip with nothing else using it:

    CHRONOEDIT_BENCH_BUDGET_S=7200 python tools/measure_offline.py [stage...]

Stages: mixed (default), int4a8, int4_cached, shallow_calib
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("CHRONOEDIT_BENCH_BUDGET_S", "7200")

import bench  # noqa: E402

N = bench.N_CHIPS_TARGET


def _patch_detail(fields: dict) -> None:
    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL.json")
    with open(path) as f:
        doc = json.load(f)
    det = doc.setdefault("detail", {})
    fresh = {k: v for k, v in fields.items() if v is not None}
    det.update(fresh)
    # these are now direct measurements, not inherited values
    hist = [k for k in det.get("fields_from_history", [])
            if k not in fresh]
    if hist:
        det["fields_from_history"] = hist
    else:
        det.pop("fields_from_history", None)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"[offline] BENCH_DETAIL.json updated: {sorted(fresh)}")


def stage_mixed() -> None:
    res = bench.bench_e2e_int4_full(mode="int4_a8_mixed")
    bench._save_cache()
    bench._release_device_memory()
    fields = {"e2e_measured_s_1chip_40layer_mixed":
              res and round(res["measured_s"], 3)}
    if res:
        cached = bench.bench_e2e_pipeline_s(
            layers=40, quantize="int4_a8_mixed", cache=((8, 32), 2))
        bench._release_device_memory()
        fields["e2e_measured_s_1chip_40layer_mixed_blockcache"] = round(
            cached["measured_s"], 3)
        fields["est_edits_per_s_v5e8_mixed_cached_replicated"] = round(
            N / cached["measured_s"], 3)
    _patch_detail(fields)


def stage_mixed2() -> None:
    """Round-5 over-the-bar recipe: w4a8 + INT4_MIXED2_UPGRADE (35.7 dB
    tiny-pipe gate vs the 35 dB BASELINE bar), ~12.3 GB of weights."""
    res = bench.bench_e2e_int4_full(mode="int4_a8_mixed2")
    bench._save_cache()
    bench._release_device_memory()
    fields = {"e2e_measured_s_1chip_40layer_mixed2":
              res and round(res["measured_s"], 3),
              "est_edits_per_s_v5e8_mixed2_replicated":
              res and round(N / res["measured_s"], 3)}
    _patch_detail(fields)


def stage_int4a8() -> None:
    res = bench.bench_e2e_int4_full(mode="int4_a8")
    bench._save_cache()
    bench._release_device_memory()
    fields = {"e2e_measured_s_1chip_40layer_int4a8":
              res and round(res["measured_s"], 3),
              "est_edits_per_s_v5e8_int4a8_replicated":
              res and round(N / res["measured_s"], 3)}
    if res:
        cached = bench.bench_e2e_pipeline_s(
            layers=40, quantize="int4_a8", cache=((8, 32), 2))
        bench._release_device_memory()
        fields["e2e_measured_s_1chip_40layer_int4a8_blockcache"] = round(
            cached["measured_s"], 3)
        fields["est_edits_per_s_v5e8_int4a8_cached_replicated"] = round(
            N / cached["measured_s"], 3)
    _patch_detail(fields)


def stage_int4_cached() -> None:
    cached = bench.bench_e2e_pipeline_s(layers=40, quantize="int4",
                                        cache=((8, 32), 2))
    bench._release_device_memory()
    _patch_detail({
        "e2e_measured_s_1chip_40layer_int4_blockcache":
        round(cached["measured_s"], 3),
        "est_edits_per_s_v5e8_int4_cached_replicated":
        round(N / cached["measured_s"], 3)})


def stage_shallow_calib() -> None:
    """Extrapolation-model inputs: shallow int4 e2e + int4/int4a8 block."""
    q4 = bench.bench_dit_block_ms(batch=1, quantize="int4")
    bench._release_device_memory()
    q4a8 = bench.bench_dit_block_ms(batch=1, quantize="int4_a8")
    bench._release_device_memory()
    e8 = bench.bench_e2e_pipeline_s(layers=8, quantize="int4")
    bench._release_device_memory()
    with open(os.path.join(os.path.dirname(bench.__file__),
                           "BENCH_DETAIL.json")) as f:
        full40 = json.load(f)["detail"].get(
            "e2e_measured_s_1chip_40layer_int4")
    pred = (e8["measured_s"]
            + bench.DENOISE_STEPS * (40 - e8["layers"]) * q4["per_block_s"])
    _patch_detail({
        "dit_block_s_1chip_b1_int4": round(q4["per_block_s"], 5),
        "dit_block_s_1chip_b1_int4a8": round(q4a8["per_block_s"], 5),
        "e2e_measured_s_1chip_int4_shallow": round(e8["measured_s"], 3),
        "e2e_int4_shallow_layers": e8["layers"],
        "e2e_predicted_s_1chip_40layer_int4": round(pred, 3),
        "extrapolation_error":
        None if full40 is None else round(full40 / pred, 3)})


STAGES = {"mixed": stage_mixed, "mixed2": stage_mixed2,
          "int4a8": stage_int4a8, "int4_cached": stage_int4_cached,
          "shallow_calib": stage_shallow_calib}


def main() -> None:
    names = sys.argv[1:] or ["mixed"]
    for n in names:
        print(f"[offline] running stage {n}")
        STAGES[n]()
    print("[offline] done")


if __name__ == "__main__":
    main()
