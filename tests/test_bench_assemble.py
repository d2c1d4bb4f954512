"""bench._assemble: the one-line JSON must be derivable from any partial
measurement state (VERDICT r2 #1 — the bench may never fail to emit)."""

import sys

sys.path.insert(0, ".")
import bench  # noqa: E402


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
