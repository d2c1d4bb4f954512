"""Per-projection int4 sensitivity at tiny pipeline geometry (round 5).

For each quantizable projection, run the tiny pipeline with ONLY that
projection at int4 (others bf16) and report the pipeline PSNR vs the bf16
reference. Linear error propagation makes per-projection MSE contributions
approximately additive, so these measurements let us pick the cheapest
``upgrade`` set (projections promoted to w8a8 int8 inside the int4
pipeline) that clears a target PSNR within the 14B byte budget:

    bytes(upgrade P at 14B) = params(P)/2 per layer   (int8 - int4)

Run on CPU:  JAX_PLATFORMS=cpu python tools/exp_quant_sensitivity.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from chronoedit_tpu.ops.quant import _BLOCK_LINEARS_INT4  # noqa: E402


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf"), 0.0
    peak = float(np.abs(b).max())
    return 10 * np.log10(peak * peak / mse), mse


# 14B per-layer param counts (dim 5120, ffn 13824, image_dim 1280), for the
# byte cost of upgrading a projection from int4 (0.5 B) to int8 (1 B)
_P14B = {
    ("self_attn", "q"): 5120 * 5120, ("self_attn", "k"): 5120 * 5120,
    ("self_attn", "v"): 5120 * 5120, ("self_attn", "o"): 5120 * 5120,
    ("cross_attn", "q"): 5120 * 5120, ("cross_attn", "o"): 5120 * 5120,
    ("cross_attn", "k"): 5120 * 5120, ("cross_attn", "v"): 5120 * 5120,
    ("cross_attn", "k_img"): 1280 * 5120, ("cross_attn", "v_img"): 1280 * 5120,
    ("ffn", "fc1"): 5120 * 13824, ("ffn", "fc2"): 13824 * 5120,
}


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.test_quant import _tiny_pipe_run

    mode = sys.argv[1] if len(sys.argv) > 1 else "int4"
    ref = _tiny_pipe_run(quantize=False)

    rows = []
    for proj in _BLOCK_LINEARS_INT4:
        skip = tuple(p for p in _BLOCK_LINEARS_INT4 if p != proj)
        out = _tiny_pipe_run(quantize=mode, skip=skip)
        db, mse = psnr(out, ref)
        gb40 = _P14B[proj] * 0.5 * 40 / 1e9
        rows.append((proj, db, mse, gb40))
        print(f"{proj[0]:>10s}.{proj[1]:<6s} only: {db:6.2f} dB  "
              f"mse={mse:.3e}  int8-upgrade cost @14Bx40: +{gb40:.2f} GB",
              flush=True)

    total_mse = sum(r[2] for r in rows)
    peak = float(np.abs(ref).max())
    pred_db = 10 * np.log10(peak * peak / total_mse)
    full = _tiny_pipe_run(quantize=mode)
    full_db, full_mse = psnr(full, ref)
    print(f"\nadditivity check ({mode}): predicted {pred_db:.2f} dB "
          f"(sum of per-proj MSE) vs measured {full_db:.2f} dB")

    # greedy: upgrade projections by MSE-per-byte until the predicted PSNR
    # clears 30 dB
    rows.sort(key=lambda r: -r[2] / r[3])
    mse_left, spent, chosen = total_mse, 0.0, []
    print("\ngreedy upgrade order (mse/GB):")
    for proj, db, mse, gb in rows:
        chosen.append(proj)
        mse_left -= mse
        spent += gb
        pred = 10 * np.log10(peak * peak / max(mse_left, 1e-30))
        print(f"  +{proj[0]}.{proj[1]:<6s} -> pred {pred:6.2f} dB, "
              f"+{spent:.2f} GB total", flush=True)

    # verify the cheapest set that predicted >= 30 dB, by measurement
    mse_left, chosen = total_mse, []
    for proj, db, mse, gb in rows:
        chosen.append(proj)
        mse_left -= mse
        if 10 * np.log10(peak * peak / max(mse_left, 1e-30)) >= 30.0:
            break
    out = _tiny_pipe_run(quantize=mode, upgrade=tuple(chosen))
    db, _ = psnr(out, ref)
    print(f"\nmeasured with upgrade={chosen}: {db:.2f} dB")


if __name__ == "__main__":
    main()
