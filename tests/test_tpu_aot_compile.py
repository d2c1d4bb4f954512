"""The sharded DiT program must compile for a REAL TPU target.

CPU-mesh tests can't catch Pallas/GSPMD interaction bugs: off-TPU the
kernels fall back to plain XLA ops, so a Mosaic kernel left outside a
shard_map (which GSPMD cannot partition — "Mosaic kernels cannot be
automatically partitioned") only explodes on actual multi-chip hardware.
These tests AOT-compile the full-width (head_dim-128) sharded forward
against a detached v5e topology (jax.experimental.topologies, no chips
needed) via ``tools/sharded_step_hlo.py --backend tpu-aot --preset small``
— the exact failure mode caught and fixed in round 2.

Skipped when libtpu topology support is unavailable.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "sharded_step_hlo.py")


def _aot_available() -> bool:
    probe = (
        "from jax.experimental import topologies;"
        "topologies.get_topology_desc(platform='tpu', topology_name='v5e:2x2')"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               ALLOW_MULTIPLE_LIBTPU_LOAD="1")
    try:
        return subprocess.run([sys.executable, "-c", probe], env=env,
                              capture_output=True, timeout=120).returncode == 0
    except Exception:
        return False


pytestmark = [
    pytest.mark.slow,  # full tier: multi-minute detached-topology compiles
    pytest.mark.skipif(not _aot_available(),
                       reason="libtpu AOT topology support unavailable"),
]


def _compile(mesh: str, batch: int = 1, dump_hlo: str | None = None) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               ALLOW_MULTIPLE_LIBTPU_LOAD="1")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, _TOOL, "--backend", "tpu-aot", "--preset", "small",
         "--layers", "2", "--mesh", mesh, "--devices", "4",
         "--topology", "v5e:2x2", "--frames", "2", "--height", "16",
         "--width", "32", "--batch", str(batch)]
        + (["--dump-hlo", dump_hlo] if dump_hlo else []),
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_tp_cp_mesh_compiles_for_v5e(tmp_path):
    """tensor x context (1 local head -> the ppermute ring CP path)."""
    hlo_path = str(tmp_path / "tpcp.hlo")
    rep = _compile("tensor=2,context=2", dump_hlo=hlo_path)
    assert rep["backend"] == "tpu-aot"
    assert rep["collective_bytes"] > 0
    assert "all-reduce" in rep["per_op"]  # row-parallel projection psums
    # the Pallas flash kernels must actually be IN the multi-chip program:
    # a silent fallback to dense XLA attention is numerically identical but
    # blows HBM/latency at production sequence lengths (regression caught
    # in round 2 — the multi-device-world guard degraded the CP inner path)
    hlo = open(hlo_path).read()
    assert "tpu_custom_call" in hlo, "no Mosaic kernel in the sharded program"
    # the fused norm kernels must ALSO survive sharding (round-3: they run
    # inside their own shard_maps instead of degrading to plain XLA norms).
    # Signature: the LN+modulate pallas_call takes the bf16 token stream plus
    # two f32 (B, T_local, D) modulation operands sliced to the shard's
    # frames — no other kernel has two f32[1,1,D] inputs.
    import re

    lnmod_calls = [
        ln for ln in hlo.splitlines()
        if "tpu_custom_call" in ln
        and len(re.findall(r"f32\[1,1,\d+\]", ln.split("metadata")[0])) >= 2
    ]
    assert lnmod_calls, "fused LN+modulate kernel missing from sharded HLO"
    # 2x lnmod + 2x gated-residual per block + head lnmod + attention:
    # well above the attention-only count (3) of the plain-norm program
    assert hlo.count("tpu_custom_call") >= 8, (
        f"too few Mosaic kernels ({hlo.count('tpu_custom_call')}) — fused "
        "norms likely degraded to plain XLA in the sharded program")


def test_pipe_context_mesh_compiles_for_v5e(tmp_path):
    """pipe x context (round-3, VERDICT #5): context-parallel attention runs
    INSIDE pipeline stages.  The compiled v5e program must contain both the
    pipe handoffs (collective-permute) and the in-stage CP attention
    resharding (all-to-all: Ulysses, since the 2 stage-local heads divide
    cp=2), plus Mosaic kernels (flash attention + fused norms per stage)."""
    hlo_path = str(tmp_path / "ppcp.hlo")
    rep = _compile("pipe=2,context=2", batch=2, dump_hlo=hlo_path)
    assert rep["backend"] == "tpu-aot"
    assert "collective-permute" in rep["per_op"], "no pipe handoffs"
    assert "all-to-all" in rep["per_op"], (
        "no in-stage Ulysses resharding — context axis replicated in stages")
    hlo = open(hlo_path).read()
    assert hlo.count("tpu_custom_call") >= 8, (
        "Pallas kernels missing inside pipeline stages")


def test_dp_fsdp_mesh_compiles_for_v5e():
    """data x fsdp with a sharded batch (the batch-axes shard_map specs)."""
    rep = _compile("data=2,fsdp=2", batch=2)
    assert rep["backend"] == "tpu-aot"
    assert rep["collective_bytes"] >= 0


def test_train_step_compiles_for_v5e():
    """Full sharded TRAIN step (fwd + flash bwd under CP + AdamW + EMA)
    AOT-compiles for the v5e target — covers the Pallas-backward and
    optimizer-mirror sharding paths no CPU test can reach."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               ALLOW_MULTIPLE_LIBTPU_LOAD="1")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, _TOOL, "--backend", "tpu-aot", "--model", "train",
         "--preset", "small", "--layers", "2", "--mesh",
         "data=2,tensor=2,context=2", "--devices", "8", "--topology",
         "v5e:2x4", "--frames", "2", "--height", "16", "--width", "32",
         "--batch", "2"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["model"] == "train" and rep["collective_bytes"] > 0


def test_serving_pipeline_compiles_for_v5e():
    """The FULL serving program (8-step denoise scan + condition prep + VAE
    decode in one jit) AOT-compiles for the v5e target."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               ALLOW_MULTIPLE_LIBTPU_LOAD="1")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, _TOOL, "--backend", "tpu-aot", "--model", "pipeline",
         "--preset", "small", "--layers", "2", "--mesh", "tensor=2,context=2",
         "--devices", "4", "--topology", "v5e:2x2", "--height", "16",
         "--width", "32"],
        # ~430 s solo; 600 s flaked under concurrent-suite CPU contention
        env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-3000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["model"] == "pipeline" and rep["steps"] == 8
