"""Multi-host path: 2 simulated processes x 4 virtual CPU devices build one
global mesh and run the real train step on per-host batch shards, matching
the single-process 8-device result exactly (reference distributed.init(),
chronoedit/_ext/imaginaire/utils/distributed.py:49-82)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from chronoedit_tpu.parallel import (
        init_distributed, host_local_to_global, local_batch_size,
        process_count, process_index, MeshConfig, make_mesh, shard_params)
    assert init_distributed()  # from JAX_COORDINATOR_ADDRESS etc. env
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from chronoedit_tpu.configs import chronoedit_tiny
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.parallel.sharding import dit_param_sharding
    from chronoedit_tpu.train import TrainConfig, make_train_state, make_train_step

    pipe_cfg = chronoedit_tiny()
    dit_cfg = pipe_cfg.dit
    tcfg = TrainConfig(warmup_steps=1)
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))

    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    params = shard_params(params, mesh, dit_param_sharding(mesh))
    state = make_train_state(params, tcfg)

    # deterministic global batch; each process materializes only its rows
    gb = 4
    lb = local_batch_size(gb)
    rank = process_index()
    rng = np.random.default_rng(0)
    full = {
        "latents": rng.standard_normal((gb, 4, 2, 4, 4)).astype("float32"),
        "condition": rng.standard_normal((gb, 6, 2, 4, 4)).astype("float32"),
        "text_emb": rng.standard_normal((gb, 6, dit_cfg.text_dim)).astype("float32"),
        "image_emb": rng.standard_normal(
            (gb, dit_cfg.image_tokens, dit_cfg.image_dim)).astype("float32"),
    }
    local = {k: v[rank * lb:(rank + 1) * lb] for k, v in full.items()}
    batch = host_local_to_global(local, mesh)

    with mesh:
        step = make_train_step(dit_cfg, tcfg, donate=False)
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(jax.device_get(
            jax.jit(lambda x: x, out_shardings=None)(metrics["loss"])))
    print("RESULT " + json.dumps({"rank": rank, "loss": loss}), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_matches_single_process(tmp_path):
    # --- the 2-process run
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": _REPO})
    addr = f"localhost:{_free_port()}"
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   JAX_COORDINATOR_ADDRESS=addr,
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(rank))
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    losses = {}
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                losses[r["rank"]] = r["loss"]
    assert set(losses) == {0, 1}, losses
    assert losses[0] == losses[1], losses

    # --- the same global step in-process on the 8-device mesh
    from chronoedit_tpu.configs import chronoedit_tiny
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.parallel import MeshConfig, make_mesh, shard_params
    from chronoedit_tpu.parallel.sharding import dit_param_sharding
    from chronoedit_tpu.train import TrainConfig, make_train_state, make_train_step

    pipe_cfg = chronoedit_tiny()
    dit_cfg = pipe_cfg.dit
    tcfg = TrainConfig(warmup_steps=1)
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    params = shard_params(params, mesh, dit_param_sharding(mesh))
    state = make_train_state(params, tcfg)
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((4, 4, 2, 4, 4)).astype("float32")),
        "condition": jnp.asarray(rng.standard_normal((4, 6, 2, 4, 4)).astype("float32")),
        "text_emb": jnp.asarray(rng.standard_normal((4, 6, dit_cfg.text_dim)).astype("float32")),
        "image_emb": jnp.asarray(rng.standard_normal(
            (4, dit_cfg.image_tokens, dit_cfg.image_dim)).astype("float32")),
    }
    with mesh:
        step = make_train_step(dit_cfg, tcfg, donate=False)
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
    ref_loss = float(metrics["loss"])
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-5)


_COLLATE_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from chronoedit_tpu.parallel import collate_metrics, init_distributed, process_index
    assert init_distributed()
    rank = process_index()
    # per-process "validation" metrics differ by rank; the collated value is
    # the cross-process mean on every host
    out = collate_metrics({"val_loss": 1.0 + rank, "acc": float(rank)})
    print("RESULT " + json.dumps({"rank": rank, **out}), flush=True)
""")


def test_collate_metrics_across_processes(tmp_path):
    """Distributed-eval reduction: collate_metrics returns the cross-process
    mean of per-host metrics (reference collate_batches)."""
    script = tmp_path / "collate_worker.py"
    script.write_text(_COLLATE_WORKER % {"repo": _REPO})
    addr = f"localhost:{_free_port()}"
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   JAX_COORDINATOR_ADDRESS=addr,
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(rank))
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["rank"]] = r
    assert set(results) == {0, 1}, results
    for r in results.values():
        assert r["val_loss"] == 1.5 and r["acc"] == 0.5, results
