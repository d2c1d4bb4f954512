"""Replica-consistency checker (parallel/consistency.py, SURVEY §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chronoedit_tpu.parallel.consistency import (
    check_replica_consistency, tree_digest)


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "tensor"))


def test_healthy_sharded_tree_passes():
    mesh = _mesh()
    tree = {
        "replicated": jax.device_put(
            jnp.arange(16.0), NamedSharding(mesh, P())),
        "sharded": jax.device_put(
            jnp.arange(32.0).reshape(8, 4), NamedSharding(mesh, P("data"))),
        "partial": jax.device_put(
            jnp.arange(64.0).reshape(8, 8),
            NamedSharding(mesh, P("tensor", None))),
        "host": np.ones(3),  # non-jax leaves are skipped
    }
    assert check_replica_consistency(tree) == []
    assert len(tree_digest(tree)) == 64


def test_divergent_replica_detected():
    """Craft an array whose 'replicas' hold different data — the silent
    corruption the checker exists for."""
    mesh = _mesh()
    sharding = NamedSharding(mesh, P())  # fully replicated over 8 devices
    devs = list(mesh.devices.flat)
    bufs = [jax.device_put(jnp.full((4,), float(i == 3)), d)
            for i, d in enumerate(devs)]  # device 3 disagrees
    arr = jax.make_array_from_single_device_arrays((4,), sharding, bufs)
    bad = check_replica_consistency({"w": arr, "ok": jnp.ones(2)})
    assert bad == ["w"]


def test_callback_raises_on_divergence():
    from chronoedit_tpu.train.callbacks import ReplicaConsistencyCallback

    mesh = _mesh()
    devs = list(mesh.devices.flat)
    bufs = [jax.device_put(jnp.full((2,), float(i)), d)
            for i, d in enumerate(devs)]
    arr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P()), bufs)

    class _Trainer:
        _last_state = {"params": {"w": arr}}

    cb = ReplicaConsistencyCallback(every_n=1)
    try:
        cb.on_step_end(_Trainer(), 0, {})
    except RuntimeError as e:
        assert "replica divergence" in str(e)
    else:
        raise AssertionError("divergence not raised")

    # healthy state passes silently
    class _Healthy:
        _last_state = {"params": {"w": jax.device_put(
            jnp.ones(4), NamedSharding(mesh, P()))}}

    cb.on_step_end(_Healthy(), 0, {})
