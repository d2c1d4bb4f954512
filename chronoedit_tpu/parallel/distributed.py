"""Multi-host runtime initialization + process-aware data helpers.

The reference's ``distributed.init()`` creates the NCCL world from
torchrun/SLURM env vars (chronoedit/_ext/imaginaire/utils/distributed.py:49-82).
The TPU equivalent is ``jax.distributed.initialize()``: once per process,
before any backend use; afterwards ``jax.devices()`` is the *global* device
list and a single ``Mesh`` spans all hosts — no per-group plumbing.

On Cloud TPU pods ``jax.distributed.initialize()`` needs no arguments (the
runtime publishes coordinator/process env). For CPU simulation and other
clusters, pass (or export) the coordinator address + process count/id:

    JAX_COORDINATOR_ADDRESS=host:port JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0

Data loading: each process feeds only its local shard of the global batch;
:func:`host_local_to_global` assembles the global jax.Array from per-host
numpy data (the DCP/dataloader world_size/rank wiring of the reference's
webdataset distributors maps to ``process_count()``/``process_index()``).

Tested without real hosts by spawning two CPU processes with 4 virtual
devices each (tests/test_multihost.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Initialize the multi-host runtime. Returns True if a multi-process
    world was set up, False for the single-process fallback.

    Arguments default from env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID); with none present and no TPU-pod autodetection
    requested, this is a no-op so single-host runs need no flags.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single process; nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """Rank-0 check (the reference's rank0-only logging/checkpoint guard)."""
    return jax.process_index() == 0


def host_local_to_global(batch, mesh: Mesh, spec_fn=None):
    """Assemble global jax.Arrays from per-process local batch shards.

    Each process holds ``global_batch / process_count`` rows; the returned
    arrays are globally sharded over the mesh's data(+fsdp) axes. ``spec_fn``
    maps a leaf to its PartitionSpec (default: batch-dim over ``data``).
    """
    spec_fn = spec_fn or (lambda leaf: P("data", *([None] * (leaf.ndim - 1))))

    def put(leaf):
        leaf = np.asarray(leaf)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec_fn(leaf)), leaf)

    return jax.tree_util.tree_map(put, batch)


def collate_metrics(metrics: dict) -> dict:
    """Average host-local scalar metrics across processes — the reference's
    distributed-eval ``collate_batches`` reduction
    (chronoedit/_ext/imaginaire/utils/distributed.py:267-309).  Each process
    evaluates its own validation batches; the returned dict holds the
    cross-process means.  No-op (beyond float conversion) single-process.
    """
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    return {
        k: float(np.mean(multihost_utils.process_allgather(
            np.asarray(v, np.float64))))
        for k, v in metrics.items()
    }


def local_batch_size(global_batch: int) -> int:
    """Per-process batch size for a given global batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n
