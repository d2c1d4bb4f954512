"""Replica-consistency checking — the SPMD analog of a race detector.

In a multi-chip/multi-host run, every leaf that is *replicated* across some
mesh axis must hold bitwise-identical data on every replica.  Divergence is
the SPMD failure mode that silent data races produce elsewhere:
nondeterministic collectives, host-dependent data pipelines leaking into
"replicated" state, or checkpoint-restore races each corrupt one replica
while the others stay healthy — and training silently forks (the loss is
computed on rank 0's copy, the update on everyone's).  The reference has no
equivalent tooling (SURVEY §5.2); torch DDP catches a narrow version of this
via gradient bucket checksums.

:func:`check_replica_consistency` hashes every addressable shard of every
leaf and compares shards that cover the same index range (same slice of the
global array == replicas).  Host-local only: on multi-host deployments run
it on each process and compare the returned digests across hosts (they are
deterministic), e.g. via ``jax.experimental.multihost_utils``.

Cost is one device->host transfer of every addressable shard — run it every
few thousand steps (``ReplicaConsistencyCallback(every_n=...)``) or ad hoc
from a REPL, not per step.
"""

from __future__ import annotations

import hashlib
from typing import Any

import jax
import numpy as np


def _shard_digest(data) -> str:
    arr = np.asarray(data)
    return hashlib.sha256(arr.tobytes()).hexdigest()


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def check_replica_consistency(tree: Any) -> list[str]:
    """Return the paths of leaves whose replicas disagree (empty == healthy).

    A leaf participates when it has more than one addressable shard covering
    the same global index range; fully-sharded leaves (no replication) are
    trivially consistent and skipped.
    """
    bad: list[str] = []

    def visit(path, leaf):
        if not isinstance(leaf, jax.Array):
            return
        try:
            shards = leaf.addressable_shards
        except Exception:
            return
        by_index: dict[str, set[str]] = {}
        for sh in shards:
            by_index.setdefault(str(sh.index), set()).add(
                _shard_digest(sh.data))
        if any(len(digests) > 1 for digests in by_index.values()):
            bad.append(_path_str(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad


def tree_digest(tree: Any) -> str:
    """Deterministic digest of a pytree's canonical (replica-0) contents —
    compare across hosts to extend the check beyond this process."""
    h = hashlib.sha256()

    def visit(path, leaf):
        if isinstance(leaf, jax.Array):
            h.update(_path_str(path).encode())
            first = leaf.addressable_shards[0]
            h.update(_shard_digest(first.data).encode())

    jax.tree_util.tree_map_with_path(visit, tree)
    return h.hexdigest()
