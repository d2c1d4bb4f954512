"""Target-platform resolution for kernel dispatch.

Kernel entry points (Pallas flash attention, fused norms, attention backend
selection) pick an implementation per platform.  Normally that is the platform
of ``jax.devices()[0]`` — but when AOT-compiling for a *detached* TPU topology
(``tools/sharded_step_hlo.py --backend tpu-aot``, built on
``jax.experimental.topologies``) the process's devices are CPU while the
compilation target is a v5e: dispatch must follow the target, or the measured
HLO contains the dense-attention fallback instead of the flash kernels the
real program runs (a 28.8k-token forward then "needs" a 33 GB score tensor
and spuriously fails HBM budgeting).

Set ``CHRONOEDIT_TARGET_PLATFORM=tpu`` to override detection.
"""

from __future__ import annotations

import os

import jax


def target_platform() -> str:
    """Platform the current computation is being compiled *for*."""
    p = os.environ.get("CHRONOEDIT_TARGET_PLATFORM")
    if p:
        return p
    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return "cpu"


def on_tpu() -> bool:
    return target_platform() == "tpu"


def multi_device_world() -> bool:
    """True when the process sees more than one device.

    Mosaic (Pallas) kernels cannot be auto-partitioned by GSPMD, so a kernel
    traced *outside* a shard_map is only safe when the program cannot span
    devices.  Call sites use this to fall back to plain XLA implementations
    when no explicit mesh was provided but the world is multi-device (e.g.
    pure-GSPMD training driven by input shardings alone).
    """
    try:
        return jax.device_count() > 1
    except Exception:  # pragma: no cover - no backend at all
        return False
