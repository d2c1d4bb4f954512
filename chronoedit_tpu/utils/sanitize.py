"""Runtime sanitizers — the TPU/SPMD analog of the CUDA-side sanitizer gap.

The reference ships no race detection or sanitizer integration (SURVEY
§5.2); the closest it gets is a deterministic-cudnn flag and a pre-broadcast
parameter-shape check. On TPU the failure modes worth guarding are
different, and JAX exposes hooks for each:

- **non-finite values** escaping a step silently (caught late by the
  trainer's deferred loss check): ``debug_numerics()`` flips
  ``jax_debug_nans``/``jax_debug_infs`` so the *first* op producing a
  NaN/Inf raises with its location, at ~2x step cost — a diagnosis mode,
  not a production default;
- **accidental host syncs** in the hot loop (a stray ``float(x)`` /
  ``.item()`` / ``np.asarray`` in a callback or loss hook serializes the
  device pipeline — the TPU equivalent of an accidental
  ``cudaStreamSynchronize``): ``no_host_sync()`` turns any device->host
  transfer inside the block into an error via JAX's transfer guard;
- **replica divergence** (the SPMD data race): see
  :mod:`chronoedit_tpu.parallel.consistency`.

``Trainer`` exposes the transfer guard as ``TrainerConfig.guard_host_sync``
— it wraps only the micro-batch step calls, not the trainer's own deferred
loss flush or validation (those read back by design, at controlled
boundaries).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_numerics():
    """Raise at the first op that produces a NaN or Inf inside the block.

    Re-runs offending computations un-jitted to localize the op, so only use
    while diagnosing; restores the previous flag values on exit.
    """
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


@contextlib.contextmanager
def no_host_sync():
    """Error on any *implicit* device->host transfer inside the block.

    Host-to-device feed (the data batch) stays allowed — streaming inputs in
    is the pipeline working as designed; it is the *readbacks* that stall
    the device queue mid-step. Deliberate readbacks via ``jax.device_get``
    remain allowed ("disallow" guards implicit transfers only), so
    instrumented code can opt in explicitly. On the CPU backend this is
    vacuous — arrays live in host memory and no transfer ever happens —
    so the guard only bites on real accelerators (verified on v5e: a
    ``float(x)`` inside the block raises ``Disallowed device-to-host
    transfer``).
    """
    with jax.transfer_guard_device_to_host("disallow"):
        yield


def assert_no_host_sync(fn, *args, **kwargs):
    """Run ``fn`` once under :func:`no_host_sync`; return its result.

    Convenience for tests: proves a step function (plus whatever callbacks
    it triggers) completes without a hidden readback.
    """
    with no_host_sync():
        return fn(*args, **kwargs)
