"""Runtime sanitizers: transfer guard + numeric debug (utils/sanitize.py).

SPMD-side complement of the replica-consistency checker — the reference has
no sanitizer integration at all (SURVEY §5.2), so these pin down behavior of
the tooling we add beyond parity.

The transfer guard's *blocking* behavior only exists on real accelerators
(on the CPU backend readbacks are zero-copy, never a "transfer"), so the
raise-on-readback assertion is TPU-gated; it was verified on a v5e chip
(``float(x)`` inside the guard raises ``Disallowed device-to-host
transfer`` while an explicit ``jax.device_get`` passes).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.utils.sanitize import (assert_no_host_sync,
                                           debug_numerics, no_host_sync)

_ON_CPU = jax.devices()[0].platform == "cpu"


@pytest.mark.skipif(_ON_CPU, reason="transfer guard is vacuous on CPU "
                    "(no device->host transfer happens)")
def test_no_host_sync_blocks_readback():
    x = jnp.ones((4,), jnp.float32)
    with pytest.raises(Exception, match="[Dd]isallow"):
        with no_host_sync():
            float(jnp.sum(x))  # implicit device->host readback
    with no_host_sync():
        jax.device_get(x)  # explicit, deliberately allowed


def test_no_host_sync_allows_device_work():
    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((8, 8), jnp.float32)
    out = assert_no_host_sync(f, a, a)
    # guard exited: readback is allowed again and the result is intact
    np.testing.assert_allclose(np.asarray(out), 8.0)


def test_no_host_sync_restores_on_error():
    x = jnp.ones((2,), jnp.float32)
    try:
        with no_host_sync():
            raise ValueError("inner failure")
    except ValueError:
        pass
    assert float(jnp.sum(x)) == 2.0  # guard released despite the raise


def test_debug_numerics_raises_at_nan_source():
    zero = jnp.zeros((), jnp.float32)
    with pytest.raises(FloatingPointError):
        with debug_numerics():
            jax.jit(lambda z: z / z)(zero)
    assert not jax.config.jax_debug_nans  # restored
    assert not jax.config.jax_debug_infs


def test_trainer_guard_host_sync_wiring(monkeypatch):
    """TrainerConfig.guard_host_sync wraps exactly the micro-step calls.

    The real train step is injected with a stub (compiling the full step is
    the full tier's job, tests/test_trainer_loop.py) so this checks the
    wiring: the guard context is entered once per micro-batch and is NOT
    held around the trainer's own deferred loss flush.
    """
    from chronoedit_tpu.configs import chronoedit_tiny
    from chronoedit_tpu.train import TrainConfig
    from chronoedit_tpu.train.trainer import Trainer, TrainerConfig
    from chronoedit_tpu.utils import sanitize

    entered = []

    @contextlib.contextmanager
    def recording_guard():
        entered.append(True)
        yield
        entered.pop()

    monkeypatch.setattr(sanitize, "no_host_sync", recording_guard)

    calls = {"in_guard": [], "flush_in_guard": None}

    dit_cfg = chronoedit_tiny().dit
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1, grad_accum=2)
    trainer = Trainer(dit_cfg, tcfg,
                      TrainerConfig(max_iter=2, save_every=100,
                                    nan_abort_after=1, guard_host_sync=True))

    class _State:
        step = 0

    def fake_step(state, batch, key):
        calls["in_guard"].append(bool(entered))
        state.step += 1
        return state, {"loss": jnp.float32(0.5)}

    trainer._step_fn = fake_step

    def gen():
        while True:
            yield {}

    state = trainer.train(_State(), gen())
    assert state.step == 4  # 2 iters x grad_accum 2
    assert calls["in_guard"] == [True] * 4  # every micro-step guarded
    assert not entered  # guard never leaks past the step calls


def test_trainer_guard_off_by_default():
    from chronoedit_tpu.train.trainer import TrainerConfig

    assert TrainerConfig().guard_host_sync is False
