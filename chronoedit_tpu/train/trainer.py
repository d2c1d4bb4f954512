"""Training loop — the ImaginaireTrainer equivalent.

Responsibilities mirrored from ``chronoedit/_ext/imaginaire/trainer.py``:
iteration loop with gradient accumulation, callback hooks, periodic
checkpointing + resume, straggler/step-time monitoring, profiling hooks.
Distribution is *not* this class's job: the train step is jitted over a mesh
with sharded params/batches, so the loop body is identical on 1 chip or a
pod.
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp

from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.train.callbacks import CallbackBus, Callback
from chronoedit_tpu.train.checkpoint import CheckpointConfig, CheckpointManager
from chronoedit_tpu.train.train_step import TrainConfig, TrainState, make_train_state, make_train_step


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_iter: int = 1000
    save_every: int = 500
    validate_every: int = 0  # 0 = off
    validate_batches: int = 4
    profile_start: int = -1  # iteration to start a jax.profiler trace, -1=off
    profile_steps: int = 5
    profile_dir: str = "profiles"
    # non-finite-loss policy: after this many *consecutive* non-finite
    # losses, rewind to the latest checkpoint (if a checkpointer is
    # configured) or abort — the reference pairs its unstable-loss counts
    # (wandb_log.py:59-120) with checkpoint resume; round-1 only counted.
    # 0 disables the check.
    nan_abort_after: int = 10
    # sanitizer (utils/sanitize.py): error on any device->host readback
    # inside the micro-batch step calls — catches a stray float()/.item()
    # in a callback or loss hook that would serialize the device pipeline.
    # The trainer's own deferred loss flush/validation stay outside.
    guard_host_sync: bool = False


class Trainer:
    def __init__(
        self,
        dit_cfg: dit_lib.DiTConfig,
        train_cfg: TrainConfig,
        trainer_cfg: TrainerConfig,
        checkpoint_cfg: CheckpointConfig | None = None,
        callbacks: list[Callback] | None = None,
    ):
        self.dit_cfg = dit_cfg
        self.train_cfg = train_cfg
        self.cfg = trainer_cfg
        self.callbacks = CallbackBus(callbacks)
        self.checkpoints = CheckpointManager(checkpoint_cfg) if checkpoint_cfg else None
        self._step_fn = None
        self._val_fn = None

    # ------------------------------------------------------------- state

    def init_state(self, params) -> TrainState:
        state = make_train_state(params, self.train_cfg)
        if self.checkpoints is not None:
            restored = self.checkpoints.restore(state)
            if restored is not None:
                state = restored
        return state

    # ------------------------------------------------------------- loop

    def validate(self, state: TrainState, val_data: Iterator[dict[str, Any]],
                 key: jax.Array) -> dict[str, float]:
        """Average the (EMA-free) velocity loss over validation batches
        (reference validation-every-N, trainer.py:149-263)."""
        from chronoedit_tpu.train.train_step import velocity_loss

        if self._val_fn is None:
            self._val_fn = jax.jit(
                lambda p, b, k: velocity_loss(
                    p, self.dit_cfg, self.train_cfg.rectified_flow,
                    b["latents"], b["condition"], b["text_emb"],
                    b.get("image_emb"), k)[0])
        losses = []
        for _ in range(self.cfg.validate_batches):
            key, sub = jax.random.split(key)
            losses.append(float(self._val_fn(state.params, next(val_data), sub)))
        from chronoedit_tpu.parallel.distributed import collate_metrics

        # multi-host: every process evaluates its own batches; report the
        # cross-process mean (reference collate_batches distributed eval)
        return collate_metrics({"val_loss": sum(losses) / len(losses)})

    def _rewind_or_abort(self, state: TrainState, it: int,
                         unstable: int) -> TrainState:
        """Non-finite-loss recovery: restore the latest checkpoint, or abort
        when there is nothing to rewind to."""
        if self.checkpoints is not None:
            restored = self.checkpoints.restore(state)
            if restored is not None:
                self.callbacks.on_unstable_rewind(self, it, int(restored.step))
                return restored
        raise RuntimeError(
            f"loss non-finite for {unstable} consecutive steps at iteration "
            f"{it} and no checkpoint to rewind to")

    def train(
        self,
        state: TrainState,
        data: Iterator[dict[str, Any]],
        key: jax.Array | None = None,
        val_data: Iterator[dict[str, Any]] | None = None,
    ) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(0)
        if self._step_fn is None:
            self._step_fn = make_train_step(self.dit_cfg, self.train_cfg)

        # serialize the resolved configs at job start (reference
        # trainer.py:104-109 dumps pkl+yaml)
        if self.checkpoints is not None:
            from chronoedit_tpu.utils import easy_io
            from chronoedit_tpu.utils.config import config_to_dict

            easy_io.dump(
                {"dit": config_to_dict(self.dit_cfg),
                 "train": config_to_dict(self.train_cfg),
                 "trainer": config_to_dict(self.cfg)},
                f"{self.checkpoints.cfg.directory}/config.json")

        self.callbacks.on_train_start(self)
        # state.step counts *micro*-steps (one per _step_fn call); the loop
        # counts iterations of grad_accum micro-batches each
        start = int(state.step) // max(self.train_cfg.grad_accum, 1)
        metrics: dict[str, Any] = {}
        unstable = 0
        # deferred non-finite checks: reading a device loss every step would
        # force a host sync on the hot path, so losses are buffered (device
        # scalars, no readback) and checked in batches
        pending: list[tuple[int, Any]] = []
        for it in range(start, self.cfg.max_iter):
            self.callbacks.on_step_start(self, it)
            if self.cfg.profile_start == it:
                jax.profiler.start_trace(self.cfg.profile_dir)

            # gradient accumulation: the single knob is
            # TrainConfig.grad_accum — the same value drives the
            # optax.MultiSteps wrapper inside the step (which applies the
            # optimizer every k-th micro-batch) and this micro-batch loop.
            # Metrics are averaged over the micro-batches of one iteration.
            grad_accum = self.train_cfg.grad_accum
            accum_metrics = []
            data_s = 0.0
            for _ in range(grad_accum):
                key, sub = jax.random.split(key)
                t0 = _time.perf_counter()
                batch = next(data)
                data_s += _time.perf_counter() - t0
                if self.cfg.guard_host_sync:
                    from chronoedit_tpu.utils.sanitize import no_host_sync

                    with no_host_sync():
                        state, metrics = self._step_fn(state, batch, sub)
                else:
                    state, metrics = self._step_fn(state, batch, sub)
                accum_metrics.append(metrics)
            if grad_accum > 1:
                metrics = jax.tree_util.tree_map(
                    lambda *xs: sum(xs) / len(xs), *accum_metrics)
            # host-side data-fetch wall time for this iteration (the
            # reference's DetailedDataLoadingSpeedMonitor callback feeds on
            # the same measurement; see callbacks.DataSpeedMonitor)
            metrics = {**metrics, "data_time_s": data_s}

            if self.cfg.profile_start >= 0 and it == self.cfg.profile_start + self.cfg.profile_steps:
                jax.profiler.stop_trace()

            finite = True
            if self.cfg.nan_abort_after > 0:
                pending.append((it, metrics["loss"]))
                save_due = (self.checkpoints is not None
                            and (it + 1) % self.cfg.save_every == 0)
                # validation must also see flushed (finite-checked) params:
                # without this, a poisoned step could reach _run_validation
                # and burn a cross-host barrier on bogus val_loss (advisor r2)
                val_due = (val_data is not None and self.cfg.validate_every > 0
                           and (it + 1) % self.cfg.validate_every == 0)
                # flush at the batch boundary, before any save/validate, and
                # at end — one host sync per nan_abort_after steps
                if (len(pending) >= self.cfg.nan_abort_after or save_due
                        or val_due or it == self.cfg.max_iter - 1):
                    rewound = False
                    for pit, loss_dev in pending:
                        finite = bool(jnp.isfinite(
                            jnp.asarray(loss_dev, jnp.float32)))
                        unstable = 0 if finite else unstable + 1
                        if unstable >= self.cfg.nan_abort_after:
                            state = self._rewind_or_abort(state, pit, unstable)
                            unstable = 0
                            rewound = True
                            break
                    pending.clear()
                    if rewound:
                        continue

            if (val_data is not None and self.cfg.validate_every > 0
                    and (it + 1) % self.cfg.validate_every == 0):
                key, sub = jax.random.split(key)
                metrics = {**metrics, **self.validate(state, val_data, sub)}

            self._last_state = state  # for sampling callbacks
            self.callbacks.on_step_end(self, it, metrics)
            # never persist a state whose loss just went non-finite — a
            # poisoned checkpoint would defeat the rewind policy
            if (self.checkpoints is not None and finite
                    and (it + 1) % self.cfg.save_every == 0):
                self.checkpoints.save(it + 1, state)
                self.callbacks.on_checkpoint_save(self, it + 1)

        if self.checkpoints is not None:
            if self.checkpoints.latest_step() != self.cfg.max_iter:
                self.checkpoints.save(self.cfg.max_iter, state, force=True)
            self.checkpoints.wait_until_finished()
        self.callbacks.on_train_end(self)
        return state
