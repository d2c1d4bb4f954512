"""Trainer loop: callbacks fire, checkpoint resume, validation."""

import itertools

import jax
import numpy as np

from chronoedit_tpu.configs import chronoedit_tiny
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.train import TrainConfig
from chronoedit_tpu.train.callbacks import Callback
from chronoedit_tpu.train.checkpoint import CheckpointConfig
from chronoedit_tpu.train.trainer import Trainer, TrainerConfig

import pytest

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile


class Recorder(Callback):
    def __init__(self):
        self.steps = []
        self.val_losses = []
        self.saves = []

    def on_step_end(self, trainer, step, metrics):
        self.steps.append(step)
        if "val_loss" in metrics:
            self.val_losses.append(metrics["val_loss"])

    def on_checkpoint_save(self, trainer, step):
        self.saves.append(step)


def _data(dit_cfg, seed=0):
    rng = np.random.default_rng(seed)

    def gen():
        while True:
            yield {
                "latents": rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32),
                "condition": rng.standard_normal((1, 6, 2, 4, 4)).astype(np.float32),
                "text_emb": rng.standard_normal(
                    (1, 6, dit_cfg.text_dim)).astype(np.float32),
                "image_emb": rng.standard_normal(
                    (1, dit_cfg.image_tokens, dit_cfg.image_dim)).astype(np.float32),
            }

    return gen()


def test_trainer_with_validation_and_resume(tmp_path):
    dit_cfg = chronoedit_tiny().dit
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1)
    rec = Recorder()
    trainer = Trainer(
        dit_cfg, tcfg,
        TrainerConfig(max_iter=4, save_every=2, validate_every=2,
                      validate_batches=2),
        CheckpointConfig(directory=str(tmp_path / "ck"), async_save=False),
        callbacks=[rec],
    )
    state = trainer.init_state(params)
    state = trainer.train(state, _data(dit_cfg), val_data=_data(dit_cfg, 1))
    assert int(state.step) == 4
    assert rec.steps == [0, 1, 2, 3]
    assert len(rec.val_losses) == 2 and all(np.isfinite(rec.val_losses))
    assert rec.saves == [2, 4]

    # resume: a fresh trainer (fresh params — the previous state was donated)
    # picks up at step 4 and continues
    params2 = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    trainer2 = Trainer(
        dit_cfg, tcfg, TrainerConfig(max_iter=6, save_every=10),
        CheckpointConfig(directory=str(tmp_path / "ck"), async_save=False),
    )
    state2 = trainer2.init_state(params2)
    assert int(state2.step) == 4
    state2 = trainer2.train(state2, _data(dit_cfg))
    assert int(state2.step) == 6


def test_resume_with_grad_accum(tmp_path):
    """state.step counts micro-steps; the resume index must divide by
    grad_accum or a resumed run skips (or entirely misses) its remaining
    iterations (round-2 review finding)."""
    dit_cfg = chronoedit_tiny().dit
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1, grad_accum=2)
    trainer = Trainer(
        dit_cfg, tcfg, TrainerConfig(max_iter=3, save_every=3),
        CheckpointConfig(directory=str(tmp_path / "ck"), async_save=False),
    )
    state = trainer.train(trainer.init_state(params), _data(dit_cfg))
    assert int(state.step) == 6  # 3 iterations x 2 micro-steps

    rec = Recorder()
    params2 = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    trainer2 = Trainer(
        dit_cfg, tcfg, TrainerConfig(max_iter=5, save_every=10),
        CheckpointConfig(directory=str(tmp_path / "ck"), async_save=False),
        callbacks=[rec],
    )
    state2 = trainer2.init_state(params2)
    assert int(state2.step) == 6
    state2 = trainer2.train(state2, _data(dit_cfg))
    assert rec.steps == [3, 4]  # resumes at iteration 3, not micro-step 6
    assert int(state2.step) == 10


def _poisoned_data(dit_cfg, nan_from: int):
    """Finite batches until ``nan_from`` yields, then NaN latents forever."""
    import itertools as it

    base = _data(dit_cfg)
    for i in it.count():
        b = next(base)
        if i >= nan_from:
            b = dict(b, latents=np.full_like(b["latents"], np.nan))
        yield b


class RewindRecorder(Callback):
    def __init__(self):
        self.rewinds = []

    def on_unstable_rewind(self, trainer, step, restored_step):
        self.rewinds.append((step, restored_step))


def test_nan_loss_rewinds_to_checkpoint(tmp_path):
    """After N consecutive non-finite losses the trainer restores the latest
    checkpoint instead of training on (VERDICT r1 weak #6)."""
    dit_cfg = chronoedit_tiny().dit
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    rec = RewindRecorder()
    trainer = Trainer(
        dit_cfg, TrainConfig(lr=1e-4, warmup_steps=1),
        TrainerConfig(max_iter=8, save_every=2, nan_abort_after=2),
        CheckpointConfig(directory=str(tmp_path / "ck"), async_save=False),
        callbacks=[rec],
    )
    state = trainer.init_state(params)
    state = trainer.train(state, _poisoned_data(dit_cfg, nan_from=3))
    assert rec.rewinds, "expected at least one rewind"
    step, restored = rec.rewinds[0]
    assert restored == 2, rec.rewinds  # latest save before the NaNs


def test_nan_loss_aborts_without_checkpoints():
    import pytest

    dit_cfg = chronoedit_tiny().dit
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    trainer = Trainer(
        dit_cfg, TrainConfig(lr=1e-4, warmup_steps=1),
        TrainerConfig(max_iter=8, nan_abort_after=2),
    )
    state = trainer.init_state(params)
    with pytest.raises(RuntimeError, match="non-finite"):
        trainer.train(state, _poisoned_data(dit_cfg, nan_from=0))


def test_load_ema_to_reg(tmp_path):
    """CheckpointConfig.load_ema_to_reg restores the EMA weights into the
    regular params (the reference's load_ema_to_reg swap, dcp.py:454-503)."""
    dit_cfg = chronoedit_tiny().dit
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    tcfg = TrainConfig(lr=1e-2, warmup_steps=1)  # big lr: params != ema fast
    trainer = Trainer(
        dit_cfg, tcfg, TrainerConfig(max_iter=3, save_every=3),
        CheckpointConfig(directory=str(tmp_path / "ck"), async_save=False),
    )
    state = trainer.train(trainer.init_state(params), _data(dit_cfg))
    saved_ema = jax.tree_util.tree_map(np.asarray, state.ema_params)
    saved_params = jax.tree_util.tree_map(np.asarray, state.params)
    assert not np.allclose(saved_ema["patch_embed"]["kernel"],
                           saved_params["patch_embed"]["kernel"])

    params2 = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    trainer2 = Trainer(
        dit_cfg, tcfg, TrainerConfig(max_iter=3),
        CheckpointConfig(directory=str(tmp_path / "ck"), async_save=False,
                         load_ema_to_reg=True),
    )
    state2 = trainer2.init_state(params2)
    np.testing.assert_array_equal(
        np.asarray(state2.params["patch_embed"]["kernel"]),
        saved_ema["patch_embed"]["kernel"])
    # params must not alias ema (donation safety)
    assert state2.params["patch_embed"]["kernel"] is not state2.ema_params["patch_embed"]["kernel"]


def test_data_speed_metric():
    """The trainer reports host data-fetch time and DataSpeedMonitor logs it."""
    from chronoedit_tpu.train.callbacks import DataSpeedMonitor

    dit_cfg = chronoedit_tiny().dit
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    seen = []

    class Grab(Callback):
        def on_step_end(self, trainer, step, metrics):
            seen.append(metrics.get("data_time_s"))

    lines = []
    mon = DataSpeedMonitor(log_every=2, log_fn=lines.append)
    trainer = Trainer(
        dit_cfg, TrainConfig(lr=1e-4, warmup_steps=1),
        TrainerConfig(max_iter=3), callbacks=[Grab(), mon],
    )
    trainer.train(trainer.init_state(params), _data(dit_cfg))
    assert len(seen) == 3 and all(s is not None and s >= 0 for s in seen)
    assert lines and "data fetch" in lines[0]
