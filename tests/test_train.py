"""Training-step tests: loss decreases, EMA math, edit batch construction."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.configs import chronoedit_tiny
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import vae as vae_lib
from chronoedit_tpu.train import (
    TrainConfig, edit_training_batch, make_train_state, make_train_step,
)
from chronoedit_tpu.train.ema import EMAConfig, ema_update, power_ema_beta


def _setup():
    pipe_cfg = chronoedit_tiny()
    dit_cfg = pipe_cfg.dit
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, grad_clip=1.0)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (2, 4, 2, 4, 4)),
        "condition": jax.random.normal(jax.random.PRNGKey(2), (2, 6, 2, 4, 4)),
        "text_emb": jax.random.normal(jax.random.PRNGKey(3), (2, 6, dit_cfg.text_dim)),
        "image_emb": jax.random.normal(
            jax.random.PRNGKey(4), (2, dit_cfg.image_tokens, dit_cfg.image_dim)),
    }
    return pipe_cfg, dit_cfg, params, tcfg, batch


def test_train_step_runs_and_loss_decreases():
    _, dit_cfg, params, tcfg, batch = _setup()
    state = make_train_state(params, tcfg)
    step = make_train_step(dit_cfg, tcfg, donate=False)
    losses = []
    for i in range(8):
        # fixed key: overfit a single noise draw — loss must drop
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert float(metrics["grad_norm"]) > 0


def test_ema_tracks_params():
    _, dit_cfg, params, tcfg, batch = _setup()
    state = make_train_state(params, tcfg)
    step = make_train_step(dit_cfg, tcfg, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # EMA at step 0 with power beta ((1-1/1)^g = 0) copies params exactly
    leaves_p = jax.tree_util.tree_leaves(state.params)
    leaves_e = jax.tree_util.tree_leaves(state.ema_params)
    for p, e in zip(leaves_p, leaves_e):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-6)


def test_power_ema_beta_schedule():
    g = 6.94
    assert float(power_ema_beta(jnp.asarray(0), g)) == 0.0
    b1k = float(power_ema_beta(jnp.asarray(1000), g))
    b10k = float(power_ema_beta(jnp.asarray(10_000), g))
    assert 0.99 < b1k < b10k < 1.0


def test_classic_ema():
    cfg = EMAConfig(mode="classic", decay=0.9)
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    out = ema_update(ema, params, jnp.asarray(100), cfg)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


def test_edit_training_batch_shapes():
    pipe_cfg, _, _, _, _ = _setup()
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(9), pipe_cfg.vae)
    video = jax.random.uniform(jax.random.PRNGKey(10), (1, 3, 5, 8, 8),
                               minval=-1, maxval=1)
    latents, cond = edit_training_batch(vae_params, pipe_cfg, video)
    # tiny vae temporal factor 2: [f0, f4 x2] -> 3 px frames -> 2 latent frames
    assert latents.shape == (1, 4, 2, 4, 4)
    assert cond.shape == (1, 6, 2, 4, 4)

    lat_p, cond_p = edit_training_batch(vae_params, pipe_cfg, video,
                                        is_video_prior=True)
    # prior path: video[:-1] = 4 frames... not 2k+1; encode still defined for
    # arbitrary length ceil((T-1)/2)+1 frames
    assert lat_p.shape[1] == 4 and cond_p.shape[2] == lat_p.shape[2]
