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
import pytest

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile


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


def test_grad_accum_matches_big_batch():
    """accumulate(2) over micro-batches [A, B] must produce exactly one
    optimizer apply equal to a manual AdamW step on mean(grad_A, grad_B),
    with EMA moving only on the applied step (VERDICT round-1 weak #4)."""
    import optax
    from chronoedit_tpu.train.train_step import make_optimizer, velocity_loss

    _, dit_cfg, params, _, batch = _setup()
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, grad_clip=1e9, grad_accum=2)
    keyA, keyB = jax.random.PRNGKey(10), jax.random.PRNGKey(11)
    batchA = batch
    batchB = {k: v + 0.1 for k, v in batch.items()}

    state = make_train_state(params, tcfg)
    step = make_train_step(dit_cfg, tcfg, donate=False)
    state1, _ = step(state, batchA, keyA)
    # micro-step 1: no optimizer apply -> params and EMA unchanged
    for p0, p1 in zip(jax.tree_util.tree_leaves(state.params),
                      jax.tree_util.tree_leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    for e0, e1 in zip(jax.tree_util.tree_leaves(state.ema_params),
                      jax.tree_util.tree_leaves(state1.ema_params)):
        np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))

    state2, _ = step(state1, batchB, keyB)

    # manual: one AdamW step on the mean gradient
    def grad_of(b, k):
        return jax.grad(lambda p: velocity_loss(
            p, dit_cfg, tcfg.rectified_flow, b["latents"], b["condition"],
            b["text_emb"], b.get("image_emb"), k)[0])(params)

    gA, gB = grad_of(batchA, keyA), grad_of(batchB, keyB)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, gA, gB)
    ref_cfg = dataclasses.replace(tcfg, grad_accum=1)
    opt = make_optimizer(ref_cfg)
    upd, _ = opt.update(gmean, opt.init(params), params)
    ref_params = optax.apply_updates(params, upd)

    for got, want in zip(jax.tree_util.tree_leaves(state2.params),
                         jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-7)
    # EMA applied exactly once, with power beta at applied-step count 0
    # ((1-1/1)^(g+1) = 0 -> EMA == params)
    for e, p in zip(jax.tree_util.tree_leaves(state2.ema_params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-6)


def test_grad_accum_ema_counts_applied_steps():
    """Over two accumulation windows the EMA must equal sequential
    ema_update calls at applied-step counts 0 and 1 (not micro-steps)."""
    _, dit_cfg, params, _, batch = _setup()
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, grad_clip=1e9, grad_accum=2)
    state = make_train_state(params, tcfg)
    step = make_train_step(dit_cfg, tcfg, donate=False)

    params_after = []
    for i in range(4):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        if i % 2 == 1:
            params_after.append(state.params)

    ema = jax.tree_util.tree_map(jnp.copy, params)
    for t, p in enumerate(params_after):
        ema = ema_update(ema, p, jnp.asarray(t), tcfg.ema)
    for got, want in zip(jax.tree_util.tree_leaves(state.ema_params),
                         jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
