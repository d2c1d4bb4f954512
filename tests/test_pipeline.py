"""End-to-end pipeline tests on the tiny architecture-faithful config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.configs import chronoedit_tiny
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import vae as vae_lib
from chronoedit_tpu.pipeline.edit_pipeline import ChronoEditPipeline, prepare_condition


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = chronoedit_tiny()
    dit_params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae)
    return ChronoEditPipeline(cfg, dit_params, vae_params)


def _embs(cfg, b=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    prompt = jax.random.normal(k1, (b, 6, cfg.dit.text_dim))
    neg = jax.random.normal(k2, (b, 6, cfg.dit.text_dim))
    img = jax.random.normal(k3, (b, cfg.dit.image_tokens, cfg.dit.image_dim))
    return prompt, neg, img


def test_prepare_condition_mask_layout(tiny_pipeline):
    """First latent frame's mask channels must all be 1 (the first pixel
    frame repeated temporal_factor times), later frames 0
    (pipeline_chronoedit.py:447-456)."""
    cfg = tiny_pipeline.config
    image = jnp.zeros((1, 3, 8, 8))
    T = 5
    cond = prepare_condition(tiny_pipeline.vae_params, cfg, image, T)
    tfac = cfg.vae.temporal_factor
    tl = cfg.vae.latent_frames(T)
    assert cond.shape == (1, tfac + cfg.vae.z_dim, tl, 4, 4)
    mask = np.asarray(cond[:, :tfac])
    np.testing.assert_array_equal(mask[:, :, 0], 1.0)
    np.testing.assert_array_equal(mask[:, :, 1:], 0.0)


def test_edit_pipeline_end_to_end(tiny_pipeline):
    cfg = tiny_pipeline.config
    prompt, neg, img = _embs(cfg)
    image = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 8, 8), minval=-1, maxval=1)
    video = tiny_pipeline(image, prompt, neg, img, num_frames=5,
                          key=jax.random.PRNGKey(4))
    assert video.shape == (1, 3, 5, 8, 8)
    assert bool(jnp.isfinite(video).all())
    frame = tiny_pipeline.edit_image(image, prompt, neg_prompt_emb=neg,
                                     image_emb=img, key=jax.random.PRNGKey(4))
    assert frame.shape == (1, 3, 8, 8)


@pytest.mark.slow
def test_cfg_batched_equals_sequential(tiny_pipeline):
    """Batched CFG (one 2B forward) must equal two sequential forwards."""
    cfg = tiny_pipeline.config
    prompt, neg, img = _embs(cfg)
    image = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 8, 8), minval=-1, maxval=1)
    lat = tiny_pipeline(image, prompt, neg, img, key=jax.random.PRNGKey(5),
                        output_type="latent")

    cfg_seq = dataclasses.replace(cfg, cfg_batched=False)
    pipe_seq = ChronoEditPipeline(cfg_seq, tiny_pipeline.dit_params,
                                  tiny_pipeline.vae_params)
    lat_seq = pipe_seq(image, prompt, neg, img, key=jax.random.PRNGKey(5),
                       output_type="latent")
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_seq),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_temporal_reasoning_mode(tiny_pipeline):
    """Reasoning mode: start with a longer clip, drop to [first, last] after
    k steps; output is the 2-latent-frame edit clip."""
    cfg = tiny_pipeline.config
    prompt, neg, img = _embs(cfg)
    image = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 8, 8), minval=-1, maxval=1)
    # tiny vae: temporal factor 2 -> 9 pixel frames = 5 latent frames
    video = tiny_pipeline(image, prompt, neg, img, num_frames=9,
                          enable_temporal_reasoning=True,
                          num_temporal_reasoning_steps=2,
                          key=jax.random.PRNGKey(6))
    # after the drop: 2 latent frames; dual decode -> reason(1 px) + edit[1:]
    assert video.shape == (1, 3, 3, 8, 8)
    assert bool(jnp.isfinite(video).all())

    # full-trajectory submode (k >= num_steps, the reference CLI default):
    # no drop; dual decode returns the whole 9-frame reasoning video
    video_full = tiny_pipeline(image, prompt, neg, img, num_frames=9,
                               enable_temporal_reasoning=True,
                               num_temporal_reasoning_steps=99,
                               key=jax.random.PRNGKey(6))
    assert video_full.shape == (1, 3, 9, 8, 8)
    assert bool(jnp.isfinite(video_full).all())


def test_deterministic_given_key(tiny_pipeline):
    cfg = tiny_pipeline.config
    prompt, neg, img = _embs(cfg)
    image = jnp.zeros((1, 3, 8, 8))
    a = tiny_pipeline(image, prompt, neg, img, key=jax.random.PRNGKey(7))
    b = tiny_pipeline(image, prompt, neg, img, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
