"""Conditioner CFG-dropout, LoRA training, SLG pipeline, CP inference tests."""

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.configs import chronoedit_tiny
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import lora as lora_lib
from chronoedit_tpu.models import vae as vae_lib
from chronoedit_tpu.models.conditioner import CondSpec, Conditioner, edit_conditioner
from chronoedit_tpu.pipeline.edit_pipeline import ChronoEditPipeline
from chronoedit_tpu.train import TrainConfig
from chronoedit_tpu.train.lora_train import make_lora_train_state, make_lora_train_step
import pytest

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile


def test_conditioner_dropout_statistics():
    cond = Conditioner({"text_emb": CondSpec(dropout_rate=0.5)})
    batch = {"text_emb": jnp.ones((64, 4, 8))}
    out = cond(batch, key=jax.random.PRNGKey(0), train=True)
    dropped = np.asarray(jnp.all(out["text_emb"] == 0, axis=(1, 2)))
    assert 0.25 < dropped.mean() < 0.75  # ~50%
    # eval mode: untouched
    out_eval = cond(batch, key=jax.random.PRNGKey(0), train=False)
    assert float(jnp.abs(out_eval["text_emb"] - 1).max()) == 0


def test_conditioner_empty_emb_null():
    null = jnp.full((1, 4, 8), 7.0)
    cond = Conditioner({"text_emb": CondSpec(dropout_rate=1.0,
                                             null_mode="empty_emb",
                                             null_value=null)})
    out = cond({"text_emb": jnp.ones((2, 4, 8))}, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out["text_emb"]), 7.0)


def test_condition_uncondition_pair():
    cond = edit_conditioner(empty_text_emb=jnp.zeros((1, 4, 8)) + 3.0)
    batch = {"text_emb": jnp.ones((2, 4, 8)), "image_emb": jnp.ones((2, 5, 6))}
    c, u = cond.condition_uncondition(batch)
    np.testing.assert_allclose(np.asarray(u["text_emb"]), 3.0)
    np.testing.assert_allclose(np.asarray(u["image_emb"]), 1.0)  # image kept
    neg = {"text_emb": jnp.full((2, 4, 8), -1.0)}
    _, u2 = cond.condition_uncondition(batch, negative=neg)
    np.testing.assert_allclose(np.asarray(u2["text_emb"]), -1.0)


def test_lora_training_decreases_loss_and_freezes_base():
    from tests.test_dit import _randomize

    pipe_cfg = chronoedit_tiny()
    dit_cfg = pipe_cfg.dit
    # randomize: a fresh-init base has a zero output head, which blocks all
    # gradients to a frozen-base LoRA (real use fine-tunes pretrained weights)
    base = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg),
                      jax.random.PRNGKey(9))
    lcfg = lora_lib.LoRAConfig(rank=2)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), base, lcfg)
    tcfg = TrainConfig(lr=5e-3, warmup_steps=1)
    state = make_lora_train_state(lora, tcfg)
    step = make_lora_train_step(dit_cfg, tcfg, lcfg, donate=False)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (2, 4, 2, 4, 4)),
        "condition": jax.random.normal(jax.random.PRNGKey(3), (2, 6, 2, 4, 4)),
        "text_emb": jax.random.normal(jax.random.PRNGKey(4), (2, 6, dit_cfg.text_dim)),
        "image_emb": jax.random.normal(
            jax.random.PRNGKey(5), (2, dit_cfg.image_tokens, dit_cfg.image_dim)),
    }
    base_before = jax.tree_util.tree_map(np.asarray, base)
    losses = []
    for _ in range(6):
        state, metrics = step(state, base, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # base unchanged
    for a, b in zip(jax.tree_util.tree_leaves(base_before),
                    jax.tree_util.tree_leaves(base)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # adapter changed
    assert float(jnp.abs(state.lora_params["blocks"]["ffn"]["fc1"]["b"]).max()) > 0


def test_attach_lora_matches_merge_on_float_base():
    """attach_lora (side branch, the QLoRA composition) must compute the
    same function as merge_lora on a float base."""
    from tests.test_dit import _randomize

    dit_cfg = chronoedit_tiny().dit
    base = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg),
                      jax.random.PRNGKey(9))
    lcfg = lora_lib.LoRAConfig(rank=2)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), base, lcfg)
    # non-trivial b (zero-init b makes the comparison vacuous)
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape,
                                               x.dtype), lora)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, dit_cfg.in_channels, 2, 4, 4))
    ts = jnp.full((1,), 500.0)
    text = jax.random.normal(jax.random.PRNGKey(4), (1, 6, dit_cfg.text_dim))
    img = jax.random.normal(jax.random.PRNGKey(5),
                            (1, dit_cfg.image_tokens, dit_cfg.image_dim))
    merged = dit_lib.dit_forward(
        lora_lib.merge_lora(base, lora, 1.0, lcfg), dit_cfg, x, ts, text, img)
    attached = dit_lib.dit_forward(
        lora_lib.attach_lora(base, lora, 1.0, lcfg), dit_cfg, x, ts, text, img)
    np.testing.assert_allclose(np.asarray(attached), np.asarray(merged),
                               rtol=2e-4, atol=2e-4)


def test_qlora_quantized_base_trains_and_matches_grad_direction():
    """QLoRA (round 5, VERDICT r4 #4): the LoRA step over a frozen w4a8
    base must (a) train (loss decreases, base untouched) and (b) produce
    adapter gradients aligned with the bf16-base step at tiny geometry —
    the numerics gate for the full-depth single-chip fine-tune recipe."""
    from chronoedit_tpu.ops.quant import quantize_dit_params
    from chronoedit_tpu.train.train_step import TrainConfig
    from tests.test_dit import _randomize

    dit_cfg = chronoedit_tiny().dit
    base = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg),
                      jax.random.PRNGKey(9))
    qbase = quantize_dit_params(base, mode="int4_a8")
    assert lora_lib.base_is_quantized(qbase)
    assert not lora_lib.base_is_quantized(base)
    lcfg = lora_lib.LoRAConfig(rank=2)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), base, lcfg)
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape,
                                               x.dtype), lora)
    tcfg = TrainConfig(lr=5e-3, warmup_steps=1)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (2, 4, 2, 4, 4)),
        "condition": jax.random.normal(jax.random.PRNGKey(3), (2, 6, 2, 4, 4)),
        "text_emb": jax.random.normal(jax.random.PRNGKey(4),
                                      (2, 6, dit_cfg.text_dim)),
        "image_emb": jax.random.normal(
            jax.random.PRNGKey(5),
            (2, dit_cfg.image_tokens, dit_cfg.image_dim)),
    }

    # grad direction: quantized-base step vs bf16-base step, same adapter
    from chronoedit_tpu.train.train_step import velocity_loss

    def grads_for(params):
        def loss_fn(lp):
            if lora_lib.base_is_quantized(params, lcfg):
                m = lora_lib.attach_lora(params, lp, 1.0, lcfg)
            else:
                m = lora_lib.merge_lora(params, lp, 1.0, lcfg)
            return velocity_loss(m, dit_cfg, tcfg.rectified_flow,
                                 batch["latents"], batch["condition"],
                                 batch["text_emb"], batch["image_emb"],
                                 jax.random.PRNGKey(42))

        return jax.grad(lambda lp: loss_fn(lp)[0])(lora)

    g_bf16 = jax.tree_util.tree_leaves(grads_for(base))
    g_q = jax.tree_util.tree_leaves(grads_for(qbase))
    num = sum(float(jnp.vdot(a, b)) for a, b in zip(g_bf16, g_q))
    na = np.sqrt(sum(float(jnp.vdot(a, a)) for a in g_bf16))
    nb = np.sqrt(sum(float(jnp.vdot(b, b)) for b in g_q))
    cos = num / (na * nb)
    print(f"qlora grad cosine vs bf16 base: {cos:.4f}")
    assert cos > 0.9, cos

    # the quantized-base step trains end-to-end
    state = make_lora_train_state(lora, tcfg)
    step = make_lora_train_step(dit_cfg, tcfg, lcfg, donate=False)
    losses = []
    for _ in range(6):
        state, metrics = step(state, qbase, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def _tiny_pipe():
    from tests.test_dit import _randomize

    cfg = chronoedit_tiny()
    # randomized weights: a zero output head would hide block-level effects
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit),
                        jax.random.PRNGKey(8))
    return ChronoEditPipeline(
        cfg, params, vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae))


def test_slg_layers_change_uncond_only():
    pipe = _tiny_pipe()
    cfg = pipe.config
    img = jnp.zeros((1, 3, 8, 8))
    prompt = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.dit.text_dim))
    neg = jax.random.normal(jax.random.PRNGKey(3), (1, 6, cfg.dit.text_dim))
    clip = jax.random.normal(jax.random.PRNGKey(4),
                             (1, cfg.dit.image_tokens, cfg.dit.image_dim))
    base = pipe(img, prompt, neg, clip, key=jax.random.PRNGKey(5),
                output_type="latent")
    slg = pipe(img, prompt, neg, clip, key=jax.random.PRNGKey(5),
               slg_layers=(1,), output_type="latent")
    assert float(jnp.abs(base - slg).max()) > 1e-6
    # guidance 1.0 -> no uncond forward -> slg_layers has no effect
    a = pipe(img, prompt, None, clip, guidance_scale=1.0,
             key=jax.random.PRNGKey(5), output_type="latent")
    b = pipe(img, prompt, None, clip, guidance_scale=1.0, slg_layers=(1,),
             key=jax.random.PRNGKey(5), output_type="latent")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_context_parallel_inference_matches_single_device():
    from chronoedit_tpu.parallel import MeshConfig, make_mesh

    pipe = _tiny_pipe()
    cfg = pipe.config
    img = jnp.zeros((1, 3, 8, 8))
    prompt = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.dit.text_dim))
    neg = jax.random.normal(jax.random.PRNGKey(3), (1, 6, cfg.dit.text_dim))
    clip = jax.random.normal(jax.random.PRNGKey(4),
                             (1, cfg.dit.image_tokens, cfg.dit.image_dim))
    # num_frames=7 -> 4 latent frames with the tiny VAE: divisible by context=2
    ref = pipe(img, prompt, neg, clip, num_frames=7, key=jax.random.PRNGKey(6),
               output_type="latent")

    mesh = make_mesh(MeshConfig(data=4, context=2))
    pipe.mesh = mesh
    with mesh:
        cp = pipe(img, prompt, neg, clip, num_frames=7,
                  key=jax.random.PRNGKey(6), output_type="latent")
    np.testing.assert_allclose(np.asarray(cp), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
