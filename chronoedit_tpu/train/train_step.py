"""Jitted training step: rectified-flow velocity loss + optax update + EMA.

Replaces the reference's trainer/DDP/FusedAdam plumbing
(``wan_t2v_model.py:579-645`` training_step; ``utils/fused_adam.py`` apex
FusedAdam; EMA hook ``wan_t2v_model.py:313-325``) with one pure function:
XLA fuses the optimizer (no hand-written multi-tensor kernels needed), grad
clipping is an optax transform, and EMA is a pytree lerp in the same program.

Data parallelism: jit the step with batch sharded over ``data``(x``fsdp``)
and params sharded per ``parallel.sharding`` — gradient psums appear
automatically (the DDP/HSDP equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from chronoedit_tpu.core import rectified_flow as rf
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import vae as vae_lib
from chronoedit_tpu.pipeline.edit_pipeline import PipelineConfig, prepare_condition
from chronoedit_tpu.train.ema import EMAConfig, ema_update

Params = Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-5
    weight_decay: float = 0.01
    betas: tuple[float, float] = (0.9, 0.95)
    eps: float = 1e-8
    grad_clip: float = 1.0
    warmup_steps: int = 1000
    total_steps: int = 100_000
    grad_accum: int = 1  # micro-batches per optimizer step (optax.MultiSteps)
    rectified_flow: rf.RectifiedFlowConfig = rf.RectifiedFlowConfig()
    ema: EMAConfig = EMAConfig()


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params
    opt_state: Any
    ema_params: Params | None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip + linear warmup (the reference's FusedAdam +
    GradClip callback + LambdaLinear scheduler)."""
    schedule = optax.warmup_constant_schedule(0.0, cfg.lr, cfg.warmup_steps)
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if cfg.grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum)
    return opt


def make_train_state(params: Params, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg)
    # EMA starts as a *copy* (distinct buffers — donation would otherwise see
    # the same buffer twice)
    ema = jax.tree_util.tree_map(jnp.copy, params) if cfg.ema.enabled else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=ema,
    )


def edit_training_batch(
    vae_params: Params,
    pipe_cfg: PipelineConfig,
    video: jnp.ndarray,
    is_video_prior: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build (clean latents, condition) from a raw edit pair video.

    Edit-mode data layout (chronoedit_14b_edit_model.py:50-65): the raw clip's
    first frame is the source image and the *last* frame is the edit target;
    the target is repeated temporal_factor times after the source so the clip
    encodes to exactly 2 latent frames. ``is_video_prior=True`` keeps the
    full trajectory: video latents ++ the edit latent.

    Args:
      video: (B, 3, T, H, W) pixels in [-1, 1].
    Returns:
      latents (B, z, Tl, h, w) float32; condition (B, tfac+z, Tl, h, w).
    """
    vcfg = pipe_cfg.vae
    tfac = vcfg.temporal_factor
    first = video[:, :, :1]
    last = video[:, :, -1:]
    edit_clip = jnp.concatenate([first] + [last] * tfac, axis=2)
    latents = vae_lib.vae_encode(vae_params, vcfg, edit_clip).astype(jnp.float32)

    if is_video_prior:
        prior = vae_lib.vae_encode(vae_params, vcfg, video[:, :, :-1]).astype(jnp.float32)
        latents = jnp.concatenate([prior, latents[:, :, 1:]], axis=2)
    num_frames = vcfg.pixel_frames(latents.shape[2])

    condition = prepare_condition(vae_params, pipe_cfg, first[:, :, 0], num_frames)
    return latents, condition


def velocity_loss(
    params: Params,
    dit_cfg: dit_lib.DiTConfig,
    rf_cfg: rf.RectifiedFlowConfig,
    latents: jnp.ndarray,
    condition: jnp.ndarray,
    text_emb: jnp.ndarray,
    image_emb: jnp.ndarray | None,
    key: jax.Array,
    mesh=None,
) -> tuple[jnp.ndarray, dict]:
    """Time-weighted velocity MSE (wan_t2v_model.py:608-641)."""
    b = latents.shape[0]
    k_t, k_eps = jax.random.split(key)
    u = rf.sample_train_time(k_t, b, rf_cfg)
    timesteps, sigmas = rf.discretize_time(u, rf_cfg)
    noise = jax.random.normal(k_eps, latents.shape, jnp.float32)
    x_t, v_target = rf.get_interpolation(noise, latents.astype(jnp.float32), sigmas)

    xin = jnp.concatenate([x_t.astype(dit_cfg.dtype),
                           condition.astype(dit_cfg.dtype)], axis=1)
    v_pred = dit_lib.dit_forward(params, dit_cfg, xin, timesteps, text_emb,
                                 image_emb, mesh=mesh)

    err = (v_pred.astype(jnp.float32) - v_target) ** 2
    per_sample = jnp.mean(err.reshape(b, -1), axis=1)
    weights = rf.train_time_weight(timesteps, rf_cfg)
    loss = jnp.mean(weights * per_sample)
    return loss, {"loss": loss, "timesteps": timesteps}


def make_train_step(dit_cfg: dit_lib.DiTConfig, cfg: TrainConfig,
                    donate: bool = True, mesh=None):
    """Build the jitted train step.

    batch = {"latents", "condition", "text_emb", "image_emb"(opt)}.
    ``mesh`` enables the explicit-kernel parallel paths inside the DiT
    (ring/ulysses CP, GPipe over a pipe axis); GSPMD sharding works without
    it.
    """
    opt = make_optimizer(cfg)

    def step_fn(state: TrainState, batch: dict, key: jax.Array):
        def loss_fn(p):
            return velocity_loss(
                p, dit_cfg, cfg.rectified_flow,
                batch["latents"], batch["condition"], batch["text_emb"],
                batch.get("image_emb"), key, mesh=mesh,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        ema_params = state.ema_params
        if ema_params is not None:
            # EMA moves only on *applied* optimizer steps (micro-steps leave
            # params unchanged), and the power-EMA schedule counts applied
            # steps — lerping every micro-step would distort the effective
            # beta vs the reference (wan_t2v_model.py:1003-1017).
            if cfg.grad_accum > 1:
                applied = opt_state.mini_step == 0
                applied_count = opt_state.gradient_step - 1
            else:
                applied = jnp.bool_(True)
                applied_count = state.step
            ema_params = jax.lax.cond(
                applied,
                lambda e: ema_update(e, params, applied_count, cfg.ema),
                lambda e: e,
                ema_params,
            )
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema_params)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
