"""LoRA fine-tuning: train only adapter params over a frozen base model.

The DiffSynth-path equivalent (``scripts/train_diffsynth.py:64-139``: LoRA
rank 32 on q,k,v,o,ffn.0,ffn.2 of every block, rectified-flow loss).  The
base params stay frozen; gradients flow through :func:`merge_lora` into the
adapter leaves only — XLA fuses the merge into the forward, so each step
costs one stacked einsum per target on top of the normal forward.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import lora as lora_lib
from chronoedit_tpu.train.ema import ema_update
from chronoedit_tpu.train.train_step import TrainConfig, make_optimizer, velocity_loss

Params = Any


class LoRATrainState(NamedTuple):
    step: jnp.ndarray
    lora_params: Params
    opt_state: Any
    ema_params: Params | None


def make_lora_train_state(lora_params: Params, cfg: TrainConfig) -> LoRATrainState:
    opt = make_optimizer(cfg)
    ema = (jax.tree_util.tree_map(jnp.copy, lora_params)
           if cfg.ema.enabled else None)
    return LoRATrainState(
        step=jnp.zeros((), jnp.int32),
        lora_params=lora_params,
        opt_state=opt.init(lora_params),
        ema_params=ema,
    )


def make_lora_train_step(dit_cfg: dit_lib.DiTConfig, cfg: TrainConfig,
                         lora_cfg: lora_lib.LoRAConfig, donate: bool = True):
    """Jitted LoRA step. ``base_params`` is a frozen argument (not donated);
    batch = {"latents", "condition", "text_emb", "image_emb"(opt)}."""
    opt = make_optimizer(cfg)

    def step_fn(state: LoRATrainState, base_params: Params, batch: dict,
                key: jax.Array):
        def loss_fn(lp):
            # QLoRA (round 5, VERDICT r4 #4): a quantized frozen base
            # (w4a8 ~9.2 GB at 14B) has no float kernel to merge into, so
            # the adapter rides as a side branch; a bf16 base keeps the
            # classic fused merge. Both differentiate wrt the adapter only.
            if lora_lib.base_is_quantized(base_params, lora_cfg):
                merged = lora_lib.attach_lora(base_params, lp, 1.0, lora_cfg)
            else:
                merged = lora_lib.merge_lora(base_params, lp, 1.0, lora_cfg)
            return velocity_loss(
                merged, dit_cfg, cfg.rectified_flow,
                batch["latents"], batch["condition"], batch["text_emb"],
                batch.get("image_emb"), key,
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.lora_params)
        updates, opt_state = opt.update(grads, state.opt_state, state.lora_params)
        lora_params = optax.apply_updates(state.lora_params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, lora_params, state.step, cfg.ema)
        new_state = LoRATrainState(state.step + 1, lora_params, opt_state, ema)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
