"""EMA parameter tracking (classic + EDM2 power EMA).

Mirrors ``chronoedit/_ext/imaginaire/utils/ema.py``: ``EMAModelTracker``
(fixed beta) and ``PowerEMATracker`` (EDM2 power schedule, where the
effective beta grows with the iteration count so early training forgets
quickly).  Reference beta schedule: ``wan_t2v_model.py:1003-1017``.

On TPU this is just a fused pytree lerp inside the jitted train step — no
separate worker needed (the reference's FastEmaModelUpdater machinery is a
CUDA-stream workaround).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    enabled: bool = True
    # classic EMA: fixed decay; power EMA: beta = (1 - 1/(t+1))**(s_exp+1)
    mode: str = "power"  # "power" | "classic"
    decay: float = 0.9999  # classic mode
    edm2_gamma: float = 6.94  # power mode (EDM2 sigma_rel ~= 0.1)


def power_ema_beta(step: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """EDM2 power-function EMA decay: (1 - 1/(t+1)) ** (gamma + 1)."""
    t = step.astype(jnp.float32) + 1.0
    return jnp.power(1.0 - 1.0 / t, gamma + 1.0)


def ema_update(ema_params, params, step: jnp.ndarray, cfg: EMAConfig):
    """One EMA step: ema <- beta*ema + (1-beta)*params (float32 lerp)."""
    if cfg.mode == "power":
        beta = power_ema_beta(step, cfg.edm2_gamma)
    else:
        beta = jnp.asarray(cfg.decay, jnp.float32)

    def lerp(e, p):
        ef = e.astype(jnp.float32)
        return (ef + (1.0 - beta) * (p.astype(jnp.float32) - ef)).astype(e.dtype)

    return jax.tree_util.tree_map(lerp, ema_params, params)
