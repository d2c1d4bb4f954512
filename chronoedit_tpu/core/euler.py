"""Flow-match Euler sampler (the UniPC alternative the diffusers pipeline
also supports: FlowMatchEulerDiscreteScheduler).

For flow matching the Euler step is simply
``x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v_i`` — one fused multiply-add
per step, scanned.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.core.schedule import FlowMatchSchedule


def euler_sample(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_init: jnp.ndarray,
    schedule: FlowMatchSchedule,
    int_timesteps: bool = True,
) -> jnp.ndarray:
    """Scan the Euler integrator over the sigma grid. Returns float32 x0."""
    sigmas = np.asarray(schedule.sigmas, np.float64)
    dsig = jnp.asarray(np.diff(sigmas), jnp.float32)  # (n,) negative steps
    ts = jnp.asarray(schedule.model_timesteps(int_timesteps), jnp.float32)

    def body(x, step):
        t, ds = step
        v = model_fn(x, t).astype(jnp.float32)
        return x + ds * v, None

    x, _ = jax.lax.scan(body, x_init.astype(jnp.float32), (ts, dsig))
    return x
