"""Rectified-flow training math (time sampling, interpolation, weights).

Mirrors ``chronoedit/_src/schedulers/rectified_flow.py``:

- Train time ``u ~ U(min,max)`` or ``sigmoid(N(0,1))`` ("logitnormal", the
  ChronoEdit default — SURVEY §2.3 / rectified_flow.py:80-86).
- ``u`` is discretized onto the 1000-step FlowMatchEulerDiscrete grid with a
  flow shift (rectified_flow.py:120-180); the *discrete timestep value*
  (sigma*1000) is what the DiT consumes.
- Interpolation: ``x_t = sigma*noise + (1-sigma)*data``; the velocity target
  is ``noise - data`` (rectified_flow.py:185-227; note x_0 = noise in the RF
  notation there).
- Loss weight: uniform, or the Gaussian "reweighting" bell over timesteps
  (rectified_flow.py:30-51).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.core.schedule import flow_shift


@dataclasses.dataclass(frozen=True)
class RectifiedFlowConfig:
    num_train_timesteps: int = 1000
    shift: float = 5.0
    train_time_distribution: str = "logitnormal"  # or "uniform"
    min_timestep_boundary: float = 0.0
    max_timestep_boundary: float = 1.0
    train_time_weight: str = "uniform"  # or "reweighting"

    def train_grid(self) -> tuple[np.ndarray, np.ndarray]:
        """(sigmas, timesteps), both (N,) descending, float64.

        Matches diffusers FlowMatchEulerDiscreteScheduler(shift=shift):
        base sigmas descend linspace(1, 1/N, N), then the flow shift.
        """
        n = self.num_train_timesteps
        sigmas = np.linspace(1.0, 1.0 / n, n)
        sigmas = flow_shift(sigmas, self.shift)
        return sigmas, sigmas * n

    def reweighting_table(self) -> np.ndarray:
        """Per-index loss weights for the 'reweighting' mode (ref :30-36)."""
        _, timesteps = self.train_grid()
        n = self.num_train_timesteps
        y = np.exp(-2.0 * ((timesteps - n / 2) / n) ** 2)
        y = y - y.min()
        return y * (n / y.sum())


def sample_train_time(key: jax.Array, batch_size: int, cfg: RectifiedFlowConfig) -> jnp.ndarray:
    """Sample u in [0,1], shape (batch_size,)."""
    if cfg.train_time_distribution == "uniform":
        span = cfg.max_timestep_boundary - cfg.min_timestep_boundary
        return jax.random.uniform(key, (batch_size,)) * span + cfg.min_timestep_boundary
    if cfg.train_time_distribution == "logitnormal":
        return jax.nn.sigmoid(jax.random.normal(key, (batch_size,)))
    raise NotImplementedError(cfg.train_time_distribution)


def discretize_time(u: jnp.ndarray, cfg: RectifiedFlowConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map u in [0,1] to (timesteps, sigmas) on the shifted train grid.

    ``indices = floor(u*N)`` then a lookup, as in rectified_flow.py:163-180
    (default ``use_t_in_reverse_order=True``: index 0 is the *noisiest* step).
    """
    sigmas, timesteps = cfg.train_grid()
    n = cfg.num_train_timesteps
    idx = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
    t = jnp.asarray(timesteps, jnp.float32)[idx]
    s = jnp.asarray(sigmas, jnp.float32)[idx]
    return t, s


def get_interpolation(
    noise: jnp.ndarray, data: jnp.ndarray, sigmas: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x_t and its velocity target.

    Args:
      noise: epsilon ~ N(0,1), same shape as data.
      data: clean latents.
      sigmas: (B,) or (B, T) noise levels in [0, 1]; broadcast over the
        remaining axes (B, C, T, H, W layout: per-frame sigmas hit axis 2).
    """
    if sigmas.ndim == 1:  # (B,) -> broadcast over all
        shaped = sigmas.reshape(sigmas.shape + (1,) * (data.ndim - 1))
    elif sigmas.ndim == 2:  # (B, T) -> align with frame axis 2 of B C T H W
        shaped = sigmas[:, None, :, None, None]
    else:
        raise ValueError(f"sigmas must be (B,) or (B,T), got {sigmas.shape}")
    shaped = shaped.astype(data.dtype)
    x_t = noise * shaped + data * (1.0 - shaped)
    velocity = noise - data
    return x_t, velocity


def train_time_weight(timesteps: jnp.ndarray, cfg: RectifiedFlowConfig) -> jnp.ndarray:
    """Per-sample loss weights for the sampled timesteps."""
    if cfg.train_time_weight == "uniform":
        return jnp.ones_like(timesteps)
    if cfg.train_time_weight == "reweighting":
        table = jnp.asarray(cfg.reweighting_table(), jnp.float32)
        _, grid = cfg.train_grid()
        grid = jnp.asarray(grid, jnp.float32)
        idx = jnp.argmin(jnp.abs(grid[None, :] - timesteps.reshape(-1, 1)), axis=1)
        return table[idx].reshape(timesteps.shape)
    raise NotImplementedError(cfg.train_time_weight)


def x0_from_velocity(x_t: jnp.ndarray, velocity: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
    """Recover the x0 prediction from a velocity prediction (ref :232-260)."""
    shaped = sigmas.reshape(sigmas.shape + (1,) * (x_t.ndim - sigmas.ndim))
    return (x_t.astype(jnp.float32) - shaped * velocity.astype(jnp.float32))
