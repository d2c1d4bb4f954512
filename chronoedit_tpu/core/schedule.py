"""Flow-matching noise schedules (sigma grids with flow shift).

Mirrors the reference scheduler family:

- Training schedule: ``sigmas = 1 - linspace(1, 1/N, N)[::-1]`` giving a
  descending grid 0.999..0 for N=1000 train timesteps, optionally shifted
  (``chronoedit/_src/models/fm_solvers_unipc.py:121-132``).
- Inference grid: ``linspace(sigma_max, sigma_min, n+1)[:-1]`` then the flow
  shift ``s' = shift*s / (1 + (shift-1)*s)``, timesteps = s'*N, and a final
  sigma of 0 appended (``fm_solvers_unipc.py:196-221``).

All arrays are host-side numpy (they are tiny and feed jit as static/constant
inputs); convert with ``jnp.asarray`` where needed.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def flow_shift(sigmas: np.ndarray, shift: float) -> np.ndarray:
    """Apply the flow-matching time shift s' = shift*s / (1 + (shift-1)*s)."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """An inference-time sigma grid for flow-matching samplers.

    Attributes:
      sigmas: (n+1,) float64 descending from sigma_max to the final sigma (0).
      timesteps: (n,) float64, ``sigma * num_train_timesteps`` for each step.
      num_train_timesteps: train discretization (1000 for ChronoEdit).
      shift: the flow shift that produced this grid.
    """

    sigmas: np.ndarray
    timesteps: np.ndarray
    num_train_timesteps: int
    shift: float

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    def model_timesteps(self, int_timesteps: bool = True) -> np.ndarray:
        """Timesteps as fed to the DiT.

        The reference pipelines cast scheduler timesteps to int64 before the
        transformer forward (``fm_solvers_unipc.py:224-225``), so by default
        we floor; pass ``int_timesteps=False`` for the float path used by the
        training-time rectified flow.
        """
        if int_timesteps:
            return np.floor(self.timesteps)
        return self.timesteps


def train_sigmas(num_train_timesteps: int = 1000, shift: float = 1.0) -> np.ndarray:
    """The (descending) training sigma grid; fm_solvers_unipc.py:121-129."""
    alphas = np.linspace(1.0, 1.0 / num_train_timesteps, num_train_timesteps)[::-1]
    sigmas = 1.0 - alphas  # descending: 1 - 1/N ... 0
    return flow_shift(sigmas, shift)


def make_flow_schedule(
    num_steps: int,
    shift: float = 5.0,
    num_train_timesteps: int = 1000,
    base_shift: float = 1.0,
    sigmas: np.ndarray | None = None,
) -> FlowMatchSchedule:
    """Build the inference sigma grid used by UniPC / Euler samplers.

    Args:
      num_steps: number of denoising steps.
      shift: runtime flow shift (5.0 default; 2.0 for the 8-step distilled
        LoRA — reference README "(3) 8-step distilled" and
        ``scripts/run_inference_diffusers.py:39-49``).
      num_train_timesteps: train discretization.
      base_shift: the constructor-time shift baked into sigma_max (1.0 in all
        reference configs, i.e. identity).
      sigmas: optional explicit (num_steps,) descending grid in (0, 1]; the
        runtime shift is still applied (matches ``set_timesteps(sigmas=...)``).
    """
    base = train_sigmas(num_train_timesteps, base_shift)
    # the reference stores the train grid as torch float32 and takes
    # sigma_max/min via .item() (fm_solvers_unipc.py:124,145-146) — the
    # float32 rounding (0.999 -> 0.9990000128...) shifts int-cast timesteps
    # by one; replicate it exactly
    sigma_max = float(np.float32(base[0]))
    sigma_min = float(np.float32(base[-1]))
    if sigmas is None:
        sigmas = np.linspace(sigma_max, sigma_min, num_steps + 1)[:-1]
    else:
        sigmas = np.asarray(sigmas, np.float64)
    sigmas = flow_shift(sigmas, shift)
    timesteps = sigmas * num_train_timesteps
    sigmas = np.concatenate([sigmas, [0.0]])
    return FlowMatchSchedule(
        sigmas=sigmas,
        timesteps=timesteps,
        num_train_timesteps=num_train_timesteps,
        shift=shift,
    )
