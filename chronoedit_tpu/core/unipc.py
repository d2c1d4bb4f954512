"""UniPC multistep predictor-corrector for flow matching, as a single scan.

Re-derivation of the reference ``FlowUniPCMultistepScheduler``
(``chronoedit/_src/models/fm_solvers_unipc.py``) in a form XLA compiles well:

The reference keeps Python-side mutable state (model-output history, step
counter) and solves tiny linear systems on-device each step.  On TPU we
instead observe that **every scalar coefficient depends only on the sigma
grid and the step index** — so all lambda/h/B(h)/rho math is precomputed on
the host in float64 (``fm_solvers_unipc.py:365-641``), and the on-device step
reduces to a handful of fused multiply-adds scanned over the step axis:

    x0_i   = x_i - sigma_i * v_i                      (flow -> x0, :333-336)
    x_i   <- cx*x_prev + cm0*m0 + cD*(r0*(m1-m0)/rk + r1*(x0_i - m0))   [UniC]
    m1,m0 <- m0, x0_i ; x_prev <- x_i                 (history shift, :722-727)
    x_{i+1} = px*x_i + pm0*m0 + pD*(q0*(m1-m0)/qk)                      [UniP]

Order warmup (``lower_order_nums``), ``lower_order_final`` and
``disable_corrector`` all fold into the per-step coefficients (a disabled
corrector is the identity: cx=0 base plus masks).  The predict-x0 / bh2
configuration used by every ChronoEdit config is assumed.

Solver state is float32 regardless of model dtype (strictly more accurate
than the reference's latent-dtype arithmetic).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.core.schedule import FlowMatchSchedule


class UniPCState(NamedTuple):
    """Carried solver state (all entries share the latent shape)."""

    x: jnp.ndarray  # current sample
    m0: jnp.ndarray  # last converted model output (x0 prediction)
    m1: jnp.ndarray  # second-to-last converted model output
    last_sample: jnp.ndarray  # sample before the last predictor step

    @classmethod
    def init(cls, x: jnp.ndarray) -> "UniPCState":
        x = x.astype(jnp.float32)
        z = jnp.zeros_like(x)
        return cls(x=x, m0=z, m1=z, last_sample=z)

    def truncate(self, fn: Callable[[jnp.ndarray], jnp.ndarray]) -> "UniPCState":
        """Apply a shape-changing slice to every tensor (temporal-reasoning
        drop; reference pipeline_chronoedit.py:700-709 truncates latents,
        model_outputs and last_sample alike)."""
        return UniPCState(*(fn(t) for t in self))


@dataclasses.dataclass(frozen=True)
class UniPCCoeffs:
    """Per-step scalar coefficient table, host-precomputed in float64.

    Array shapes are (n,) where n = number of steps. Columns follow the
    update equations in the module docstring.
    """

    timesteps: np.ndarray  # value fed to the model (sigma*1000, floored)
    sigma: np.ndarray  # sigma_i for x0 conversion
    use_c: np.ndarray  # 1.0 where the corrector runs
    cx: np.ndarray
    cm0: np.ndarray
    cD: np.ndarray
    c_r0: np.ndarray
    c_r1: np.ndarray
    c_rk: np.ndarray  # guard value 1.0 where unused
    px: np.ndarray
    pm0: np.ndarray
    pD: np.ndarray
    p_q0: np.ndarray
    p_qk: np.ndarray

    @property
    def num_steps(self) -> int:
        return len(self.sigma)

    def slice(self, lo: int, hi: int) -> "UniPCCoeffs":
        return UniPCCoeffs(**{
            f.name: getattr(self, f.name)[lo:hi] for f in dataclasses.fields(self)
        })

    def stacked(self) -> jnp.ndarray:
        """(n, 14) float32 device array in field order, for lax.scan xs."""
        cols = [getattr(self, f.name) for f in dataclasses.fields(self)]
        return jnp.asarray(np.stack(cols, axis=1), jnp.float32)


def _lmbda(sigma: float) -> float:
    """lambda(sigma) = log(alpha) - log(sigma) with alpha = 1 - sigma."""
    if sigma <= 0.0:
        return math.inf
    return math.log(1.0 - sigma) - math.log(sigma)


def _bh_terms(h: float, solver_type: str) -> tuple[float, float, float, float]:
    """Returns (hh, h_phi_1, B_h, b1_b2_ready) pieces; fm_solvers_unipc.py:448-468."""
    hh = -h  # predict_x0 path
    h_phi_1 = math.expm1(hh)
    if solver_type == "bh1":
        B_h = hh
    elif solver_type == "bh2":
        B_h = h_phi_1
    else:
        raise ValueError(f"unknown solver_type {solver_type!r}")
    return hh, h_phi_1, B_h, 0.0


def make_unipc_coeffs(
    schedule: FlowMatchSchedule,
    solver_order: int = 2,
    solver_type: str = "bh2",
    lower_order_final: bool = True,
    disable_corrector: tuple[int, ...] = (),
    int_timesteps: bool = True,
) -> UniPCCoeffs:
    """Precompute all per-step UniPC scalars on the host (float64).

    Only solver_order in {1, 2} is implemented — 2 is the reference default
    and the only order any ChronoEdit config uses (fm_solvers_unipc.py:94).
    """
    if solver_order not in (1, 2):
        raise NotImplementedError("solver_order must be 1 or 2")
    sig = schedule.sigmas  # (n+1,), final entry 0
    n = schedule.num_steps
    lam = np.array([_lmbda(float(s)) for s in sig])

    # Static order bookkeeping (fm_solvers_unipc.py:729-748):
    #   p_order[i] = min(solver_order, lower_order_nums+1 [= i+1 capped],
    #                    n - i if lower_order_final)
    #   c_order[i] = p_order[i-1]; corrector runs for i>0 unless disabled.
    p_order = [
        min(solver_order, i + 1, (n - i) if lower_order_final else solver_order)
        for i in range(n)
    ]

    cols: dict[str, list[float]] = {k: [] for k in (
        "use_c", "cx", "cm0", "cD", "c_r0", "c_r1", "c_rk",
        "px", "pm0", "pD", "p_q0", "p_qk")}

    for i in range(n):
        # ---- corrector (UniC) at step i, moving sigma[i-1] -> sigma[i] ----
        use_c = i > 0 and (i - 1) not in disable_corrector
        c_order = p_order[i - 1] if i > 0 else 1
        if use_c:
            s_t, s_s0 = float(sig[i]), float(sig[i - 1])
            a_t = 1.0 - s_t
            h = lam[i] - lam[i - 1]
            hh, h_phi_1, B_h, _ = _bh_terms(h, solver_type)
            cx = s_t / s_s0
            cm0 = -a_t * h_phi_1
            cD = -a_t * B_h
            if c_order >= 2:
                rk = (lam[i - 2] - lam[i - 1]) / h
                # rhos_c solves [[1,1],[rk,1]] r = [b1,b2] (:604-622)
                hpk1 = h_phi_1 / hh - 1.0
                b1 = hpk1 * 1.0 / B_h
                hpk2 = hpk1 / hh - 0.5
                b2 = hpk2 * 2.0 / B_h
                r0 = (b1 - b2) / (1.0 - rk)
                r1 = b1 - r0
            else:
                rk, r0, r1 = 1.0, 0.0, 0.5  # order-1 simplification (:619-620)
        else:
            cx = cm0 = cD = r0 = r1 = 0.0
            rk = 1.0
        cols["use_c"].append(1.0 if use_c else 0.0)
        cols["cx"].append(cx)
        cols["cm0"].append(cm0)
        cols["cD"].append(cD)
        cols["c_r0"].append(r0)
        cols["c_r1"].append(r1)
        cols["c_rk"].append(rk)

        # ---- predictor (UniP) at step i, moving sigma[i] -> sigma[i+1] ----
        order = p_order[i]
        s_t, s_s0 = float(sig[i + 1]), float(sig[i])
        a_t = 1.0 - s_t
        h = lam[i + 1] - lam[i]
        if math.isinf(h):  # final sigma == 0: x_{n} = m0 exactly
            px, pm0, pD, q0, qk = 0.0, 1.0, 0.0, 0.0, 1.0
        else:
            hh, h_phi_1, B_h, _ = _bh_terms(h, solver_type)
            px = s_t / s_s0
            pm0 = -a_t * h_phi_1
            if order >= 2:
                qk = (lam[i - 1] - lam[i]) / h
                pD = -a_t * B_h
                q0 = 0.5  # order-2 simplified rhos_p (:473-474)
            else:
                pD, q0, qk = 0.0, 0.0, 1.0
        cols["px"].append(px)
        cols["pm0"].append(pm0)
        cols["pD"].append(pD)
        cols["p_q0"].append(q0)
        cols["p_qk"].append(qk)

    return UniPCCoeffs(
        timesteps=schedule.model_timesteps(int_timesteps),
        sigma=sig[:n].copy(),
        **{k: np.asarray(v) for k, v in cols.items()},
    )


def unipc_step(
    state: UniPCState, coeffs_row: jnp.ndarray, model_output: jnp.ndarray
) -> UniPCState:
    """One fused UniC+UniP update given this step's coefficient row.

    ``coeffs_row`` is one row of :meth:`UniPCCoeffs.stacked` (14 scalars in
    field order).  ``model_output`` is the raw velocity prediction.
    """
    (_, sigma, use_c, cx, cm0, cD, c_r0, c_r1, c_rk,
     px, pm0, pD, p_q0, p_qk) = [coeffs_row[j] for j in range(14)]

    x, m0, m1, last_sample = state
    v = model_output.astype(jnp.float32)

    # flow prediction -> x0 prediction (fm_solvers_unipc.py:333-336)
    x0 = x - sigma * v

    # UniC corrector (identity when use_c == 0)
    d1s = (m1 - m0) / c_rk
    x_c = cx * last_sample + cm0 * m0 + cD * (c_r0 * d1s + c_r1 * (x0 - m0))
    x = jnp.where(use_c > 0.5, x_c, x)

    # history shift
    m1, m0, last_sample = m0, x0, x

    # UniP predictor
    x_next = px * x + pm0 * m0 + pD * (p_q0 * (m1 - m0) / p_qk)
    return UniPCState(x=x_next, m0=m0, m1=m1, last_sample=last_sample)


def run_unipc(
    model_fn: Callable[..., jnp.ndarray],
    coeffs: UniPCCoeffs,
    state: UniPCState,
    start: int = 0,
    end: int | None = None,
    aux=None,
):
    """Scan UniPC over steps [start, end).

    ``model_fn(x, timestep_scalar) -> velocity`` is traced exactly once.
    Splitting the loop (e.g. for the temporal-reasoning drop, which changes
    latent shapes mid-trajectory) is just two ``run_unipc`` calls with a
    ``state.truncate`` between them.

    With ``aux`` (any pytree), the model carries solver-loop state — e.g.
    the Δ-DiT block-delta cache — as
    ``model_fn(x, t, step_index, aux) -> (velocity, aux)``, and
    ``(state, aux)`` is returned.
    """
    end = coeffs.num_steps if end is None else end
    rows = coeffs.slice(start, end).stacked()

    if aux is None:
        def body(st: UniPCState, row: jnp.ndarray):
            v = model_fn(st.x, row[0])
            return unipc_step(st, row, v), None

        state, _ = jax.lax.scan(body, state, rows)
        return state

    def body_aux(carry, xs):
        st, a = carry
        row, idx = xs
        v, a = model_fn(st.x, row[0], idx, a)
        return (unipc_step(st, row, v), a), None

    (state, aux), _ = jax.lax.scan(
        body_aux, (state, aux), (rows, jnp.arange(start, end)))
    return state, aux


def unipc_sample(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_init: jnp.ndarray,
    schedule: FlowMatchSchedule,
    solver_order: int = 2,
    **kwargs,
) -> jnp.ndarray:
    """Convenience one-shot sampler: noise in, denoised x0 out (float32)."""
    coeffs = make_unipc_coeffs(schedule, solver_order=solver_order, **kwargs)
    state = UniPCState.init(x_init)
    return run_unipc(model_fn, coeffs, state).x
