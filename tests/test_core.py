"""Golden tests for core math: schedule, RoPE, rectified flow, UniPC.

The UniPC oracle below re-implements the published UniPC update equations
(predict-x0, B(h)=bh2) directly from the algorithm with explicit Python-side
history — mirroring how the reference scheduler behaves — and the scan-based
solver must match it to float32 precision.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.core import rope as rope_lib
from chronoedit_tpu.core import rectified_flow as rf
from chronoedit_tpu.core.schedule import make_flow_schedule, train_sigmas
from chronoedit_tpu.core.unipc import UniPCState, make_unipc_coeffs, run_unipc, unipc_sample


# ---------------------------------------------------------------- schedule

def test_flow_schedule_endpoints_and_shift():
    sched = make_flow_schedule(num_steps=8, shift=2.0)
    assert sched.num_steps == 8
    assert sched.sigmas[-1] == 0.0
    # strictly decreasing
    assert np.all(np.diff(sched.sigmas) < 0)
    # first sigma: shift applied to 0.999 (via the reference's float32
    # round-trip of sigma_max — see core/schedule.py)
    s0 = float(np.float32(0.999))
    expected = 2.0 * s0 / (1 + (2.0 - 1) * s0)
    assert math.isclose(sched.sigmas[0], expected, rel_tol=1e-12)
    # timesteps = sigma * 1000
    np.testing.assert_allclose(sched.timesteps, sched.sigmas[:-1] * 1000)
    # int model timesteps are floored
    assert np.all(sched.model_timesteps() == np.floor(sched.timesteps))


def test_train_sigmas_identity_shift():
    s = train_sigmas(1000, shift=1.0)
    assert math.isclose(s[0], 0.999, rel_tol=1e-9)
    assert s[-1] == 0.0


# ---------------------------------------------------------------- rope

def test_rope_band_split():
    spec = rope_lib.Rope3DSpec(head_dim=128)
    assert spec.band_dims == (44, 42, 42)
    assert sum(spec.band_dims) == 128


def test_rope_rotation_matches_complex_reference():
    """apply_rope must equal the complex-multiplication formulation."""
    spec = rope_lib.Rope3DSpec(head_dim=12, theta=100.0)
    cos, sin = rope_lib.rope_3d_tables(spec, 2, 3, 4)
    S = 2 * 3 * 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, S, 12)).astype(np.float32)

    out = rope_lib.apply_rope(jnp.asarray(x), cos, sin)

    xc = x[..., 0::2] + 1j * x[..., 1::2]
    fc = np.asarray(cos) + 1j * np.asarray(sin)
    ref = xc * fc
    expected = np.empty_like(x)
    expected[..., 0::2] = ref.real
    expected[..., 1::2] = ref.imag
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_temporal_skip_rope():
    spec = rope_lib.Rope3DSpec(head_dim=12, temporal_skip_len=8)
    cos2, sin2 = rope_lib.temporal_skip_rope_tables(spec, 2, 2, 2)
    cos8, sin8 = rope_lib.rope_3d_tables(spec, 8, 2, 2)
    # 2-frame edit tables == rows [0, 7] of the 8-frame grid
    per_frame = 2 * 2
    np.testing.assert_allclose(np.asarray(cos2[:per_frame]), np.asarray(cos8[:per_frame]), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(cos2[per_frame:]), np.asarray(cos8[7 * per_frame:]), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sin2[per_frame:]), np.asarray(sin8[7 * per_frame:]), atol=1e-7
    )
    # video-prior path (T == skip_len) is the plain grid
    cosv, _ = rope_lib.temporal_skip_rope_tables(spec, 8, 2, 2)
    np.testing.assert_allclose(np.asarray(cosv), np.asarray(cos8), atol=1e-7)


# ---------------------------------------------------------------- rectified flow

def test_interpolation_and_velocity():
    cfg = rf.RectifiedFlowConfig(shift=1.0)
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (2, 4, 3, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), data.shape)
    sig = jnp.array([0.0, 1.0])
    x_t, v = rf.get_interpolation(noise, data, sig)
    np.testing.assert_allclose(np.asarray(x_t[0]), np.asarray(data[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_t[1]), np.asarray(noise[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(noise - data), atol=1e-6)
    # x0 recovery inverts the interpolation
    x0 = rf.x0_from_velocity(x_t, v, sig)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(data), atol=1e-5)


def test_discretize_time_boundaries():
    cfg = rf.RectifiedFlowConfig(shift=3.0)
    t, s = rf.discretize_time(jnp.array([0.0, 0.9999]), cfg)
    sigmas, timesteps = cfg.train_grid()
    assert math.isclose(float(t[0]), timesteps[0], rel_tol=1e-5)
    assert math.isclose(float(s[0]), sigmas[0], rel_tol=1e-5)
    assert math.isclose(float(t[1]), timesteps[-1], rel_tol=1e-4)


def test_logitnormal_sampling_range():
    cfg = rf.RectifiedFlowConfig()
    u = rf.sample_train_time(jax.random.PRNGKey(0), 512, cfg)
    assert float(u.min()) > 0.0 and float(u.max()) < 1.0
    assert 0.3 < float(u.mean()) < 0.7


# ---------------------------------------------------------------- UniPC oracle

def _oracle_unipc(model_fn, x, sigmas, solver_order=2):
    """Reference UniPC (predict-x0, bh2, lower_order_final) with explicit
    history, implemented straight from the update equations in float64."""

    def lam(s):
        return math.inf if s <= 0 else math.log(1 - s) - math.log(s)

    n = len(sigmas) - 1
    model_outputs = []  # converted x0 predictions, newest last
    last_sample = None
    this_order_prev = None
    x = x.astype(np.float64)

    for i in range(n):
        t = math.floor(sigmas[i] * 1000)
        v = model_fn(x, t).astype(np.float64)
        x0 = x - sigmas[i] * v

        use_corrector = i > 0 and last_sample is not None
        if use_corrector:
            order = this_order_prev
            s_t, s_s0 = sigmas[i], sigmas[i - 1]
            a_t = 1 - s_t
            h = lam(s_t) - lam(s_s0)
            hh = -h
            h_phi_1 = math.expm1(hh)
            B_h = h_phi_1
            m0 = model_outputs[-1]
            if order == 2:
                rk = (lam(sigmas[i - 2]) - lam(s_s0)) / h
                D1s0 = (model_outputs[-2] - m0) / rk
                hpk1 = h_phi_1 / hh - 1
                b1 = hpk1 / B_h
                b2 = (hpk1 / hh - 0.5) * 2 / B_h
                R = np.array([[1.0, 1.0], [rk, 1.0]])
                rhos = np.linalg.solve(R, np.array([b1, b2]))
                corr = rhos[0] * D1s0 + rhos[1] * (x0 - m0)
            else:
                corr = 0.5 * (x0 - m0)
            x = s_t / s_s0 * last_sample - a_t * h_phi_1 * m0 - a_t * B_h * corr

        model_outputs.append(x0)
        this_order = min(solver_order, len(model_outputs), n - i)
        this_order_prev = this_order
        last_sample = x

        s_t, s_s0 = sigmas[i + 1], sigmas[i]
        a_t = 1 - s_t
        if s_t == 0:
            x = model_outputs[-1]
        else:
            h = lam(s_t) - lam(s_s0)
            hh = -h
            h_phi_1 = math.expm1(hh)
            B_h = h_phi_1
            m0 = model_outputs[-1]
            x_ = s_t / s_s0 * x - a_t * h_phi_1 * m0
            if this_order == 2:
                rk = (lam(sigmas[i - 1]) - lam(s_s0)) / h
                D1s0 = (model_outputs[-2] - m0) / rk
                x = x_ - a_t * B_h * 0.5 * D1s0
            else:
                x = x_
    return x


@pytest.mark.parametrize("num_steps", [1, 2, 3, 8, 20])
def test_unipc_matches_oracle(num_steps):
    sched = make_flow_schedule(num_steps=num_steps, shift=2.0)

    def np_model(x, t):
        return 0.3 * x + math.sin(t / 100.0)

    def jx_model(x, t):
        return 0.3 * x + jnp.sin(t / 100.0)

    rng = np.random.default_rng(42)
    x0 = rng.standard_normal((2, 4, 2, 4, 4)).astype(np.float32)

    expected = _oracle_unipc(np_model, x0.copy(), sched.sigmas)
    got = unipc_sample(jx_model, jnp.asarray(x0), sched)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


def test_unipc_split_resume_matches_single_run():
    """Running [0,k) then [k,n) with carried state == one run — the mechanism
    behind the temporal-reasoning drop."""
    sched = make_flow_schedule(num_steps=10, shift=2.0)
    coeffs = make_unipc_coeffs(sched)

    def model(x, t):
        return 0.1 * x - 0.01 * t

    x0 = jnp.asarray(np.random.default_rng(7).standard_normal((1, 4, 4)), jnp.float32)
    full = run_unipc(model, coeffs, UniPCState.init(x0)).x

    st = run_unipc(model, coeffs, UniPCState.init(x0), start=0, end=4)
    split = run_unipc(model, coeffs, st, start=4).x
    np.testing.assert_allclose(np.asarray(split), np.asarray(full), atol=1e-6)


def test_unipc_state_truncate():
    x = jnp.ones((1, 4, 8, 2, 2))
    st = UniPCState.init(x)
    st2 = st.truncate(lambda t: t[:, :, jnp.array([0, -1])])
    assert st2.x.shape == (1, 4, 2, 2, 2)
