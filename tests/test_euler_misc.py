"""Euler sampler, resolution buckets, checkpoint registry, sampling callback."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.core.euler import euler_sample
from chronoedit_tpu.core.schedule import make_flow_schedule
from chronoedit_tpu.data.res_buckets import (
    VIDEO_RES_SIZE_INFO, area_matched_size, nearest_bucket,
)
from chronoedit_tpu.utils.checkpoint_db import REGISTRY, resolve


def test_euler_recovers_analytic_flow():
    """With the exact rectified-flow field v = noise - data, Euler converges
    to data as steps grow."""
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((1, 4, 2, 4, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(data.shape), jnp.float32)
    v = noise - data

    def model(x, t):
        return v

    out = euler_sample(model, noise, make_flow_schedule(50, shift=1.0))
    # sigma_max = 0.999 (not 1.0) leaves a ~1e-3 noise floor by construction
    err = float(jnp.abs(out - data).max())
    assert err < 1e-2, err


def test_euler_matches_unipc_direction():
    """Euler and UniPC should land close on a smooth field."""
    from chronoedit_tpu.core.unipc import unipc_sample

    def model(x, t):
        return 0.2 * x

    x0 = jnp.ones((1, 3, 3))
    sched = make_flow_schedule(40, shift=2.0)
    a = euler_sample(model, x0, sched)
    b = unipc_sample(model, x0, sched)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.05, atol=0.02)


def test_res_buckets():
    assert nearest_bucket(1080, 1920) == (720, 1280)
    assert nearest_bucket(1920, 1080) == (1280, 720)
    assert nearest_bucket(500, 500) == (880, 880)
    for table in VIDEO_RES_SIZE_INFO.values():
        for h, w in table.values():
            assert h % 16 == 0 and w % 16 == 0


def test_area_matched_size():
    h, w = area_matched_size(1080, 1920)
    assert h % 16 == 0 and w % 16 == 0
    assert math.isclose(w / h, 1920 / 1080, rel_tol=0.1)
    assert math.isclose(h * w, 720 * 1280, rel_tol=0.15)


def test_checkpoint_db():
    assert "chronoedit_14b_dit" in REGISTRY
    with pytest.raises(KeyError):
        resolve("nope")
    with pytest.raises(FileNotFoundError) as e:
        resolve("wan2.1_vae", root="/nonexistent")
    assert "hf://" in str(e.value)


def test_every_n_draw_sample(tmp_path):
    from chronoedit_tpu.train.callbacks import EveryNDrawSample

    calls = []

    def sample_fn(params, guidance):
        calls.append(guidance)
        return np.zeros((3, 8, 8), np.float32)

    cb = EveryNDrawSample(every_n=2, sample_fn=sample_fn,
                          out_dir=str(tmp_path), guidance_sweep=(1.0, 5.0))

    class FakeTrainer:
        _last_state = None

    cb.on_step_end(FakeTrainer(), 1, {})
    assert not calls
    cb.on_step_end(FakeTrainer(), 2, {})
    assert calls == [1.0, 5.0]
    assert len(list(tmp_path.iterdir())) == 2
