"""Cross-validation of the UniPC solver against the reference's actual
``FlowUniPCMultistepScheduler`` (fm_solvers_unipc.py), run on CPU torch.

The reference file imports diffusers only for plumbing (SchedulerMixin,
register_to_config, deprecate, output dataclass) — stubbed here with
zero-math shims — so the solver math exercised is the reference's own.
Our host-precomputed-coefficient scan must reproduce its trajectories.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile

REFERENCE = "/root/reference"


def _stub_diffusers():
    if "diffusers" in sys.modules and not getattr(
            sys.modules["diffusers"], "__chronoedit_stub__", False):
        return  # real diffusers present
    if "diffusers" in sys.modules:
        return
    import importlib.machinery

    def mk(name, pkg=False):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        if pkg:
            m.__path__ = []
        m.__chronoedit_stub__ = True
        sys.modules[name] = m
        return m

    d = mk("diffusers", pkg=True)
    cu = mk("diffusers.configuration_utils")
    ut = mk("diffusers.utils", pkg=True)
    su = mk("diffusers.schedulers", pkg=True)
    ssu = mk("diffusers.schedulers.scheduling_utils")

    class _Config(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class ConfigMixin:
        def register_to_config(self, **kw):
            cfg = getattr(self, "config", _Config())
            cfg.update(kw)
            self.config = cfg

    def register_to_config(init):
        import functools
        import inspect

        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = _Config({k: v for k, v in bound.arguments.items()
                           if k != "self"})
            self.config = cfg
            init(self, *args, **kwargs)

        return wrapper

    class SchedulerMixin:
        pass

    class KarrasDiffusionSchedulers:
        """Empty enum stand-in: only iterated for _compatibles names."""

        def __iter__(self):
            return iter(())

    import dataclasses

    @dataclasses.dataclass
    class SchedulerOutput:
        prev_sample: object = None

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    ut.deprecate = lambda *a, **k: None
    ut.is_scipy_available = lambda: True  # scipy is installed
    ssu.SchedulerMixin = SchedulerMixin
    ssu.SchedulerOutput = SchedulerOutput
    su.scheduling_utils = ssu
    d.configuration_utils = cu
    d.utils = ut
    d.schedulers = su
    d.ConfigMixin = ConfigMixin
    d.SchedulerMixin = SchedulerMixin
    # make KarrasDiffusionSchedulers iterable as a value
    d.schedulers.scheduling_utils.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers()
    ssu.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers()
    return d


@pytest.fixture(scope="module")
def ref_scheduler_cls():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    _stub_diffusers()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from chronoedit._src.models.fm_solvers_unipc import FlowUniPCMultistepScheduler

    return FlowUniPCMultistepScheduler


@pytest.mark.parametrize("num_steps,shift", [(8, 2.0), (20, 5.0), (3, 1.0)])
def test_unipc_trajectory_matches_reference(ref_scheduler_cls, num_steps, shift):
    import torch

    import jax.numpy as jnp

    from chronoedit_tpu.core.schedule import make_flow_schedule
    from chronoedit_tpu.core.unipc import unipc_sample

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    w = rng.standard_normal((1, 4, 1, 1, 1)).astype(np.float32) * 0.3

    def velocity_np(x, t):
        return 0.2 * x * w + np.sin(t / 200.0)

    # ---- reference rollout
    sched = ref_scheduler_cls(num_train_timesteps=1000, solver_order=2,
                              shift=1.0)
    sched.set_timesteps(num_steps, device="cpu", shift=shift)
    lat = torch.from_numpy(x0.copy())
    for t in sched.timesteps:
        v = torch.from_numpy(
            velocity_np(lat.numpy(), float(t)).astype(np.float32))
        lat = sched.step(v, t, lat, return_dict=False)[0]
    ref_out = lat.numpy()

    # ---- ours
    our_sched = make_flow_schedule(num_steps, shift=shift)
    # reference timesteps are int64-cast; ours floor — must agree
    np.testing.assert_allclose(our_sched.model_timesteps(),
                               sched.timesteps.numpy().astype(np.float64))

    def model(x, t):
        return 0.2 * x * jnp.asarray(w) + jnp.sin(t / 200.0)

    out = np.asarray(unipc_sample(model, jnp.asarray(x0), our_sched))
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-4)
