"""easy_io dispatch + new callbacks."""

import numpy as np
import pytest

from chronoedit_tpu.utils import easy_io
from chronoedit_tpu.train.callbacks import (
    DeviceMonitorCallback, ManualGarbageCollection, WandbCallback,
)


def test_easy_io_roundtrips(tmp_path):
    base = str(tmp_path)
    easy_io.dump({"a": 1}, f"{base}/x.json")
    assert easy_io.load(f"{base}/x.json") == {"a": 1}
    easy_io.dump(np.arange(4), f"{base}/x.npy")
    np.testing.assert_array_equal(easy_io.load(f"{base}/x.npy"), np.arange(4))
    easy_io.dump({"w": np.ones(2)}, f"{base}/x.npz")
    np.testing.assert_array_equal(easy_io.load(f"{base}/x.npz")["w"], np.ones(2))
    easy_io.dump([1, 2, 3], f"{base}/x.pkl")
    assert easy_io.load(f"{base}/x.pkl") == [1, 2, 3]
    easy_io.dump("hello", f"{base}/x.txt")
    assert easy_io.load(f"{base}/x.txt") == "hello"
    assert easy_io.exists(f"{base}/x.txt")
    assert not easy_io.exists(f"{base}/nope.txt")


def test_easy_io_custom_backend():
    store = {}
    easy_io.register_backend("mem", store.__getitem__,
                             lambda p, d: store.__setitem__(p, d))
    easy_io.dump({"k": "v"}, "mem://box.json")
    assert easy_io.load("mem://box.json") == {"k": "v"}
    with pytest.raises(ValueError):
        easy_io.get("s3missing://x")


class _T:
    pass


def test_device_monitor_callback():
    lines = []
    cb = DeviceMonitorCallback(every_n=1, log_fn=lines.append)
    cb.on_step_end(_T(), 0, {})
    assert lines and "GiB in use" in lines[0]


def test_manual_gc_callback():
    import gc

    cb = ManualGarbageCollection(every_n=1)
    cb.on_train_start(_T())
    assert not gc.isenabled()
    cb.on_step_end(_T(), 1, {})
    cb.on_train_end(_T())
    assert gc.isenabled()


def test_wandb_callback_noops_without_wandb():
    cb = WandbCallback()
    cb.on_train_start(_T())
    cb.on_step_end(_T(), 0, {"loss": 1.0})
    cb.on_train_end(_T())  # must not raise
