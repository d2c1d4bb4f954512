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


class _FakeS3Client:
    """In-memory stand-in implementing the boto3 client subset S3Backend
    uses (get_object/put_object/head_object/list_objects_v2)."""

    def __init__(self):
        self.store = {}

    def put_object(self, Bucket, Key, Body):
        self.store[(Bucket, Key)] = bytes(Body)

    def get_object(self, Bucket, Key):
        import io

        if (Bucket, Key) not in self.store:
            raise KeyError(Key)
        return {"Body": io.BytesIO(self.store[(Bucket, Key)])}

    def head_object(self, Bucket, Key):
        if (Bucket, Key) not in self.store:
            raise KeyError(Key)
        return {}

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        keys = sorted(k for (b, k) in self.store
                      if b == Bucket and k.startswith(Prefix))
        return {"Contents": [{"Key": k} for k in keys]}


def test_s3_backend_round_trip():
    import numpy as np

    from chronoedit_tpu.utils import easy_io

    easy_io.set_s3_client(_FakeS3Client())
    try:
        assert not easy_io.exists("s3://bkt/job/config.json")
        easy_io.dump({"a": 1, "b": [2, 3]}, "s3://bkt/job/config.json")
        assert easy_io.exists("s3://bkt/job/config.json")
        assert easy_io.load("s3://bkt/job/config.json") == {"a": 1, "b": [2, 3]}

        arr = np.arange(6).reshape(2, 3)
        easy_io.dump({"x": arr}, "s3://bkt/job/arrays.npz")
        got = easy_io.load("s3://bkt/job/arrays.npz")
        np.testing.assert_array_equal(got["x"], arr)

        keys = easy_io.list_dir_or_file("s3://bkt/job")
        assert keys == ["job/arrays.npz", "job/config.json"], keys
    finally:
        easy_io.set_s3_client(None)


def test_s3_backend_retries_then_raises():
    from chronoedit_tpu.utils import easy_io

    class _Flaky(_FakeS3Client):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def get_object(self, Bucket, Key):
            self.calls += 1
            if self.calls < 3:
                raise ConnectionError("transient")
            return super().get_object(Bucket, Key)

    flaky = _Flaky()
    flaky.put_object(Bucket="b", Key="k.txt", Body=b"ok")
    easy_io.set_s3_client(flaky)
    try:
        easy_io._S3.backoff_s = 0.01
        assert easy_io.get("s3://b/k.txt") == b"ok"
        assert flaky.calls == 3
    finally:
        easy_io.set_s3_client(None)
        easy_io._S3.backoff_s = 0.5


def test_http_backend_reads_local_server():
    import http.server
    import threading

    from chronoedit_tpu.utils import easy_io

    class _Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b'{"hello": "world"}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("localhost", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        uri = f"http://localhost:{srv.server_port}/cfg.json"
        assert easy_io.load(uri) == {"hello": "world"}
        import pytest

        with pytest.raises(NotImplementedError):
            easy_io.put(uri, b"nope")
    finally:
        srv.shutdown()


def test_heartbeat_writes_to_uri(tmp_path):
    from chronoedit_tpu.train.callbacks import HeartbeatCallback
    from chronoedit_tpu.utils import easy_io

    easy_io.set_s3_client(_FakeS3Client())
    try:
        cb = HeartbeatCallback(path="s3://bkt/job/heartbeat.txt", every_s=0.0)
        cb.on_step_end(None, 7, {})
        stamp = easy_io.get("s3://bkt/job/heartbeat.txt").decode()
        assert "step=7" in stamp
    finally:
        easy_io.set_s3_client(None)
