"""URI-dispatch file IO (compact ``easy_io`` equivalent).

The reference routes all file IO through a backend+format dispatch layer
(``utils/easy_io/``, 4.9k LoC: local/S3/HTTP backends x pickle/json/yaml/
np/pt handlers; S3 boto3 backends easy_io.py:166-1085). Same shape here:
``load``/``dump`` dispatch on extension, ``get``/``put`` move bytes,
backends register by URI scheme.

Shipped backends:
- ``file`` — local filesystem (default for bare paths).
- ``http``/``https`` — urllib reads (writes raise; the reference's HTTP
  backend is read-only too).
- ``s3`` — boto3 (lazy import; optional dependency). For tests and
  zero-egress environments, inject any client implementing
  get_object/put_object/head_object/list_objects_v2 via
  :func:`set_s3_client` (tests use an in-memory fake).

Custom backends plug in via :func:`register_backend`.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Callable

import numpy as np


class Backend:
    """Byte-level backend for one URI scheme."""

    def get(self, path: str) -> bytes:
        raise NotImplementedError

    def put(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def open(self, path: str):
        """Sequential read stream (file-like with ``read``). Default
        buffers the whole object; streaming backends override so
        multi-GB tar shards never sit in RAM at once."""
        import io

        return io.BytesIO(self.get(path))

    def exists(self, path: str) -> bool:
        try:
            self.get(path)
            return True
        except Exception:
            return False

    def list(self, path: str) -> list[str]:
        raise NotImplementedError(f"{type(self).__name__} cannot list")


_BACKENDS: dict[str, Backend] = {}


class _FnBackend(Backend):
    def __init__(self, reader, writer):
        self._reader, self._writer = reader, writer

    def get(self, path):
        return self._reader(path)

    def put(self, path, data):
        return self._writer(path, data)


def register_backend(scheme: str, reader=None, writer=None, *,
                     backend: Backend | None = None):
    """Register a scheme. Either a :class:`Backend`, or (reader, writer)
    callables for byte get/put (the round-1 API, kept compatible)."""
    _BACKENDS[scheme] = backend if backend is not None else _FnBackend(reader, writer)


class LocalBackend(Backend):
    def get(self, path):
        with open(path, "rb") as f:
            return f.read()

    def put(self, path, data):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def exists(self, path):
        return os.path.exists(path)

    def list(self, path):
        return sorted(os.listdir(path))

    def open(self, path):
        return open(path, "rb")


class HTTPBackend(Backend):
    """Read-only HTTP(S) (reference HTTPBackend, easy_io backends)."""

    def __init__(self, scheme: str = "https", timeout: float = 60.0):
        self.scheme = scheme
        self.timeout = timeout

    def get(self, path):
        from urllib.request import urlopen

        with urlopen(f"{self.scheme}://{path}", timeout=self.timeout) as r:
            return r.read()

    def put(self, path, data):
        raise NotImplementedError("HTTP backend is read-only")

    def open(self, path):
        from urllib.request import urlopen

        # the response object is file-like; the caller owns its lifetime
        return urlopen(f"{self.scheme}://{path}", timeout=self.timeout)

    def exists(self, path):
        from urllib.error import HTTPError
        from urllib.request import Request, urlopen

        url = f"{self.scheme}://{path}"
        try:  # HEAD, not a full GET
            urlopen(Request(url, method="HEAD"), timeout=self.timeout)
            return True
        except HTTPError as e:
            if e.code == 404:
                return False
            # servers that reject HEAD (405/403 on signed URLs): probe with
            # a 1-byte ranged GET before reporting missing (advisor r2)
            try:
                urlopen(Request(url, headers={"Range": "bytes=0-0"}),
                        timeout=self.timeout)
                return True
            except Exception:
                return False
        except Exception:
            return False


class S3Backend(Backend):
    """S3 object store via boto3 (optional dep; reference S3 backends,
    easy_io.py:166-1085 + checkpointer/s3_filesystem.py:48-322).

    Paths are ``bucket/key``. Retries with exponential backoff on get/put
    (the reference's retry_with_backoff)."""

    def __init__(self, client=None, retries: int = 3, backoff_s: float = 0.5):
        self._client = client
        self.retries = retries
        self.backoff_s = backoff_s

    @property
    def client(self):
        if self._client is None:
            try:
                import boto3  # optional dependency
            except ImportError as e:  # pragma: no cover - env without boto3
                raise ImportError(
                    "s3:// URIs need boto3 (pip install boto3) or an "
                    "injected client via easy_io.set_s3_client()") from e
            self._client = boto3.client("s3")
        return self._client

    @staticmethod
    def _bucket_key(path: str) -> tuple[str, str]:
        bucket, _, key = path.partition("/")
        if not bucket or not key:
            raise ValueError(f"s3 path must be bucket/key, got {path!r}")
        return bucket, key

    def _retry(self, fn):
        import time as _time

        err = None
        for attempt in range(self.retries):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 - backoff then re-raise
                err = e
                _time.sleep(self.backoff_s * 2 ** attempt)
        raise err

    def get(self, path):
        bucket, key = self._bucket_key(path)
        return self._retry(
            lambda: self.client.get_object(Bucket=bucket, Key=key)["Body"].read())

    def open(self, path):
        bucket, key = self._bucket_key(path)
        # boto3's StreamingBody is file-like; bytes flow as the tar reader
        # consumes them instead of buffering the whole shard
        return self._retry(
            lambda: self.client.get_object(Bucket=bucket, Key=key)["Body"])

    def put(self, path, data):
        bucket, key = self._bucket_key(path)
        self._retry(
            lambda: self.client.put_object(Bucket=bucket, Key=key, Body=data))

    def exists(self, path):
        bucket, key = self._bucket_key(path)
        try:
            self.client.head_object(Bucket=bucket, Key=key)
            return True
        except Exception:
            return False

    def list(self, path):
        bucket, prefix = self._bucket_key(path + "/x")  # allow bare bucket/dir
        prefix = prefix[:-1]
        out, token = [], None
        while True:
            kw = dict(Bucket=bucket, Prefix=prefix)
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            out += [c["Key"] for c in resp.get("Contents", [])]
            token = resp.get("NextContinuationToken")
            if not token:
                return out


_S3 = S3Backend()
register_backend("file", backend=LocalBackend())
register_backend("http", backend=HTTPBackend("http"))
register_backend("https", backend=HTTPBackend("https"))
register_backend("s3", backend=_S3)


def set_s3_client(client) -> None:
    """Inject an S3 client (boto3 or any object with the same API). Used by
    tests (in-memory fake) and for custom endpoints/credentials."""
    _S3._client = client


def _split(uri: str) -> tuple[str, str]:
    if "://" in uri:
        scheme, path = uri.split("://", 1)
        return scheme, path
    return "file", uri


def _backend(uri: str) -> tuple[Backend, str]:
    scheme, path = _split(uri)
    if scheme not in _BACKENDS:
        raise ValueError(f"no backend registered for {scheme}:// URIs")
    return _BACKENDS[scheme], path


def get(uri: str) -> bytes:
    be, path = _backend(uri)
    return be.get(path)


def open_stream(uri: str):
    """Sequential read stream for a URI (local file object, HTTP response,
    or S3 StreamingBody — whole-object buffering only as a fallback)."""
    be, path = _backend(uri)
    return be.open(path)


def put(uri: str, data: bytes):
    be, path = _backend(uri)
    be.put(path, data)


def exists(uri: str) -> bool:
    be, path = _backend(uri)
    return be.exists(path)


def list_dir_or_file(uri: str) -> list[str]:
    """List directory entries / object keys under a prefix (the reference's
    easy_io list_dir_or_file)."""
    be, path = _backend(uri)
    return be.list(path)


# ------------------------------------------------------------- formats

def load(uri: str) -> Any:
    """Load by extension: .json/.jsonl/.yaml/.npy/.npz/.pkl/.txt."""
    import io

    data = get(uri)
    ext = os.path.splitext(uri)[1].lower()
    if ext == ".json":
        return json.loads(data)
    if ext == ".jsonl":
        return [json.loads(line) for line in data.splitlines() if line.strip()]
    if ext in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(data)
    if ext == ".npy":
        return np.load(io.BytesIO(data), allow_pickle=False)
    if ext == ".npz":
        return dict(np.load(io.BytesIO(data), allow_pickle=False))
    if ext in (".pkl", ".pickle"):
        return pickle.loads(data)
    if ext == ".txt":
        return data.decode("utf-8")
    raise ValueError(f"unsupported extension {ext!r}")


def dump(obj: Any, uri: str):
    import io

    ext = os.path.splitext(uri)[1].lower()
    if ext == ".json":
        data = json.dumps(obj, indent=2).encode()
    elif ext in (".yaml", ".yml"):
        import yaml

        data = yaml.safe_dump(obj).encode()
    elif ext == ".npy":
        buf = io.BytesIO()
        np.save(buf, obj, allow_pickle=False)
        data = buf.getvalue()
    elif ext == ".npz":
        buf = io.BytesIO()
        np.savez(buf, **obj)
        data = buf.getvalue()
    elif ext in (".pkl", ".pickle"):
        data = pickle.dumps(obj)
    elif ext == ".txt":
        data = str(obj).encode()
    else:
        raise ValueError(f"unsupported extension {ext!r}")
    put(uri, data)
