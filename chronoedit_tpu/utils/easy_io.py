"""URI-dispatch file IO (compact ``easy_io`` equivalent).

The reference routes all file IO through a backend+format dispatch layer
(``utils/easy_io/``, 4.9k LoC: local/S3/HTTP backends x pickle/json/yaml/
np/pt handlers). This is the same shape in miniature: ``load``/``dump``
dispatch on extension, ``get``/``put`` move bytes, backends register by URI
scheme. Local filesystem ships; object-store backends plug in via
:func:`register_backend` (zero-egress environments stage files locally).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Callable

import numpy as np

# scheme -> (reader(path)->bytes, writer(path, bytes))
_BACKENDS: dict[str, tuple[Callable, Callable]] = {}


def register_backend(scheme: str, reader: Callable[[str], bytes],
                     writer: Callable[[str, bytes], None]):
    _BACKENDS[scheme] = (reader, writer)


def _local_get(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _local_put(path: str, data: bytes):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


register_backend("file", _local_get, _local_put)


def _split(uri: str) -> tuple[str, str]:
    if "://" in uri:
        scheme, path = uri.split("://", 1)
        return scheme, path
    return "file", uri


def get(uri: str) -> bytes:
    scheme, path = _split(uri)
    if scheme not in _BACKENDS:
        raise ValueError(f"no backend registered for {scheme}:// URIs")
    return _BACKENDS[scheme][0](path)


def put(uri: str, data: bytes):
    scheme, path = _split(uri)
    if scheme not in _BACKENDS:
        raise ValueError(f"no backend registered for {scheme}:// URIs")
    _BACKENDS[scheme][1](path, data)


def exists(uri: str) -> bool:
    scheme, path = _split(uri)
    if scheme == "file":
        return os.path.exists(path)
    try:
        get(uri)
        return True
    except Exception:
        return False


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
