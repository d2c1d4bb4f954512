"""Tar-shard streaming dataset ("webdataset"-style).

Compact equivalent of the reference's webdataset stack
(``chronoedit/_ext/imaginaire/datasets/webdataset/``, SURVEY §2.6): infinite
shard streams with per-host/per-worker distribution, grouped-by-key sample
assembly from tar members, pluggable decoders/augmentors, and a shuffle
buffer.

Pipeline: shards -> :class:`ShardDistributor` (host/worker split, infinite
shuffle) -> :func:`tar_samples` (group ``key.ext`` members) -> decoders ->
shuffle buffer -> batches.
"""

from __future__ import annotations

import io
import json
import random
import tarfile
from typing import Any, Callable, Iterable, Iterator

import numpy as np


class ShardDistributor:
    """Infinite, shuffled shard stream, partitioned across hosts/workers
    (the aspect-ratio-aware distributors reduce to this per-bucket;
    distributors/multi_aspect_ratio_v2.py:30-250)."""

    def __init__(self, shards: list[str], world_size: int = 1, rank: int = 0,
                 shuffle: bool = True, seed: int = 0):
        if not shards:
            raise ValueError("no shards")
        self.shards = list(shards)
        self.world_size = world_size
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed

    def __iter__(self) -> Iterator[str]:
        epoch = 0
        while True:
            order = list(self.shards)
            if self.shuffle:
                random.Random(self.seed + epoch).shuffle(order)
            mine = order[self.rank:: self.world_size]
            # keep ranks in lockstep even with uneven splits
            if not mine:
                mine = [order[self.rank % len(order)]]
            yield from mine
            epoch += 1


def tar_samples(shard_stream: Iterable[str]) -> Iterator[dict[str, bytes]]:
    """Group tar members into samples by basename key: ``abc.jpg`` +
    ``abc.json`` + ``abc.txt`` -> {"__key__": "abc", "jpg": ..., ...}."""
    for shard in shard_stream:
        with tarfile.open(shard, "r|*") as tf:
            current_key = None
            sample: dict[str, Any] = {}
            for member in tf:
                if not member.isfile():
                    continue
                name = member.name
                key, _, ext = name.partition(".")
                if key != current_key:
                    if sample:
                        yield sample
                    current_key = key
                    sample = {"__key__": key}
                sample[ext.lower()] = tf.extractfile(member).read()
            if sample:
                yield sample


# ------------------------------------------------------------- decoders

def decode_image(data: bytes) -> np.ndarray:
    """JPEG/PNG bytes -> (3, H, W) float32 in [-1, 1]."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, np.float32).transpose(2, 0, 1) / 127.5 - 1.0


def decode_json(data: bytes) -> Any:
    return json.loads(data.decode("utf-8"))


def decode_text(data: bytes) -> str:
    return data.decode("utf-8")


DEFAULT_DECODERS: dict[str, Callable[[bytes], Any]] = {
    "jpg": decode_image, "jpeg": decode_image, "png": decode_image,
    "webp": decode_image,
    "json": decode_json, "txt": decode_text,
    "npy": lambda b: np.load(io.BytesIO(b)),
}


def decode_samples(samples: Iterable[dict], decoders=None) -> Iterator[dict]:
    decoders = {**DEFAULT_DECODERS, **(decoders or {})}
    for s in samples:
        out = {}
        for k, v in s.items():
            fn = decoders.get(k)
            out[k] = fn(v) if fn else v
        yield out


def shuffle_buffer(samples: Iterable, size: int = 100, seed: int = 0) -> Iterator:
    """Bounded reservoir shuffle (webdataset detshuffle equivalent)."""
    rng = random.Random(seed)
    buf: list = []
    for s in samples:
        buf.append(s)
        if len(buf) >= size:
            yield buf.pop(rng.randrange(len(buf)))
    while buf:
        yield buf.pop(rng.randrange(len(buf)))


class WebDataset:
    """End-to-end tar-shard loader::

        ds = WebDataset(glob("shards/*.tar"), world_size=jax.process_count(),
                        rank=jax.process_index())
        for sample in ds:  # {"__key__", "jpg": (3,H,W) float32, "txt": str}
    """

    def __init__(self, shards: list[str], world_size: int = 1, rank: int = 0,
                 decoders=None, shuffle_size: int = 100,
                 augment: Callable[[dict], dict] | None = None, seed: int = 0):
        self.distributor = ShardDistributor(shards, world_size, rank, seed=seed)
        self.decoders = decoders
        self.shuffle_size = shuffle_size
        self.augment = augment
        self.seed = seed

    def __iter__(self) -> Iterator[dict]:
        stream = decode_samples(tar_samples(iter(self.distributor)), self.decoders)
        if self.shuffle_size > 1:
            stream = shuffle_buffer(stream, self.shuffle_size, self.seed)
        for s in stream:
            yield self.augment(s) if self.augment else s


def batched(samples: Iterable[dict], batch_size: int,
            stack_keys: tuple[str, ...] = ()) -> Iterator[dict]:
    """Group samples into batches; ``stack_keys`` are np.stack'ed, the rest
    are listed."""
    batch: list[dict] = []
    for s in samples:
        batch.append(s)
        if len(batch) == batch_size:
            out: dict[str, Any] = {}
            for k in batch[0]:
                vals = [b[k] for b in batch]
                out[k] = np.stack(vals) if k in stack_keys else vals
            yield out
            batch = []
