"""Synthetic datasets — the mock data configs every experiment can train on
(reference ``configs/common/mock_data.py:22-62`` + ``mock_dataset.py``; each
real experiment registers a ``*_mock`` twin so smoke runs need no data)."""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np


@dataclasses.dataclass(frozen=True)
class MockEditDataset:
    """Deterministic random edit pairs: video whose first frame is the
    "input" and last frame the "edit result", plus precomputed text/image
    embedding stand-ins."""

    batch_size: int = 1
    num_frames: int = 5
    height: int = 32
    width: int = 32
    text_tokens: int = 512
    text_dim: int = 4096
    image_tokens: int = 257
    image_dim: int = 1280
    seed: int = 0

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed)
        while True:
            yield {
                "video": rng.uniform(
                    -1, 1, (self.batch_size, 3, self.num_frames,
                            self.height, self.width)).astype(np.float32),
                "text_emb": rng.standard_normal(
                    (self.batch_size, self.text_tokens, self.text_dim)
                ).astype(np.float32),
                "image_emb": rng.standard_normal(
                    (self.batch_size, self.image_tokens, self.image_dim)
                ).astype(np.float32),
                "prompt": ["mock edit instruction"] * self.batch_size,
            }


def mock_batch_iterator(vae_params, pipe_cfg, dataset: MockEditDataset | None = None,
                        **kw) -> Iterator[dict]:
    """Mock raw videos -> train-step-ready batches (latents + condition)."""
    import jax.numpy as jnp

    from chronoedit_tpu.train.train_step import edit_training_batch

    dataset = dataset or MockEditDataset(
        text_dim=pipe_cfg.dit.text_dim, text_tokens=8,
        image_tokens=pipe_cfg.dit.image_tokens,
        image_dim=pipe_cfg.dit.image_dim or 8, **kw)
    for raw in dataset:
        latents, condition = edit_training_batch(
            vae_params, pipe_cfg, jnp.asarray(raw["video"]))
        yield {
            "latents": latents,
            "condition": condition,
            "text_emb": jnp.asarray(raw["text_emb"]),
            "image_emb": jnp.asarray(raw["image_emb"]),
        }
