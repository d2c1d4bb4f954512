"""Indexed pickle "item" datasets for in-training validation visualization.

Equivalent of the reference's item_dataset.py
(``chronoedit/_src/datasets/item_dataset.py:35-305``): a directory of
``{index:06d}.pkl`` items plus a ``meta_info.json`` length record, each item
carrying a prompt, its precomputed UMT5 embedding (padded to a fixed length
with an attention mask), and optionally a conditioning image. Paths go
through easy_io, so ``s3://`` URIs work like the reference's S3 items.

Used by :class:`~chronoedit_tpu.train.callbacks.EveryNDrawSample` through
:func:`make_sample_fn`: a fixed, curated set of prompts/images rendered
every N steps under the EMA weights gives comparable validation grids
across a run.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np

from chronoedit_tpu.utils import easy_io


def write_item_dataset(path: str, items: list[dict[str, Any]]) -> None:
    """Create an item dataset: ``{i:06d}.pkl`` files + meta_info.json.

    Each item dict may carry: "prompt" (str), "t5_text_embeddings"
    ((L, D) float array, unpadded), "image" ((3, H, W) float array in
    [-1, 1], optional), and any extra keys (stored verbatim).
    """
    for i, item in enumerate(items):
        easy_io.dump(item, os.path.join(path, f"{i:06d}.pkl"))
    easy_io.dump({"length": len(items)}, os.path.join(path, "meta_info.json"))


class PromptItemDataset:
    """Prompt/embedding items for validation viz (PromptOnlyItemDataset).

    Items are loaded lazily per index; T5 embeddings are zero-padded to
    ``max_t5_length`` with a matching 0/1 mask (item_dataset.py:108-118).
    """

    def __init__(self, path: str, start_index: int = 0,
                 end_index: int | None = None, max_t5_length: int = 512):
        self.path = path
        meta = easy_io.load(os.path.join(path, "meta_info.json"))
        length = int(meta["length"])
        if end_index is None:
            end_index = length
        if length < end_index:
            raise ValueError(
                f"dataset {path} has {length} items, end_index {end_index}")
        self.start_index = start_index
        self.end_index = end_index
        self.max_t5_length = max_t5_length

    def __len__(self) -> int:
        return self.end_index - self.start_index

    def __getitem__(self, idx: int) -> dict[str, Any]:
        item = dict(easy_io.load(
            os.path.join(self.path, f"{self.start_index + idx:06d}.pkl")))
        emb = np.asarray(item.get("t5_text_embeddings"), np.float32)
        if emb.ndim != 2:
            raise ValueError(f"item {idx}: t5_text_embeddings must be (L, D)")
        L = min(emb.shape[0], self.max_t5_length)
        mask = np.zeros((self.max_t5_length,), np.int32)
        mask[:L] = 1
        padded = np.zeros((self.max_t5_length, emb.shape[1]), np.float32)
        padded[:L] = emb[:L]
        item["t5_text_embeddings"] = padded
        item["t5_text_mask"] = mask
        item["__idx__"] = self.start_index + idx
        return item


def make_sample_fn(pipeline, dataset: PromptItemDataset,
                   item_index: int = 0, **pipe_kwargs) -> Callable:
    """Build an ``EveryNDrawSample`` sample_fn from one curated item.

    Returns ``fn(params, guidance) -> (C, T, H, W)`` that runs the edit
    pipeline on the item's image+prompt embedding under the given (usually
    EMA) DiT params (every_n_draw_sample.py:65-130 semantics).
    """
    import jax
    import jax.numpy as jnp

    item = dataset[item_index]
    if "image" not in item:
        raise ValueError("item has no 'image'; edit-mode viz needs one")
    image = jnp.asarray(item["image"])[None]
    prompt_emb = jnp.asarray(item["t5_text_embeddings"])[None]

    def sample_fn(params, guidance):
        # swap in the (usually EMA) params only for this render — leaking
        # them into the shared pipeline would silently serve EMA weights to
        # every later caller (the reference scopes this with ema_scope,
        # wan_t2v_model.py:1076-1096)
        saved = pipeline.dit_params
        if params is not None:
            pipeline.dit_params = params
        try:
            out = pipeline(image, prompt_emb, guidance_scale=guidance,
                           key=jax.random.PRNGKey(item["__idx__"]),
                           **pipe_kwargs)
        finally:
            pipeline.dit_params = saved
        return np.asarray(out[0])

    return sample_fn
