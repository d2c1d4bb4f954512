"""Item datasets (validation-viz prompt/image pickles, item_dataset.py:35-305)."""

import numpy as np
import pytest

from chronoedit_tpu.data.item_dataset import (
    PromptItemDataset, make_sample_fn, write_item_dataset)


def _items(n, d=16, with_image=True):
    out = []
    for i in range(n):
        item = {
            "prompt": f"edit instruction {i}",
            "t5_text_embeddings": np.random.rand(5 + i, d).astype(np.float32),
        }
        if with_image:
            item["image"] = np.random.uniform(
                -1, 1, (3, 32, 32)).astype(np.float32)
        out.append(item)
    return out


def test_round_trip_padding_and_mask(tmp_path):
    write_item_dataset(str(tmp_path), _items(3))
    ds = PromptItemDataset(str(tmp_path), max_t5_length=12)
    assert len(ds) == 3
    it = ds[1]
    assert it["t5_text_embeddings"].shape == (12, 16)
    assert it["t5_text_mask"].sum() == 6  # 5 + idx(1) tokens
    np.testing.assert_array_equal(it["t5_text_embeddings"][6:], 0.0)
    assert it["prompt"] == "edit instruction 1"
    assert it["__idx__"] == 1


def test_range_and_length_validation(tmp_path):
    write_item_dataset(str(tmp_path), _items(4))
    ds = PromptItemDataset(str(tmp_path), start_index=1, end_index=3)
    assert len(ds) == 2
    assert ds[0]["__idx__"] == 1
    with pytest.raises(ValueError):
        PromptItemDataset(str(tmp_path), end_index=99)


@pytest.mark.slow
def test_sample_fn_drives_pipeline(tmp_path):
    import jax

    from chronoedit_tpu.configs import chronoedit_tiny
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    cfg = chronoedit_tiny()
    dit_params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae)
    pipe = ChronoEditPipeline(cfg, dit_params, vae_params)

    write_item_dataset(str(tmp_path), _items(1, d=cfg.dit.text_dim))
    ds = PromptItemDataset(str(tmp_path), max_t5_length=8)
    fn = make_sample_fn(pipe, ds, num_steps=2)
    out = fn(dit_params, guidance=1.0)
    assert out.ndim == 4 and np.isfinite(out).all()
