"""XLM-Roberta text tower cross-checked against the reference module
(xlm_roberta.py + clip.py XLMRobertaWithHead) on CPU torch."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference torch crosschecks, full tier

from tests.test_reference_crosscheck import REFERENCE


@pytest.fixture(scope="module")
def ref_mod():
    import os
    import sys

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from tests.test_reference_crosscheck import _stub_modules

    _stub_modules()
    # reference modules evaluate torch.cuda.current_device() in default args
    # at import time; make it benign on CPU
    import torch

    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"
    import chronoedit._src.modules.clip as ref_clip
    import chronoedit._src.modules.xlm_roberta as ref_xlmr

    return ref_xlmr, ref_clip


TINY = dict(vocab_size=64, max_seq_len=32, type_size=1, pad_id=1, dim=16,
            num_heads=2, num_layers=2, dropout=0.0, eps=1e-5)


def _ids():
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 64, (2, 12)).astype(np.int64)
    ids[0, 8:] = 1  # padded tail
    ids[1, 5:] = 1
    return ids


def test_encoder_matches_reference(ref_mod):
    import torch

    import jax.numpy as jnp

    from chronoedit_tpu.models.xlm_roberta import (
        XLMRobertaConfig, convert_xlm_roberta, xlm_roberta_encode)

    ref_xlmr, _ = ref_mod
    torch.manual_seed(0)
    ref = ref_xlmr.XLMRoberta(**TINY, post_norm=True).eval().float()
    params = convert_xlm_roberta(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=2)
    cfg = XLMRobertaConfig(vocab_size=64, max_seq_len=32, pad_id=1, dim=16,
                           num_heads=2, num_layers=2, post_norm=True)
    ids = _ids()
    with torch.no_grad():
        want = ref(torch.from_numpy(ids)).numpy()
    got = np.asarray(xlm_roberta_encode(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_head_variant_matches_reference(ref_mod):
    import torch

    import jax.numpy as jnp

    from chronoedit_tpu.models.xlm_roberta import (
        XLMRobertaConfig, convert_xlm_roberta, xlm_roberta_encode)

    _, ref_clip = ref_mod
    torch.manual_seed(1)
    ref = ref_clip.XLMRobertaWithHead(out_dim=8, **TINY).eval().float()
    params = convert_xlm_roberta(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=2)
    cfg = XLMRobertaConfig(vocab_size=64, max_seq_len=32, pad_id=1, dim=16,
                           num_heads=2, num_layers=2, post_norm=True,
                           out_dim=8)
    ids = _ids()
    with torch.no_grad():
        want = ref(torch.from_numpy(ids)).numpy()
    got = np.asarray(xlm_roberta_encode(params, cfg, jnp.asarray(ids)))
    assert got.shape == (2, 8)
    np.testing.assert_allclose(got, want, atol=2e-5)
