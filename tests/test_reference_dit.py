"""Cross-validation of the DiT against the reference's native
``EditWanModel`` (wan2pt1.py + chronoedit_14b.py) on CPU torch.

The native net's GPU-only dependencies are stubbed with plain-math
equivalents whose semantics are unambiguous:

- TransformerEngine ``DotProductAttention`` -> torch SDPA over (B,L,H,D)
  returning (B, L, H*D) (the TE bshd contract);
- flash-attn ``apply_rotary_emb(..., interleaved=True)`` -> the interleaved
  complex rotation;
- ``Tensor.cuda`` -> identity (the rope cache calls .cuda()).

Everything else that runs — patchify ordering, modulation order, norm
placement/eps, temporal-skip RoPE tables (incl. the video-prior branch),
the I2V dual cross-attention, head — is the reference's own code, compared
weight-for-weight through our native-dialect converter.
"""

import sys
import types

import numpy as np
import pytest

from tests.test_reference_crosscheck import REFERENCE, _stub_modules

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile


def _stub_te_and_flash():
    import importlib.machinery

    import torch
    import torch.nn.functional as tF

    def mk(name, pkg=False):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        if pkg:
            m.__path__ = []
        sys.modules[name] = m
        return m

    te = mk("transformer_engine", pkg=True)
    te_pt = mk("transformer_engine.pytorch", pkg=True)
    te_attn = mk("transformer_engine.pytorch.attention")

    class DotProductAttention(torch.nn.Module):
        """TE bshd contract: forward(q,k,v) with (B, L, H, D) -> (B, L, H*D)."""

        def __init__(self, num_heads, head_dim, num_gqa_groups=None,
                     attention_dropout=0.0, qkv_format="bshd",
                     attn_mask_type="no_mask", **kw):
            super().__init__()
            assert qkv_format == "bshd"

        def forward(self, q, k, v, **kw):
            out = tF.scaled_dot_product_attention(
                q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
            out = out.transpose(1, 2)
            return out.reshape(out.shape[0], out.shape[1], -1)

    te_attn.DotProductAttention = DotProductAttention
    te_pt.attention = te_attn
    te.pytorch = te_pt

    fa = mk("flash_attn", pkg=True)
    fa_layers = mk("flash_attn.layers", pkg=True)
    fa_rot = mk("flash_attn.layers.rotary")

    def apply_rotary_emb(x, cos, sin, interleaved=True, inplace=False):
        assert interleaved
        a, b = x[..., 0::2], x[..., 1::2]
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        out = torch.empty_like(x)
        out[..., 0::2] = a * c - b * s
        out[..., 1::2] = a * s + b * c
        return out

    fa_rot.apply_rotary_emb = apply_rotary_emb
    fa_layers.rotary = fa_rot
    fa.layers = fa_layers

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self


@pytest.fixture(scope="module")
def ref_edit_model_cls():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    _stub_modules()
    _stub_te_and_flash()
    import torch

    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from chronoedit._src.modules.selective_activation_checkpoint import SACConfig
    from chronoedit._src.networks.chronoedit_14b import EditWanModel

    return EditWanModel, SACConfig


@pytest.mark.parametrize("latent_frames", [2, 8])
def test_dit_matches_reference_native_edit_model(ref_edit_model_cls, latent_frames):
    """Edit mode (2 latent frames, temporal-skip endpoints) and video-prior
    mode (8 frames, full grid) both match the reference net exactly."""
    import torch

    import jax
    import jax.numpy as jnp

    from chronoedit_tpu.core.rope import Rope3DSpec
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import weights as weights_lib

    EditWanModel, SACConfig = ref_edit_model_cls
    torch.manual_seed(3)
    ref = EditWanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=10,
        dim=24, ffn_dim=32, freq_dim=8, text_dim=16, out_dim=4, num_heads=2,
        num_layers=2, qk_norm=True, cross_attn_norm=True, eps=1e-6,
        temporal_skip_p=True, temporal_skip_len=8,
        sac_config=SACConfig(mode="mm_only"), postpone_checkpoint=True,
    ).eval().float()
    # re-randomize: reference init zeroes the head, hiding block effects
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.15, 0.15)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = dit_lib.DiTConfig(
        patch_size=(1, 2, 2), num_heads=2, head_dim=12, in_channels=10,
        out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32, num_layers=2,
        image_dim=1280, image_tokens=3, temporal_skip=True,
        rope=Rope3DSpec(head_dim=12, temporal_skip_len=8),
        dtype=jnp.float32,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, weights_lib.convert_native_dit(sd, num_layers=2))

    rng = np.random.default_rng(4)
    T = latent_frames
    x = rng.standard_normal((1, 4, T, 4, 4)).astype(np.float32)
    y = rng.standard_normal((1, 6, T, 4, 4)).astype(np.float32)
    text = rng.standard_normal((1, 512, 16)).astype(np.float32)  # native hardcodes 512 text tokens (T5_CONTEXT_TOKEN_NUMBER)
    img = rng.standard_normal((1, 3, 1280)).astype(np.float32) * 0.1
    t = np.array([[487.0]], np.float32)

    with torch.no_grad():
        out_ref = ref(
            x_B_C_T_H_W=torch.from_numpy(x),
            timesteps_B_T=torch.from_numpy(t),
            crossattn_emb=torch.from_numpy(text),
            frame_cond_crossattn_emb_B_L_D=torch.from_numpy(img),
            y_B_C_T_H_W=torch.from_numpy(y),
        ).numpy()

    xin = jnp.concatenate([jnp.asarray(x), jnp.asarray(y)], axis=1)
    out = np.asarray(dit_lib.dit_forward(
        params, cfg, xin, jnp.asarray([487.0]), jnp.asarray(text),
        jnp.asarray(img)), np.float32)

    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3)
