"""LoRA adapter + weight-converter tests (round-trip + effect checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import lora as lora_lib
from chronoedit_tpu.models import weights as weights_lib
from tests.test_dit import TINY, _inputs, _randomize


def _params():
    return _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                      jax.random.PRNGKey(1))


def test_lora_zero_init_is_identity():
    params = _params()
    cfg = lora_lib.LoRAConfig(rank=2)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(2), params, cfg)
    merged = lora_lib.merge_lora(params, lora, 1.0, cfg)
    x, ts, text, img = _inputs(TINY)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    out0 = dit_lib.dit_forward(params, TINY, *args)
    out1 = dit_lib.dit_forward(merged, TINY, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


@pytest.mark.slow
def test_lora_merge_changes_output_and_scales():
    params = _params()
    cfg = lora_lib.LoRAConfig(rank=2)
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(2), params, cfg)
    # make b nonzero so the adapter has effect
    lora = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(3), a.shape), lora)
    x, ts, text, img = _inputs(TINY)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    base = dit_lib.dit_forward(params, TINY, *args)
    m1 = dit_lib.dit_forward(lora_lib.merge_lora(params, lora, 1.0, cfg), TINY, *args)
    m0 = dit_lib.dit_forward(lora_lib.merge_lora(params, lora, 0.0, cfg), TINY, *args)
    assert float(jnp.abs(m1 - base).max()) > 1e-4
    np.testing.assert_allclose(np.asarray(m0), np.asarray(base), atol=1e-6)
    # merge must not mutate the original tree
    base2 = dit_lib.dit_forward(params, TINY, *args)
    np.testing.assert_allclose(np.asarray(base2), np.asarray(base), atol=0)


def test_multi_lora_stacking():
    params = _params()
    cfg = lora_lib.LoRAConfig(rank=2)
    l1 = init = lora_lib.init_lora_params(jax.random.PRNGKey(4), params, cfg)
    l1 = jax.tree_util.tree_map(lambda a: a + 0.05, init)
    l2 = jax.tree_util.tree_map(lambda a: a - 0.03, init)
    merged = lora_lib.merge_multi_lora(params, {"a": (l1, 0.7), "b": (l2, 0.5)}, cfg)
    # sequential merging equals the multi merge
    step = lora_lib.merge_lora(lora_lib.merge_lora(params, l1, 0.7, cfg), l2, 0.5, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(step)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dit_weights_roundtrip():
    """export -> convert must reproduce the exact pytree AND the forward."""
    params = _params()
    sd = weights_lib.export_diffusers_dit(params)
    # simulate a torch checkpoint: all float32 numpy + conv3d patch embed form
    dim = TINY.dim
    pe = sd["patch_embedding.weight"]  # (out=dim, in*patch) after export? -> (dim, 36)
    assert pe.shape == (dim, TINY.patch_dim)
    sd["patch_embedding.weight"] = pe.reshape(dim, TINY.in_channels, *TINY.patch_size)

    back = weights_lib.convert_diffusers_dit(sd, num_layers=TINY.num_layers)
    x, ts, text, img = _inputs(TINY)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    out0 = dit_lib.dit_forward(params, TINY, *args)
    out1 = dit_lib.dit_forward(
        jax.tree_util.tree_map(jnp.asarray, back), TINY, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


def test_diffusers_lora_conversion():
    """Synthesize a diffusers-dialect LoRA state dict and check the converted
    adapter produces the same delta as direct numpy math."""
    rng = np.random.default_rng(0)
    num_layers, din, dout, r = 2, TINY.dim, TINY.dim, 3
    sd = {}
    for i in range(num_layers):
        a = rng.standard_normal((r, din)).astype(np.float32)
        b = rng.standard_normal((dout, r)).astype(np.float32)
        sd[f"transformer.blocks.{i}.attn1.to_q.lora_A.weight"] = a
        sd[f"transformer.blocks.{i}.attn1.to_q.lora_B.weight"] = b
        sd[f"transformer.blocks.{i}.attn1.to_q.alpha"] = np.float32(r * 2)
    lora, scaling = weights_lib.convert_diffusers_lora(sd, num_layers=num_layers)
    assert scaling == 2.0
    ab = lora["blocks"]["self_attn"]["q"]
    assert ab["a"].shape == (num_layers, din, r)
    assert ab["b"].shape == (num_layers, r, dout)

    params = _params()
    merged = lora_lib.merge_lora(params, lora, scale=scaling)
    delta = (np.asarray(merged["blocks"]["self_attn"]["q"]["kernel"]) -
             np.asarray(params["blocks"]["self_attn"]["q"]["kernel"]))
    expect = np.einsum("lir,lro->lio", ab["a"], ab["b"]) * scaling
    np.testing.assert_allclose(delta, expect, atol=1e-5)


def test_musubi_lora_dialect():
    rng = np.random.default_rng(1)
    r = 2
    sd = {
        "lora_unet_blocks_0_ffn_0.lora_down.weight":
            rng.standard_normal((r, TINY.dim)).astype(np.float32),
        "lora_unet_blocks_0_ffn_0.lora_up.weight":
            rng.standard_normal((TINY.ffn_dim, r)).astype(np.float32),
    }
    lora, _ = weights_lib.convert_musubi_lora(sd, num_layers=2)
    assert lora["blocks"]["ffn"]["fc1"]["a"].shape == (2, TINY.dim, r)
    # layer 1 absent -> zeros
    assert np.all(lora["blocks"]["ffn"]["fc1"]["a"][1] == 0)


@pytest.mark.slow  # full synthetic VAE convert: ~40 s, full tier
def test_vae_weights_roundtrip_structure():
    """Build a reference-named VAE state dict synthetically, convert, and
    verify the tree matches init_vae_params structurally."""
    import dataclasses
    from chronoedit_tpu.models import vae as vae_lib

    cfg = vae_lib.VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                            temporal_downsample=(True,))
    ref = vae_lib.init_vae_params(jax.random.PRNGKey(0), cfg)

    # synthesize the torch-named dict from the reference tree via inverse maps
    sd = {}

    def put_conv(name, p):
        k = np.asarray(p["kernel"])  # (kt,kh,kw,in,out)
        w = np.transpose(k, (4, 3, 0, 1, 2))
        if w.shape[2] == 1 and "resample" in name:
            w = w[:, :, 0]  # Conv2d
        sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_rms(name, p):
        sd[f"{name}.gamma"] = np.asarray(p["gamma"]).reshape(-1, 1, 1, 1)

    def put_res(name, p):
        put_rms(f"{name}.residual.0", p["norm1"])
        put_conv(f"{name}.residual.2", p["conv1"])
        put_rms(f"{name}.residual.3", p["norm2"])
        put_conv(f"{name}.residual.6", p["conv2"])
        if "shortcut" in p:
            put_conv(f"{name}.shortcut", p["shortcut"])

    def put_attn(name, p):
        put_rms(f"{name}.norm", p["norm"])
        put_conv(f"{name}.to_qkv", p["qkv"])
        put_conv(f"{name}.proj", p["proj"])

    enc = ref["encoder"]
    put_conv("encoder.conv1", enc["conv_in"])
    idx = 0
    for i, stage in enumerate(enc["stages"]):
        for blk in stage["blocks"]:
            put_res(f"encoder.downsamples.{idx}", blk)
            idx += 1
        if "down" in stage:
            put_conv(f"encoder.downsamples.{idx}.resample.1", stage["down"])
            if "time_down" in stage:
                put_conv(f"encoder.downsamples.{idx}.time_conv", stage["time_down"])
            idx += 1
    put_res("encoder.middle.0", enc["mid"]["res1"])
    put_attn("encoder.middle.1", enc["mid"]["attn"])
    put_res("encoder.middle.2", enc["mid"]["res2"])
    put_rms("encoder.head.0", enc["head_norm"])
    put_conv("encoder.head.2", enc["head_conv"])

    dec = ref["decoder"]
    put_conv("decoder.conv1", dec["conv_in"])
    put_res("decoder.middle.0", dec["mid"]["res1"])
    put_attn("decoder.middle.1", dec["mid"]["attn"])
    put_res("decoder.middle.2", dec["mid"]["res2"])
    idx = 0
    for i, stage in enumerate(dec["stages"]):
        for blk in stage["blocks"]:
            put_res(f"decoder.upsamples.{idx}", blk)
            idx += 1
        if "up" in stage:
            if "time_up" in stage:
                put_conv(f"decoder.upsamples.{idx}.time_conv", stage["time_up"])
            put_conv(f"decoder.upsamples.{idx}.resample.1", stage["up"])
            idx += 1
    put_rms("decoder.head.0", dec["head_norm"])
    put_conv("decoder.head.2", dec["head_conv"])
    put_conv("conv1", ref["quant_conv"])
    put_conv("conv2", ref["post_quant_conv"])

    got = weights_lib.convert_wan_vae(sd, dim_mult=cfg.dim_mult,
                                      num_res_blocks=cfg.num_res_blocks,
                                      temporal_downsample=cfg.temporal_downsample)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref)
    got_leaves = jax.tree_util.tree_leaves_with_path(got)
    assert len(ref_leaves) == len(got_leaves)
    for (pa, va), (pb, vb) in zip(ref_leaves, got_leaves):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6,
                                   err_msg=str(pa))
