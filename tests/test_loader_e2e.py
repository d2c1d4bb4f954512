"""End-to-end checkpoint-directory loading: synthesize a reference-format
checkpoint dir on disk (safetensors DiT shards + torch VAE .pth + LoRA),
load through the public loader, and run an edit."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.configs import chronoedit_tiny
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import vae as vae_lib
from chronoedit_tpu.models import weights as weights_lib
from chronoedit_tpu.pipeline import load_pipeline
from tests.test_dit import _randomize


def _write_vae_pth(path, params):
    """Serialize our VAE pytree under the reference torch naming."""
    import torch

    sd = {}

    def put_conv(name, p):
        k = np.asarray(p["kernel"])
        w = np.transpose(k, (4, 3, 0, 1, 2))
        if w.shape[2] == 1 and "resample" in name:
            w = w[:, :, 0]
        sd[f"{name}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["bias"]))

    def put_rms(name, p):
        sd[f"{name}.gamma"] = torch.from_numpy(
            np.asarray(p["gamma"]).reshape(-1, 1, 1, 1))

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

    enc = params["encoder"]
    put_conv("encoder.conv1", enc["conv_in"])
    idx = 0
    for stage in enc["stages"]:
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

    dec = params["decoder"]
    put_conv("decoder.conv1", dec["conv_in"])
    put_res("decoder.middle.0", dec["mid"]["res1"])
    put_attn("decoder.middle.1", dec["mid"]["attn"])
    put_res("decoder.middle.2", dec["mid"]["res2"])
    idx = 0
    for stage in dec["stages"]:
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
    put_conv("conv1", params["quant_conv"])
    put_conv("conv2", params["post_quant_conv"])
    import torch

    torch.save(sd, path)


@pytest.mark.slow
def test_load_pipeline_from_synthesized_checkpoint(tmp_path):
    from safetensors.numpy import save_file

    cfg = chronoedit_tiny()
    dit_params = _randomize(
        dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit),
        jax.random.PRNGKey(1))
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(2), cfg.vae)

    # write a reference-format checkpoint dir: 2 DiT shards + VAE .pth + LoRA
    ckpt = tmp_path / "ChronoEdit-tiny"
    (ckpt / "transformer").mkdir(parents=True)
    sd = weights_lib.export_diffusers_dit(dit_params)
    keys = sorted(sd)
    half = len(keys) // 2
    save_file({k: sd[k] for k in keys[:half]},
              str(ckpt / "transformer" / "model-00001.safetensors"))
    save_file({k: sd[k] for k in keys[half:]},
              str(ckpt / "transformer" / "model-00002.safetensors"))
    _write_vae_pth(str(ckpt / "Wan2.1_VAE.pth"), vae_params)

    rng = np.random.default_rng(0)
    r = 2
    lora_sd = {
        "transformer.blocks.0.attn1.to_q.lora_A.weight":
            rng.standard_normal((r, cfg.dit.dim)).astype(np.float32) * 0.1,
        "transformer.blocks.0.attn1.to_q.lora_B.weight":
            rng.standard_normal((cfg.dit.dim, r)).astype(np.float32) * 0.1,
    }
    save_file(lora_sd, str(ckpt / "edit_lora.safetensors"))

    pipe = load_pipeline(cfg, str(ckpt),
                         loras=[(str(ckpt / "edit_lora.safetensors"), 1.0)])
    assert pipe.text_encoder is None  # no UMT5 staged

    # loaded pipeline runs an edit end-to-end
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 8, 8),
                             minval=-1, maxval=1)
    prompt = jax.random.normal(jax.random.PRNGKey(4), (1, 6, cfg.dit.text_dim))
    clip = jax.random.normal(jax.random.PRNGKey(5),
                             (1, cfg.dit.image_tokens, cfg.dit.image_dim))
    frame = pipe.edit_image(img, prompt, image_emb=clip,
                            key=jax.random.PRNGKey(6))
    assert frame.shape == (1, 3, 8, 8)
    assert bool(jnp.isfinite(frame).all())

    # LoRA was fused: differs from the raw-params pipeline
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    raw = ChronoEditPipeline(cfg, dit_params, vae_params)
    frame_raw = raw.edit_image(img, prompt, image_emb=clip,
                               key=jax.random.PRNGKey(6))
    assert float(jnp.abs(frame - frame_raw).max()) > 1e-6


def test_load_pipeline_missing_dir():
    with pytest.raises(FileNotFoundError):
        load_pipeline(chronoedit_tiny(), "/nonexistent/dir")
