"""High-level pipeline loading (the ``from_pretrained`` experience).

Builds a ready-to-run :class:`ChronoEditPipeline` from a staged checkpoint
directory (layout per ``utils/checkpoint_db.py``): diffusers DiT shards,
``Wan2.1_VAE.pth``, optional UMT5/CLIP towers, optional LoRAs.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp

from chronoedit_tpu.models import lora as lora_lib
from chronoedit_tpu.models import weights as w
from chronoedit_tpu.pipeline.edit_pipeline import ChronoEditPipeline, PipelineConfig


def load_pipeline(
    config: PipelineConfig,
    checkpoint_dir: str,
    loras: list[tuple[str, float]] | None = None,
    with_text_encoder: bool = True,
    with_image_encoder: bool = True,
    mesh=None,
    guardrails=None,
) -> ChronoEditPipeline:
    """Load every staged component and fuse any LoRAs.

    Args:
      loras: [(path, scale), ...] — fused in order (stacking multiplies
        through, matching multi-adapter activation).
    """
    shards = (sorted(glob.glob(os.path.join(checkpoint_dir, "transformer",
                                            "*.safetensors")))
              or sorted(glob.glob(os.path.join(checkpoint_dir, "*.safetensors"))))
    if not shards:
        raise FileNotFoundError(f"no DiT safetensors under {checkpoint_dir}")
    dit_params = w.convert_diffusers_dit(w.load_safetensors(shards),
                                         num_layers=config.dit.num_layers)

    vae_path = os.path.join(checkpoint_dir, "Wan2.1_VAE.pth")
    vae_params = w.convert_wan_vae(
        w.load_torch(vae_path),
        dim_mult=config.vae.dim_mult,
        num_res_blocks=config.vae.num_res_blocks,
        temporal_downsample=config.vae.temporal_downsample)

    cast = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, config.dit.param_dtype), t)
    dit_params, vae_params = cast(dit_params), cast(vae_params)

    for path, scale in loras or []:
        sd = (w.load_safetensors(path) if path.endswith(".safetensors")
              else w.load_torch(path))
        try:
            adapter, scaling = w.convert_diffusers_lora(sd, config.dit.num_layers)
        except ValueError:
            adapter, scaling = w.convert_musubi_lora(sd, config.dit.num_layers)
        dit_params = lora_lib.merge_lora(dit_params, adapter, scale * scaling)

    text_encoder = image_encoder = None
    t5_path = os.path.join(checkpoint_dir, "models_t5_umt5-xxl-enc-bf16.pth")
    if with_text_encoder and os.path.exists(t5_path):
        from chronoedit_tpu.models.umt5 import UMT5TextEncoder, convert_umt5_checkpoint

        text_encoder = UMT5TextEncoder(
            convert_umt5_checkpoint(w.load_torch(t5_path)))
    clip_glob = glob.glob(os.path.join(checkpoint_dir, "models_clip_*.pth"))
    if with_image_encoder and clip_glob:
        from chronoedit_tpu.models.clip import (
            CLIPImageEncoder, convert_clip_vision_checkpoint)

        image_encoder = CLIPImageEncoder(
            convert_clip_vision_checkpoint(w.load_torch(clip_glob[0])))

    if mesh is not None:
        from chronoedit_tpu.parallel import shard_params
        from chronoedit_tpu.parallel.sharding import dit_param_sharding, replicate

        dit_params = shard_params(dit_params, mesh, dit_param_sharding(mesh))
        vae_params = replicate(vae_params, mesh)

    return ChronoEditPipeline(config, dit_params, vae_params,
                              text_encoder=text_encoder,
                              image_encoder=image_encoder,
                              guardrails=guardrails, mesh=mesh)
