"""FULL-PIPELINE cross-validation against the reference, end to end.

Runs the complete edit pipeline twice at tiny geometry with identical
(random) weights and inputs:

- reference side: the reference's *own* components executing on CPU torch —
  EditWanModel (wan2pt1.py + chronoedit_14b.py), WanVAE_ streaming
  encoder/decoder (tokenizers/wan2pt1.py), FlowUniPCMultistepScheduler
  (fm_solvers_unipc.py) — glued exactly as pipeline_chronoedit.py does it:
  prepare_latents' [image, zeros] VAE condition + folded first-frame mask
  (:392-456), CFG (:715-736), scheduler.step loop (:694-756), final decode.
- our side: ``ChronoEditPipeline.__call__`` with the same weights through
  the native-dialect converters, same initial latents, embeddings, steps,
  shift and guidance.

The output *pixels* must agree at >= 35 dB PSNR (the BASELINE.md fidelity
bar, checked here at tiny scale with random weights since the released 14B
checkpoints are unreachable from this environment — see PARITY.md).
"""

import numpy as np
import pytest

from tests.test_reference_crosscheck import REFERENCE, _stub_modules
from tests.test_reference_dit import _stub_te_and_flash
from tests.test_reference_unipc import _stub_diffusers

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.abs(b).max())
    return 10 * np.log10(peak * peak / mse)


@pytest.fixture(scope="module")
def reference_components():
    import os
    import sys

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    _stub_modules()
    _stub_te_and_flash()
    _stub_diffusers()
    import torch

    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from chronoedit._src.models.fm_solvers_unipc import FlowUniPCMultistepScheduler
    from chronoedit._src.modules.selective_activation_checkpoint import SACConfig
    from chronoedit._src.networks.chronoedit_14b import EditWanModel
    from chronoedit._src.tokenizers.wan2pt1 import WanVAE_

    return EditWanModel, SACConfig, WanVAE_, FlowUniPCMultistepScheduler


@pytest.mark.parametrize("num_steps,shift,guidance", [(4, 2.0, 1.0),
                                                      (4, 5.0, 3.5)])
def test_full_pipeline_psnr_vs_reference(reference_components, num_steps,
                                         shift, guidance):
    import torch

    import jax
    import jax.numpy as jnp

    from chronoedit_tpu.core.rope import Rope3DSpec
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.models import weights as weights_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline
    from chronoedit_tpu.pipeline.edit_pipeline import PipelineConfig

    EditWanModel, SACConfig, WanVAE_, FlowUniPC = reference_components
    torch.manual_seed(11)

    # ---- shared tiny geometry: VAE 2x spatial / 2x temporal (z=4), DiT
    # in 10ch = 4 latent + (2 mask + 4 cond); image 8x8 -> latent 4x4;
    # edit clip = 3 pixel frames -> 2 latent frames
    ref_net = EditWanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=10,
        dim=24, ffn_dim=32, freq_dim=8, text_dim=16, out_dim=4, num_heads=2,
        num_layers=2, qk_norm=True, cross_attn_norm=True, eps=1e-6,
        temporal_skip_p=True, temporal_skip_len=8,
        sac_config=SACConfig(mode="mm_only"), postpone_checkpoint=True,
    ).eval().float()
    with torch.no_grad():
        for p in ref_net.parameters():
            p.uniform_(-0.15, 0.15)
    ref_vae = WanVAE_(dim=8, z_dim=4, dim_mult=[1, 2], num_res_blocks=1,
                      attn_scales=[], temperal_downsample=[True],
                      dropout=0.0).eval().float()

    vae_cfg = vae_lib.VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2),
                                num_res_blocks=1, temporal_downsample=(True,))
    dit_cfg = dit_lib.DiTConfig(
        patch_size=(1, 2, 2), num_heads=2, head_dim=12, in_channels=10,
        out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32, num_layers=2,
        image_dim=1280, image_tokens=3, temporal_skip=True,
        rope=Rope3DSpec(head_dim=12, temporal_skip_len=8), dtype=jnp.float32)
    pipe_cfg = PipelineConfig(dit=dit_cfg, vae=vae_cfg, num_steps=num_steps,
                              guidance_scale=guidance, flow_shift=shift,
                              num_frames=3)

    dit_params = jax.tree_util.tree_map(jnp.asarray, weights_lib.convert_native_dit(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()},
        num_layers=2))
    vae_params = jax.tree_util.tree_map(jnp.asarray, weights_lib.convert_wan_vae(
        {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()},
        dim_mult=vae_cfg.dim_mult, num_res_blocks=vae_cfg.num_res_blocks,
        temporal_downsample=vae_cfg.temporal_downsample))

    # ---- shared inputs
    rng = np.random.default_rng(12)
    image = rng.uniform(-1, 1, (1, 3, 8, 8)).astype(np.float32)
    text = (rng.standard_normal((1, 512, 16)) * 0.3).astype(np.float32)
    neg_text = (rng.standard_normal((1, 512, 16)) * 0.3).astype(np.float32)
    img_emb = (rng.standard_normal((1, 3, 1280)) * 0.1).astype(np.float32)
    lat0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)

    # ---- reference rollout (reference components, diffusers-pipeline glue)
    tfac, num_frames, hl, wl = 2, 3, 4, 4
    with torch.no_grad():
        video_cond = torch.cat(
            [torch.from_numpy(image).unsqueeze(2),
             torch.zeros(1, 3, num_frames - 1, 8, 8)], dim=2)
        cond_lat = ref_vae.encode(video_cond, scale=[0.0, 1.0])
        # folded first-frame mask (pipeline_chronoedit.py:447-456)
        mask = torch.ones(1, 1, num_frames, hl, wl)
        mask[:, :, 1:] = 0
        ff = torch.repeat_interleave(mask[:, :, 0:1], dim=2, repeats=tfac)
        mask = torch.cat([ff, mask[:, :, 1:]], dim=2)
        mask = mask.view(1, -1, tfac, hl, wl).transpose(1, 2)
        y = torch.cat([mask, cond_lat], dim=1)

        sched = FlowUniPC(num_train_timesteps=1000, solver_order=2, shift=1.0)
        sched.set_timesteps(num_steps, device="cpu", shift=shift)
        lat = torch.from_numpy(lat0.copy())
        for t in sched.timesteps:
            t_in = torch.full((1, 1), float(t))
            v_c = ref_net(x_B_C_T_H_W=lat, timesteps_B_T=t_in,
                          crossattn_emb=torch.from_numpy(text),
                          frame_cond_crossattn_emb_B_L_D=torch.from_numpy(img_emb),
                          y_B_C_T_H_W=y)
            if guidance > 1.0:
                v_u = ref_net(x_B_C_T_H_W=lat, timesteps_B_T=t_in,
                              crossattn_emb=torch.from_numpy(neg_text),
                              frame_cond_crossattn_emb_B_L_D=torch.from_numpy(img_emb),
                              y_B_C_T_H_W=y)
                v = v_u + guidance * (v_c - v_u)
            else:
                v = v_c
            lat = sched.step(v, t, lat, return_dict=False)[0]
        ref_pixels = ref_vae.decode(lat, scale=[0.0, 1.0]).numpy()

    # ---- our pipeline, same weights/inputs
    pipe = ChronoEditPipeline(pipe_cfg, dit_params, vae_params)
    out = np.asarray(pipe(
        jnp.asarray(image), jnp.asarray(text),
        neg_prompt_emb=jnp.asarray(neg_text) if guidance > 1.0 else None,
        image_emb=jnp.asarray(img_emb), num_frames=3,
        latents=jnp.asarray(lat0)), np.float32)

    assert out.shape == ref_pixels.shape
    db = psnr(out, ref_pixels)
    print(f"full-pipeline PSNR vs reference: {db:.1f} dB "
          f"(steps={num_steps} shift={shift} g={guidance})")
    assert db >= 35.0, f"PSNR {db:.1f} dB below the 35 dB bar"
