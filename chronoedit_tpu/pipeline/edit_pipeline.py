"""ChronoEdit inference pipeline: image + prompt -> edited frame / video.

The public-API equivalent of the reference diffusers ``ChronoEditPipeline``
(``chronoedit_diffusers/pipeline_chronoedit.py:484-812``):

1. encode prompt (UMT5, 512 tokens) and image (CLIP ViT-H penultimate,
   257 tokens) — or accept precomputed embeddings;
2. ``prepare_latents``: random latents + a 20-channel condition built from a
   4-channel first-frame mask and the VAE encoding of [image, zeros x (T-1)]
   (pipeline_chronoedit.py:392-456);
3. flow-match UniPC denoise loop with CFG and optional temporal reasoning
   (mid-loop [first,last] frame drop, :700-709);
4. VAE decode (dual decode in reasoning mode, :776-781).

TPU-first differences:

- The whole denoise loop is one jitted ``lax.scan`` (two scans in reasoning
  mode, since the frame drop changes shapes) — no Python-step dispatch.
- CFG runs cond and uncond **batched in a single forward** (the reference
  issues two sequential DiT calls, :715-736) — same math, half the latency
  at the cost of 2x activation memory.
- Solver state is float32; weights/activations bf16 by default.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.core.schedule import make_flow_schedule
from chronoedit_tpu.core.unipc import UniPCState, make_unipc_coeffs, run_unipc
from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.models import vae as vae_lib

Params = Any


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    dit: dit_lib.DiTConfig = dit_lib.DiTConfig()
    vae: vae_lib.VAEConfig = vae_lib.VAEConfig()
    # sampling defaults (run_inference_diffusers.py:179-188; distilled LoRA
    # uses num_steps=8, guidance 1.0, shift 2.0)
    num_steps: int = 50
    guidance_scale: float = 5.0
    flow_shift: float = 5.0
    num_frames: int = 5  # pixel frames in edit mode (29 in reasoning mode)
    cfg_batched: bool = True
    # Δ-DiT-style training-free acceleration (arXiv:2406.01125): blocks
    # [a, b) contribute a cached token delta refreshed every cache_period
    # solver steps (1 = exact / off). The reference has no equivalent.
    cache_blocks: tuple[int, int] | None = None
    cache_period: int = 1
    # VAE W-tiling opt-in (round 5): None = the VAE's own auto rule (tile
    # only streaming trajectory paths). Capacity-squeezed configs — a
    # full-depth quantized DiT resident on one chip next to the 720p decode
    # temps — set 4 to trade ~1.35x post-mid decoder FLOPs for a ~4x cut in
    # the full-res fp32 norm temps (the r5 OOM dump's top allocations).
    vae_spatial_tiles: int | None = None
    # adaptive refresh (TeaCache-style, arXiv:2411.19108 — ours gates on the
    # solver latents' accumulated relative L1 change, a jit-friendly scalar
    # carried through the denoise scan instead of the timestep-modulated
    # input): when set, blocks [a, b) refresh whenever the accumulated
    # change since the last refresh crosses the threshold, overriding the
    # fixed period. 0.0 refreshes every step (exact); larger values trade
    # fidelity for fewer refreshes exactly where the trajectory is flat.
    cache_thresh: float | None = None

    @property
    def latent_channels(self) -> int:
        return self.vae.z_dim

    def resolve_num_frames(self, num_frames: int | None = None,
                           enable_temporal_reasoning: bool = False) -> int:
        """The pixel frame count a run will actually use: the 29-frame
        reasoning default or the edit default, rounded down to a
        VAE-compatible ``temporal_factor*k + 1`` (the reference warns and
        rounds the same way, pipeline_chronoedit.py:606-611). Single source
        of truth for __call__ and the batching server's latent shapes."""
        num_frames = num_frames or (29 if enable_temporal_reasoning
                                    else self.num_frames)
        tfac = self.vae.temporal_factor
        if num_frames % tfac != 1:
            num_frames = max(num_frames // tfac * tfac + 1, 1)
        return num_frames


def prepare_condition(
    vae_params: Params,
    cfg: PipelineConfig,
    image: jnp.ndarray,
    num_frames: int,
    mesh=None,
) -> jnp.ndarray:
    """Build the 20-channel conditioning volume from the input image.

    Args:
      image: (B, 3, H, W) in [-1, 1].
    Returns:
      (B, 4 + z_dim, Tl, H/8, W/8): first-frame mask channels ++ VAE-encoded
      [image, zeros] latents (pipeline_chronoedit.py:421-456).
    """
    b, c, h, w = image.shape
    tfac = cfg.vae.temporal_factor
    tl = cfg.vae.latent_frames(num_frames)
    video = jnp.concatenate(
        [image[:, :, None], jnp.zeros((b, c, num_frames - 1, h, w), image.dtype)],
        axis=2,
    )
    cond_latents = vae_lib.vae_encode(vae_params, cfg.vae, video, mesh=mesh,
                                      spatial_tiles=cfg.vae_spatial_tiles)

    hl, wl = h // cfg.vae.spatial_factor, w // cfg.vae.spatial_factor
    # mask over pixel frames: frame 0 -> 1, rest 0; first frame replicated
    # tfac times then folded (B, tfac, Tl, hl, wl)
    mask = np.zeros((tfac + num_frames - 1,), np.float32)
    mask[:tfac] = 1.0
    mask = mask.reshape(tl, tfac).T  # (tfac, Tl): fold then transpose
    mask = jnp.asarray(mask, cond_latents.dtype)
    mask = jnp.broadcast_to(mask[None, :, :, None, None], (b, tfac, tl, hl, wl))
    return jnp.concatenate([mask, cond_latents.astype(mask.dtype)], axis=1)


class ChronoEditPipeline:
    """Bundles model params/configs and exposes the edit API.

    Text/image encoders are optional components: pass precomputed
    ``prompt_emb``/``image_emb`` (the reference supports the same via
    ``prompt_embeds=``/``image_embeds=``), or attach ``text_encoder`` /
    ``image_encoder`` callables.
    """

    def __init__(
        self,
        config: PipelineConfig,
        dit_params: Params,
        vae_params: Params,
        text_encoder=None,
        image_encoder=None,
        guardrails=None,
        mesh=None,
    ):
        self.config = config
        self.dit_params = dit_params
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self.image_encoder = image_encoder
        self.guardrails = guardrails
        self.mesh = mesh
        self._jit_cache: dict = {}

    def quantize(self, skip: tuple = (),
                 mode: str = "int8",
                 upgrade: tuple = ()) -> "ChronoEditPipeline":
        """Switch the DiT to a quantized serving path (ops/quant.py):
        ``mode="int8"`` (w8a8, 2x MXU throughput) makes block projections
        int8 with per-channel scales; ``mode="int4"`` (w4a16 grouped) packs
        ALL block projections to int4 so the full 40-layer 14B model fits a
        single 16 GB v5e chip (~8.4 GB weights). Attention and the
        conditioning/head edges stay bf16 either way. Re-shards afterwards
        if a mesh is attached. Returns self.

        ``skip``: (module, name) projections to keep bf16 — the sensitivity
        escape hatch when a checkpoint fails the pipeline PSNR gate
        (docs/SERVING.md; ops.quant.rank_projection_sensitivity).

        ``upgrade``: (module, name) projections quantized at w8a8 int8
        inside an int4 pipeline — mixed precision, spending byte budget on
        the error-dominant projections (ops.quant.quantize_dit_params)."""
        from chronoedit_tpu.ops.quant import quantize_dit_params

        self.dit_params = quantize_dit_params(self.dit_params, skip=skip,
                                              mode=mode, upgrade=upgrade)
        if self.mesh is not None:
            from chronoedit_tpu.parallel.sharding import shard_params

            self.dit_params = shard_params(self.dit_params, self.mesh)
        self._jit_cache.clear()
        return self

    # -------------------------------------------------------------- encode

    def encode_prompt(self, prompt: str) -> jnp.ndarray:
        if self.text_encoder is None:
            raise ValueError("no text_encoder attached; pass prompt_emb instead")
        return self.text_encoder([prompt])

    def encode_image(self, image: jnp.ndarray) -> jnp.ndarray:
        if self.image_encoder is None:
            raise ValueError("no image_encoder attached; pass image_emb instead")
        return self.image_encoder(image)

    # -------------------------------------------------------------- denoise

    def _shard(self, x):
        """Sequence-shard a (B, C, T, H, W) tensor over the context axis when
        a mesh is attached (the CP split of broadcast_split_tensor).

        The reference splits on the frame axis; a 2-frame edit can't feed a
        context axis > 2, so when frames don't divide we shard the H token
        axis instead (the DiT flattens T*H*W — any divisible spatial axis
        yields the same balanced token split). Only if nothing divides do we
        replicate, with a warning (round-1 did this silently)."""
        if self.mesh is None or self.mesh.shape.get("context", 1) == 1:
            return x
        cp = self.mesh.shape["context"]
        from chronoedit_tpu.parallel.context import split_sequence

        if x.shape[2] % cp == 0:
            return split_sequence(x, self.mesh, seq_dim=2)
        if x.shape[3] % cp == 0:  # token-axis (H) split for short edits
            return split_sequence(x, self.mesh, seq_dim=3)
        import warnings

        warnings.warn(
            f"context axis {cp} divides neither frames ({x.shape[2]}) nor "
            f"height ({x.shape[3]}); running replicated — CP gives no "
            "speedup for this shape", stacklevel=2)
        return x

    def _model_fn(self, dit_params, condition, text_emb, neg_text_emb,
                  image_emb, guidance, slg_layers=(), stateful=False,
                  step0=0):
        """Velocity prediction closure for the solver, including CFG and
        optional SLG (skip-layer guidance: listed blocks are skipped in the
        *unconditional* forward, wan2pt1.py:842-843).

        With ``stateful`` (the Δ-DiT block cache, ``PipelineConfig.
        cache_blocks/cache_period/cache_thresh``), the closure has signature
        ``fn(x, t, step_idx, aux) -> (v, aux)`` — blocks [a, b) only run
        on refresh steps, otherwise their cached token delta is reused.
        Fixed-period mode refreshes every ``cache_period``-th step (counted
        from ``step0``, so a solver phase starting mid-trajectory refreshes
        on its first step) and ``aux`` is the bare cache array; adaptive
        mode (``cache_thresh``) refreshes when the latents' accumulated
        relative change crosses the threshold and ``aux`` also carries the
        accumulator and last-refresh latents."""
        cfg = self.config
        do_cfg = guidance > 1.0 and neg_text_emb is not None
        slg_mask = None
        if slg_layers:
            import numpy as np

            mask = np.ones((cfg.dit.num_layers,), np.float32)
            mask[list(slg_layers)] = 0.0
            slg_mask = jnp.asarray(mask)
        cache_kw = dict(cache_blocks=cfg.cache_blocks) if stateful else {}
        adaptive = stateful and cfg.cache_thresh is not None

        def decide(x, idx, aux):
            """Unpack the solver-carried aux -> (cache, refresh, pack) where
            ``pack(new_cache)`` rebuilds the aux for the next step.

            Fixed-period mode carries the bare cache array; adaptive mode
            carries {cache, acc, prev} and refreshes when the accumulated
            relative L1 change of the latents since the last refresh crosses
            ``cfg.cache_thresh`` (always on the phase's first step)."""
            if not adaptive:
                return aux, (idx - step0) % cfg.cache_period == 0, lambda c: c
            xf = x.astype(jnp.float32)
            prev = aux["prev"]
            rel = (jnp.mean(jnp.abs(xf - prev))
                   / (jnp.mean(jnp.abs(prev)) + 1e-6))
            acc = aux["acc"] + rel
            refresh = (idx == step0) | (acc >= cfg.cache_thresh)
            new_acc = jnp.where(refresh, 0.0, acc)
            return (aux["cache"], refresh,
                    lambda c: {"cache": c, "acc": new_acc, "prev": xf})

        def fwd(xin, ts, text, img, mask=None, cache=None, refresh=None):
            if not stateful:
                return dit_lib.dit_forward(
                    dit_params, cfg.dit, xin, ts, text, img,
                    layer_mask=mask, mesh=self.mesh)
            return dit_lib.dit_forward(
                dit_params, cfg.dit, xin, ts, text, img, mesh=self.mesh,
                cache=cache, cache_refresh=refresh, **cache_kw)

        if not do_cfg:
            def fn(x, t, idx=None, aux=None):
                xin = jnp.concatenate([x.astype(cfg.dit.dtype), condition], axis=1)
                ts = jnp.broadcast_to(t, (x.shape[0],))
                if not stateful:
                    return fwd(xin, ts, text_emb, image_emb)
                cache, refresh, pack = decide(x, idx, aux)
                v, c = fwd(xin, ts, text_emb, image_emb, cache=cache,
                           refresh=refresh)
                return v, pack(c)
            return fn

        if cfg.cfg_batched and slg_mask is None:
            text2 = jnp.concatenate([text_emb, neg_text_emb], axis=0)
            img2 = None if image_emb is None else jnp.concatenate([image_emb] * 2, axis=0)
            cond2 = jnp.concatenate([condition] * 2, axis=0)

            def fn(x, t, idx=None, aux=None):
                x2 = jnp.concatenate([x, x], axis=0).astype(cfg.dit.dtype)
                xin = jnp.concatenate([x2, cond2], axis=1)
                ts = jnp.broadcast_to(t, (x2.shape[0],))
                if stateful:
                    cache, refresh, pack = decide(x, idx, aux)
                    v, c = fwd(xin, ts, text2, img2, cache=cache,
                               refresh=refresh)
                else:
                    v, pack, c = fwd(xin, ts, text2, img2), None, None
                v_cond, v_uncond = jnp.split(v, 2, axis=0)
                v = v_uncond + guidance * (v_cond - v_uncond)
                return (v, pack(c)) if stateful else v
            return fn

        if stateful:
            raise ValueError("cache_blocks requires cfg_batched CFG (or "
                             "guidance 1.0) and no SLG layers")

        def fn(x, t):
            xin = jnp.concatenate([x.astype(cfg.dit.dtype), condition], axis=1)
            ts = jnp.broadcast_to(t, (x.shape[0],))
            v_cond = dit_lib.dit_forward(
                dit_params, cfg.dit, xin, ts, text_emb, image_emb,
                mesh=self.mesh)
            v_uncond = dit_lib.dit_forward(
                dit_params, cfg.dit, xin, ts, neg_text_emb, image_emb,
                layer_mask=slg_mask, mesh=self.mesh)
            return v_uncond + guidance * (v_cond - v_uncond)
        return fn

    def _make_run(self, *, num_frames, num_steps, guidance, shift,
                  reasoning, k_reason, slg_layers, output_type):
        """Build the pure end-to-end generate function for one static
        configuration (jitted and cached by __call__)."""
        cfg = self.config
        tl = cfg.vae.latent_frames(num_frames)
        schedule = make_flow_schedule(num_steps, shift=shift)
        coeffs = make_unipc_coeffs(schedule)

        def run(dit_params, vae_params, image, prompt_emb, neg_prompt_emb,
                image_emb, latents):
            condition = prepare_condition(vae_params, cfg, image, num_frames,
                                          mesh=self.mesh)
            condition = self._shard(condition)
            latents = self._shard(latents)
            model_fn = self._model_fn(dit_params, condition, prompt_emb,
                                      neg_prompt_emb, image_emb, guidance,
                                      slg_layers)

            use_cache = cfg.cache_blocks is not None and (
                cfg.cache_period > 1 or cfg.cache_thresh is not None)

            def stateful_fn(cond, step0):
                return self._model_fn(dit_params, cond, prompt_emb,
                                      neg_prompt_emb, image_emb, guidance,
                                      slg_layers, stateful=True, step0=step0)

            def cache0(lat):
                do_cfg = guidance > 1.0 and neg_prompt_emb is not None
                b_eff = lat.shape[0] * (2 if do_cfg else 1)
                s_tok = lat.shape[2] * (lat.shape[3] // 2) * (lat.shape[4] // 2)
                c = jnp.zeros((b_eff, s_tok, cfg.dit.dim), cfg.dit.dtype)
                if cfg.cache_thresh is None:
                    return c
                # adaptive mode: carry the change accumulator and the latents
                # as of the last refresh (the phase's first step always
                # refreshes, so acc/prev initial values are don't-cares)
                return {"cache": c, "acc": jnp.float32(0.0),
                        "prev": lat.astype(jnp.float32)}

            def phase(st, cond, start, end):
                """Solver steps [start, end); each phase carries its own
                block-delta cache (refreshed on its first step) since the
                token count changes at the reasoning drop."""
                if use_cache:
                    st, _ = run_unipc(stateful_fn(cond, start), coeffs, st,
                                      start, end, aux=cache0(st.x))
                    return st
                fn = model_fn if start == 0 else self._model_fn(
                    dit_params, cond, prompt_emb, neg_prompt_emb, image_emb,
                    guidance, slg_layers)
                return run_unipc(fn, coeffs, st, start, end)

            state = UniPCState.init(latents)
            if reasoning and 0 < k_reason < num_steps:
                # mid-loop drop: keep [first, last] after k steps
                # (pipeline_chronoedit.py:700-709 truncates latents,
                # condition, solver history and last_sample alike)
                state = phase(state, condition, 0, k_reason)
                keep = jnp.array([0, tl - 1])
                state = state.truncate(lambda t: t[:, :, keep])
                state = phase(state, condition[:, :, keep], k_reason,
                              num_steps)
            else:
                # full run; in reasoning mode (k >= num_steps, the reference
                # CLI default of 50/50) the trajectory survives to decoding
                state = phase(state, condition, 0, num_steps)

            final = state.x
            if output_type == "latent":
                return final

            if reasoning and k_reason > 0:
                # dual decode (pipeline_chronoedit.py:776-781)
                idx = jnp.array([0, final.shape[2] - 1])
                video_edit = vae_lib.vae_decode(
                    vae_params, cfg.vae, final[:, :, idx], mesh=self.mesh,
                    spatial_tiles=cfg.vae_spatial_tiles)
                video_reason = vae_lib.vae_decode(
                    vae_params, cfg.vae, final[:, :, :-1], mesh=self.mesh,
                    spatial_tiles=cfg.vae_spatial_tiles)
                return jnp.concatenate([video_reason, video_edit[:, :, 1:]],
                                       axis=2)
            return vae_lib.vae_decode(vae_params, cfg.vae, final,
                                      mesh=self.mesh,
                                      spatial_tiles=cfg.vae_spatial_tiles)

        return run

    # -------------------------------------------------------------- call

    def __call__(
        self,
        image: jnp.ndarray,
        prompt_emb: jnp.ndarray,
        neg_prompt_emb: jnp.ndarray | None = None,
        image_emb: jnp.ndarray | None = None,
        num_frames: int | None = None,
        num_steps: int | None = None,
        guidance_scale: float | None = None,
        flow_shift: float | None = None,
        enable_temporal_reasoning: bool = False,
        num_temporal_reasoning_steps: int = 0,
        slg_layers: tuple[int, ...] = (),
        prompt: str = "",  # raw prompt text, used only by text guardrails
        skip_text_guardrail: bool = False,  # caller already vetted the prompt
        key: jax.Array | None = None,
        latents: jnp.ndarray | None = None,
        output_type: str = "video",  # "video" | "latent"
    ):
        """Run the edit. Returns pixels (B, 3, T, H, W) in [-1, 1] (edit mode
        returns the 5-frame clip whose last frame is the edit result), or raw
        latents with ``output_type="latent"``."""
        cfg = self.config
        num_frames = cfg.resolve_num_frames(num_frames, enable_temporal_reasoning)
        num_steps = num_steps or cfg.num_steps
        guidance = cfg.guidance_scale if guidance_scale is None else guidance_scale
        shift = flow_shift or cfg.flow_shift
        if self.guardrails is not None and not skip_text_guardrail:
            self.guardrails.check_text_or_raise(prompt)

        b, _, h, w = image.shape
        tl = cfg.vae.latent_frames(num_frames)
        hl, wl = h // cfg.vae.spatial_factor, w // cfg.vae.spatial_factor

        if latents is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            latents = jax.random.normal(
                key, (b, cfg.latent_channels, tl, hl, wl), jnp.float32)

        # one compiled program per static configuration (production path:
        # repeat edits with the same geometry reuse the executable)
        static_key = (
            num_frames, num_steps, float(guidance), float(shift),
            enable_temporal_reasoning, num_temporal_reasoning_steps,
            tuple(slg_layers), output_type, image.shape,
            prompt_emb.shape,
            None if neg_prompt_emb is None else neg_prompt_emb.shape,
            None if image_emb is None else image_emb.shape,
            id(self.mesh),  # closures capture the mesh
        )
        if static_key not in self._jit_cache:
            run = self._make_run(
                num_frames=num_frames, num_steps=num_steps, guidance=guidance,
                shift=shift, reasoning=enable_temporal_reasoning,
                k_reason=num_temporal_reasoning_steps, slg_layers=tuple(slg_layers),
                output_type=output_type)
            self._jit_cache[static_key] = jax.jit(run)
        out = self._jit_cache[static_key](
            self.dit_params, self.vae_params, image, prompt_emb,
            neg_prompt_emb, image_emb, latents)

        if output_type != "latent" and self.guardrails is not None:
            out = self.guardrails.check_video(out)
        return out

    def edit_image(self, image: jnp.ndarray, prompt_emb: jnp.ndarray, **kw) -> jnp.ndarray:
        """Convenience: returns just the edited frame (B, 3, H, W) — the last
        frame of the generated clip (run_inference_diffusers.py saves frame
        -1 as the edit result)."""
        video = self(image, prompt_emb, **kw)
        return video[:, :, -1]
