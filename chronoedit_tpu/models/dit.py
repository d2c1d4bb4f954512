"""Wan-style diffusion transformer (ChronoEdit-14B backbone), TPU-first.

Architecture parity with the reference ``ChronoEditTransformer3DModel``
(``chronoedit_diffusers/transformer_chronoedit.py``) / native ``WanModel``
(``chronoedit/_src/networks/wan2pt1.py``):

- Conv3d (1,2,2) patch-embed == reshape + matmul here (kernel==stride makes
  them identical; the reshape+matmul form feeds the MXU directly).
- N blocks of: AdaLN-zero 6-way modulation from a per-block
  ``scale_shift_table`` + shared time projection; self-attention with 3D
  (temporal-skip) RoPE and "rms_norm_across_heads" qk-norm; I2V
  cross-attention over 512 text tokens plus a separate 257-token CLIP image
  branch whose outputs are summed (transformer_chronoedit.py:81-104);
  gelu-tanh FFN.
- fp32 norms/modulation/residual-adds with a bf16 stream, fp32 RoPE from
  float64 host tables (see core.rope).

TPU-first design choices (not translations):

- All blocks are weight-stacked and driven by one ``lax.scan`` — one block
  trace regardless of depth, small compile, natural remat boundary, and the
  layout XLA wants for fsdp-sharded weights.
- Timesteps are always handled per-latent-frame ((B, T); a scalar timestep is
  a broadcast), so the same compiled function serves diffusers-style
  inference and the native per-frame training API (wan2pt1.py:745-757).
- Modulation runs on a (B, T, HW, D) view of the token stream so per-frame
  AdaLN never materializes per-token modulation tensors.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from chronoedit_tpu.core.rope import Rope3DSpec, rope_3d_tables, temporal_skip_rope_tables
from chronoedit_tpu.ops import layers as L
from chronoedit_tpu.ops.attention import dot_product_attention
from chronoedit_tpu.ops.fused_norms import (
    gated_residual, layer_norm_modulate, rms_norm_fused)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Static DiT hyperparameters.

    The 14B ChronoEdit configuration (transformer_chronoedit.py:341-360):
    patch (1,2,2), 40 heads x 128, in 36ch (16 latent + 4 mask + 16 cond),
    out 16ch, text 4096, freq 256, ffn 13824, 40 layers, image_dim 1280 with
    257 CLIP tokens.
    """

    patch_size: tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 40
    head_dim: int = 128
    in_channels: int = 36
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 13824
    num_layers: int = 40
    image_dim: int | None = 1280  # None => t2v (no image cross-attn branch)
    image_tokens: int = 257
    eps: float = 1e-6
    cross_attn_norm: bool = True
    temporal_skip: bool = True  # EditWanModel temporal-skip RoPE
    rope: Rope3DSpec = Rope3DSpec()
    # compute/storage dtypes
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # remat ("none" | "full" | "matmul_only" ~ reference SAC mm_only)
    remat: str = "none"
    # token-chunked FFN (round 5, VERDICT r4 #3): >1 runs the ffn as a
    # lax.map over S/chunks token slices — identical math, hidden-state
    # peak divided by `chunks` (the 28.8k-token reasoning hidden is 796 MB
    # bf16 per live copy). Serving capacity lever; 1 = off.
    ffn_chunks: int = 1
    # int8 q/k score matmuls in self-attention (round 5, VERDICT r4 #7):
    # serving-only (forward has no VJP) — per-token-quantized q and
    # mean-centered k feed s8 MXU score dots at twice the bf16 rate
    # (ops/flash_attention.flash_attention_qk_int8). Meant for the
    # quantized serving recipes at streamed (28.8k reasoning) shapes;
    # resident-planned short sequences silently stay bf16. PSNR-gated in
    # tests/test_quant.py. Off by default.
    attn_qk_int8: bool = False
    # context-parallel self-attention, used when a mesh with a context
    # axis > 1 is passed to dit_forward:
    # - "auto" (default): ulysses when heads divide the context axis, else
    #   ring — an explicit CP kernel is always preferred over gspmd, which
    #   all-gathers the full KV on every device.
    # - "ring": ppermute ring with per-hop Pallas flash tiles (TE
    #   cp_comm_type="p2p" equivalent, wan2pt1.py:301-353).
    # - "ulysses": all-to-all head resharding (xDiT USP equivalent).
    # - "gspmd": let XLA insert collectives around dense attention.
    context_parallel: str = "auto"

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def patch_dim(self) -> int:
        return self.in_channels * math.prod(self.patch_size)


# ================================================================= init

def init_dit_params(key: jax.Array, cfg: DiTConfig) -> Params:
    """Initialize a parameter pytree (init distributions follow
    wan2pt1.py:865-906: xavier for projections, N(0, 0.02) embedders,
    zero-init output head, randn/sqrt(dim) modulation tables)."""
    dim, pd = cfg.dim, cfg.param_dtype
    keys = iter(jax.random.split(key, 64))

    def normal_linear(d_in, d_out, std=0.02):
        return {
            "kernel": jax.random.normal(next(keys), (d_in, d_out), pd) * std,
            "bias": jnp.zeros((d_out,), pd),
        }

    params: Params = {
        "patch_embed": L.linear_init(next(keys), cfg.patch_dim, dim, dtype=pd),
        "time_embed": {
            "fc1": normal_linear(cfg.freq_dim, dim),
            "fc2": normal_linear(dim, dim),
        },
        "time_proj": L.linear_init(next(keys), dim, 6 * dim, dtype=pd),
        "text_embed": {
            "fc1": normal_linear(cfg.text_dim, dim),
            "fc2": normal_linear(dim, dim),
        },
        "head": {
            "proj": {
                "kernel": jnp.zeros((dim, cfg.out_channels * math.prod(cfg.patch_size)), pd),
                "bias": jnp.zeros((cfg.out_channels * math.prod(cfg.patch_size),), pd),
            },
            "scale_shift_table": jax.random.normal(next(keys), (2, dim), pd) / math.sqrt(dim),
        },
    }
    if cfg.image_dim is not None:
        params["img_embed"] = {
            "norm1": L.layer_norm_init(cfg.image_dim, dtype=pd),
            "fc1": L.linear_init(next(keys), cfg.image_dim, cfg.image_dim, dtype=pd),
            "fc2": L.linear_init(next(keys), cfg.image_dim, dim, dtype=pd),
            "norm2": L.layer_norm_init(dim, dtype=pd),
        }

    def block_params(k) -> Params:
        ks = iter(jax.random.split(k, 16))
        p: Params = {
            "scale_shift_table": jax.random.normal(next(ks), (6, dim), pd) / math.sqrt(dim),
            "self_attn": {
                "q": L.linear_init(next(ks), dim, dim, dtype=pd),
                "k": L.linear_init(next(ks), dim, dim, dtype=pd),
                "v": L.linear_init(next(ks), dim, dim, dtype=pd),
                "o": L.linear_init(next(ks), dim, dim, dtype=pd),
                "q_norm": L.rms_norm_init(dim, pd),
                "k_norm": L.rms_norm_init(dim, pd),
            },
            "cross_attn": {
                "q": L.linear_init(next(ks), dim, dim, dtype=pd),
                "k": L.linear_init(next(ks), dim, dim, dtype=pd),
                "v": L.linear_init(next(ks), dim, dim, dtype=pd),
                "o": L.linear_init(next(ks), dim, dim, dtype=pd),
                "q_norm": L.rms_norm_init(dim, pd),
                "k_norm": L.rms_norm_init(dim, pd),
            },
            "ffn": {
                "fc1": L.linear_init(next(ks), dim, cfg.ffn_dim, dtype=pd),
                "fc2": L.linear_init(next(ks), cfg.ffn_dim, dim, dtype=pd),
            },
        }
        if cfg.cross_attn_norm:
            p["norm2"] = L.layer_norm_init(dim, dtype=pd)
        if cfg.image_dim is not None:
            p["cross_attn"]["k_img"] = L.linear_init(next(ks), dim, dim, dtype=pd)
            p["cross_attn"]["v_img"] = L.linear_init(next(ks), dim, dim, dtype=pd)
            p["cross_attn"]["k_img_norm"] = L.rms_norm_init(dim, pd)
        return p

    block_keys = jax.random.split(next(keys), cfg.num_layers)
    params["blocks"] = jax.vmap(block_params)(block_keys)
    return params


# ================================================================= pieces

def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


def _self_attention(p: Params, x: jnp.ndarray, rope_cos, rope_sin,
                    cfg: DiTConfig, mesh=None):
    """Self-attention with qk rms-norm (across heads) and 3D RoPE.

    With a context-sharded token stream, RoPE tables are already per-global-
    position (full-length tables sliced by the sharding — the reference
    generates full-length RoPE then splits per CP rank, wan2pt1.py:69-90;
    GSPMD does that slicing for us).
    """
    from chronoedit_tpu.core.rope import apply_rope
    from chronoedit_tpu.parallel.mesh import InnerAxes

    q = rms_norm_fused(p["q_norm"], L.linear(p["q"], x), cfg.eps, mesh=mesh)
    k = rms_norm_fused(p["k_norm"], L.linear(p["k"], x), cfg.eps, mesh=mesh)
    v = L.linear(p["v"], x)
    q, k, v = (_split_heads(t, cfg.num_heads) for t in (q, k, v))
    cos, sin = rope_cos[:, None, :], rope_sin[:, None, :]  # broadcast over heads
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if isinstance(mesh, InnerAxes):
        # already inside a shard_map (pipeline stage): collectives over axis
        # NAMES, Pallas kernels shard-local. Heads are full inside stages
        # (tensor replicated there), so Ulysses whenever heads divide cp.
        if mesh.context is not None and mesh.context_size > 1:
            from chronoedit_tpu.parallel.context import (
                ring_attention_inner, ulysses_attention_inner)

            use_ulysses = (q.shape[2] % mesh.context_size == 0
                           and cfg.context_parallel != "ring")
            inner = ulysses_attention_inner if use_ulysses else ring_attention_inner
            out = inner(q, k, v, mesh.context, mesh.context_size)
        else:
            out = dot_product_attention(q, k, v, _sharded=True)
        return L.linear(p["o"], _merge_heads(out))

    cp_size = mesh.shape.get("context", 1) if mesh is not None else 1
    mode = cfg.context_parallel
    if mode == "auto" and cp_size > 1:
        # heads stay tensor-sharded inside the CP shard_map, so ulysses must
        # split the TP-*local* head count across the context axis
        tp_size = mesh.shape.get("tensor", 1)
        h_loc = (q.shape[2] // tp_size if q.shape[2] % tp_size == 0
                 else q.shape[2])
        mode = "ulysses" if h_loc % cp_size == 0 else "ring"
    use_cp = (mode in ("ring", "ulysses") and cp_size > 1
              and q.shape[1] % cp_size == 0)
    if use_cp:
        from chronoedit_tpu.parallel.context import ring_attention, ulysses_attention

        attn = ring_attention if mode == "ring" else ulysses_attention
        out = attn(q, k, v, mesh)
    else:
        out = dot_product_attention(q, k, v, mesh=mesh,
                                    qk_int8=cfg.attn_qk_int8)
    return L.linear(p["o"], _merge_heads(out))


def _cross_attention(p: Params, x: jnp.ndarray, text_ctx: jnp.ndarray,
                     img_ctx: jnp.ndarray | None, cfg: DiTConfig, mesh=None):
    """I2V cross-attention: text branch + (optional) image branch, summed
    (transformer_chronoedit.py:81-104).

    Under InnerAxes (inside a pipeline stage's shard_map), queries are
    context-local and the text/CLIP KV is replicated per shard — each shard
    attends its local queries against the full context, the same layout the
    mesh path's shard_map produces."""
    from chronoedit_tpu.parallel.mesh import InnerAxes

    inner = isinstance(mesh, InnerAxes)
    attn_mesh = None if inner else mesh

    q = rms_norm_fused(p["q_norm"], L.linear(p["q"], x), cfg.eps, mesh=mesh)
    q = _split_heads(q, cfg.num_heads)

    k = L.rms_norm(p["k_norm"], L.linear(p["k"], text_ctx), cfg.eps)
    v = L.linear(p["v"], text_ctx)
    out = dot_product_attention(q, _split_heads(k, cfg.num_heads),
                                _split_heads(v, cfg.num_heads),
                                mesh=attn_mesh, _sharded=inner)
    if img_ctx is not None:
        k_img = L.rms_norm(p["k_img_norm"], L.linear(p["k_img"], img_ctx), cfg.eps)
        v_img = L.linear(p["v_img"], img_ctx)
        out_img = dot_product_attention(q, _split_heads(k_img, cfg.num_heads),
                                        _split_heads(v_img, cfg.num_heads),
                                        mesh=attn_mesh, _sharded=inner)
        out = out + out_img
    return L.linear(p["o"], _merge_heads(out))


def _modulate(x_f32: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
              hw: int) -> jnp.ndarray:
    """Apply (1+scale)*x + shift with per-frame (B, T, D) scale/shift onto a
    (B, S, D) fp32 stream, S = T*hw."""
    b, s, d = x_f32.shape
    xt = x_f32.reshape(b, -1, hw, d)
    out = xt * (1.0 + scale[:, :, None, :]) + shift[:, :, None, :]
    return out.reshape(b, s, d)


def _gate(x: jnp.ndarray, delta: jnp.ndarray, gate: jnp.ndarray, hw: int,
          out_dtype) -> jnp.ndarray:
    """fp32 residual add of gate*delta with per-frame gate; returns out_dtype."""
    b, s, d = x.shape
    xt = x.astype(jnp.float32).reshape(b, -1, hw, d)
    dt = delta.astype(jnp.float32).reshape(b, -1, hw, d)
    out = xt + dt * gate[:, :, None, :]
    return out.reshape(b, s, d).astype(out_dtype)


def dit_block(p: Params, x: jnp.ndarray, text_ctx, img_ctx, e: jnp.ndarray,
              rope_cos, rope_sin, hw: int, cfg: DiTConfig, mesh=None) -> jnp.ndarray:
    """One transformer block (transformer_chronoedit.py:267-295).

    Args:
      x: (B, S, dim) bf16 token stream.
      e: (B, T, 6, dim) fp32 = scale_shift_table + time projection.
      hw: tokens per latent frame (S = T * hw).
    """
    table = p["scale_shift_table"].astype(jnp.float32)  # (6, dim)
    mods = e + table[None, None]  # (B, T, 6, dim)
    shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = (
        mods[:, :, i] for i in range(6)
    )

    # self-attention (fused fp32 LN + AdaLN modulate, fused gated residual)
    norm_x = layer_norm_modulate(x, scale_msa, shift_msa, hw, cfg.eps, mesh=mesh)
    attn = _self_attention(p["self_attn"], norm_x, rope_cos, rope_sin, cfg, mesh)
    x = gated_residual(x, attn, gate_msa, hw, mesh=mesh)

    # cross-attention (plain residual add, reference line 286)
    norm_x = L.layer_norm(p.get("norm2", {}), x, cfg.eps, out_dtype=x.dtype)
    x = x + _cross_attention(p["cross_attn"], norm_x, text_ctx, img_ctx, cfg, mesh)

    # ffn
    norm_x = layer_norm_modulate(x, c_scale, c_shift, hw, cfg.eps, mesh=mesh)
    ff = _ffn(p["ffn"], norm_x, cfg.ffn_chunks)
    x = gated_residual(x, ff, c_gate, hw, mesh=mesh)
    return x


def _ffn(p: Params, x: jnp.ndarray, chunks: int) -> jnp.ndarray:
    """fc2(gelu(fc1(x))), optionally token-chunked: with ``chunks > 1`` the
    hidden state materializes one S/chunks slice at a time (identical math;
    matmuls stay MXU-sized). Falls back to unchunked when S doesn't divide."""
    if chunks > 1 and x.shape[1] % chunks == 0:
        b, s, d = x.shape
        xc = jnp.moveaxis(x.reshape(b, chunks, s // chunks, d), 1, 0)
        yc = jax.lax.map(
            lambda xi: L.linear(p["fc2"], L.gelu_tanh(L.linear(p["fc1"], xi))),
            xc)
        return jnp.moveaxis(yc, 0, 1).reshape(b, s, yc.shape[-1])
    return L.linear(p["fc2"], L.gelu_tanh(L.linear(p["fc1"], x)))


# ================================================================= forward

def _patchify(x: jnp.ndarray, cfg: DiTConfig) -> tuple[jnp.ndarray, tuple[int, int, int]]:
    """(B, C, T, H, W) -> (B, S, C*pt*ph*pw) tokens + post-patch grid.

    Feature order (c, kt, kh, kw) matches Conv3d weight layout so diffusers
    conv kernels convert to the matmul kernel by pure reshape.
    """
    pt, ph, pw = cfg.patch_size
    b, c, t, h, w = x.shape
    gt, gh, gw = t // pt, h // ph, w // pw
    x = x.reshape(b, c, gt, pt, gh, ph, gw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # (B, gt, gh, gw, c, pt, ph, pw)
    return x.reshape(b, gt * gh * gw, c * pt * ph * pw), (gt, gh, gw)


def _unpatchify(tokens: jnp.ndarray, grid: tuple[int, int, int], cfg: DiTConfig) -> jnp.ndarray:
    """(B, S, out*pt*ph*pw) -> (B, out, T, H, W). Feature order (pt, ph, pw, c)
    per the reference unpatchify (transformer_chronoedit.py:463-467)."""
    pt, ph, pw = cfg.patch_size
    gt, gh, gw = grid
    b = tokens.shape[0]
    x = tokens.reshape(b, gt, gh, gw, pt, ph, pw, cfg.out_channels)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # (B, C, gt, pt, gh, ph, gw, pw)
    return x.reshape(b, cfg.out_channels, gt * pt, gh * ph, gw * pw)


def _condition_embeddings(params: Params, cfg: DiTConfig, timesteps: jnp.ndarray,
                          text_emb, image_emb):
    """Time/text/image condition embeddings (transformer_chronoedit.py:126-165).

    Returns (temb (B,T,dim) fp32, t_proj (B,T,6,dim) fp32, text_ctx, img_ctx).
    """
    dim = cfg.dim
    # time_embedder runs fp32 (it is in _keep_in_fp32_modules)
    sin_emb = L.sinusoidal_timestep_embedding(timesteps, cfg.freq_dim)
    te = params["time_embed"]
    temb = L.linear(te["fc2"], jax.nn.silu(L.linear(te["fc1"], sin_emb.astype(jnp.float32))))
    # reference casts temb to the stream dtype before time_proj, then the
    # blocks upcast again — keep that exact dance for parity
    temb_lp = temb.astype(cfg.dtype)
    t_proj = L.linear(params["time_proj"], jax.nn.silu(temb_lp))
    t_proj = t_proj.astype(jnp.float32).reshape(temb.shape[:-1] + (6, dim))

    tx = params["text_embed"]
    text_ctx = L.linear(tx["fc2"], L.gelu_tanh(L.linear(tx["fc1"], text_emb.astype(cfg.dtype))))

    img_ctx = None
    if image_emb is not None and cfg.image_dim is not None:
        ie = params["img_embed"]
        # FP32LayerNorm(eps 1e-5) -> Linear -> exact GELU -> Linear -> norm
        # (ChronoEditImageEmbedding, transformer_chronoedit.py:111-123)
        h = L.layer_norm(ie["norm1"], image_emb, eps=1e-5, out_dtype=cfg.dtype)
        h = jax.nn.gelu(L.linear(ie["fc1"], h), approximate=False)
        h = L.linear(ie["fc2"], h)
        img_ctx = L.layer_norm(ie["norm2"], h, eps=1e-5, out_dtype=cfg.dtype)
    return temb.astype(jnp.float32), t_proj, text_ctx, img_ctx


def dit_forward(
    params: Params,
    cfg: DiTConfig,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    text_emb: jnp.ndarray,
    image_emb: jnp.ndarray | None = None,
    layer_mask: jnp.ndarray | None = None,
    mesh=None,
    cache_blocks: tuple[int, int] | None = None,
    cache: jnp.ndarray | None = None,
    cache_refresh: jnp.ndarray | bool = True,
) -> jnp.ndarray:
    """Velocity prediction — see :func:`_dit_forward_impl` for the full
    contract.  With an explicit >1-device mesh every Pallas kernel (attention
    AND the fused norms) lives inside its own shard_map, so the multi-chip
    program keeps them (GSPMD cannot auto-partition Mosaic kernels).  Only
    the mesh-less pure-GSPMD path (input shardings alone drive partitioning)
    must degrade to the plain-XLA norm chain."""
    from chronoedit_tpu.utils.platform import multi_device_world

    args = (params, cfg, x, timesteps, text_emb, image_emb, layer_mask,
            mesh, cache_blocks, cache, cache_refresh)
    if mesh is None and multi_device_world():
        from chronoedit_tpu.ops import fused_norms

        with fused_norms.plain_norms():
            return _dit_forward_impl(*args)
    return _dit_forward_impl(*args)


def _dit_forward_impl(
    params: Params,
    cfg: DiTConfig,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    text_emb: jnp.ndarray,
    image_emb: jnp.ndarray | None = None,
    layer_mask: jnp.ndarray | None = None,
    mesh=None,
    cache_blocks: tuple[int, int] | None = None,
    cache: jnp.ndarray | None = None,
    cache_refresh: jnp.ndarray | bool = True,
) -> jnp.ndarray:
    """Velocity prediction.

    Args:
      params: pytree from :func:`init_dit_params` (blocks weight-stacked).
      x: (B, C_in, T, H, W) noisy latents (+condition channels) in any dtype.
      timesteps: (B,) shared or (B, T) per-latent-frame, in [0, 1000).
      text_emb: (B, 512, text_dim) UMT5 embeddings.
      image_emb: (B, 257, image_dim) CLIP penultimate features, or None.
      layer_mask: optional (num_layers,) 0/1 floats; 0 skips a block (SLG
        layer-skip guidance, wan2pt1.py:842-843).
      cache_blocks/cache/cache_refresh: Δ-DiT-style step cache
        (arXiv:2406.01125): blocks [a, b) of the stack contribute a token
        *delta* that changes slowly across adjacent solver steps. On
        ``cache_refresh`` steps those blocks run and their delta is saved;
        otherwise the saved delta is added in their place. Returns
        ``(out, new_cache)`` when active. Exact when refresh is always True.

    Returns:
      (B, C_out, T, H, W) in cfg.dtype (plus the cache when active).
    """
    b, c, t, h, w = x.shape
    tokens, grid = _patchify(x.astype(cfg.dtype), cfg)
    gt, gh, gw = grid
    hw = gh * gw
    tokens = L.linear(params["patch_embed"], tokens)

    # pin the flattened token axis to the context shards: a 5D input sharded
    # on an inner spatial axis (the pipeline's W fallback for short edits)
    # strides the token order, and the per-frame modulation reshape then
    # forces GSPMD to re-gather tokens every block (round-2 HLO audit: one
    # full-sequence f32 all-gather per layer). Contiguous token blocks
    # survive both the (B,T,hw,D) reshape and the CP attention shard_map.
    cp = mesh.shape.get("context", 1) if mesh is not None else 1
    if cp > 1 and tokens.shape[1] % cp == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, P(None, "context", None)))

    if timesteps.ndim == 1:
        timesteps = jnp.broadcast_to(timesteps[:, None], (b, gt))
    temb, t_proj, text_ctx, img_ctx = _condition_embeddings(
        params, cfg, timesteps, text_emb, image_emb
    )

    # RoPE tables for this token grid (host-precomputed constants)
    if cfg.temporal_skip:
        cos, sin = temporal_skip_rope_tables(cfg.rope, gt, gh, gw)
    else:
        cos, sin = rope_3d_tables(cfg.rope, gt, gh, gw)

    block_fn = dit_block
    if cfg.remat == "full":
        block_fn = jax.checkpoint(dit_block, static_argnums=(7, 8, 9))
    elif cfg.remat == "matmul_only":
        # ~ reference SAC "mm_only": save matmul/attention outputs only
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        block_fn = jax.checkpoint(dit_block, policy=policy,
                                  static_argnums=(7, 8, 9))

    new_cache = None
    if cache_blocks is not None:
        if layer_mask is not None or (
                mesh is not None and mesh.shape.get("pipe", 1) > 1):
            raise ValueError("cache_blocks is incompatible with SLG layer "
                             "masks and pipeline parallelism")
        a, bb = cache_blocks
        if not (0 <= a <= bb <= cfg.num_layers):
            raise ValueError(f"cache_blocks {cache_blocks} out of range")
        if cache is None:
            cache = jnp.zeros_like(tokens)
        refresh = jnp.asarray(cache_refresh, bool)

        # ONE homogeneous scan over the full stack — identical memory
        # profile to the uncached path. (Slicing the stacked params into
        # [0,a)/[a,bb)/[bb,L) segments makes XLA materialize layout-
        # converted full-weight copies as while-loop temps inside the
        # solver scan: ~150 MB per projection per segment, which blows
        # HBM at serving depths.) Cached blocks are skipped under a
        # lax.cond; their summed delta accumulates in the carry on
        # refresh steps, and the saved delta is added once at block
        # ``a`` on reuse steps (the skipped blocks are identity, so the
        # insertion point within [a, bb) is immaterial).
        zero = jnp.zeros([], tokens.dtype)

        def body(carry, inp):
            tok, acc = carry
            bp, lyr = inp
            tok = tok + jnp.where((lyr == a) & ~refresh, cache, zero)
            out = jax.lax.cond(
                refresh | (lyr < a) | (lyr >= bb),
                lambda t: block_fn(bp, t, text_ctx, img_ctx, t_proj, cos,
                                   sin, hw, cfg, mesh),
                lambda t: t,
                tok)
            acc = acc + jnp.where((lyr >= a) & (lyr < bb), out - tok, zero)
            return (out, acc), None

        (tokens, delta), _ = jax.lax.scan(
            body, (tokens, jnp.zeros_like(tokens)),
            (params["blocks"], jnp.arange(cfg.num_layers)))
        new_cache = jnp.where(refresh, delta, cache)
    elif mesh is not None and mesh.shape.get("pipe", 1) > 1:
        # GPipe over the pipe axis: stacked blocks stage-sharded, batch
        # microbatched, ppermute handoffs (parallel/pipeline_parallel.py).
        # Composes with context parallelism: tokens are context-sharded
        # INSIDE stages and blocks run ring/Ulysses attention over the
        # ``context`` axis name (InnerAxes), with RoPE tables and per-frame
        # modulation sliced to the shard's global token range.
        from chronoedit_tpu.ops.fused_norms import (
            frames_map_locally, local_frame_slice)
        from chronoedit_tpu.parallel.mesh import InnerAxes
        from chronoedit_tpu.parallel.pipeline_parallel import gpipe_scan

        s = tokens.shape[1]
        cp = mesh.shape.get("context", 1)
        cp_inside = cp > 1 and frames_map_locally(s, hw, cp)
        inner = InnerAxes(context="context" if cp_inside else None,
                          context_size=cp if cp_inside else 1)

        stacked = (params["blocks"] if layer_mask is None
                   else (params["blocks"], layer_mask))

        def pp_block(lp, x_cur, ctx):
            bp, m = lp if layer_mask is not None else (lp, None)
            t_ctx, i_ctx, tp = ctx
            cos_l, sin_l, hw_l = cos, sin, hw
            if cp_inside:
                s_loc = x_cur.shape[1]
                idx = jax.lax.axis_index("context")
                cos_l = jax.lax.dynamic_slice_in_dim(cos, idx * s_loc, s_loc, 0)
                sin_l = jax.lax.dynamic_slice_in_dim(sin, idx * s_loc, s_loc, 0)
                (tp,), hw_l = local_frame_slice((tp,), hw, s_loc, "context")
            out = block_fn(bp, x_cur, t_ctx, i_ctx, tp, cos_l, sin_l,
                           hw_l, cfg, inner)
            if m is not None:
                out = jnp.where(m > 0.5, out, x_cur)
            return out

        tokens = gpipe_scan(pp_block, stacked, tokens,
                            (text_ctx, img_ctx, t_proj), mesh,
                            context_axis="context" if cp_inside else None)
    else:
        if layer_mask is None:
            def body(carry, bp):
                out = block_fn(bp, carry, text_ctx, img_ctx, t_proj, cos, sin,
                               hw, cfg, mesh)
                return out, None
        else:
            def body(carry, xs):
                bp, m = xs
                out = block_fn(bp, carry, text_ctx, img_ctx, t_proj, cos, sin,
                               hw, cfg, mesh)
                out = jnp.where(m > 0.5, out, carry)
                return out, None

        xs = params["blocks"] if layer_mask is None else (params["blocks"], layer_mask)
        tokens, _ = jax.lax.scan(body, tokens, xs)

    # output head (transformer_chronoedit.py:451-461)
    head = params["head"]
    table = head["scale_shift_table"].astype(jnp.float32)  # (2, dim)
    mods = table[None, None] + temb[:, :, None, :]  # (B, T, 2, dim)
    shift, scale = mods[:, :, 0], mods[:, :, 1]
    normed = layer_norm_modulate(tokens, scale, shift, hw, cfg.eps, mesh=mesh)
    out = L.linear(head["proj"], normed)
    out = _unpatchify(out, grid, cfg)
    if cache_blocks is not None:
        return out, new_cache
    return out
