"""CLIP ViT-H/14 vision tower (the I2V image conditioner), JAX.

Parity with the reference XLM-Roberta-CLIP visual branch
(``chronoedit/_src/modules/clip.py``): image 224, patch 14 -> 256 patches +
CLS = 257 tokens, width 1280, 16 heads, 32 pre-LN blocks (exact GELU MLP,
fused qkv), pre-norm after positional embedding, and the I2V path taking the
**penultimate** features (first 31 blocks, no final norm — ``use_31_block``,
clip.py:261-281, 505-541).

Preprocessing (clip.py:529-541): bicubic resize of [-1,1] frames to 224,
rescale to [0,1], normalize by the CLIP mean/std.

Only the vision tower is implemented as a model; the XLM-Roberta text tower
exists upstream solely for the (unused-at-inference) contrastive head.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.ops import layers as L
from chronoedit_tpu.ops.attention import dot_product_attention

Params = dict[str, Any]

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_tokens(self) -> int:
        return self.num_patches + 1  # + CLS


def init_clip_vision_params(key: jax.Array, cfg: CLIPVisionConfig) -> Params:
    pd = cfg.param_dtype
    d = cfg.dim
    gain = 1.0 / np.sqrt(d)
    keys = iter(jax.random.split(key, 8))

    def block_params(k) -> Params:
        ks = iter(jax.random.split(k, 4))
        return {
            "norm1": L.layer_norm_init(d, dtype=pd),
            "attn": {
                "qkv": L.linear_init(next(ks), d, 3 * d, dtype=pd),
                "proj": L.linear_init(next(ks), d, d, dtype=pd),
            },
            "norm2": L.layer_norm_init(d, dtype=pd),
            "mlp": {
                "fc1": L.linear_init(next(ks), d, d * cfg.mlp_ratio, dtype=pd),
                "fc2": L.linear_init(next(ks), d * cfg.mlp_ratio, d, dtype=pd),
            },
        }

    return {
        # Conv2d(3, d, k=p, s=p, bias=False) == patch reshape + matmul
        "patch_embed": {"kernel": jax.random.normal(
            next(keys), (3 * cfg.patch_size ** 2, d), pd) * 0.02},
        "cls_embedding": jax.random.normal(next(keys), (1, 1, d), pd) * gain,
        "pos_embedding": jax.random.normal(
            next(keys), (1, cfg.num_tokens, d), pd) * gain,
        "pre_norm": L.layer_norm_init(d, dtype=pd),
        "blocks": jax.vmap(block_params)(
            jax.random.split(next(keys), cfg.num_layers)),
        "post_norm": L.layer_norm_init(d, dtype=pd),
    }


def _vit_block(p: Params, x: jnp.ndarray, cfg: CLIPVisionConfig) -> jnp.ndarray:
    h = L.layer_norm(p["norm1"], x, cfg.norm_eps, out_dtype=x.dtype)
    qkv = L.linear(p["attn"]["qkv"], h)
    b, s, _ = x.shape
    q, k, v = (t.reshape(b, s, cfg.num_heads, -1)
               for t in jnp.split(qkv, 3, axis=-1))
    attn = dot_product_attention(q, k, v).reshape(b, s, cfg.dim)
    x = x + L.linear(p["attn"]["proj"], attn)
    h = L.layer_norm(p["norm2"], x, cfg.norm_eps, out_dtype=x.dtype)
    h = L.linear(p["mlp"]["fc2"], jax.nn.gelu(L.linear(p["mlp"]["fc1"], h),
                                              approximate=False))
    return x + h


def clip_vision_forward(params: Params, cfg: CLIPVisionConfig,
                        pixels: jnp.ndarray, penultimate: bool = True) -> jnp.ndarray:
    """Normalized pixels (B, 3, 224, 224) -> (B, 257, 1280) features.

    ``penultimate=True`` stops before the last block with no final norm (the
    I2V conditioning path)."""
    b, c, hh, ww = pixels.shape
    p = cfg.patch_size
    x = pixels.astype(cfg.dtype)
    # (B, 3, H, W) -> patches (B, N, 3*p*p) with (c, ph, pw) feature order
    # matching Conv2d weight layout
    x = x.reshape(b, c, hh // p, p, ww // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, cfg.num_patches, c * p * p)
    x = L.linear(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype), (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = L.layer_norm(params["pre_norm"], x, cfg.norm_eps, out_dtype=x.dtype)

    n_blocks = cfg.num_layers - 1 if penultimate else cfg.num_layers
    blocks = jax.tree_util.tree_map(lambda a: a[:n_blocks], params["blocks"])

    def body(carry, bp):
        return _vit_block(bp, carry, cfg), None

    x, _ = jax.lax.scan(body, x, blocks)
    if not penultimate:
        x = L.layer_norm(params["post_norm"], x, cfg.norm_eps, out_dtype=x.dtype)
    return x


def preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[-1, 1] images (B, 3, H, W) -> CLIP-normalized (B, 3, 224, 224)
    (bicubic, half-pixel centers == torch align_corners=False)."""
    b, c, _, _ = images.shape
    x = jax.image.resize(images.astype(jnp.float32),
                         (b, c, image_size, image_size), method="bicubic")
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
    return (x - mean) / std


class CLIPImageEncoder:
    """[-1,1] image -> 257-token penultimate features (the
    ``frame_cond_crossattn_emb_B_L_D`` producer, clip.py:543-594)."""

    def __init__(self, params: Params, cfg: CLIPVisionConfig | None = None):
        self.params = params
        self.cfg = cfg or CLIPVisionConfig()
        self._fwd = jax.jit(lambda p, x: clip_vision_forward(p, self.cfg, x))

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(self.params, preprocess(images, self.cfg.image_size))


def convert_clip_vision_checkpoint(sd: dict[str, np.ndarray],
                                   num_layers: int = 32) -> Params:
    """Reference open-clip xlm-roberta ViT-H .pth -> vision pytree (text
    tower keys are ignored)."""
    sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
    pw = sd.pop("patch_embedding.weight")  # (d, 3, p, p)
    params: Params = {
        "patch_embed": {"kernel": np.ascontiguousarray(
            pw.reshape(pw.shape[0], -1).T)},
        "cls_embedding": sd.pop("cls_embedding"),
        "pos_embedding": sd.pop("pos_embedding"),
        "pre_norm": {"scale": sd.pop("pre_norm.weight"),
                     "bias": sd.pop("pre_norm.bias")},
        "post_norm": {"scale": sd.pop("post_norm.weight"),
                      "bias": sd.pop("post_norm.bias")},
    }
    blocks = []
    for i in range(num_layers):
        b = f"transformer.{i}"
        blocks.append({
            "norm1": {"scale": sd.pop(f"{b}.norm1.weight"),
                      "bias": sd.pop(f"{b}.norm1.bias")},
            "attn": {
                "qkv": {"kernel": np.ascontiguousarray(sd.pop(f"{b}.attn.to_qkv.weight").T),
                        "bias": sd.pop(f"{b}.attn.to_qkv.bias")},
                "proj": {"kernel": np.ascontiguousarray(sd.pop(f"{b}.attn.proj.weight").T),
                         "bias": sd.pop(f"{b}.attn.proj.bias")},
            },
            "norm2": {"scale": sd.pop(f"{b}.norm2.weight"),
                      "bias": sd.pop(f"{b}.norm2.bias")},
            "mlp": {
                "fc1": {"kernel": np.ascontiguousarray(sd.pop(f"{b}.mlp.0.weight").T),
                        "bias": sd.pop(f"{b}.mlp.0.bias")},
                "fc2": {"kernel": np.ascontiguousarray(sd.pop(f"{b}.mlp.2.weight").T),
                        "bias": sd.pop(f"{b}.mlp.2.bias")},
            },
        })
    params["blocks"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    return params
