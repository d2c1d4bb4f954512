"""SigLIP vision encoder + MLP video-content safety classifier (JAX).

The reference's video guardrail is a SigLIP so400m-patch14-384 image encoder
feeding a 3-layer MLP multi-class safety head
(video_content_safety_filter/vision_encoder.py + model.py; runner logic
video_content_safety_filter.py:50-130). Round 1 shipped only the callable
slot; this module supplies the actual models, TPU-native:

- :func:`siglip_encode` — SigLIP ViT (patchify conv, learned position
  embeddings, pre-LN blocks with tanh-GELU MLPs, post-LN, multihead
  attention-pooling head with a learned probe), matching HF
  ``SiglipVisionModel.pooler_output``; embeddings L2-normalized like
  ``SiglipModel.get_image_features``.
- :func:`classifier_logits` — Linear(→512)/BN/ReLU, Linear(→256)/BN/ReLU,
  Linear(→num_classes), BatchNorm in eval mode (model.py SafetyClassifier).
- converters from the HF SigLIP state dict and the reference's
  ``safety_filter.pt`` checkpoint.
- :func:`make_classify_fn` — plugs into the existing
  ``FrameSafetyClassifier`` slot: per-frame class prediction, video flagged
  when > ``unsafe_frames_pct`` of frames are non-Safe
  (CUTOFF_UNSAFE_FRAMES_PERCENT=10).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

CLASS_IDX_TO_NAME = {
    0: "Safe", 1: "Sexual_Content", 3: "Drugs", 4: "Child_Abuse",
    5: "Hate_and_Harassment", 6: "Self-Harm",
}
UNSAFE_FRAMES_PCT = 10.0

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SigLIPVisionConfig:
    """google/siglip-so400m-patch14-384 geometry by default."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _ln(p, x, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _linear(p, x):
    return x @ p["kernel"] + p["bias"]


def _mha(q, k, v, num_heads):
    b, sq, d = q.shape
    hd = d // num_heads

    def split(t):
        return t.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * hd ** -0.5, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, -1, d)


def siglip_encode(params: Params, cfg: SigLIPVisionConfig,
                  pixels: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Pixels (B, 3, H, W), SigLIP-preprocessed (see :func:`preprocess`) ->
    pooled (B, hidden) features; L2-normalized when ``normalize``."""
    p = cfg.patch_size
    b = pixels.shape[0]
    # patchify conv == unfold + matmul (valid padding, stride=patch)
    patches = pixels.reshape(b, 3, cfg.image_size // p, p,
                             cfg.image_size // p, p)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, cfg.num_patches, -1)
    x = patches @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    x = x + params["pos_embed"]

    for blk in params["blocks"]:
        h = _ln(blk["ln1"], x, cfg.eps)
        attn = _mha(_linear(blk["q"], h), _linear(blk["k"], h),
                    _linear(blk["v"], h), cfg.num_heads)
        x = x + _linear(blk["o"], attn)
        h = _ln(blk["ln2"], x, cfg.eps)
        x = x + _linear(blk["fc2"], _gelu_tanh(_linear(blk["fc1"], h)))

    x = _ln(params["post_ln"], x, cfg.eps)

    # attention-pooling head: learned probe attends over the tokens
    head = params["head"]
    probe = jnp.broadcast_to(head["probe"], (b, 1, cfg.hidden_size))
    q = _linear(head["q"], probe)
    k = _linear(head["k"], x)
    v = _linear(head["v"], x)
    pooled = _linear(head["o"], _mha(q, k, v, cfg.num_heads))
    h = _ln(head["ln"], pooled, cfg.eps)
    pooled = pooled + _linear(head["fc2"], _gelu_tanh(_linear(head["fc1"], h)))
    out = pooled[:, 0]
    if normalize:
        out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out


def preprocess(frames: np.ndarray, cfg: SigLIPVisionConfig) -> np.ndarray:
    """(T, H, W, 3) uint8 or [-1,1] float frames -> SigLIP pixel batch
    (T, 3, S, S): resize to the square input then (x/255 - 0.5) / 0.5."""
    from PIL import Image

    if frames.dtype != np.uint8:
        frames = ((np.clip(frames, -1, 1) + 1) * 127.5).astype(np.uint8)
    s = cfg.image_size
    out = np.empty((len(frames), s, s, 3), np.float32)
    for i, f in enumerate(frames):
        out[i] = np.asarray(
            Image.fromarray(f).resize((s, s), Image.BICUBIC), np.float32)
    out = (out / 255.0 - 0.5) / 0.5
    return out.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------- classifier

def classifier_logits(params: Params, emb: jnp.ndarray) -> jnp.ndarray:
    """SafetyClassifier (model.py): Linear/BN/ReLU x2 + Linear, BN in eval
    mode (running statistics)."""
    x = emb
    for layer in params["layers"]:
        x = _linear(layer, x)
        if "bn_mean" in layer:
            x = ((x - layer["bn_mean"]) * jax.lax.rsqrt(layer["bn_var"] + 1e-5)
                 * layer["bn_scale"] + layer["bn_bias"])
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------- converters

def convert_siglip_vision(sd: dict, cfg: SigLIPVisionConfig) -> Params:
    """HF ``SiglipVisionModel`` state dict -> param pytree. Accepts both
    bare (``embeddings.*``) and ``vision_model.``-prefixed keys."""
    sd = {k.removeprefix("vision_model."): np.asarray(v) for k, v in sd.items()}

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T.astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32)}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32)}

    # conv (out, 3, p, p) -> unfold layout (3*p*p, out) matching the
    # (c, ph, pw) patch flattening above
    conv = sd["embeddings.patch_embedding.weight"].astype(np.float32)
    kernel = conv.reshape(cfg.hidden_size, -1).T

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        blocks.append({
            "ln1": ln(f"{pre}.layer_norm1"),
            "q": lin(f"{pre}.self_attn.q_proj"),
            "k": lin(f"{pre}.self_attn.k_proj"),
            "v": lin(f"{pre}.self_attn.v_proj"),
            "o": lin(f"{pre}.self_attn.out_proj"),
            "ln2": ln(f"{pre}.layer_norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
        })

    # pooling head: torch nn.MultiheadAttention packs qkv into in_proj
    d = cfg.hidden_size
    in_w = sd["head.attention.in_proj_weight"].astype(np.float32)
    in_b = sd["head.attention.in_proj_bias"].astype(np.float32)
    head = {
        "probe": sd["head.probe"].astype(np.float32).reshape(1, 1, d),
        "q": {"kernel": in_w[:d].T, "bias": in_b[:d]},
        "k": {"kernel": in_w[d:2 * d].T, "bias": in_b[d:2 * d]},
        "v": {"kernel": in_w[2 * d:].T, "bias": in_b[2 * d:]},
        "o": lin("head.attention.out_proj"),
        "ln": ln("head.layernorm"),
        "fc1": lin("head.mlp.fc1"),
        "fc2": lin("head.mlp.fc2"),
    }

    return {
        "patch_embed": {"kernel": kernel,
                        "bias": sd["embeddings.patch_embedding.bias"].astype(np.float32)},
        "pos_embed": sd["embeddings.position_embedding.weight"].astype(np.float32)[None],
        "blocks": blocks,
        "post_ln": ln("post_layernorm"),
        "head": head,
    }


def convert_safety_classifier(sd: dict) -> Params:
    """``safety_filter.pt``'s ``network.layers.*`` Sequential (Linear, BN,
    ReLU, Linear, BN, ReLU, Linear) -> param pytree."""
    sd = {k.removeprefix("network."): np.asarray(v) for k, v in sd.items()}
    layers = []
    for lin_i, bn_i in ((0, 1), (3, 4)):
        layers.append({
            "kernel": sd[f"layers.{lin_i}.weight"].T.astype(np.float32),
            "bias": sd[f"layers.{lin_i}.bias"].astype(np.float32),
            "bn_scale": sd[f"layers.{bn_i}.weight"].astype(np.float32),
            "bn_bias": sd[f"layers.{bn_i}.bias"].astype(np.float32),
            "bn_mean": sd[f"layers.{bn_i}.running_mean"].astype(np.float32),
            "bn_var": sd[f"layers.{bn_i}.running_var"].astype(np.float32),
        })
    layers.append({
        "kernel": sd["layers.6.weight"].T.astype(np.float32),
        "bias": sd["layers.6.bias"].astype(np.float32),
    })
    return {"layers": layers}


# ---------------------------------------------------------------- slot glue

def make_classify_fn(siglip_params: Params, clf_params: Params,
                     cfg: SigLIPVisionConfig | None = None,
                     unsafe_frames_pct: float = UNSAFE_FRAMES_PCT,
                     sample_every: int = 1):
    """Build the ``FrameSafetyClassifier`` slot callable.

    Returns ``classify(frames) -> bool`` (True = SAFE, the slot's polarity:
    it blocks on False) over (T, H, W, 3) frames: every
    ``sample_every``-th frame is encoded and classified; the video is
    unsafe when more than ``unsafe_frames_pct`` percent of sampled frames
    predict a non-Safe class (video_content_safety_filter.py:96-130).
    """
    cfg = cfg or SigLIPVisionConfig()

    @jax.jit
    def _predict(pixels):
        emb = siglip_encode(siglip_params, cfg, pixels)
        return jnp.argmax(classifier_logits(clf_params, emb), axis=-1)

    # fixed compile batch: a varying frame count would retrace/recompile the
    # 27-layer tower per distinct video length (round-2 review) — instead the
    # sampled frames run through one compiled shape in padded chunks
    compile_batch = 8

    def classify(frames: np.ndarray) -> bool:
        sampled = np.asarray(frames)[::max(sample_every, 1)]
        pixels = preprocess(sampled, cfg)
        n = len(pixels)
        classes = np.empty((n,), np.int64)
        for start in range(0, n, compile_batch):
            chunk = pixels[start:start + compile_batch]
            pad = compile_batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            classes[start:start + compile_batch - pad] = np.asarray(
                _predict(chunk))[:compile_batch - pad]
        unsafe = (classes != 0).mean() * 100.0
        return bool(unsafe <= unsafe_frames_pct)

    return classify
