"""XLM-Roberta text tower (the CLIP text encoder of Wan2.1's XLM-R CLIP).

Re-derivation of ``chronoedit/_src/modules/xlm_roberta.py`` (post-norm
BERT-style encoder with padding-aware position ids) and the projection
head variant ``XLMRobertaWithHead`` (``clip.py:285-307``): masked mean-pool
then a bias-free 2-layer GELU MLP to the CLIP joint dim. Unused at
inference by ChronoEdit itself (only the CLIP *vision* penultimate features
feed the DiT), but the reference ships it as part of the CLIP stack, so the
text side is available here for completeness (text-image scoring, retrieval
filtering of training data).

Layout: params as a pytree; a single padding mask drives both the additive
attention bias and the pooling, exactly as the reference (pad_id=1,
position ids = pad_id + cumsum(mask)*mask).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    """xlm_roberta_large defaults (xlm_roberta.py:141-160)."""

    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    out_dim: int | None = None  # set -> WithHead variant (CLIP joint dim)


def _ln(p, x, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(p, x):
    out = x @ p["kernel"]
    return out + p["bias"] if "bias" in p else out


def _attention(p, x, bias, num_heads):
    b, s, d = x.shape
    hd = d // num_heads

    def split(t):
        return t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = (split(_linear(p[n], x)) for n in ("q", "k", "v"))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd ** -0.5 + bias
    out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    return _linear(p["o"], out.transpose(0, 2, 1, 3).reshape(b, s, d))


def xlm_roberta_encode(params: Params, cfg: XLMRobertaConfig,
                       ids: jnp.ndarray) -> jnp.ndarray:
    """Token ids (B, L) int32 -> hidden states (B, L, dim); with
    ``cfg.out_dim`` set, masked-mean-pooled head features (B, out_dim)."""
    b, s = ids.shape
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    pos = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (params["token_embed"][ids]
         + params["type_embed"][jnp.zeros_like(ids)]
         + params["pos_embed"][pos])
    if cfg.post_norm:
        x = _ln(params["norm"], x, cfg.eps)

    bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                     jnp.finfo(jnp.float32).min)
    for blk in params["blocks"]:
        if cfg.post_norm:
            x = _ln(blk["ln1"], x + _attention(blk["attn"], x, bias,
                                               cfg.num_heads), cfg.eps)
            h = _linear(blk["fc2"], jax.nn.gelu(_linear(blk["fc1"], x),
                                                approximate=False))
            x = _ln(blk["ln2"], x + h, cfg.eps)
        else:
            x = x + _attention(blk["attn"], _ln(blk["ln1"], x, cfg.eps),
                               bias, cfg.num_heads)
            h = _ln(blk["ln2"], x, cfg.eps)
            x = x + _linear(blk["fc2"],
                            jax.nn.gelu(_linear(blk["fc1"], h),
                                        approximate=False))
    if not cfg.post_norm:
        x = _ln(params["norm"], x, cfg.eps)

    if cfg.out_dim is None:
        return x
    # masked mean pool + bias-free MLP head (clip.py:296-307)
    m = mask[..., None].astype(x.dtype)
    pooled = (x * m).sum(axis=1) / m.sum(axis=1)
    h = jax.nn.gelu(pooled @ params["head"]["fc1"], approximate=False)
    return h @ params["head"]["fc2"]


def convert_xlm_roberta(sd: dict, num_layers: int) -> Params:
    """Reference ``XLMRoberta``/``XLMRobertaWithHead`` state dict -> pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def lin(prefix, bias=True):
        p = {"kernel": sd[f"{prefix}.weight"].T.astype(np.float32)}
        if bias:
            p["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
        return p

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32)}

    blocks = []
    for i in range(num_layers):
        pre = f"blocks.{i}"
        blocks.append({
            "attn": {n: lin(f"{pre}.attn.{n}") for n in ("q", "k", "v", "o")},
            "ln1": ln(f"{pre}.norm1"),
            "fc1": lin(f"{pre}.ffn.0"),
            "fc2": lin(f"{pre}.ffn.2"),
            "ln2": ln(f"{pre}.norm2"),
        })
    params = {
        "token_embed": sd["token_embedding.weight"].astype(np.float32),
        "type_embed": sd["type_embedding.weight"].astype(np.float32),
        "pos_embed": sd["pos_embedding.weight"].astype(np.float32),
        "norm": ln("norm"),
        "blocks": blocks,
    }
    if "head.0.weight" in sd:
        params["head"] = {
            "fc1": sd["head.0.weight"].T.astype(np.float32),
            "fc2": sd["head.2.weight"].T.astype(np.float32),
        }
    return params
