"""UMT5-xxl text encoder (from scratch, JAX).

Parity with the reference encoder (``chronoedit/_src/modules/umt5.py``):
umt5-xxl = vocab 256384, dim 4096, dim_attn 4096, ffn 10240 (gated
gelu-tanh), 64 heads, 24 layers, 32 relative-position buckets with a
**per-layer** relative embedding (``shared_pos=False``, the UMT5 difference
from classic T5), T5 RMS layer norms, *unscaled* attention logits, fp32
softmax.  The public call returns 512-token embeddings zero-padded past each
prompt's length (umt5.py:541-592).

TPU notes: the relative-position bucket matrix depends only on the (static)
sequence length — computed host-side in numpy and embedded as a constant;
the per-layer bias lookups stack into one (L, buckets, heads) table consumed
inside the ``lax.scan`` over layers.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.ops import layers as L

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab_size: int = 256_384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10_240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    rel_max_dist: int = 128
    eps: float = 1e-6
    text_len: int = 512
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads


def umt5_xxl_config(**kw) -> UMT5Config:
    return UMT5Config(**kw)


# ------------------------------------------------------------- rel buckets

def relative_position_buckets(length: int, num_buckets: int = 32,
                              max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket matrix (length, length) int32 — host-side.

    Matches umt5.py:_relative_position_bucket (bidirectional path).
    """
    rel_pos = np.arange(length)[None, :] - np.arange(length)[:, None]
    nb = num_buckets // 2
    buckets = (rel_pos > 0).astype(np.int64) * nb
    rel = np.abs(rel_pos)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel, 1) / max_exact) / math.log(max_dist / max_exact)
            * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets.astype(np.int32)


# ------------------------------------------------------------- init

def init_umt5_params(key: jax.Array, cfg: UMT5Config) -> Params:
    pd = cfg.param_dtype
    keys = iter(jax.random.split(key, 8))

    def lin(k, din, dout, std):
        return {"kernel": jax.random.normal(k, (din, dout), pd) * std}

    def block_params(k) -> Params:
        ks = iter(jax.random.split(k, 8))
        d, da, df, h = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_heads
        return {
            "norm1": {"scale": jnp.ones((d,), pd)},
            "attn": {
                "q": lin(next(ks), d, da, (d * da) ** -0.5),
                "k": lin(next(ks), d, da, d ** -0.5),
                "v": lin(next(ks), d, da, d ** -0.5),
                "o": lin(next(ks), da, d, (h * cfg.head_dim) ** -0.5),
            },
            "norm2": {"scale": jnp.ones((d,), pd)},
            "ffn": {
                "gate": lin(next(ks), d, df, d ** -0.5),
                "fc1": lin(next(ks), d, df, d ** -0.5),
                "fc2": lin(next(ks), df, d, df ** -0.5),
            },
            # per-layer relative embedding (buckets, heads)
            "rel_emb": jax.random.normal(
                next(ks), (cfg.num_buckets, cfg.num_heads), pd
            ) * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5,
        }

    return {
        "token_embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.dim), pd),
        "blocks": jax.vmap(block_params)(jax.random.split(next(keys), cfg.num_layers)),
        "norm": {"scale": jnp.ones((cfg.dim,), pd)},
    }


# ------------------------------------------------------------- forward

def _t5_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5 RMS norm: fp32 statistics, scaled by weight (umt5.py:143-155)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def _t5_attention(p: Params, x: jnp.ndarray, bias: jnp.ndarray,
                  cfg: UMT5Config) -> jnp.ndarray:
    """Unscaled attention with additive bias, fp32 softmax."""
    b, s, _ = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    q = L.linear(p["q"], x).reshape(b, s, h, hd)
    k = L.linear(p["k"], x).reshape(b, s, h, hd)
    v = L.linear(p["v"], x).reshape(b, s, h, hd)
    logits = jnp.einsum("bihc,bjhc->bhij", q, k,
                        preferred_element_type=jnp.float32) + bias
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhij,bjhc->bihc", w, v).reshape(b, s, h * hd)
    return L.linear(p["o"], out)


def _t5_ffn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    gated = L.gelu_tanh(L.linear(p["gate"], x)) * L.linear(p["fc1"], x)
    return L.linear(p["fc2"], gated)


def umt5_encode(params: Params, cfg: UMT5Config, ids: jnp.ndarray,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Encode token ids (B, S) -> embeddings (B, S, dim) in cfg.dtype.

    ``mask`` (B, S) of 1/0; masked key positions get -inf bias (the
    reference masks keys only — queries at pad positions still produce
    (later-zeroed) outputs)."""
    b, s = ids.shape
    x = jnp.take(params["token_embedding"], ids, axis=0).astype(cfg.dtype)

    buckets = jnp.asarray(relative_position_buckets(
        s, cfg.num_buckets, cfg.rel_max_dist))  # (S, S) int32
    if mask is not None:
        key_mask = (mask == 0)[:, None, None, :]  # (B,1,1,S)
        mask_bias = jnp.where(key_mask, jnp.finfo(jnp.float32).min, 0.0)
    else:
        mask_bias = jnp.zeros((b, 1, 1, s), jnp.float32)

    def body(carry, bp):
        pos_bias = jnp.take(bp["rel_emb"], buckets, axis=0)  # (S, S, H)
        bias = pos_bias.transpose(2, 0, 1)[None].astype(jnp.float32) + mask_bias
        h = carry
        h = h + _t5_attention(bp["attn"], _t5_norm(bp["norm1"], h, cfg.eps), bias, cfg)
        h = h + _t5_ffn(bp["ffn"], _t5_norm(bp["norm2"], h, cfg.eps))
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _t5_norm(params["norm"], x, cfg.eps)


class UMT5TextEncoder:
    """Prompt -> (B, text_len, 4096) embeddings, zero-padded past each
    prompt's length (umt5.py:573-588).  Tokenization is host-side via the HF
    "google/umt5-xxl" tokenizer when available; pre-tokenized ids are always
    accepted (zero-egress environments)."""

    def __init__(self, params: Params, cfg: UMT5Config | None = None,
                 tokenizer=None, tokenizer_path: str = "google/umt5-xxl"):
        self.params = params
        self.cfg = cfg or UMT5Config()
        self._tokenizer = tokenizer
        self._tokenizer_path = tokenizer_path
        self._encode = jax.jit(
            lambda p, ids, mask: umt5_encode(p, self.cfg, ids, mask))

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(self._tokenizer_path)
        return self._tokenizer

    def encode_ids(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        ctx = self._encode(self.params, ids, mask)
        # zero out positions past each sequence length
        return ctx * mask[:, :, None].astype(ctx.dtype)

    def __call__(self, texts: list[str]) -> jnp.ndarray:
        enc = self.tokenizer(
            texts, padding="max_length", truncation=True,
            max_length=self.cfg.text_len, return_tensors="np",
            add_special_tokens=True,
        )
        ids = jnp.asarray(enc["input_ids"], jnp.int32)
        mask = jnp.asarray(enc["attention_mask"], jnp.int32)
        return self.encode_ids(ids, mask)


# ------------------------------------------------------------- weights

def convert_umt5_checkpoint(sd: dict[str, np.ndarray],
                            num_layers: int = 24) -> Params:
    """Reference ``models_t5_umt5-xxl-enc-bf16.pth`` state dict -> pytree."""
    sd = dict(sd)
    params: Params = {
        "token_embedding": sd.pop("token_embedding.weight"),
        "norm": {"scale": sd.pop("norm.weight")},
    }
    blocks = []
    for i in range(num_layers):
        b = f"blocks.{i}"
        blocks.append({
            "norm1": {"scale": sd.pop(f"{b}.norm1.weight")},
            "attn": {k: {"kernel": np.ascontiguousarray(sd.pop(f"{b}.attn.{k}.weight").T)}
                     for k in ("q", "k", "v", "o")},
            "norm2": {"scale": sd.pop(f"{b}.norm2.weight")},
            "ffn": {
                "gate": {"kernel": np.ascontiguousarray(
                    sd.pop(f"{b}.ffn.gate.0.weight").T)},
                "fc1": {"kernel": np.ascontiguousarray(sd.pop(f"{b}.ffn.fc1.weight").T)},
                "fc2": {"kernel": np.ascontiguousarray(sd.pop(f"{b}.ffn.fc2.weight").T)},
            },
            "rel_emb": sd.pop(f"{b}.pos_embedding.embedding.weight"),
        })
    params["blocks"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    return params
