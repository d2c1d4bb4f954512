"""DiT backbone tests: shape/invariants plus a full float64 numpy oracle.

The oracle re-implements the block equations (AdaLN modulation, qk rms-norm,
interleaved-complex RoPE, dual-branch cross-attention, gelu-tanh FFN, output
head) independently in numpy — catching any wiring/ordering bug in the
scan-based JAX implementation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.core.rope import Rope3DSpec
from chronoedit_tpu.models import dit as dit_lib

TINY = dit_lib.DiTConfig(
    patch_size=(1, 2, 2),
    num_heads=2,
    head_dim=12,
    in_channels=9,
    out_channels=4,
    text_dim=16,
    freq_dim=8,
    ffn_dim=32,
    num_layers=2,
    image_dim=10,
    image_tokens=5,
    rope=Rope3DSpec(head_dim=12, temporal_skip_len=8),
    dtype=jnp.float32,
)


def _randomize(params, key):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [jax.random.normal(k, l.shape, l.dtype) * 0.2 for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def _inputs(cfg, b=2, t=2, h=4, w=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, cfg.in_channels, t, h, w)).astype(np.float32)
    text = rng.standard_normal((b, 7, cfg.text_dim)).astype(np.float32)
    img = (rng.standard_normal((b, cfg.image_tokens, cfg.image_dim)).astype(np.float32)
           if cfg.image_dim is not None else None)
    ts = rng.uniform(0, 1000, (b,)).astype(np.float32)
    return x, ts, text, img


def test_forward_shape_and_finite():
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY)
    x, ts, text, img = _inputs(TINY)
    out = dit_lib.dit_forward(params, TINY, jnp.asarray(x), jnp.asarray(ts),
                              jnp.asarray(text), jnp.asarray(img))
    assert out.shape == (2, 4, 2, 4, 4)
    assert bool(jnp.isfinite(out).all())


def test_ffn_token_chunking_exact():
    """round 5 (VERDICT r4 #3): the token-chunked ffn (capacity diet for the
    28.8k reasoning shape) must match the unchunked forward exactly."""
    import dataclasses

    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text),
            jnp.asarray(img))
    ref = dit_lib.dit_forward(params, TINY, *args)
    # S = 2*2*2 = 8 tokens -> 2 and 4 chunks divide; 3 falls back unchunked
    for chunks in (2, 4, 3):
        cfg = dataclasses.replace(TINY, ffn_chunks=chunks)
        out = dit_lib.dit_forward(params, cfg, *args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


def test_scalar_vs_per_frame_timesteps():
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY)
    out1 = dit_lib.dit_forward(params, TINY, jnp.asarray(x), jnp.asarray(ts),
                               jnp.asarray(text), jnp.asarray(img))
    ts_bt = jnp.broadcast_to(jnp.asarray(ts)[:, None], (2, 2))
    out2 = dit_lib.dit_forward(params, TINY, jnp.asarray(x), ts_bt,
                               jnp.asarray(text), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_layer_mask_skips_blocks():
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))

    # mask [1, 0]: second block skipped == model with only block 0
    masked = dit_lib.dit_forward(params, TINY, *args,
                                 layer_mask=jnp.array([1.0, 0.0]))
    cfg1 = dataclasses.replace(TINY, num_layers=1)
    params1 = dict(params)
    params1["blocks"] = jax.tree_util.tree_map(lambda a: a[:1], params["blocks"])
    only_first = dit_lib.dit_forward(params1, cfg1, *args)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(only_first), atol=1e-6)


def test_no_image_branch_t2v():
    cfg = dataclasses.replace(TINY, image_dim=None)
    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
    x, ts, text, _ = _inputs(cfg)
    out = dit_lib.dit_forward(params, cfg, jnp.asarray(x), jnp.asarray(ts),
                              jnp.asarray(text), None)
    assert out.shape == (2, 4, 2, 4, 4)


# ================================================================= oracle

def _np(p):
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), p)


def _lin(p, x):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


def _ln(x, eps=1e-6, scale=None, bias=None):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + eps)
    if scale is not None:
        y = y * scale + bias
    return y


def _rms(p, x, eps=1e-6):
    var = (x ** 2).mean(-1, keepdims=True)
    return x / np.sqrt(var + eps) * p["scale"]


def _softmax_attn(q, k, v, heads):
    """(B,S,D_model) inputs already projected; split into heads, sdpa."""
    b, s, dm = q.shape
    d = dm // heads
    q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    o = w @ v
    return o.transpose(0, 2, 1, 3).reshape(b, s, dm)


def _apply_rope_np(x, cos, sin, heads):
    b, s, dm = x.shape
    d = dm // heads
    xh = x.reshape(b, s, heads, d)
    xc = xh[..., 0::2] + 1j * xh[..., 1::2]
    f = cos + 1j * sin  # (s, d//2)
    out = xc * f[None, :, None, :]
    res = np.empty_like(xh)
    res[..., 0::2] = out.real
    res[..., 1::2] = out.imag
    return res.reshape(b, s, dm)


def _oracle_forward(params, cfg, x, ts, text, img, cos, sin):
    p = _np(params)
    b, c, t, h, w = x.shape
    pt, ph, pw = cfg.patch_size
    gt, gh, gw = t // pt, h // ph, w // pw
    hw = gh * gw

    xr = x.reshape(b, c, gt, pt, gh, ph, gw, pw).transpose(0, 2, 4, 6, 1, 3, 5, 7)
    tokens = _lin(p["patch_embed"], xr.reshape(b, gt * gh * gw, -1))

    # time embeddings (per frame, shared scalar broadcast)
    half = cfg.freq_dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = ts[:, None] * freqs
    sinu = np.concatenate([np.cos(args), np.sin(args)], -1)  # flip_sin_to_cos
    temb = _lin(p["time_embed"]["fc2"],
                _silu(_lin(p["time_embed"]["fc1"], sinu)))
    t_proj = _lin(p["time_proj"], _silu(temb)).reshape(b, 6, cfg.dim)

    text_ctx = _lin(p["text_embed"]["fc2"], _gelu_tanh(_lin(p["text_embed"]["fc1"], text)))
    ie = p["img_embed"]
    himg = _ln(img, 1e-5, ie["norm1"]["scale"], ie["norm1"]["bias"])
    himg = _lin(ie["fc2"], _gelu_exact(_lin(ie["fc1"], himg)))
    img_ctx = _ln(himg, 1e-5, ie["norm2"]["scale"], ie["norm2"]["bias"])

    for li in range(cfg.num_layers):
        bp = jax.tree_util.tree_map(lambda a: a[li], p["blocks"])
        mods = bp["scale_shift_table"][None] + t_proj  # (B, 6, dim)
        sh, sc, g, csh, csc, cg = (mods[:, i][:, None, :] for i in range(6))

        nx = _ln(tokens) * (1 + sc) + sh
        sa = bp["self_attn"]
        q = _apply_rope_np(_rms(sa["q_norm"], _lin(sa["q"], nx)), cos, sin, cfg.num_heads)
        k = _apply_rope_np(_rms(sa["k_norm"], _lin(sa["k"], nx)), cos, sin, cfg.num_heads)
        v = _lin(sa["v"], nx)
        attn = _lin(sa["o"], _softmax_attn(q, k, v, cfg.num_heads))
        tokens = tokens + attn * g

        ca = bp["cross_attn"]
        nx = _ln(tokens, 1e-6, bp["norm2"]["scale"], bp["norm2"]["bias"])
        q = _rms(ca["q_norm"], _lin(ca["q"], nx))
        out = _softmax_attn(q, _rms(ca["k_norm"], _lin(ca["k"], text_ctx)),
                            _lin(ca["v"], text_ctx), cfg.num_heads)
        out = out + _softmax_attn(q, _rms(ca["k_img_norm"], _lin(ca["k_img"], img_ctx)),
                                  _lin(ca["v_img"], img_ctx), cfg.num_heads)
        tokens = tokens + _lin(ca["o"], out)

        nx = _ln(tokens) * (1 + csc) + csh
        ff = _lin(bp["ffn"]["fc2"], _gelu_tanh(_lin(bp["ffn"]["fc1"], nx)))
        tokens = tokens + ff * cg

    head = p["head"]
    mods = head["scale_shift_table"][None] + temb[:, None, :]
    sh, sc = mods[:, 0][:, None], mods[:, 1][:, None]
    out = _lin(head["proj"], _ln(tokens) * (1 + sc) + sh)

    out = out.reshape(b, gt, gh, gw, pt, ph, pw, cfg.out_channels)
    out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return out.reshape(b, cfg.out_channels, gt * pt, gh * ph, gw * pw)


def _silu(x):
    return x / (1 + np.exp(-x))


def _gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))


def _gelu_exact(x):
    from scipy.special import erf  # type: ignore

    return 0.5 * x * (1 + erf(x / np.sqrt(2)))


def test_forward_matches_numpy_oracle():
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(3))
    x, ts, text, img = _inputs(TINY, b=1, t=2, h=4, w=4, seed=5)

    got = dit_lib.dit_forward(params, TINY, jnp.asarray(x), jnp.asarray(ts),
                              jnp.asarray(text), jnp.asarray(img))

    from chronoedit_tpu.core.rope import temporal_skip_rope_tables

    cos, sin = temporal_skip_rope_tables(TINY.rope, 2, 2, 2)
    expected = _oracle_forward(params, TINY, x.astype(np.float64), ts.astype(np.float64),
                               text.astype(np.float64), img.astype(np.float64),
                               np.asarray(cos, np.float64), np.asarray(sin, np.float64))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)
