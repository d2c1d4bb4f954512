#!/usr/bin/env python
"""On-device fuzz: flash_attention fwd+bwd vs dense reference across edge
shapes (odd lengths, kv=1, D=256, production 720p bf16). Run on TPU."""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from chronoedit_tpu.ops.flash_attention import flash_attention

rng = np.random.default_rng(0)
cases = [
    (1, 128, 1, 128, 128),   # minimal
    (2, 257, 3, 128, 769),   # odd lengths (CLIP/text shapes)
    (1, 300, 2, 128, 1),     # kv=1
    (3, 1000, 4, 128, 333),  # sq > block, partial blocks everywhere
    (1, 7200, 2, 128, 7200), # edit seq (bf16: the production dtype)
    (2, 129, 2, 256, 130),   # D=256
    (1, 28800, 1, 128, 28800), # reasoning seq: KV too big for VMEM -> streamed
]
for (b, sq, h, d, kv) in cases:
    dt = jnp.bfloat16 if sq * kv > 2_000_000 else jnp.float32
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dt)
    k = jnp.asarray(rng.standard_normal((b, kv, h, d)), dt)
    v = jnp.asarray(rng.standard_normal((b, kv, h, d)), dt)
    scale = d ** -0.5
    got = flash_attention(q, k, v, scale=scale)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s.astype(jnp.float32), -1).astype(dt), v)
    err = float(jnp.abs(got - ref).max())
    print(f"b{b} sq{sq} h{h} d{d} kv{kv}: max diff {err:.2e}", flush=True)
    assert err < (6e-3 if dt == jnp.float32 else 4e-2), (b, sq, h, d, kv, err)
    # grads too, on a smaller case
    if sq <= 1000:
        g1 = jax.grad(lambda a, b_, c: jnp.sum(flash_attention(a, b_, c, scale=scale) ** 2), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda a, b_, c: jnp.sum((jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", a, b_) * scale, -1), c)) ** 2), argnums=(0, 1, 2))(q, k, v)
        gerr = max(float(jnp.abs(x - y).max()) for x, y in zip(g1, g2))
        gscale = max(float(jnp.abs(y).max()) for y in g2)
        print(f"   grad max diff {gerr:.2e} (scale {gscale:.1e})", flush=True)
        assert gerr < 2e-2 * max(gscale, 1), (b, sq, kv, gerr, gscale)
print("fuzz pass ✔")
