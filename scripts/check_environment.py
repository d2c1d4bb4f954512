#!/usr/bin/env python
"""Environment smoke checks (reference: scripts/check_environment.py —
import + attention-backend checks, TPU-flavored)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(name, fn):
    try:
        msg = fn()
        print(f"[ok]   {name}" + (f": {msg}" if msg else ""))
        return True
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {e}")
        return False


def main():
    ok = True

    def jax_devices():
        import jax

        devs = jax.devices()
        return f"{len(devs)}x {devs[0].platform} ({devs[0].device_kind})"

    ok &= check("jax + devices", jax_devices)
    ok &= check("flax/optax/orbax", lambda: __import__("flax") and __import__("optax")
                and __import__("orbax.checkpoint") and "")
    ok &= check("chronoedit_tpu import", lambda: __import__("chronoedit_tpu").__version__)

    def tiny_forward():
        import jax
        import jax.numpy as jnp

        from chronoedit_tpu.configs import chronoedit_tiny
        from chronoedit_tpu.models import dit as dit_lib

        cfg = chronoedit_tiny().dit
        params = dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg)
        out = dit_lib.dit_forward(
            params, cfg,
            jnp.zeros((1, cfg.in_channels, 2, 4, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 4, cfg.text_dim)),
            jnp.zeros((1, cfg.image_tokens, cfg.image_dim)))
        return f"DiT forward {tuple(out.shape)}"

    ok &= check("tiny DiT forward (jit)", tiny_forward)

    def pallas_kernel():
        import jax

        if jax.devices()[0].platform != "tpu":
            return "skipped (not on TPU)"
        import jax.numpy as jnp

        from chronoedit_tpu.ops.flash_attention import flash_attention

        q = jnp.ones((1, 256, 2, 128), jnp.bfloat16)
        out = flash_attention(q, q, q, scale=0.088)
        return f"flash_attention {tuple(out.shape)}"

    ok &= check("pallas flash attention", pallas_kernel)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
