#!/usr/bin/env python
"""Flash-attention tile tuner: sweep (block_q, block_kv) on the real chip.

Run on TPU:  python tools/tune_attention.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from chronoedit_tpu.ops.flash_attention import flash_attention

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def readback_overhead():
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 8), jnp.float32)
    for _ in range(3):
        float(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x))
    return (time.perf_counter() - t0) / 10


def sweep(B, S, H=40, D=128, iters=5):
    """Sweep (block_q, block_kv) at a (batch, seq) self-attention shape.
    S=7200 is the 720p edit sequence (resident-KV path); S=28800 the
    29-frame reasoning sequence (streamed-KV path). Forces group=1 so the
    raw block sizes are what's measured — the production default is the
    grouped streamed fetch (3x512; A/B it with --group-ab, full n-by-block
    table in tools/exp_flash_paired.py)."""
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    scale = D ** -0.5
    flops = 4 * B * H * S * S * D
    rb = readback_overhead()
    print(f"== B={B} S={S} (readback {rb * 1e3:.1f} ms)")

    ref = None
    for bq in (256, 512, 1024, 2048):
        for bkv in (512, 1024, 2048, 4096):
            try:
                f = jax.jit(lambda q, k, v, bq=bq, bkv=bkv: jnp.sum(
                    flash_attention(q, k, v, scale=scale, block_q=bq,
                                    block_kv=bkv,
                                    group=1).astype(jnp.float32)))
                s0 = float(f(q, k, v))
                if ref is None:
                    ref = s0
                t0 = time.perf_counter()
                for _ in range(iters):
                    float(f(q, k, v))
                dt = (time.perf_counter() - t0) / iters - rb
                ok = abs(s0 - ref) < abs(ref) * 1e-3 + 1.0
                print(f"bq={bq:5d} bkv={bkv:5d}: {dt * 1e3:7.2f} ms "
                      f"({flops / dt / 1e12:6.1f} TFLOP/s) sum_ok={ok}",
                      flush=True)
            except Exception as e:
                print(f"bq={bq:5d} bkv={bkv:5d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)

    # cross-attention shape
    k2 = jax.random.normal(ks[1], (B, 769, H, D), jnp.bfloat16)
    v2 = jax.random.normal(ks[2], (B, 769, H, D), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, scale=scale).astype(jnp.float32)))
    float(f(q, k2, v2))
    t0 = time.perf_counter()
    for _ in range(5):
        float(f(q, k2, v2))
    print(f"cross 769kv: {((time.perf_counter() - t0) / 5 - rb) * 1e3:.2f} ms",
          flush=True)


def diet_ab(B, S, H=40, D=128, iters=8, reps=20):
    """A/B the round-4 VPU diet (q-prescale + additive pad mask) at the
    production block sizes, using in-graph scan repetition to defeat the
    ~30-40 ms tunnel readback jitter (memory: timing discipline)."""
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    scale = D ** -0.5
    flops = 4 * B * H * S * S * D
    print(f"== diet A/B: B={B} S={S}", flush=True)

    def timed(diet, n):
        # k/v must be jit ARGUMENTS: closing over them embeds 100+ MB
        # constants in the HLO and the compile tunnel rejects the payload.
        # The scalar float() readback is what forces execution on the
        # tunneled runtime (block_until_ready alone does NOT); the carry
        # perturbation defeats CSE across scan iterations.
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                o = flash_attention(c, k, v, scale=scale, diet=diet)
                return c + 1e-6, jnp.sum(o.astype(jnp.float32))

            return jnp.sum(jax.lax.scan(body, q, None, length=n)[1])

        for _ in range(2):
            s = float(run(q, k, v))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(run(q, k, v))
        assert s == s
        return (time.perf_counter() - t0) / iters

    for diet in (False, True):
        t_long = timed(diet, reps)
        t_short = timed(diet, reps // 2)
        dt = (t_long - t_short) / (reps - reps // 2)
        print(f"diet={diet}: {dt * 1e3:7.2f} ms/call "
              f"({flops / dt / 1e12:6.1f} TFLOP/s)", flush=True)


def kt_ab(B, S, H=40, D=128, iters=8, reps=20):
    """A/B the k-major layout (K fed to the kernels as (D, S), one XLA
    transpose outside) at production block sizes, scan-chained timing."""
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    scale = D ** -0.5
    flops = 4 * B * H * S * S * D
    print(f"== k-major A/B: B={B} S={S}", flush=True)

    def timed(k_major, n):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                o = flash_attention(c, k, v, scale=scale, k_major=k_major)
                return c + 1e-6, jnp.sum(o.astype(jnp.float32))

            return jnp.sum(jax.lax.scan(body, q, None, length=n)[1])

        for _ in range(2):
            s = float(run(q, k, v))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(run(q, k, v))
        assert s == s
        return (time.perf_counter() - t0) / iters, s

    for k_major in (False, True):
        (t_long, s_long) = timed(k_major, reps)
        (t_short, _) = timed(k_major, reps // 2)
        dt = (t_long - t_short) / (reps - reps // 2)
        print(f"k_major={k_major}: {dt * 1e3:7.2f} ms/call "
              f"({flops / dt / 1e12:6.1f} TFLOP/s) sum={s_long:.3f}",
              flush=True)


def group_ab(B, S, H=40, D=128, iters=8, reps=20):
    """A/B the grouped streamed fetch (planned default, 3x512) against the
    ungrouped 1x1024 stream at a given shape, scan-chained timing."""
    from chronoedit_tpu.ops import flash_attention as fa

    # advisor r4: shapes whose KV fits resident in VMEM plan the resident
    # kernel for BOTH arms (group is ignored there), so the A/B would just
    # time the same kernel twice and print a misleading null result
    if fa._plan_blocks(S, S, D, 2, fa._BLOCK_Q, fa._BLOCK_KV, None)[2] == 1:
        print(f"== group A/B: B={B} S={S}: SKIPPED (KV fits resident; "
              "grouping only applies to the streamed path)", flush=True)
        return
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    scale = D ** -0.5
    flops = 4 * B * H * S * S * D
    print(f"== group A/B: B={B} S={S}", flush=True)

    def timed(group, n):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                o = flash_attention(c, k, v, scale=scale, group=group)
                return c + 1e-6, jnp.sum(o.astype(jnp.float32))

            return jnp.sum(jax.lax.scan(body, q, None, length=n)[1])

        for _ in range(2):
            s = float(run(q, k, v))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(run(q, k, v))
        assert s == s
        return (time.perf_counter() - t0) / iters

    for group in (1, None):  # 1 = ungrouped; None = planned default
        t_long = timed(group, reps)
        t_short = timed(group, reps // 2)
        dt = (t_long - t_short) / (reps - reps // 2)
        print(f"group={group}: {dt * 1e3:7.2f} ms/call "
              f"({flops / dt / 1e12:6.1f} TFLOP/s)", flush=True)


def qk8_ab(B, S, H=40, D=128, iters=8, reps=20):
    """A/B the int8-score streamed kernel (round 5) against the bf16 kernel
    at a streamed shape, scan-chained timing. Includes the XLA-level q/k
    quantization prep in the qk8 arm — that is what serving pays."""
    from chronoedit_tpu.ops import flash_attention as fa

    if fa._plan_blocks(S, S, D, 2, fa._BLOCK_Q, fa._BLOCK_KV, None)[2] == 1:
        print(f"== qk8 A/B: B={B} S={S}: SKIPPED (KV fits resident; the "
              "int8 kernel covers the streamed path only)", flush=True)
        return
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    scale = D ** -0.5
    flops = 4 * B * H * S * S * D
    print(f"== qk8 A/B: B={B} S={S}", flush=True)

    def timed(qk8, n):
        fn = fa.flash_attention_qk_int8 if qk8 else flash_attention

        @jax.jit
        def run(q, k, v):
            def body(c, _):
                o = fn(c, k, v, scale=scale)
                return c + 1e-6, jnp.sum(o.astype(jnp.float32))

            return jnp.sum(jax.lax.scan(body, q, None, length=n)[1])

        for _ in range(2):
            s = float(run(q, k, v))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = float(run(q, k, v))
        assert s == s
        return (time.perf_counter() - t0) / iters

    for qk8 in (False, True):
        t_long = timed(qk8, reps)
        t_short = timed(qk8, reps // 2)
        dt = (t_long - t_short) / (reps - reps // 2)
        print(f"qk8={qk8}: {dt * 1e3:7.2f} ms/call "
              f"({flops / dt / 1e12:6.1f} TFLOP/s)", flush=True)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="edit",
                   choices=["edit", "reasoning", "both"])
    p.add_argument("--diet-ab", action="store_true",
                   help="A/B the VPU-diet kernel variant instead of the "
                        "block sweep")
    p.add_argument("--kt-ab", action="store_true",
                   help="A/B the k-major K layout instead of the block sweep")
    p.add_argument("--group-ab", action="store_true",
                   help="A/B the grouped streamed fetch vs ungrouped")
    p.add_argument("--qk8-ab", action="store_true",
                   help="A/B the int8-score streamed kernel vs bf16")
    a = p.parse_args()
    if a.qk8_ab:
        if a.shapes in ("edit", "both"):
            qk8_ab(2, 7200)
        if a.shapes in ("reasoning", "both"):
            qk8_ab(2, 28800, iters=3, reps=8)
        return
    if a.group_ab:
        if a.shapes in ("edit", "both"):
            group_ab(2, 7200)
        if a.shapes in ("reasoning", "both"):
            group_ab(2, 28800, iters=3, reps=8)
        return
    if a.kt_ab:
        if a.shapes in ("edit", "both"):
            kt_ab(2, 7200)
        if a.shapes in ("reasoning", "both"):
            kt_ab(2, 28800, iters=3, reps=8)
        return
    if a.diet_ab:
        if a.shapes in ("edit", "both"):
            diet_ab(2, 7200)
        if a.shapes in ("reasoning", "both"):
            diet_ab(2, 28800, iters=3, reps=8)
        return
    if a.shapes in ("edit", "both"):
        sweep(2, 7200)
    if a.shapes in ("reasoning", "both"):
        sweep(2, 28800, iters=2)


if __name__ == "__main__":
    main()
