"""Parallelism tests on the virtual 8-device CPU mesh: ring/Ulysses
attention exactness, mesh construction, TP/FSDP-sharded DiT parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.models import dit as dit_lib
from chronoedit_tpu.ops.attention import dot_product_attention
from chronoedit_tpu.parallel import (
    MeshConfig, make_mesh, ring_attention, ulysses_attention,
    shard_params, split_sequence, gather_sequence,
)
from chronoedit_tpu.parallel.sharding import dit_param_sharding
from tests.test_dit import TINY, _inputs, _randomize


def _qkv(b=2, s=64, h=8, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [jax.random.normal(k, (b, s, h, d), jnp.float32) for k in ks]


def test_mesh_construction():
    mesh = make_mesh(MeshConfig(data=-1, context=4))
    assert mesh.shape["context"] == 4
    assert mesh.shape["data"] == 2  # 8 devices total
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, context=3))


@pytest.mark.slow
def test_ring_attention_matches_dense():
    mesh = make_mesh(MeshConfig(data=1, context=8))
    q, k, v = _qkv()
    dense = dot_product_attention(q, k, v)
    ring = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ring_attention_context2():
    mesh = make_mesh(MeshConfig(data=4, context=2))
    q, k, v = _qkv(s=32)
    dense = dot_product_attention(q, k, v)
    ring = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ulysses_attention_matches_dense():
    mesh = make_mesh(MeshConfig(data=1, context=8))
    q, k, v = _qkv()
    dense = dot_product_attention(q, k, v)
    uly = ulysses_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(uly), np.asarray(dense), atol=2e-5)


def test_split_gather_sequence_roundtrip():
    mesh = make_mesh(MeshConfig(data=1, context=8))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 2, 2))
    with mesh:
        y = gather_sequence(split_sequence(x, mesh, seq_dim=2), mesh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)


@pytest.mark.parametrize("cfgname,meshcfg", [
    ("tp8", MeshConfig(data=1, tensor=8)),
    ("fsdp8", MeshConfig(data=1, fsdp=8)),
    # hybrid covered by the driver dryrun + full tier (11 s)
    pytest.param("tp2fsdp2", MeshConfig(data=2, fsdp=2, tensor=2),
                 marks=pytest.mark.slow),
])
def test_sharded_dit_matches_single_device(cfgname, meshcfg):
    """GSPMD-sharded DiT forward must be numerically identical to the
    unsharded one (param layout is a performance choice, not math)."""
    params = _randomize(dit_lib.init_dit_params(jax.random.PRNGKey(0), TINY),
                        jax.random.PRNGKey(1))
    x, ts, text, img = _inputs(TINY, b=2)
    args = (jnp.asarray(x), jnp.asarray(ts), jnp.asarray(text), jnp.asarray(img))
    ref = dit_lib.dit_forward(params, TINY, *args)

    mesh = make_mesh(meshcfg)
    sharded = shard_params(params, mesh, dit_param_sharding(mesh))
    with mesh:
        fwd = jax.jit(lambda p, *a: dit_lib.dit_forward(p, TINY, *a))
        out = fwd(sharded, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_flash_ring_attention_matches_dense_with_grads():
    """D=128 routes ring attention through the Pallas flash hops (interpret
    mode on CPU) with the custom global-lse VJP — fwd and all three grads
    must match dense attention."""
    mesh = make_mesh(MeshConfig(data=1, context=8))
    q, k, v = _qkv(b=2, s=256, h=2, d=128)
    dense = dot_product_attention(q, k, v)
    ring = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=5e-5)

    g_ring = jax.grad(
        lambda q, k, v: jnp.sum(ring_attention(q, k, v, mesh) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(
        lambda q, k, v: jnp.sum(dot_product_attention(q, k, v) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ring, g_dense):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4 * scale, err_msg=f"d{name}")


@pytest.mark.slow
def test_flash_kernel_interpret_matches_xla():
    """The Pallas kernels run in interpret mode on CPU: fwd + bwd vs XLA,
    covering both the VMEM-resident and the streamed-KV paths."""
    from chronoedit_tpu.ops.flash_attention import flash_attention

    for s, block_kv in [(256, 128), (384, 128)]:  # ragged final block too
        ks = jax.random.split(jax.random.PRNGKey(s), 3)
        q, k, v = [jax.random.normal(kk, (1, s, 2, 128), jnp.float32)
                   for kk in ks]
        ref = dot_product_attention(q, k, v, backend="xla")
        got = flash_attention(q, k, v, scale=128 ** -0.5, block_kv=block_kv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
        g1 = jax.grad(lambda a: jnp.sum(
            flash_attention(a, k, v, scale=128 ** -0.5,
                            block_kv=block_kv) ** 2))(q)
        g2 = jax.grad(lambda a: jnp.sum(
            dot_product_attention(a, k, v, backend="xla") ** 2))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


@pytest.mark.slow
def test_flash_streamed_diet_matches_xla(monkeypatch):
    """The streamed-KV kernel's VPU diet (q-prescale + additive 0/-inf pad
    mask, round 4) must match XLA and the non-diet kernel exactly in fp32 —
    including a ragged final KV block where the additive mask carries the
    padding. Residency is monkeypatched down to force the streamed path at
    test-sized shapes."""
    from chronoedit_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_RESIDENT_KV_BYTES", 1)
    s = 384  # pads to 512 at block 128 -> masked streamed blocks
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = [jax.random.normal(kk, (1, s, 2, 128), jnp.float32)
               for kk in ks]
    ref = dot_product_attention(q, k, v, backend="xla")
    for diet in (True, False):
        got = fa.flash_attention(q, k, v, scale=128 ** -0.5, block_q=128,
                                 block_kv=128, diet=diet)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, err_msg=f"diet={diet}")


@pytest.mark.slow
def test_flash_grouped_stream_matches_xla(monkeypatch):
    """The grouped streamed kernel (round 4: `group` independent KV blocks
    per grid step, hoisted score matmuls, ONE combined online-softmax
    update) must match XLA — with a ragged final block sliced per sub-block
    from the additive bias (diet), with the iota mask (non-diet), on the
    exact group-multiple (unmasked) shape, and through the custom-vjp
    backward, whose residuals are padded to the group multiple."""
    from chronoedit_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_RESIDENT_KV_BYTES", 1)
    s = 384
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    q, k, v = [jax.random.normal(kk, (1, s, 2, 128), jnp.float32)
               for kk in ks]
    ref = dot_product_attention(q, k, v, backend="xla")
    # group=2: 384 pads to 512 -> masked grouped blocks (bias sub-slices)
    # group=3: 384 = 3*128 exactly -> unmasked grouped path
    for group, diet in [(2, True), (2, False), (3, True)]:
        got = fa.flash_attention(q, k, v, scale=128 ** -0.5, block_q=128,
                                 block_kv=128, diet=diet, group=group)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5,
            err_msg=f"group={group} diet={diet}")
    g1 = jax.grad(lambda a: jnp.sum(fa.flash_attention(
        a, k, v, scale=128 ** -0.5, block_q=128, block_kv=128,
        group=2) ** 2))(q)
    g2 = jax.grad(lambda a: jnp.sum(
        dot_product_attention(a, k, v, backend="xla") ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


@pytest.mark.slow
def test_flash_k_major_bitwise_matches_row_major(monkeypatch):
    """The k-major layout (K fed to the kernels as (D, S), round 4) is a
    pure layout change — fwd must be BITWISE identical to the row-major
    kernels on both the resident and the (forced) streamed path, including
    ragged padding, and the custom-vjp backward must still run (it keeps
    row-major residuals regardless of the forward layout)."""
    from chronoedit_tpu.ops import flash_attention as fa

    s = 384
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q, k, v = [jax.random.normal(kk, (1, s, 2, 128), jnp.float32)
               for kk in ks]
    for forced_stream in (False, True):
        if forced_stream:
            monkeypatch.setattr(fa, "_RESIDENT_KV_BYTES", 1)
        a = fa.flash_attention(q, k, v, scale=128 ** -0.5, block_q=128,
                               block_kv=128, k_major=False)
        b = fa.flash_attention(q, k, v, scale=128 ** -0.5, block_q=128,
                               block_kv=128, k_major=True)
        assert jnp.array_equal(a, b), f"streamed={forced_stream}"
    g = jax.grad(lambda a: jnp.sum(fa.flash_attention(
        a, k, v, scale=128 ** -0.5, block_q=128, block_kv=128,
        k_major=True) ** 2))(q)
    assert bool(jnp.all(jnp.isfinite(g)))

@pytest.mark.slow
def test_flash_qk_int8_close_to_xla(monkeypatch):
    """The int8-score streamed kernel (round 5: per-token-quantized q and
    mean-centered k, s8 MXU score dots, rank-1 fp32 dequant) must track XLA
    attention within int8 quantization error — on the masked (ragged final
    block), grouped, and exact group-multiple paths — and the short-sequence
    resident fallback must stay bitwise bf16."""
    from chronoedit_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_RESIDENT_KV_BYTES", 1)
    s = 384
    ks = jax.random.split(jax.random.PRNGKey(23), 3)
    q, k, v = [jax.random.normal(kk, (1, s, 2, 128), jnp.float32)
               for kk in ks]
    # shift K hard off zero-mean: the kernel's mean-centering must absorb it
    k = k + 3.0
    ref = np.asarray(dot_product_attention(q, k, v, backend="xla"))
    for group in (1, 2, 3):  # 2 -> masked grouped; 3 -> exact multiple
        got = np.asarray(fa.flash_attention_qk_int8(
            q, k, v, scale=128 ** -0.5, block_q=128, block_kv=128,
            group=group))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        # per-token int8 noise floor: score RMS error ~ sqrt(2D)*(3sigma/127)
        # /sqrt(12) -> ~1% relative on the output for normal data. The
        # quality verdict is the pipeline PSNR gate (test_quant.py), not
        # this kernel-level sanity bound.
        assert rel < 2e-2, f"group={group}: rel={rel}"
        # int8 scores must be closer than plain bf16 attention error scale
        assert np.isfinite(got).all()


def test_flash_qk_int8_resident_fallback():
    """Resident-planned shapes take the bf16 kernel verbatim."""
    from chronoedit_tpu.ops import flash_attention as fa

    ks = jax.random.split(jax.random.PRNGKey(29), 3)
    q, k, v = [jax.random.normal(kk, (1, 256, 2, 128), jnp.float32)
               for kk in ks]
    a = fa.flash_attention_qk_int8(q, k, v, scale=128 ** -0.5)
    b = fa.flash_attention(q, k, v, scale=128 ** -0.5)
    assert jnp.array_equal(a, b)
