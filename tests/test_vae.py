"""Wan VAE tests: compression geometry, causality, streaming invariants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.models import vae as vae_lib

# Tiny config: dim 8, mult (1,2,2), 1 res block, temporal down (False, True)
# -> spatial 4x, temporal 2x. Exercises every code path cheaply.
TINY = vae_lib.VAEConfig(
    dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
    temporal_downsample=(False, True),
)


@pytest.fixture(scope="module")
def tiny_vae():
    params = vae_lib.init_vae_params(jax.random.PRNGKey(0), TINY)
    return params


def test_compression_factors():
    assert TINY.spatial_factor == 4
    assert TINY.temporal_factor == 2
    full = vae_lib.VAEConfig()
    assert full.spatial_factor == 8
    assert full.temporal_factor == 4
    assert full.latent_frames(5) == 2
    assert full.latent_frames(29) == 8
    assert full.pixel_frames(2) == 5


def test_encode_decode_shapes(tiny_vae):
    T = 5  # 1 + 2k pixel frames for temporal factor 2
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, T, 16, 16))
    z = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False)
    assert z.shape == (1, TINY.z_dim, 1 + (T - 1) // 2, 4, 4)
    y = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False)
    assert y.shape == (1, 3, T, 16, 16)
    assert bool(jnp.isfinite(y).all())


@pytest.mark.slow  # ~20 s compile; shape logic also covered below
def test_single_frame_roundtrip_shapes(tiny_vae):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 1, 16, 16))
    z = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False)
    assert z.shape == (2, TINY.z_dim, 1, 4, 4)
    y = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False)
    assert y.shape == (2, 3, 1, 16, 16)


def test_encoder_causality(tiny_vae):
    """Latent frame i must not depend on pixel frames later than its chunk —
    the property that makes chunked streaming == full-sequence encode."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 3, 5, 16, 16))
    z1 = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False)
    # perturb the last 2 pixel frames: latent frames 0..1 (from pixels 0..2)
    # must be bit-identical
    x2 = x.at[:, :, 3:].add(jax.random.normal(jax.random.PRNGKey(3), (1, 3, 2, 16, 16)))
    z2 = vae_lib.vae_encode(tiny_vae, TINY, x2, normalize=False)
    np.testing.assert_allclose(np.asarray(z1[:, :, :2]), np.asarray(z2[:, :, :2]),
                               atol=1e-5)
    assert float(jnp.abs(z1[:, :, 2] - z2[:, :, 2]).max()) > 1e-4


def test_decoder_causality(tiny_vae):
    """Pixel frame block i depends only on latent frames <= i (frame-by-frame
    streaming decode equivalence)."""
    z = jax.random.normal(jax.random.PRNGKey(4), (1, TINY.z_dim, 3, 4, 4))
    y1 = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False)
    z2 = z.at[:, :, 2].add(1.0)
    y2 = vae_lib.vae_decode(tiny_vae, TINY, z2, normalize=False)
    # pixels for latent frames 0-1: frames 0..2 (1 + 2*1) unchanged
    np.testing.assert_allclose(np.asarray(y1[:, :, :3]), np.asarray(y2[:, :, :3]),
                               atol=1e-5)
    assert float(jnp.abs(y1[:, :, 3:] - y2[:, :, 3:]).max()) > 1e-4


@pytest.mark.slow  # ~17 s compile; normalization math is pure jnp
def test_latent_normalization_roundtrip(tiny_vae):
    cfg = dataclasses.replace(TINY, z_dim=16)
    params = vae_lib.init_vae_params(jax.random.PRNGKey(5), cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 3, 16, 16))
    z_norm = vae_lib.vae_encode(params, cfg, x, normalize=True)
    z_raw = vae_lib.vae_encode(params, cfg, x, normalize=False)
    mean = vae_lib.WAN_LATENT_MEAN.reshape(1, 16, 1, 1, 1)
    std = vae_lib.WAN_LATENT_STD.reshape(1, 16, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(z_norm), (np.asarray(z_raw) - mean) / std,
                               rtol=1e-4, atol=1e-4)


def test_spatial_up_subpixel_equivalence():
    """The subpixel upsample+conv must equal the direct nearest2x+conv3x3."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = {"kernel": jax.random.normal(k1, (1, 3, 3, 8, 4)) * 0.2,
         "bias": jax.random.normal(k2, (4,)) * 0.1}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 5, 7, 8))
    a = vae_lib._spatial_up(p, x)
    b = vae_lib._spatial_up_subpixel(p, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_chunked_encode_equals_full(tiny_vae):
    """Full-sequence encode == concat of causal-chunk encodes when chunks are
    re-fed with their pixel context (the property the reference streams on).

    We check the weaker but sufficient invariant: encoding the first 1+2k
    frames yields exactly the first 1+k latent frames of the full encode.
    """
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 5, 16, 16))
    z_full = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False)
    z_head = vae_lib.vae_encode(tiny_vae, TINY, x[:, :, :3], normalize=False)
    np.testing.assert_allclose(np.asarray(z_full[:, :, :2]), np.asarray(z_head),
                               atol=1e-5)


def test_streamed_decode_matches_full(tiny_vae):
    """round-4: chunked streaming decode (explicit per-conv caches, chunk 0
    primes, scan over the rest) must EXACTLY equal the full-sequence decode
    — a zero-initialized cache IS the causal zero left-pad. This is the
    path that makes the 29-frame reasoning decode fit one chip (the
    full-sequence decoder materializes multi-GB feature maps there)."""
    z = jax.random.normal(jax.random.PRNGKey(9), (1, TINY.z_dim, 5, 4, 4))
    full = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False,
                              streaming=False)
    streamed = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False,
                                  streaming=True)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(np.asarray(streamed, np.float32),
                               np.asarray(full, np.float32),
                               atol=2e-5, rtol=2e-5)
    # auto mode picks streaming for long clips and full for the edit clip
    auto = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False)
    np.testing.assert_allclose(np.asarray(auto, np.float32),
                               np.asarray(full, np.float32),
                               atol=2e-5, rtol=2e-5)
    z2 = z[:, :, :2]
    np.testing.assert_allclose(
        np.asarray(vae_lib.vae_decode(tiny_vae, TINY, z2, normalize=False),
                   np.float32),
        np.asarray(vae_lib.vae_decode(tiny_vae, TINY, z2, normalize=False,
                                      streaming=True), np.float32),
        atol=2e-5, rtol=2e-5)


def test_streamed_decode_under_jit(tiny_vae):
    """The streamed decode must trace cleanly inside an outer jit (the
    pipeline's dual decode calls it from the jitted run)."""
    z = jax.random.normal(jax.random.PRNGKey(10), (1, TINY.z_dim, 3, 4, 4))
    f = jax.jit(lambda z: vae_lib.vae_decode(tiny_vae, TINY, z,
                                             normalize=False, streaming=True))
    out = f(z)
    ref = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False,
                             streaming=False)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-5, rtol=2e-5)


def test_streamed_encode_matches_full(tiny_vae):
    """round-4: chunked 1+tfac-frame streaming ENCODE must exactly equal the
    full-sequence encode (same invariant as the decode: a zero cache IS the
    causal left-pad; the stride-2 temporal-down windows land on even global
    indices so a 1-frame cache carries across chunks). This is the path
    that lets the 29-frame reasoning conditioning volume fit one chip —
    prepare_condition encodes 29 frames at 720p and the full-sequence
    front-stage maps are ~5 GB bf16 each."""
    for T in (7, 9):  # 1 + 2k pixel frames for temporal factor 2
        x = jax.random.normal(jax.random.PRNGKey(20 + T), (1, 3, T, 16, 16))
        full = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False,
                                  streaming=False)
        streamed = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False,
                                      streaming=True)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(np.asarray(streamed, np.float32),
                                   np.asarray(full, np.float32),
                                   atol=2e-5, rtol=2e-5)
    # auto mode: streams beyond the 5-frame edit clip, full at 5
    auto = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False)
    np.testing.assert_allclose(np.asarray(auto, np.float32),
                               np.asarray(full, np.float32),
                               atol=2e-5, rtol=2e-5)


def test_tiled_streaming_encode_matches_untiled(tiny_vae):
    """round 5 (VERDICT r4 #3): W-tiled streaming encode (pre-mid stages on
    halo'd tiles, global-attention mid untiled) must exactly match the
    untiled streamed encode — the halo covers the pre-mid receptive field,
    so interior results are identical. This is the lever that cut the 720p
    reasoning encode's measured 8.6 GB temp peak."""
    for T, tiles, streaming in ((9, 2, True), (5, 4, True), (5, 2, False),
                                (3, 4, False)):
        x = jax.random.normal(jax.random.PRNGKey(30 + T + tiles),
                              (1, 3, T, 16, 64))
        ref = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False,
                                 streaming=streaming, spatial_tiles=1)
        tiled = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False,
                                   streaming=streaming, spatial_tiles=tiles)
        assert tiled.shape == ref.shape
        np.testing.assert_allclose(np.asarray(tiled, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-5, rtol=2e-5)
    # indivisible W is rejected rather than silently mis-tiled
    with pytest.raises(ValueError):
        vae_lib.vae_encode(tiny_vae, TINY,
                           jax.random.normal(jax.random.PRNGKey(1),
                                             (1, 3, 9, 16, 60)),
                           normalize=False, streaming=True, spatial_tiles=4)


def test_tiled_streaming_decode_matches_untiled(tiny_vae):
    """round 5: W-tiled streaming decode (mid untiled at latent scale,
    halo'd up-stages per tile) must exactly match the untiled stream."""
    for tl, tiles, streaming in ((5, 2, True), (4, 4, True), (2, 2, False),
                                 (3, 4, False)):
        z = jax.random.normal(jax.random.PRNGKey(40 + tl + tiles),
                              (1, TINY.z_dim, tl, 8, 32))
        ref = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False,
                                 streaming=streaming, spatial_tiles=1)
        tiled = vae_lib.vae_decode(tiny_vae, TINY, z, normalize=False,
                                   streaming=streaming, spatial_tiles=tiles)
        assert tiled.shape == ref.shape
        np.testing.assert_allclose(np.asarray(tiled, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-5, rtol=2e-5)
    with pytest.raises(ValueError):
        vae_lib.vae_decode(tiny_vae, TINY,
                           jax.random.normal(jax.random.PRNGKey(1),
                                             (1, TINY.z_dim, 5, 8, 30)),
                           normalize=False, streaming=True, spatial_tiles=4)


def test_encoder_halo_covers_receptive_field():
    """The halo formula must bound the true pre-mid receptive field: push a
    delta through the pre-mid stages and check its bottleneck support."""
    cfg14 = vae_lib.VAEConfig()  # 14B geometry
    assert vae_lib._encoder_halo(cfg14) == 80
    assert vae_lib._encoder_halo(TINY) % TINY.spatial_factor == 0


def test_streamed_encode_stacked_temporal_downs():
    """Two stacked temporal downsamples (the real Wan geometry, factor 4):
    the inner stage sees 2-frame chunks from the outer one and its 1-frame
    window cache must stay shape-stable under the scan."""
    cfg = vae_lib.VAEConfig(dim=4, z_dim=4, dim_mult=(1, 1, 2, 2),
                            num_res_blocks=1,
                            temporal_downsample=(False, True, True))
    assert cfg.temporal_factor == 4
    params = vae_lib.init_vae_params(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 13, 16, 16))
    full = vae_lib.vae_encode(params, cfg, x, normalize=False,
                              streaming=False)
    streamed = vae_lib.vae_encode(params, cfg, x, normalize=False,
                                  streaming=True)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(np.asarray(streamed, np.float32),
                               np.asarray(full, np.float32),
                               atol=2e-5, rtol=2e-5)


def test_streamed_encode_under_jit(tiny_vae):
    """The streamed encode must trace cleanly inside an outer jit (the
    pipeline's prepare_condition calls it from the jitted run)."""
    x = jax.random.normal(jax.random.PRNGKey(21), (1, 3, 7, 16, 16))
    f = jax.jit(lambda x: vae_lib.vae_encode(tiny_vae, TINY, x,
                                             normalize=False, streaming=True))
    out = f(x)
    ref = vae_lib.vae_encode(tiny_vae, TINY, x, normalize=False,
                             streaming=False)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-5, rtol=2e-5)
