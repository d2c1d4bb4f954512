"""Spatially-sharded VAE must be numerically identical to unsharded (GSPMD
halo exchange correctness on the virtual 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chronoedit_tpu.models import vae as vae_lib
from chronoedit_tpu.parallel import MeshConfig, make_mesh
from tests.test_vae import TINY


@pytest.mark.slow  # ~30 s; the driver dryrun covers sharded VAE too
def test_sharded_vae_encode_decode_match():
    params = vae_lib.init_vae_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 32, 32))
    ref_z = vae_lib.vae_encode(params, TINY, x, normalize=False)
    ref_y = vae_lib.vae_decode(params, TINY, ref_z, normalize=False)

    mesh = make_mesh(MeshConfig(data=1, context=4, tensor=2))
    with mesh:
        enc = jax.jit(lambda p, v: vae_lib.vae_encode(p, TINY, v,
                                                      normalize=False, mesh=mesh))
        dec = jax.jit(lambda p, z: vae_lib.vae_decode(p, TINY, z,
                                                      normalize=False, mesh=mesh))
        z = enc(params, x)
        y = dec(params, z)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=2e-5)


@pytest.mark.slow
def test_sharded_vae_indivisible_h_falls_back():
    params = vae_lib.init_vae_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 20, 16))  # H=20 % 8 != 0
    mesh = make_mesh(MeshConfig(data=1, context=8))
    with mesh:
        z = vae_lib.vae_encode(params, TINY, x, normalize=False, mesh=mesh)
    ref = vae_lib.vae_encode(params, TINY, x, normalize=False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_sharded_streamed_encode_decode_match():
    """The STREAMED paths (r4: chunked encode/decode scans with per-conv
    cache carries) must also survive GSPMD spatial sharding — the reasoning
    pipeline runs them under the deployment mesh, where the scan carry and
    the halo exchanges compose."""
    params = vae_lib.init_vae_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 7, 32, 32))
    ref_z = vae_lib.vae_encode(params, TINY, x, normalize=False,
                               streaming=False)
    ref_y = vae_lib.vae_decode(params, TINY, ref_z, normalize=False,
                               streaming=False)

    mesh = make_mesh(MeshConfig(data=1, context=4, tensor=2))
    with mesh:
        enc = jax.jit(lambda p, v: vae_lib.vae_encode(
            p, TINY, v, normalize=False, mesh=mesh, streaming=True))
        dec = jax.jit(lambda p, z: vae_lib.vae_decode(
            p, TINY, z, normalize=False, mesh=mesh, streaming=True))
        z = enc(params, x)
        y = dec(params, z)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=2e-5)
