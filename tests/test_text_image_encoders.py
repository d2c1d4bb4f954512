"""UMT5 text encoder + CLIP vision tower tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from chronoedit_tpu.models import clip as clip_lib
from chronoedit_tpu.models import umt5 as umt5_lib

TINY_T5 = umt5_lib.UMT5Config(
    vocab_size=100, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
    num_layers=2, num_buckets=8, text_len=12, dtype=jnp.float32,
)
TINY_CLIP = clip_lib.CLIPVisionConfig(
    image_size=28, patch_size=14, dim=16, mlp_ratio=2, num_heads=2,
    num_layers=3, dtype=jnp.float32,
)


def test_relative_position_buckets():
    b = umt5_lib.relative_position_buckets(6, num_buckets=8, max_dist=16)
    assert b.shape == (6, 6)
    assert b[0, 0] == 0  # same position
    # past (key before query, rel<0 -> bucket in [0, nb)) vs future (+nb)
    assert b[3, 1] < 4 and b[1, 3] >= 4
    # symmetric distance -> mirrored bucket classes
    assert b[2, 0] == b[3, 1]


def test_umt5_encode_shapes_and_mask():
    params = umt5_lib.init_umt5_params(jax.random.PRNGKey(0), TINY_T5)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, (2, 8)), jnp.int32)
    mask = jnp.asarray([[1] * 5 + [0] * 3, [1] * 8], jnp.int32)
    out = umt5_lib.umt5_encode(params, TINY_T5, ids, mask)
    assert out.shape == (2, 8, 16)
    assert bool(jnp.isfinite(out).all())

    # padded-key invariance: garbage in masked positions must not change
    # valid-position outputs
    ids2 = ids.at[0, 5:].set(jnp.asarray(rng.integers(0, 100, (3,))))
    out2 = umt5_lib.umt5_encode(params, TINY_T5, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[0, :5]), np.asarray(out2[0, :5]),
                               atol=1e-5)


def test_umt5_text_encoder_zero_pads():
    params = umt5_lib.init_umt5_params(jax.random.PRNGKey(0), TINY_T5)
    enc = umt5_lib.UMT5TextEncoder(params, TINY_T5)
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.asarray([[1] * 3 + [0] * 5], jnp.int32)
    out = enc.encode_ids(ids, mask)
    assert float(jnp.abs(out[0, 3:]).max()) == 0.0
    assert float(jnp.abs(out[0, :3]).max()) > 0.0


def test_umt5_checkpoint_converter_roundtrip():
    params = umt5_lib.init_umt5_params(jax.random.PRNGKey(1), TINY_T5)
    # synthesize the reference-named state dict
    sd = {
        "token_embedding.weight": np.asarray(params["token_embedding"]),
        "norm.weight": np.asarray(params["norm"]["scale"]),
    }
    for i in range(TINY_T5.num_layers):
        blk = jax.tree_util.tree_map(lambda a: np.asarray(a)[i], params["blocks"])
        sd[f"blocks.{i}.norm1.weight"] = blk["norm1"]["scale"]
        sd[f"blocks.{i}.norm2.weight"] = blk["norm2"]["scale"]
        for k in ("q", "k", "v", "o"):
            sd[f"blocks.{i}.attn.{k}.weight"] = blk["attn"][k]["kernel"].T
        sd[f"blocks.{i}.ffn.gate.0.weight"] = blk["ffn"]["gate"]["kernel"].T
        sd[f"blocks.{i}.ffn.fc1.weight"] = blk["ffn"]["fc1"]["kernel"].T
        sd[f"blocks.{i}.ffn.fc2.weight"] = blk["ffn"]["fc2"]["kernel"].T
        sd[f"blocks.{i}.pos_embedding.embedding.weight"] = blk["rel_emb"]
    back = umt5_lib.convert_umt5_checkpoint(sd, num_layers=TINY_T5.num_layers)
    ids = jnp.ones((1, 6), jnp.int32)
    a = umt5_lib.umt5_encode(params, TINY_T5, ids)
    b = umt5_lib.umt5_encode(jax.tree_util.tree_map(jnp.asarray, back), TINY_T5, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_clip_vision_forward():
    params = clip_lib.init_clip_vision_params(jax.random.PRNGKey(0), TINY_CLIP)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))
    pen = clip_lib.clip_vision_forward(params, TINY_CLIP, x, penultimate=True)
    # 28/14 = 2x2 patches + CLS = 5 tokens
    assert pen.shape == (2, 5, 16)
    full = clip_lib.clip_vision_forward(params, TINY_CLIP, x, penultimate=False)
    assert float(jnp.abs(pen - full).max()) > 1e-5


def test_clip_preprocess():
    img = jnp.zeros((1, 3, 17, 33))  # odd size, [-1,1] black -> 0.0 after rescale
    out = clip_lib.preprocess(img, 28)
    assert out.shape == (1, 3, 28, 28)
    expect = (0.5 - clip_lib.CLIP_MEAN) / clip_lib.CLIP_STD
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0]), expect, atol=1e-5)


def test_clip_image_encoder_end_to_end():
    params = clip_lib.init_clip_vision_params(jax.random.PRNGKey(0), TINY_CLIP)
    enc = clip_lib.CLIPImageEncoder(params, TINY_CLIP)
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 40, 40),
                             minval=-1, maxval=1)
    out = enc(img)
    assert out.shape == (1, 5, 16)
    assert bool(jnp.isfinite(out).all())
