"""Cross-validation against the actual reference implementation (CPU torch).

The reference repo is mounted read-only at /root/reference; its torch-only
modules (Wan VAE, UMT5, CLIP vision) import on CPU once a few missing
libraries are stubbed. These tests instantiate the *reference* modules with
random weights, export their state dicts through our converters, and demand
numerical agreement — validating architecture, converter naming, and (for
the VAE) the streaming-cache-vs-full-sequence equivalence claim in one shot.

Skipped when the reference tree is unavailable.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier: heavy crosscheck/e2e/compile

REFERENCE = "/root/reference"


def _stub_modules():
    """Stub loguru/ftfy/torchvision enough for reference imports."""
    import importlib.machinery

    def _spec(mod, name, pkg=False):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        if pkg:
            mod.__path__ = []
        return mod
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")
        loguru.__path__ = []  # mark as package (imaginaire imports loguru._logger)

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _Logger()
        sys.modules["loguru"] = _spec(loguru, "loguru", pkg=True)
        sub = types.ModuleType("loguru._logger")

        class Core:  # noqa: N801 - reference imports these names
            pass

        class _Chain:
            def __call__(self, *a, **k):
                return self

            def __getattr__(self, name):
                return self

        class Logger:
            def __init__(self, *a, **k):
                self._options = (None, None, {})

            def __getattr__(self, name):
                return _Chain()

        sub.Core = Core
        sub.Logger = Logger
        sys.modules["loguru._logger"] = _spec(sub, "loguru._logger")
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = _spec(ftfy, "ftfy")
    for name in ("pynvml", "boto3", "botocore", "wandb"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__file__ = f"<stub {name}>"

            def _module_getattr(attr, _n=name):
                if attr.startswith("__"):
                    raise AttributeError(attr)
                return lambda *a, **k: None

            mod.__getattr__ = _module_getattr
            sys.modules[name] = _spec(mod, name, pkg=True)
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.__path__ = []

        class DictConfig(dict):
            def __init__(self, *a, **k):
                super().__init__(*(a if a and isinstance(a[0], dict) else ()), **k)

        class ListConfig(list):
            pass

        class OmegaConf:
            @staticmethod
            def create(x=None, **k):
                return DictConfig(x or {})

            @staticmethod
            def merge(*xs):
                out = DictConfig()
                for x in xs:
                    out.update(x)
                return out

            to_object = staticmethod(lambda x: x)
            to_container = staticmethod(lambda x, **k: dict(x))
            register_new_resolver = staticmethod(lambda *a, **k: None)
            is_config = staticmethod(lambda x: isinstance(x, (DictConfig, ListConfig)))
            is_dict = staticmethod(lambda x: isinstance(x, dict))
            is_list = staticmethod(lambda x: isinstance(x, list))

        oc.DictConfig = DictConfig
        oc.ListConfig = ListConfig
        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = _spec(oc, "omegaconf", pkg=True)
        oc_base = types.ModuleType("omegaconf.base")
        oc_base.DictKeyType = object
        oc_base.SCMode = type("SCMode", (), {"DICT": 0, "INSTANTIATE": 1})
        sys.modules["omegaconf.base"] = _spec(oc_base, "omegaconf.base")
        oc_dc = types.ModuleType("omegaconf.dictconfig")
        oc_dc.DictConfig = DictConfig
        sys.modules["omegaconf.dictconfig"] = _spec(oc_dc, "omegaconf.dictconfig")
    if "fvcore" not in sys.modules:
        for name in ("fvcore", "fvcore.common"):
            m = types.ModuleType(name)
            sys.modules[name] = _spec(m, name, pkg=True)
        reg = types.ModuleType("fvcore.common.registry")

        class Registry:
            def __init__(self, *a, **k):
                pass

            def register(self, *a, **k):
                return lambda f: f

        reg.Registry = Registry
        sys.modules["fvcore.common.registry"] = _spec(reg, "fvcore.common.registry")
    if "iopath" not in sys.modules:
        for name in ("iopath", "iopath.common"):
            m = types.ModuleType(name)
            sys.modules[name] = _spec(m, name, pkg=True)
        fio = types.ModuleType("iopath.common.file_io")

        class PathHandler:
            pass

        class _PM:
            def __init__(self, *a, **k):
                pass

            def __getattr__(self, n):
                return lambda *a, **k: None

        fio.HTTPURLHandler = PathHandler
        fio.OneDrivePathHandler = PathHandler
        fio.PathHandler = PathHandler
        fio.PathManager = _PM
        sys.modules["iopath.common.file_io"] = _spec(fio, "iopath.common.file_io")
    if "botocore.config" not in sys.modules:
        bc_cfg = types.ModuleType("botocore.config")
        bc_cfg.Config = type("Config", (), {"__init__": lambda self, *a, **k: None})
        sys.modules["botocore.config"] = _spec(bc_cfg, "botocore.config")
        bc_exc = types.ModuleType("botocore.exceptions")
        bc_exc.ClientError = type("ClientError", (Exception,), {})
        sys.modules["botocore.exceptions"] = _spec(bc_exc, "botocore.exceptions")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class _F:
            def __getattr__(self, name):
                return lambda *a, **k: None

        transforms.functional = _F()

        class Compose:
            def __init__(self, ts):
                self.transforms = ts

        for name in ("Compose", "Resize", "ToTensor", "Normalize",
                     "InterpolationMode", "CenterCrop"):
            setattr(transforms, name, type(name, (), {"__init__":
                    lambda self, *a, **k: None, "BICUBIC": None}))
        transforms.Compose = Compose
        tv.transforms = transforms
        sys.modules["torchvision"] = _spec(tv, "torchvision", pkg=True)
        sys.modules["torchvision.transforms"] = _spec(
            transforms, "torchvision.transforms")


@pytest.fixture(scope="module")
def reference():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    _stub_modules()
    # reference modules evaluate torch.cuda.current_device() in default args
    # at import time; make it benign on CPU
    import torch

    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE


def test_vae_matches_reference_streaming_encoder_decoder(reference):
    """Our full-sequence causal VAE == the reference's chunked streaming
    implementation, weight-for-weight."""
    import torch

    from chronoedit._src.tokenizers.wan2pt1 import WanVAE_

    import jax
    import jax.numpy as jnp

    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.models import weights as weights_lib

    torch.manual_seed(0)
    ref = WanVAE_(dim=8, z_dim=4, dim_mult=[1, 2], num_res_blocks=1,
                  attn_scales=[], temperal_downsample=[True], dropout=0.0)
    ref = ref.eval().float()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = vae_lib.VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                            temporal_downsample=(True,))
    params = weights_lib.convert_wan_vae(
        sd, dim_mult=cfg.dim_mult, num_res_blocks=cfg.num_res_blocks,
        temporal_downsample=cfg.temporal_downsample)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    # reference streaming chunks are 1 + temporal_window*k pixel frames
    x = rng.standard_normal((1, 3, 5, 16, 16)).astype(np.float32) * 0.5

    with torch.no_grad():
        # reference encode path: streaming chunked, scale=(0,1) identity
        mu_ref = ref.encode(torch.from_numpy(x), scale=[0.0, 1.0]).numpy()
    mu = np.asarray(vae_lib.vae_encode(params, cfg, jnp.asarray(x),
                                       normalize=False), np.float32)
    assert mu.shape == mu_ref.shape
    np.testing.assert_allclose(mu, mu_ref, rtol=2e-3, atol=2e-3)

    z = rng.standard_normal(mu_ref.shape).astype(np.float32) * 0.5
    with torch.no_grad():
        px_ref = ref.decode(torch.from_numpy(z), scale=[0.0, 1.0]).numpy()
    px = np.asarray(vae_lib.vae_decode(params, cfg, jnp.asarray(z),
                                       normalize=False), np.float32)
    assert px.shape == px_ref.shape
    np.testing.assert_allclose(px, px_ref, rtol=2e-3, atol=2e-3)


def test_umt5_matches_reference_encoder(reference):
    """Our UMT5 encoder == the reference T5Encoder (per-layer rel-pos,
    unscaled attention), weight-for-weight."""
    import torch

    from chronoedit._src.modules.umt5 import T5Encoder

    import jax
    import jax.numpy as jnp

    from chronoedit_tpu.models import umt5 as umt5_lib

    torch.manual_seed(1)
    ref = T5Encoder(vocab=64, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
                    num_layers=2, num_buckets=8, shared_pos=False, dropout=0.0)
    ref = ref.eval().float()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = umt5_lib.UMT5Config(vocab_size=64, dim=16, dim_attn=16, dim_ffn=32,
                              num_heads=2, num_layers=2, num_buckets=8,
                              dtype=jnp.float32)
    params = jax.tree_util.tree_map(
        jnp.asarray, umt5_lib.convert_umt5_checkpoint(sd, num_layers=2))

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 64, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[0, 7:] = 0
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()
    out = np.asarray(umt5_lib.umt5_encode(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)),
        np.float32)
    # compare valid positions (reference zeroes nothing; ours matches raw)
    np.testing.assert_allclose(out[1], out_ref[1], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(out[0, :7], out_ref[0, :7], rtol=2e-3, atol=2e-3)


def test_clip_vision_matches_reference(reference):
    """Our CLIP ViT (penultimate features) == the reference VisionTransformer
    with use_31_block semantics, weight-for-weight."""
    import torch
    import torch.nn.functional as tF

    import chronoedit._src.modules.clip as ref_clip
    from chronoedit._src.modules.clip import VisionTransformer

    # the reference dispatches to GPU-only SDPA backends
    # (modules/attention.py:90-181); on CPU substitute the plain math SDPA
    # with identical semantics (b s h d layout, no mask)
    def _cpu_attention(q, k, v, **kw):
        out = tF.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return out.transpose(1, 2)

    ref_clip.attention = _cpu_attention

    import jax
    import jax.numpy as jnp

    from chronoedit_tpu.models import clip as clip_lib

    torch.manual_seed(2)
    ref = VisionTransformer(image_size=28, patch_size=14, dim=16, mlp_ratio=2,
                            out_dim=8, num_heads=2, num_layers=3,
                            pool_type="token", pre_norm=True, post_norm=False,
                            activation="gelu", attn_dropout=0.0,
                            proj_dropout=0.0, embedding_dropout=0.0)
    ref = ref.eval().float()

    sd = {f"visual.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = clip_lib.CLIPVisionConfig(image_size=28, patch_size=14, dim=16,
                                    mlp_ratio=2, num_heads=2, num_layers=3,
                                    dtype=jnp.float32)
    params = jax.tree_util.tree_map(
        jnp.asarray, clip_lib.convert_clip_vision_checkpoint(sd, num_layers=3))

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), use_31_block=True).numpy()
    out = np.asarray(clip_lib.clip_vision_forward(
        params, cfg, jnp.asarray(x), penultimate=True), np.float32)
    np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3)
