"""SigLIP safety classifier: JAX tower cross-checked against the HF torch
SiglipVisionModel and the reference's SafetyClassifier MLP (random weights),
plus the guardrail-slot block/pass behavior."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from chronoedit_tpu.aux.safety_classifier import (  # noqa: E402
    SigLIPVisionConfig, classifier_logits, convert_safety_classifier,
    convert_siglip_vision, make_classify_fn, preprocess, siglip_encode)

TINY = SigLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                          num_heads=2, image_size=28, patch_size=14)


def _torch_tiny():
    from transformers import SiglipVisionConfig as HFConfig
    from transformers import SiglipVisionModel

    torch.manual_seed(0)
    cfg = HFConfig(hidden_size=TINY.hidden_size,
                   intermediate_size=TINY.intermediate_size,
                   num_hidden_layers=TINY.num_layers,
                   num_attention_heads=TINY.num_heads,
                   image_size=TINY.image_size, patch_size=TINY.patch_size)
    return SiglipVisionModel(cfg).eval()


@pytest.mark.slow
def test_siglip_tower_matches_torch():
    model = _torch_tiny()
    params = convert_siglip_vision(model.state_dict(), TINY)
    pixels = np.random.default_rng(0).standard_normal(
        (2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(pixels)).pooler_output.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(siglip_encode(params, TINY, pixels))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_classifier_matches_torch():
    torch.manual_seed(1)
    net = torch.nn.Sequential(
        torch.nn.Linear(32, 512), torch.nn.BatchNorm1d(512), torch.nn.ReLU(),
        torch.nn.Linear(512, 256), torch.nn.BatchNorm1d(256), torch.nn.ReLU(),
        torch.nn.Linear(256, 7))
    # fake some running stats (fresh BN has mean 0 var 1)
    net[1].running_mean.normal_(); net[1].running_var.uniform_(0.5, 2.0)
    net[4].running_mean.normal_(); net[4].running_var.uniform_(0.5, 2.0)
    net.eval()
    sd = {f"network.layers.{k}": v for k, v in net.state_dict().items()}
    params = convert_safety_classifier(sd)
    x = np.random.default_rng(2).standard_normal((4, 32)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = np.asarray(classifier_logits(params, x))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def _biased_classifier(winner: int, dim: int):
    """Classifier whose logits always pick ``winner``."""
    layers = [
        {"kernel": np.zeros((dim, 512), np.float32),
         "bias": np.zeros((512,), np.float32),
         "bn_scale": np.ones((512,), np.float32),
         "bn_bias": np.zeros((512,), np.float32),
         "bn_mean": np.zeros((512,), np.float32),
         "bn_var": np.ones((512,), np.float32)},
        {"kernel": np.zeros((512, 256), np.float32),
         "bias": np.zeros((256,), np.float32),
         "bn_scale": np.ones((256,), np.float32),
         "bn_bias": np.zeros((256,), np.float32),
         "bn_mean": np.zeros((256,), np.float32),
         "bn_var": np.ones((256,), np.float32)},
        {"kernel": np.zeros((256, 7), np.float32),
         "bias": np.eye(7, dtype=np.float32)[winner] * 10.0},
    ]
    return {"layers": layers}


@pytest.mark.slow  # tiny-HF-LLM e2e: ~70 s, full tier
def test_guardrail_slot_block_and_pass():
    from chronoedit_tpu.aux.guardrails import GuardrailBlocked, video_guardrail

    model = _torch_tiny()
    siglip = convert_siglip_vision(model.state_dict(), TINY)
    frames = np.random.default_rng(3).uniform(
        -1, 1, (6, 16, 16, 3)).astype(np.float32)

    safe_fn = make_classify_fn(siglip, _biased_classifier(0, TINY.hidden_size),
                               TINY)
    unsafe_fn = make_classify_fn(siglip, _biased_classifier(1, TINY.hidden_size),
                                 TINY)
    assert safe_fn(frames) is True  # True = safe (slot blocks on False)
    assert unsafe_fn(frames) is False

    runner = video_guardrail(classify_fn=unsafe_fn)
    with pytest.raises(GuardrailBlocked):
        runner.run_video(frames)
    video_guardrail(classify_fn=safe_fn).run_video(frames)  # no raise
