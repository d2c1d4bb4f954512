"""RetinaFace face detector: cross-check vs a torch oracle + slot glue.

The reference delegates detection to the external Pytorch_Retinaface
package (face_blur_filter.py:22-24); that package is not installable here,
so the oracle below re-states its forward pass (torchvision ResNet body ->
FPN -> SSH -> 1x1 heads) in plain torch with the package's exact state-dict
naming. The JAX model + converter (which also folds BatchNorm into convs)
must reproduce it weight-for-weight, and the host-side priors/decode/NMS
must match the reference's own formulas (retinaface_utils.py:24-73).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from chronoedit_tpu.aux.face_detector import (
    RetinaFaceConfig,
    convert_retinaface,
    decode_boxes,
    filter_boxes,
    init_retinaface_params,
    make_face_detect_fn,
    prior_boxes,
    retinaface_forward,
)

TINY = RetinaFaceConfig(width=8, blocks=(1, 1, 1, 1), out_channel=16,
                        min_sizes=((16, 32), (64, 128), (256, 512)))


# ------------------------------------------------------------ torch oracle

def conv_bn(cin, cout, k, stride=1, pad=0, relu=True, bias=False):
    mods = [nn.Conv2d(cin, cout, k, stride, pad, bias=bias),
            nn.BatchNorm2d(cout)]
    if relu:
        mods.append(nn.LeakyReLU(0.0))  # leaky=0 for out_channel>64 in cfg_re50
    return nn.Sequential(*mods)


class Bottleneck(nn.Module):
    def __init__(self, cin, mid, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, mid * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(mid * 4)
        self.downsample = None
        if stride != 1 or cin != mid * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, mid * 4, 1, stride, bias=False),
                nn.BatchNorm2d(mid * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        idn = x if self.downsample is None else self.downsample(x)
        return F.relu(out + idn)


class Body(nn.Module):
    """torchvision ResNet (v1.5) trunk returning C3/C4/C5."""

    def __init__(self, cfg):
        super().__init__()
        w = cfg.width
        self.conv1 = nn.Conv2d(3, w, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        cin = w
        for li, n in enumerate(cfg.blocks):
            mid = w * 2 ** li
            blocks = []
            for bi in range(n):
                blocks.append(Bottleneck(cin, mid, 2 if li > 0 and bi == 0 else 1))
                cin = mid * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


class SSH(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv3X3 = conv_bn(cin, cout // 2, 3, pad=1, relu=False)
        self.conv5X5_1 = conv_bn(cin, cout // 4, 3, pad=1)
        self.conv5X5_2 = conv_bn(cout // 4, cout // 4, 3, pad=1, relu=False)
        self.conv7X7_2 = conv_bn(cout // 4, cout // 4, 3, pad=1)
        self.conv7x7_3 = conv_bn(cout // 4, cout // 4, 3, pad=1, relu=False)

    def forward(self, x):
        c3 = self.conv3X3(x)
        c5_1 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(c5_1)
        c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
        return F.relu(torch.cat([c3, c5, c7], dim=1))


class Oracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.body = Body(cfg)
        i3, i4, i5 = cfg.fpn_in_channels
        oc = cfg.out_channel
        self.fpn = nn.ModuleDict({
            "output1": conv_bn(i3, oc, 1), "output2": conv_bn(i4, oc, 1),
            "output3": conv_bn(i5, oc, 1), "merge1": conv_bn(oc, oc, 3, pad=1),
            "merge2": conv_bn(oc, oc, 3, pad=1)})
        self.ssh1, self.ssh2, self.ssh3 = (SSH(oc, oc) for _ in range(3))
        na = cfg.num_anchors
        self.ClassHead = nn.ModuleList(
            [nn.ModuleDict({"conv1x1": nn.Conv2d(oc, na * 2, 1)})
             for _ in range(3)])
        self.BboxHead = nn.ModuleList(
            [nn.ModuleDict({"conv1x1": nn.Conv2d(oc, na * 4, 1)})
             for _ in range(3)])

    def forward(self, x):
        c3, c4, c5 = self.body(x)
        p5 = self.fpn["output3"](c5)
        p4 = self.fpn["output2"](c4)
        p4 = self.fpn["merge2"](
            p4 + F.interpolate(p5, size=p4.shape[2:], mode="nearest"))
        p3 = self.fpn["output1"](c3)
        p3 = self.fpn["merge1"](
            p3 + F.interpolate(p4, size=p3.shape[2:], mode="nearest"))
        feats = [self.ssh1(p3), self.ssh2(p4), self.ssh3(p5)]
        # Pytorch_Retinaface head order: permute NCHW->NHWC then flatten
        locs = torch.cat([self.BboxHead[i]["conv1x1"](f)
                          .permute(0, 2, 3, 1).reshape(f.shape[0], -1, 4)
                          for i, f in enumerate(feats)], dim=1)
        confs = torch.cat([self.ClassHead[i]["conv1x1"](f)
                           .permute(0, 2, 3, 1).reshape(f.shape[0], -1, 2)
                           for i, f in enumerate(feats)], dim=1)
        return locs, F.softmax(confs, dim=-1)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    net = Oracle(TINY).eval()
    # randomize BN running stats so folding is actually exercised
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.7, 1.3)
            m.bias.data.uniform_(-0.2, 0.2)
    return net


@pytest.mark.slow  # torch-oracle crosscheck, full tier
def test_forward_matches_torch_oracle(oracle):
    params = convert_retinaface(oracle.state_dict(), TINY)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 3, 64, 96)).astype(np.float32) * 50

    with torch.no_grad():
        loc_t, conf_t = oracle(torch.from_numpy(img))
    loc_j, conf_j = retinaface_forward(params, TINY,
                                       img.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(loc_j), loc_t.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(conf_j), conf_t.numpy(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # torch-oracle crosscheck, full tier
def test_forward_matches_with_module_prefix(oracle):
    sd = {f"module.{k}": v for k, v in oracle.state_dict().items()}
    params = convert_retinaface(sd, TINY)
    img = np.zeros((1, 64, 96, 3), np.float32)
    loc, conf = retinaface_forward(params, TINY, img)
    assert np.isfinite(np.asarray(loc)).all()


@pytest.mark.slow
def test_prior_boxes_match_reference_formula():
    cfg = TINY
    h, w = 64, 96
    priors = prior_boxes(cfg, h, w)
    # reference PriorBox: ceil feature sizes, row-major cells, per min_size
    import math
    expected = []
    for step, sizes in zip(cfg.steps, cfg.min_sizes):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i in range(fh):
            for j in range(fw):
                for m in sizes:
                    expected.append([(j + 0.5) * step / w, (i + 0.5) * step / h,
                                     m / w, m / h])
    np.testing.assert_allclose(priors, np.asarray(expected, np.float32))
    # count matches the network's flattened anchor axis
    params = init_retinaface_params(__import__("jax").random.PRNGKey(0), cfg)
    loc, conf = retinaface_forward(params, cfg, np.zeros((1, h, w, 3), np.float32))
    assert loc.shape == (1, len(priors), 4)
    assert conf.shape == (1, len(priors), 2)


def test_decode_matches_reference_formula():
    rng = np.random.default_rng(2)
    priors = prior_boxes(TINY, 64, 96)
    loc = rng.normal(size=(3, len(priors), 4)).astype(np.float32) * 0.2
    got = decode_boxes(loc, priors, TINY.variance)

    pr = torch.from_numpy(priors)[None].expand(3, -1, -1)
    lt = torch.from_numpy(loc)
    boxes = torch.cat(
        (pr[:, :, :2] + lt[:, :, :2] * TINY.variance[0] * pr[:, :, 2:],
         pr[:, :, 2:] * torch.exp(lt[:, :, 2:] * TINY.variance[1])), dim=2)
    boxes[:, :, :2] -= boxes[:, :, 2:] / 2
    boxes[:, :, 2:] += boxes[:, :, :2]
    np.testing.assert_allclose(got, boxes.numpy(), rtol=1e-5, atol=1e-6)


def test_nms_filters_overlaps():
    boxes = np.array([[10, 10, 50, 50], [12, 12, 52, 52], [100, 100, 140, 140]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.95], np.float32)
    kept = filter_boxes(boxes, scores, confidence_threshold=0.5,
                        nms_threshold=0.4)
    # the two overlapping boxes collapse to the higher-scoring one
    assert kept.shape == (2, 4)
    assert any(np.allclose(k, boxes[2]) for k in kept)
    assert any(np.allclose(k, boxes[0]) for k in kept)


@pytest.mark.slow
def test_detect_fn_slot_and_face_blur():
    """End-to-end slot glue: detector output drives FaceBlur pixelation."""
    import jax

    from chronoedit_tpu.aux.guardrails import FaceBlur

    params = init_retinaface_params(jax.random.PRNGKey(0), TINY)
    detect = make_face_detect_fn(params, TINY, confidence_threshold=0.0,
                                 min_size=(1, 1))
    frame = (np.random.default_rng(3).uniform(0, 255, (64, 96, 3))
             .astype(np.uint8))
    boxes = detect(frame)
    assert isinstance(boxes, list)
    for (x0, y0, x1, y1) in boxes:
        assert 0 <= x0 <= x1 <= 96 and 0 <= y0 <= y1 <= 64

    fixed = [(8, 8, 40, 40)]
    blur = FaceBlur(lambda f: fixed, block=8)
    out = blur(frame[None].copy())
    region = out[0, 8:40, 8:40]
    # pixelation: each 8x8 block is constant
    assert (region[:8, :8] == region[0, 0]).all()
    assert not np.array_equal(out[0], frame)
