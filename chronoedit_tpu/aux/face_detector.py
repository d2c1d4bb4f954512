"""RetinaFace face detector (JAX) for the face-blur guardrail.

The reference's face blur uses the external Pytorch_Retinaface package's
ResNet-50 RetinaFace (`face_blur_filter/face_blur_filter.py:52-211`,
`retinaface_utils.py:24-73`): detect faces per frame, decode anchor boxes,
NMS, then pixelate each region. Round 1 shipped only the ``FaceBlur``
callable slot; this module supplies the detector itself, TPU-native:

- **NHWC convolutions** (TPU-preferred layout) via
  ``lax.conv_general_dilated``; the whole tower is one jitted program.
- **BatchNorm folded into conv weights at conversion time** — the detector
  only ever runs in eval mode, so each conv+BN pair collapses to a single
  biased conv (fewer HLOs, deeper XLA fusion). The converter consumes the
  public ``Resnet50_Final.pth`` state-dict naming.
- Anchors ("priors"), box decode, and NMS run host-side in numpy exactly as
  the reference does (priors depend only on the static frame size and are
  cached; NMS is data-dependent control flow that does not belong in XLA).

Architecture (Pytorch_Retinaface ``cfg_re50``): ResNet-50 v1.5 body
returning C3/C4/C5 (strides 8/16/32), a 3-level FPN at 256 channels, one
SSH context module per level, and per-level class/bbox heads with 2 anchors
per cell (``min_sizes`` [[16,32],[64,128],[256,512]], steps [8,16,32],
variance [0.1,0.2]).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# detection post-processing constants (face_blur_filter.py:47-49)
TOP_K = 5_000
KEEP_TOP_K = 750
NMS_THRESHOLD = 0.4
CONFIDENCE_THRESHOLD = 0.7

# RetinaFace input preprocessing: BGR mean subtraction
# (face_blur_filter.py:101-106)
_BGR_MEANS = np.array([104.0, 117.0, 123.0], np.float32)


@dataclasses.dataclass(frozen=True)
class RetinaFaceConfig:
    """``cfg_re50`` geometry by default; shrinkable for tests."""

    width: int = 64                                # ResNet stem width
    blocks: tuple[int, ...] = (3, 4, 6, 3)         # ResNet-50
    out_channel: int = 256                         # FPN/SSH channels
    min_sizes: tuple[tuple[int, ...], ...] = ((16, 32), (64, 128), (256, 512))
    steps: tuple[int, ...] = (8, 16, 32)
    variance: tuple[float, float] = (0.1, 0.2)

    @property
    def fpn_in_channels(self) -> tuple[int, int, int]:
        # C3/C4/C5 of a bottleneck ResNet: width * (8, 16, 32)
        return self.width * 8, self.width * 16, self.width * 32

    @property
    def num_anchors(self) -> int:
        return len(self.min_sizes[0])


# ---------------------------------------------------------------- conv ops

def _conv(p: Params, x: jnp.ndarray, stride: int = 1, pad: int = 0,
          relu: bool = False) -> jnp.ndarray:
    """Biased NHWC conv (BN already folded in), optional ReLU."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["bias"]
    return jax.nn.relu(y) if relu else y


def _bottleneck(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """torchvision ResNet v1.5 bottleneck (stride on the 3x3 conv)."""
    out = _conv(p["conv1"], x, relu=True)
    out = _conv(p["conv2"], out, stride=stride, pad=1, relu=True)
    out = _conv(p["conv3"], out)
    shortcut = _conv(p["down"], x, stride=stride) if "down" in p else x
    return jax.nn.relu(out + shortcut)


def _maxpool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _ssh(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """SSH context module: 3x3 ⊕ 5x5(two 3x3s) ⊕ 7x7(three 3x3s) branches."""
    c3 = _conv(p["c3"], x, pad=1)
    c5_1 = _conv(p["c5_1"], x, pad=1, relu=True)
    c5 = _conv(p["c5_2"], c5_1, pad=1)
    c7_2 = _conv(p["c7_2"], c5_1, pad=1, relu=True)
    c7 = _conv(p["c7_3"], c7_2, pad=1)
    return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


def _upsample_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")


# ---------------------------------------------------------------- forward

def retinaface_forward(params: Params, cfg: RetinaFaceConfig,
                       images: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Images (B, H, W, 3) BGR mean-subtracted float32 ->
    (loc (B, N, 4), conf (B, N, 2) softmaxed) over all anchors N."""
    x = _conv(params["stem"], images, stride=2, pad=3, relu=True)
    x = _maxpool_3x3_s2(x)

    feats = []
    for li, stage in enumerate(params["layers"]):
        for bi, blk in enumerate(stage):
            x = _bottleneck(blk, x, stride=2 if (li > 0 and bi == 0) else 1)
        if li >= 1:  # C3, C4, C5
            feats.append(x)
    c3, c4, c5 = feats

    fpn = params["fpn"]
    p5 = _conv(fpn["output3"], c5, relu=True)
    p4 = _conv(fpn["output2"], c4, relu=True)
    p4 = p4 + _upsample_nearest(p5, p4.shape[1], p4.shape[2])
    p4 = _conv(fpn["merge2"], p4, pad=1, relu=True)
    p3 = _conv(fpn["output1"], c3, relu=True)
    p3 = p3 + _upsample_nearest(p4, p3.shape[1], p3.shape[2])
    p3 = _conv(fpn["merge1"], p3, pad=1, relu=True)

    locs, confs = [], []
    for level, feat in enumerate((p3, p4, p5)):
        feat = _ssh(params["ssh"][level], feat)
        b = feat.shape[0]
        # heads are 1x1 convs; NHWC output reshapes directly to
        # (B, cells*anchors, c) in the reference's anchor order
        loc = _conv(params["heads"]["box"][level], feat)
        conf = _conv(params["heads"]["cls"][level], feat)
        locs.append(loc.reshape(b, -1, 4))
        confs.append(conf.reshape(b, -1, 2))

    loc = jnp.concatenate(locs, axis=1)
    conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
    return loc, conf


# ------------------------------------------------------- priors/decode/nms

def prior_boxes(cfg: RetinaFaceConfig, height: int, width: int) -> np.ndarray:
    """Anchor centers+sizes in [0,1] cxcywh, matching PriorBox
    (prior_box.py): per level, per cell (row-major), per min_size."""
    anchors = []
    for step, sizes in zip(cfg.steps, cfg.min_sizes):
        fh = -(-height // step)  # ceil
        fw = -(-width // step)
        for i in range(fh):
            for j in range(fw):
                for m in sizes:
                    anchors.append([(j + 0.5) * step / width,
                                    (i + 0.5) * step / height,
                                    m / width, m / height])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray,
                 variance: tuple[float, float]) -> np.ndarray:
    """Anchor-relative loc predictions -> xyxy boxes in [0,1]
    (retinaface_utils.py:46-73, batched)."""
    centers = priors[..., :2] + loc[..., :2] * variance[0] * priors[..., 2:]
    sizes = priors[..., 2:] * np.exp(loc[..., 2:] * variance[1])
    return np.concatenate([centers - sizes / 2, centers + sizes / 2], -1)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> list[int]:
    """Greedy IoU NMS (py_cpu_nms semantics: +1 box areas)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        iou = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][iou <= thresh]
    return keep


def filter_boxes(boxes: np.ndarray, scores: np.ndarray,
                 confidence_threshold: float = CONFIDENCE_THRESHOLD,
                 nms_threshold: float = NMS_THRESHOLD,
                 top_k: int = TOP_K, keep_top_k: int = KEEP_TOP_K) -> np.ndarray:
    """Threshold -> sort/top-k -> NMS -> keep-top-k
    (retinaface_utils.py:24-42)."""
    inds = np.where(scores > confidence_threshold)[0]
    boxes, scores = boxes[inds], scores[inds]
    order = scores.argsort()[::-1][:top_k]
    boxes, scores = boxes[order], scores[order]
    if len(boxes) == 0:
        return boxes.reshape(0, 4)
    keep = nms(boxes.astype(np.float32), scores, nms_threshold)
    return boxes[keep][:keep_top_k]


# ---------------------------------------------------------------- converter

def _fold_conv_bn(sd: dict, conv_key: str, bn_key: str | None,
                  eps: float = 1e-5) -> Params:
    """Fold eval-mode BatchNorm into the preceding conv; torch OIHW -> HWIO."""
    w = np.asarray(sd[f"{conv_key}.weight"], np.float32)
    b = (np.asarray(sd[f"{conv_key}.bias"], np.float32)
         if f"{conv_key}.bias" in sd else np.zeros(w.shape[0], np.float32))
    if bn_key is not None:
        gamma = np.asarray(sd[f"{bn_key}.weight"], np.float32)
        beta = np.asarray(sd[f"{bn_key}.bias"], np.float32)
        mean = np.asarray(sd[f"{bn_key}.running_mean"], np.float32)
        var = np.asarray(sd[f"{bn_key}.running_var"], np.float32)
        scale = gamma / np.sqrt(var + eps)
        w = w * scale[:, None, None, None]
        b = beta + (b - mean) * scale
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def convert_retinaface(sd: dict, cfg: RetinaFaceConfig | None = None) -> Params:
    """Pytorch_Retinaface ``Resnet50_Final.pth`` state dict -> param pytree.

    Accepts the ``module.``-stripped naming the reference loader produces
    (retinaface_utils.py:102-117): ``body.*`` (torchvision ResNet),
    ``fpn.*``, ``ssh1/2/3.*``, ``ClassHead/BboxHead/LandmarkHead.*``.
    """
    cfg = cfg or RetinaFaceConfig()
    sd = {k.split("module.", 1)[-1]: v for k, v in sd.items()}

    layers = []
    for li, n_blocks in enumerate(cfg.blocks, start=1):
        stage = []
        for bi in range(n_blocks):
            pre = f"body.layer{li}.{bi}"
            blk = {f"conv{c}": _fold_conv_bn(sd, f"{pre}.conv{c}", f"{pre}.bn{c}")
                   for c in (1, 2, 3)}
            if f"{pre}.downsample.0.weight" in sd:
                blk["down"] = _fold_conv_bn(sd, f"{pre}.downsample.0",
                                            f"{pre}.downsample.1")
            stage.append(blk)
        layers.append(stage)

    fpn = {name: _fold_conv_bn(sd, f"fpn.{name}.0", f"fpn.{name}.1")
           for name in ("output1", "output2", "output3", "merge1", "merge2")}

    ssh = []
    for i in (1, 2, 3):
        ssh.append({
            "c3": _fold_conv_bn(sd, f"ssh{i}.conv3X3.0", f"ssh{i}.conv3X3.1"),
            "c5_1": _fold_conv_bn(sd, f"ssh{i}.conv5X5_1.0", f"ssh{i}.conv5X5_1.1"),
            "c5_2": _fold_conv_bn(sd, f"ssh{i}.conv5X5_2.0", f"ssh{i}.conv5X5_2.1"),
            "c7_2": _fold_conv_bn(sd, f"ssh{i}.conv7X7_2.0", f"ssh{i}.conv7X7_2.1"),
            # Pytorch_Retinaface really does name this one with a lowercase x
            "c7_3": _fold_conv_bn(sd, f"ssh{i}.conv7x7_3.0", f"ssh{i}.conv7x7_3.1"),
        })

    heads = {"cls": [], "box": []}
    for i in range(3):
        heads["cls"].append(_fold_conv_bn(sd, f"ClassHead.{i}.conv1x1", None))
        heads["box"].append(_fold_conv_bn(sd, f"BboxHead.{i}.conv1x1", None))
        # LandmarkHead weights exist in the checkpoint but the blur path
        # never uses landmarks (face_blur_filter.py:198 discards them)

    return {"stem": _fold_conv_bn(sd, "body.conv1", "body.bn1"),
            "layers": layers, "fpn": fpn, "ssh": ssh, "heads": heads}


def init_retinaface_params(key: jax.Array, cfg: RetinaFaceConfig) -> Params:
    """Random params with the converted layout (tests / shape checks)."""
    counter = [0]

    def conv(cin, cout, k):
        counter[0] += 1
        sub = jax.random.fold_in(key, counter[0])
        return {"kernel": 0.1 * jax.random.normal(sub, (k, k, cin, cout),
                                                  jnp.float32),
                "bias": jnp.zeros((cout,), jnp.float32)}

    w = cfg.width
    layers = []
    cin = w
    for li, n_blocks in enumerate(cfg.blocks):
        mid = w * 2 ** li
        cout = mid * 4
        stage = []
        for bi in range(n_blocks):
            blk = {"conv1": conv(cin, mid, 1), "conv2": conv(mid, mid, 3),
                   "conv3": conv(mid, cout, 1)}
            if bi == 0:
                blk["down"] = conv(cin, cout, 1)
            stage.append(blk)
            cin = cout
        layers.append(stage)

    oc = cfg.out_channel
    c3c, c4c, c5c = cfg.fpn_in_channels
    fpn = {"output1": conv(c3c, oc, 1), "output2": conv(c4c, oc, 1),
           "output3": conv(c5c, oc, 1), "merge1": conv(oc, oc, 3),
           "merge2": conv(oc, oc, 3)}
    ssh = [{"c3": conv(oc, oc // 2, 3), "c5_1": conv(oc, oc // 4, 3),
            "c5_2": conv(oc // 4, oc // 4, 3), "c7_2": conv(oc // 4, oc // 4, 3),
            "c7_3": conv(oc // 4, oc // 4, 3)} for _ in range(3)]
    na = cfg.num_anchors
    heads = {"cls": [conv(oc, na * 2, 1) for _ in range(3)],
             "box": [conv(oc, na * 4, 1) for _ in range(3)]}
    return {"stem": conv(3, w, 7), "layers": layers, "fpn": fpn, "ssh": ssh,
            "heads": heads}


# ---------------------------------------------------------------- slot glue

def make_face_detect_fn(params: Params, cfg: RetinaFaceConfig | None = None,
                        confidence_threshold: float = CONFIDENCE_THRESHOLD,
                        min_size: tuple[int, int] = (20, 20)):
    """Build the ``FaceBlur`` slot callable: ``detect(frame_rgb_uint8) ->
    [(x0, y0, x1, y1), ...]`` pixel boxes (face_blur_filter.py:108-160)."""
    cfg = cfg or RetinaFaceConfig()
    fwd = jax.jit(functools.partial(retinaface_forward, params, cfg))

    @functools.lru_cache(maxsize=8)
    def _priors(h, w):
        return prior_boxes(cfg, h, w)

    def detect(frame: np.ndarray) -> list[tuple[int, int, int, int]]:
        h, w = frame.shape[:2]
        bgr = frame[..., ::-1].astype(np.float32) - _BGR_MEANS
        loc, conf = fwd(bgr[None])
        boxes = decode_boxes(np.asarray(loc[0]), _priors(h, w), cfg.variance)
        boxes = boxes * np.array([w, h, w, h], np.float32)
        kept = filter_boxes(boxes, np.asarray(conf[0, :, 1]),
                            confidence_threshold)
        out = []
        for x0, y0, x1, y1 in kept.astype(int):
            if x1 - x0 < min_size[0] or y1 - y0 < min_size[1]:
                continue
            x0, y0 = max(x0, 0), max(y0, 0)
            x1, y1 = min(x1, w), min(y1, h)
            if x1 > x0 and y1 > y0:  # drop boxes fully outside the frame
                out.append((x0, y0, x1, y1))
        return out

    return detect
