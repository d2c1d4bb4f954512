"""Checkpoint import: reference weight formats -> chronoedit_tpu pytrees.

Converters for the three weight dialects the reference ships (SURVEY §2.3
models/utils.py, docs/CHECKPOINT.md):

- **diffusers DiT** — the public ChronoEdit-14B safetensors shards
  (``ChronoEditTransformer3DModel`` naming: ``blocks.N.attn1.to_q`` etc.);
- **Wan 2.1 VAE** — the ``Wan2.1_VAE.pth`` torch state dict (Sequential
  index naming, ``encoder.downsamples.N...``);
- **LoRA dialects** — diffusers (``lora_A/lora_B``) and musubi/non-diffusers
  (``lora_down/lora_up``) key styles (models/utils.py converters).

All converters consume ``dict[str, np.ndarray]`` (use :func:`load_torch` /
:func:`load_safetensors`) and emit the pytrees produced by
``init_dit_params`` / ``init_vae_params`` / ``init_lora_params``.

Conventions: torch ``Linear.weight`` is (out, in) -> our kernel (in, out) is
its transpose; ``Conv3d.weight`` (out, in, kt, kh, kw) -> (kt, kh, kw, in,
out); patch-embed Conv3d (kernel==stride) -> flat matmul kernel with feature
order (c, kt, kh, kw) (see models/dit._patchify).
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

Params = dict[str, Any]
StateDict = dict[str, np.ndarray]


# ----------------------------------------------------------------- loading

def load_torch(path: str) -> StateDict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_safetensors(paths: str | Iterable[str]) -> StateDict:
    from safetensors.numpy import load_file

    if isinstance(paths, str):
        paths = [paths]
    out: StateDict = {}
    for p in paths:
        out.update(load_file(p))
    return out


def _lin(sd: StateDict, name: str) -> Params:
    p = {"kernel": np.ascontiguousarray(sd.pop(f"{name}.weight").T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd.pop(f"{name}.bias")
    return p


def _ln(sd: StateDict, name: str) -> Params:
    return {"scale": sd.pop(f"{name}.weight"), "bias": sd.pop(f"{name}.bias")}


def _rms(sd: StateDict, name: str) -> Params:
    return {"scale": sd.pop(f"{name}.weight")}


# ----------------------------------------------------------------- DiT

def convert_diffusers_dit(sd: StateDict, num_layers: int = 40,
                          strict: bool = True) -> Params:
    """diffusers ChronoEditTransformer3DModel state dict -> DiT pytree."""
    sd = dict(sd)
    # strip optional "model."/"transformer." prefixes
    for prefix in ("model.diffusion_model.", "transformer.", "model."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                  for k, v in sd.items()}

    pw = sd.pop("patch_embedding.weight")
    if pw.ndim == 5:  # Conv3d (out, in, kt, kh, kw) -> (in*kt*kh*kw, out)
        pw = pw.reshape(pw.shape[0], -1).T
    else:  # native Linear form already (out, in*p)
        pw = pw.T
    params: Params = {
        "patch_embed": {"kernel": np.ascontiguousarray(pw),
                        "bias": sd.pop("patch_embedding.bias")},
        "time_embed": {
            "fc1": _lin(sd, "condition_embedder.time_embedder.linear_1"),
            "fc2": _lin(sd, "condition_embedder.time_embedder.linear_2"),
        },
        "time_proj": _lin(sd, "condition_embedder.time_proj"),
        "text_embed": {
            "fc1": _lin(sd, "condition_embedder.text_embedder.linear_1"),
            "fc2": _lin(sd, "condition_embedder.text_embedder.linear_2"),
        },
        "head": {
            "proj": _lin(sd, "proj_out"),
            "scale_shift_table": sd.pop("scale_shift_table").reshape(2, -1),
        },
    }
    if "condition_embedder.image_embedder.norm1.weight" in sd:
        params["img_embed"] = {
            "norm1": _ln(sd, "condition_embedder.image_embedder.norm1"),
            "fc1": _lin(sd, "condition_embedder.image_embedder.ff.net.0.proj"),
            "fc2": _lin(sd, "condition_embedder.image_embedder.ff.net.2"),
            "norm2": _ln(sd, "condition_embedder.image_embedder.norm2"),
        }

    blocks = []
    for i in range(num_layers):
        b = f"blocks.{i}"
        blk: Params = {
            "scale_shift_table": sd.pop(f"{b}.scale_shift_table").reshape(6, -1),
            "self_attn": {
                "q": _lin(sd, f"{b}.attn1.to_q"),
                "k": _lin(sd, f"{b}.attn1.to_k"),
                "v": _lin(sd, f"{b}.attn1.to_v"),
                "o": _lin(sd, f"{b}.attn1.to_out.0"),
                "q_norm": _rms(sd, f"{b}.attn1.norm_q"),
                "k_norm": _rms(sd, f"{b}.attn1.norm_k"),
            },
            "cross_attn": {
                "q": _lin(sd, f"{b}.attn2.to_q"),
                "k": _lin(sd, f"{b}.attn2.to_k"),
                "v": _lin(sd, f"{b}.attn2.to_v"),
                "o": _lin(sd, f"{b}.attn2.to_out.0"),
                "q_norm": _rms(sd, f"{b}.attn2.norm_q"),
                "k_norm": _rms(sd, f"{b}.attn2.norm_k"),
            },
            "norm2": _ln(sd, f"{b}.norm2"),
            "ffn": {
                "fc1": _lin(sd, f"{b}.ffn.net.0.proj"),
                "fc2": _lin(sd, f"{b}.ffn.net.2"),
            },
        }
        if f"{b}.attn2.add_k_proj.weight" in sd:
            blk["cross_attn"]["k_img"] = _lin(sd, f"{b}.attn2.add_k_proj")
            blk["cross_attn"]["v_img"] = _lin(sd, f"{b}.attn2.add_v_proj")
            blk["cross_attn"]["k_img_norm"] = _rms(sd, f"{b}.attn2.norm_added_k")
        blocks.append(blk)

    import jax

    params["blocks"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    leftovers = [k for k in sd if not k.endswith("norm_added_q.weight")]
    if strict and leftovers:
        raise ValueError(f"unconsumed checkpoint keys: {leftovers[:8]}...")
    return params


def export_diffusers_dit(params: Params) -> StateDict:
    """Inverse of :func:`convert_diffusers_dit` (for round-trip tests and for
    exporting TPU-trained weights back to the reference ecosystem)."""
    import jax

    sd: StateDict = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_rms(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])

    put_lin("patch_embedding", params["patch_embed"])
    put_lin("condition_embedder.time_embedder.linear_1", params["time_embed"]["fc1"])
    put_lin("condition_embedder.time_embedder.linear_2", params["time_embed"]["fc2"])
    put_lin("condition_embedder.time_proj", params["time_proj"])
    put_lin("condition_embedder.text_embedder.linear_1", params["text_embed"]["fc1"])
    put_lin("condition_embedder.text_embedder.linear_2", params["text_embed"]["fc2"])
    if "img_embed" in params:
        ie = params["img_embed"]
        put_ln("condition_embedder.image_embedder.norm1", ie["norm1"])
        put_lin("condition_embedder.image_embedder.ff.net.0.proj", ie["fc1"])
        put_lin("condition_embedder.image_embedder.ff.net.2", ie["fc2"])
        put_ln("condition_embedder.image_embedder.norm2", ie["norm2"])
    put_lin("proj_out", params["head"]["proj"])
    sd["scale_shift_table"] = np.asarray(params["head"]["scale_shift_table"])[None]

    num_layers = np.asarray(params["blocks"]["scale_shift_table"]).shape[0]
    for i in range(num_layers):
        blk = jax.tree_util.tree_map(lambda a: np.asarray(a)[i], params["blocks"])
        b = f"blocks.{i}"
        sd[f"{b}.scale_shift_table"] = blk["scale_shift_table"][None]
        put_lin(f"{b}.attn1.to_q", blk["self_attn"]["q"])
        put_lin(f"{b}.attn1.to_k", blk["self_attn"]["k"])
        put_lin(f"{b}.attn1.to_v", blk["self_attn"]["v"])
        put_lin(f"{b}.attn1.to_out.0", blk["self_attn"]["o"])
        put_rms(f"{b}.attn1.norm_q", blk["self_attn"]["q_norm"])
        put_rms(f"{b}.attn1.norm_k", blk["self_attn"]["k_norm"])
        put_lin(f"{b}.attn2.to_q", blk["cross_attn"]["q"])
        put_lin(f"{b}.attn2.to_k", blk["cross_attn"]["k"])
        put_lin(f"{b}.attn2.to_v", blk["cross_attn"]["v"])
        put_lin(f"{b}.attn2.to_out.0", blk["cross_attn"]["o"])
        put_rms(f"{b}.attn2.norm_q", blk["cross_attn"]["q_norm"])
        put_rms(f"{b}.attn2.norm_k", blk["cross_attn"]["k_norm"])
        if "k_img" in blk["cross_attn"]:
            put_lin(f"{b}.attn2.add_k_proj", blk["cross_attn"]["k_img"])
            put_lin(f"{b}.attn2.add_v_proj", blk["cross_attn"]["v_img"])
            put_rms(f"{b}.attn2.norm_added_k", blk["cross_attn"]["k_img_norm"])
        put_ln(f"{b}.norm2", blk["norm2"])
        put_lin(f"{b}.ffn.net.0.proj", blk["ffn"]["fc1"])
        put_lin(f"{b}.ffn.net.2", blk["ffn"]["fc2"])
    return sd


def convert_native_dit(sd: StateDict, num_layers: int = 40,
                       strict: bool = True) -> Params:
    """Native ("imaginaire") WanModel/EditWanModel state dict -> DiT pytree.

    The dialect produced by ``convert_distcp_to_pt.py`` (wan2pt1.py module
    names: ``blocks.N.self_attn.q``, ``time_embedding.0``, ``ffn.0`` ...).
    Note the native norm-name swap vs diffusers: native ``norm3`` is the
    cross-attn norm and ``norm2`` the FFN norm (wan2pt1.py:467-474); both
    map onto our single affine ``norm2`` + no-affine fused norms.
    """
    sd = dict(sd)
    for prefix in ("model.", "net."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                  for k, v in sd.items()}
    # drop WeightTrainingStat counters and TE extra-state blobs (the DCP
    # LoadPlanner skips the latter too, dcp.py:103-196)
    sd = {k: v for k, v in sd.items()
          if not k.startswith("accum_") and "._extra_state" not in k}

    params: Params = {
        "patch_embed": _lin(sd, "patch_embedding"),
        "time_embed": {"fc1": _lin(sd, "time_embedding.0"),
                       "fc2": _lin(sd, "time_embedding.2")},
        "time_proj": _lin(sd, "time_projection.1"),
        "text_embed": {"fc1": _lin(sd, "text_embedding.0"),
                       "fc2": _lin(sd, "text_embedding.2")},
        "head": {
            "proj": _lin(sd, "head.head"),
            "scale_shift_table": sd.pop("head.modulation").reshape(2, -1),
        },
    }
    if "img_emb.proj.0.weight" in sd:
        params["img_embed"] = {
            "norm1": _ln(sd, "img_emb.proj.0"),
            "fc1": _lin(sd, "img_emb.proj.1"),
            "fc2": _lin(sd, "img_emb.proj.3"),
            "norm2": _ln(sd, "img_emb.proj.4"),
        }

    blocks = []
    for i in range(num_layers):
        b = f"blocks.{i}"
        blk: Params = {
            "scale_shift_table": sd.pop(f"{b}.modulation").reshape(6, -1),
            "self_attn": {
                "q": _lin(sd, f"{b}.self_attn.q"),
                "k": _lin(sd, f"{b}.self_attn.k"),
                "v": _lin(sd, f"{b}.self_attn.v"),
                "o": _lin(sd, f"{b}.self_attn.o"),
                "q_norm": _rms(sd, f"{b}.self_attn.norm_q"),
                "k_norm": _rms(sd, f"{b}.self_attn.norm_k"),
            },
            "cross_attn": {
                "q": _lin(sd, f"{b}.cross_attn.q"),
                "k": _lin(sd, f"{b}.cross_attn.k"),
                "v": _lin(sd, f"{b}.cross_attn.v"),
                "o": _lin(sd, f"{b}.cross_attn.o"),
                "q_norm": _rms(sd, f"{b}.cross_attn.norm_q"),
                "k_norm": _rms(sd, f"{b}.cross_attn.norm_k"),
            },
            "norm2": _ln(sd, f"{b}.norm3"),  # native norm3 == cross-attn norm
            "ffn": {"fc1": _lin(sd, f"{b}.ffn.0"),
                    "fc2": _lin(sd, f"{b}.ffn.2")},
        }
        if f"{b}.cross_attn.k_img.weight" in sd:
            blk["cross_attn"]["k_img"] = _lin(sd, f"{b}.cross_attn.k_img")
            blk["cross_attn"]["v_img"] = _lin(sd, f"{b}.cross_attn.v_img")
            blk["cross_attn"]["k_img_norm"] = _rms(sd, f"{b}.cross_attn.norm_k_img")
        blocks.append(blk)

    import jax

    params["blocks"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    if strict and sd:
        raise ValueError(f"unconsumed native checkpoint keys: {list(sd)[:8]}...")
    return params


# ----------------------------------------------------------------- LoRA

# diffusers module name -> our block-relative kernel path
_LORA_NAME_MAP = {
    "attn1.to_q": "self_attn/q", "attn1.to_k": "self_attn/k",
    "attn1.to_v": "self_attn/v", "attn1.to_out.0": "self_attn/o",
    "attn2.to_q": "cross_attn/q", "attn2.to_k": "cross_attn/k",
    "attn2.to_v": "cross_attn/v", "attn2.to_out.0": "cross_attn/o",
    "ffn.net.0.proj": "ffn/fc1", "ffn.net.2": "ffn/fc2",
}
# musubi / non-diffusers dialect (models/utils.py _convert_musubi_*):
# lora_unet_blocks_N_self_attn_q etc with lora_down/lora_up
_MUSUBI_NAME_MAP = {
    "self_attn_q": "self_attn/q", "self_attn_k": "self_attn/k",
    "self_attn_v": "self_attn/v", "self_attn_o": "self_attn/o",
    "cross_attn_q": "cross_attn/q", "cross_attn_k": "cross_attn/k",
    "cross_attn_v": "cross_attn/v", "cross_attn_o": "cross_attn/o",
    "ffn_0": "ffn/fc1", "ffn_2": "ffn/fc2",
}


def convert_diffusers_lora(sd: StateDict, num_layers: int = 40) -> tuple[Params, float]:
    """diffusers-style LoRA (``...lora_A.weight``/``lora_B.weight``) ->
    adapter pytree stacked over layers. Returns (lora, alpha_scaling)."""
    sd = dict(sd)
    for prefix in ("transformer.", "diffusion_model."):
        sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}

    # collect per (our_path) -> per-layer a/b
    per_path: dict[str, dict[int, tuple[np.ndarray, np.ndarray]]] = {}
    rank = None
    alpha = None
    for key in list(sd):
        if not key.startswith("blocks.") or "lora_A" not in key:
            continue
        _, idx, rest = key.split(".", 2)
        mod = rest[: rest.index(".lora_A")]
        if mod not in _LORA_NAME_MAP:
            raise ValueError(f"unknown LoRA target module {mod!r}")
        a = sd.pop(key)  # (r, in)
        b = sd.pop(key.replace("lora_A", "lora_B"))  # (out, r)
        alpha_key = key.replace("lora_A.weight", "alpha")
        if alpha_key in sd:
            alpha = float(sd.pop(alpha_key))
        rank = a.shape[0]
        per_path.setdefault(_LORA_NAME_MAP[mod], {})[int(idx)] = (a.T, b.T)

    lora: Params = {"blocks": {}}
    for path, layers in per_path.items():
        a = np.stack([layers[i][0] if i in layers else
                      np.zeros_like(next(iter(layers.values()))[0])
                      for i in range(num_layers)])
        b = np.stack([layers[i][1] if i in layers else
                      np.zeros_like(next(iter(layers.values()))[1])
                      for i in range(num_layers)])
        _set_lora(lora["blocks"], path, {"a": a, "b": b})
    scaling = (alpha / rank) if (alpha and rank) else 1.0
    return lora, scaling


def export_diffusers_lora(lora: Params, alpha: float | None = None) -> StateDict:
    """Adapter pytree -> diffusers-dialect LoRA state dict (inverse of
    :func:`convert_diffusers_lora`) for use with the reference ecosystem."""
    inv = {v: k for k, v in _LORA_NAME_MAP.items()}
    sd: StateDict = {}
    for path, ab in _iter_lora_leaves_w(lora.get("blocks", {}), ""):
        mod = inv[path]
        a = np.asarray(ab["a"])  # (L, din, r)
        b = np.asarray(ab["b"])  # (L, r, dout)
        for i in range(a.shape[0]):
            sd[f"transformer.blocks.{i}.{mod}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
            sd[f"transformer.blocks.{i}.{mod}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
            if alpha is not None:
                sd[f"transformer.blocks.{i}.{mod}.alpha"] = np.full(
                    (), alpha, np.float32)
    return sd


def _iter_lora_leaves_w(tree, prefix):
    for name, sub in tree.items():
        path = name if not prefix else f"{prefix}/{name}"
        if isinstance(sub, dict) and "a" in sub and "b" in sub:
            yield path, sub
        elif isinstance(sub, dict):
            yield from _iter_lora_leaves_w(sub, path)


def convert_musubi_lora(sd: StateDict, num_layers: int = 40) -> tuple[Params, float]:
    """musubi-tuner dialect: ``lora_unet_blocks_{i}_{module}.lora_down.weight``
    (models/utils.py:_convert_musubi_wan_lora_to_non_diffusers_wan)."""
    out: StateDict = {}
    for key, v in sd.items():
        if not key.startswith("lora_unet_blocks_"):
            continue
        rest = key[len("lora_unet_blocks_"):]
        idx, modkey = rest.split("_", 1)
        name, suffix = modkey.split(".", 1)
        if name not in _MUSUBI_NAME_MAP:
            raise ValueError(f"unknown musubi LoRA target {name!r}")
        mod = {v_: k_ for k_, v_ in _LORA_NAME_MAP.items()}[_MUSUBI_NAME_MAP[name]]
        suffix = suffix.replace("lora_down", "lora_A").replace("lora_up", "lora_B")
        out[f"blocks.{idx}.{mod}.{suffix}"] = v
    return convert_diffusers_lora(out, num_layers)


def _set_lora(tree: Params, path: str, value):
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


# ----------------------------------------------------------------- VAE

def convert_wan_vae(sd: StateDict, dim_mult=(1, 2, 4, 4), num_res_blocks=2,
                    temporal_downsample=(False, True, True),
                    strict: bool = True) -> Params:
    """Wan2.1_VAE.pth torch state dict -> VAE pytree.

    Sequential flat-index naming from the reference module tree
    (tokenizers/wan2pt1.py Encoder3d/Decoder3d).
    """
    sd = dict(sd)

    def conv(name) -> Params:
        w = sd.pop(f"{name}.weight")
        if w.ndim == 4:  # Conv2d (out,in,kh,kw) -> (1,kh,kw,in,out)
            w = w[:, :, None]
        return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0))),
                "bias": sd.pop(f"{name}.bias")}

    def rms(name) -> Params:
        return {"gamma": sd.pop(f"{name}.gamma").reshape(-1)}

    def res_block(name) -> Params:
        p = {
            "norm1": rms(f"{name}.residual.0"),
            "conv1": conv(f"{name}.residual.2"),
            "norm2": rms(f"{name}.residual.3"),
            "conv2": conv(f"{name}.residual.6"),
        }
        if f"{name}.shortcut.weight" in sd:
            p["shortcut"] = conv(f"{name}.shortcut")
        return p

    def attn_block(name) -> Params:
        return {"norm": rms(f"{name}.norm"), "qkv": conv(f"{name}.to_qkv"),
                "proj": conv(f"{name}.proj")}

    n_stage = len(dim_mult)

    enc: Params = {"conv_in": conv("encoder.conv1")}
    stages = []
    idx = 0
    for i in range(n_stage):
        stage: Params = {"blocks": []}
        for _ in range(num_res_blocks):
            stage["blocks"].append(res_block(f"encoder.downsamples.{idx}"))
            idx += 1
        if i != n_stage - 1:
            stage["down"] = conv(f"encoder.downsamples.{idx}.resample.1")
            if temporal_downsample[i]:
                stage["time_down"] = conv(f"encoder.downsamples.{idx}.time_conv")
            idx += 1
        stages.append(stage)
    enc["stages"] = stages
    enc["mid"] = {"res1": res_block("encoder.middle.0"),
                  "attn": attn_block("encoder.middle.1"),
                  "res2": res_block("encoder.middle.2")}
    enc["head_norm"] = rms("encoder.head.0")
    enc["head_conv"] = conv("encoder.head.2")

    dec: Params = {"conv_in": conv("decoder.conv1")}
    dec["mid"] = {"res1": res_block("decoder.middle.0"),
                  "attn": attn_block("decoder.middle.1"),
                  "res2": res_block("decoder.middle.2")}
    t_up = tuple(reversed(temporal_downsample))
    dstages = []
    idx = 0
    for i in range(n_stage):
        stage = {"blocks": []}
        for _ in range(num_res_blocks + 1):
            stage["blocks"].append(res_block(f"decoder.upsamples.{idx}"))
            idx += 1
        if i != n_stage - 1:
            if t_up[i]:
                stage["time_up"] = conv(f"decoder.upsamples.{idx}.time_conv")
            stage["up"] = conv(f"decoder.upsamples.{idx}.resample.1")
            idx += 1
        dstages.append(stage)
    dec["stages"] = dstages
    dec["head_norm"] = rms("decoder.head.0")
    dec["head_conv"] = conv("decoder.head.2")

    params = {"encoder": enc, "decoder": dec,
              "quant_conv": conv("conv1"), "post_quant_conv": conv("conv2")}
    if strict and sd:
        raise ValueError(f"unconsumed VAE keys: {list(sd)[:8]}...")
    return params
