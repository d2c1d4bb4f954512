"""Parameter sharding rules (NamedSharding partition specs).

Replaces torch FSDP2/DTensor ``fully_shard`` (wan2pt1.py:908-915) and the TP
checkpointer plumbing with declarative PartitionSpecs; XLA's SPMD partitioner
then inserts all collectives (all-gather for fsdp weight use, psum for
tensor-parallel contractions) automatically.

Two composable strategies on the 4-axis mesh:

- **fsdp**: every parameter's largest eligible axis is sharded over ``fsdp``
  (ZeRO-3 semantics; weights all-gather per scan step).
- **tensor**: Megatron-style layout for the DiT blocks — qkv/fc1 kernels
  column-split, o/fc2 kernels row-split over ``tensor``; everything else
  replicated. Activations stay unannotated and GSPMD propagates.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chronoedit_tpu.parallel.mesh import AXIS_FSDP, AXIS_TENSOR

Params = Any


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


# Megatron-style tensor layout for DiT block params. Kernel shapes carry a
# leading stacked-layer axis L: (L, d_in, d_out). "col" shards d_out, "row"
# shards d_in.
_TP_COL = ("self_attn/q/kernel", "self_attn/k/kernel", "self_attn/v/kernel",
           "cross_attn/q/kernel", "cross_attn/k/kernel", "cross_attn/v/kernel",
           "cross_attn/k_img/kernel", "cross_attn/v_img/kernel",
           "ffn/fc1/kernel")
_TP_COL_BIAS = ("self_attn/q/bias", "self_attn/k/bias", "self_attn/v/bias",
                "cross_attn/q/bias", "cross_attn/k/bias", "cross_attn/v/bias",
                "cross_attn/k_img/bias", "cross_attn/v_img/bias",
                "ffn/fc1/bias")
_TP_ROW = ("self_attn/o/kernel", "cross_attn/o/kernel", "ffn/fc2/kernel")


def dit_param_sharding(
    mesh: Mesh, use_fsdp: bool = True, use_tensor: bool = True
) -> Callable[[tuple, jax.ShapeDtypeStruct], NamedSharding]:
    """Returns path-aware spec function for DiT params (init_dit_params tree)."""
    fsdp_size = mesh.shape[AXIS_FSDP]
    tp_size = mesh.shape[AXIS_TENSOR]

    def spec_fn(path, leaf) -> NamedSharding:
        name = _path_str(path)
        shape = leaf.shape
        spec = [None] * len(shape)
        # substring (not prefix) match so the same rules cover param *mirrors*
        # whose paths gain a prefix: optimizer moments (mu/blocks/...) and
        # ema_params/blocks/... shard exactly like the weights they track
        in_block = "blocks/" in name
        sub = name.split("blocks/")[-1] if in_block else name

        # int8 leaves (ops/quant.py): kernel_q shards like its float kernel;
        # a per-out-channel kernel_scale follows the column-split bias rule
        # (and stays replicated for row-split linears, whose out axis is full)
        norm = sub
        if norm.endswith("/kernel_q"):
            norm = norm[: -len("_q")]
        is_scale = sub.endswith("/kernel_scale")
        if is_scale:
            norm = sub[: -len("_scale")].replace("/kernel", "/bias")
        # w4a8's kernel_scale8 is a per-out-channel (L, out) vector exactly
        # like a bias — column-split shards out, row-split leaves it whole
        if sub.endswith("/kernel_scale8"):
            norm = sub[: -len("_scale8")].replace("/kernel", "/bias")
            is_scale = True
        # int4 leaves: kernel_q4 is (L, in_pad/2, out) split-half packed
        # (r4 layout, ops/quant.py) — col-split shards the out axis,
        # row-split shards the packed in axis (GSPMD-correct; the dequant's
        # per-half group reshape may cost a scale gather, acceptable for the
        # tiny (g, out) scale arrays — int4 is the single-chip capacity
        # scheme, multi-chip int4 is a test-path edge case).
        # kernel_scale4 is (L, g, out): out axis for col linears, g axis for
        # row linears.
        is_q4 = sub.endswith("/kernel_q4")
        is_scale4 = sub.endswith("/kernel_scale4")
        if is_q4:
            norm = sub[: -len("_q4")]
        if is_scale4:
            norm = sub[: -len("_scale4")]

        if use_tensor and tp_size > 1 and in_block:
            if any(norm.endswith(k) for k in _TP_COL):
                spec[-1] = AXIS_TENSOR
            elif any(norm.endswith(k) for k in _TP_COL_BIAS):
                spec[-1] = AXIS_TENSOR
            elif any(norm.endswith(k) for k in _TP_ROW):
                if is_q4 or is_scale4:
                    # packed-in axis (L, in_pad/2, out) resp. group axis
                    # (L, g, out). Only shard when it divides evenly (fc2's
                    # g=108 is indivisible by tensor=8 — left replicated
                    # there; the fsdp rule below may still pick another axis)
                    if shape[-2] % tp_size == 0:
                        spec[-2] = AXIS_TENSOR
                elif not is_scale:
                    spec[-2] = AXIS_TENSOR

        if use_fsdp and fsdp_size > 1:
            # shard the largest remaining divisible axis over fsdp
            order = sorted(range(len(shape)), key=lambda i: -shape[i])
            for i in order:
                if spec[i] is None and shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
                    # avoid the stacked-layer axis 0 of block params: scan
                    # slices it every step, sharding it would reshard per layer
                    if in_block and i == 0 and len(shape) > 1:
                        continue
                    # avoid kernel_q4's packed-in axis (-2): an fsdp chunk of
                    # packed rows rarely aligns with the group reshape the
                    # dequant performs (g/(2*fsdp) is fractional at 14B
                    # shapes), which would force per-layer weight gathers
                    # inside the denoise scan (advisor r3); the out axis is
                    # always divisible and dequantizes locally
                    if is_q4 and i == len(shape) - 2:
                        continue
                    spec[i] = AXIS_FSDP
                    break
        return NamedSharding(mesh, P(*spec))

    return spec_fn


def shard_params(params: Params, mesh: Mesh, spec_fn=None) -> Params:
    """device_put a parameter pytree with the given (or DiT-default) specs."""
    spec_fn = spec_fn or dit_param_sharding(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, spec_fn(path, leaf)), params
    )


def replicate(tree: Params, mesh: Mesh) -> Params:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sh), tree)


def param_spec_tree(params: Params, mesh: Mesh, spec_fn=None) -> Params:
    """PartitionSpec pytree (for pjit in/out shardings and Orbax metadata)."""
    spec_fn = spec_fn or dit_param_sharding(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_fn(path, leaf), params
    )
