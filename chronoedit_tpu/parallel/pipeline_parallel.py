"""GPipe-style pipeline parallelism over the ``pipe`` mesh axis.

The reference only has Megatron PP *plumbing* (trainer.py:86 accepts a
pipeline size; no network ever uses it). Here PP is implemented for the
scan-over-stacked-blocks DiT, the TPU-idiomatic way:

- the stacked layer axis of the block params is sharded over ``pipe``
  (each stage holds ``L / n_stages`` consecutive blocks);
- the batch is split into microbatches; a single ``lax.scan`` over
  ``M + S - 1`` ticks runs every stage's local block sub-scan each tick and
  hands activations to the next stage with ``ppermute`` — XLA overlaps the
  permute with the next tick's compute over ICI;
- outputs accumulate on the last stage and are replicated with one psum.

Everything is standard differentiable JAX (scan/ppermute/psum), so the
backward pass is the reverse pipeline for free, and ``jax.checkpoint``
remat policies on the block fn apply per stage.

Bubble fraction is the usual (S-1)/(M+S-1); callers pick microbatches
accordingly (training grad-accum microbatches map 1:1).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from chronoedit_tpu.parallel.mesh import AXIS_PIPE


def gpipe_scan(
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    ctx_batch: Any,
    mesh: Mesh,
    microbatches: int | None = None,
    axis: str = AXIS_PIPE,
    context_axis: str | None = None,
    context_dim: int = 1,
) -> jnp.ndarray:
    """Run a stacked-layer scan as a GPipe pipeline over ``axis``.

    Args:
      block_fn: ``block_fn(layer_params, x, ctx) -> x`` — one block, where
        ``layer_params`` is one slice of ``stacked_params`` and ``ctx`` is
        the (microbatched) shared context pytree.
      stacked_params: pytree with a leading stacked-layer axis L
        (L % n_stages == 0); sharded over ``axis`` by this wrapper.
      x: (B, ...) activations; B % microbatches == 0.
      ctx_batch: pytree of (B, ...) arrays microbatched along with ``x``
        (time embeddings, text/image context — anything batch-dependent).
      mesh: mesh containing ``axis``.
      microbatches: default min(B, n_stages).
      context_axis: compose with context parallelism — ``x``'s dim
        ``context_dim`` is sharded over this mesh axis *inside* stages, and
        ``block_fn`` runs on the context-local slice (it must handle CP
        itself, e.g. ring/Ulysses attention over the axis name and
        frame-local modulation; dit_forward's PP path does). ``ctx_batch``
        stays replicated over the context axis — slice it in ``block_fn``.
      context_dim: which dim of ``x`` is the (token) dim to context-shard.

    Returns: (B, ...) outputs, replicated over ``axis`` (and gathered over
    ``context_axis`` only by the caller's downstream sharding).
    """
    n = mesh.shape[axis]
    if n == 1:
        def body(carry, lp):
            return block_fn(lp, carry, ctx_batch), None

        return jax.lax.scan(body, x, stacked_params)[0]

    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % n:
        raise ValueError(
            f"{num_layers} stacked layers not divisible by {n} pipeline "
            "stages")
    b = x.shape[0]

    # compose with the data axis: microbatches are batch-sharded over
    # ``data`` inside the shard_map, so DP keeps its speedup under PP
    # (round-2 review: P() in_specs replicated the global batch onto every
    # device). context composes via ``context_axis`` (tokens sharded inside
    # stages, CP attention over the axis name); tensor stays replicated
    # inside stages — warn about layouts that silently replicate work.
    import warnings

    cp = mesh.shape.get(context_axis, 1) if context_axis else 1
    shard_ctx = (context_axis is not None and cp > 1
                 and x.shape[context_dim] % cp == 0)
    neutral_axes = ["tensor"]
    if mesh.shape.get("context", 1) > 1 and not shard_ctx:
        neutral_axes.append("context")
    for neutral in neutral_axes:
        if mesh.shape.get(neutral, 1) > 1:
            warnings.warn(
                f"pipeline parallelism replicates the {neutral!r} axis "
                "inside stages (attention runs unsharded per stage); prefer "
                "tensor/context meshes without a pipe axis for that",
                stacklevel=3)
    dsize = mesh.shape.get("data", 1)
    shard_data = dsize > 1 and b % dsize == 0
    if dsize > 1 and not shard_data:
        warnings.warn(
            f"batch {b} not divisible by data axis {dsize}; running the "
            "pipeline with a replicated batch", stacklevel=3)
    b_local = b // dsize if shard_data else b

    if microbatches is None:
        m = min(b_local, n)
        while b_local % m:  # largest divisor of the local batch <= n
            m -= 1
    else:
        m = microbatches
        if b % m or (shard_data and (b // m) % dsize):
            raise ValueError(
                f"batch {b} not divisible into {m} microbatches "
                f"{'x data ' + str(dsize) if shard_data else ''}")
    mb = b // m

    def split(a):
        return a.reshape(m, mb, *a.shape[1:])

    xm = split(x)
    ctxm = jax.tree_util.tree_map(split, ctx_batch)

    # stacked params sharded over the pipe axis; activations/ctx sharded
    # over data on the microbatch dim (replicated over other axes); with
    # ``context_axis``, x's token dim is additionally context-sharded while
    # ctx stays replicated (block_fn slices it per shard)
    lead_pipe = jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked_params)
    bspec = ("data",) if shard_data else (None,)
    xdims = [None] * (xm.ndim - 2)
    if shard_ctx:
        xdims[context_dim - 1] = context_axis  # -1: dims after (M, mb)
    x_spec = P(None, *bspec, *xdims)
    ctx_spec = jax.tree_util.tree_map(
        lambda a: P(None, *bspec, *([None] * (a.ndim - 2))), ctxm)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(lead_pipe, x_spec, ctx_spec),
        out_specs=x_spec,
        check_vma=False)
    def run(local_params, xm, ctxm):
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n) for i in range(n)]
        total = m + n - 1

        def local_blocks(x_in, ctx):
            def body(carry, lp):
                return block_fn(lp, carry, ctx), None

            return jax.lax.scan(body, x_in, local_params)[0]

        def tick(state, t):
            # stage s processes microbatch (t - s) at tick t
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            x_in = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, 0, False),
                xm)
            ctx = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, 0, False),
                ctxm)
            x_cur = jnp.where(stage == 0, x_in, state)
            y = local_blocks(x_cur, ctx)
            # last stage emits finished microbatches; bubbles emit zeros
            valid = (stage == n - 1) & (t >= n - 1)
            out = jnp.where(valid, y, jnp.zeros_like(y))
            state_next = jax.lax.ppermute(y, axis, perm)
            return state_next, out

        _, outs = jax.lax.scan(tick, jnp.zeros_like(xm[0]),
                               jnp.arange(total))
        outs = outs[n - 1:]  # (M, mb, ...): microbatch i finishes at n-1+i
        # only the last stage holds real values; psum replicates them
        return jax.lax.psum(outs, axis)

    out = run(stacked_params, xm, ctxm)
    return out.reshape(b, *x.shape[1:])
