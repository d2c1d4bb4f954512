"""Declarative conditioning with CFG dropout.

The reference conditions the DiT through a ``GeneralConditioner`` that
applies **per-key dropout** during training so classifier-free guidance has
an unconditional branch to sample from (``chronoedit/_src/modules/
conditioner.py:159-236``; ``TextAttrEmptyStringDrop`` swaps in the
empty-prompt embedding rather than zeros, :258-295), and produces
(condition, uncondition) pairs at inference (:465-520).

Functional equivalent: a :class:`Conditioner` holds per-key
:class:`CondSpec`s (dropout rate + null-value policy); ``__call__`` applies
training dropout with a PRNG key, ``condition_uncondition`` builds the CFG
pair.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CondSpec:
    """One conditioning input.

    dropout_rate: probability (per sample) of replacing the value with its
      null during training.
    null_mode: "zeros" | "empty_emb" — what the unconditional value is.
      "empty_emb" requires ``null_value`` (e.g. the UMT5 embedding of "",
      the TextAttrEmptyStringDrop behaviour).
    """

    dropout_rate: float = 0.0
    null_mode: str = "zeros"
    null_value: jnp.ndarray | None = None

    def null_for(self, value: jnp.ndarray) -> jnp.ndarray:
        if self.null_mode == "zeros":
            return jnp.zeros_like(value)
        if self.null_mode == "empty_emb":
            if self.null_value is None:
                raise ValueError("null_mode='empty_emb' needs null_value")
            null = self.null_value.astype(value.dtype)
            return jnp.broadcast_to(null, value.shape)
        raise ValueError(self.null_mode)


class Conditioner:
    """Per-key conditioning dropout + CFG pair construction."""

    def __init__(self, specs: dict[str, CondSpec]):
        self.specs = specs

    def __call__(self, batch: dict[str, jnp.ndarray], key: jax.Array | None = None,
                 train: bool = True) -> dict[str, jnp.ndarray]:
        """Apply per-sample dropout to each configured key (training)."""
        out = dict(batch)
        if not train or key is None:
            return out
        for name, spec in self.specs.items():
            if name not in out or spec.dropout_rate <= 0.0:
                continue
            key, sub = jax.random.split(key)
            value = out[name]
            b = value.shape[0]
            drop = jax.random.bernoulli(sub, spec.dropout_rate, (b,))
            mask = drop.reshape((b,) + (1,) * (value.ndim - 1))
            out[name] = jnp.where(mask, spec.null_for(value), value)
        return out

    def condition_uncondition(
        self, batch: dict[str, jnp.ndarray],
        uncond_keys: tuple[str, ...] = ("text_emb",),
        negative: dict[str, jnp.ndarray] | None = None,
    ) -> tuple[dict[str, jnp.ndarray], dict[str, jnp.ndarray]]:
        """(condition, uncondition) for CFG. ``negative`` values override the
        null (get_condition_with_negative_prompt, conditioner.py:496-520)."""
        cond = dict(batch)
        uncond = dict(batch)
        for name in uncond_keys:
            if name not in batch:
                continue
            if negative and name in negative:
                uncond[name] = negative[name]
            else:
                spec = self.specs.get(name, CondSpec())
                uncond[name] = spec.null_for(batch[name])
        return cond, uncond


def edit_conditioner(empty_text_emb: jnp.ndarray | None = None,
                     text_dropout: float = 0.1,
                     image_dropout: float = 0.0) -> Conditioner:
    """The ChronoEdit edit-model conditioning recipe: text CFG-dropout with
    empty-string-embedding nulls; CLIP image tokens kept (the reference runs
    uncond with the same image embedding, run_inference path)."""
    text_spec = CondSpec(
        dropout_rate=text_dropout,
        null_mode="empty_emb" if empty_text_emb is not None else "zeros",
        null_value=empty_text_emb,
    )
    return Conditioner({
        "text_emb": text_spec,
        "image_emb": CondSpec(dropout_rate=image_dropout, null_mode="zeros"),
    })
