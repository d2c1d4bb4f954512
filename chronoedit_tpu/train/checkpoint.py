"""Orbax checkpointing — the DCP/DistributedCheckpointer replacement.

The reference's checkpoint subsystem (SURVEY §5.4: sharded DCP with async
pinned-memory background saves, ``latest_checkpoint.txt``, partial resume)
maps onto Orbax directly:

- sharded-array save/restore with resharding on restore comes free from
  Orbax type handlers (DCP ``__R_S.distcp`` shards + LoadPlanner equivalent);
- async background saves are ``AsyncCheckpointer`` (the pinned-memory mp
  process equivalent);
- ``latest_checkpoint.txt`` is the CheckpointManager step registry;
- partial resume (``keys_not_to_resume``) = restoring into a template and
  grafting selected subtrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import orbax.checkpoint as ocp


@dataclasses.dataclass(frozen=True)
class CheckpointConfig:
    directory: str = "checkpoints"
    max_to_keep: int = 3
    save_interval: int = 1000
    async_save: bool = True
    keys_not_to_resume: tuple[str, ...] = ()
    # restore the EMA weights INTO the regular params (the reference's
    # ``load_ema_to_reg`` regexp swap, ModelWrapper dcp.py:454-503) — used to
    # fine-tune or evaluate from the smoothed weights
    load_ema_to_reg: bool = False


class CheckpointManager:
    """Thin Orbax CheckpointManager wrapper over a TrainState pytree."""

    def __init__(self, cfg: CheckpointConfig):
        self.cfg = cfg
        options = ocp.CheckpointManagerOptions(
            max_to_keep=cfg.max_to_keep,
            save_interval_steps=1,
            enable_async_checkpointing=cfg.async_save,
        )
        import os

        self._mgr = ocp.CheckpointManager(os.path.abspath(cfg.directory),
                                          options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None) -> Any:
        """Restore into the (possibly differently-sharded) template state.

        ``keys_not_to_resume`` top-level fields keep the template's values
        (the reference's partial-resume, dcp.py:671-700)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        if self.cfg.keys_not_to_resume:
            restored = restored._replace(**{
                k: getattr(template, k) for k in self.cfg.keys_not_to_resume
                if hasattr(template, k)
            })
        if (self.cfg.load_ema_to_reg
                and getattr(restored, "ema_params", None) is not None):
            # copy: params and ema_params must not alias (donation sees each
            # buffer once), same reason make_train_state copies
            import jax.numpy as jnp

            restored = restored._replace(params=jax.tree_util.tree_map(
                jnp.copy, restored.ema_params))
        return restored

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any):
    """One-shot (non-managed) param save, e.g. for exported/EMA weights."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any | None = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target=template)
