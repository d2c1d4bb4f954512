#!/usr/bin/env python
"""ChronoEdit-TPU training CLI (reference: scripts/train.py).

Examples:
  # smoke-train the tiny model on mock data (reference --smoke semantics)
  python scripts/train.py --experiment tiny --data mock --smoke

  # LoRA fine-tune / full fine-tune with a mesh
  python scripts/train.py --experiment chronoedit_14b --data /path/to/metadata.csv \
      --mesh fsdp=8 --max-iter 5000 --checkpoint-dir ckpts/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", type=str, default="tiny")
    p.add_argument("--data", type=str, default="mock",
                   help="'mock' or a metadata.csv path")
    p.add_argument("--base-path", type=str, default="",
                   help="dataset root for relative paths in metadata")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--max-iter", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--log-file", type=str, default=None)
    p.add_argument("--mesh", type=str, default=None,
                   help="e.g. 'fsdp=8' or 'data=2,fsdp=2,context=2'")
    p.add_argument("--remat", type=str, default="none",
                   choices=["none", "full", "matmul_only"])
    p.add_argument("--lora-rank", type=int, default=0,
                   help=">0: LoRA fine-tune (frozen base, rank-R adapters on "
                        "q,k,v,o,ffn — the DiffSynth train_diffsynth.py path)")
    p.add_argument("--base-checkpoint", type=str, default=None,
                   help="diffusers safetensors glob for the frozen base "
                        "weights (LoRA mode; random base if omitted)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="config override key=value (repeatable), e.g. "
                        "--set dit.num_layers=8")
    p.add_argument("--smoke", action="store_true",
                   help="max_iter=2, no checkpoints (reference train.py --smoke)")
    p.add_argument("--dryrun", action="store_true",
                   help="print resolved configs and exit (reference --dryrun)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.smoke:
        args.max_iter = 2
        args.checkpoint_dir = None

    import dataclasses

    import jax

    # multi-host: a no-op unless JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID are exported (or a TPU pod autodetects) — must run
    # before any other jax call (reference distributed.init(),
    # _ext/imaginaire/utils/distributed.py:49-82)
    from chronoedit_tpu.parallel import init_distributed, is_primary

    multihost = init_distributed()

    from chronoedit_tpu.configs import get_experiment
    from chronoedit_tpu.data.mock import mock_batch_iterator
    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.train import TrainConfig
    from chronoedit_tpu.train.callbacks import (
        HeartbeatCallback, IterSpeedCallback, LossLoggerCallback)
    from chronoedit_tpu.train.checkpoint import CheckpointConfig
    from chronoedit_tpu.train.trainer import Trainer, TrainerConfig

    pipe_cfg = get_experiment(args.experiment)
    if args.overrides:
        from chronoedit_tpu.utils.config import apply_overrides

        pipe_cfg = apply_overrides(pipe_cfg, args.overrides)
    dit_cfg = dataclasses.replace(pipe_cfg.dit, remat=args.remat)
    train_cfg = TrainConfig(lr=args.lr, grad_accum=args.grad_accum,
                            warmup_steps=min(1000, max(1, args.max_iter // 10)))
    trainer_cfg = TrainerConfig(max_iter=args.max_iter,
                                save_every=args.save_every)

    if args.dryrun:
        print(pipe_cfg)
        print(train_cfg)
        print(trainer_cfg)
        return

    mesh = None
    if args.mesh:
        from chronoedit_tpu.parallel import MeshConfig, make_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        mesh = make_mesh(MeshConfig(**{k: int(v) for k, v in spec.items()}))

    params = dit_lib.init_dit_params(jax.random.PRNGKey(0), dit_cfg)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), pipe_cfg.vae)
    if mesh is not None:
        from chronoedit_tpu.parallel import shard_params
        from chronoedit_tpu.parallel.sharding import dit_param_sharding, replicate

        params = shard_params(params, mesh, dit_param_sharding(mesh))
        vae_params = replicate(vae_params, mesh)

    if args.data == "mock":
        data = mock_batch_iterator(vae_params, pipe_cfg,
                                   height=32, width=32)
    else:
        from chronoedit_tpu.data.edit_dataset import EditDataset
        from chronoedit_tpu.data.loaders import PrefetchLoader

        ds = EditDataset(args.base_path, args.data)
        data = iter(PrefetchLoader(
            _edit_batches(ds, vae_params, pipe_cfg, args.batch_size,
                          rank=jax.process_index(),
                          world=jax.process_count())))

    if multihost and mesh is not None:
        # each process feeds its local rows; assemble global jax.Arrays
        # (batch_size is per-process)
        from chronoedit_tpu.parallel import host_local_to_global

        data = (host_local_to_global(b, mesh) for b in data)

    if args.lora_rank > 0:
        _train_lora(args, pipe_cfg, dit_cfg, train_cfg, params, data)
        return

    # host-side observability is rank-0-only (the reference's rank0 filter,
    # utils/log.py); Orbax checkpointing itself is collective on all hosts
    callbacks = []
    if is_primary():
        callbacks = [IterSpeedCallback(log_every=10 if args.smoke else 50),
                     HeartbeatCallback(path=os.path.join(
                         args.checkpoint_dir or ".", "heartbeat.txt"))]
        if args.log_file:
            callbacks.append(LossLoggerCallback(args.log_file))

    ckpt_cfg = (CheckpointConfig(directory=args.checkpoint_dir,
                                 save_interval=args.save_every)
                if args.checkpoint_dir else None)
    trainer = Trainer(dit_cfg, train_cfg, trainer_cfg, ckpt_cfg, callbacks)
    state = trainer.init_state(params)

    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        state = trainer.train(state, data)
    print(f"done at step {int(state.step)}")


def _train_lora(args, pipe_cfg, dit_cfg, train_cfg, base_params, data):
    """LoRA fine-tune (the train_diffsynth.py recipe: rank-R adapters on the
    attention/ffn projections of every block, frozen base)."""
    import glob

    import jax

    from chronoedit_tpu.models import lora as lora_lib
    from chronoedit_tpu.models import weights as w
    from chronoedit_tpu.train.lora_train import (
        make_lora_train_state, make_lora_train_step)

    if args.base_checkpoint:
        sd = w.load_safetensors(sorted(glob.glob(args.base_checkpoint)))
        base_params = jax.tree_util.tree_map(
            jax.numpy.asarray,
            w.convert_diffusers_dit(sd, num_layers=dit_cfg.num_layers))

    lcfg = lora_lib.LoRAConfig(rank=args.lora_rank, alpha=float(args.lora_rank))
    lora = lora_lib.init_lora_params(jax.random.PRNGKey(1), base_params, lcfg)
    state = make_lora_train_state(lora, train_cfg)
    step = make_lora_train_step(dit_cfg, train_cfg, lcfg, donate=False)

    key = jax.random.PRNGKey(0)
    for it in range(args.max_iter):
        key, sub = jax.random.split(key)
        state, metrics = step(state, base_params, next(data), sub)
        if it % 10 == 0:
            print(f"[lora iter {it}] loss={float(metrics['loss']):.4f}")

    out = os.path.join(args.checkpoint_dir or ".", "lora.safetensors")
    from safetensors.numpy import save_file

    sd_out = w.export_diffusers_lora(state.lora_params, alpha=lcfg.alpha)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_file(sd_out, out)
    print(f"saved LoRA -> {out} ({len(sd_out)} tensors)")


def _edit_batches(ds, vae_params, pipe_cfg, batch_size, rank=0, world=1):
    import itertools

    import jax.numpy as jnp
    import numpy as np

    from chronoedit_tpu.train.train_step import edit_training_batch

    # strided per-process sharding (webdataset distributor semantics)
    idx = itertools.cycle(range(rank % max(len(ds), 1), len(ds), world))
    while True:
        items = [ds[next(idx)] for _ in range(batch_size)]
        video = jnp.asarray(np.stack([it["video"] for it in items]))
        latents, condition = edit_training_batch(vae_params, pipe_cfg, video)
        batch = {"latents": latents, "condition": condition}
        if "text_emb" in items[0]:
            batch["text_emb"] = jnp.asarray(
                np.stack([it["text_emb"] for it in items]))
        else:
            raise SystemExit(
                "metadata rows need precomputed 'umt5_emb' pickles "
                "(run scripts/extract_umt5.py) — on-the-fly text encoding "
                "requires --text-encoder weights")
        yield batch


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
