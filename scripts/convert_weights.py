#!/usr/bin/env python
"""Checkpoint conversion (reference: scripts/convert_distcp_to_pt.py).

Converts between: Orbax train checkpoints, diffusers-style safetensors, and
raw pytree dumps.

Examples:
  # export TPU-trained DiT params (or EMA) back to diffusers safetensors
  python scripts/convert_weights.py orbax-to-diffusers ckpts/ out.safetensors --ema

  # import reference diffusers shards into an Orbax params dir
  python scripts/convert_weights.py diffusers-to-orbax "shards/*.safetensors" params/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["orbax-to-diffusers", "diffusers-to-orbax"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA weights instead of the raw params")
    p.add_argument("--num-layers", type=int, default=40)
    args = p.parse_args()

    from chronoedit_tpu.models import weights as w

    if args.mode == "diffusers-to-orbax":
        from chronoedit_tpu.train.checkpoint import save_params

        sd = w.load_safetensors(sorted(glob.glob(args.src)))
        params = w.convert_diffusers_dit(sd, num_layers=args.num_layers)
        save_params(os.path.abspath(args.dst), params)
        print(f"wrote Orbax params -> {args.dst}")
    else:
        from safetensors.numpy import save_file

        from chronoedit_tpu.train.checkpoint import load_params

        tree = load_params(os.path.abspath(args.src))
        if isinstance(tree, dict) and "params" in tree:
            tree = tree["ema_params" if args.ema else "params"]
        sd = w.export_diffusers_dit(tree)
        save_file(sd, args.dst)
        print(f"wrote diffusers safetensors -> {args.dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
