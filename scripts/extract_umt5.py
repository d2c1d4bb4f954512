#!/usr/bin/env python
"""Precompute UMT5 prompt embeddings for a dataset (reference:
scripts/extract_umt5.py — per-prompt pickles + metadata.csv update).

  python scripts/extract_umt5.py --metadata data/metadata.csv \
      --t5-checkpoint checkpoints/models_t5_umt5-xxl-enc-bf16.pth \
      --output-dir data/umt5
"""

from __future__ import annotations

import argparse
import csv
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", required=True)
    p.add_argument("--t5-checkpoint", required=True)
    p.add_argument("--output-dir", default="umt5")
    p.add_argument("--prompt-column", default="prompt")
    args = p.parse_args()

    import numpy as np

    from chronoedit_tpu.models import weights as w
    from chronoedit_tpu.models.umt5 import UMT5TextEncoder, convert_umt5_checkpoint

    encoder = UMT5TextEncoder(convert_umt5_checkpoint(w.load_torch(args.t5_checkpoint)))

    with open(args.metadata, newline="") as f:
        rows = list(csv.DictReader(f))
    os.makedirs(args.output_dir, exist_ok=True)

    for i, row in enumerate(rows):
        emb = np.asarray(encoder([row[args.prompt_column]])[0], np.float32)
        out = os.path.join(args.output_dir, f"{i:08d}.pkl")
        with open(out, "wb") as f:
            pickle.dump(emb, f)
        row["umt5_emb"] = out
        print(f"[{i + 1}/{len(rows)}] {out}")

    with open(args.metadata, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"updated {args.metadata} with umt5_emb column")


if __name__ == "__main__":
    main()
