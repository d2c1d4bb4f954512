#!/usr/bin/env python
"""Two-stage VLM labeling of edit pairs (reference: scripts/data_captioning.py:
caption the pair, then expand into a chain-of-thought edit prompt).

  python scripts/data_captioning.py --metadata data/metadata.csv \
      --model Qwen/Qwen2.5-VL-7B-Instruct
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPTION_INSTRUCTION = (
    "These are the before and after images of an edit. In one sentence, "
    "state what changed between them."
)
EXPAND_INSTRUCTION = (
    "Rewrite that change as a detailed 80-100 word edit prompt describing "
    "the transformation as a physically plausible continuous process from "
    "the first image to the second, preserving everything else."
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", required=True)
    p.add_argument("--model", default="Qwen/Qwen2.5-VL-7B-Instruct")
    p.add_argument("--image-column", default="image")
    p.add_argument("--edit-column", default="edit_image")
    p.add_argument("--out-column", default="prompt")
    args = p.parse_args()

    from PIL import Image

    from chronoedit_tpu.aux.prompt_enhancer import PromptEnhancer, PromptEnhancerConfig

    vlm = PromptEnhancer(PromptEnhancerConfig(model_path=args.model))

    with open(args.metadata, newline="") as f:
        rows = list(csv.DictReader(f))
    base = os.path.dirname(os.path.abspath(args.metadata))

    for i, row in enumerate(rows):
        first = Image.open(os.path.join(base, row[args.image_column]))
        # stage 1: terse caption of the change; stage 2: CoT expansion
        caption = vlm(CAPTION_INSTRUCTION, image=first)
        expanded = vlm(f"{EXPAND_INSTRUCTION}\nChange: {caption}", image=first)
        row[args.out_column] = expanded
        print(f"[{i + 1}/{len(rows)}] {expanded[:80]}...")

    with open(args.metadata, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"updated {args.metadata}")


if __name__ == "__main__":
    main()
