#!/usr/bin/env python
"""Prompt-enhancer CLI (reference: scripts/prompt_enhancer.py).

  python scripts/prompt_enhancer.py --image input.png \
      --prompt "make the car red" --model Qwen/Qwen2.5-VL-7B-Instruct
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", required=True)
    p.add_argument("--image", default=None)
    p.add_argument("--model", default="Qwen/Qwen2.5-VL-7B-Instruct",
                   help="local HF path (zero-egress setups pre-stage weights)")
    p.add_argument("--max-new-tokens", type=int, default=256)
    args = p.parse_args()

    from chronoedit_tpu.aux.prompt_enhancer import PromptEnhancer, PromptEnhancerConfig

    image = None
    if args.image:
        from PIL import Image

        image = Image.open(args.image).convert("RGB")

    enhancer = PromptEnhancer(PromptEnhancerConfig(
        model_path=args.model, max_new_tokens=args.max_new_tokens))
    print(enhancer(args.prompt, image=image))


if __name__ == "__main__":
    main()
