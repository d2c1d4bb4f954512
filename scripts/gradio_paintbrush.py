#!/usr/bin/env python
"""Interactive paint-brush editing demo (reference: scripts/gradio_paintbrush.py).

A Gradio Blocks app: upload an image, paint a mask/scribble with the brush,
give an instruction; the composited brush strokes + prompt drive the
paintbrush-LoRA edit. Requires ``gradio`` (not part of the core deps).

  python scripts/gradio_paintbrush.py --checkpoint-dir ./checkpoints/ChronoEdit-14B \
      --lora ./checkpoints/paintbrush_lora.safetensors
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_app(pipe, seed: int = 0):
    import gradio as gr
    import jax
    import jax.numpy as jnp
    import numpy as np

    def run_edit(editor_value, prompt, steps, guidance):
        from chronoedit_tpu.data.edit_dataset import ImageCropAndResize, ToArray

        background = editor_value["background"].convert("RGB")
        # composite brush layers over the input (the paintbrush conditioning)
        composite = editor_value["composite"].convert("RGB")
        crop = ImageCropAndResize(None, None, max_pixels=1280 * 720)
        image = jnp.asarray(ToArray()(crop(composite)))[None]

        prompt_emb = pipe.encode_prompt(prompt)
        neg_emb = pipe.encode_prompt("")
        image_emb = pipe.encode_image(image)
        frame = pipe.edit_image(
            image, prompt_emb, neg_prompt_emb=neg_emb, image_emb=image_emb,
            num_steps=int(steps), guidance_scale=float(guidance),
            prompt=prompt, key=jax.random.PRNGKey(seed),
        )
        arr = np.clip((np.asarray(frame[0]).transpose(1, 2, 0) + 1) * 127.5,
                      0, 255).astype(np.uint8)
        return arr

    with gr.Blocks(title="ChronoEdit-TPU Paintbrush") as demo:
        gr.Markdown("# ChronoEdit-TPU — paint-brush editing")
        with gr.Row():
            editor = gr.ImageEditor(type="pil", label="paint on the image")
            output = gr.Image(label="edit result")
        prompt = gr.Textbox(label="instruction",
                            placeholder="turn the scribbled region into ...")
        with gr.Row():
            steps = gr.Slider(1, 50, value=8, step=1, label="steps")
            guidance = gr.Slider(1.0, 10.0, value=1.0, label="guidance")
        gr.Button("Edit").click(run_edit, [editor, prompt, steps, guidance],
                                [output])
    return demo


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--lora", action="append", default=[])
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is not installed; `pip install gradio` to run the demo")

    from scripts.run_inference import attach_lora, load_pretrained_pipeline
    from chronoedit_tpu.configs import chronoedit_14b_distilled

    pipe = load_pretrained_pipeline(chronoedit_14b_distilled(), args.checkpoint_dir)
    for spec in args.lora:
        path, _, scale = spec.partition(":")
        attach_lora(pipe, path, float(scale or 1.0))
    build_app(pipe).launch(server_port=args.port)


if __name__ == "__main__":
    main()
