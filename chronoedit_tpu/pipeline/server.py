"""Batching inference server around :class:`ChronoEditPipeline`.

Production serving layer the reference does not have (its only interactive
surface is the single-request gradio demo, `scripts/gradio_paintbrush.py`).
TPU serving economics make batching the first-order lever: one compiled
program per (batch, geometry) bucket, requests grouped by their static
configuration, and the batch padded up to the nearest bucket so a handful
of executables covers every load level (odd batch sizes never trigger a
fresh XLA compile in the request path).

Design:

- :meth:`EditServer.submit` enqueues a request and returns a
  ``concurrent.futures.Future`` — callers (HTTP handlers, gradio, tests)
  block on ``future.result()``.
- a single batcher thread groups pending requests by ``_GroupKey``
  (geometry + sampling params: anything that changes the compiled
  program), waits up to ``max_wait_ms`` for the batch to fill after the
  first request arrives, pads to the nearest bucket, and runs the
  pipeline ONCE per batch. The device is driven from one thread only, so
  requests never contend for the TPU.
- per-request reproducibility: each request carries a ``seed``; the
  server materializes that request's initial latents from it, so batching
  does not change anyone's noise (the pipeline would otherwise draw one
  key for the whole batch).
- text guardrails run per request at submit time (a blocked prompt fails
  only its own future, before it can poison a batch); the video guardrail
  runs on the batched output inside the pipeline as usual.
"""

from __future__ import annotations

import collections
import dataclasses
import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ServerConfig:
    max_batch: int = 4
    max_wait_ms: float = 50.0
    # batch-size buckets (ascending); each gets its own compiled program.
    # () derives powers of two up to max_batch: (1, 2, 4, ...)
    buckets: tuple[int, ...] = ()
    max_queue: int = 64  # submit raises when this many requests are pending

    def resolved_buckets(self) -> tuple[int, ...]:
        if self.buckets:
            return tuple(sorted(self.buckets))
        b, out = 1, []
        while b < self.max_batch:
            out.append(b)
            b *= 2
        return tuple(out) + (self.max_batch,)


@dataclasses.dataclass(frozen=True)
class _GroupKey:
    """Everything that selects a distinct compiled program (the pipeline's
    own static_key covers the rest — shapes follow from these + bucket)."""
    height: int
    width: int
    num_steps: int | None
    guidance: float | None
    flow_shift: float | None
    reasoning: bool
    k_reason: int
    # lengths, not booleans: two requests whose optional embeddings differ
    # in token count must NOT share a batch (np.concatenate would fail the
    # whole batch on the innocent request too); -1 = absent
    neg_len: int
    image_tokens: int
    prompt_len: int
    frame_only: bool


@dataclasses.dataclass
class _Request:
    image: np.ndarray        # (1, 3, H, W)
    prompt_emb: np.ndarray   # (1, L, D)
    neg_prompt_emb: np.ndarray | None
    image_emb: np.ndarray | None
    seed: int
    key: _GroupKey
    future: Future
    enqueued: float


class EditServer:
    def __init__(self, pipeline, cfg: ServerConfig = ServerConfig()):
        if cfg.buckets and max(cfg.buckets) < cfg.max_batch:
            raise ValueError(
                f"buckets {cfg.buckets} do not cover max_batch "
                f"{cfg.max_batch}: an over-sized batch would compile a "
                "fresh program in the request path")
        self.pipeline = pipeline
        self.cfg = cfg
        self._groups: dict[_GroupKey, collections.deque] = {}
        self._lock = threading.Lock()
        self._have_work = threading.Condition(self._lock)
        self._pending = 0
        self._stop = False
        self._thread: threading.Thread | None = None
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "padded_slots": 0, "rejected": 0, "errors": 0}

    # ------------------------------------------------------------ lifecycle

    def start(self) -> "EditServer":
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="edit-batcher")
        self._thread.start()
        return self

    def stop(self) -> None:
        with self._lock:
            self._stop = True
            self._have_work.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=30)
        # fail anything still queued — a caller blocked on future.result()
        # must not hang forever on shutdown
        with self._lock:
            for dq in self._groups.values():
                while dq:
                    req = dq.popleft()
                    self._pending -= 1
                    if not req.future.done():
                        req.future.set_exception(
                            RuntimeError("server shut down before this "
                                         "request was served"))
            self._groups.clear()

    def warmup(self, height: int, width: int, prompt_len: int = 512,
               with_image_emb: bool = True, buckets=None, **kw) -> None:
        """Compile the serving programs before opening the door: one dummy
        run per batch bucket at the given geometry."""
        cfg = self.pipeline.config
        for b in buckets or self.cfg.resolved_buckets():
            img = np.zeros((b, 3, height, width), np.float32)
            pe = np.zeros((b, prompt_len, cfg.dit.text_dim), np.float32)
            ie = (np.zeros((b, cfg.dit.image_tokens, cfg.dit.image_dim),
                           np.float32) if with_image_emb else None)
            self.pipeline.edit_image(jnp.asarray(img), jnp.asarray(pe),
                                     image_emb=None if ie is None
                                     else jnp.asarray(ie), **kw)

    # --------------------------------------------------------------- submit

    def submit(self, image, prompt_emb, *, neg_prompt_emb=None,
               image_emb=None, seed: int = 0, prompt: str = "",
               num_steps: int | None = None, guidance_scale: float | None = None,
               flow_shift: float | None = None,
               enable_temporal_reasoning: bool = False,
               num_temporal_reasoning_steps: int = 0,
               frame_only: bool = True) -> Future:
        """Enqueue one edit; returns a Future resolving to the edited frame
        (3, H, W) (or the full clip (3, T, H, W) with ``frame_only=False``)."""
        fut: Future = Future()
        image = np.asarray(image, np.float32)
        if image.ndim == 3:
            image = image[None]
        prompt_emb = np.asarray(prompt_emb, np.float32)
        if prompt_emb.ndim == 2:
            prompt_emb = prompt_emb[None]
        if image.shape[0] != 1 or prompt_emb.shape[0] != 1:
            raise ValueError("submit() takes a single request; the server "
                             "does the batching")

        # reject unsafe prompts before they can join (and fail) a batch
        if self.pipeline.guardrails is not None:
            try:
                self.pipeline.guardrails.check_text_or_raise(prompt)
            except Exception as e:
                self.stats["rejected"] += 1
                fut.set_exception(e)
                return fut

        key = _GroupKey(
            height=image.shape[-2], width=image.shape[-1],
            num_steps=num_steps, guidance=guidance_scale,
            flow_shift=flow_shift, reasoning=enable_temporal_reasoning,
            k_reason=num_temporal_reasoning_steps,
            neg_len=-1 if neg_prompt_emb is None
            else np.asarray(neg_prompt_emb).shape[-2],
            image_tokens=-1 if image_emb is None
            else np.asarray(image_emb).shape[-2],
            prompt_len=prompt_emb.shape[1], frame_only=frame_only)
        req = _Request(image=image, prompt_emb=prompt_emb,
                       neg_prompt_emb=None if neg_prompt_emb is None
                       else np.asarray(neg_prompt_emb, np.float32),
                       image_emb=None if image_emb is None
                       else np.asarray(image_emb, np.float32),
                       seed=seed, key=key, future=fut,
                       enqueued=time.monotonic())
        with self._lock:
            if self._pending >= self.cfg.max_queue:
                self.stats["rejected"] += 1
                fut.set_exception(
                    RuntimeError(f"queue full ({self.cfg.max_queue})"))
                return fut
            self._groups.setdefault(key, collections.deque()).append(req)
            self._pending += 1
            self.stats["requests"] += 1
            self._have_work.notify()
        return fut

    def health(self) -> dict:
        with self._lock:
            return {"pending": self._pending,
                    "device": str(jax.devices()[0]),
                    **self.stats}

    # -------------------------------------------------------------- batcher

    def _take_batch(self) -> list[_Request] | None:
        """Block until a batch is ready: the oldest group either fills to
        max_batch or its head request has waited max_wait_ms."""
        wait_s = self.cfg.max_wait_ms / 1000.0
        with self._lock:
            while True:
                if self._stop:
                    return None
                oldest = None
                for k in [k for k, dq in self._groups.items() if not dq]:
                    del self._groups[k]  # unbounded key space (client params)
                for dq in self._groups.values():
                    if dq[0].enqueued < (oldest[0].enqueued
                                         if oldest else float("inf")):
                        oldest = dq
                if oldest is None:
                    self._have_work.wait()
                    continue
                deadline = oldest[0].enqueued + wait_s
                now = time.monotonic()
                if len(oldest) >= self.cfg.max_batch or now >= deadline:
                    n = min(len(oldest), self.cfg.max_batch)
                    batch = [oldest.popleft() for _ in range(n)]
                    self._pending -= n
                    return batch
                self._have_work.wait(timeout=deadline - now)

    def _latents_for(self, req: _Request) -> np.ndarray:
        cfg = self.pipeline.config
        # same frame policy as pipeline.__call__ (single source of truth)
        num_frames = cfg.resolve_num_frames(
            enable_temporal_reasoning=req.key.reasoning)
        tl = cfg.vae.latent_frames(num_frames)
        hl = req.key.height // cfg.vae.spatial_factor
        wl = req.key.width // cfg.vae.spatial_factor
        return np.asarray(jax.random.normal(
            jax.random.PRNGKey(req.seed),
            (1, cfg.latent_channels, tl, hl, wl), jnp.float32))

    def _run_batch(self, batch: list[_Request]) -> None:
        k = batch[0].key
        buckets = self.cfg.resolved_buckets()
        bucket = next((b for b in buckets if b >= len(batch)), buckets[-1])
        pad = bucket - len(batch)
        reqs = batch + [batch[-1]] * pad

        def stack(get):
            parts = [get(r) for r in reqs]
            return None if parts[0] is None else jnp.asarray(
                np.concatenate(parts, axis=0))

        image = stack(lambda r: r.image)
        prompt_emb = stack(lambda r: r.prompt_emb)
        neg = stack(lambda r: r.neg_prompt_emb)
        img_emb = stack(lambda r: r.image_emb)
        latents = stack(lambda r: self._latents_for(r))

        out = self.pipeline(
            image, prompt_emb, neg_prompt_emb=neg, image_emb=img_emb,
            num_steps=k.num_steps, guidance_scale=k.guidance,
            flow_shift=k.flow_shift,
            enable_temporal_reasoning=k.reasoning,
            num_temporal_reasoning_steps=k.k_reason,
            # every prompt in the batch was vetted at submit time; without
            # this the pipeline would re-run the text guard (possibly a
            # full LLM generate) on "" for every batch
            skip_text_guardrail=True,
            latents=latents)
        out = np.asarray(out[..., -1, :, :] if k.frame_only else out)
        self.stats["batches"] += 1
        self.stats["batched_requests"] += len(batch)
        self.stats["padded_slots"] += pad
        for i, r in enumerate(batch):
            r.future.set_result(out[i])

    def _loop(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                self._run_batch(batch)
            except Exception as e:  # noqa: BLE001 - fail the batch, not the server
                self.stats["errors"] += 1
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
