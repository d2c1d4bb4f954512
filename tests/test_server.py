"""Batching inference server (pipeline/server.py + scripts/serve.py).

Fast tier: grouping/padding/futures semantics against a fake pipeline (no
jit). Slow tier: the real tiny pipeline behind the stdlib HTTP endpoint.
"""

import dataclasses
import io
import threading
import time
import urllib.request

import numpy as np
import pytest

from chronoedit_tpu.configs import chronoedit_tiny
from chronoedit_tpu.pipeline import EditServer, ServerConfig


class FakePipeline:
    """Records batch shapes; returns zeros of the right video shape."""

    def __init__(self):
        self.config = chronoedit_tiny()
        self.guardrails = None
        self.batch_sizes = []
        self.latents_seen = []

    fail_next = False

    def __call__(self, image, prompt_emb, neg_prompt_emb=None, image_emb=None,
                 latents=None, **kw):
        if self.fail_next:
            self.fail_next = False
            raise RuntimeError("transient device error")
        b, _, h, w = image.shape
        self.batch_sizes.append(b)
        self.latents_seen.append(np.asarray(latents))
        t = self.config.num_frames
        out = np.zeros((b, 3, t, h, w), np.float32)
        out += np.arange(b, dtype=np.float32)[:, None, None, None, None]
        return out


def _req(cfg, h=8, w=8):
    image = np.zeros((1, 3, h, w), np.float32)
    prompt = np.zeros((1, 6, cfg.dit.text_dim), np.float32)
    return image, prompt


def test_single_request_roundtrip():
    pipe = FakePipeline()
    srv = EditServer(pipe, ServerConfig(max_batch=4, max_wait_ms=5)).start()
    try:
        image, prompt = _req(pipe.config)
        out = srv.submit(image, prompt, seed=3).result(timeout=30)
        assert out.shape == (3, 8, 8)  # frame_only: last frame of the clip
        assert srv.stats["batches"] == 1
    finally:
        srv.stop()


def test_concurrent_requests_batch_together_with_padding():
    pipe = FakePipeline()
    srv = EditServer(pipe, ServerConfig(max_batch=4, max_wait_ms=200))
    image, prompt = _req(pipe.config)
    # enqueue 3 BEFORE starting the batcher so they must coalesce
    futs = [srv.submit(image, prompt, seed=i) for i in range(3)]
    srv.start()
    try:
        outs = [f.result(timeout=30) for f in futs]
        # 3 requests -> padded to the 4-bucket, one pipeline call
        assert pipe.batch_sizes == [4]
        assert srv.stats["padded_slots"] == 1
        assert srv.stats["batched_requests"] == 3
        # results are de-padded and order-preserving (fake adds the batch idx)
        for i, o in enumerate(outs):
            np.testing.assert_array_equal(o, i)
        # per-request seeds -> distinct initial latents within the batch
        lat = pipe.latents_seen[0]
        assert not np.array_equal(lat[0], lat[1])
        # padded slot replicates the last real request's latents
        np.testing.assert_array_equal(lat[2], lat[3])
    finally:
        srv.stop()


def test_mixed_geometries_run_in_separate_batches():
    pipe = FakePipeline()
    srv = EditServer(pipe, ServerConfig(max_batch=4, max_wait_ms=100))
    i8, p = _req(pipe.config, 8, 8)
    i16, _ = _req(pipe.config, 16, 16)
    f1 = srv.submit(i8, p, seed=0)
    f2 = srv.submit(i16, p, seed=0)
    srv.start()
    try:
        assert f1.result(timeout=30).shape == (3, 8, 8)
        assert f2.result(timeout=30).shape == (3, 16, 16)
        assert sorted(pipe.batch_sizes) == [1, 1]
        assert srv.stats["batches"] == 2
    finally:
        srv.stop()


def test_queue_full_rejects_cleanly():
    pipe = FakePipeline()
    srv = EditServer(pipe, ServerConfig(max_queue=2))  # batcher NOT started
    image, prompt = _req(pipe.config)
    srv.submit(image, prompt)
    srv.submit(image, prompt)
    fut = srv.submit(image, prompt)
    with pytest.raises(RuntimeError, match="queue full"):
        fut.result(timeout=5)
    assert srv.stats["rejected"] == 1


def test_guardrail_blocks_at_submit_not_in_batch():
    from chronoedit_tpu.aux.guardrails import (Blocklist, GuardrailBlocked,
                                               GuardrailRunner, Guardrails)

    pipe = FakePipeline()
    pipe.guardrails = Guardrails(text=GuardrailRunner(
        [("blocklist", Blocklist(exact_words=("forbidden",)))]))
    srv = EditServer(pipe, ServerConfig(max_wait_ms=5)).start()
    try:
        image, prompt = _req(pipe.config)
        bad = srv.submit(image, prompt, prompt="very forbidden edit")
        ok = srv.submit(image, prompt, prompt="a nice edit")
        with pytest.raises(GuardrailBlocked):
            bad.result(timeout=10)
        assert ok.result(timeout=30).shape == (3, 8, 8)
        assert srv.stats["rejected"] == 1
    finally:
        srv.stop()


def test_pipeline_error_fails_batch_not_server():
    pipe = FakePipeline()
    pipe.fail_next = True
    srv = EditServer(pipe, ServerConfig(max_wait_ms=5)).start()
    try:
        image, prompt = _req(pipe.config)
        f1 = srv.submit(image, prompt)
        with pytest.raises(RuntimeError, match="transient"):
            f1.result(timeout=10)
        # server survives and serves the next request
        f2 = srv.submit(image, prompt)
        assert f2.result(timeout=30).shape == (3, 8, 8)
        assert srv.stats["errors"] == 1
    finally:
        srv.stop()


@pytest.mark.slow  # real tiny pipeline + HTTP stack (~30 s)
def test_http_endpoint_end_to_end():
    import jax

    from chronoedit_tpu.models import dit as dit_lib
    from chronoedit_tpu.models import vae as vae_lib
    from chronoedit_tpu.pipeline import ChronoEditPipeline

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    cfg = chronoedit_tiny()
    pipe = ChronoEditPipeline(
        cfg, dit_lib.init_dit_params(jax.random.PRNGKey(0), cfg.dit),
        vae_lib.init_vae_params(jax.random.PRNGKey(1), cfg.vae))
    srv = EditServer(pipe, ServerConfig(max_batch=2, max_wait_ms=150)).start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # healthz
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert b'"pending"' in r.read()

        def post(seed):
            image = np.random.default_rng(seed).uniform(
                -1, 1, (3, 8, 8)).astype(np.float32)
            prompt = np.zeros((6, cfg.dit.text_dim), np.float32)
            buf = io.BytesIO()
            np.savez(buf, image=image, prompt_emb=prompt)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/edit?seed={seed}&frame_only=1",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                with np.load(io.BytesIO(r.read())) as z:
                    return z["edit"]

        results = {}
        threads = [threading.Thread(target=lambda s=s: results.update({s: post(s)}))
                   for s in (1, 2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert results[1].shape == (3, 8, 8)
        assert results[2].shape == (3, 8, 8)
        assert np.isfinite(results[1]).all()
        # different seeds -> different edits
        assert not np.array_equal(results[1], results[2])
        h = srv.health()
        assert h["requests"] == 2 and h["batches"] >= 1
    finally:
        httpd.shutdown()
        srv.stop()


def test_bucket_validation_rejects_uncovering_buckets():
    with pytest.raises(ValueError, match="do not cover max_batch"):
        EditServer(FakePipeline(), ServerConfig(max_batch=4, buckets=(1, 2)))


def test_stop_fails_pending_futures():
    pipe = FakePipeline()
    srv = EditServer(pipe, ServerConfig())  # batcher never started
    image, prompt = _req(pipe.config)
    fut = srv.submit(image, prompt)
    srv.stop()
    with pytest.raises(RuntimeError, match="shut down"):
        fut.result(timeout=5)
    assert srv.health()["pending"] == 0


def test_mixed_neg_lengths_never_share_a_batch():
    pipe = FakePipeline()
    srv = EditServer(pipe, ServerConfig(max_batch=4, max_wait_ms=100))
    image, prompt = _req(pipe.config)
    neg_a = np.zeros((1, 6, pipe.config.dit.text_dim), np.float32)
    neg_b = np.zeros((1, 12, pipe.config.dit.text_dim), np.float32)
    f1 = srv.submit(image, prompt, neg_prompt_emb=neg_a)
    f2 = srv.submit(image, prompt, neg_prompt_emb=neg_b)
    srv.start()
    try:
        f1.result(timeout=30)
        f2.result(timeout=30)
        # a shared batch would have thrown in np.concatenate; also check
        # the batches really were separate
        assert srv.stats["batches"] == 2
    finally:
        srv.stop()


def test_http_error_statuses():
    """400 malformed / 403 guardrail / 413 oversized via the real handler,
    no jit (fake pipeline)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from http.server import ThreadingHTTPServer

    import serve as serve_mod
    from chronoedit_tpu.aux.guardrails import (Blocklist, GuardrailRunner,
                                               Guardrails)

    pipe = FakePipeline()
    pipe.guardrails = Guardrails(text=GuardrailRunner(
        [("blocklist", Blocklist(exact_words=("forbidden",)))]))
    srv = EditServer(pipe, ServerConfig(max_wait_ms=5)).start()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_mod.make_handler(srv, max_body_mb=1))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(path, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=body, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    import urllib.error

    image, prompt = _req(pipe.config)
    buf = io.BytesIO()
    np.savez(buf, image=image, prompt_emb=prompt)
    body = buf.getvalue()
    try:
        assert post("/edit?seed=notanint", body) == 400          # bad param
        assert post("/edit", b"not an npz") == 400               # bad body
        assert post("/edit?prompt=forbidden", body) == 403       # guardrail
        assert post("/edit", b"x" * (1024 * 1024 + 1)) == 413    # oversized
        assert post("/edit?seed=1", body) == 200                 # still alive
    finally:
        httpd.shutdown()
        srv.stop()
