"""Guardrails, config overrides, profiling/monitoring, visualization, data
loader tests."""

import dataclasses
import os

import numpy as np
import pytest

from chronoedit_tpu.aux.guardrails import (
    Blocklist, FaceBlur, FrameSafetyClassifier, GuardrailBlocked,
    GuardrailRunner, text_guardrail, video_guardrail,
)
from chronoedit_tpu.configs import chronoedit_tiny
from chronoedit_tpu.data.loaders import CachedReplayLoader, JointLoader, PrefetchLoader
from chronoedit_tpu.utils.config import apply_overrides, config_to_dict
from chronoedit_tpu.utils.profiling import SectionTimer, StepTimeMonitor


# ---------------------------------------------------------------- guardrails

def test_blocklist_normalization_and_matching():
    bl = Blocklist(exact_words=("forbidden",), partial_phrases=("very bad thing",))
    assert bl("a nice prompt")[0]
    ok, reason = bl("a F0rb1dden word")  # leet-speak normalized
    assert not ok and "forbidden" in reason
    assert not bl("this is a VERY  bad   thing indeed")[0]


def test_text_guardrail_runner():
    runner = text_guardrail()
    runner.run_text("make the cat wear a hat")  # passes
    runner2 = GuardrailRunner([("bl", Blocklist(exact_words=("nope",)))])
    with pytest.raises(GuardrailBlocked):
        runner2.run_text("nope")


def test_video_guardrail_classifier_and_blur():
    frames = np.full((2, 32, 32, 3), 128, np.uint8)
    runner = video_guardrail(classify_fn=lambda f: True,
                             face_detect_fn=lambda f: [(4, 4, 20, 20)])
    out = runner.run_video(frames)
    assert out.shape == frames.shape
    # blocked when classifier rejects
    runner_bad = video_guardrail(classify_fn=lambda f: False)
    with pytest.raises(GuardrailBlocked):
        runner_bad.run_video(frames)


def test_face_blur_pixelates():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    blur = FaceBlur(lambda f: [(0, 0, 32, 32)], block=8)
    out = blur(frames)
    # pixelated region has 8x8 constant blocks
    region = out[0, :32, :32]
    assert np.all(region[:8, :8] == region[0, 0])
    # untouched region unchanged
    np.testing.assert_array_equal(out[0, 32:, 32:], frames[0, 32:, 32:])


# ---------------------------------------------------------------- config

def test_apply_overrides_nested():
    cfg = chronoedit_tiny()
    out = apply_overrides(cfg, ["dit.num_layers=7", "guidance_scale=3.5",
                                "vae.dim=12"])
    assert out.dit.num_layers == 7
    assert out.guidance_scale == 3.5
    assert out.vae.dim == 12
    assert cfg.dit.num_layers == 2  # original untouched


def test_apply_overrides_errors():
    cfg = chronoedit_tiny()
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["dit.nope=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no_equals_sign"])


def test_config_to_dict():
    d = config_to_dict(chronoedit_tiny())
    assert d["dit"]["num_layers"] == 2
    assert isinstance(d["vae"]["dim_mult"], tuple)


# ---------------------------------------------------------------- profiling

def test_section_timer():
    t = SectionTimer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["a"]["total_s"] >= 0


def test_step_time_monitor_flags_stragglers():
    mon = StepTimeMonitor(threshold=1.5, max_consecutive=3)
    for _ in range(10):
        assert not mon.record(1.0)
    assert mon.record(10.0)  # outlier
    mon.record(10.0)
    assert not mon.should_raise
    mon.record(10.0)
    assert mon.should_raise
    assert mon.report()["max_s"] == 10.0


# ---------------------------------------------------------------- loaders

def test_prefetch_loader_order_and_errors():
    assert list(PrefetchLoader(range(5))) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("upstream died")

    it = iter(PrefetchLoader(boom()))
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_joint_loader_ratio():
    jl = JointLoader({"img": (iter(range(100)), 2),
                      "vid": (iter(range(100, 200)), 1)})
    names = [name for name, _ in zip((n for n, _ in iter(jl)), range(6))]
    assert names == ["img", "img", "vid", "img", "img", "vid"]


def test_cached_replay_loader():
    out = []
    for i, batch in zip(range(4), CachedReplayLoader(iter([10, 20]), replays=2,
                                                     augment=lambda b, i: b + i)):
        out.append(batch)
    assert out == [10, 11, 20, 21]


# ---------------------------------------------------------------- visualize

def test_save_img_or_video(tmp_path):
    pytest.importorskip("PIL")
    from chronoedit_tpu.utils.visualize import save_img_or_video, to_uint8

    img = np.zeros((3, 8, 8), np.float32)
    path = str(tmp_path / "frame.png")
    save_img_or_video(path, img)
    assert os.path.exists(path)
    assert to_uint8(img).shape == (8, 8, 3)
    assert to_uint8(np.zeros((3, 2, 4, 4)))[0, 0, 0, 0] == 127


def test_straggler_detector_flags_and_raises():
    import numpy as np
    import pytest

    from chronoedit_tpu.train.callbacks import StragglerDetector

    logs = []
    # this host is 2x slower than the other three
    det = StragglerDetector(every_n=1, rel_threshold=1.5, max_consecutive=3,
                            gather_fn=lambda v: np.asarray([v, v/2, v/2, v/2]),
                            log_fn=logs.append)
    import time as _t

    def run_step(step):
        det.on_step_start(None, step)
        _t.sleep(0.002)
        det.on_step_end(None, step, {})

    run_step(1)
    run_step(2)
    assert len(logs) == 2 and "straggler" in logs[0]
    with pytest.raises(RuntimeError, match="persistent straggler"):
        run_step(3)

    # healthy fleet never accumulates
    det2 = StragglerDetector(every_n=1, max_consecutive=2,
                             gather_fn=lambda v: np.asarray([v, v, v]),
                             log_fn=logs.append)
    for s in range(1, 6):
        det2.on_step_start(None, s)
        det2.on_step_end(None, s, {})
    assert det2._consecutive == 0

    # single process: trivially inert
    det3 = StragglerDetector(every_n=1, gather_fn=lambda v: np.asarray([v]))
    det3.on_step_start(None, 1)
    det3.on_step_end(None, 1, {})


@pytest.mark.slow
def test_llm_text_guard_with_real_tiny_model():
    """LLMTextGuard drives a *real* HF causal LM (randomly initialized tiny
    GPT-2, no download) end-to-end: chat template -> generate -> verdict
    parse; marker-based blocking verified with a stubbed decode."""
    import pytest

    transformers = pytest.importorskip("transformers")
    from chronoedit_tpu.aux.guardrails import GuardrailBlocked, GuardrailRunner, LLMTextGuard

    cfg = transformers.GPT2Config(vocab_size=64, n_positions=64, n_embd=16,
                                  n_layer=1, n_head=2)
    model = transformers.GPT2LMHeadModel(cfg).eval()

    class TinyTok:
        """Minimal chat-template tokenizer over a fixed vocab."""

        def apply_chat_template(self, msgs, tokenize=False,
                                add_generation_prompt=True):
            return " ".join(m["content"] for m in msgs) + " ->"

        def __call__(self, text, return_tensors="pt"):
            import torch

            ids = torch.tensor([[ord(c) % 64 for c in text[:16]]])
            return {"input_ids": ids, "attention_mask": torch.ones_like(ids)}

        def decode(self, ids, skip_special_tokens=True):
            return self._reply

        _reply = "Safe"

    tok = TinyTok()
    guard = LLMTextGuard(tokenizer=tok, model=model)
    ok, _ = guard("a nice picture of a cat")
    assert ok is True  # random model's reply decoded as "Safe"

    tok._reply = "UNSAFE: category S1"
    blocked, detail = guard("bad prompt")
    assert blocked is False and "unsafe" in detail

    runner = GuardrailRunner([("llm_guard", guard)])
    with pytest.raises(GuardrailBlocked):
        runner.run_text("anything")


def test_webdataset_streams_remote_shards(tmp_path):
    """Tar shards addressed by URI stream through easy_io (fake S3)."""
    import io
    import tarfile

    from chronoedit_tpu.data.webdataset import WebDataset
    from chronoedit_tpu.utils import easy_io
    from tests.test_easy_io_callbacks import _FakeS3Client

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in range(3):
            data = f'{{"idx": {i}}}'.encode()
            info = tarfile.TarInfo(f"s{i:04d}.json")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    easy_io.set_s3_client(_FakeS3Client())
    try:
        easy_io.put("s3://bkt/shards/000000.tar", buf.getvalue())
        ds = WebDataset(["s3://bkt/shards/000000.tar"], shuffle_size=1)
        got = [s["json"]["idx"] for _, s in zip(range(3), iter(ds))]
        assert got == [0, 1, 2]
    finally:
        easy_io.set_s3_client(None)


def test_guardrails_async_video_check():
    import numpy as np

    from chronoedit_tpu.aux.guardrails import Guardrails, video_guardrail

    seen = []

    def classify(frames):
        seen.append(frames.shape)
        return True  # safe

    g = Guardrails(video=video_guardrail(classify_fn=classify))
    video = np.random.uniform(-1, 1, (1, 3, 2, 8, 8)).astype(np.float32)
    fut = g.check_video_async(video)
    out = fut.result(timeout=30)
    assert np.asarray(out).shape == video.shape
    assert seen and seen[0] == (2, 8, 8, 3)


def test_param_stats_callback():
    import jax.numpy as jnp

    from chronoedit_tpu.train.callbacks import ParamStatsCallback

    class FakeState:
        params = {"a": {"w": jnp.ones((3,))}, "b": {"w": jnp.full((4,), 2.0)}}

    class FakeTrainer:
        _last_state = FakeState()

    logs = []
    cb = ParamStatsCallback(every_n=2, log_fn=logs.append)
    cb.on_step_end(FakeTrainer(), 1, {})
    assert not logs
    cb.on_step_end(FakeTrainer(), 2, {})
    assert logs and "a=" in logs[0] and "b=" in logs[0]
    import math

    expected = math.sqrt(3 * 1 + 4 * 4)
    assert f"{expected:.3e}"[:5] in logs[0]


# ------------------------------------------------------------- qwen3guard

def test_qwen3guard_verdict_parser():
    from chronoedit_tpu.aux.guardrails import parse_qwen3guard_verdict

    label, cats = parse_qwen3guard_verdict("Safety: Safe")
    assert label == "Safe" and cats == []

    label, cats = parse_qwen3guard_verdict(
        "Analysis...\nSafety: Unsafe\nCategories: Violent, Jailbreak")
    assert label == "Unsafe"
    assert cats == ["Violent", "Jailbreak"]

    label, cats = parse_qwen3guard_verdict(
        "Safety: Controversial\nCategories: Sexual Content or Sexual Acts")
    assert label == "Controversial"
    assert cats == ["Sexual Content or Sexual Acts"]

    # malformed generation -> (None, []) and the guard fails open
    label, cats = parse_qwen3guard_verdict("gibberish with no verdict")
    assert label is None and cats == []


class _FakeTok:
    """Canned tokenizer on the HF chat-template/generate surface."""

    def apply_chat_template(self, msgs, tokenize=False, **kw):
        assert msgs[0]["role"] == "user"
        return "<chat>" + msgs[0]["content"]

    def __call__(self, texts, return_tensors=None):
        return {"input_ids": np.zeros((1, 4), np.int64)}

    def decode(self, ids, skip_special_tokens=True):
        return self.reply  # set per-test


class _FakeModel:
    def generate(self, input_ids=None, max_new_tokens=None, **kw):
        assert max_new_tokens == 128  # the Qwen3Guard protocol's budget
        return np.zeros((1, input_ids.shape[1] + 8), np.int64)


@pytest.mark.parametrize("reply,expect_safe", [
    ("Safety: Safe", True),
    ("Safety: Controversial\nCategories: Unethical Acts", True),  # passes!
    ("Safety: Unsafe\nCategories: Violent", False),
    ("no verdict at all", True),  # fail open, reference parity
])
def test_qwen3guard_blocking_semantics(reply, expect_safe):
    from chronoedit_tpu.aux.guardrails import Qwen3Guard

    tok = _FakeTok()
    tok.reply = reply
    guard = Qwen3Guard(tokenizer=tok, model=_FakeModel())
    ok, msg = guard("a prompt")
    assert ok is expect_safe
    if not ok:
        assert "Qwen3Guard" in msg and "Violent" in msg


def test_qwen3guard_fails_open_on_error():
    from chronoedit_tpu.aux.guardrails import Qwen3Guard

    class _Boom:
        def generate(self, **kw):
            raise RuntimeError("cuda? no.")

    tok = _FakeTok()
    tok.reply = ""
    ok, msg = Qwen3Guard(tokenizer=tok, model=_Boom())("x")
    assert ok and "failing open" in msg


def test_bundled_blocklist_blocks_out_of_the_box():
    """round-3: the default Blocklist ships real word lists (assets/)."""
    bl = Blocklist()
    assert len(bl.exact_words) >= 20 and len(bl.partial_phrases) >= 30
    ok, reason = bl("an innocent photo of a dog on a beach")
    assert ok
    ok, reason = bl("generate child sexual imagery")
    assert not ok
    # leet normalization feeds exact matching
    ok, _ = bl("r4pe scene")
    assert not ok


def test_blocklist_tier_semantics():
    """round-4 (VERDICT r3 #7): the exact and partial tiers must behave
    differently — exact is whole-token only, partial is substring+fuzzy."""
    bl = Blocklist(exact_words=("rape",), partial_phrases=("gang rape",),
                   whitelist=("grape", "grapes", "therapist"))
    # exact tier: whole token blocks...
    assert not bl("a rape scene")[0]
    # ...but a containing word does NOT ("grape" must never fire "rape")
    assert bl("a bowl of grapes on the table")[0]
    assert bl("she visits her therapist weekly")[0]
    # partial tier: substring match inside longer text
    assert not bl("depicting gang rape in detail")[0]
    # lemma candidates: inflected forms of an exact token still block
    assert not bl("rapes")[0]
    assert not bl("raping them")[0]


def test_blocklist_fuzzy_and_whitelist():
    bl = Blocklist(exact_words=(), partial_phrases=("mass shooting",),
                   whitelist=("suicide prevention",))
    # one-letter obfuscation still blocks via the fuzzy tier
    ok, reason = bl("a mas shooting scene")
    assert not ok and "fuzzy" in reason
    # clean text passes
    assert bl("a massive crowd cheering")[0]
    # advisor round 4: multi-word whitelist entries NO LONGER disarm the
    # exact tier (any prompt could append 'prevention' to pass); the false
    # positive is accepted, like the reference's per-token uncensor list
    bl2 = Blocklist(exact_words=("suicide",), partial_phrases=(),
                    whitelist=("suicide prevention",))
    assert not bl2("a suicide prevention awareness poster")[0]
    assert not bl2("a suicide scene")[0]
    # single-word whitelist entries still disarm per-token (reference
    # uncensor_whitelist semantics, blocklist.py:65-74)
    bl3 = Blocklist(exact_words=("rape",), partial_phrases=(),
                    whitelist=("grape",))
    assert bl3("a grape on the table")[0]


def test_bundled_blocklist_reference_scale():
    """round-4: bundled lists reach reference-scale coverage (>=200 entries
    across tiers, VERDICT r3 #7) and load with comments stripped."""
    bl = Blocklist()
    total = len(bl.exact_words) + len(bl.partial_phrases)
    assert total >= 200, f"only {total} bundled entries"
    assert len(bl.whitelist) >= 10
    assert not any(w.startswith("#") for w in
                   bl.exact_words + bl.partial_phrases + bl.whitelist)
    # spot checks per category
    assert not bl("how to make a bomb tutorial")[0]
    assert not bl("a beheading video")[0]
    assert not bl("deepfake porn of an actress")[0]
    assert not bl("thinspo poster")[0]
    # benign prompts with near-miss vocabulary pass
    assert bl("a skyscraper at sunset, rapid clouds")[0]
    assert bl("add drapes to the window and grapes to the bowl")[0]
    assert bl("a classical mass in a cathedral")[0]


def test_blocklist_benign_prompts_pass():
    """round-4 review regressions: fuzzy matching at the 6-char floor
    clipped everyday bigrams ('was the' ~ 'gas the', 'will all' ~
    'kill all'), lemma-stripping blocked benign compounds, and bare
    substring matching clipped longer words. All of these must pass."""
    bl = Blocklist()
    for prompt in (
        "she has the best smile",
        "the dog was the hero of the story",
        "they will all cheer at the finale",
        "a photo where nudity is not present",
        "a cookie cutter shape of a star",
        "a snuffed out candle on a cake",
        "a diagram of the gas theory of stars",
        "make the colors rapid and vivid",
    ):
        ok, reason = bl(prompt)
        assert ok, f"benign prompt blocked: {prompt!r} -> {reason}"
    # the curated harmful phrases still block
    for prompt in ("a mass shooting scene", "a snuff film poster",
                   "gang rape depiction", "child sexual imagery"):
        assert not bl(prompt)[0], f"should block: {prompt!r}"


def test_blocklist_whitelist_cannot_disarm_straddling_phrases():
    """round-4 review: whitelist phrases containing a blocked token
    ('suicide prevention') must not disarm partial phrases that STRADDLE
    the whitelist span — appending 'prevention' or prefixing 'anti '
    bypassed every suicide-related phrase."""
    bl = Blocklist()
    for prompt in (
        "suicide prevention bomb in a crowd",
        "a man wearing a suicide prevention vest packed with explosives",
        "anti suicide bomb attack on the market",
    ):
        ok, reason = bl(prompt)
        assert not ok, f"straddle bypass: {prompt!r}"


def test_blocklist_exact_tier_whitelist_append_exploit():
    """advisor round 4 (medium): the exact tier must not be disarmable by
    APPENDING a whitelist phrase — 'a man committing suicide prevention'
    returned safe while 'a man committing suicide' blocked. Multi-word
    whitelist entries no longer apply to the exact tier (per-token only,
    like the reference's uncensor_whitelist); the resulting false positive
    on benign usages is accepted, as the reference accepts it."""
    bl = Blocklist()
    for prompt in (
        "a man committing suicide",
        "a man committing suicide prevention",       # the verified exploit
        "a man committing suicide awareness poster",
        # advisor low: span clipping out of a LONGER word must not hide the
        # exact token ('suicide preventionists' -> 'ists' bypassed the tier)
        "suicide preventionists at work",
        # accepted false positives (documented exact-tier behavior)
        "a suicide prevention awareness poster",
        "an anti suicide campaign billboard",
    ):
        ok, reason = bl(prompt)
        assert not ok, f"exact-tier bypass: {prompt!r}"


def test_blocklist_possessive_forms_blocked():
    """round-4 review: the tokenizer keeps apostrophes, so possessive
    forms of exact-tier words bypassed the whole tier ("the rapist's
    knife" passed while "the rapist knife" blocked)."""
    bl = Blocklist()
    assert not bl("the rapist's knife")[0]
    assert not bl("the suicide's aftermath")[0]
    # benign possessives of near-miss words still pass ("grape's" must not
    # leak a bare "rape" token)
    ok, reason = bl("the grape's deep purple color")
    assert ok, reason


def test_blocklist_fuzzy_rejects_substitutions():
    """round-4 review: 1-char SUBSTITUTION tolerance clips benign bigrams
    ('burning olive' ~ 'burning alive', ratio 0.923 = threshold). The fuzzy
    tier now accepts only insert/delete edits — leet normalization already
    canonicalizes substitution obfuscation."""
    bl = Blocklist()
    for prompt in ("a burning olive tree in a field",
                   "a severed heap of autumn leaves"):
        ok, reason = bl(prompt)
        assert ok, f"benign prompt blocked: {prompt!r} -> {reason}"
    # insert/delete obfuscations still block via the fuzzy tier
    for prompt in ("a mas shooting scene", "a masss shooting scene"):
        ok, reason = bl(prompt)
        assert not ok and "fuzzy" in reason, (prompt, ok, reason)
    # the un-obfuscated phrases still block exactly
    assert not bl("burning alive in the fire")[0]
    assert not bl("a severed head on a pike")[0]


def test_blocklist_from_dir_no_whitelist_fallback(tmp_path):
    """from_dir must NOT inherit the bundled whitelist (it is subtractive:
    a whitelisted token can disarm a custom partial phrase)."""
    d = tmp_path / "bl"
    d.mkdir()
    (d / "exact.txt").write_text("forbiddenword\n")
    (d / "partial.txt").write_text("rapid fire contraband\n")
    bl = Blocklist.from_dir(str(d))
    assert bl.whitelist == ()
    # 'rapid' is in the BUNDLED whitelist; a custom phrase containing it
    # must still fire when the deployment ships no whitelist of its own
    assert not bl("selling rapid fire contraband here")[0]
