"""VLM-scored validation + evaluator tests."""

import os

import numpy as np
import pytest

from flux2_tpu.training import validation as val
from tests.test_pipeline import tiny_pipeline, _emb


def test_tracker_best_and_early_stop():
    t = val.ValidationTracker(patience=2)
    r = lambda step, s: [val.ValidationRecord(step, "p", s, s)]
    assert not t.record(100, r(100, 5.0))
    assert t.best_step == 100
    assert not t.record(200, r(200, 7.0))  # improved
    assert t.best_step == 200
    assert not t.record(300, r(300, 6.0))  # worse x1
    assert t.record(400, r(400, 6.5)) is True  # worse x2 -> early stop
    assert t.best_step == 200
    assert t.should_copy_best


@pytest.mark.slow
def test_run_validation_trigger_boundary_and_embed_cache():
    """'art' inside 'cartoon' must NOT count as the trigger being present
    (word-boundary check), and the prompt encodes ONCE per pass even with
    several images per prompt."""
    pipe = tiny_pipeline()
    cfg = val.ValidationConfig(
        prompts=("a cartoon dog",), width=64, height=64, steps=1,
        trigger_word="art", images_per_prompt=2,
    )
    seen = []

    def emb_fn(prompt):
        seen.append(prompt)
        return _emb(pipe, seed=3)

    records = val.run_validation(pipe, cfg, step=1, embeddings_fn=emb_fn)
    assert len(records) == 2
    assert seen == ["art a cartoon dog"]  # prefixed AND encoded once


@pytest.mark.slow
def test_run_validation_generates_and_scores(tmp_path):
    import jax

    pipe = tiny_pipeline()
    cfg = val.ValidationConfig(prompts=("a", "b"), width=64, height=64, steps=1)

    def emb_fn(prompt):
        return _emb(pipe, seed=abs(hash(prompt)) % 1000)

    calls = []

    def scorer(image, refs, prompt):
        calls.append(prompt)
        return (8.0, 6.0)

    records = val.run_validation(
        pipe, cfg, step=10, embeddings_fn=emb_fn, scorer=scorer, output_dir=str(tmp_path)
    )
    assert len(records) == 2
    assert all(r.scene == 8.0 and r.style == 6.0 for r in records)
    assert calls == ["a", "b"]
    assert os.path.exists(tmp_path / "val_000010_p0_0.png")
    assert records[0].combined == 14.0


def test_gap_analysis_recommendations():
    # big style gap -> style sampling, high rank
    g = val.evaluate_training_need([(8.0, 2.0)])
    assert g.recommended_timestep_sampling == "style"
    assert g.recommended_rank == 32
    # big scene gap -> content
    g2 = val.evaluate_training_need([(2.0, 8.0)])
    assert g2.recommended_timestep_sampling == "content"
    # small gaps -> balanced, small rank/steps
    g3 = val.evaluate_training_need([(9.0, 9.0)])
    assert g3.recommended_timestep_sampling == "balanced"
    assert g3.recommended_rank == 8
    assert g3.recommended_steps == 500


def test_validation_prompt_normalize():
    """ValidationPromptConfig parity (LoRATrainingConfig.swift:395-405)."""
    vp = val.ValidationPrompt.normalize("plain")
    assert vp.prompt == "plain" and vp.apply_trigger and vp.seed is None
    vp = val.ValidationPrompt.normalize(
        {"prompt": "p", "is1024": True, "seed": 7, "apply_trigger": False}
    )
    assert vp.width == 1024 and vp.height == 1024 and vp.seed == 7
    assert not vp.apply_trigger
    vp = val.ValidationPrompt.normalize({"prompt": "p", "size": 512})
    assert vp.width == 512
    vp = val.ValidationPrompt.normalize({"prompt": "p", "width": 256, "height": 128})
    assert vp.width == 256 and vp.height == 128


def test_run_validation_per_prompt_config(tmp_path):
    """Per-prompt size/seed + trigger-word application reach generate()."""
    pipe = tiny_pipeline()
    seen = []
    orig_generate = pipe.generate

    def spy(**kw):
        seen.append({k: kw.get(k) for k in ("width", "height", "seed")})
        return orig_generate(**kw)

    pipe.generate = spy
    cfg = val.ValidationConfig(
        prompts=(
            "a photo",  # plain: config size, trigger applied
            {"prompt": "b photo", "size": 32, "seed": 99, "apply_trigger": False},
        ),
        width=64, height=64, steps=1, seed=1000, trigger_word="tpz",
    )
    prompts_seen = []

    def emb_fn(prompt):
        prompts_seen.append(prompt)
        return _emb(pipe, seed=1)

    records = val.run_validation(pipe, cfg, step=5, embeddings_fn=emb_fn)
    assert prompts_seen == ["tpz a photo", "b photo"]
    assert seen[0]["width"] == 64 and seen[0]["seed"] == 1000
    assert seen[1]["width"] == 32 and seen[1]["height"] == 32 and seen[1]["seed"] == 99
    assert records[0].prompt == "tpz a photo"


def test_run_validation_reference_image_cached(tmp_path):
    """A per-prompt reference routes through the I2I path ONCE: the encode
    is reused from ref_cache on subsequent passes."""
    from PIL import Image

    pipe = tiny_pipeline()
    ref_path = str(tmp_path / "ref.png")
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(ref_path)

    calls = []
    orig = pipe.encode_reference_images

    def spy(images, **kw):
        calls.append(len(images))
        return orig(images, **kw)

    pipe.encode_reference_images = spy
    cfg = val.ValidationConfig(
        prompts=({"prompt": "p", "reference": ref_path},),
        width=64, height=64, steps=1,
    )
    cache = {}
    for step in (1, 2):
        recs = val.run_validation(
            pipe, cfg, step, embeddings_fn=lambda p: _emb(pipe, seed=1), ref_cache=cache
        )
        assert len(recs) == 1
    assert calls == [1]  # encoded once, reused from the cache


def test_tracker_seed_from_history_excludes_baseline():
    """Resume must NOT seed 'best' from the step-0 no-LoRA baseline pass: a
    high baseline would be a bar the LoRA may never clear (spurious early
    stop) and step 0 has no checkpoint dir to copy."""
    t = val.ValidationTracker(patience=3)
    t.seed_from_history([
        {"step": 0, "scene": 6.0, "style": 6.0},   # baseline — ignored
        {"step": 250, "scene": 4.0, "style": 4.0},
        {"step": 500, "scene": 5.0, "style": 4.5},
    ])
    assert t.best_step == 500
    assert t.best_score == pytest.approx(9.5)

    # only-baseline history leaves the tracker untouched
    t2 = val.ValidationTracker(patience=3)
    t2.seed_from_history([{"step": 0, "scene": 9.0, "style": 9.0}])
    assert t2.best_step is None
    assert t2.best_score == float("-inf")


@pytest.mark.slow
def test_run_validation_emb_cache_persists_across_passes():
    """A persistent emb_cache encodes each fixed prompt ONCE for the whole
    run, not once per validation pass (the prompt set is run-constant and
    the encoder is unaffected by the LoRA)."""
    pipe = tiny_pipeline()
    cfg = val.ValidationConfig(prompts=("a dog", "a cat"), width=64, height=64, steps=1)
    calls = []

    def emb_fn(prompt):
        calls.append(prompt)
        return _emb(pipe, seed=5)

    cache: dict = {}
    val.run_validation(pipe, cfg, step=1, embeddings_fn=emb_fn, emb_cache=cache)
    val.run_validation(pipe, cfg, step=2, embeddings_fn=emb_fn, emb_cache=cache)
    assert sorted(calls) == ["a cat", "a dog"]  # once per prompt across BOTH passes
