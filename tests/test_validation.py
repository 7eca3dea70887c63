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
