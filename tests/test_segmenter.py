"""Subject segmenter: model shapes, synthetic data, and the IoU gate that
the trained U-Net measurably beats the saliency heuristic on held-out
composites (VERDICT r2 next-step #8; reference: Apple Vision segmentation,
Flux2SubjectMask.swift:26)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.chains import segmenter as seg
from flux2_tpu.chains.subject_mask import saliency_foreground, subject_mask


def test_model_shapes_and_param_count():
    params = seg.init_params(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert 0.3e6 < n < 3e6  # "small trainable net", not a monster
    out = seg.forward(params, jnp.zeros((2, seg.WORK_RES, seg.WORK_RES, 3)))
    assert out.shape == (2, seg.WORK_RES, seg.WORK_RES)


def test_segmenter_arbitrary_input_size():
    model = seg.Segmenter(seg.init_params(jax.random.PRNGKey(0)))
    prob = model(np.zeros((200, 168, 3), np.float32))
    assert prob.shape == (200, 168)
    assert (prob >= 0).all() and (prob <= 1).all()


def test_synth_composite_properties():
    rng = np.random.RandomState(5)
    img, mask = seg.synth_composite(rng)
    assert img.shape == (256, 256, 3) and mask.shape == (256, 256)
    assert img.min() >= 0 and img.max() <= 1
    assert 0.01 < mask.mean() < 0.9  # a subject exists, not the whole frame
    assert set(np.unique(mask)) <= {0.0, 1.0}


def test_save_load_roundtrip(tmp_path):
    params = seg.init_params(jax.random.PRNGKey(1))
    path = str(tmp_path / "w.safetensors")
    seg.save_weights(params, path)
    from flux2_tpu.io import safetensors_io

    flat = safetensors_io.load_file(path)
    assert any(k.startswith("down1.") for k in flat)
    # rebuild through load_default's parser by pointing at the temp file
    orig = seg.WEIGHTS_FILE
    try:
        seg.WEIGHTS_FILE = path
        model = seg.load_default()
    finally:
        seg.WEIGHTS_FILE = orig
    assert model is not None
    np.testing.assert_allclose(
        np.asarray(model.params["stem"]["kernel"]), np.asarray(params["stem"]["kernel"])
    )


@pytest.mark.skipif(
    not os.path.exists(seg.WEIGHTS_FILE), reason="trained weights not committed yet"
)
def test_trained_model_beats_heuristic_iou():
    """Held-out fixtures (seeds >= 10_000 — training used 0..9999): the
    trained model's mean IoU must clearly beat the border-statistics
    heuristic, and be objectively decent."""
    model = seg.load_default()
    rng = np.random.RandomState(10_000)
    ious_model, ious_heur = [], []
    for _ in range(16):
        img, mask = seg.synth_composite(rng)
        ious_model.append(seg.iou(model(img), mask))
        ious_heur.append(seg.iou(saliency_foreground(img), mask))
    m, h = float(np.mean(ious_model)), float(np.mean(ious_heur))
    assert m > h + 0.1, f"model IoU {m:.3f} vs heuristic {h:.3f}"
    assert m > 0.6, f"model IoU {m:.3f}"


@pytest.mark.skipif(
    not os.path.exists(seg.WEIGHTS_FILE), reason="trained weights not committed yet"
)
def test_subject_mask_uses_model_by_default():
    rng = np.random.RandomState(10_001)
    img, mask = seg.synth_composite(rng)
    out = subject_mask(img, dilation_px=0, ramp_px=0, invert_for_change_scene=False)
    assert seg.iou(out, mask) > 0.5
