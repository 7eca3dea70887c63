"""Pixtral vision tower tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.text_encoders import pixtral as px

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

CFG = px.TINY_PIXTRAL


@pytest.fixture(scope="module")
def params():
    return px.init_params(jax.random.PRNGKey(0), CFG)


def test_encode_shapes(params):
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))  # 4x4 patches
    feats = px.encode_image(params, CFG, pixels)
    assert feats.shape == (1, 16, CFG.hidden_size)
    assert np.isfinite(np.asarray(feats)).all()


def test_projector_merges_2x2(params):
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))
    out = px.encode_and_project(params, CFG, pixels)
    assert out.shape == (1, 4, CFG.text_hidden_size)  # 16 patches -> 4 merged


def test_rope_table_structure():
    table = px.pixtral_rope_table(CFG)
    side = CFG.max_patches_per_side
    assert table.shape == (side * side, CFG.head_dim)
    # position (0, 0) has zero phase everywhere
    np.testing.assert_allclose(table[0], 0.0)
    # the two halves are duplicated
    half = CFG.head_dim // 2
    np.testing.assert_allclose(table[:, :half], table[:, half:])
    # row position changes only the "h" (even-base) frequency slots
    quarter = CFG.head_dim // 4
    row1 = table[1 * side]  # (row=1, col=0)
    assert np.abs(row1[:quarter]).max() > 0  # h slots active
    np.testing.assert_allclose(row1[quarter:half], 0.0)  # w slots zero at col=0


def test_rectangular_images(params):
    pixels = jax.random.normal(jax.random.PRNGKey(2), (1, 28, 56, 3))  # 2x4 grid
    feats = px.encode_image(params, CFG, pixels)
    assert feats.shape == (1, 8, CFG.hidden_size)
    out = px.encode_and_project(params, CFG, pixels)
    assert out.shape == (1, 2, CFG.text_hidden_size)


def test_position_sensitivity(params):
    """Swapping two patches must change the features (2D RoPE encodes position)."""
    pixels = np.array(jax.random.normal(jax.random.PRNGKey(3), (1, 56, 56, 3)))
    swapped = pixels.copy()
    swapped[:, :14, :14], swapped[:, :14, 14:28] = (
        pixels[:, :14, 14:28].copy(), pixels[:, :14, :14].copy(),
    )
    a = px.encode_image(params, CFG, jnp.asarray(pixels))
    b = px.encode_image(params, CFG, jnp.asarray(swapped))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_map_pixtral_weights_from_mistral3_checkpoint():
    """map_pixtral_weights consumes a Mistral3 VLM checkpoint layout
    (vision_tower.* + multi_modal_projector.*) and produces a pytree the
    forward accepts; the merging-layer column permutation must leave the
    projector output identical to applying HF's unfold ordering."""
    from flux2_tpu.io import weight_mapping as wm

    rng = np.random.default_rng(11)
    cfg = CFG
    d, m, p = cfg.hidden_size, cfg.spatial_merge_size, cfg.patch_size

    w = {}
    w["vision_tower.patch_conv.weight"] = rng.standard_normal((d, 3, p, p)).astype(np.float32)
    w["vision_tower.ln_pre.weight"] = np.ones(d, np.float32)
    for i in range(cfg.num_hidden_layers):
        pre = f"vision_tower.transformer.layers.{i}."
        for name in ("attention.q_proj", "attention.k_proj", "attention.v_proj", "attention.o_proj"):
            w[pre + name + ".weight"] = rng.standard_normal((d, d)).astype(np.float32) * 0.05
        w[pre + "attention_norm.weight"] = np.ones(d, np.float32)
        w[pre + "ffn_norm.weight"] = np.ones(d, np.float32)
        w[pre + "feed_forward.gate_proj.weight"] = rng.standard_normal((cfg.intermediate_size, d)).astype(np.float32) * 0.05
        w[pre + "feed_forward.up_proj.weight"] = rng.standard_normal((cfg.intermediate_size, d)).astype(np.float32) * 0.05
        w[pre + "feed_forward.down_proj.weight"] = rng.standard_normal((d, cfg.intermediate_size)).astype(np.float32) * 0.05
    w["multi_modal_projector.norm.weight"] = np.ones(d, np.float32)
    w["multi_modal_projector.patch_merger.merging_layer.weight"] = rng.standard_normal((d, d * m * m)).astype(np.float32) * 0.05
    w["multi_modal_projector.linear_1.weight"] = rng.standard_normal((cfg.text_hidden_size, d)).astype(np.float32) * 0.05
    w["multi_modal_projector.linear_2.weight"] = rng.standard_normal((cfg.text_hidden_size, cfg.text_hidden_size)).astype(np.float32) * 0.05

    params = wm.map_pixtral_weights(w, cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(5), (1, 28, 28, 3))
    out = px.encode_and_project(params, cfg, pixels)
    assert out.shape == (1, 1, cfg.text_hidden_size)

    # permutation check: one merged 2x2 block, HF ordering applied by hand
    feats = np.asarray(px.encode_image(params, cfg, pixels))  # [1, 4, d]
    from flux2_tpu.ops.normalization import rms_norm

    x = np.asarray(rms_norm(jnp.asarray(feats), params["projector"]["norm"], cfg.rms_norm_eps))
    # HF unfold flattens (c, kh, kw): rows of the 2x2 grid are patches [0,1;2,3]
    hf_in = np.concatenate([x[0, [0, 1, 2, 3], c] for c in range(d)])
    hf_first = hf_in @ w["multi_modal_projector.patch_merger.merging_layer.weight"].T
    ours_in = np.concatenate([x[0, i] for i in (0, 1, 2, 3)])
    ours_first = ours_in @ np.asarray(params["projector"]["merge"])
    np.testing.assert_allclose(hf_first, ours_first, rtol=1e-4, atol=1e-5)


def test_strip_language_model_prefix():
    from flux2_tpu.io import weight_mapping as wm

    w = {"language_model.model.embed_tokens.weight": 1, "vision_tower.ln_pre.weight": 2}
    out = wm.strip_language_model_prefix(w)
    assert set(out) == {"model.embed_tokens.weight", "vision_tower.ln_pre.weight"}
    # idempotent on plain checkpoints
    assert wm.strip_language_model_prefix(out) == out
