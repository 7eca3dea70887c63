"""Qwen3.5 vision tower + VLM merge tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.text_encoders import qwen35_vision as qv

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

CFG = qv.TINY_VISION


@pytest.fixture(scope="module")
def params():
    return qv.init_params(jax.random.PRNGKey(0), CFG)


def test_smart_resize():
    assert qv.smart_resize(1000, 1000) == (992, 992)  # nearest x32
    h, w = qv.smart_resize(4000, 2000, max_side=1280)
    assert max(h, w) <= 1280 + 16 and h % 32 == 0 and w % 32 == 0
    h2, w2 = qv.smart_resize(100, 100, min_side=256)
    assert min(h2, w2) >= 256 - 16


def test_preprocess_normalization():
    img = np.full((64, 64, 3), 0.75, np.float32)
    out = qv.preprocess_image(img, CFG, max_side=128)
    assert out.shape[0] % 32 == 0
    np.testing.assert_allclose(out, 0.5, atol=1e-5)  # (0.75-0.5)/0.5


def test_encode_shapes(params):
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = qv.encode_image(params, CFG, pixels)
    # 64/16=4 grid -> 16 patches -> /4 merge -> 4 tokens
    assert out.shape == (1, 4, CFG.out_hidden_size)
    assert np.isfinite(np.asarray(out)).all()
    assert qv.num_output_tokens(CFG, 64, 64) == 4


def test_patchify_merge_order():
    """Consecutive groups of 4 patches must be 2x2 spatial blocks."""
    # pixels labeled by patch coordinates
    p = CFG.patch_size
    img = np.zeros((1, 4 * p, 4 * p, 3), np.float32)
    for gy in range(4):
        for gx in range(4):
            img[0, gy * p : (gy + 1) * p, gx * p : (gx + 1) * p] = gy * 10 + gx
    patches = qv._patchify(jnp.asarray(img), CFG)
    vals = np.asarray(patches)[0, :, 0]  # first feature identifies the patch
    # merge order: block (0,0) -> patches (0,0),(0,1),(1,0),(1,1)
    np.testing.assert_array_equal(vals[:4], [0, 1, 10, 11])
    np.testing.assert_array_equal(vals[4:8], [2, 3, 12, 13])


def test_pos_embed_interpolation_identity(params):
    """Interpolating to the native grid returns the grid itself (merge-reordered)."""
    n = int(np.sqrt(CFG.num_position_embeddings))  # 4
    out = qv._interp_pos_embed(params["pos_embed"], n, n, CFG.spatial_merge_size)
    assert out.shape == (n * n, CFG.hidden_size)
    grid = np.asarray(params["pos_embed"]).reshape(n, n, -1)
    np.testing.assert_allclose(np.asarray(out[0]), grid[0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), grid[0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), grid[1, 0], atol=1e-6)


def test_vision_rotary_norm_preserving():
    freqs = qv._rotary_2d(CFG, 4, 4, 2)
    assert freqs.shape == (16, CFG.head_dim // 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 2, CFG.head_dim))
    out = qv._apply_vision_rotary(x, freqs)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_merge_image_embeddings():
    h = 8
    text = jnp.zeros((1, 6, h))
    ids = jnp.array([[5, 99, 99, 7, 99, 8]], jnp.int32)  # 99 = image token
    img = jnp.arange(3 * h, dtype=jnp.float32).reshape(1, 3, h) + 1.0
    merged = qv.merge_image_embeddings(text, ids, img, image_token_id=99)
    out = np.asarray(merged)
    np.testing.assert_array_equal(out[0, 0], 0.0)  # text kept
    np.testing.assert_array_equal(out[0, 1], np.asarray(img[0, 0]))  # 1st image token
    np.testing.assert_array_equal(out[0, 2], np.asarray(img[0, 1]))
    np.testing.assert_array_equal(out[0, 4], np.asarray(img[0, 2]))
    np.testing.assert_array_equal(out[0, 5], 0.0)
