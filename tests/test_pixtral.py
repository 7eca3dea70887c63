"""Pixtral vision tower tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.text_encoders import pixtral as px

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
