"""4D RoPE parity tests (Flux2RoPE.swift:123-241 semantics)."""

import jax.numpy as jnp
import numpy as np

from flux2_tpu.ops import latents as lu
from flux2_tpu.ops import rope


def test_rope_shapes_and_interleaving():
    ids = jnp.asarray(lu.text_position_ids(7))
    cos, sin = rope.rope_embeddings(ids)
    assert cos.shape == (7, 128)
    assert sin.shape == (7, 128)
    # Position 0 -> all-cos 1, all-sin 0.
    np.testing.assert_allclose(np.asarray(cos[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0, atol=1e-6)
    # repeat_interleave(2): adjacent pairs within an axis are equal.
    c = np.asarray(cos[3])
    np.testing.assert_allclose(c[0::2], c[1::2], atol=1e-7)


def test_rope_axis_assignment():
    # Text ids put position only on the L axis (axis 3 -> dims 96:128);
    # the first three axes see position 0 -> cos 1, sin 0.
    ids = jnp.asarray(lu.text_position_ids(4))
    cos, sin = rope.rope_embeddings(ids)
    np.testing.assert_allclose(np.asarray(cos[:, :96]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[:, :96]), 0.0, atol=1e-6)
    assert np.abs(np.asarray(sin[1, 96:])).max() > 0.1


def test_rope_frequency_formula():
    # axis dim 32, theta 2000: inv_freq[j] = 2000 ** -(2j/32)
    ids = jnp.asarray([[0, 0, 0, 1]], dtype=jnp.int32)
    cos, sin = rope.rope_embeddings(ids)
    for j in range(16):
        expected = 2000.0 ** (-(2 * j) / 32.0)
        np.testing.assert_allclose(np.asarray(sin[0, 96 + 2 * j]), np.sin(expected), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cos[0, 96 + 2 * j]), np.cos(expected), rtol=1e-5)


def test_rotate_half_interleaved():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    r = rope.rotate_half_interleaved(x)
    np.testing.assert_allclose(np.asarray(r), [[-2.0, 1.0, -4.0, 3.0]])


def test_apply_rope_is_norm_preserving():
    ids = jnp.asarray(lu.image_position_ids(64, 64))
    cos, sin = rope.rope_embeddings(ids)
    x = jnp.ones((1, 2, ids.shape[0], 128))
    out = rope.apply_rope(x, cos, sin)
    # Rotation preserves the pairwise L2 norms.
    x2 = np.asarray(x).reshape(1, 2, -1, 64, 2)
    o2 = np.asarray(out).reshape(1, 2, -1, 64, 2)
    np.testing.assert_allclose(
        np.linalg.norm(o2, axis=-1), np.linalg.norm(x2, axis=-1), atol=1e-5
    )


def test_apply_rope_identity_at_origin():
    ids = jnp.zeros((3, 4), dtype=jnp.int32)
    cos, sin = rope.rope_embeddings(ids)
    x = jnp.arange(3 * 128, dtype=jnp.float32).reshape(1, 1, 3, 128)
    out = rope.apply_rope(x, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
