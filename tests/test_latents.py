"""Latent geometry round-trips and position-ID layouts (LatentUtils.swift)."""

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.ops import latents as lu


def test_validate_dimensions_rounds_to_16():
    assert lu.validate_dimensions(1000, 1024) == (1008, 1024)
    assert lu.validate_dimensions(1, 1) == (16, 16)
    assert lu.validate_dimensions(512, 512) == (512, 512)


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    x = lu.generate_patchified_latents(key, 256, 128)  # [1,128,16,8]
    assert x.shape == (1, 128, 16, 8)
    seq = lu.pack_patchified_to_sequence(x)
    assert seq.shape == (1, 128, 128)
    back = lu.unpack_sequence_to_patchified(seq, 256, 128)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patchify_unpatchify_roundtrip():
    key = jax.random.PRNGKey(1)
    vae_latents = jax.random.normal(key, (2, 32, 16, 24))  # [B,32,H/8,W/8]
    patched = lu.patchify_latents(vae_latents)
    assert patched.shape == (2, 128, 8, 12)
    back = lu.unpatchify_latents(patched)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vae_latents))


def test_patchify_channel_layout():
    # Channel c of patch pixel (dy, dx) must land at index c*4 + dy*2 + dx
    # (matching unpatchify's reshape [B, C, p, p, H, W] inverse).
    x = jnp.arange(32 * 4 * 4, dtype=jnp.float32).reshape(1, 32, 4, 4)
    p = lu.patchify_latents(x)
    up = lu.unpatchify_latents(p)
    np.testing.assert_array_equal(np.asarray(up), np.asarray(x))
    # spot-check one element: patch (0,0), channel 5, offset (1,0)
    assert p[0, 5 * 4 + 1 * 2 + 0, 0, 0] == x[0, 5, 1, 0]


def test_image_position_ids():
    ids = lu.image_position_ids(64, 32)  # 4x2 patch grid
    assert ids.shape == (8, 4)
    np.testing.assert_array_equal(ids[:, 0], 0)  # T
    np.testing.assert_array_equal(ids[:, 3], 0)  # L
    np.testing.assert_array_equal(ids[:2, 1], [0, 0])  # row-major H
    np.testing.assert_array_equal(ids[:2, 2], [0, 1])  # W fastest


def test_text_position_ids():
    ids = lu.text_position_ids(5)
    np.testing.assert_array_equal(ids[:, 3], np.arange(5))
    np.testing.assert_array_equal(ids[:, :3], 0)


def test_reference_position_ids_t_coordinates():
    ids = lu.reference_image_position_ids([2, 3], [2, 2], scale=10)
    assert ids.shape == (2 * 2 + 3 * 2, 4)
    np.testing.assert_array_equal(ids[:4, 0], 10)  # first image: T=10
    np.testing.assert_array_equal(ids[4:, 0], 20)  # second image: T=20
    np.testing.assert_array_equal(ids[:, 3], 0)


def test_batchnorm_normalize_roundtrip():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 128, 4, 4)) * 3 + 0.7
    mean = jnp.linspace(-1, 1, 128)
    var = jnp.linspace(0.5, 2.0, 128)
    n = lu.normalize_with_batchnorm(x, mean, var)
    back = lu.denormalize_with_batchnorm(n, mean, var)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_ostris_normalize_roundtrip():
    x = jnp.array([0.0, 1.0, -2.0])
    np.testing.assert_allclose(
        np.asarray(lu.denormalize_flux2_latents(lu.normalize_flux2_latents(x))),
        np.asarray(x),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(lu.normalize_flux2_latents(jnp.array([1.0]))),
        0.3611 * (1.0 - 0.1159),
        rtol=1e-6,
    )
