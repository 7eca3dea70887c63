"""Normalization primitive tests."""

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.ops import normalization as nz


def test_rms_norm_matches_definition():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64))
    w = jnp.linspace(0.5, 1.5, 64)
    out = nz.rms_norm(x, w)
    xf = np.asarray(x, np.float64)
    expected = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_layer_norm_affine_less():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32)) * 3 + 2
    out = np.asarray(nz.layer_norm(x))
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-3)


def test_modulate_and_gate_broadcast():
    x = jnp.ones((2, 3, 4))
    shift = jnp.full((2, 4), 0.5)
    scale = jnp.full((2, 4), 1.0)
    out = nz.modulate(x, shift, scale)
    np.testing.assert_allclose(np.asarray(out), 1.0 * (1 + 1.0) + 0.5)
    g = jnp.full((2, 4), 0.25)
    np.testing.assert_allclose(np.asarray(nz.gate(x, g)), 0.25)


def test_group_norm_stats():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16)) * 2 + 1
    w = jnp.ones((16,))
    b = jnp.zeros((16,))
    out = np.asarray(nz.group_norm(x, w, b, num_groups=4), np.float64)
    # per-group (spatial x channels/group) statistics normalize to ~N(0,1)
    grouped = out.reshape(1, 8, 8, 4, 4)
    np.testing.assert_allclose(grouped.mean(axis=(1, 2, 4)), 0.0, atol=1e-4)
    np.testing.assert_allclose(grouped.std(axis=(1, 2, 4)), 1.0, atol=1e-3)


def test_bf16_inputs_get_f32_statistics():
    x = (jax.random.normal(jax.random.PRNGKey(3), (1, 4, 128)) * 100).astype(jnp.bfloat16)
    out = nz.layer_norm(x)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()
