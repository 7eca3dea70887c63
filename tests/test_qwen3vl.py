"""Qwen3-VL MRoPE tower tests (per-section ladders, interleaved rotation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.text_encoders import config as tc
from flux2_tpu.models.text_encoders import decoder as dec
from flux2_tpu.models.text_encoders import qwen3vl as vl

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

CFG = tc.TINY_DECODER  # head_dim 16
SECTION = (4, 2, 2)  # 2*(4+2+2) = 16 = head_dim


@pytest.fixture(scope="module")
def params():
    return dec.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_text_only_position_ids():
    pos = vl.text_only_position_ids(4, offset=2)
    np.testing.assert_array_equal(np.asarray(pos[0]), [2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(pos[1]), 0)
    np.testing.assert_array_equal(np.asarray(pos[2]), 0)


def test_mrope_structure():
    pos = vl.text_only_position_ids(4)
    cos, sin = vl.mrope_cos_sin(pos, head_dim=16, theta=1e6, section=SECTION)
    assert cos.shape == (4, 16)
    c, s = np.asarray(cos), np.asarray(sin)
    # position 0: identity everywhere
    np.testing.assert_allclose(c[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[0], 0.0, atol=1e-6)
    # spatial sections (dims 8:16) see position 0 -> no rotation at ANY token
    np.testing.assert_allclose(c[:, 8:], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[:, 8:], 0.0, atol=1e-6)
    # temporal section rotates; pairs repeat-interleaved
    assert np.abs(s[1, :8]).max() > 0.1
    np.testing.assert_allclose(c[2, 0::2][:4], c[2, 1::2][:4], atol=1e-7)
    # per-section ladder: first temporal freq is theta^0 = 1 -> angle = t
    np.testing.assert_allclose(s[1, 0], np.sin(1.0), atol=1e-6)


def test_spatial_axes_change_spatial_slots_only():
    pos = vl.text_only_position_ids(4)
    pos_h = pos.at[1].add(7)
    c0, _ = vl.mrope_cos_sin(pos, 16, 1e6, section=SECTION)
    c1, _ = vl.mrope_cos_sin(pos_h, 16, 1e6, section=SECTION)
    d = np.abs(np.asarray(c0) - np.asarray(c1))
    np.testing.assert_allclose(d[:, :8], 0.0, atol=1e-7)  # temporal unchanged
    assert d[:, 8:12].max() > 1e-6  # height section changed
    np.testing.assert_allclose(d[:, 12:], 0.0, atol=1e-7)  # width unchanged


def test_forward_and_extraction(params):
    ids = jnp.array([[1, 2, 3, 4, 5]], jnp.int32)
    mask = jnp.ones_like(ids)
    hs = vl.forward_hidden_states(params, CFG, ids, mask, section=SECTION)
    assert hs.shape == (CFG.num_hidden_layers + 1, 1, 5, CFG.hidden_size)
    assert np.isfinite(np.asarray(hs)).all()
    emb = vl.extract_klein_vl_embeddings(params, CFG, ids, mask, layer_indices=(1, 2, 3), section=SECTION)
    assert emb.shape == (1, 5, 3 * CFG.hidden_size)


def test_causality(params):
    ids_a = jnp.array([[1, 2, 3, 4]], jnp.int32)
    ids_b = jnp.array([[1, 2, 3, 9]], jnp.int32)
    mask = jnp.ones_like(ids_a)
    a = vl.forward_hidden_states(params, CFG, ids_a, mask, section=SECTION)
    b = vl.forward_hidden_states(params, CFG, ids_b, mask, section=SECTION)
    np.testing.assert_allclose(np.asarray(a[:, :, :3]), np.asarray(b[:, :, :3]), atol=1e-5)
