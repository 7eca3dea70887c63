"""Qwen3.5 hybrid tower tests: delta-rule recurrence, hybrid stack, MRoPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.text_encoders import qwen35 as q35

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

CFG = q35.TINY_QWEN35


@pytest.fixture(scope="module")
def params():
    return q35.init_params(jax.random.PRNGKey(0), CFG)


def test_layer_type_pattern():
    # interval 4: layers 0,1,2 linear; 3 full; 4,5,6 linear; 7 full ...
    assert [CFG.is_linear_layer(i) for i in range(8)] == [True, True, True, False] * 2


def test_param_structure(params):
    assert "linear_attn" in params["layers"][0]
    assert "self_attn" in params["layers"][3]
    assert params["layers"][0]["linear_attn"]["conv_kernel"].shape == (4, CFG.conv_dim)
    assert params["layers"][3]["self_attn"]["q_proj"].shape == (
        CFG.hidden_size, CFG.num_attention_heads * CFG.head_dim * 2
    )


def test_forward_shapes(params):
    ids = jnp.array([[1, 2, 3, 4, 5]], jnp.int32)
    hs = q35.forward(params, CFG, ids)
    assert hs.shape == (1, 5, CFG.hidden_size)
    assert np.isfinite(np.asarray(hs)).all()
    logits = q35.forward_logits(params, CFG, ids)
    assert logits.shape == (1, 5, CFG.vocab_size)


def test_causality(params):
    """Past hidden states independent of future tokens (conv + recurrence +
    causal attention are all causal)."""
    a = q35.forward(params, CFG, jnp.array([[1, 2, 3, 4]], jnp.int32))
    b = q35.forward(params, CFG, jnp.array([[1, 2, 3, 9]], jnp.int32))
    np.testing.assert_allclose(np.asarray(a[:, :3]), np.asarray(b[:, :3]), atol=1e-5)
    assert np.abs(np.asarray(a[:, 3]) - np.asarray(b[:, 3])).max() > 1e-6


def test_delta_update_math():
    """One hand-checked step of the delta rule."""
    b, hv, dk, dv = 1, 1, 2, 2
    q = jnp.array([[[[1.0, 0.0]]]])  # [B, T=1, Hv, Dk]
    k = jnp.array([[[[0.0, 1.0]]]])
    v = jnp.array([[[[2.0, 3.0]]]])
    g = jnp.array([[[0.5]]])
    beta = jnp.array([[[1.0]]])
    s0 = jnp.ones((b, hv, dv, dk))
    y, s1 = q35.gated_delta_update(q, k, v, g, beta, s0)
    # decayed state: 0.5 everywhere; kv_mem = S k = [0.5, 0.5]
    # delta = (v - kv_mem) * 1 = [1.5, 2.5]; S += delta k^T (adds to col 1)
    expected_s = np.array([[[[0.5, 2.0], [0.5, 3.0]]]])
    np.testing.assert_allclose(np.asarray(s1), expected_s, atol=1e-6)
    # y = S q = first column
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), [0.5, 0.5], atol=1e-6)


def test_delta_update_recurrence_streaming():
    """Processing [t0..t3] at once == two chunks with carried state."""
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    b, t, hv, dk, dv = 1, 4, 2, 8, 8
    q = jax.random.normal(ks[0], (b, t, hv, dk))
    k = jax.random.normal(ks[1], (b, t, hv, dk))
    v = jax.random.normal(ks[2], (b, t, hv, dv))
    g = jax.nn.sigmoid(jax.random.normal(ks[3], (b, t, hv)))
    beta = jax.nn.sigmoid(jax.random.normal(ks[4], (b, t, hv)))
    s0 = jnp.zeros((b, hv, dv, dk))
    y_full, s_full = q35.gated_delta_update(q, k, v, g, beta, s0)
    y1, s1 = q35.gated_delta_update(q[:, :2], k[:, :2], v[:, :2], g[:, :2], beta[:, :2], s0)
    y2, s2 = q35.gated_delta_update(q[:, 2:], k[:, 2:], v[:, 2:], g[:, 2:], beta[:, 2:], s1)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(jnp.concatenate([y1, y2], 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_full), np.asarray(s2), atol=1e-5)


def test_conv_state_streaming(params):
    """DeltaNet conv state: full pass == chunked pass with carried states."""
    lp = params["layers"][0]["linear_attn"]
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, CFG.hidden_size))
    full, _, _ = q35.gated_deltanet_forward(lp, CFG, x)
    o1, cs, rs = q35.gated_deltanet_forward(lp, CFG, x[:, :3])
    o2, _, _ = q35.gated_deltanet_forward(lp, CFG, x[:, 3:], conv_state=cs, rec_state=rs)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.concatenate([o1, o2], axis=1)), atol=1e-4
    )


def test_mrope_interleaving():
    pos = q35.text_position_ids(1, 4)
    cos, sin = q35.mrope_cos_sin(CFG, pos)
    assert cos.shape == (1, 4, CFG.rotary_dim)
    # position 0: cos 1, sin 0
    np.testing.assert_allclose(np.asarray(cos[0, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0, 0]), 0.0, atol=1e-6)
    # distinct spatial positions change the embedding
    pos2 = pos.at[1].add(5)  # shift the H axis
    cos2, _ = q35.mrope_cos_sin(CFG, pos2)
    assert np.abs(np.asarray(cos2[0, 1]) - np.asarray(cos[0, 1])).max() > 1e-6


def test_partial_rotary_passthrough():
    x = jnp.ones((1, 1, 2, CFG.head_dim))
    pos = q35.text_position_ids(1, 2)
    cos, sin = q35.mrope_cos_sin(CFG, pos)
    out = q35._apply_partial_rotary(x, cos, sin, CFG.rotary_dim)
    # dims beyond rotary_dim untouched
    np.testing.assert_array_equal(
        np.asarray(out[..., CFG.rotary_dim :]), np.asarray(x[..., CFG.rotary_dim :])
    )
    assert np.abs(np.asarray(out[0, 0, 1, : CFG.rotary_dim]) - 1.0).max() > 1e-6


def test_hybrid_cache_matches_full_forward(params):
    """Prefill + cached decode == full forward logits at every position."""
    ids = jnp.array([[1, 2, 3, 4, 5, 6]], jnp.int32)
    full = q35.forward_logits(params, CFG, ids)

    cache = q35.init_hybrid_cache(CFG, batch=1, max_len=8)
    logits_p, cache = q35.forward_cached(params, CFG, ids[:, :4], cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, 3]), atol=1e-3)

    logits_d, cache = q35.forward_cached(params, CFG, ids[:, 4:5], cache, jnp.int32(4))
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(full[:, 4]), atol=1e-3)

    logits_d2, cache = q35.forward_cached(params, CFG, ids[:, 5:6], cache, jnp.int32(5))
    np.testing.assert_allclose(np.asarray(logits_d2), np.asarray(full[:, 5]), atol=1e-3)


def test_hybrid_cache_structure(params):
    cache = q35.init_hybrid_cache(CFG, batch=1, max_len=8)
    assert "conv" in cache[0] and "rec" in cache[0]  # linear layer
    assert "k" in cache[3] and "v" in cache[3]  # full-attention layer
    assert cache[0]["conv"].shape == (1, CFG.linear_conv_kernel_dim - 1, CFG.conv_dim)


def test_chunked_delta_matches_sequential():
    """The chunk-parallel UT/WY formulation is EXACT vs the per-token scan."""
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    b, t, hv, dk, dv = 2, 37, 3, 16, 8  # odd T exercises padding
    q = jax.random.normal(ks[0], (b, t, hv, dk))
    k = jax.random.normal(ks[1], (b, t, hv, dk)) * 0.3
    v = jax.random.normal(ks[2], (b, t, hv, dv))
    g = jax.nn.sigmoid(jax.random.normal(ks[3], (b, t, hv)) - 0.5)
    beta = jax.nn.sigmoid(jax.random.normal(ks[4], (b, t, hv)))
    s0 = jax.random.normal(jax.random.PRNGKey(9), (b, hv, dv, dk)) * 0.1

    y_seq, s_seq = q35.gated_delta_update(q, k, v, g, beta, s0)
    for chunk in (8, 16, 64):
        y_chk, s_chk = q35.gated_delta_update_chunked(q, k, v, g, beta, s0, chunk_size=chunk)
        np.testing.assert_allclose(np.asarray(y_chk), np.asarray(y_seq), atol=2e-4, err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_seq), atol=2e-4, err_msg=f"chunk={chunk}")
