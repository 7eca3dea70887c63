"""DiT forward tests on a tiny random-init config (hermetic, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.ops import latents as lu
from flux2_tpu.ops import rope

C = cfg.TINY_TEST


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), C, dtype=jnp.float32)


def _inputs(b=1, s_txt=8, h=64, w=64):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    s_img = (h // 16) * (w // 16)
    hidden = jax.random.normal(k1, (b, s_img, 128))
    txt = jax.random.normal(k2, (b, s_txt, C.joint_attention_dim))
    ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos, sin = rope.rope_embeddings(jnp.asarray(ids))
    return hidden, txt, cos, sin


@pytest.mark.slow
def test_forward_shape(params):
    hidden, txt, cos, sin = _inputs()
    out = tfm.forward(
        params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([4.0])
    )
    assert out.shape == hidden.shape
    assert np.isfinite(np.asarray(out)).all()


def test_forward_deterministic(params):
    hidden, txt, cos, sin = _inputs()
    a = tfm.forward(params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([4.0]))
    b = tfm.forward(params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([4.0]))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timestep_changes_output(params):
    hidden, txt, cos, sin = _inputs()
    a = tfm.forward(params, C, hidden, txt, jnp.array([0.9]), cos, sin, guidance=jnp.array([4.0]))
    b = tfm.forward(params, C, hidden, txt, jnp.array([0.1]), cos, sin, guidance=jnp.array([4.0]))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_guidance_embeds_affect_output(params):
    hidden, txt, cos, sin = _inputs()
    a = tfm.forward(params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([1.0]))
    b = tfm.forward(params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([8.0]))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_no_guidance_config():
    c2 = cfg.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        joint_attention_dim=384, guidance_embeds=False,
    )
    p = tfm.init_params(jax.random.PRNGKey(2), c2, dtype=jnp.float32)
    assert "guidance_embed" not in p
    hidden, txt, cos, sin = _inputs()
    out = tfm.forward(p, c2, hidden, txt, jnp.array([0.5]), cos, sin)
    assert out.shape == hidden.shape


def test_remat_matches_plain(params):
    hidden, txt, cos, sin = _inputs()
    a = tfm.forward(params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([4.0]))
    b = tfm.forward(
        params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([4.0]), remat=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_jit_compiles(params):
    hidden, txt, cos, sin = _inputs()
    f = jax.jit(lambda p, h, t: tfm.forward(p, C, h, t, jnp.array([0.5]), cos, sin, guidance=jnp.array([4.0])))
    out = f(params, hidden, txt)
    ref = tfm.forward(params, C, hidden, txt, jnp.array([0.5]), cos, sin, guidance=jnp.array([4.0]))
    # jit changes fusion/accumulation order; allow small numeric drift.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)


def test_sinusoidal_embedding():
    emb = tfm.sinusoidal_embedding(jnp.array([0.0]), 256)
    assert emb.shape == (1, 256)
    # t=0: cos part all 1, sin part all 0 (flip_sin_to_cos=True -> [cos, sin])
    np.testing.assert_allclose(np.asarray(emb[0, :128]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 128:]), 0.0, atol=1e-6)


def test_param_counts_scale_with_config():
    p_small = tfm.init_params(jax.random.PRNGKey(0), cfg.TINY_TEST, dtype=jnp.float32)
    n = tfm.param_count(p_small)
    assert n > 0
    # Dev config has ~32e9 params; verify the formula tracks head count.
    d = cfg.FLUX2_DEV
    assert d.inner_dim == 6144
    assert d.mlp_hidden_dim == 18432
