"""KV-cached I2I path tests (klein-9b-kv parity).

Key invariant: at the same (latents, timestep), the cached forward fed with
the cache produced by the extraction pass must EXACTLY reproduce the
extraction pass's velocity — within a layer, reference K/V never feed back
into txt/img computations, so freezing them is lossless for that step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.ops import latents as lu
from flux2_tpu.ops.rope import rope_embeddings

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

CONFIG = cfg.Flux2TransformerConfig(
    num_layers=2, num_single_layers=2, num_attention_heads=2,
    attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
)


@pytest.fixture(scope="module")
def setup():
    params = tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)
    h = w = 64
    s_txt, s_img, s_ref = 4, 16, 8
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, s_img, 128))
    ref = jax.random.normal(jax.random.PRNGKey(2), (1, s_ref, 128))
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, s_txt, 96))
    ref_ids = lu.reference_image_position_ids([2], [4])
    ids_full = np.concatenate(
        [lu.text_position_ids(s_txt), ref_ids, lu.image_position_ids(h, w)], axis=0
    )
    ids_cached = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos_f, sin_f = rope_embeddings(jnp.asarray(ids_full))
    cos_c, sin_c = rope_embeddings(jnp.asarray(ids_cached))
    return params, hidden, ref, txt, (cos_f, sin_f), (cos_c, sin_c)


def test_extract_shapes(setup):
    params, hidden, ref, txt, (cos_f, sin_f), _ = setup
    t = jnp.array([0.9])
    v, dkv, skv = tfm.forward_kv_extract(params, CONFIG, hidden, ref, txt, t, cos_f, sin_f)
    assert v.shape == hidden.shape
    assert dkv[0].shape == (CONFIG.num_layers, 1, 2, ref.shape[1], 128)
    assert skv[0].shape == (CONFIG.num_single_layers, 1, 2, ref.shape[1], 128)
    assert np.isfinite(np.asarray(v)).all()


def test_cached_matches_extract_velocity(setup):
    params, hidden, ref, txt, (cos_f, sin_f), (cos_c, sin_c) = setup
    t = jnp.array([0.9])
    v_extract, dkv, skv = tfm.forward_kv_extract(params, CONFIG, hidden, ref, txt, t, cos_f, sin_f)
    v_cached = tfm.forward_kv_cached(params, CONFIG, hidden, txt, t, cos_c, sin_c, dkv, skv)
    np.testing.assert_allclose(np.asarray(v_cached), np.asarray(v_extract), atol=2e-4)


def test_cache_carries_reference_information(setup):
    """Different references must produce different cached-path outputs."""
    params, hidden, ref, txt, (cos_f, sin_f), (cos_c, sin_c) = setup
    t = jnp.array([0.9])
    _, dkv1, skv1 = tfm.forward_kv_extract(params, CONFIG, hidden, ref, txt, t, cos_f, sin_f)
    ref2 = ref + 1.0
    _, dkv2, skv2 = tfm.forward_kv_extract(params, CONFIG, hidden, ref2, txt, t, cos_f, sin_f)
    out1 = tfm.forward_kv_cached(params, CONFIG, hidden, txt, t, cos_c, sin_c, dkv1, skv1)
    out2 = tfm.forward_kv_cached(params, CONFIG, hidden, txt, t, cos_c, sin_c, dkv2, skv2)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-5


def test_extraction_mask_blocks_ref_from_output(setup):
    """Ref K/V must be independent of the noisy output latents."""
    params, hidden, ref, txt, (cos_f, sin_f), _ = setup
    t = jnp.array([0.9])
    _, dkv1, skv1 = tfm.forward_kv_extract(params, CONFIG, hidden, ref, txt, t, cos_f, sin_f)
    hidden2 = hidden * 2.0 + 1.0
    _, dkv2, skv2 = tfm.forward_kv_extract(params, CONFIG, hidden2, ref, txt, t, cos_f, sin_f)
    # Double-stream ref K/V: txt stream DOES see img, so later-layer ref K/V
    # may shift through txt — but layer 0's ref K/V depend only on ref
    # embeddings and must be identical.
    np.testing.assert_allclose(
        np.asarray(dkv1[0][0]), np.asarray(dkv2[0][0]), atol=1e-5
    )
