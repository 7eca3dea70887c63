"""VAE structure/shape tests on tiny random-init configs (hermetic, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.flux2 import vae

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier

TINY = vae.TINY_VAE  # 2 levels -> 2x downsample per level gap = /2 spatial


@pytest.fixture(scope="module")
def params():
    return vae.init_params(jax.random.PRNGKey(0), TINY)


def test_encode_decode_shapes(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    z = vae.encode(params, x, TINY)
    # 2 levels -> one downsample -> /2
    assert z.shape == (1, TINY.latent_channels, 16, 16)
    img = vae.decode(params, z, TINY)
    assert img.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_posterior_sampling(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    mean = vae.encode(params, x, TINY, sample_posterior=False)
    s1 = vae.encode(params, x, TINY, sample_posterior=True, key=jax.random.PRNGKey(2))
    s2 = vae.encode(params, x, TINY, sample_posterior=True, key=jax.random.PRNGKey(3))
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() > 0
    assert np.abs(np.asarray(s1) - np.asarray(mean)).max() > 0
    with pytest.raises(ValueError):
        vae.encode(params, x, TINY, sample_posterior=True)


def test_full_config_structure():
    """Standard vs small-decoder parameter layout (SmallDecoderVAETests parity)."""
    p_std = vae.init_params(jax.random.PRNGKey(0), vae.FLUX2_VAE, dtype=jnp.bfloat16)
    p_small = vae.init_params(jax.random.PRNGKey(0), vae.FLUX2_VAE_SMALL_DECODER, dtype=jnp.bfloat16)
    # Encoders identical; decoders differ in width.
    n_std_dec = sum(x.size for x in jax.tree_util.tree_leaves(p_std["decoder"]))
    n_small_dec = sum(x.size for x in jax.tree_util.tree_leaves(p_small["decoder"]))
    assert n_small_dec < n_std_dec
    n_std_enc = sum(x.size for x in jax.tree_util.tree_leaves(p_std["encoder"]))
    n_small_enc = sum(x.size for x in jax.tree_util.tree_leaves(p_small["encoder"]))
    assert n_std_enc == n_small_enc
    # decoder up blocks have layers_per_block+1 resnets
    assert len(p_std["decoder"]["up_blocks"][0]["resnets"]) == 3
    assert len(p_std["encoder"]["down_blocks"][0]["resnets"]) == 2
    # conv_out of encoder produces 2*latent_channels
    assert p_std["encoder"]["conv_out"]["kernel"].shape[-1] == 64
    assert p_std["bn"]["running_mean"].shape == (128,)


def test_tiled_decode_matches_full(params):
    z = jax.random.normal(jax.random.PRNGKey(4), (1, TINY.latent_channels, 24, 24))
    full = vae.decode(params, z, TINY)
    tiled = vae.decode_tiled(
        params, z, TINY, vae.TilingConfig(tile_size=16, tile_overlap=8, min_tile_threshold=8)
    )
    assert tiled.shape == full.shape
    assert np.isfinite(np.asarray(tiled)).all()
    # Tiled decode is not bit-identical to full decode (GroupNorm statistics
    # are per-tile — same as the reference / diffusers), but outputs must be
    # strongly correlated.
    a = np.asarray(full).ravel()
    b = np.asarray(tiled).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


def test_downsample_asymmetric_padding(params):
    # NHWC. Even input: asymmetric (0,1) pad + stride-2 VALID conv halves
    # exactly (the production case — all dims are multiples of 16).
    ds = params["encoder"]["down_blocks"][0]["downsample"]
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 8))
    assert vae._downsample_fwd(ds, x).shape[1:3] == (4, 4)
    # Odd input floors (matches torch conv arithmetic on the padded size).
    x7 = jax.random.normal(jax.random.PRNGKey(6), (1, 7, 7, 8))
    assert vae._downsample_fwd(ds, x7).shape[1:3] == (3, 3)
