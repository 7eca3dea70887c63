"""Fixed-seed golden regression (the reference's fixed-seed image-comparison
protocol — docs/examples/quantization-benchmark/README.md:81-124 — as a CI
guard): the tiny pipeline's final latents for a pinned seed must match the
stored fixture. Catches any unintended numerical change anywhere in the
scheduler / latent packing / DiT / denoise-scan path.

Regenerate (only for INTENTIONAL semantic changes — say why in the commit):
    python - <<'PY'
    import os; os.environ["JAX_PLATFORMS"] = "cpu"
    import jax; jax.config.update("jax_platforms", "cpu")
    import sys; sys.path.insert(0, "tests")
    import numpy as np
    from test_pipeline import tiny_pipeline, _emb
    pipe = tiny_pipeline()
    res = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=3, seed=1234)
    np.save("tests/goldens/tiny_t2i_latents_seed1234.npy", np.asarray(res.latents, np.float32))
    PY
"""

import os

import numpy as np

from test_pipeline import tiny_pipeline, _emb

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tiny_t2i_latents_seed1234.npy")


def test_fixed_seed_latents_match_golden():
    pipe = tiny_pipeline()
    res = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=3, seed=1234)
    expected = np.load(GOLDEN)
    got = np.asarray(res.latents, np.float32)
    assert got.shape == expected.shape
    # loose-ish tolerance: XLA version-to-version fusion drift is ~1e-6;
    # any real semantic change in the pipeline moves latents by >> 1e-3.
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=0)


GOLDEN_I2I = os.path.join(os.path.dirname(__file__), "goldens", "tiny_i2i_latents_seed1234.npy")
GOLDEN_KV = os.path.join(os.path.dirname(__file__), "goldens", "tiny_kv_latents_seed1234.npy")


def _ref_image():
    import jax

    return np.asarray(
        jax.random.uniform(jax.random.PRNGKey(11), (64, 64, 3)), np.float32
    )


def test_fixed_seed_i2i_latents_match_golden():
    """Guards the reference-image encode path + joint [txt;ref;img] denoise."""
    pipe = tiny_pipeline()
    lat, ids = pipe.encode_reference_images([_ref_image()])
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=3, seed=1234,
        reference_latents=lat, reference_ids=ids,
    )
    np.testing.assert_allclose(
        np.asarray(res.latents, np.float32), np.load(GOLDEN_I2I), atol=1e-3, rtol=0
    )


def test_fixed_seed_kv_cached_latents_match_golden():
    """Guards the KV-extract + KV-cached denoise dispatch (klein-9b-kv)."""
    from flux2_tpu.models.flux2 import config as cfg

    pipe = tiny_pipeline(model=cfg.Flux2Model.KLEIN_9B_KV)
    lat, ids = pipe.encode_reference_images([_ref_image()])
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=3, seed=1234,
        reference_latents=lat, reference_ids=ids,
    )
    np.testing.assert_allclose(
        np.asarray(res.latents, np.float32), np.load(GOLDEN_KV), atol=1e-3, rtol=0
    )


GOLDEN_CFG = os.path.join(os.path.dirname(__file__), "goldens", "tiny_cfg_latents_seed1234.npy")


def test_fixed_seed_classical_cfg_latents_match_golden():
    """Guards the base-model classical-CFG path (batched cond/uncond rows
    + guided velocity combine)."""
    from flux2_tpu.models.flux2 import config as cfg

    pipe = tiny_pipeline(model=cfg.Flux2Model.KLEIN_4B_BASE)
    res = pipe.generate(
        embeddings=_emb(pipe), negative_embeddings=_emb(pipe, seed=99),
        guidance=3.5, height=64, width=64, num_steps=3, seed=1234,
    )
    np.testing.assert_allclose(
        np.asarray(res.latents, np.float32), np.load(GOLDEN_CFG), atol=1e-3, rtol=0
    )


GOLDEN_STRENGTH = os.path.join(
    os.path.dirname(__file__), "goldens", "tiny_strength_latents_seed1234.npy"
)
GOLDEN_SIGMAS = os.path.join(
    os.path.dirname(__file__), "goldens", "tiny_customsigmas_latents_seed1234.npy"
)


def test_fixed_seed_strength_latents_match_golden():
    """Guards img2img: noised init latents + sliced schedule (strength)."""
    import jax

    pipe = tiny_pipeline()
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(21), (64, 64, 3)), np.float32)
    init = pipe.encode_image_to_packed_sequence(img)
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=4, seed=1234,
        init_latents=init, strength=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(res.latents, np.float32), np.load(GOLDEN_STRENGTH), atol=1e-3, rtol=0
    )


def test_fixed_seed_custom_sigmas_latents_match_golden():
    """Guards custom-sigma schedules (the Turbo-LoRA override path)."""
    pipe = tiny_pipeline()
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64,
        custom_sigmas=[1.0, 0.6, 0.2], seed=1234,
    )
    assert res.num_steps == 3
    np.testing.assert_allclose(
        np.asarray(res.latents, np.float32), np.load(GOLDEN_SIGMAS), atol=1e-3, rtol=0
    )
