"""End-to-end pipeline tests on tiny random-init models (hermetic, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import vae as vae_mod
from flux2_tpu.pipeline.pipeline import Flux2Pipeline

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier


def tiny_pipeline(model=cfg.Flux2Model.KLEIN_4B):
    tc = cfg.Flux2TransformerConfig(
        num_layers=1,
        num_single_layers=2,
        num_attention_heads=2,
        attention_head_dim=128,
        joint_attention_dim=96,
        guidance_embeds=(model is cfg.Flux2Model.DEV),
    )
    # latent_channels must be 32 for the 128-channel patchified format and
    # 4 levels for the x8 pixel/latent scale the latent geometry assumes.
    vc = vae_mod.VAEConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=1, norm_num_groups=4
    )
    return Flux2Pipeline.from_random(
        model=model, dtype=jnp.float32, transformer_config=tc, vae_config=vc
    )


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline()


def _emb(pipe, s_txt=8, b=1, seed=3):
    return jax.random.normal(
        jax.random.PRNGKey(seed), (b, s_txt, pipe.transformer_config.joint_attention_dim)
    )


def test_t2i_end_to_end(pipe):
    res = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=2, seed=7)
    assert res.image.shape == (64, 64, 3)
    assert res.image.min() >= 0.0 and res.image.max() <= 1.0
    assert np.isfinite(res.image).all()
    assert res.num_steps == 2
    assert set(res.phase_timings) == {"text_encoding", "denoising", "vae_decoding"}


def test_t2i_seed_determinism(pipe):
    a = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=2, seed=7)
    b = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=2, seed=7)
    c = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=2, seed=8)
    np.testing.assert_array_equal(a.image, b.image)
    assert np.abs(a.image - c.image).max() > 0


def test_dimension_rounding(pipe):
    res = pipe.generate(embeddings=_emb(pipe), height=60, width=70, num_steps=1, seed=0)
    assert res.image.shape == (64, 80, 3)  # rounded up to x16


def test_i2i_with_reference(pipe):
    ref_img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    ref_lat, ref_ids = pipe.encode_reference_images([ref_img])
    assert ref_lat.shape == (1, 16, 128)
    assert ref_ids.shape == (16, 4)
    assert (ref_ids[:, 0] == 10).all()  # first reference: T=10
    res = pipe.generate(
        embeddings=_emb(pipe),
        height=64,
        width=64,
        num_steps=2,
        seed=7,
        reference_latents=ref_lat,
        reference_ids=ref_ids,
    )
    assert res.image.shape == (64, 64, 3)
    # conditioning must change the output vs plain T2I
    t2i = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=2, seed=7)
    assert np.abs(res.image - t2i.image).max() > 1e-6


def test_img2img_strength(pipe):
    init_img = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    init_seq = pipe.encode_image_to_packed_sequence(init_img)
    res = pipe.generate(
        embeddings=_emb(pipe),
        height=64,
        width=64,
        num_steps=4,
        seed=7,
        strength=0.5,
        init_latents=init_seq,
    )
    assert res.num_steps == 2  # strength 0.5 skips half the steps
    # strength ~0 keeps the init image's latents nearly intact
    res_low = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=4, seed=7,
        strength=0.01, init_latents=init_seq,
    )
    init_np = np.asarray(init_seq)
    assert np.abs(res_low.latents - init_np).mean() < np.abs(res.latents - init_np).mean()


def test_step_hook_runs_inside_scan(pipe):
    """RePaint-style hook: force the first half of tokens to a constant."""

    def hook(lat, sigma, sigma_next, step_idx):
        return lat.at[:, : lat.shape[1] // 2].set(0.0)

    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=2, seed=7, step_hook=hook
    )
    assert np.abs(res.latents[:, :8]).max() == 0.0
    assert np.abs(res.latents[:, 8:]).max() > 0.0


def test_classical_cfg_base_model():
    pipe = tiny_pipeline(model=cfg.Flux2Model.KLEIN_4B_BASE)
    neg = jax.random.normal(jax.random.PRNGKey(9), (1, 8, pipe.transformer_config.joint_attention_dim))
    res = pipe.generate(
        embeddings=_emb(pipe),
        negative_embeddings=neg,
        height=64,
        width=64,
        num_steps=2,
        guidance=3.5,
        seed=7,
    )
    assert res.image.shape == (64, 64, 3)
    # guidance scale must matter for CFG models
    res2 = pipe.generate(
        embeddings=_emb(pipe), negative_embeddings=neg,
        height=64, width=64, num_steps=2, guidance=1.0, seed=7,
    )
    assert np.abs(res.image - res2.image).max() > 1e-6


def test_custom_sigmas(pipe):
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, seed=7,
        custom_sigmas=[1.0, 0.5, 0.25],
    )
    assert res.num_steps == 3  # terminal 0.0 appended


def test_max_reference_images_enforced(pipe):
    imgs = [np.zeros((32, 32, 3), np.float32)] * (pipe.model.max_reference_images + 1)
    with pytest.raises(ValueError):
        pipe.encode_reference_images(imgs)


def test_kv_cached_i2i_path():
    """klein-9b-kv dispatches through extract+cached denoising."""
    pipe = tiny_pipeline(model=cfg.Flux2Model.KLEIN_9B_KV)
    assert pipe.model.supports_kv_cache
    ref_img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    ref_lat, ref_ids = pipe.encode_reference_images([ref_img])
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=3, seed=7,
        reference_latents=ref_lat, reference_ids=ref_ids,
    )
    assert res.image.shape == (64, 64, 3)
    assert np.isfinite(res.image).all()
    # reference conditioning must matter in the cached path too
    t2i = pipe.generate(embeddings=_emb(pipe), height=64, width=64, num_steps=3, seed=7)
    assert np.abs(res.image - t2i.image).max() > 1e-6


def test_progress_and_checkpoint_callbacks(pipe):
    progress = []
    checkpoints = []
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=4, seed=7,
        on_progress=lambda step, total: progress.append((step, total)),
        checkpoint_interval=2,
        on_checkpoint=lambda step, img: checkpoints.append((step, img.shape)),
    )
    assert progress == [(1, 4), (2, 4), (3, 4), (4, 4)]
    # checkpoint at step 2 only (step 4 is the final image, not a checkpoint)
    assert checkpoints == [(2, (64, 64, 3))]
    assert res.image.shape == (64, 64, 3)


def test_remat_policies_match(pipe):
    import flux2_tpu.models.flux2.transformer as tfm2
    from flux2_tpu.ops import latents as lu2
    from flux2_tpu.ops.rope import rope_embeddings as re2

    params = pipe.transformer_params
    config = pipe.transformer_config
    ids = np.concatenate([lu2.text_position_ids(8), lu2.image_position_ids(64, 64)], axis=0)
    cos, sin = re2(jnp.asarray(ids))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 128))
    txt = _emb(pipe)
    t = jnp.array([0.5])
    base = tfm2.forward(params, config, hidden, txt, t, cos, sin)
    for policy in (True, "block", "dots"):
        out = tfm2.forward(params, config, hidden, txt, t, cos, sin, remat=policy)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_batched_generation(pipe):
    emb = jax.random.normal(jax.random.PRNGKey(11), (3, 8, pipe.transformer_config.joint_attention_dim))
    res = pipe.generate(embeddings=emb, height=64, width=64, num_steps=2, seed=7)
    assert res.latents.shape[0] == 3
    assert res.images.shape == (3, 64, 64, 3)
    assert res.image.shape == (64, 64, 3)
    # rows differ (different conditioning per row)
    assert np.abs(res.images[0] - res.images[1]).max() > 1e-6


def test_batched_decode_matches_per_image(pipe, monkeypatch):
    """bs>1 latents past the megapixel budget decode image-by-image under
    lax.map (the dense bs=4 1024px decode RESOURCE_EXHAUSTs a 16 GiB chip);
    below it they decode as one dense conv stack. Both paths must equal
    per-image decodes of the same latents."""
    import flux2_tpu.pipeline.pipeline as pl

    lat = jax.random.normal(jax.random.PRNGKey(5), (3, 16, 128))
    singles = np.stack(
        [np.asarray(pipe.decode_latents(lat[i : i + 1], 64, 64))[0] for i in range(3)]
    )
    dense = np.asarray(pipe.decode_latents(lat, 64, 64))  # 3*64*64 << budget
    assert dense.shape == (3, 64, 64, 3)
    np.testing.assert_allclose(dense, singles, atol=1e-5)
    # force the lax.map path (fresh shape bs=2 so the jit cache can't serve
    # a program traced under the default budget)
    monkeypatch.setattr(pl, "_DECODE_MAP_BUDGET_PIXELS", 0)
    mapped = np.asarray(pipe.decode_latents(lat[:2], 64, 64))
    np.testing.assert_allclose(mapped, singles[:2], atol=1e-5)


def test_kv_cached_path_supports_step_hooks():
    """Chains (RePaint) work on klein-9b-kv too: hook runs inside both the
    extract step and the cached scan."""
    pipe = tiny_pipeline(model=cfg.Flux2Model.KLEIN_9B_KV)
    ref_img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    ref_lat, ref_ids = pipe.encode_reference_images([ref_img])

    def hook(lat, sigma, sigma_next, step_idx):
        return lat.at[:, :4].set(0.0)

    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=3, seed=7,
        reference_latents=ref_lat, reference_ids=ref_ids, step_hook=hook,
    )
    assert np.abs(res.latents[:, :4]).max() == 0.0
    assert np.abs(res.latents[:, 4:]).max() > 0.0


def test_kv_cached_path_progress_and_checkpoints():
    """Feature parity of the klein-9b-kv scan with the standard path:
    progress callbacks fire per step and checkpoint latents collect every
    Nth step (Weak #6 in VERDICT r1)."""
    pipe = tiny_pipeline(model=cfg.Flux2Model.KLEIN_9B_KV)
    ref_img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    ref_lat, ref_ids = pipe.encode_reference_images([ref_img])
    progress = []
    checkpoints = []
    res = pipe.generate(
        embeddings=_emb(pipe), height=64, width=64, num_steps=4, seed=7,
        reference_latents=ref_lat, reference_ids=ref_ids,
        on_progress=lambda step, total: progress.append((step, total)),
        checkpoint_interval=2,
        on_checkpoint=lambda step, img: checkpoints.append((step, img.shape)),
    )
    assert progress == [(1, 4), (2, 4), (3, 4), (4, 4)]
    assert checkpoints == [(2, (64, 64, 3))]
    assert res.image.shape == (64, 64, 3)


def test_generate_cancellation():
    """A host-side cancel flag aborts the compiled denoise scan promptly
    (Flux2Pipeline.swift:1940-1942 transformer-nil guard analogue)."""
    import threading

    from flux2_tpu.pipeline.pipeline import GenerationCancelled

    pipe = tiny_pipeline()
    emb = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 96))

    cancel = threading.Event()
    seen = []

    def on_progress(step, total):
        seen.append(step)
        if step >= 2:
            cancel.set()

    with pytest.raises(GenerationCancelled):
        pipe.generate(
            embeddings=emb, height=64, width=64, num_steps=8, seed=0,
            on_progress=on_progress, cancel=cancel,
        )
    assert max(seen) < 8  # aborted mid-scan, not at the end

    # same pipeline generates fine afterwards (no poisoned state), and a
    # never-set cancel flag is a no-op
    cancel2 = threading.Event()
    res = pipe.generate(embeddings=emb, height=64, width=64, num_steps=2, seed=0, cancel=cancel2)
    assert res.image.shape == (64, 64, 3)


def test_generate_cancel_callable_form():
    """cancel also accepts a plain () -> bool."""
    from flux2_tpu.pipeline.pipeline import GenerationCancelled

    pipe = tiny_pipeline()
    emb = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 96))
    with pytest.raises(GenerationCancelled):
        pipe.generate(embeddings=emb, height=64, width=64, num_steps=4, seed=0,
                      cancel=lambda: True)


def test_repeat_generate_no_device_redispatch(pipe):
    """The per-generate host glue (RoPE table, seeded noise) must not re-hit
    the compiler or re-run eager device ops on repeat calls at one shape:
    RoPE cos/sin are memoized per position-id table (one jitted dispatch on
    first sight) and the seed rides as a traced operand of the noise program
    (new seeds, zero recompiles). On a tunneled chip every extra dispatch is
    a host round trip (docs/knowledge/decisions/jit-the-host-loop-boundary.md)."""
    from flux2_tpu.pipeline import pipeline as pl

    emb = _emb(pipe)
    pipe.generate(embeddings=emb, height=64, width=64, num_steps=2, seed=1)
    rope_compiles = pl._jit_rope._cache_size()
    noise_compiles = pl._seeded_noise_seq._cache_size()
    rope_memo = pl._rope_cache.cache_info().hits

    for seed in (2, 3, 4):
        pipe.generate(embeddings=emb, height=64, width=64, num_steps=2, seed=seed)

    assert pl._jit_rope._cache_size() == rope_compiles, "RoPE recompiled at a seen shape"
    assert pl._seeded_noise_seq._cache_size() == noise_compiles, "new seed recompiled noise"
    assert pl._rope_cache.cache_info().hits >= rope_memo + 3, "RoPE table not memoized"


def test_encode_image_uploads_u8_when_lossless(pipe, monkeypatch):
    """PIL-derived images (exact u8/255 floats) must ride the 4x-cheaper
    uint8 upload; arbitrary floats must upload unchanged; both must produce
    identical latents (axon-microbenchmarks.md transfer profile)."""
    from flux2_tpu.pipeline import pipeline as pl

    seen = []
    real = pl._encode_image_jit

    def spy(vp, vc, image, sample_posterior=False, key=None):
        seen.append(image.dtype)
        return real(vp, vc, image, sample_posterior, key)

    monkeypatch.setattr(pl, "_encode_image_jit", spy)
    u8 = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    lossless = u8.astype(np.float32) / 255.0
    arbitrary = lossless + 1e-4

    a = np.asarray(pipe.encode_image_to_packed_sequence(lossless))
    b = np.asarray(pipe.encode_image_to_packed_sequence(u8))
    pipe.encode_image_to_packed_sequence(arbitrary)

    assert [str(d) for d in seen] == ["uint8", "uint8", "float32"]
    np.testing.assert_array_equal(a, b)


def test_prompt_embedding_cache(pipe):
    """Repeat prompts and the classical-CFG "" negative must hit the
    embedding cache instead of re-running the encoder (VERDICT r4 weak #4:
    on a tunneled chip each redundant encode costs ~2 s)."""
    calls = []

    def enc(prompt):
        calls.append(prompt)
        return _emb(pipe, seed=len(calls))

    pipe.text_encoder = enc
    try:
        a = pipe.encode_prompt("a cat")
        b = pipe.encode_prompt("a cat")
        assert a is b and calls == ["a cat"]
        pipe.encode_prompt("a dog")
        assert calls == ["a cat", "a dog"]
        # LRU eviction: fill past capacity, oldest ("a cat") falls out but
        # recently-touched entries stay
        pipe.encode_prompt("a cat")  # refresh recency
        for i in range(pipe.PROMPT_CACHE_SIZE):
            pipe.encode_prompt(f"filler {i}")
        n = len(calls)
        pipe.encode_prompt(f"filler {pipe.PROMPT_CACHE_SIZE - 1}")  # most recent: hit
        assert len(calls) == n
        pipe.encode_prompt("a dog")  # evicted long ago: miss
        assert len(calls) == n + 1
        # swapping the encoder invalidates everything
        calls2 = []

        def enc2(prompt):
            calls2.append(prompt)
            return _emb(pipe, seed=99)

        pipe.text_encoder = enc2
        pipe.encode_prompt("a cat")
        assert calls2 == ["a cat"]
    finally:
        pipe.text_encoder = None


def test_cfg_negative_embedding_cached_across_generates():
    """Base-model generates re-encode the "" negative only once per
    pipeline (the reference re-encodes per call, Flux2Pipeline.swift:
    1392-1404 — a free ~2 s/call saving here)."""
    pipe = tiny_pipeline(model=cfg.Flux2Model.KLEIN_4B_BASE)
    calls = []

    def enc(prompt):
        calls.append(prompt)
        return _emb(pipe, seed=1 + len(calls))

    pipe.text_encoder = enc
    for seed in (1, 2):
        pipe.generate(prompt="a cat", height=64, width=64, num_steps=2,
                      guidance=3.5, seed=seed)
    assert calls.count("") == 1, calls
    assert calls.count("a cat") == 1, calls
