"""VLM prompt services on the pipeline: --interpret / --upsample wiring
(Flux2Pipeline.swift:1250-1404) with stub chat/vision models — the hermetic
tier for the generation-path VLM integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import tiny_pipeline


class StubFacade:
    """Records upsample calls; rewrites deterministically."""

    def __init__(self):
        self.calls = []

    def upsample_prompt(self, prompt, name, mode="upsampling_t2i", seed=0):
        self.calls.append((prompt, name, mode))
        return f"UPSAMPLED[{mode}]: {prompt}"


class StubVLM:
    def __init__(self, description="a red square on white background"):
        self.description = description
        self.images_seen = 0

    def analyze_image(self, image, prompt, seed=0):
        self.images_seen += 1
        return self.description


def make_prompt_pipeline():
    pipe = tiny_pipeline()
    seen = []

    def encoder(prompt):
        seen.append(prompt)
        return jax.random.normal(jax.random.PRNGKey(0), (1, 8, 96), jnp.float32)

    pipe.text_encoder = encoder
    pipe.text_encoder_name = "qwen3-4b"
    pipe.encoders = StubFacade()
    pipe.vlm = StubVLM()
    return pipe, seen


@pytest.mark.slow
def test_upsample_text_only():
    pipe, _ = make_prompt_pipeline()
    out = pipe.upsample_prompt("a cat")
    assert out == "UPSAMPLED[upsampling_t2i]: a cat"
    assert pipe.encoders.calls[0][1] == "qwen3-4b"


@pytest.mark.slow
def test_upsample_with_images_composes_reference_template():
    pipe, _ = make_prompt_pipeline()
    imgs = [np.zeros((32, 32, 3), np.float32)] * 2
    out = pipe.upsample_prompt("merge these", images=imgs)
    assert pipe.vlm.images_seen == 2
    inner = pipe.encoders.calls[0][0]
    assert inner.startswith("Reference images context:")
    assert "Image 1: a red square" in inner
    assert "Image 2: a red square" in inner
    assert "User request: merge these" in inner
    assert "combines elements from the reference images" in inner
    assert out.startswith("UPSAMPLED[upsampling_t2i]:")


def test_interpret_images_composition():
    pipe, _ = make_prompt_pipeline()
    out = pipe.interpret_images([np.zeros((32, 32, 3), np.float32)], "make it blue")
    assert out.startswith("Interpret image 1: a red square")
    assert out.endswith("User request: make it blue")


def test_interpret_without_vlm_raises():
    pipe, _ = make_prompt_pipeline()
    pipe.vlm = None
    with pytest.raises(ValueError, match="VLM"):
        pipe.interpret_images([np.zeros((32, 32, 3), np.float32)], "x")


def test_vlm_loader_is_lazy():
    pipe, _ = make_prompt_pipeline()
    pipe.vlm = None
    loads = []

    def loader():
        loads.append(1)
        return StubVLM("lazy")

    pipe.vlm_loader = loader
    out = pipe.interpret_images([np.zeros((32, 32, 3), np.float32)], "x")
    assert "lazy" in out and loads == [1]
    pipe.interpret_images([np.zeros((32, 32, 3), np.float32)], "x")
    assert loads == [1]  # cached after first load


@pytest.mark.slow
def test_generate_upsample_encodes_rewritten_prompt():
    pipe, seen = make_prompt_pipeline()
    res = pipe.generate(prompt="a cat", height=64, width=64, num_steps=1, seed=0, upsample=True)
    assert res.was_upsampled
    assert res.final_prompt == "UPSAMPLED[upsampling_t2i]: a cat"
    assert seen == [res.final_prompt]  # the encoder saw the rewritten prompt
    assert res.image.shape == (64, 64, 3)


def test_generate_interpret_then_upsample_composes_in_order():
    pipe, seen = make_prompt_pipeline()
    img = np.zeros((32, 32, 3), np.float32)
    res = pipe.generate(
        prompt="a cat", height=64, width=64, num_steps=1, seed=0,
        upsample=True, interpret_images=[img],
    )
    # interpret enriches first, then upsample rewrites the enriched prompt
    assert res.final_prompt.startswith("UPSAMPLED[upsampling_t2i]: Interpret image 1:")
    assert "User request: a cat" in res.final_prompt


def test_generate_with_embeddings_skips_prompt_services():
    pipe, seen = make_prompt_pipeline()
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 96), jnp.float32)
    res = pipe.generate(prompt="a cat", embeddings=emb, height=64, width=64, num_steps=1, upsample=True)
    assert not res.was_upsampled and seen == [] and pipe.encoders.calls == []
