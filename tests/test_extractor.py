"""Conditioning-recipe tests (EmbeddingExtractor.swift:196-278 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.text_encoders import config as tc
from flux2_tpu.models.text_encoders import decoder as dec
from flux2_tpu.models.text_encoders import extractor as ex


class _Tok:
    pad_token_id = 0

    def __init__(self, n_tokens=10):
        self.n = n_tokens
        self.last_messages = None

    def apply_chat_template(self, messages, add_generation_prompt=False):
        self.last_messages = (messages, add_generation_prompt)
        return list(range(1, self.n + 1))


def test_left_padding_layout():
    tok = _Tok(n_tokens=5)
    ids, mask = ex.prepare_input_ids(tok, "a cat", max_length=8)
    assert ids.shape == (1, 8) and mask.shape == (1, 8)
    np.testing.assert_array_equal(ids[0], [0, 0, 0, 1, 2, 3, 4, 5])  # LEFT pad
    np.testing.assert_array_equal(mask[0], [0, 0, 0, 1, 1, 1, 1, 1])
    # no generation prompt for embeddings
    assert tok.last_messages[1] is False


def test_truncation_to_max_length():
    tok = _Tok(n_tokens=20)
    ids, mask = ex.prepare_input_ids(tok, "long", max_length=8)
    np.testing.assert_array_equal(ids[0], list(range(1, 9)))  # first 8 kept
    np.testing.assert_array_equal(mask[0], 1)


def test_img_marker_stripped():
    tok = _Tok()
    ex.prepare_input_ids(tok, "a [IMG] cat", max_length=16)
    messages, _ = tok.last_messages
    assert "[IMG]" not in messages[1]["content"]
    assert messages[0]["role"] == "system"
    assert "object relationships" in messages[0]["content"]  # BFL embeddings prompt


def test_modes_pick_distinct_system_prompts():
    m_emb = ex.build_messages("p", "embeddings")[0]["content"]
    m_t2i = ex.build_messages("p", "upsampling_t2i")[0]["content"]
    m_i2i = ex.build_messages("p", "upsampling_i2i")[0]["content"]
    assert len({m_emb, m_t2i, m_i2i}) == 3
    assert "prompt engineer for FLUX.2" in m_t2i
    assert "image-editing expert" in m_i2i


@pytest.mark.slow
def test_extractor_output_shape_and_padding_independence():
    params = dec.init_params(jax.random.PRNGKey(0), tc.TINY_DECODER, dtype=jnp.float32)
    tok = _Tok(n_tokens=6)
    e = ex.EmbeddingExtractor(params, tc.TINY_DECODER, tok, (1, 2, 3), max_length=16)
    out = e("a cat")
    assert out.shape == (1, 16, 3 * tc.TINY_DECODER.hidden_size)
    assert e.embedding_dim == 3 * tc.TINY_DECODER.hidden_size


def test_mistral_and_qwen3_factories():
    params = dec.init_params(jax.random.PRNGKey(0), tc.TINY_DECODER, dtype=jnp.float32)
    m = ex.mistral_extractor(params, tc.TINY_DECODER, _Tok())
    q = ex.qwen3_extractor(params, tc.TINY_DECODER, _Tok())
    assert m.hidden_layers == (10, 20, 30)
    assert q.hidden_layers == (9, 18, 27)


class _EncTok(_Tok):
    """Stub with a raw-text encode (the Klein recipe path)."""

    def __init__(self, n_tokens=10):
        super().__init__(n_tokens)
        self.last_text = None

    def encode(self, text):
        self.last_text = text
        return list(range(1, self.n + 1))


def test_klein_recipe_right_padding_and_template():
    """Klein (KleinEmbeddingExtractor.swift): no system message, generation
    prompt with the empty think block, RIGHT padding."""
    tok = _EncTok(n_tokens=5)
    ids, mask = ex.prepare_klein_input_ids(tok, "a [IMG] cat", max_length=8)
    np.testing.assert_array_equal(ids[0], [1, 2, 3, 4, 5, 0, 0, 0])  # RIGHT pad
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 1, 0, 0, 0])
    assert tok.last_text == (
        "<|im_start|>user\na  cat<|im_end|>\n"
        "<|im_start|>assistant\n<think>\n\n</think>\n\n"
    )


def test_klein_recipe_truncation():
    tok = _EncTok(n_tokens=20)
    ids, mask = ex.prepare_klein_input_ids(tok, "long", max_length=8)
    np.testing.assert_array_equal(ids[0], list(range(1, 9)))
    np.testing.assert_array_equal(mask[0], 1)


def test_qwen3_extractor_uses_klein_recipe():
    params = dec.init_params(jax.random.PRNGKey(0), tc.TINY_DECODER, dtype=jnp.float32)
    q = ex.qwen3_extractor(params, tc.TINY_DECODER, _EncTok())
    assert q.recipe == "klein"
    m = ex.mistral_extractor(params, tc.TINY_DECODER, _Tok())
    assert m.recipe == "mistral"


def test_facade_load_qwen3_wires_klein_recipe():
    """The PRODUCT path must use the Klein recipe for Qwen3 encoders: the
    facade's attach() threads recipe through to the extractor, and
    load_qwen3 requests 'klein' (KleinEmbeddingExtractor.swift protocol —
    previously only the uncalled qwen3_extractor helper used it)."""
    import inspect

    from flux2_tpu.models.text_encoders import config as tc
    from flux2_tpu.models.text_encoders import facade

    te = facade.TextEncoders()
    enc = te.attach("k", {}, tc.TINY_DECODER, _Tok(), (1,), recipe="klein")
    assert enc.extractor.recipe == "klein"
    assert te.attach("m", {}, tc.TINY_DECODER, _Tok(), (1,)).extractor.recipe == "mistral"
    # load_qwen3 passes recipe="klein" into _load (checkpoint-free check)
    src = inspect.getsource(facade.TextEncoders.load_qwen3)
    assert 'recipe="klein"' in src


def test_conditioning_encode_is_one_compiled_program():
    """The conditioning encode is a per-generate hot path: it must run as ONE
    jitted program (eager tracing paid a device dispatch per op through the
    tunneled TPU runtime — seconds per call) and must NOT recompile across
    prompts at the same shape."""
    params = dec.init_params(jax.random.PRNGKey(0), tc.TINY_DECODER, dtype=jnp.float32)
    tok = _Tok(n_tokens=8)
    # max_length=12 is unique to this test: a fresh shape forces a fresh
    # compile even when earlier tests already populated the jit cache
    e = ex.EmbeddingExtractor(params, tc.TINY_DECODER, tok, (1, 2, 3), max_length=12)
    n0 = dec.extract_hidden_layers._cache_size()
    a = e("a red fox")
    n1 = dec.extract_hidden_layers._cache_size()
    b = e("an entirely different prompt about boats")
    n2 = dec.extract_hidden_layers._cache_size()
    assert n1 == n0 + 1, "first call should compile exactly one program"
    assert n2 == n1, "second prompt at the same shape must reuse the compile"
    assert a.shape == b.shape
