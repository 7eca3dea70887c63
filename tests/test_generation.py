"""Text generation, VLM prompt builder, subject mask tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flux2_tpu.chains.subject_mask import saliency_foreground, subject_mask
from flux2_tpu.chains.vlm_prompt import InpaintIntent, SYSTEM_PROMPTS, VLMPromptBuilder
from flux2_tpu.models.text_encoders import config as tc
from flux2_tpu.models.text_encoders import decoder as dec
from flux2_tpu.models.text_encoders import generation as gen

CFG = tc.TINY_DECODER


@pytest.fixture(scope="module")
def params():
    return dec.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


@pytest.mark.slow
def test_greedy_generation_deterministic(params):
    p = gen.GenerateParameters(max_tokens=8, temperature=0.0)
    a = gen.generate(params, CFG, [1, 2, 3], p, seed=0)
    b = gen.generate(params, CFG, [1, 2, 3], p, seed=99)
    assert a == b  # greedy ignores the seed
    assert len(a) == 8
    assert all(0 <= t < CFG.vocab_size for t in a)


@pytest.mark.slow
def test_sampling_respects_seed(params):
    p = gen.GenerateParameters(max_tokens=12, temperature=1.0, top_p=1.0)
    a = gen.generate(params, CFG, [1, 2, 3], p, seed=0)
    b = gen.generate(params, CFG, [1, 2, 3], p, seed=0)
    c = gen.generate(params, CFG, [1, 2, 3], p, seed=1)
    assert a == b
    assert a != c


def test_eos_stops_generation(params):
    p = gen.GenerateParameters(max_tokens=50, temperature=0.0)
    full = gen.generate(params, CFG, [1, 2, 3], p)
    # use the first generated token as EOS -> stop immediately
    stopped = gen.generate(params, CFG, [1, 2, 3], p, eos_token_ids=[full[0]])
    assert stopped == []


def test_streaming_callback(params):
    seen = []
    p = gen.GenerateParameters(max_tokens=5, temperature=0.0)
    out = gen.generate(params, CFG, [1], p, on_token=seen.append)
    assert seen == out


def test_repetition_penalty_reduces_repeats(params):
    base = gen.GenerateParameters(max_tokens=24, temperature=0.0, repetition_penalty=1.0)
    pen = gen.GenerateParameters(max_tokens=24, temperature=0.0, repetition_penalty=1.5)
    a = gen.generate(params, CFG, [1, 2], base)
    b = gen.generate(params, CFG, [1, 2], pen)

    def max_run(seq):
        best = run = 1
        for x, y in zip(seq, seq[1:]):
            run = run + 1 if x == y else 1
            best = max(best, run)
        return best

    assert max_run(b) <= max_run(a)


class _StubTokenizer:
    pad_token_id = 0
    eos_token_id = 2

    def apply_chat_template(self, messages, add_generation_prompt=False):
        text = " ".join(m["content"] for m in messages)
        return [hash(w) % 200 + 3 for w in text.split()][:32]

    def decode(self, tokens):
        return " ".join(f"t{t}" for t in tokens)


def test_upsample_prompt_returns_text(params):
    out = gen.upsample_prompt(params, CFG, _StubTokenizer(), "a cat", seed=0)
    assert isinstance(out, str) and out


def test_vlm_prompt_builder_fallback():
    b = VLMPromptBuilder(vlm_chat=None)
    assert not b.is_loaded
    assert b.build_inpaint_prompt(InpaintIntent.REPLACE, "a duck", None) is None


def test_vlm_prompt_builder_intents():
    calls = []

    def fake_vlm(system, user, image):
        calls.append(system)
        return "  an enriched prompt  "

    b = VLMPromptBuilder(vlm_chat=fake_vlm)
    out = b.build_inpaint_prompt(InpaintIntent.REMOVE, "remove the car", None)
    assert out == "an enriched prompt"
    assert "NEVER mention or allude to the removed object" in calls[0]
    # intents have distinct system prompts with opposite requirements
    assert len({SYSTEM_PROMPTS[i] for i in InpaintIntent}) == 4
    out2 = b.build_outpaint_prompt("beach", None, sides=["left", "top"])
    assert out2 == "an enriched prompt"


def test_vlm_prompt_builder_swallow_errors():
    def broken(system, user, image):
        raise RuntimeError("boom")

    b = VLMPromptBuilder(vlm_chat=broken)
    assert b.build_inpaint_prompt(InpaintIntent.MODIFY, "x", None) is None


def test_subject_mask_shapes_and_convention():
    img = np.zeros((64, 64, 3), np.float32)
    img[:] = 0.9  # bright border-like background
    img[24:40, 24:40] = 0.1  # dark centered subject
    fg = saliency_foreground(img)
    assert fg.shape == (64, 64)
    assert fg[32, 32] > fg[2, 2]
    mask = subject_mask(img, dilation_px=2, ramp_px=2)
    # change-scene convention: subject kept (0), scene repainted (1)
    assert mask[32, 32] < 0.5
    assert mask[2, 2] > 0.5
    assert 0.0 <= mask.min() and mask.max() <= 1.0


@pytest.mark.slow
def test_device_loop_matches_host_oracle(params):
    """The chunked device-side decode loop must reproduce the host
    step-per-call oracle exactly under greedy decoding (penalty on/off,
    EOS, chunk-boundary crossing) and behave equivalently when sampling."""
    for p in (
        gen.GenerateParameters(max_tokens=8, temperature=0.0),
        gen.GenerateParameters(max_tokens=24, temperature=0.0, repetition_penalty=1.5),
        # > DECODE_CHUNK tokens: crosses a chunk boundary
        gen.GenerateParameters(max_tokens=gen.DECODE_CHUNK + 5, temperature=0.0),
    ):
        host = gen.generate_host(params, CFG, [1, 2, 3], p, seed=0)
        dev = gen.generate(params, CFG, [1, 2, 3], p, seed=0)
        assert dev == host, p
    # EOS parity: stop on the first generated token
    p = gen.GenerateParameters(max_tokens=50, temperature=0.0)
    first = gen.generate_host(params, CFG, [1, 2, 3], p)[0]
    assert gen.generate(params, CFG, [1, 2, 3], p, eos_token_ids=[first]) == []
    # sampled path: deterministic per seed, valid ids, max_tokens respected
    p = gen.GenerateParameters(max_tokens=20, temperature=0.9, top_p=0.9)
    a = gen.generate(params, CFG, [1, 2, 3], p, seed=7)
    b = gen.generate(params, CFG, [1, 2, 3], p, seed=7)
    assert a == b and len(a) <= 20
    assert all(0 <= t < CFG.vocab_size for t in a)


@pytest.mark.slow
def test_generation_with_quantized_untied_lm_head():
    """quantize_params() turns an untied lm_head into a QTensor; generation
    must route the vocab projection through q_matmul (a quantized Mistral
    encoder chat would otherwise crash on `h @ W8A8Tensor`)."""
    import dataclasses as dc

    from flux2_tpu.ops import quant

    cfg = dc.replace(CFG, tie_word_embeddings=False)
    params = dec.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    qparams = quant.quantize_params(params, "w8a8", min_size=1)
    from flux2_tpu.ops.quant import is_quantized
    assert is_quantized(qparams["lm_head"])  # the precondition for the bug
    p = gen.GenerateParameters(max_tokens=4, temperature=0.0)
    out = gen.generate(qparams, cfg, [1, 2, 3], p)
    assert len(out) == 4 and all(0 <= t < cfg.vocab_size for t in out)


def test_thinking_control_and_strip():
    """Qwen3 /no_think soft switch + think-tag stripping
    (Qwen3Generator.swift:144,358-374)."""
    from flux2_tpu.models.text_encoders import generation as g

    msgs = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
    ]
    out = g.apply_thinking_control(msgs, enable_thinking=False)
    assert out[3]["content"] == "q2 /no_think"
    assert out[1]["content"] == "q1"  # only the LAST user turn
    assert msgs[3]["content"] == "q2"  # input untouched
    assert g.apply_thinking_control(msgs, enable_thinking=True) is msgs
    # idempotent
    again = g.apply_thinking_control(out, enable_thinking=False)
    assert again[3]["content"] == "q2 /no_think"

    assert g.strip_think_tags("<think>\n\n</think>\n\nanswer") == "answer"
    assert g.strip_think_tags("<think>reasoning\nhere</think>  final") == "final"
    assert g.strip_think_tags("plain") == "plain"


def test_think_stream_filter():
    from flux2_tpu.models.text_encoders.generation import ThinkStreamFilter

    def run(pieces):
        out = []
        f = ThinkStreamFilter(out.append)
        for p in pieces:
            f(p)
        return "".join(out)

    # empty think block split across tokens (no-think mode's actual stream)
    assert run(["<th", "ink>", "\n\n</th", "ink>", "\n\nhi", " there"]) == "hi there"
    # full reasoning block suppressed
    assert run(["<think>step 1", " step 2</think>  answer"]) == "answer"
    # non-think reply passes through unchanged (incl. '<' that isn't think)
    assert run(["hello ", "world"]) == "hello world"
    assert run(["<b>bold</b>", " ok"]) == "<b>bold</b> ok"


def test_think_stream_filter_flush_ambiguous_tail():
    """A stream that ENDS while the buffer is still an ambiguous think-tag
    prefix must flush it — otherwise the whole reply is swallowed."""
    from flux2_tpu.models.text_encoders.generation import ThinkStreamFilter

    out = []
    f = ThinkStreamFilter(out.append)
    f("<th")  # ambiguous: could become <think>
    assert out == []  # buffered, not emitted
    f.flush()
    assert "".join(out) == "<th"

    # flush after normal passthrough is a no-op
    out2 = []
    f2 = ThinkStreamFilter(out2.append)
    f2("hello")
    f2.flush()
    assert "".join(out2) == "hello"


def test_strip_think_tags_unclosed_block():
    """A reply truncated by max_tokens mid-reasoning (no </think>) must not
    leak the chain-of-thought as the usable reply — upsample_prompt would
    otherwise feed it to the DiT as conditioning."""
    from flux2_tpu.models.text_encoders import generation as g

    assert g.strip_think_tags("<think> the user wants a cat picture, so") == ""
    assert g.strip_think_tags("preamble <think>cut off") == "preamble"
    # closed blocks still strip normally and keep the reply
    assert g.strip_think_tags("<think>x</think>ok <think>y") == "ok"


def test_device_repetition_penalty_token_zero_in_ring():
    """Empty ring slots (-1) must not alias token id 0 in the penalty
    scatter: with token 0 genuinely recent, duplicate scatter indices with
    conflicting values are order-undefined in XLA and could drop the
    penalty. Empty slots now scatter out of bounds (dropped)."""
    import jax
    import jax.numpy as jnp

    from flux2_tpu.models.text_encoders.generation import (
        GenerateParameters,
        _sample_device,
    )

    logits = jnp.array([3.0, 1.0, -2.0, 0.5])
    recent = jnp.array([-1, -1, 0, 2], jnp.int32)  # ring not full; 0 IS recent
    # penalty 2: [1.5, 1.0, -4.0, 0.25] -> argmax 0 (penalty applied, still top)
    tok = _sample_device(jax.random.PRNGKey(0), logits, recent,
                         GenerateParameters(repetition_penalty=2.0, temperature=0.0))
    assert int(tok) == 0
    # penalty 4: [0.75, 1.0, -8.0, 0.125] -> argmax 1 (penalty flips the order)
    tok = _sample_device(jax.random.PRNGKey(0), logits, recent,
                         GenerateParameters(repetition_penalty=4.0, temperature=0.0))
    assert int(tok) == 1
