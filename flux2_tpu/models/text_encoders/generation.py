"""Autoregressive text generation over the generic decoder.

Capability parity with ``Sources/FluxTextEncoders/Generation/*.swift``
(MistralGenerator/Qwen3Generator): temperature / top-p / repetition-penalty
sampling with a streaming callback and preset parameter bundles. Used for
prompt upsampling (chat with the BFL upsampling system prompts) and the
``flux-encoders generate/chat`` CLI surface.

TPU shape: prefill is one jitted call; each decode step is one jitted call
against a static-length KV cache, so the loop reuses exactly two compiled
programs regardless of prompt/output length.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.models.text_encoders import decoder
from flux2_tpu.models.text_encoders.config import DecoderConfig


@dataclasses.dataclass(frozen=True)
class GenerateParameters:
    """Sampling knobs (GenerateParameters presets, MistralGenerator.swift:12-50)."""

    max_tokens: int = 512
    temperature: float = 0.7
    top_p: float = 0.95
    repetition_penalty: float = 1.1
    repetition_context_size: int = 64

    @classmethod
    def creative(cls) -> "GenerateParameters":
        return cls(temperature=0.9, top_p=0.98)

    @classmethod
    def precise(cls) -> "GenerateParameters":
        return cls(temperature=0.2, top_p=0.9)

    @classmethod
    def upsampling(cls) -> "GenerateParameters":
        return cls(max_tokens=256, temperature=0.7, top_p=0.95)


def _sample_token(
    key: jax.Array,
    logits: np.ndarray,  # [V] f32
    recent: List[int],
    params: GenerateParameters,
) -> int:
    logits = np.array(logits, np.float32)
    if params.repetition_penalty != 1.0 and recent:
        idx = np.asarray(recent, np.int64)
        vals = logits[idx]
        logits[idx] = np.where(
            vals > 0, vals / params.repetition_penalty, vals * params.repetition_penalty
        )
    if params.temperature <= 0:
        return int(np.argmax(logits))
    logits = logits / params.temperature
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    if params.top_p < 1.0:
        order = np.argsort(-probs)
        cum = np.cumsum(probs[order])
        cutoff = int(np.searchsorted(cum, params.top_p)) + 1
        mask = np.zeros_like(probs)
        mask[order[:cutoff]] = probs[order[:cutoff]]
        probs = mask / mask.sum()
    u = float(jax.random.uniform(key))
    return int(np.searchsorted(np.cumsum(probs), u))


def generate(
    params: dict,
    cfg: DecoderConfig,
    input_ids: List[int],
    gen_params: GenerateParameters = GenerateParameters(),
    eos_token_ids: Optional[List[int]] = None,
    seed: int = 0,
    on_token: Optional[Callable[[int], None]] = None,
    max_cache_len: Optional[int] = None,
) -> List[int]:
    """Sample a completion; returns the generated token ids (without prompt)."""
    eos = set(eos_token_ids or [])
    max_len = max_cache_len or (len(input_ids) + gen_params.max_tokens)
    cache = decoder.init_kv_cache(cfg, batch=1, max_len=max_len, dtype=jnp.float32)

    prefill_jit = jax.jit(lambda p, ids, c: decoder.prefill(p, cfg, ids, c))
    step_jit = jax.jit(lambda p, tok, c: decoder.decode_step(p, cfg, tok, c))

    ids = jnp.asarray([input_ids], jnp.int32)
    logits, cache = prefill_jit(params, ids, cache)

    out: List[int] = []
    key = jax.random.PRNGKey(seed)
    recent: List[int] = list(input_ids[-gen_params.repetition_context_size :])
    for _ in range(gen_params.max_tokens):
        key, k = jax.random.split(key)
        token = _sample_token(k, np.asarray(logits[0]), recent, gen_params)
        if token in eos:
            break
        out.append(token)
        recent = (recent + [token])[-gen_params.repetition_context_size :]
        if on_token is not None:
            on_token(token)
        if int(cache.length) >= max_len:
            break
        logits, cache = step_jit(params, jnp.asarray([[token]], jnp.int32), cache)
    return out


def upsample_prompt(
    params: dict,
    cfg: DecoderConfig,
    tokenizer,
    prompt: str,
    mode: str = "upsampling_t2i",
    gen_params: Optional[GenerateParameters] = None,
    seed: int = 0,
) -> str:
    """Rewrite a prompt with the BFL upsampling system prompt via chat
    (Flux2TextEncoder text upsampling, MistralEncoder.swift:70-91)."""
    from flux2_tpu.models.text_encoders.extractor import build_messages

    messages = build_messages(prompt, mode=mode)
    input_ids = list(tokenizer.apply_chat_template(messages, add_generation_prompt=True))
    eos = [tokenizer.eos_token_id] if getattr(tokenizer, "eos_token_id", None) is not None else []
    tokens = generate(
        params, cfg, input_ids,
        gen_params or GenerateParameters.upsampling(),
        eos_token_ids=eos, seed=seed,
    )
    text = tokenizer.decode(tokens) if hasattr(tokenizer, "decode") else ""
    return text.strip() or prompt
