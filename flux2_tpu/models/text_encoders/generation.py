"""Autoregressive text generation over the generic decoder.

Capability parity with ``Sources/FluxTextEncoders/Generation/*.swift``
(MistralGenerator/Qwen3Generator): temperature / top-p / repetition-penalty
sampling with a streaming callback and preset parameter bundles. Used for
prompt upsampling (chat with the BFL upsampling system prompts) and the
``flux-encoders generate/chat`` CLI surface.

TPU shape: prefill is one jitted call; decoding runs as a device-side
``lax.while_loop`` over chunks of tokens with sampling (temperature / top-p /
repetition penalty) ON DEVICE, so the host sees one small transfer per chunk
instead of a [vocab]-sized logits fetch per token. On a tunneled/remote TPU
the per-call RPC latency (~45 ms measured) would otherwise dominate the
~1-15 ms decode step; chunking amortizes it ~16x while keeping the streaming
callback at chunk granularity. ``generate_host`` keeps the original
step-per-call host loop as the sampling oracle for tests.
"""

from __future__ import annotations

import dataclasses
import functools
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


def _stream_dtype(params: dict):
    """Activation dtype of a decoder: the embedding table's float dtype
    (bf16 for production checkpoints, f32 for test models); bf16 when the
    embedding itself is quantized."""
    w = params.get("embed_tokens")
    dt = getattr(w, "dtype", None)
    return dt if dt is not None and jnp.issubdtype(dt, jnp.floating) else jnp.bfloat16


def generate_host(
    params: dict,
    cfg: DecoderConfig,
    input_ids: List[int],
    gen_params: GenerateParameters = GenerateParameters(),
    eos_token_ids: Optional[List[int]] = None,
    seed: int = 0,
    on_token: Optional[Callable[[int], None]] = None,
    max_cache_len: Optional[int] = None,
) -> List[int]:
    """Original step-per-call host loop (one logits fetch + numpy sample per
    token). Kept as the sampling oracle; ``generate`` below is the production
    path."""
    eos = set(eos_token_ids or [])
    max_len = max_cache_len or (len(input_ids) + gen_params.max_tokens)
    cache = decoder.init_kv_cache(
        cfg, batch=1, max_len=max_len, dtype=_stream_dtype(params)
    )

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


# -- device-side sampling + chunked decode loop --------------------------------

DECODE_CHUNK = 16  # tokens per device round-trip


def _sample_device(key, logits, recent, p: GenerateParameters):
    """Device mirror of ``_sample_token``: logits [V], recent [R] int32 ring
    (-1 = empty slot). Greedy is exact vs the host oracle; top-p keeps the
    same sorted-prefix mass rule (threshold form, ties included)."""
    logits = logits.astype(jnp.float32)
    if p.repetition_penalty != 1.0:
        valid = recent >= 0
        vals = logits[jnp.where(valid, recent, 0)]
        pen = jnp.where(vals > 0, vals / p.repetition_penalty, vals * p.repetition_penalty)
        # empty ring slots scatter OUT OF BOUNDS (dropped by XLA) instead of
        # aliasing index 0: a dummy slot and a genuinely-recent token 0 would
        # otherwise race as duplicate scatter indices with conflicting values
        idx = jnp.where(valid, recent, logits.shape[0])
        logits = logits.at[idx].set(pen)
    if p.temperature <= 0:
        return jnp.argmax(logits).astype(jnp.int32)
    probs = jax.nn.softmax(logits / p.temperature)
    if p.top_p < 1.0:
        srt = jnp.sort(probs)[::-1]
        cum = jnp.cumsum(srt)
        cutoff = jnp.searchsorted(cum, jnp.float32(p.top_p))
        thresh = srt[jnp.minimum(cutoff, probs.shape[0] - 1)]
        kept = jnp.where(probs >= thresh, probs, 0.0)
        probs = kept / jnp.sum(kept)
    u = jax.random.uniform(key)
    return jnp.searchsorted(jnp.cumsum(probs), u).astype(jnp.int32)


_CHUNK_LOOPS: dict = {}


def _chunk_loop(loop_key, step_fn, carry_len, max_len: int, gp: GenerateParameters):
    """Jitted K-token decode loop over an opaque decode carry (a decoder
    KVCache, a qwen35 hybrid cache + position, ...):

        (params, logits, carry, recent, key, budget, eos)
            -> (out [K], stop, logits, carry, recent, key)

    ``step_fn(params, tok[1,1], carry) -> (logits, carry)`` advances one
    token; ``carry_len(carry)`` is the current absolute length (scalar).
    Compiled programs are memoized on ``loop_key`` (a hashable tuple the
    caller derives from config/max_len/dtype) plus the sampling fields of
    ``gp`` — max_tokens rides the runtime ``budget`` array and
    repetition_context_size only sizes the traced ``recent`` ring, so
    varying them never recompiles."""
    gp = dataclasses.replace(gp, max_tokens=0, repetition_context_size=0)
    memo_key = (loop_key, max_len, gp)
    cached = _CHUNK_LOOPS.get(memo_key)
    if cached is not None:
        return cached

    K = DECODE_CHUNK

    def run(params, logits, carry, recent, key, budget, eos):
        out0 = jnp.full((K,), -1, jnp.int32)

        def cond(c):
            i, stop = c[0], c[1]
            return (i < jnp.minimum(K, budget)) & (~stop)

        def body(c):
            i, stop, key, logits, carry, recent, out = c
            key, k = jax.random.split(key)
            tok = _sample_device(k, logits[0], recent, gp)
            is_eos = jnp.any(tok == eos)
            out = out.at[i].set(jnp.where(is_eos, -1, tok))
            recent = jnp.where(is_eos, recent, jnp.roll(recent, -1).at[-1].set(tok))
            # Step whenever more logits may be needed (also across the chunk
            # boundary, so the next chunk's first sample has fresh logits).
            can_step = (~is_eos) & (carry_len(carry) < max_len)
            logits, carry = jax.lax.cond(
                can_step,
                lambda lc: step_fn(params, tok[None, None], lc[1]),
                lambda lc: lc,
                (logits, carry),
            )
            stop = is_eos | (carry_len(carry) >= max_len)
            return (i + 1, stop, key, logits, carry, recent, out)

        init = (jnp.int32(0), jnp.bool_(False), key, logits, carry, recent, out0)
        i, stop, key, logits, carry, recent, out = jax.lax.while_loop(cond, body, init)
        return out, stop, logits, carry, recent, key

    compiled = jax.jit(run, donate_argnums=(2,))
    _CHUNK_LOOPS[memo_key] = compiled
    return compiled


def decode_loop(
    params,
    logits,
    carry,
    loop_key,
    step_fn,
    carry_len,
    max_len: int,
    gen_params: GenerateParameters,
    eos_token_ids: Optional[List[int]] = None,
    seed: int = 0,
    on_token: Optional[Callable[[int], None]] = None,
    prompt_tail: Optional[List[int]] = None,
) -> List[int]:
    """Host driver for the chunked device decode: runs ``_chunk_loop`` until
    max_tokens/EOS/cache-full, streaming tokens per chunk. Shared by plain
    decoder generation and both VLM services (which prefill with merged
    image embeddings before handing over)."""
    p = gen_params
    r = max(1, p.repetition_context_size)
    recent = jnp.full((r,), -1, jnp.int32)
    if prompt_tail:
        tail = jnp.asarray(list(prompt_tail)[-r:], jnp.int32)
        recent = recent.at[r - tail.shape[0]:].set(tail)
    eos_arr = jnp.asarray(sorted(set(eos_token_ids or [])) or [-1], jnp.int32)
    key = jax.random.PRNGKey(seed)
    run = _chunk_loop(loop_key, step_fn, carry_len, max_len, p)

    out: List[int] = []
    remaining = p.max_tokens
    stopped = False
    while remaining > 0 and not stopped:
        budget = jnp.asarray(min(remaining, DECODE_CHUNK), jnp.int32)
        chunk, stop, logits, carry, recent, key = run(
            params, logits, carry, recent, key, budget, eos_arr
        )
        toks = [int(t) for t in np.asarray(chunk) if t >= 0]
        out.extend(toks)
        if on_token is not None:
            for t in toks:
                on_token(t)
        stopped = bool(stop)
        remaining -= max(len(toks), 1)
    return out


def decoder_step_fn(cfg: DecoderConfig):
    """step_fn/carry_len pair for the standard GQA decoder KV cache."""
    return (
        lambda params, tok, cache: decoder.decode_step(params, cfg, tok, cache),
        lambda cache: cache.length,
    )


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
    """Sample a completion; returns the generated token ids (without prompt).

    Decoding runs device-side in DECODE_CHUNK-token compiled loops; the
    streaming callback fires per chunk (one small transfer each) instead of
    per token. Cache dtype follows the params' stream dtype: bf16 weights get
    a bf16 cache (half the KV HBM traffic per step), f32 test models stay
    exact against their oracles."""
    p = gen_params
    max_len = max_cache_len or (len(input_ids) + p.max_tokens)
    if max_cache_len is None:
        # Bucket the cache length so varying prompt lengths reuse the same
        # compiled chunk loop (a fresh compile costs far more than the
        # padded cache slots).
        max_len = -(-max_len // 256) * 256
    dtype = _stream_dtype(params)
    cache = decoder.init_kv_cache(cfg, batch=1, max_len=max_len, dtype=dtype)

    ids = jnp.asarray([input_ids], jnp.int32)
    logits, cache = _prefill_runner(cfg)(params, ids, cache)

    step_fn, carry_len = decoder_step_fn(cfg)
    return decode_loop(
        params, logits, cache,
        loop_key=("decoder", cfg, str(jnp.dtype(dtype))),
        step_fn=step_fn, carry_len=carry_len, max_len=max_len,
        gen_params=p, eos_token_ids=eos_token_ids, seed=seed,
        on_token=on_token, prompt_tail=input_ids,
    )


@functools.lru_cache(maxsize=16)
def _prefill_runner(cfg: DecoderConfig):
    return jax.jit(lambda p, ids, c: decoder.prefill(p, cfg, ids, c))


@functools.lru_cache(maxsize=16)
def prefill_embeds_runner(cfg: DecoderConfig):
    """Memoized jitted prefill taking merged (text+image) input embeddings —
    the VLM services' entry into the shared decode loop."""
    return jax.jit(
        lambda p, ids, c, e: decoder.prefill(p, cfg, ids, c, inputs_embeds=e)
    )


def apply_thinking_control(messages: list, enable_thinking: bool) -> list:
    """Qwen3 thinking soft-switch: append ``/no_think`` to the LAST user
    turn when thinking is disabled (Qwen3Generator.swift:358-374; Qwen3.5
    controls this via the chat template instead — its service path). Returns
    a new messages list; non-user-final conversations pass through."""
    if enable_thinking or not messages:
        return messages
    out = [dict(m) for m in messages]
    for m in reversed(out):
        if m.get("role") == "user":
            if "/no_think" not in str(m.get("content", "")):
                m["content"] = f"{m['content']} /no_think"
            break
    return out


class ThinkStreamFilter:
    """Wrap a streaming on_token(text) callback: suppress a LEADING
    <think>...</think> block from the streamed pieces so the live display
    matches the strip_think_tags'd final reply (Qwen3 no-think mode still
    emits the empty block). Buffers only while a think block is possible;
    call :meth:`flush` when the stream ends so a still-ambiguous buffered
    prefix (e.g. the reply ends right after ``"<th"``) is not swallowed.
    Contract is LEADING-block only: a mid-reply block streams verbatim
    (no per-'<' holdback latency) while strip_think_tags removes all."""

    _OPEN = "<think>"
    _CLOSE = "</think>"

    def __init__(self, emit):
        self._emit = emit
        self._buf = ""
        self._state = "maybe"  # maybe | inside | passthrough

    def __call__(self, piece: str):
        if self._state == "passthrough":
            self._emit(piece)
            return
        if self._state == "trim":  # swallow whitespace after </think>
            out = piece.lstrip()
            if out:
                self._state = "passthrough"
                self._emit(out)
            return
        self._buf += piece
        if self._state == "maybe":
            stripped = self._buf.lstrip()
            if not stripped:
                return
            if len(stripped) < len(self._OPEN) and self._OPEN.startswith(stripped):
                return  # ambiguous prefix: keep buffering
            if stripped.startswith(self._OPEN):
                self._state = "inside"
            else:
                self._state = "passthrough"
                out, self._buf = self._buf, ""
                self._emit(out)
                return
        if self._state == "inside":
            idx = self._buf.find(self._CLOSE)
            if idx >= 0:
                rest = self._buf[idx + len(self._CLOSE):].lstrip()
                self._buf = ""
                if rest:
                    self._state = "passthrough"
                    self._emit(rest)
                else:
                    self._state = "trim"

    def flush(self):
        """End-of-stream: emit any text still buffered as an ambiguous
        think-tag prefix (otherwise a reply like ``"<three words"`` cut at
        ``"<th"`` would never reach the display)."""
        if self._state == "maybe" and self._buf.strip():
            out, self._buf = self._buf, ""
            self._state = "passthrough"
            self._emit(out)


def strip_think_tags(text: str) -> str:
    """Drop ``<think>...</think>`` reasoning blocks (incl. the empty one the
    no-think mode still emits) from a decoded reply
    (Qwen3Generator.swift:144,269)."""
    import re

    text = re.sub(r"<think>.*?</think>\s*", "", text, flags=re.DOTALL)
    # a reply truncated by max_tokens mid-reasoning has an UNCLOSED <think>:
    # the chain-of-thought must not leak through as the usable reply
    # (upsample_prompt would feed it to the DiT as conditioning)
    text = re.sub(r"<think>.*$", "", text, flags=re.DOTALL)
    return text.strip()


def upsample_prompt(
    params: dict,
    cfg: DecoderConfig,
    tokenizer,
    prompt: str,
    mode: str = "upsampling_t2i",
    gen_params: Optional[GenerateParameters] = None,
    seed: int = 0,
    qwen3_no_think: bool = False,
) -> str:
    """Rewrite a prompt with the BFL upsampling system prompt via chat
    (Flux2TextEncoder text upsampling, MistralEncoder.swift:70-91).
    ``qwen3_no_think`` appends the Qwen3 ``/no_think`` soft switch so the
    upsampler answers directly instead of reasoning first."""
    from flux2_tpu.models.text_encoders.extractor import build_messages

    messages = build_messages(prompt, mode=mode)
    if qwen3_no_think:
        messages = apply_thinking_control(messages, enable_thinking=False)
    input_ids = list(tokenizer.apply_chat_template(messages, add_generation_prompt=True))
    eos = [tokenizer.eos_token_id] if getattr(tokenizer, "eos_token_id", None) is not None else []
    tokens = generate(
        params, cfg, input_ids,
        gen_params or GenerateParameters.upsampling(),
        eos_token_ids=eos, seed=seed,
    )
    text = tokenizer.decode(tokens) if hasattr(tokenizer, "decode") else ""
    return strip_think_tags(text) or prompt
