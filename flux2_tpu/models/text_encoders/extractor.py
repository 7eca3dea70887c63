"""FLUX.2 conditioning-embedding extraction (the "recipe").

Bit-parity-critical path (EmbeddingExtractor.swift:196-278,
KleinEmbeddingExtractor.swift / KleinConfig.swift:28-100): the DiT is
conditioned on LLM hidden states produced with an exact protocol —

  Mistral/Dev recipe (EmbeddingExtractor.swift):
  1. Build chat messages: [system: BFL reasoning prompt, user: prompt]
     with any "[IMG]" markers stripped from the prompt.
  2. Apply the model's chat template WITHOUT a generation prompt.
  3. Truncate to 512 tokens, then LEFT-pad to exactly 512 with the pad
     token; attention mask is 0 on padding.
  4. Forward with hidden states; concatenate layers (Mistral [10,20,30],
     Qwen3 [9,18,27]; index 0 = embedding layer) along features.

  Klein/Qwen3 recipe (KleinEmbeddingExtractor.swift — DIFFERENT):
  NO system message; generation prompt ending in the empty
  ``<think>\\n\\n</think>\\n\\n`` block (enable_thinking=False); RIGHT
  padding. See ``prepare_klein_input_ids``.

Output: [1, 512, 15360] (Dev/Mistral), [1, 512, 7680/12288] (Klein/Qwen3).

Tokenization is pluggable: any object with ``apply_chat_template(messages,
add_generation_prompt=False) -> list[int]`` and a ``pad_token_id``. The HF
``transformers`` tokenizer satisfies this via the provided adapter; hermetic
tests use a stub.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Protocol, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from flux2_tpu.models.text_encoders import decoder
from flux2_tpu.models.text_encoders.config import (
    DecoderConfig,
    MAX_SEQUENCE_LENGTH,
    MISTRAL_HIDDEN_LAYERS,
    QWEN3_HIDDEN_LAYERS,
)

# BFL system prompts (public Black Forest Labs protocol strings; the exact
# bytes matter for conditioning parity — EmbeddingExtractor.swift:17-48).
SYSTEM_MESSAGE_EMBEDDINGS = (
    "You are an AI that reasons about image descriptions. You give structured "
    "responses focusing on object relationships, object attribution and "
    "actions without speculation.\n"
)

SYSTEM_MESSAGE_UPSAMPLING_T2I = """You are an expert prompt engineer for FLUX.2 by Black Forest Labs. Rewrite user prompts to be more descriptive while strictly preserving their core subject and intent.

Guidelines:
1. Structure: Keep structured inputs structured (enhance within fields). Convert natural language to detailed paragraphs.
2. Details: Add concrete visual specifics - form, scale, textures, materials, lighting (quality, direction, color), shadows, spatial relationships, and environmental context.
3. Text in Images: Put ALL text in quotation marks, matching the prompt's language. Always provide explicit quoted text for objects that would contain text in reality (signs, labels, screens, etc.) - without it, the model generates gibberish.

Output only the revised prompt and nothing else.
"""

SYSTEM_MESSAGE_UPSAMPLING_I2I = """You are FLUX.2 by Black Forest Labs, an image-editing expert. You convert editing requests into one concise instruction (50-80 words, ~30 for brief requests).

Rules:
- Single instruction only, no commentary
- Use clear, analytical language (avoid "whimsical," "cascading," etc.)
- Specify what changes AND what stays the same (face, lighting, composition)
- Reference actual image elements
- Turn negatives into positives ("don't change X" → "keep X")
- Make abstractions concrete ("futuristic" → "glowing cyan neon, metallic panels")

Output only the final instruction in plain text and nothing else.
"""


class ChatTokenizer(Protocol):
    pad_token_id: int

    def apply_chat_template(self, messages: List[dict], add_generation_prompt: bool = False) -> List[int]: ...


def build_messages(prompt: str, mode: str = "embeddings") -> List[dict]:
    system = {
        "embeddings": SYSTEM_MESSAGE_EMBEDDINGS,
        "upsampling_t2i": SYSTEM_MESSAGE_UPSAMPLING_T2I,
        "upsampling_i2i": SYSTEM_MESSAGE_UPSAMPLING_I2I,
    }[mode]
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": prompt},
    ]


def prepare_input_ids(
    tokenizer: ChatTokenizer,
    prompt: str,
    max_length: int = MAX_SEQUENCE_LENGTH,
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize + truncate + LEFT-pad. Returns (input_ids, attention_mask) [1, L]."""
    cleaned = prompt.replace("[IMG]", "")
    token_ids = list(tokenizer.apply_chat_template(build_messages(cleaned), add_generation_prompt=False))
    token_ids = token_ids[:max_length]
    pad_count = max_length - len(token_ids)
    ids = [tokenizer.pad_token_id] * pad_count + token_ids
    mask = [0] * pad_count + [1] * len(token_ids)
    return (
        np.asarray(ids, dtype=np.int32)[None],
        np.asarray(mask, dtype=np.int32)[None],
    )


def format_qwen3_chat_template(prompt: str, add_generation_prompt: bool = True) -> str:
    """Klein chat template (KleinEmbeddingExtractor.swift:144-162): NO
    system message; `enable_thinking=False` semantics — the assistant turn
    opens with the empty think block, exactly as HF's Qwen3 template emits
    it."""
    s = f"<|im_start|>user\n{prompt}<|im_end|>\n"
    if add_generation_prompt:
        s += "<|im_start|>assistant\n<think>\n\n</think>\n\n"
    return s


def prepare_klein_input_ids(
    tokenizer: ChatTokenizer,
    prompt: str,
    max_length: int = MAX_SEQUENCE_LENGTH,
) -> Tuple[np.ndarray, np.ndarray]:
    """Klein (Qwen3) conditioning recipe — DIFFERENT from the Mistral one
    (KleinEmbeddingExtractor.swift:58-100): no system message, generation
    prompt ending in the empty ``<think>\\n\\n</think>\\n\\n`` block
    (enable_thinking=False), and RIGHT padding."""
    cleaned = prompt.replace("[IMG]", "")
    text = format_qwen3_chat_template(cleaned, add_generation_prompt=True)
    if hasattr(tokenizer, "encode"):
        token_ids = list(tokenizer.encode(text))
    else:  # chat-template-only tokenizers (hermetic stubs)
        token_ids = list(
            tokenizer.apply_chat_template(
                [{"role": "user", "content": cleaned}], add_generation_prompt=True
            )
        )
    token_ids = token_ids[:max_length]
    pad_count = max_length - len(token_ids)
    ids = token_ids + [tokenizer.pad_token_id] * pad_count
    mask = [1] * len(token_ids) + [0] * pad_count
    return (
        np.asarray(ids, dtype=np.int32)[None],
        np.asarray(mask, dtype=np.int32)[None],
    )


@dataclasses.dataclass
class EmbeddingExtractor:
    """Extracts DiT conditioning from a decoder's hidden states."""

    params: dict
    config: DecoderConfig
    tokenizer: ChatTokenizer
    hidden_layers: Tuple[int, ...]
    max_length: int = MAX_SEQUENCE_LENGTH
    recipe: str = "mistral"  # mistral: system+LEFT-pad | klein: think+RIGHT-pad

    def __call__(self, prompt: str) -> jnp.ndarray:
        prep = prepare_klein_input_ids if self.recipe == "klein" else prepare_input_ids
        ids, mask = prep(self.tokenizer, prompt, self.max_length)
        return decoder.extract_hidden_layers(
            self.params, self.config, jnp.asarray(ids), jnp.asarray(mask), self.hidden_layers
        )

    @property
    def embedding_dim(self) -> int:
        return len(self.hidden_layers) * self.config.hidden_size


def mistral_extractor(params: dict, config: DecoderConfig, tokenizer: ChatTokenizer) -> EmbeddingExtractor:
    """Dev path: Mistral layers [10, 20, 30] -> [1, 512, 15360]."""
    return EmbeddingExtractor(params, config, tokenizer, MISTRAL_HIDDEN_LAYERS)


def qwen3_extractor(params: dict, config: DecoderConfig, tokenizer: ChatTokenizer) -> EmbeddingExtractor:
    """Klein path: Qwen3 layers [9, 18, 27] -> [1, 512, 7680/12288].

    Uses the Klein recipe (no system message, enable_thinking=False
    generation prompt, RIGHT padding) — KleinEmbeddingExtractor.swift."""
    return EmbeddingExtractor(params, config, tokenizer, QWEN3_HIDDEN_LAYERS, recipe="klein")
