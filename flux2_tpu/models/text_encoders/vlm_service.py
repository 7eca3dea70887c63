"""VLM services: vision towers wired to language models.

Capability parity with the reference's VLM surface
(``FluxTextEncoders.analyzeImage``, ``Qwen35VLM.swift``, and the trainer's
VLM scoring, SimpleLoRATrainer.swift:2008-2409):

  - ``MistralVLMService`` (Dev path): Pixtral vision features projected into
    Mistral's embedding space, spliced at [IMG] token positions, then
    KV-cached generation — image analysis / vision-aware upsampling.
  - ``Qwen35VLMService``: Qwen3.5 vision tower + hybrid LM; provides the
    ``vlm_chat(system, user, image)`` callable the chains' prompt builder
    consumes and the (scene, style) scorer the trainer's validation uses.
    Generation streams over the hybrid dual cache (conv + recurrent states
    for linear-attention layers, KV for full-attention layers).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.models.text_encoders import decoder, generation, pixtral, qwen35, qwen35_vision

SCORING_SYSTEM_PROMPT = (
    "You compare a generated image against reference images for LoRA "
    "training validation. Score two axes from 0 to 10: SCENE (does the "
    "generated image depict the prompt's subject and composition?) and "
    "STYLE (does it match the references' visual style — palette, lighting, "
    "rendering?). Reply with exactly: scene=<n> style=<n>."
)


import functools


@functools.lru_cache(maxsize=8)
def _qwen35_prefill(cfg: qwen35.Qwen35TextConfig):
    return jax.jit(
        lambda p, i, c, e: qwen35.forward_cached(p, cfg, i, c, jnp.int32(0), inputs_embeds=e)
    )


FLUX_IMAGE_COMPARISON_SYSTEM_PROMPT = (
    "You compare two images for FLUX.2 LoRA training evaluation. Image 1 is "
    "the REFERENCE (target). Image 2 is the GENERATED image (baseline "
    "without LoRA). Score each criterion from 0 to 100. Be STRICT and "
    "PRECISE - small differences matter for LoRA training decisions. "
    "SCENE score = content fidelity (subjects, poses, spatial layout); "
    "STYLE score = visual fidelity (art style, palette, lighting, "
    "textures). Respond ONLY with this exact JSON format, no other text: "
    '{"scene_score": N, "scene_reason": "brief explanation", '
    '"style_score": N, "style_reason": "brief explanation"}'
)


def parse_comparison(text: str) -> dict:
    """Parse the comparison JSON with a regex fallback
    (FluxTextEncoders.swift:633-680 parseComparisonResult)."""
    import json as _json

    cleaned = generation.strip_think_tags(text).replace("<|im_end|>", "").strip()
    for candidate in (cleaned, text):
        start, end = candidate.find("{"), candidate.rfind("}")
        if 0 <= start < end:
            try:
                d = _json.loads(candidate[start : end + 1])
                return {
                    "scene_score": float(d.get("scene_score", 0) or 0),
                    "scene_reason": str(d.get("scene_reason", "")),
                    "style_score": float(d.get("style_score", 0) or 0),
                    "style_reason": str(d.get("style_reason", "")),
                }
            except (ValueError, TypeError):
                pass
    scene = re.search(r"scene[_ ]?score\D{0,4}(\d{1,3})", cleaned, re.I)
    style = re.search(r"style[_ ]?score\D{0,4}(\d{1,3})", cleaned, re.I)
    return {
        "scene_score": float(scene.group(1)) if scene else 0.0,
        "scene_reason": "",
        "style_score": float(style.group(1)) if style else 0.0,
        "style_reason": "",
    }


def parse_scores(text: str) -> Tuple[float, float]:
    """Parse 'scene=<n> style=<n>' with graceful fallback to 0/0."""
    scene = re.search(r"scene\s*[=:]\s*([0-9]+(?:\.[0-9]+)?)", text, re.I)
    style = re.search(r"style\s*[=:]\s*([0-9]+(?:\.[0-9]+)?)", text, re.I)
    return (
        min(10.0, float(scene.group(1))) if scene else 0.0,
        min(10.0, float(style.group(1))) if style else 0.0,
    )


@dataclasses.dataclass
class MistralVLMService:
    """Pixtral + Mistral: image analysis via [IMG]-spliced generation."""

    lm_params: dict
    lm_config: Any  # DecoderConfig
    vision_params: dict
    vision_config: pixtral.PixtralVisionConfig
    tokenizer: Any
    image_token_id: int = 10  # Mistral [IMG]

    def encode_image(self, image: np.ndarray) -> jnp.ndarray:
        """[H, W, 3] in [0,1] -> projected features [1, T, lm_hidden]."""
        pixels = (np.asarray(image, np.float32) - 0.5) / 0.5
        # crop to patch multiples
        p = self.vision_config.patch_size
        h = image.shape[0] // p * p
        w = image.shape[1] // p * p
        return pixtral.encode_and_project(
            self.vision_params, self.vision_config, jnp.asarray(pixels[None, :h, :w])
        )

    def analyze_image(
        self,
        image: np.ndarray,
        prompt: str,
        gen_params: Optional[generation.GenerateParameters] = None,
        seed: int = 0,
    ) -> str:
        img_embeds = self.encode_image(image)
        n_img = img_embeds.shape[1]
        # chat-template the text with [IMG] placeholders for the image tokens
        messages = [{"role": "user", "content": prompt}]
        text_ids = list(self.tokenizer.apply_chat_template(messages, add_generation_prompt=True))
        ids = [self.image_token_id] * n_img + text_ids
        input_ids = jnp.asarray([ids], jnp.int32)
        text_embeds = self.lm_params["embed_tokens"][input_ids]
        merged = qwen35_vision.merge_image_embeddings(
            text_embeds, input_ids, img_embeds, self.image_token_id
        )

        gp = gen_params or generation.GenerateParameters(max_tokens=128, temperature=0.2)
        # Bucket so prompt-length jitter reuses the compiled decode loop.
        max_len = -(-(len(ids) + gp.max_tokens) // 256) * 256
        dtype = generation._stream_dtype(self.lm_params)
        cache = decoder.init_kv_cache(self.lm_config, 1, max_len, dtype=dtype)
        logits, cache = generation.prefill_embeds_runner(self.lm_config)(
            self.lm_params, input_ids, cache, merged
        )

        eos = getattr(self.tokenizer, "eos_token_id", None)
        step_fn, carry_len = generation.decoder_step_fn(self.lm_config)
        out_tokens = generation.decode_loop(
            self.lm_params, logits, cache,
            loop_key=("decoder", self.lm_config, str(jnp.dtype(dtype))),
            step_fn=step_fn, carry_len=carry_len, max_len=max_len,
            gen_params=gp, eos_token_ids=[eos] if eos is not None else None,
            seed=seed,
        )
        return self.tokenizer.decode(out_tokens)


@dataclasses.dataclass
class Qwen35VLMService:
    """Qwen3.5 hybrid VLM: chains' prompt enrichment + validation scoring."""

    lm_params: dict
    lm_config: qwen35.Qwen35TextConfig
    vision_params: dict
    vision_config: qwen35_vision.Qwen35VisionConfig
    tokenizer: Any

    def _merged_inputs(self, text_ids: List[int], image):
        """image: None | one [H,W,3] array | a sequence of them (multi-image
        prompts — compareImagesForFlux feeds reference+generated)."""
        if image is None:
            ids = jnp.asarray([text_ids], jnp.int32)
            return ids, None
        images = [image] if isinstance(image, np.ndarray) or getattr(image, "ndim", 0) == 3 else list(image)
        blocks = []
        for im in images:
            pixels = qwen35_vision.preprocess_image(np.asarray(im, np.float32), self.vision_config)
            blocks.append(
                qwen35_vision.encode_image(
                    self.vision_params, self.vision_config, jnp.asarray(pixels[None])
                )
            )
        img_embeds = jnp.concatenate(blocks, axis=1)
        tok_id = self.vision_config.image_token_id
        # Multi-image prompts label each block ("Image N:") so the model can
        # attribute content per image (the comparison prompt refers to
        # Image 1/Image 2); merge_image_embeddings fills image-token
        # positions by rank, so interleaved text is fine. Single images and
        # label-less tokenizers (no .encode) keep the bare block layout.
        can_label = len(images) > 1 and hasattr(self.tokenizer, "encode")
        ids: list = []
        for i, blk in enumerate(blocks):
            if can_label:
                ids += list(self.tokenizer.encode(f"\nImage {i + 1}: "))
            ids += [tok_id] * blk.shape[1]
        if can_label:
            ids += list(self.tokenizer.encode("\n"))
        ids += list(text_ids)
        ids_arr = jnp.asarray([ids], jnp.int32)
        text_embeds = self.lm_params["embed_tokens"][
            jnp.where(ids_arr == self.vision_config.image_token_id, 0, ids_arr)
        ]
        merged = qwen35_vision.merge_image_embeddings(
            text_embeds, ids_arr, img_embeds, self.vision_config.image_token_id
        )
        return ids_arr, merged

    def chat(self, system: str, user: str, image: Optional[np.ndarray] = None,
             max_tokens: int = 128, seed: int = 0,
             gen_params: Optional[generation.GenerateParameters] = None) -> str:
        """(system, user, image) -> reply; the VLMPromptBuilder callable.

        Streaming generation over the hybrid dual cache (conv + recurrent
        states for linear-attention layers, KV cache for full-attention —
        Qwen35Model.swift:1-45): one compiled prefill + one compiled decode
        step regardless of length.
        """
        messages = [{"role": "system", "content": system}, {"role": "user", "content": user}]
        text_ids = list(self.tokenizer.apply_chat_template(messages, add_generation_prompt=True))
        ids, merged = self._merged_inputs(text_ids, image)

        # Bucket so prompt-length jitter reuses the compiled decode loop.
        max_len = -(-(ids.shape[1] + max_tokens) // 256) * 256
        cache = qwen35.init_hybrid_cache(self.lm_config, batch=1, max_len=max_len)
        logits, cache = _qwen35_prefill(self.lm_config)(self.lm_params, ids, cache, merged)

        # Greedy decode via the shared chunked device loop: carry is
        # (hybrid cache, absolute position) because forward_cached threads
        # start_pos explicitly for MRoPE.
        cfg = self.lm_config

        def step_fn(p, tok, carry):
            c, pos = carry
            lg, nc = qwen35.forward_cached(p, cfg, tok, c, pos)
            return lg, (nc, pos + 1)

        eos = getattr(self.tokenizer, "eos_token_id", None)
        out = generation.decode_loop(
            self.lm_params, logits, (cache, jnp.int32(ids.shape[1])),
            loop_key=("qwen35", cfg),
            step_fn=step_fn, carry_len=lambda carry: carry[1],
            max_len=max_len,
            gen_params=(
                dataclasses.replace(gen_params, max_tokens=max_tokens)
                if gen_params is not None
                else generation.GenerateParameters(
                    max_tokens=max_tokens, temperature=0.0, repetition_penalty=1.0
                )
            ),
            eos_token_ids=[eos] if eos is not None else None,
            seed=seed,
        )
        return self.tokenizer.decode(out)

    def analyze_image(
        self,
        image: np.ndarray,
        prompt: str,
        gen_params: Optional[generation.GenerateParameters] = None,
        seed: int = 0,
    ) -> str:
        """Image + prompt -> description (the FluxTextEncoders.analyzeImage
        surface, Qwen3.5 flavor): a vision chat turn with thinking off."""
        gp = gen_params or generation.GenerateParameters(max_tokens=128, temperature=0.2)
        return self.chat(
            "You are a precise visual analyst. Answer directly about the attached image.",
            prompt, image=image, max_tokens=gp.max_tokens, seed=seed, gen_params=gp,
        )

    def compare_images_for_flux(
        self, reference: np.ndarray, generated: np.ndarray, max_tokens: int = 300
    ) -> dict:
        """Two-image FLUX.2 LoRA-evaluation comparison: image 1 = reference,
        image 2 = generated; returns {"scene_score", "scene_reason",
        "style_score", "style_reason"} on the 0-100 scale
        (FluxTextEncoders.swift:564-614 compareImagesForFlux)."""
        reply = self.chat(
            FLUX_IMAGE_COMPARISON_SYSTEM_PROMPT,
            "Compare these two images.",
            image=[reference, generated],
            max_tokens=max_tokens,
        )
        return parse_comparison(reply)

    def score_validation_image(
        self, image: np.ndarray, reference_images: Sequence[np.ndarray], prompt: str
    ) -> Tuple[float, float]:
        """(scene, style) 0-10 — the trainer's VLMScorer callable."""
        reply = self.chat(
            SCORING_SYSTEM_PROMPT,
            f"Prompt: {prompt}. Score the attached generated image.",
            image=image,
            max_tokens=24,
        )
        return parse_scores(reply)
