"""BFL-style outpainting chain.

Capability parity with ``Sources/Flux2Chains/Flux2OutpaintingChain.swift``:
per-side paddings rounded UP to multiples of 32; extended canvas = mid-grey
Gaussian noise with the original pasted at (left, top); "smart mask" = 1.0
in the new strips with a linear transition band living INSIDE the keep
region (strips stay pure paint, no seed contamination, :397-470); the
original image is passed as an I2I reference so attention continues its
style/perspective into the strips; then delegates to the RePaint inpainting
chain.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from flux2_tpu.chains.inpaint import GRAYSCALE_WHITE_INPAINT, MaskedInpaintingChain
from flux2_tpu.pipeline.pipeline import Flux2Pipeline, GenerationResult


def round_up_32(v: int) -> int:
    return -(-v // 32) * 32


def build_outpaint_canvas(
    image: np.ndarray, top: int, bottom: int, left: int, right: int, seed: int = 0
) -> np.ndarray:
    """Extended canvas: mid-grey Gaussian noise + original pasted at (l, t)."""
    h, w = image.shape[:2]
    ch, cw = h + top + bottom, w + left + right
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    canvas = np.clip(0.5 + 0.12 * rng.randn(ch, cw, 3), 0.0, 1.0).astype(np.float32)
    canvas[top : top + h, left : left + w] = image[..., :3]
    return canvas


def build_smart_mask(
    canvas_h: int,
    canvas_w: int,
    keep_x: int,
    keep_y: int,
    keep_w: int,
    keep_h: int,
    transition_pixels: int = 32,
) -> np.ndarray:
    """1.0 in the strips, 0.0 deep in the keep, linear ramp on the keep side.

    The ramp only appears on sides that actually have a strip
    (Flux2OutpaintingChain.swift:397-460).
    """
    mask = np.ones((canvas_h, canvas_w), np.float32)
    mask[keep_y : keep_y + keep_h, keep_x : keep_x + keep_w] = 0.0

    band_w = max(1, min(transition_pixels, keep_w // 2))
    band_h = max(1, min(transition_pixels, keep_h // 2))
    ramp_w = (band_w - np.arange(band_w, dtype=np.float32)) / band_w  # 1 -> ~0
    ramp_h = (band_h - np.arange(band_h, dtype=np.float32)) / band_h

    region = mask[keep_y : keep_y + keep_h, keep_x : keep_x + keep_w]
    if keep_x > 0:  # left strip exists
        region[:, :band_w] = np.maximum(region[:, :band_w], ramp_w[None, :])
    if keep_x + keep_w < canvas_w:  # right strip
        region[:, keep_w - band_w :] = np.maximum(region[:, keep_w - band_w :], ramp_w[::-1][None, :])
    if keep_y > 0:  # top strip
        region[:band_h, :] = np.maximum(region[:band_h, :], ramp_h[:, None])
    if keep_y + keep_h < canvas_h:  # bottom strip
        region[keep_h - band_h :, :] = np.maximum(region[keep_h - band_h :, :], ramp_h[::-1][:, None])
    return mask


@dataclasses.dataclass
class OutpaintingChain:
    pipeline: Flux2Pipeline
    image: np.ndarray  # [H, W, 3] float in [0, 1]
    prompt: str
    top: int = 0
    bottom: int = 0
    left: int = 0
    right: int = 0
    steps: int = 4
    guidance: Optional[float] = None
    seed: int = 0
    transition_pixels: int = 32
    max_pixels: int = 4 * 1024 * 1024
    embeddings: Optional[object] = None
    # Text-encoder-only rewriting (loses to enrich_prompt_with_vlm).
    upsample_prompt: bool = False
    # Opt-in image-aware rewriting: the VLM sees the ORIGINAL image and the
    # extension sides, then writes a prompt continuing its materials/
    # perspective/lighting into the strips. Strictly optional — warns and
    # falls back when no VLM is loaded (Flux2OutpaintingChain.swift:238-264;
    # enrichment resolves HERE, on the original image, and the inner inpaint
    # chain runs with enrichment off so it is never double-processed).
    enrich_prompt_with_vlm: bool = False
    vlm_builder: Optional[object] = None

    def _resolve_final_prompt_and_upsample(self):
        from flux2_tpu.chains.inpaint import _vlm_builder_from_pipeline
        from flux2_tpu.utils import logging as flog

        if not self.enrich_prompt_with_vlm:
            return self.prompt, self.upsample_prompt
        if self.embeddings is not None:
            flog.warning(
                "enrich_prompt_with_vlm ignored: precomputed embeddings were "
                "passed, so the prompt never reaches the encoder — drop "
                "embeddings= to let the VLM-enriched prompt take effect"
            )
            return self.prompt, self.upsample_prompt
        builder = self.vlm_builder or _vlm_builder_from_pipeline(self.pipeline)
        if builder is None or not builder.is_loaded:
            flog.warning(
                "enrich_prompt_with_vlm=True but no VLM is loaded — falling "
                "back to the caller's prompt"
            )
            return self.prompt, self.upsample_prompt
        if self.upsample_prompt:
            flog.warning(
                "both enrich_prompt_with_vlm and upsample_prompt are set — VLM wins"
            )
        sides = [
            name
            for name, pad in (
                ("top", self.top), ("bottom", self.bottom),
                ("left", self.left), ("right", self.right),
            )
            if pad > 0
        ]
        built = builder.build_outpaint_prompt(self.prompt, self.image, sides)
        if not built:
            flog.warning("VLM returned no prompt — falling back to the caller's prompt")
            return self.prompt, self.upsample_prompt
        flog.info(f"VLM-enriched outpaint prompt: {built}")
        return built, False

    def run(self) -> GenerationResult:
        if min(self.top, self.bottom, self.left, self.right) < 0:
            raise ValueError("padding values must be non-negative")
        if self.top + self.bottom + self.left + self.right == 0:
            raise ValueError("at least one side must have non-zero padding")
        t = round_up_32(self.top) if self.top else 0
        b = round_up_32(self.bottom) if self.bottom else 0
        l = round_up_32(self.left) if self.left else 0
        r = round_up_32(self.right) if self.right else 0

        h, w = self.image.shape[:2]
        canvas_h, canvas_w = h + t + b, w + l + r
        if canvas_h % 32 or canvas_w % 32:
            raise ValueError(
                f"canvas {canvas_w}x{canvas_h} not a multiple of 32 — pad the "
                "source image or adjust paddings"
            )

        canvas = build_outpaint_canvas(self.image, t, b, l, r, self.seed)
        mask = build_smart_mask(canvas_h, canvas_w, l, t, w, h, self.transition_pixels)

        final_prompt, use_upsample = self._resolve_final_prompt_and_upsample()
        inpaint = MaskedInpaintingChain(
            pipeline=self.pipeline,
            prompt=final_prompt,
            upsample_prompt=use_upsample,
            enrich_prompt_with_vlm=False,  # resolved above on the ORIGINAL image
            image=canvas,
            mask=mask,
            mask_convention=GRAYSCALE_WHITE_INPAINT,
            reference_images=[self.image],  # I2I conditioning continues the scene
            steps=self.steps,
            guidance=self.guidance,
            seed=self.seed,
            max_pixels=max(self.max_pixels, canvas_w * canvas_h),
            embeddings=self.embeddings,
        )
        return inpaint.run()
