"""RePaint masked inpainting chain (no Fill checkpoint needed).

Capability parity with ``Sources/Flux2Chains/Flux2MaskedInpaintingChain.swift``:
  - VAE-encode the source once; rasterize the mask to the latent token grid;
    draw the blend noise once (seeded).
  - Register a step hook that forces outside-mask latents back to the
    source's trajectory each step:
        (1-m) * ((1-sigma_next)*img_latents + sigma_next*blend_noise) + m*latents
    On the final step sigma_next == 0, so kept latents land exactly on the
    clean source (:380-400).
  - Modes: pure T2I, source-as-I2I-reference, explicit reference images.
  - img2img strength < 1 initializes from the source latents (:100-112).
  - Crop-and-stitch (diffusers padding_mask_crop): mask bbox -> expanded
    crop -> inpaint the crop -> pixel-composite onto the untouched original
    (:314-356, :430-468).
  - Two mask conventions: grayscale (white = inpaint) and alpha
    (transparent = inpaint).

TPU shape: the hook is a STRUCTURED (fn, state) pair — the module-level
``repaint_step_hook`` plus a traced state pytree (mask/source/noise) — so
every call at the same shapes reuses ONE compiled denoise scan (different
masks/images are jit operands, not per-closure recompiles); all mask
geometry is host-side numpy. Opt-in VLM prompt enrichment
(``enrich_prompt_with_vlm`` + ``intent``) mirrors
Flux2MaskedInpaintingChain.swift:472-514: strictly optional, warns and
falls back to the verbatim prompt when no VLM is loaded, wins over
``upsample_prompt`` when both are set.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flux2_tpu.ops import latents as lu
from flux2_tpu.pipeline.pipeline import Flux2Pipeline, GenerationResult

GRAYSCALE_WHITE_INPAINT = "grayscale_white_inpaint"
ALPHA_TRANSPARENT_INPAINT = "alpha_transparent_inpaint"


def repaint_step_hook(state, latents, sigma, sigma_next, step_idx):
    """RePaint latent blend, as a STRUCTURED step hook (module-level fn +
    traced state) so every inpaint/outpaint call at the same shapes reuses
    ONE compiled denoise scan — the mask/source/noise arrays ride as jit
    operands, not per-closure HLO constants.

    state: {"image": [B,S,128] clean source latents, "mask": [B,S,1]
    (1 = inpaint), "noise": [B,S,128] fixed blend noise}. Forces
    outside-mask latents back onto the source's diffusion trajectory
    (Flux2MaskedInpaintingChain.swift:380-400); at the final step
    sigma_next == 0, so kept latents land exactly on the clean source."""
    renoised = (1.0 - sigma_next) * state["image"] + sigma_next * state["noise"]
    return (1.0 - state["mask"]) * renoised + state["mask"] * latents


def resolve_chain_dimensions(width: int, height: int, max_pixels: int = 4 * 1024 * 1024) -> Tuple[int, int]:
    """Clamp to max_pixels, rounding DOWN to multiples of 32
    (Flux2Pipeline+ChainHelpers.swift:112-129)."""
    scale = min(1.0, (max_pixels / max(1, width * height)) ** 0.5)
    w = max(32, int(width * scale) // 32 * 32)
    h = max(32, int(height * scale) // 32 * 32)
    return h, w


def pack_mask_for_latent_blending(
    mask: np.ndarray,
    target_height: int,
    target_width: int,
    convention: str = GRAYSCALE_WHITE_INPAINT,
) -> jnp.ndarray:
    """Rasterize a pixel mask to the latent token grid -> [1, seq, 1] in [0,1].

    1.0 = inpaint (regenerate), 0.0 = keep. Accepts [H, W] grayscale in
    [0, 1], [H, W, 3(4)] images, with either convention
    (ChainHelpers.swift:148-236).
    """
    lh, lw = target_height // 16, target_width // 16
    if convention == ALPHA_TRANSPARENT_INPAINT:
        if mask.ndim != 3 or mask.shape[2] < 4:
            raise ValueError("alpha convention requires an RGBA mask")
        plane = 1.0 - mask[..., 3]  # transparent (alpha 0) = inpaint
    else:
        plane = mask[..., :3].mean(axis=-1) if mask.ndim == 3 else mask
    plane = np.clip(np.asarray(plane, np.float32), 0.0, 1.0)
    resized = _area_resize(plane, lh, lw)
    return jnp.asarray(resized.reshape(1, lh * lw, 1))


def _area_resize(plane: np.ndarray, lh: int, lw: int) -> np.ndarray:
    """Average-pool resize of a [H, W] plane to [lh, lw] (native C++ op with
    numpy fallback — flux2_tpu.utils.native)."""
    if plane.shape == (lh, lw):
        return np.asarray(plane, np.float32)
    from flux2_tpu.utils import native

    return native.area_resize(plane, lh, lw)


def mask_bounding_box(mask: np.ndarray, convention: str = GRAYSCALE_WHITE_INPAINT, threshold: float = 0.5):
    """(x0, y0, x1, y1) of the inpaint region, or None when empty."""
    if convention == ALPHA_TRANSPARENT_INPAINT:
        plane = 1.0 - mask[..., 3]
    else:
        plane = mask[..., :3].mean(axis=-1) if mask.ndim == 3 else mask
    ys, xs = np.where(plane > threshold)
    if len(ys) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def expand_crop_region(
    bbox: Tuple[int, int, int, int], padding: int, image_width: int, image_height: int
) -> Tuple[int, int, int, int]:
    """Expand the bbox by padding, clamp to image, round to multiples of 32."""
    x0, y0, x1, y1 = bbox
    x0 = max(0, x0 - padding)
    y0 = max(0, y0 - padding)
    x1 = min(image_width, x1 + padding)
    y1 = min(image_height, y1 + padding)
    # grow to x32 (extending outward where possible)
    w = -(-(x1 - x0) // 32) * 32
    h = -(-(y1 - y0) // 32) * 32
    x0 = max(0, min(x0, image_width - w))
    y0 = max(0, min(y0, image_height - h))
    return x0, y0, min(image_width, x0 + w), min(image_height, y0 + h)


def composite_on_original(
    original: np.ndarray,
    generated: np.ndarray,
    mask: np.ndarray,
    crop_rect: Optional[Tuple[int, int, int, int]] = None,
    convention: str = GRAYSCALE_WHITE_INPAINT,
) -> np.ndarray:
    """Per-pixel soft-mask overlay of generated content onto the original
    (diffusers apply_overlay; Flux2InpaintCompositing.swift)."""
    out = np.array(original, np.float32)
    x0, y0, x1, y1 = crop_rect or (0, 0, original.shape[1], original.shape[0])
    gen = generated
    if gen.shape[:2] != (y1 - y0, x1 - x0):
        gen = _resize_rgb(gen, y1 - y0, x1 - x0)
    if convention == ALPHA_TRANSPARENT_INPAINT:
        plane = 1.0 - mask[..., 3]
    else:
        plane = mask[..., :3].mean(axis=-1) if mask.ndim == 3 else mask
    if plane.shape != (y1 - y0, x1 - x0):
        plane = _area_resize(np.asarray(plane, np.float32), y1 - y0, x1 - x0)
    from flux2_tpu.utils import native

    m = np.clip(plane, 0, 1)
    out[y0:y1, x0:x1] = native.soft_composite(out[y0:y1, x0:x1], gen[..., :3], m)
    return out


def _resize_rgb(img: np.ndarray, h: int, w: int) -> np.ndarray:
    try:
        from PIL import Image

        im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        return np.asarray(im.resize((w, h), Image.LANCZOS), np.float32) / 255.0
    except ImportError:
        ys = (np.arange(h) * img.shape[0] / h).astype(int)
        xs = (np.arange(w) * img.shape[1] / w).astype(int)
        return img[ys][:, xs]


def _vlm_builder_from_pipeline(pipe):
    """Wrap the pipeline's ALREADY-LOADED vision service as a VLMPromptBuilder.

    Never auto-loads (``vlm_loader`` is deliberately not consulted): the
    caller owns the VLM lifecycle, matching the reference's strictly-optional
    semantics (Flux2MaskedInpaintingChain.swift:491-494 guards on
    isQwen35VLMLoaded and warns instead of loading)."""
    from flux2_tpu.chains.vlm_prompt import VLMPromptBuilder

    vlm = getattr(pipe, "vlm", None)
    if vlm is None:
        return None
    if hasattr(vlm, "chat"):  # Qwen35VLMService.chat(system, user, image=)
        return VLMPromptBuilder(vlm_chat=lambda s, u, img: vlm.chat(s, u, image=np.asarray(img)))
    if hasattr(vlm, "analyze_image"):  # MistralVLMService
        return VLMPromptBuilder(
            vlm_chat=lambda s, u, img: vlm.analyze_image(np.asarray(img), f"{s}\n\n{u}")
        )
    return None


def _normalize_intent(intent):
    from flux2_tpu.chains.vlm_prompt import InpaintIntent

    if isinstance(intent, InpaintIntent):
        return intent
    return InpaintIntent(str(intent).replace("-", "_"))


@dataclasses.dataclass
class MaskedInpaintingChain:
    """RePaint inpainting over a Flux2Pipeline."""

    pipeline: Flux2Pipeline
    prompt: str
    image: np.ndarray  # [H, W, 3] float in [0, 1]
    mask: np.ndarray  # [H, W] or [H, W, C]
    mask_convention: str = GRAYSCALE_WHITE_INPAINT
    reference_images: Optional[Sequence[np.ndarray]] = None
    use_image_as_reference: bool = False
    steps: int = 4
    guidance: Optional[float] = None
    seed: int = 0
    strength: float = 1.0
    mask_crop_padding: Optional[int] = None  # crop-and-stitch when set
    composite_on_original: bool = False
    max_pixels: int = 4 * 1024 * 1024
    embeddings: Optional[jnp.ndarray] = None  # precomputed conditioning
    # Text-encoder-only prompt rewriting (does NOT look at the image); loses
    # to enrich_prompt_with_vlm when both are set.
    upsample_prompt: bool = False
    # Opt-in image-aware prompt rewriting via an attached VLM. Strictly
    # optional: falls back to the verbatim prompt with a warning when no VLM
    # is loaded (Flux2MaskedInpaintingChain.swift:472-514).
    enrich_prompt_with_vlm: bool = False
    intent: object = "replace"  # InpaintIntent or its string value
    vlm_builder: Optional[object] = None  # explicit VLMPromptBuilder override

    def _resolve_final_prompt_and_upsample(self):
        """(final prompt, downstream upsample flag) with the reference's
        precedence: VLM enrichment wins over upsampling; missing/failing VLM
        falls back to the caller's prompt + caller's upsample flag
        (Flux2MaskedInpaintingChain.swift:486-514)."""
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
                "back to the caller's prompt (attach one to the pipeline or "
                "pass vlm_builder= before run())"
            )
            return self.prompt, self.upsample_prompt
        if self.upsample_prompt:
            flog.warning(
                "both enrich_prompt_with_vlm and upsample_prompt are set — "
                "VLM wins (image-aware enrichment supersedes text-only upsampling)"
            )
        built = builder.build_inpaint_prompt(
            _normalize_intent(self.intent), self.prompt, self.image
        )
        if not built:
            flog.warning("VLM returned no prompt — falling back to the caller's prompt")
            return self.prompt, self.upsample_prompt
        flog.info(f"VLM-enriched inpaint prompt: {built}")
        return built, False  # prompt already finalised; never double-process

    def run(self) -> GenerationResult:
        final_prompt, use_upsample = self._resolve_final_prompt_and_upsample()
        work_image, work_mask = self.image, self.mask
        crop_rect = None
        if self.mask_crop_padding is not None:
            bbox = mask_bounding_box(self.mask, self.mask_convention)
            if bbox is not None:
                crop_rect = expand_crop_region(
                    bbox, self.mask_crop_padding, self.image.shape[1], self.image.shape[0]
                )
                x0, y0, x1, y1 = crop_rect
                work_image = self.image[y0:y1, x0:x1]
                mh, mw = self.mask.shape[:2]
                ih, iw = self.image.shape[:2]
                my0, my1 = y0 * mh // ih, y1 * mh // ih
                mx0, mx1 = x0 * mw // iw, x1 * mw // iw
                work_mask = self.mask[my0:my1, mx0:mx1]

        target_h, target_w = resolve_chain_dimensions(
            work_image.shape[1], work_image.shape[0], self.max_pixels
        )
        if work_image.shape[:2] != (target_h, target_w):
            work_image = _resize_rgb(work_image, target_h, target_w)

        # Encode source once; pack mask to the latent grid.
        image_latents = self.pipeline.encode_image_to_packed_sequence(work_image)
        mask_latents = pack_mask_for_latent_blending(
            work_mask, target_h, target_w, self.mask_convention
        )

        # Blend noise drawn once (seeded) and reused at every step, so the
        # kept region follows one consistent diffusion trajectory.
        blend_key = jax.random.PRNGKey(self.seed)
        blend_noise = jax.random.normal(blend_key, image_latents.shape, jnp.float32)

        # Structured hook: (module-level fn, traced state) — repeat calls at
        # the same shape (different masks/images) reuse the compiled scan.
        hook = (
            repaint_step_hook,
            {
                "image": image_latents.astype(jnp.float32),
                "mask": mask_latents.astype(jnp.float32),
                "noise": blend_noise,
            },
        )

        ref_latents = ref_ids = None
        if self.reference_images:
            ref_latents, ref_ids = self.pipeline.encode_reference_images(self.reference_images)
        elif self.use_image_as_reference:
            ref_latents, ref_ids = self.pipeline.encode_reference_images([work_image])

        result = self.pipeline.generate(
            prompt=final_prompt,
            upsample=use_upsample and self.embeddings is None,
            embeddings=self.embeddings,
            height=target_h,
            width=target_w,
            num_steps=self.steps,
            guidance=self.guidance,
            seed=self.seed,
            reference_latents=ref_latents,
            reference_ids=ref_ids,
            strength=self.strength,
            init_latents=image_latents if self.strength < 1.0 else None,
            step_hook=hook,
        )

        if crop_rect is not None or self.composite_on_original:
            composited = composite_on_original(
                self.image, result.image, work_mask, crop_rect, self.mask_convention
            )
            result = dataclasses.replace(result, image=composited)
        return result
