"""FLUX.2 generation pipeline: T2I, multi-reference I2I, img2img strength.

Capability parity with ``Sources/Flux2Core/Pipeline/Flux2Pipeline.swift``
(T2I :1857-2117, I2I :1455-1855, step hooks :42-64, classical CFG :1955-1973,
reference encoding :2143-2252), re-architected for TPU:

  - The reference's memory-first two-phase choreography (load encoder ->
    encode -> unload -> load transformer; Flux2Pipeline.swift:89-98)
    dissolves: on a TPU mesh both models stay resident, sharded. The phase
    *structure* (encode -> denoise -> decode) and its API survive.
  - The denoising loop is ONE compiled ``lax.scan`` over the sigma schedule:
    per-step state (latents, RNG key) is the carry; sigmas are the xs. Step
    hooks (chains) are jittable latent transforms folded into the scan body —
    the functional replacement for ``Flux2StepHook``.
  - Classical CFG (base models) runs cond/uncond as batch rows of one
    forward, not two sequential passes.
  - Multi-reference I2I concatenates clean reference tokens after the output
    tokens each step and slices the velocity back out — same conditioning
    semantics as the reference's standard path (:1685-1810).

Everything under ``generate`` jit-compiles once per (resolution, step-count,
model) and is cached.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.experimental
import jax.numpy as jnp
import numpy as np

from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.models.flux2 import vae as vae_mod
from flux2_tpu.models.flux2.config import Flux2Model, Flux2TransformerConfig
from flux2_tpu.ops import latents as lu
from flux2_tpu.ops import scheduler as sch
from flux2_tpu.ops.rope import rope_embeddings

_jit_rope = jax.jit(rope_embeddings)


@functools.lru_cache(maxsize=32)
def _rope_cache(ids_bytes: bytes, n: int, dtype_str: str):
    ids = np.frombuffer(ids_bytes, dtype=np.dtype(dtype_str)).reshape(n, -1)
    return _jit_rope(jnp.asarray(ids))


def cached_rope_embeddings(ids: np.ndarray):
    """cos/sin for a host-side position-id table, computed as ONE jitted
    dispatch and memoized per distinct table. Eager `rope_embeddings` is
    ~25 separate device ops — on a tunneled chip that is ~25 round trips
    per generate call (the same host-loop-boundary failure mode as the
    round-4 encode fixes, docs/knowledge/decisions/jit-the-host-loop-
    boundary.md); repeat calls at one resolution now cost zero device work."""
    ids = np.ascontiguousarray(ids)
    return _rope_cache(ids.tobytes(), ids.shape[0], str(ids.dtype))


@functools.partial(jax.jit, static_argnames=("height", "width", "batch"))
def _seeded_noise_seq(seed, height, width, batch):
    """Seed -> packed initial-noise sequence as ONE compiled program (PRNG
    key derivation, patchified normal draw, and sequence pack fused; seed is
    a traced operand so new seeds don't recompile)."""
    key = jax.random.PRNGKey(seed)
    _, noise_key = jax.random.split(key)
    noise_p = lu.generate_patchified_latents(noise_key, height, width, batch_size=batch)
    return lu.pack_patchified_to_sequence(noise_p)


# A step hook mutates the latent sequence inside the compiled scan — the
# functional form of the reference's Flux2StepHook (Flux2Pipeline.swift:42-64).
# Two accepted shapes:
#   - STRUCTURED (compile-once): a ``(fn, state)`` pair where ``fn`` is a
#     module-level function ``fn(state, latents_seq, sigma, sigma_next,
#     step_index) -> latents_seq`` and ``state`` is a pytree of arrays. The
#     state rides as a TRACED jit operand, so calling with different state
#     (e.g. a new inpaint mask at the same shape) reuses the compiled scan —
#     and the arrays are real jit inputs, not multi-MB HLO constants.
#   - LEGACY: a bare callable ``hook(latents_seq, sigma, sigma_next,
#     step_index)``; its identity is a jit static arg, so each new closure
#     recompiles (kept for ad-hoc experimentation only).
StepHook = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _normalize_hook(step_hook):
    """Split the public ``step_hook`` arg into (static fn, traced state)."""
    if step_hook is None:
        return None, None
    if isinstance(step_hook, tuple):
        if len(step_hook) != 2 or not callable(step_hook[0]):
            raise TypeError("structured step_hook must be (fn, state_pytree)")
        return step_hook
    return step_hook, None


def _apply_hook(hook, hook_state, lat, sigma, sigma_next, step_idx):
    if hook_state is not None:
        return hook(hook_state, lat, sigma, sigma_next, step_idx)
    return hook(lat, sigma, sigma_next, step_idx)


class GenerationCancelled(RuntimeError):
    """Raised when a host-side cancel flag aborts a generate() mid-denoise.

    TPU counterpart of the reference's in-loop transformer-nil guard
    (Flux2Pipeline.swift:1940-1942): the compiled scan is aborted from the
    per-step progress io_callback, so cancellation granularity is one
    denoising step."""


@dataclasses.dataclass
class GenerationResult:
    # NOTE: `image`/`images` are float32 in [0, 1] but quantized to 1/255
    # steps — decode transfers uint8 off-device (4x less host traffic; the
    # image is headed for a uint8 PNG anyway). Callers needing full-precision
    # floats should call Flux2Pipeline.decode_latents(result.latents, ...)
    image: np.ndarray  # [H, W, 3] float32 in [0, 1] (first batch element)
    latents_device: Any  # final packed latents [B, S, 128] (jax.Array, on device)
    seed: int
    num_steps: int
    duration_s: float
    phase_timings: Dict[str, float]
    images: Optional[np.ndarray] = None  # [B, H, W, 3] when batch > 1
    final_prompt: Optional[str] = None  # prompt actually encoded (after VLM rewrite)
    was_upsampled: bool = False
    memory_stats: Optional[Dict[str, Dict[str, float]]] = None  # per-phase HBM

    @property
    def latents(self) -> np.ndarray:
        """Final packed latents [B, S, 128] as a host array.

        Fetched LAZILY: most callers (CLI image writes, serve, chains) never
        read the latents, and an eager np.asarray in generate() charged every
        call a ~2 MB device->host fetch through the tunnel (~25 ms fixed
        latency + ~45 MB/s — docs/knowledge/decisions/axon-microbenchmarks.md).
        jax.Array caches its host copy, so repeat access transfers once."""
        return np.asarray(self.latents_device)


@dataclasses.dataclass
class Flux2Pipeline:
    """Holds params + configs; exposes generate()."""

    model: Flux2Model
    transformer_params: Any
    transformer_config: Flux2TransformerConfig
    vae_params: Any
    vae_config: vae_mod.VAEConfig
    text_encoder: Optional[Any] = None  # EmbeddingExtractor (callable prompt -> emb)
    text_encoder_name: Optional[str] = None  # facade key of the attached encoder
    encoders: Optional[Any] = None  # TextEncoders facade (chat/upsample surface)
    vlm: Optional[Any] = None  # vision service with analyze_image() (Pixtral+Mistral)
    vlm_loader: Optional[Callable[[], Any]] = None  # lazy VLM load (Klein Mistral-swap)
    max_pixels: int = 4096 * 4096
    mesh: Optional[Any] = None  # jax.sharding.Mesh; set via shard()
    ring: Optional[Any] = None  # (mesh, axis) for sequence-parallel attention; set via shard()
    memory_profile: Optional[Any] = None  # utils.memory.MemoryProfile (VAE tiling etc.)
    # LoRA runtime semantics (applied by merged Turbo-style LoRAs;
    # LoRAConfig.swift:7-32 applied at Flux2Pipeline.swift:1879-1908 and
    # LoRAAdapter.swift:189-199): explicit generate() args always win.
    lora_custom_sigmas: Optional[Sequence[float]] = None
    lora_num_steps: Optional[int] = None
    lora_guidance: Optional[float] = None
    lora_keywords: Sequence[str] = ()
    # VAE decode compute dtype. The reference decodes in the checkpoint's
    # stream dtype (bf16) with f32 GroupNorm statistics (ResnetBlock.swift:
    # 33-47); matching that halves decode HBM traffic and conv time on the
    # MXU. Set to jnp.float32 for full-precision quality comparisons.
    vae_compute_dtype: Any = jnp.bfloat16

    # ------------------------------------------------------------------
    # Construction helpers
    # ------------------------------------------------------------------

    @classmethod
    def from_random(
        cls,
        model: Flux2Model = Flux2Model.KLEIN_4B,
        key: Optional[jax.Array] = None,
        dtype: jnp.dtype = jnp.bfloat16,
        transformer_config: Optional[Flux2TransformerConfig] = None,
        vae_config: Optional[vae_mod.VAEConfig] = None,
    ) -> "Flux2Pipeline":
        """Random-init pipeline (tests / benchmarks without checkpoints)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        tc = transformer_config or model.transformer_config
        vc = vae_config or vae_mod.FLUX2_VAE
        return cls(
            model=model,
            transformer_params=tfm.init_params(k1, tc, dtype=dtype),
            transformer_config=tc,
            vae_params=vae_mod.init_params(k2, vc, dtype=jnp.float32),
            vae_config=vc,
        )

    def shard(self, mesh, context_parallel: bool = False) -> "Flux2Pipeline":
        """Distribute parameters over a (data, fsdp, tp) mesh.

        The reference's scale levers (phase-wise load/unload, eval
        segmentation, cache limits — Flux2Pipeline.swift:89-98) are replaced
        wholesale by GSPMD sharding: DiT attention heads + MLP hidden shard
        over tp, weights-at-rest over fsdp, and XLA inserts the collectives.

        ``context_parallel=True`` additionally runs every attention as
        sequence-parallel ring attention (token axis sharded, K/V rotating
        on the ICI ring) — the long-sequence lever for multi-reference I2I
        where the joint sequence outgrows one chip's O(S^2/n) attention
        memory. Uses the dedicated ``sp`` axis when the mesh sizes it (>1),
        else the ``tp`` axis (which costs a head-sharded -> seq-sharded
        reshard at the ring boundary). Requires the joint token count to
        divide by the chosen axis size.
        """
        from flux2_tpu.parallel import sharding as sh
        from flux2_tpu.parallel.mesh import SP_AXIS, TP_AXIS

        self.transformer_params = sh.shard_params(self.transformer_params, mesh, sh.DIT_RULES)
        self.vae_params = sh.shard_params(self.vae_params, mesh, sh.VAE_RULES)
        self.mesh = mesh
        if context_parallel:
            axis = SP_AXIS if mesh.shape.get(SP_AXIS, 1) > 1 else TP_AXIS
            self.ring = (mesh, axis)
        else:
            self.ring = None
        return self

    def _mesh_ctx(self):
        import contextlib

        if self.mesh is None:
            return contextlib.nullcontext()
        # Scope both the mesh and the quant custom_partitioning routing to
        # this pipeline's compute: unsharded encoders / other pipelines in
        # the same process keep the plain kernel path.
        from flux2_tpu.ops import quant as _quant

        # LAZY: contexts must activate at ``with``-entry, not at call time —
        # an eagerly-entered ExitStack would leak the mesh + the process-
        # global partitioned-runtime flag if anything raised before the
        # ``with`` statement was reached.
        @contextlib.contextmanager
        def ctx():
            with self.mesh, _quant.partitioned_runtime(True):
                yield

        return ctx()

    # ------------------------------------------------------------------
    # Phase 1: text encoding
    # ------------------------------------------------------------------

    # Prompt-embedding LRU size. Entries live on device (~7.5 MB each for
    # Klein-4B [1,512,7680] bf16), so the cache is kept small; the classical-
    # CFG "" negative — re-encoded on EVERY base-model generate() in the
    # reference (Flux2Pipeline.swift:1392-1404), ~2 s of encoder work per
    # call on a tunneled chip — stays hot under LRU since every CFG call
    # touches it.
    PROMPT_CACHE_SIZE = 8

    def encode_prompt(self, prompt: str) -> jnp.ndarray:
        if self.text_encoder is None:
            raise ValueError("no text encoder attached; pass `embeddings=` to generate()")
        # Cache keyed by (encoder identity, prompt): repeat prompts and the
        # CFG "" negative skip the full encoder forward. The encoder object
        # is held strongly in the sentinel slot, so an id() collision after
        # GC cannot alias a stale entry; swapping text_encoder clears it.
        cache = self.__dict__.setdefault("_prompt_cache", {})
        if cache.get("_encoder") is not self.text_encoder:
            cache.clear()
            cache["_encoder"] = self.text_encoder
        key = ("emb", prompt)
        if key in cache:
            cache[key] = cache.pop(key)  # re-insert: LRU recency
            return cache[key]
        # under the mesh context so a sharded W8A8/W4A8 encoder keeps the
        # custom_partitioning kernel routing (GSPMD would otherwise
        # all-gather the int8 codes around each opaque pallas call)
        with self._mesh_ctx():
            emb = self.text_encoder(prompt)
        cache[key] = emb
        while len(cache) > self.PROMPT_CACHE_SIZE + 1:  # +1: encoder sentinel
            oldest = next(k for k in cache if k != "_encoder")
            del cache[oldest]
        return emb

    # -- VLM prompt services (interpret / upsample) ----------------------

    VLM_ANALYSIS_PROMPT = (
        "Describe this image in detail. Focus on the main subject, colors, "
        "style, and any notable elements."
    )

    def _get_vlm(self):
        """Resolve the vision service, lazily loading it on first use.

        The reference's Klein path temporarily swaps Qwen3 out for the
        Mistral VLM to gain vision (Flux2Pipeline.swift:1290-1385); with HBM
        sharding both can stay resident, so the "swap" reduces to a lazy
        load via ``vlm_loader``.
        """
        if self.vlm is None and self.vlm_loader is not None:
            self.vlm = self.vlm_loader()
        return self.vlm

    def interpret_images(self, images: Sequence[np.ndarray], prompt: str, seed: int = 0) -> str:
        """VLM semantic analysis injected into the prompt (--interpret).

        Parity with Flux2Pipeline.swift:1253-1326: describe each image,
        prefix the descriptions, append the user request.
        """
        vlm = self._get_vlm()
        if vlm is None:
            raise ValueError(
                "image interpretation requires a VLM (Mistral+Pixtral); none "
                "attached and no vlm_loader configured"
            )
        descs = []
        for i, img in enumerate(images):
            d = vlm.analyze_image(np.asarray(img), self.VLM_ANALYSIS_PROMPT, seed=seed).strip()
            if d:
                descs.append(f"Interpret image {i + 1}: {d}")
        if not descs:
            return prompt
        return "\n".join(descs) + f"\n\nUser request: {prompt}"

    def upsample_prompt(
        self,
        prompt: str,
        images: Optional[Sequence[np.ndarray]] = None,
        mode: str = "upsampling_t2i",
        seed: int = 0,
    ) -> str:
        """Rewrite the prompt with the BFL upsampling protocol (--upsample).

        Text-only: chat through the attached conditioning encoder
        (MistralEncoder.swift:70-91 / KleinTextEncoder.swift:117-138).
        With reference images: VLM-describe each image, compose the
        reference's enriched-context template, then T2I-upsample the result
        (MistralEncoder.swift:100-180 — T2I mode deliberately, the I2I mode
        is for single-image edit instructions).
        """
        if self.encoders is None or self.text_encoder_name is None:
            raise ValueError("prompt upsampling requires an attached text encoder facade")
        if images:
            vlm = self._get_vlm()
            if vlm is None:
                raise ValueError(
                    "vision upsampling requires a VLM (Mistral+Pixtral); none "
                    "attached and no vlm_loader configured"
                )
            descs = []
            for i, img in enumerate(images):
                d = vlm.analyze_image(np.asarray(img), self.VLM_ANALYSIS_PROMPT, seed=seed).strip()
                if d:
                    descs.append(f"Image {i + 1}: {d}")
            if descs:
                prompt = (
                    "Reference images context:\n" + "\n".join(descs)
                    + f"\n\nUser request: {prompt}\n\n"
                    + "Generate an image that combines elements from the "
                    + "reference images according to the user's request."
                )
            mode = "upsampling_t2i"
        return self.encoders.upsample_prompt(prompt, self.text_encoder_name, mode=mode, seed=seed)

    # ------------------------------------------------------------------
    # Phase 2+3: denoise + decode
    # ------------------------------------------------------------------

    def generate(
        self,
        prompt: Optional[str] = None,
        embeddings: Optional[jnp.ndarray] = None,
        negative_embeddings: Optional[jnp.ndarray] = None,
        height: int = 1024,
        width: int = 1024,
        num_steps: Optional[int] = None,
        guidance: Optional[float] = None,
        seed: int = 0,
        reference_latents: Optional[jnp.ndarray] = None,  # [B, S_ref, 128] packed+normalized
        reference_ids: Optional[np.ndarray] = None,  # [S_ref, 4]
        strength: float = 1.0,
        init_latents: Optional[jnp.ndarray] = None,  # [B, S_img, 128] packed+normalized
        noise: Optional[jnp.ndarray] = None,  # [B, S_img, 128] initial noise (overrides seed)
        custom_sigmas: Optional[Sequence[float]] = None,
        step_hook: Optional[StepHook] = None,
        decode: bool = True,
        on_progress: Optional[Callable[[int, int], None]] = None,
        cancel: Optional[Any] = None,  # threading.Event-like or () -> bool; raises GenerationCancelled
        on_latents: Optional[Callable[[int, np.ndarray], None]] = None,  # per-step packed latents (live previews; costs a device->host transfer per step)
        checkpoint_interval: Optional[int] = None,
        on_checkpoint: Optional[Callable[[int, np.ndarray], None]] = None,
        upsample: bool = False,
        upsample_images: Optional[Sequence[np.ndarray]] = None,
        interpret_images: Optional[Sequence[np.ndarray]] = None,
    ) -> GenerationResult:
        """Generate an image. T2I by default; I2I via reference_latents;
        img2img via init_latents + strength < 1.

        ``interpret_images`` injects VLM descriptions of the given images
        into the prompt; ``upsample`` rewrites the (possibly enriched)
        prompt via the BFL upsampling protocol, using vision when
        ``upsample_images`` is given (Flux2Pipeline.swift:1250-1404). Both
        apply only when the prompt is encoded here (``embeddings=None``)."""
        from flux2_tpu.utils.memory import MemoryTelemetry, telemetry as _mem_telemetry

        from flux2_tpu.utils.profiler import shared as _profiler

        prof = _profiler()
        # per-call collector (the shared singleton only carries the enable bit)
        mem = MemoryTelemetry(enabled=_mem_telemetry().enabled)
        t0 = time.perf_counter()
        timings: Dict[str, float] = {}

        height, width = lu.validate_dimensions(height, width)
        if height * width > self.max_pixels:
            raise ValueError(f"{width}x{height} exceeds max pixels {self.max_pixels}")
        # LoRA scheduler overrides (Turbo LoRAs): explicit args > LoRA > model
        # defaults (Flux2Pipeline.swift:1879-1908).
        if num_steps is None:
            num_steps = self.lora_num_steps if self.lora_num_steps else self.model.default_steps
        if guidance is None:
            guidance = self.lora_guidance if self.lora_guidance is not None else self.model.default_guidance
        if custom_sigmas is None and self.lora_custom_sigmas:
            custom_sigmas = self.lora_custom_sigmas

        # --- Phase 1: text encoding ---
        t = time.perf_counter()
        prof.start("1. Text Encoding")
        final_prompt = prompt
        was_upsampled = False
        if embeddings is None:
            # activation-keyword prefixing from merged LoRAs
            # (LoRAAdapter.swift:189-199)
            for kw in self.lora_keywords or ():
                if kw and kw.lower() not in (final_prompt or "").lower():
                    final_prompt = f"{kw}, {final_prompt}" if final_prompt else kw
            if interpret_images:
                final_prompt = self.interpret_images(interpret_images, final_prompt or "", seed=seed)
            if upsample:
                rewritten = self.upsample_prompt(final_prompt or "", images=upsample_images, seed=seed)
                was_upsampled = rewritten != final_prompt
                final_prompt = rewritten
            embeddings = self.encode_prompt(final_prompt or "")
        if self.model.uses_classical_cfg and negative_embeddings is None and self.text_encoder is not None:
            negative_embeddings = self.encode_prompt("")
        prof.end("1. Text Encoding")
        timings["text_encoding"] = time.perf_counter() - t
        mem.snapshot("text_encoding")

        # --- schedule ---
        _, _, num_patches = lu.latent_dims(height, width)
        if custom_sigmas is not None:
            schedule = sch.set_custom_sigmas(custom_sigmas)
        else:
            schedule = sch.set_timesteps(num_steps, image_seq_len=num_patches, strength=strength)

        # --- initial latents ---
        # Batch follows the conditioning: [B, 512, joint] embeddings drive
        # B images per call (the data axis of the mesh shards it).
        batch = int(embeddings.shape[0])
        if noise is not None:
            # per-row noise injection (the serving micro-batcher honors each
            # request's seed this way; rows stay reproducible independent of
            # batch composition)
            noise_seq = jnp.asarray(noise, jnp.float32)
        else:
            noise_seq = _seeded_noise_seq(seed, height, width, batch)
        if init_latents is not None and strength < 1.0:
            # img2img: mix encoded image with noise at the starting sigma.
            latents_seq = sch.scale_noise(init_latents, schedule.initial_sigma, noise_seq)
        else:
            latents_seq = noise_seq

        # --- position ids + rope ---
        # Transformer sequence order is [txt ; output-img ; ref-img]: the
        # denoise body appends clean reference tokens after the output tokens
        # and ids follow the same order. (The reference concatenates
        # [output, reference] the same way; RoPE depends only on per-token
        # ids, not their order in the sequence.)
        s_txt = embeddings.shape[1]
        ids = [lu.text_position_ids(s_txt), lu.image_position_ids(height, width)]
        if reference_latents is not None:
            if reference_ids is None:
                raise ValueError("reference_latents requires reference_ids")
            ids.append(np.asarray(reference_ids))
        combined_ids = np.concatenate(ids, axis=0)
        cos, sin = cached_rope_embeddings(combined_ids)

        # --- denoise (one compiled scan) ---
        t = time.perf_counter()
        prof.start("2. Denoising")
        mesh_ctx = self._mesh_ctx()
        collect = False
        # one cancel cell per pipeline: stable jit-cache identity, per-call flag
        cell = getattr(self, "_cancel_cell", None)
        if cell is None:
            cell = _CancelCell()
            self._cancel_cell = cell
        cell.current = cancel
        progress_cb = _make_progress_cb(on_progress, schedule.num_steps, cell, on_latents)
        hook_fn, hook_state = _normalize_hook(step_hook)
        try:
          with mesh_ctx:
            if reference_latents is not None and self.model.supports_kv_cache:
              # klein-9b-kv: step 0 extracts reference K/V, steps 1+ reuse it
              # (~2.66x faster multi-reference I2I; Flux2Pipeline.swift:1555-1683).
              cached_ids = np.concatenate(
                  [lu.text_position_ids(s_txt), lu.image_position_ids(height, width)], axis=0
              )
              cos_c, sin_c = cached_rope_embeddings(cached_ids)
              collect = (
                  checkpoint_interval is not None
                  and (schedule.num_steps - 1) // checkpoint_interval > 0
              )
              final_seq = _denoise_kv_cached(
                  self.transformer_params,
                  self.transformer_config,
                  latents_seq,
                  embeddings,
                  jnp.asarray(schedule.sigma_pairs()),
                  jnp.float32(guidance),
                  cos,
                  sin,
                  cos_c,
                  sin_c,
                  reference_latents,
                  self.model.uses_guidance_embeds,
                  hook_fn,
                  hook_state,
                  progress_cb,
                  checkpoint_interval if collect else None,
                  self.ring,
              )
              if collect:
                  final_seq, intermediates = final_seq
            else:
              collect = (
                  checkpoint_interval is not None
                  and (schedule.num_steps - 1) // checkpoint_interval > 0
              )
              final_seq = _denoise(
                  self.transformer_params,
                  self.transformer_config,
                  latents_seq,
                  embeddings,
                  negative_embeddings if self.model.uses_classical_cfg else None,
                  jnp.asarray(schedule.sigma_pairs()),
                  jnp.float32(guidance),
                  cos,
                  sin,
                  reference_latents,
                  hook_fn,
                  hook_state,
                  self.model.uses_guidance_embeds,
                  self.model.uses_classical_cfg,
                  progress_cb,
                  checkpoint_interval if collect else None,
                  self.ring,
              )
              if collect:
                  final_seq, intermediates = final_seq
            final_seq.block_until_ready()
        except Exception as e:  # surface a clean cancel to the caller
            if isinstance(e, GenerationCancelled):
                raise
            if "GenerationCancelled" in str(e):
                # the runtime wraps callback exceptions (JaxRuntimeError)
                raise GenerationCancelled("generation cancelled mid-denoise") from e
            raise
        prof.end("2. Denoising")
        if schedule.num_steps:
            prof.record_step((time.perf_counter() - t) / schedule.num_steps)
        timings["denoising"] = time.perf_counter() - t
        mem.snapshot("denoising")

        # --- checkpoint images (decoded every N steps AFTER the scan; the
        # scan collects only every Nth step's latents — HBM held scales with
        # num_steps/interval — and stays one pure compiled loop;
        # Flux2Pipeline.swift:2018-2046 decodes inline instead) ---
        if checkpoint_interval is not None and on_checkpoint is not None and collect:
            with self._mesh_ctx():
                for slot, step in enumerate(
                    range(checkpoint_interval, schedule.num_steps, checkpoint_interval)
                ):
                    # u8 + flat fetch like the final image (4x fewer bytes
                    # and no trailing-dim-3 relayout); checkpoint images are
                    # PNG-bound previews, 1/255 quantization is the contract.
                    u8_i = np.asarray(
                        self.decode_latents_u8(intermediates[slot], height, width, flatten=True)
                    ).reshape(-1, height, width, 3)
                    on_checkpoint(step, u8_i[0].astype(np.float32) / 255.0)

        # --- decode ---
        t = time.perf_counter()
        prof.start("3. VAE Decoding")
        image = images = None
        if decode:
            with self._mesh_ctx():
                # uint8 leaves the device (4x less host transfer than f32;
                # the image is headed for a uint8 PNG anyway) and FLAT
                # (a trailing dim of 3 would pay a ~70 ms on-device relayout
                # at fetch time — see _decode_latents_jit), then the host
                # restores the [B, H, W, 3] float [0,1] API contract.
                u8 = np.asarray(
                    self.decode_latents_u8(final_seq, height, width, flatten=True)
                ).reshape(-1, height, width, 3)
            images = u8.astype(np.float32) / 255.0
            image = images[0]
        prof.end("3. VAE Decoding")
        timings["vae_decoding"] = time.perf_counter() - t
        mem.snapshot("vae_decoding")

        return GenerationResult(
            image=image,
            latents_device=final_seq,
            seed=seed,
            num_steps=schedule.num_steps,
            duration_s=time.perf_counter() - t0,
            phase_timings=timings,
            images=images if images is not None and images.shape[0] > 1 else None,
            final_prompt=final_prompt,
            was_upsampled=was_upsampled,
            memory_stats=mem.as_dict() if mem.enabled else None,
        )

    # ------------------------------------------------------------------

    def decode_latents(self, latents_seq: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
        """Packed sequence -> image [B, H, W, 3] in [0, 1].

        Decodes tiled when the active memory profile's threshold is exceeded
        (the reference's always-on tiling policy, AutoencoderKL.swift:159-252,
        parameterized by profile)."""
        tiled = bool(
            self.memory_profile is not None
            and max(height, width) > self.memory_profile.vae_tile_threshold_px
        )
        return _decode_latents_jit(
            self.vae_params, self.vae_config, latents_seq, height, width, tiled,
            compute_dtype=self.vae_compute_dtype,
        )

    def decode_latents_u8(
        self, latents_seq: jnp.ndarray, height: int, width: int, flatten: bool = False
    ) -> jnp.ndarray:
        """Packed sequence -> uint8 image [B, H, W, 3] (device-side convert).

        ``flatten=True`` returns [B, H*W*3] instead — the fetch-friendly
        layout for callers about to np.asarray the result off-device
        (host-side reshape restores the image; see _decode_latents_jit)."""
        tiled = bool(
            self.memory_profile is not None
            and max(height, width) > self.memory_profile.vae_tile_threshold_px
        )
        return _decode_latents_jit(
            self.vae_params, self.vae_config, latents_seq, height, width, tiled, True,
            compute_dtype=self.vae_compute_dtype, flatten=flatten,
        )

    def encode_image_to_packed_sequence(
        self, image: np.ndarray, sample_posterior: bool = False, key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """Image [H, W, 3] in [0,1] -> packed normalized latents [1, S, 128].

        The chain-helper surface (Flux2Pipeline+ChainHelpers.swift:75-101).
        Runs as ONE jitted program per image shape: the encode is per-call
        hot for I2I/inpaint/outpaint and training data prep, and eager
        tracing pays a device dispatch per op through the tunneled runtime.
        """
        if key is None and sample_posterior:
            key = jax.random.PRNGKey(0)
        x_np = np.asarray(image)
        if x_np.dtype != np.uint8 and x_np.ndim == 3:
            # Host->device uploads ride the same ~45 MB/s tunnel as fetches
            # (axon-microbenchmarks.md): a 1024px f32 image is 12 MB (~270 ms)
            # where the u8 it almost always came from (PIL load / resize,
            # then /255) is 3 MB. Re-quantize only when BIT-LOSSLESS —
            # arbitrary float arrays (tests, library callers) upload as-is.
            q = np.rint(np.clip(x_np, 0.0, 1.0) * 255.0).astype(np.uint8)
            if np.array_equal(q.astype(np.float32) / np.float32(255.0), x_np):
                x_np = q
        x = jnp.asarray(x_np if x_np.dtype == np.uint8 else np.asarray(x_np, np.float32))
        return _encode_image_jit(self.vae_params, self.vae_config, x, sample_posterior, key)

    def encode_reference_images(
        self,
        images: Sequence[np.ndarray],
        max_pixels: int = 1024 * 1024,
    ) -> Tuple[jnp.ndarray, np.ndarray]:
        """VAE-encode reference images for I2I conditioning.

        Returns (packed reference latents [1, S_ref, 128], position ids
        [S_ref, 4] with per-image T coordinates) — parity with
        encodeReferenceImages (Flux2Pipeline.swift:2143-2252).
        """
        if len(images) > self.model.max_reference_images:
            raise ValueError(
                f"{len(images)} reference images > max {self.model.max_reference_images}"
            )
        seqs, hs, ws = [], [], []
        for img in images:
            img = _downscale_to_max_pixels(img, max_pixels, multiple=32)
            seqs.append(self.encode_image_to_packed_sequence(img))
            hs.append(img.shape[0] // 16)
            ws.append(img.shape[1] // 16)
        ids = lu.reference_image_position_ids(hs, ws)
        return jnp.concatenate(seqs, axis=1), ids


# ---------------------------------------------------------------------------
# Jitted cores
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "hook", "use_guidance_embeds", "use_cfg", "progress_cb", "collect_every", "ring",
    ),
)
def _denoise(
    params,
    config: Flux2TransformerConfig,
    latents_seq: jnp.ndarray,  # [B, S_img, 128]
    embeddings: jnp.ndarray,  # [B, S_txt, joint]
    negative_embeddings: Optional[jnp.ndarray],
    sigma_pairs: jnp.ndarray,  # [n, 2]
    guidance: jnp.ndarray,  # scalar
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    reference_latents: Optional[jnp.ndarray],  # [B, S_ref, 128] or None
    hook: Optional[StepHook],
    hook_state=None,  # TRACED pytree for structured hooks (compile-once)
    use_guidance_embeds: bool = False,
    use_cfg: bool = False,
    progress_cb=None,
    collect_every: Optional[int] = None,
    ring=None,  # (Mesh, axis) -> sequence-parallel ring attention in every block
):
    b = latents_seq.shape[0]
    s_img = latents_seq.shape[1]
    dtype = _param_dtype(params)
    latents_seq = latents_seq.astype(jnp.float32)

    if use_cfg and negative_embeddings is None:
        raise ValueError("classical CFG requires negative embeddings")

    def model_fn(lat, sigma):
        x = lat.astype(dtype)
        if reference_latents is not None:
            ref = jnp.broadcast_to(
                reference_latents.astype(dtype),
                (x.shape[0], *reference_latents.shape[1:]),
            )
            x = jnp.concatenate([x, ref], axis=1)
        tstep = jnp.full((b,), sigma, jnp.float32)
        g = jnp.full((b,), guidance, jnp.float32) if use_guidance_embeds else None
        if use_cfg:
            # cond/uncond as batch rows of one forward.
            x2 = jnp.concatenate([x, x], axis=0)
            emb2 = jnp.concatenate([embeddings, negative_embeddings], axis=0)
            t2 = jnp.concatenate([tstep, tstep], axis=0)
            g2 = jnp.concatenate([g, g], axis=0) if g is not None else None
            v2 = tfm.forward(params, config, x2, emb2, t2, rope_cos, rope_sin, guidance=g2, ring=ring)
            v_cond, v_uncond = v2[:b], v2[b:]
            v = v_uncond + guidance.astype(v2.dtype) * (v_cond - v_uncond)
        else:
            v = tfm.forward(params, config, x, embeddings, tstep, rope_cos, rope_sin, guidance=g, ring=ring)
        return v[:, :s_img].astype(jnp.float32)  # slice off reference tokens

    # Checkpoint-latent buffer: only every `collect_every`-th step's latents
    # are held (HBM scales with num_steps/interval, not num_steps). One extra
    # trash slot keeps the in-scan write branchless: non-checkpoint steps
    # write there.
    num_steps = int(sigma_pairs.shape[0])
    n_ck = max(0, (num_steps - 1) // collect_every) if collect_every else 0
    ck0 = jnp.zeros((n_ck + 1, *latents_seq.shape), jnp.float32) if n_ck else None

    def body(carry, inp):
        lat, step_idx, ck = carry
        sigma, sigma_next = inp[0], inp[1]
        v = model_fn(lat, sigma)
        lat = sch.euler_step(lat, v, sigma, sigma_next)
        if hook is not None:
            lat = _apply_hook(hook, hook_state, lat, sigma, sigma_next, step_idx)
        if progress_cb is not None:
            if getattr(progress_cb, "wants_latents", False):
                # live previews: ship the step's packed latents to the host
                jax.experimental.io_callback(progress_cb, None, step_idx, lat, ordered=True)
            else:
                jax.experimental.io_callback(progress_cb, None, step_idx, ordered=True)
        if ck is not None:
            stepno = step_idx + 1
            is_ck = jnp.logical_and(stepno % collect_every == 0, stepno // collect_every <= n_ck)
            slot = jnp.where(is_ck, stepno // collect_every - 1, n_ck)
            ck = jax.lax.dynamic_update_slice(
                ck, lat[None], (slot,) + (0,) * lat.ndim
            )
        return (lat, step_idx + 1, ck), None

    (final, _, ck), _ = jax.lax.scan(body, (latents_seq, jnp.int32(0), ck0), sigma_pairs)
    if n_ck:
        return final, ck[:n_ck]
    return final


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "use_guidance_embeds", "hook", "progress_cb", "collect_every", "ring",
    ),
)
def _denoise_kv_cached(
    params,
    config: Flux2TransformerConfig,
    latents_seq: jnp.ndarray,
    embeddings: jnp.ndarray,
    sigma_pairs: jnp.ndarray,
    guidance: jnp.ndarray,
    rope_cos_full: jnp.ndarray,  # [txt ; img ; ref] ids — NOTE extract wants [txt ; ref ; img]
    rope_sin_full: jnp.ndarray,
    rope_cos_cached: jnp.ndarray,  # [txt ; img] ids
    rope_sin_cached: jnp.ndarray,
    reference_latents: jnp.ndarray,
    use_guidance_embeds: bool,
    hook=None,
    hook_state=None,  # TRACED pytree for structured hooks (compile-once)
    progress_cb=None,
    collect_every: Optional[int] = None,
    ring=None,  # (Mesh, axis): sequence-parallel ring attention for steps 1+
):
    """klein-9b-kv denoising: extract at step 0, reuse the cache for 1+.

    Feature parity with the standard scan: per-step hook, progress callback,
    every-Nth checkpoint-latent collection. Classical CFG is structurally
    N/A (klein-9b-kv is a distilled variant — Flux2Config.swift:169-204).
    ``ring`` composes context parallelism with the KV cache: the EXTRACT
    step runs dense (its blocked-span mask is incompatible with the ring),
    but steps 1+ are unmasked, so the cached path shards the [txt;img]
    token axis and rotates [txt;cached-ref;img] K/V around the ICI ring —
    the two long-sequence mechanisms stack exactly where sequences are
    longest (multi-reference I2I)."""
    from flux2_tpu.models.flux2 import transformer as _tfm

    b = latents_seq.shape[0]
    s_txt = embeddings.shape[1]
    s_img = latents_seq.shape[1]
    dtype = _param_dtype(params)
    latents_seq = latents_seq.astype(jnp.float32)

    def g_of(sigma):
        return jnp.full((b,), guidance, jnp.float32) if use_guidance_embeds else None

    # The caller built full-rope over [txt ; img ; ref] order (the standard
    # path's sequence order). Reorder to [txt ; ref ; img] for extraction.
    s_ref = reference_latents.shape[1]
    reorder = jnp.concatenate(
        [jnp.arange(s_txt), jnp.arange(s_txt + s_img, s_txt + s_img + s_ref), jnp.arange(s_txt, s_txt + s_img)]
    )
    cos_e = rope_cos_full[reorder]
    sin_e = rope_sin_full[reorder]

    num_steps = int(sigma_pairs.shape[0])
    n_ck = max(0, (num_steps - 1) // collect_every) if collect_every else 0
    ck = jnp.zeros((n_ck + 1, *latents_seq.shape), jnp.float32) if n_ck else None

    def _collect(ck, lat, step_idx):
        if ck is None:
            return ck
        stepno = step_idx + 1
        is_ck = jnp.logical_and(stepno % collect_every == 0, stepno // collect_every <= n_ck)
        slot = jnp.where(is_ck, stepno // collect_every - 1, n_ck)
        return jax.lax.dynamic_update_slice(ck, lat[None], (slot,) + (0,) * lat.ndim)

    sigma0, sigma0_next = sigma_pairs[0, 0], sigma_pairs[0, 1]
    t0 = jnp.full((b,), sigma0, jnp.float32)
    v0, dkv, skv = _tfm.forward_kv_extract(
        params, config, latents_seq.astype(dtype), reference_latents.astype(dtype),
        embeddings, t0, cos_e, sin_e, guidance=g_of(sigma0),
    )
    lat = sch.euler_step(latents_seq, v0.astype(jnp.float32), sigma0, sigma0_next)
    if hook is not None:
        lat = _apply_hook(hook, hook_state, lat, sigma0, sigma0_next, jnp.int32(0))
    if progress_cb is not None:
        if getattr(progress_cb, "wants_latents", False):
            jax.experimental.io_callback(progress_cb, None, jnp.int32(0), lat, ordered=True)
        else:
            jax.experimental.io_callback(progress_cb, None, jnp.int32(0), ordered=True)
    ck = _collect(ck, lat, jnp.int32(0))

    def body(carry, inp):
        lat, step_idx, ck = carry
        sigma, sigma_next = inp[0], inp[1]
        t = jnp.full((b,), sigma, jnp.float32)
        v = _tfm.forward_kv_cached(
            params, config, lat.astype(dtype), embeddings, t,
            rope_cos_cached, rope_sin_cached, dkv, skv, guidance=g_of(sigma),
            ring=ring,
        )
        lat = sch.euler_step(lat, v.astype(jnp.float32), sigma, sigma_next)
        if hook is not None:
            lat = _apply_hook(hook, hook_state, lat, sigma, sigma_next, step_idx)
        if progress_cb is not None:
            if getattr(progress_cb, "wants_latents", False):
                jax.experimental.io_callback(progress_cb, None, step_idx, lat, ordered=True)
            else:
                jax.experimental.io_callback(progress_cb, None, step_idx, ordered=True)
        ck = _collect(ck, lat, step_idx)
        return (lat, step_idx + 1, ck), None

    (lat, _, ck), _ = jax.lax.scan(body, (lat, jnp.int32(1), ck), sigma_pairs[1:])
    if n_ck:
        return lat, ck[:n_ck]
    return lat


@functools.partial(jax.jit, static_argnames=("vae_config", "sample_posterior"))
def _encode_image_jit(vae_params, vae_config, image, sample_posterior: bool = False, key=None):
    """[H, W, 3] in [0,1] (f32, or u8/255 uploaded raw) -> packed normalized
    latents [1, S, 128], as one compiled program (see
    Flux2Pipeline.encode_image_to_packed_sequence)."""
    if image.dtype == jnp.uint8:
        image = image.astype(jnp.float32) / 255.0
    x = image[None].transpose(0, 3, 1, 2) * 2.0 - 1.0
    z = vae_mod.encode(vae_params, x, vae_config, sample_posterior=sample_posterior, key=key)
    patched = lu.patchify_latents(z)
    mean, var = vae_mod.get_batchnorm_stats(vae_params)
    normed = lu.normalize_with_batchnorm(patched, mean, var)
    return lu.pack_patchified_to_sequence(normed)


# Largest total-pixel count decoded as ONE dense batched conv stack; above
# it the decode runs image-by-image under lax.map (see _decode_latents_jit).
# One megapixel is the proven-good peak: a bs=1 1024px decode fits a 16 GiB
# chip with the DiT + encoder resident, a bs=4 one does not. Trace-time
# constant: tests monkeypatch it together with a fresh shape.
_DECODE_MAP_BUDGET_PIXELS = 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("vae_config", "height", "width", "tiled", "as_uint8", "compute_dtype", "flatten"),
)
def _decode_latents_jit(
    vae_params, vae_config, latents_seq, height: int, width: int,
    tiled: bool = False, as_uint8: bool = False, compute_dtype=jnp.bfloat16,
    flatten: bool = False,
):
    patched = lu.unpack_sequence_to_patchified(latents_seq, height, width)
    mean, var = vae_mod.get_batchnorm_stats(vae_params)
    denormed = lu.denormalize_with_batchnorm(patched, mean, var)
    z = lu.unpatchify_latents(denormed)
    # Convs run in compute_dtype (bf16 streams on the MXU); group_norm keeps
    # f32 statistics internally, and the [-1,1]->[0,1] epilogue is f32.
    vp = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        vae_params,
    )
    z = z.astype(compute_dtype)
    if tiled:
        img = vae_mod.decode_tiled(vp, z, vae_config)
    elif z.shape[0] * height * width > _DECODE_MAP_BUDGET_PIXELS:
        # Batched requests (serve micro-batching) past ~1 megapixel total
        # decode image-by-image under lax.map: the decoder's upsampled
        # feature maps are the HBM peak of the whole pipeline
        # (128ch x 1024^2 x bs), and a bs=4 dense decode at 1024px
        # RESOURCE_EXHAUSTs a 16 GiB chip that the bs=4 denoise itself
        # fits comfortably. Sequential decode keeps the peak at the
        # bs=1-megapixel level (known-good), and it is ONE compiled
        # program (no per-image dispatch through the tunnel). Below the
        # budget (e.g. bs=4 at 512px) the dense batched decode is safe
        # and batches the convs. The reference is strictly bs=1
        # (MemoryManager.swift:169-180) so it never faces this.
        img = jax.lax.map(lambda zi: vae_mod.decode(vp, zi[None], vae_config)[0], z)
    else:
        img = vae_mod.decode(vp, z, vae_config)
    img = jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
    img = img.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    if as_uint8:
        img = jnp.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    if flatten:
        # Fetch-friendly layout: a trailing dim of 3 keeps the on-device
        # buffer lane-padded, and np.asarray pays a device relayout before
        # the copy — measured 167.6 ms vs 96.7 ms for the identical 3 MB of
        # 1024px u8 pixels through the tunnel. Flattening inside the program
        # makes the relayout part of the (fused) epilogue; the host reshapes
        # the dense bytes for free.
        img = img.reshape(img.shape[0], -1)
    return img


def _param_dtype(params):
    """Compute dtype of the DiT stream: the x_embedder kernel's dtype, or
    bfloat16 when that leaf is quantized (QTensor has no float dtype)."""
    w = params["x_embedder"]["kernel"]
    return w.dtype if hasattr(w, "dtype") else jnp.bfloat16


class _CancelCell:
    """Stable-identity holder for the per-call cancel flag.

    The progress callback is a jit STATIC arg (cached by identity); keying
    it on the cell — one per pipeline — instead of the per-call cancel
    object keeps the compiled program cached across requests while the cell
    re-points at each call's live flag."""

    __slots__ = ("current",)

    def __init__(self):
        self.current = None

    def requested(self) -> bool:
        cancel = self.current
        if cancel is None:
            return False
        probe = getattr(cancel, "is_set", cancel)  # Event-like or () -> bool
        return bool(probe())


@functools.lru_cache(maxsize=64)
def _make_progress_cb_cached(on_progress, total_steps, cell, on_latents):
    if on_latents is not None:

        def cb(step_idx, lat):
            if cell is not None and cell.requested():
                raise GenerationCancelled(
                    f"cancelled at step {int(step_idx) + 1}/{total_steps}"
                )
            if on_progress is not None:
                on_progress(int(step_idx) + 1, total_steps)
            on_latents(int(step_idx) + 1, np.asarray(lat))

        cb.wants_latents = True
        return cb

    def cb(step_idx):
        if cell is not None and cell.requested():
            # Raising inside the ordered io_callback poisons the dispatch and
            # aborts the compiled scan — the TPU analogue of the reference's
            # transformer-nil guard (Flux2Pipeline.swift:1940-1942).
            # Granularity: one denoising step (the callback runs per step).
            raise GenerationCancelled(f"cancelled at step {int(step_idx) + 1}/{total_steps}")
        if on_progress is not None:
            on_progress(int(step_idx) + 1, total_steps)

    cb.wants_latents = False
    return cb


def _make_progress_cb(on_progress, total_steps, cell=None, on_latents=None):
    """Wrap a host progress/cancel/latent callback for io_callback. Cached so
    repeat calls with the same callbacks (and pipeline cancel cell) reuse the
    compiled program (static-arg identity)."""
    if on_progress is None and on_latents is None and (cell is None or cell.current is None):
        return None
    return _make_progress_cb_cached(on_progress, total_steps, cell, on_latents)


def _downscale_to_max_pixels(image: np.ndarray, max_pixels: int, multiple: int = 32) -> np.ndarray:
    """Area-downscale so H*W <= max_pixels, dims rounded down to a multiple.

    Pixel-exact PIL/np replacement for the reference's CoreGraphics resize
    (Flux2Pipeline.swift:2159-2192).
    """
    h, w = image.shape[:2]
    scale = min(1.0, (max_pixels / (h * w)) ** 0.5)
    nh = max(multiple, int(h * scale) // multiple * multiple)
    nw = max(multiple, int(w * scale) // multiple * multiple)
    if (nh, nw) == (h, w):
        return image
    try:
        from PIL import Image

        im = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
        return np.asarray(im.resize((nw, nh), Image.LANCZOS), dtype=np.float32) / 255.0
    except ImportError:
        # numpy fallback: nearest sampling
        ys = (np.arange(nh) * h / nh).astype(int)
        xs = (np.arange(nw) * w / nw).astype(int)
        return image[ys][:, xs]
