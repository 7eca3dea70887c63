"""Text-encoders facade: the ``FluxTextEncoders.shared`` equivalent.

Capability parity with ``Sources/FluxTextEncoders/FluxTextEncoders.swift:33``:
one object owning the loaded LLM encoders + tokenizers, exposing
load/unload per family, FLUX/Klein embedding extraction, chat/generate, and
prompt upsampling. On TPU "unload" just drops the reference (XLA frees HBM);
kept for API parity and for hosts that juggle models on small chips.

Tokenizers come from HF ``transformers`` (tekken/Mistral and Qwen3 chat
templates ship with their checkpoints); the adapter normalizes them to the
``ChatTokenizer`` protocol used by the extraction recipe.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from flux2_tpu.models.text_encoders import config as tc
from flux2_tpu.models.text_encoders import decoder, extractor, generation
from flux2_tpu.utils import logging as flog


class HFTokenizerAdapter:
    """Wraps a transformers tokenizer into the ChatTokenizer protocol."""

    def __init__(self, tokenizer):
        self._tok = tokenizer
        pad = tokenizer.pad_token_id
        if pad is None:
            pad = tokenizer.eos_token_id or 0
        self.pad_token_id = int(pad)
        self.eos_token_id = tokenizer.eos_token_id

    @classmethod
    def from_pretrained(cls, path_or_repo: str) -> "HFTokenizerAdapter":
        from transformers import AutoTokenizer

        return cls(AutoTokenizer.from_pretrained(path_or_repo))

    def encode(self, text: str) -> List[int]:
        return list(self._tok.encode(text, add_special_tokens=False))

    def apply_chat_template(self, messages: List[dict], add_generation_prompt: bool = False) -> List[int]:
        return list(
            self._tok.apply_chat_template(
                messages, add_generation_prompt=add_generation_prompt, tokenize=True
            )
        )

    def decode(self, tokens: List[int]) -> str:
        return self._tok.decode(tokens, skip_special_tokens=True)


def quantize_encoder_params(params: dict, fmt: str) -> dict:
    """Quantize the decoder's LAYER weights; embeddings (gather-indexed, not
    matmul'd), lm_head, and norms stay dense. The encoder counterpart of the
    reference's MistralQuantization (QuantizationConfig.swift:8-38 — 4/6/8
    bit encoder repos)."""
    from flux2_tpu.ops import quant

    out = dict(params)
    if "layers" in out:
        out["layers"] = quant.quantize_params(out["layers"], fmt)
    return out


def resolve_tokenizer(path_or_repo: str):
    """Tokenizer resolution in the reference's order
    (TekkenTokenizer.swift:115-128): a mistral-common ``tekken.json`` uses
    the first-party Tekken BPE; otherwise the HF ``tokenizer.json`` adapter."""
    import os as _os

    if _os.path.isdir(path_or_repo) and _os.path.exists(_os.path.join(path_or_repo, "tekken.json")):
        from flux2_tpu.models.text_encoders.tekken import TekkenTokenizer

        return TekkenTokenizer.from_pretrained(path_or_repo)
    return HFTokenizerAdapter.from_pretrained(path_or_repo)


@dataclasses.dataclass
class LoadedEncoder:
    name: str
    params: dict
    config: tc.DecoderConfig
    tokenizer: Any
    extractor: extractor.EmbeddingExtractor


def detect_vlm_family(weights_dir: str) -> str:
    """"qwen35" | "mistral" from a checkpoint dir's config.json.

    Qwen3.5-VL checkpoints carry a vision_config AND a qwen model_type
    (top-level or in text_config); everything else routes to the
    Mistral/Pixtral loader. One helper so the CLI and the lazy VLM loader
    can't drift."""
    import json

    cfg_path = os.path.join(weights_dir, "config.json")
    if not os.path.exists(cfg_path):
        return "mistral"
    with open(cfg_path) as f:
        d = json.load(f)
    if "vision_config" not in d:
        return "mistral"
    mtype = str(d.get("model_type", "")).lower()
    sub = str(d.get("text_config", {}).get("model_type", "")).lower()
    return "qwen35" if ("qwen" in mtype or "qwen" in sub) else "mistral"


class TextEncoders:
    """Singleton-style registry of loaded encoder models."""

    def __init__(self):
        self._encoders: Dict[str, LoadedEncoder] = {}
        self._vlm = None  # MistralVLMService (Pixtral + Mistral LM)

    # -- loading -------------------------------------------------------------

    def load_mistral(
        self, weights_dir: str, tokenizer_dir: Optional[str] = None, quantization: str = "bf16"
    ) -> LoadedEncoder:
        return self._load(
            "mistral", weights_dir, tokenizer_dir, tc.MISTRAL_SMALL_3_2,
            tc.MISTRAL_HIDDEN_LAYERS, llama4=True, quantization=quantization,
        )

    def load_qwen3(
        self, weights_dir: str, tokenizer_dir: Optional[str] = None, size: str = "4b",
        quantization: str = "bf16",
    ) -> LoadedEncoder:
        cfg = tc.QWEN3_4B if size == "4b" else tc.QWEN3_8B
        # Klein/Qwen3 conditioning uses the KLEIN recipe (no system message,
        # enable_thinking=False think block, RIGHT padding —
        # KleinEmbeddingExtractor.swift), NOT the Mistral/Dev protocol.
        return self._load(
            f"qwen3-{size}", weights_dir, tokenizer_dir, cfg, tc.QWEN3_HIDDEN_LAYERS,
            qk_norm=True, quantization=quantization, recipe="klein",
        )

    def attach(self, name: str, params: dict, cfg: tc.DecoderConfig, tokenizer, hidden_layers,
               recipe: str = "mistral") -> LoadedEncoder:
        """Register an already-built encoder (tests, custom models)."""
        enc = LoadedEncoder(
            name=name, params=params, config=cfg, tokenizer=tokenizer,
            extractor=extractor.EmbeddingExtractor(
                params, cfg, tokenizer, tuple(hidden_layers), recipe=recipe
            ),
        )
        self._encoders[name] = enc
        return enc

    def _load(
        self, name, weights_dir, tokenizer_dir, cfg, layers,
        qk_norm=False, llama4=False, quantization="bf16", recipe="mistral",
    ) -> LoadedEncoder:
        from flux2_tpu.io import checkpoints, weight_mapping

        cfg_json = os.path.join(weights_dir, "config.json")
        if os.path.exists(cfg_json):
            import json

            with open(cfg_json) as f:
                d = json.load(f)
            # Mistral3ForConditionalGeneration nests the decoder config
            # under text_config (the VLM checkpoint layout).
            d = d.get("text_config", d)
            cfg = tc.DecoderConfig.from_json_dict(d, qk_norm=qk_norm, llama4=llama4)
        raw = weight_mapping.strip_language_model_prefix(checkpoints.load_weights_dir(weights_dir))
        params = weight_mapping.map_decoder_weights(raw, cfg, dtype=np.float32)
        params = {k: _bf16(v) for k, v in params.items()}
        if quantization != "bf16":
            params = quantize_encoder_params(params, quantization)
        tok = resolve_tokenizer(tokenizer_dir or weights_dir)
        flog.info(
            f"loaded text encoder {name} ({cfg.num_hidden_layers} layers, "
            f"{cfg.hidden_size} hidden{', ' + quantization if quantization != 'bf16' else ''})"
        )
        return self.attach(name, params, cfg, tok, layers, recipe=recipe)

    def load_mistral_vlm(self, weights_dir: str, tokenizer_dir: Optional[str] = None):
        """Mistral-Small-3.2 VLM: Pixtral vision tower + projector + LM from
        one checkpoint -> a MistralVLMService (FluxTextEncoders.swift
        loadVLMModel analogue). Reuses the LM if load_mistral already ran."""
        from flux2_tpu.io import checkpoints, weight_mapping
        from flux2_tpu.models.text_encoders import pixtral
        from flux2_tpu.models.text_encoders.vlm_service import MistralVLMService

        if self._vlm is not None:
            return self._vlm
        if not self.is_loaded("mistral"):
            self.load_mistral(weights_dir, tokenizer_dir)
        lm = self._encoders["mistral"]

        import json

        vcfg = pixtral.PixtralVisionConfig(text_hidden_size=lm.config.hidden_size)
        image_token_id = 10
        cfg_json = os.path.join(weights_dir, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                d = json.load(f)
            v = d.get("vision_config", {})
            vcfg = pixtral.PixtralVisionConfig(
                hidden_size=v.get("hidden_size", 1024),
                intermediate_size=v.get("intermediate_size", 4096),
                num_hidden_layers=v.get("num_hidden_layers", 24),
                num_attention_heads=v.get("num_attention_heads", 16),
                patch_size=v.get("patch_size", 14),
                image_size=v.get("image_size", 1540),
                rope_theta=v.get("rope_theta", 10000.0),
                spatial_merge_size=d.get("spatial_merge_size", 2),
                text_hidden_size=lm.config.hidden_size,
            )
            image_token_id = d.get("image_token_index", 10)
        raw = checkpoints.load_weights_dir(weights_dir)
        vparams = weight_mapping.map_pixtral_weights(raw, vcfg, dtype=np.float32)
        vparams = _bf16(vparams)
        self._vlm = MistralVLMService(
            lm_params=lm.params, lm_config=lm.config,
            vision_params=vparams, vision_config=vcfg,
            tokenizer=lm.tokenizer, image_token_id=image_token_id,
        )
        flog.info(f"loaded Mistral VLM (Pixtral {vcfg.num_hidden_layers}-layer tower)")
        return self._vlm

    def load_qwen35_vlm(self, weights_dir: str, tokenizer_dir: Optional[str] = None):
        """Qwen3.5 VLM: hybrid GatedDeltaNet LM + Qwen3-VL vision tower from
        one HF-layout checkpoint -> a Qwen35VLMService (the reference's
        bundled prompting/scoring/comparison VLM,
        FluxTextEncoders.loadQwen35VLM). Wires image analysis, validation
        scoring, and compare_images_for_flux end-to-end from disk."""
        import json

        from flux2_tpu.io import checkpoints, weight_mapping
        from flux2_tpu.models.text_encoders import qwen35, qwen35_vision
        from flux2_tpu.models.text_encoders.vlm_service import Qwen35VLMService

        if isinstance(self._vlm, Qwen35VLMService):
            return self._vlm
        if self._vlm is not None:
            # a different-family VLM (e.g. Mistral/Pixtral) is resident —
            # the caller explicitly asked for Qwen3.5, so replace it rather
            # than silently handing back the wrong service
            flog.info("replacing the loaded non-Qwen3.5 VLM with the requested Qwen3.5-VL")
            self._vlm = None
        with open(os.path.join(weights_dir, "config.json")) as f:
            d = json.load(f)
        vis_d = d.get("vision_config")
        if vis_d is None:
            raise ValueError(
                f"{weights_dir}/config.json has no vision_config — not a "
                "Qwen3.5-VL checkpoint (use load_mistral_vlm for Pixtral VLMs)"
            )
        lm_cfg = qwen35.Qwen35TextConfig.from_json_dict(d.get("text_config", d))
        v_cfg = qwen35_vision.Qwen35VisionConfig.from_json_dict(
            vis_d, image_token_id=d.get("image_token_id", d.get("image_token_index"))
        )
        raw = checkpoints.load_weights_dir(weights_dir)
        lm_params = _bf16(weight_mapping.map_qwen35_weights(raw, lm_cfg, dtype=np.float32))
        v_params = _bf16(weight_mapping.map_qwen35_vision_weights(raw, v_cfg, dtype=np.float32))
        tok = HFTokenizerAdapter.from_pretrained(tokenizer_dir or weights_dir)
        self._vlm = Qwen35VLMService(lm_params, lm_cfg, v_params, v_cfg, tok)
        flog.info(
            f"loaded Qwen3.5 VLM ({lm_cfg.num_hidden_layers}-layer hybrid LM, "
            f"{v_cfg.depth}-layer vision tower)"
        )
        return self._vlm

    def attach_vlm(self, vlm) -> None:
        """Register an already-built vision service (tests, custom VLMs)."""
        self._vlm = vlm

    @property
    def is_vlm_loaded(self) -> bool:
        return self._vlm is not None

    def unload_vlm(self) -> None:
        self._vlm = None

    def shard(self, name: str, mesh) -> None:
        """Distribute an encoder's weights over a mesh (Mistral-24B needs
        fsdp/tp on 16 GB chips — the TPU replacement for the reference's
        load/unload choreography)."""
        from flux2_tpu.parallel import sharding as sh

        enc = self._encoders[name]
        enc.params = sh.shard_params(enc.params, mesh, sh.DECODER_RULES)
        enc.extractor.params = enc.params

    def unload(self, name: str) -> None:
        self._encoders.pop(name, None)

    def unload_all(self) -> None:
        self._encoders.clear()

    def is_loaded(self, name: str) -> bool:
        return name in self._encoders

    def get(self, name: str) -> LoadedEncoder:
        return self._encoders[name]

    # -- extraction ------------------------------------------------------------

    def extract_flux_embeddings(self, prompt: str, name: str = "mistral") -> jnp.ndarray:
        """Dev conditioning: [1, 512, 15360] (FluxTextEncoders.swift:724+)."""
        return self._encoders[name].extractor(prompt)

    def extract_klein_embeddings(self, prompt: str, name: str = "qwen3-4b") -> jnp.ndarray:
        """Klein conditioning: [1, 512, 7680/12288]."""
        return self._encoders[name].extractor(prompt)

    # -- generation --------------------------------------------------------------

    def chat(
        self,
        messages: List[dict],
        name: str,
        params: Optional[generation.GenerateParameters] = None,
        seed: int = 0,
        on_token=None,
        enable_thinking: bool = False,
    ) -> str:
        """Chat turn. Thinking is DISABLED by default for FLUX.2 usage
        (Qwen3Generator.swift:38,54): Qwen3-family encoders get the
        ``/no_think`` soft switch appended to the last user turn, and
        ``<think>`` blocks are stripped from the reply either way."""
        enc = self._encoders[name]
        if "qwen3" in name.lower():
            messages = generation.apply_thinking_control(messages, enable_thinking)
        ids = enc.tokenizer.apply_chat_template(messages, add_generation_prompt=True)
        eos = [enc.tokenizer.eos_token_id] if getattr(enc.tokenizer, "eos_token_id", None) is not None else []
        stream = None
        emit = on_token
        if on_token is not None:
            if not enable_thinking:
                # keep the live stream consistent with the stripped reply
                emit = generation.ThinkStreamFilter(on_token)
            stream = lambda t: emit(enc.tokenizer.decode([t]))  # noqa: E731
        tokens = generation.generate(
            enc.params, enc.config, list(ids), params or generation.GenerateParameters(),
            eos_token_ids=eos, seed=seed, on_token=stream,
        )
        if isinstance(emit, generation.ThinkStreamFilter):
            emit.flush()  # don't swallow a reply cut mid-"<think>" prefix
        return generation.strip_think_tags(enc.tokenizer.decode(tokens))

    def generate_text(self, prompt: str, name: str, **kw) -> str:
        return self.chat([{"role": "user", "content": prompt}], name, **kw)

    def analyze_image(self, image, prompt: str, seed: int = 0) -> str:
        """VLM image analysis (FluxTextEncoders.analyzeImage)."""
        if self._vlm is None:
            raise ValueError("no VLM loaded; call load_mistral_vlm first")
        return self._vlm.analyze_image(image, prompt, seed=seed)

    def compare_images_for_flux(self, reference, generated) -> dict:
        """Two-image FLUX.2 comparison via the Qwen3.5 VLM
        (FluxTextEncoders.compareImagesForFlux)."""
        if self._vlm is None:
            raise ValueError("no VLM loaded; call load_qwen35_vlm first")
        if not hasattr(self._vlm, "compare_images_for_flux"):
            raise ValueError("image comparison needs the Qwen3.5 VLM (multi-image)")
        return self._vlm.compare_images_for_flux(reference, generated)

    def upsample_prompt(self, prompt: str, name: str, mode: str = "upsampling_t2i", seed: int = 0) -> str:
        enc = self._encoders[name]
        return generation.upsample_prompt(
            enc.params, enc.config, enc.tokenizer, prompt, mode=mode, seed=seed,
            qwen3_no_think="qwen3" in name.lower(),
        )


def _bf16(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(np.asarray(x).dtype, np.floating)
        else x,
        tree,
    )


shared = TextEncoders()


def compare_embeddings(emb_a, emb_b) -> dict:
    """Embedding-comparison harness (the reference's CompareEncoders CLI):
    cosine similarity + max/mean absolute difference between two encoders'
    conditioning tensors for the same prompt — used to validate quantized
    or alternative encoders against the bf16 reference."""
    import numpy as np

    a = np.asarray(emb_a, np.float32).reshape(-1)
    b = np.asarray(emb_b, np.float32).reshape(-1)
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    diff = np.abs(a - b)
    return {
        "cosine_similarity": cos,
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "rel_mean_diff": float(diff.mean() / (np.abs(a).mean() + 1e-12)),
    }
