"""HTTP serving endpoint for flux2-tpu.

The production-serving counterpart of the reference's SwiftUI demo app
(``Sources/Flux2App``): a small JSON-over-HTTP API driving a resident
pipeline. Stdlib-only (no web-framework dependency), single worker —
generation requests are serialized through a lock since the chip runs one
program at a time; the compiled-fn cache makes repeat shapes fast.

  GET  /health            -> {"status": "ok", ...}
  GET  /info              -> device/model info
  POST /generate          -> {"prompt", "width", "height", "steps",
                              "guidance", "seed", "format": "png"|"json",
                              "references": [b64 png/jpeg, ...]  (multi-ref I2I),
                              "strength": 0..1 (img2img, with references),
                              "timeout_s": abandon the request after N s
                                (queued: dropped; running: the compiled scan
                                is cooperatively cancelled once every request
                                in its batch is abandoned),
                              "preview_id": opt into live per-step previews,
                                polled at GET /preview?id=...}
                             returns image/png bytes or base64 JSON
  GET  /preview?id=...     -> latest latent-space preview PNG for an
                              in-flight request (X-Step/X-Total-Steps
                              headers; the demo page polls this — the web
                              counterpart of the app's live checkpoint
                              previews)
  POST /chat               -> {"messages": [{role, content}, ...],
                              "max_tokens", "temperature", "seed",
                              "stream": bool} — chat on the attached text
                              encoder (the app's ChatViewModel surface);
                              stream=true sends chunked token pieces with a
                              \\x1e-separated JSON stats trailer, else JSON
                              {"reply", "tokens", "duration_s", "tok_per_s"};
                              503 when no encoder is attached
  POST /embed              -> {"prompt", "format": "json"|"npy"} — FLUX
                              conditioning embeddings through the attached
                              encoder (the app's EmbeddingsView surface):
                              json = shape/stats summary, npy = the raw
                              [1, S, dim] array as a download; 503 when no
                              encoder is attached
  GET  /models             -> model-manager inventory (the app's
                              ModelManager surface): registry repos with
                              download state + on-disk sizes, loaded
                              model/encoder, HBM stats, recommended
                              quantization

Micro-batching: concurrent /generate requests with the same
(width, height, steps, guidance) coalesce into one batched generate call
(batch follows the conditioning's leading axis). Batch size is capped by
the MXU-fill rule: measured end-to-end on v5e, batching 256px is a 1.48x
throughput win (bs=8 optimal), while EVERY batched point at 512px and
above loses — the bs=1 step already saturates the chip (~78% MFU at
1024px) — so requests above 512 image tokens intentionally run bs=1.

Run: python -m flux2_tpu.serve --random-init --port 8080
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _enable_compile_cache():
    """TPU-only persistent XLA cache (see cli.main._enable_compile_cache —
    CPU AOT artifacts are not portable across host CPU migrations)."""
    from flux2_tpu.cli.main import _enable_compile_cache as _impl

    _impl()



class _Pending:
    __slots__ = ("req", "emb", "refs", "event", "cancelled", "image", "error",
                 "enqueued_at", "preview_id")

    def __init__(self, req, emb, refs=None):
        self.req = req
        self.emb = emb
        self.refs = refs  # list of [H, W, 3] float reference images (I2I)
        self.event = threading.Event()
        self.cancelled = threading.Event()
        self.image = None
        self.error = None
        self.enqueued_at = time.time()
        self.preview_id = req.get("preview_id")  # opt-in live previews


def packed_to_rgb_preview(seq: np.ndarray, height: int, width: int) -> np.ndarray:
    """Packed latent sequence row [S, C*p*p] -> small [h/8, w/8, 3] RGB in
    [0, 1] — a latent-space approximation for live previews (the reference's
    app decodes checkpoint latents through the VAE,
    ``ImageGenerationViewModel.swift``; per-step VAE decodes don't pay their
    way on a serving chip, so previews project 3 latent channels instead and
    the full decode still happens once at the end)."""
    from flux2_tpu.ops import latents as lu

    patchified = lu.unpack_sequence_to_patchified(seq[None], height, width)
    lat = np.asarray(lu.unpatchify_latents(patchified), np.float32)[0]  # [C, h/8, w/8]
    rgb = np.transpose(lat[:3], (1, 2, 0))
    lo, hi = np.percentile(rgb, 2.0), np.percentile(rgb, 98.0)
    return np.clip((rgb - lo) / max(hi - lo, 1e-6), 0.0, 1.0)


def _png_bytes(image: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8)).save(buf, "PNG")
    return buf.getvalue()


class ChatUnavailableError(RuntimeError):
    """Raised by /chat when no text encoder is attached."""


class QueueFullError(RuntimeError):
    pass


class _BatchCancel:
    """True once EVERY request in the batch has been abandoned — one program
    serves the whole batch, so a single surviving client keeps it running."""

    def __init__(self, batch):
        self.batch = batch

    def __call__(self) -> bool:
        return all(p.cancelled.is_set() for p in self.batch)


class Flux2Server:
    def __init__(
        self,
        pipeline,
        embeddings_fn=None,
        max_batch: int = 8,
        batch_window_s: float = 0.05,
        max_queue: int = 64,
        max_wait_s: float = 10.0,
        chat_fn=None,
    ):
        self.pipeline = pipeline
        self.embeddings_fn = embeddings_fn  # prompt -> embeddings (random-init mode)
        self.chat_fn = chat_fn  # override for tests; None -> pipeline's encoder
        self.lock = threading.Lock()
        # The chip runs one program at a time: chat decoding (handler thread)
        # and image batches (worker thread) take this lock around device work.
        self.chip_lock = threading.Lock()
        self.chats_served = 0
        self.embeds_served = 0
        self.started = time.time()
        self.requests_served = 0
        self.batches_run = 0
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self.max_queue = max_queue
        self.max_wait_s = max_wait_s
        self._queue: list = []
        self._running_batch: Optional[list] = None  # in-flight batch (cancel_all)
        self._previews: dict = {}  # preview_id -> {"step", "total", "png", "t"}
        self._previews_lock = threading.Lock()
        self._watch_state = ([], 0, 0, 0)  # (watchers, h, w, total) for _preview_dispatch
        self._queue_cv = threading.Condition()
        self._shutdown = False
        self._worker = threading.Thread(target=self._serve_loop, daemon=True)
        self._worker.start()

    def shutdown(self) -> None:
        """Stop the batching worker (tests / graceful restarts)."""
        with self._queue_cv:
            self._shutdown = True
            self._queue_cv.notify_all()
        self._worker.join(timeout=5)

    # -- micro-batching worker ------------------------------------------------

    def _shape_key(self, p: "_Pending"):
        req = p.req
        base = (
            int(req.get("height", 1024)),
            int(req.get("width", 1024)),
            req.get("steps"),
            req.get("guidance"),
        )
        if p.refs is not None:
            # I2I requests carry unique reference latents: batch of 1
            return base + (id(p),)
        return base

    # Batching pays only while the bs=1 step UNDERFILLS the chip. Measured
    # end-to-end per image (Klein-4B W8A8, v5e, 4 steps): 256px 0.198 s
    # (bs=1) -> 0.134 s (bs=8, 1.48x) -> 0.150 s (bs=16, worse); 512px
    # 0.302 s (bs=1) -> 0.327 s (bs=2) -> 0.328 s (bs=4) — every batched
    # 512px point LOSES; 1024px bs=4 loses outright (the bs=1 step already
    # runs ~78% MFU). So: images above SATURATION_TOKENS image tokens run
    # bs=1; smaller ones batch until ~FILL_TOKENS total image tokens
    # (256px -> bs=8, the measured optimum; bs=16 over-fills).
    SATURATION_TOKENS = 512
    FILL_TOKENS = 2048

    def _batch_cap(self, key) -> int:
        h, w = key[0], key[1]
        img_tokens = max(1, (h // 16) * (w // 16))
        if img_tokens > self.SATURATION_TOKENS:
            return 1
        return max(1, min(self.max_batch, self.FILL_TOKENS // img_tokens))

    def _pick_batch(self) -> list:
        """Cross-shape scheduling: run the LARGEST same-shape group (best
        chip utilization per program launch) unless the oldest request has
        aged past ``max_wait_s`` — then its group runs first (no starvation
        behind a popular shape). Group size is additionally capped by the
        MXU-fill rule (see ``_batch_cap``). Requests whose client already
        timed out are dropped here instead of burning a batch."""
        self._queue = [p for p in self._queue if not p.cancelled.is_set()]
        if not self._queue:
            return []
        groups: dict = {}
        for p in self._queue:
            groups.setdefault(self._shape_key(p), []).append(p)
        oldest = self._queue[0]
        if time.time() - oldest.enqueued_at > self.max_wait_s:
            key = self._shape_key(oldest)
        else:
            key = max(groups, key=lambda k: (len(groups[k]), -groups[k][0].enqueued_at))
        batch = groups[key][: self._batch_cap(key)]
        for p in batch:
            self._queue.remove(p)
        self._running_batch = batch  # visible to cancel_all during the run
        return batch

    def _serve_loop(self):
        while True:
            with self._queue_cv:
                while not self._queue and not self._shutdown:
                    self._queue_cv.wait()
                if self._shutdown:
                    return
                # small window to let same-shape requests coalesce
                self._queue_cv.wait(self.batch_window_s)
                batch = self._pick_batch()
            if batch:
                try:
                    self._run_batch(batch)
                finally:
                    self._running_batch = None

    def _run_batch(self, batch):
        import jax
        import jax.numpy as jnp

        from flux2_tpu.ops import latents as lu

        try:
            req0 = batch[0].req
            h, w, steps, guidance = self._shape_key(batch[0])[:4]
            emb = None
            if batch[0].emb is not None:
                emb = jnp.concatenate([p.emb for p in batch], axis=0)
            # Per-request noise so every request's seed is honored even when
            # coalesced: row i is identical to a solo generate(seed=seed_i).
            hv, wv = lu.validate_dimensions(h, w)
            noise_rows = []
            for p in batch:
                k = jax.random.split(jax.random.PRNGKey(int(p.req.get("seed", 0))))[1]
                noise_rows.append(
                    lu.pack_patchified_to_sequence(
                        lu.generate_patchified_latents(k, hv, wv, batch_size=1)
                    )
                )
            # I2I: encode reference images (batch of 1 by shape-key design)
            ref_lat = ref_ids = init = None
            strength = float(req0.get("strength", 1.0))
            if batch[0].refs is not None:
                ref_lat, ref_ids = self.pipeline.encode_reference_images(batch[0].refs)
                if strength < 1.0:
                    init = self.pipeline.encode_image_to_packed_sequence(batch[0].refs[0])
            # Live previews: only when a client opted in (the per-step
            # device->host latent transfer is skipped entirely otherwise).
            # The callback object is the per-server _preview_dispatch so its
            # identity — an io_callback compile-cache key — never changes;
            # per-batch watcher state is swapped in around the call.
            on_latents = None
            watchers = [(i, p.preview_id) for i, p in enumerate(batch) if p.preview_id]
            if watchers:
                self._watch_state = (watchers, h, w, steps or 0)
                on_latents = self._preview_dispatch

            # Cooperative cancel: abort the compiled scan once EVERY request
            # in the batch has been abandoned (timeout / client gone).
            cancel = _BatchCancel(batch)
            with self.chip_lock:
                res = self.pipeline.generate(
                    prompt=req0.get("prompt", ""),
                    embeddings=emb,
                    height=h,
                    width=w,
                    num_steps=steps,
                    guidance=guidance,
                    seed=int(req0.get("seed", 0)),
                    noise=jnp.concatenate(noise_rows, axis=0),
                    reference_latents=ref_lat,
                    reference_ids=ref_ids,
                    strength=strength,
                    init_latents=init,
                    cancel=cancel,
                    on_latents=on_latents,
                )
            images = res.images if res.images is not None else res.image[None]
            for i, p in enumerate(batch):
                p.image = images[min(i, images.shape[0] - 1)]
        except Exception as e:  # pragma: no cover - surfaced per request
            for p in batch:
                p.error = e
        finally:
            with self.lock:
                self.requests_served += len(batch)
                self.batches_run += 1
            for p in batch:
                p.event.set()

    # -- request path -----------------------------------------------------------

    def generate_png(self, req: dict) -> bytes:
        emb = None
        if self.embeddings_fn is not None:
            emb = self.embeddings_fn(req.get("prompt", ""))
        refs = _decode_references(req)
        pending = _Pending(req, emb, refs=refs)
        with self._queue_cv:
            if len(self._queue) >= self.max_queue:
                raise QueueFullError(f"queue full ({self.max_queue} pending); retry later")
            self._queue.append(pending)
            self._queue_cv.notify_all()
        timeout = req.get("timeout_s")
        if not pending.event.wait(timeout=float(timeout) if timeout else None):
            # abandoned: a queued request is dropped before running; a running
            # batch aborts its compiled scan once all members are abandoned
            pending.cancelled.set()
            raise TimeoutError(f"generation exceeded timeout_s={timeout}")
        if pending.error is not None:
            raise pending.error
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray((np.clip(pending.image, 0, 1) * 255).astype(np.uint8)).save(buf, "PNG")
        return buf.getvalue()

    # -- live previews ---------------------------------------------------------

    def _preview_dispatch(self, step: int, lat: np.ndarray) -> None:
        """Stable-identity on_latents callback (generation is serialized
        through the worker thread, so _watch_state has one writer)."""
        watchers, h, w, total = self._watch_state
        for row, pid in watchers:
            row = min(row, lat.shape[0] - 1)
            png = _png_bytes(packed_to_rgb_preview(lat[row], h, w))
            self._store_preview(pid, step, total, png)

    def _store_preview(self, pid: str, step: int, total: int, png: bytes) -> None:
        now = time.time()
        with self._previews_lock:
            self._previews[str(pid)[:64]] = {"step": step, "total": total, "png": png, "t": now}
            if len(self._previews) > 256:
                # prune stale watchers, then HARD-cap by evicting oldest:
                # age alone never shrinks the dict under sustained fresh
                # preview ids (each entry holds a PNG blob — a slow leak)
                for k in [k for k, v in self._previews.items() if now - v["t"] > 300]:
                    del self._previews[k]
                while len(self._previews) > 256:
                    del self._previews[min(self._previews, key=lambda k: self._previews[k]["t"])]

    def get_preview(self, pid: str):
        with self._previews_lock:
            return self._previews.get(pid)

    def cancel_all(self) -> int:
        """Abandon every pending/running request (graceful drain). The
        RUNNING batch was already removed from the queue by _pick_batch, so
        it is tracked separately — cancelling it trips the in-scan
        _BatchCancel predicate instead of letting the denoise run out."""
        with self._queue_cv:
            pending = list(self._queue) + list(getattr(self, "_running_batch", ()) or ())
        for p in pending:
            p.cancelled.set()
        return len(pending)

    def info(self) -> dict:
        import jax

        return {
            "model": self.pipeline.model.value,
            "backend": jax.default_backend(),
            "devices": len(jax.devices()),
            "sharded": self.pipeline.mesh is not None,
            "uptime_s": round(time.time() - self.started, 1),
            "requests_served": self.requests_served,
            "batches_run": self.batches_run,
            "chats_served": self.chats_served,
            "embeds_served": self.embeds_served,
            "max_batch": self.max_batch,
            "queue_depth": len(self._queue),
        }

    # -- chat (the app's ChatViewModel surface) --------------------------------

    def chat_available(self) -> bool:
        return self.chat_fn is not None or (
            getattr(self.pipeline, "encoders", None) is not None
            and self.pipeline.text_encoder_name is not None
        )

    def chat(self, messages, *, max_tokens: int = 512, temperature: float = 0.7,
             seed: int = 0, on_token=None, thinking: bool = False) -> dict:
        """Run a chat turn on the attached text encoder (reference:
        ChatViewModel.sendMessage — streaming tokens + GenerationStats).

        Returns {"reply", "tokens", "duration_s", "tok_per_s"}. Raises
        ChatUnavailableError when no encoder is attached (random-init /
        --no-text-encoder servers)."""
        if not isinstance(messages, list) or not messages:
            raise ValueError("messages must be a non-empty list of {role, content}")
        t0 = time.time()
        ntok = [0]

        def counting(piece):
            ntok[0] += 1
            if on_token is not None:
                on_token(piece)

        if self.chat_fn is not None:
            reply = self.chat_fn(messages, max_tokens=max_tokens,
                                 temperature=temperature, seed=seed, on_token=counting)
        else:
            pipe = self.pipeline
            if getattr(pipe, "encoders", None) is None or pipe.text_encoder_name is None:
                raise ChatUnavailableError(
                    "no text encoder attached — start serve with real weights "
                    "(not --random-init / --no-text-encoder) to enable chat"
                )
            from flux2_tpu.models.text_encoders.generation import GenerateParameters

            with self.chip_lock:  # decoding and image batches share the chip
                reply = pipe.encoders.chat(
                    messages, pipe.text_encoder_name,
                    params=GenerateParameters(max_tokens=int(max_tokens),
                                              temperature=float(temperature)),
                    seed=int(seed), on_token=counting,
                    enable_thinking=thinking,
                )
        dur = max(time.time() - t0, 1e-6)
        with self.lock:
            self.chats_served += 1
        return {"reply": reply, "tokens": ntok[0], "duration_s": round(dur, 2),
                "tok_per_s": round(ntok[0] / dur, 1)}

    # -- embeddings (the app's EmbeddingsView surface) -------------------------

    def embed(self, prompt: str):
        """FLUX conditioning embeddings for a prompt through the attached
        text encoder (the app's EmbeddingsView / `flux-encoders embed` over
        HTTP). Returns the [1, S, dim] float array."""
        if not isinstance(prompt, str) or not prompt.strip():
            raise ValueError("prompt must be a non-empty string")
        pipe = self.pipeline
        if pipe.text_encoder is None:
            raise ChatUnavailableError(
                "no text encoder attached — start serve with real weights "
                "(not --random-init / --no-text-encoder) to extract embeddings"
            )
        with self.chip_lock:  # encoder forward shares the chip with batches
            emb = np.asarray(pipe.encode_prompt(prompt), np.float32)
        with self.lock:
            self.embeds_served += 1
        return emb

    # -- model manager (the app's ModelManager surface) ------------------------

    def models(self) -> dict:
        """Model-manager inventory: every registry repo with its download
        state and on-disk size, plus live device-memory stats (reference:
        ModelManager @Published download/size/MemoryStats state)."""
        import os

        from flux2_tpu.io import registry
        from flux2_tpu.utils import memory as mem

        def disk_size(path):
            if not path:
                return 0
            total = 0
            for root, _, files in os.walk(path):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            return total

        transformers = []
        for model, spec in registry.TRANSFORMER_REPOS.items():
            path = registry.find_model_path(spec)
            transformers.append({
                "model": model.value,
                "repo": spec.repo_id,
                "gated": spec.gated,
                "approx_size_gb": spec.approx_size_gb,
                "downloaded": path is not None,
                "size_bytes": disk_size(path),
                "prequantized": sorted(
                    fmt for (m, fmt) in registry.PREQUANTIZED_TRANSFORMER_REPOS if m is model
                ),
                "loaded": model is self.pipeline.model,
            })
        encoders = []
        for name, spec in registry.TEXT_ENCODER_REPOS.items():
            path = registry.find_model_path(spec)
            encoders.append({
                "name": name,
                "repo": spec.repo_id,
                "gated": spec.gated,
                "approx_size_gb": spec.approx_size_gb,
                "downloaded": path is not None,
                "size_bytes": disk_size(path),
                "variants": sorted(registry.ENCODER_VARIANT_REPOS.get(name, {})),
                "loaded": name == self.pipeline.text_encoder_name,
            })
        vae_path = registry.find_model_path(registry.VAE_REPO)
        try:
            hbm = mem.device_memory_stats()
        except Exception:  # CPU backends may not report memory stats
            hbm = {}
        return {
            "loaded": {
                "model": self.pipeline.model.value,
                "encoder": self.pipeline.text_encoder_name,
                "sharded": self.pipeline.mesh is not None,
                "chat_available": self.chat_available(),
            },
            "memory": hbm,
            "recommended_quantization": mem.recommended_quantization(self.pipeline.model),
            "models_dir": registry.models_dir(),
            "transformers": transformers,
            "text_encoders": encoders,
            "vae": {
                "repo": registry.VAE_REPO.repo_id,
                "downloaded": vae_path is not None,
                "size_bytes": disk_size(vae_path),
            },
        }


# Built-in demo page (the reference's SwiftUI app surface — Sources/Flux2App
# — re-imagined as a served web UI: prompt box, size/steps/seed controls,
# live status from /info, inline result).
_DEMO_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>flux2-tpu</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:760px;margin:2rem auto;padding:0 1rem;color:#1a1a2e}
 h1{font-size:1.3rem} .row{display:flex;gap:.6rem;flex-wrap:wrap;margin:.5rem 0}
 input,select,button{padding:.45rem .6rem;font-size:.95rem;border:1px solid #bbb;border-radius:6px}
 #prompt{flex:1;min-width:320px} button{background:#2d4a8a;color:#fff;border:none;cursor:pointer}
 button:disabled{background:#999} #out img{max-width:100%;border-radius:8px;margin-top:1rem}
 #status{color:#666;font-size:.85rem;white-space:pre-wrap}
 nav{display:flex;gap:.4rem;margin:.8rem 0} nav button{background:#eee;color:#1a1a2e}
 nav button.on{background:#2d4a8a;color:#fff} .pane{display:none} .pane.on{display:block}
 #chatlog{border:1px solid #ddd;border-radius:8px;padding:.6rem;min-height:180px;max-height:420px;
  overflow-y:auto;margin:.5rem 0;font-size:.95rem;white-space:pre-wrap}
 .msg-u{color:#2d4a8a;font-weight:600} .msg-a{color:#1a1a2e}
 table{border-collapse:collapse;width:100%;font-size:.85rem;margin:.5rem 0}
 th,td{border-bottom:1px solid #ddd;padding:.3rem .5rem;text-align:left}
 .badge{font-size:.75rem;padding:.1rem .4rem;border-radius:4px;background:#e6efe6;color:#22662a}
 .badge.off{background:#f0f0f0;color:#888}
</style></head><body>
<h1>flux2-tpu</h1>
<nav>
 <button id="tab-gen" class="on" onclick="tab('gen')">Generate</button>
 <button id="tab-chat" onclick="tab('chat')">Chat</button>
 <button id="tab-emb" onclick="tab('emb')">Embeddings</button>
 <button id="tab-models" onclick="tab('models')">Models</button>
</nav>
<div id="pane-gen" class="pane on">
<div class="row"><input id="prompt" placeholder="prompt" value="a serene mountain lake at dawn"></div>
<div class="row">
 <select id="size"><option>512</option><option selected>1024</option><option>2048</option></select>
 <input id="steps" type="number" value="4" min="1" max="50" style="width:5rem" title="steps">
 <input id="guidance" type="number" value="" step="0.5" placeholder="guid" style="width:5rem" title="guidance (blank = model default)">
 <input id="seed" type="number" value="0" style="width:7rem" title="seed">
 <button id="go" onclick="gen()">Generate</button>
</div>
<div class="row">
 <input id="refs" type="file" accept="image/*" multiple title="reference images (I2I)">
 <label>strength <input id="strength" type="range" min="0.1" max="1" step="0.05" value="1"
  oninput="document.getElementById('sv').textContent=this.value"> <span id="sv">1</span></label>
 <label><input id="preview" type="checkbox" checked> live preview</label>
</div>
<div id="status"></div><div id="out"></div>
</div>
<div id="pane-chat" class="pane">
 <div id="chatlog"></div>
 <div class="row">
  <input id="chatin" placeholder="message" style="flex:1;min-width:280px"
   onkeydown="if(event.key==='Enter')sendChat()">
  <input id="maxtok" type="number" value="512" min="16" max="4096" style="width:6rem" title="max tokens">
  <input id="temp" type="number" value="0.7" step="0.1" min="0" max="2" style="width:5rem" title="temperature">
  <label title="Qwen3 thinking mode"><input id="think" type="checkbox"> thinking</label>
  <button id="send" onclick="sendChat()">Send</button>
  <button onclick="chatMsgs=[];document.getElementById('chatlog').textContent=''">Clear</button>
 </div>
 <div id="chatstats" style="color:#666;font-size:.85rem"></div>
</div>
<div id="pane-emb" class="pane">
 <div class="row">
  <input id="embprompt" placeholder="prompt to embed" style="flex:1;min-width:320px"
   onkeydown="if(event.key==='Enter')inspectEmb()">
  <button onclick="inspectEmb()">Inspect</button>
  <button onclick="downloadEmb()">Download .npy</button>
 </div>
 <div id="embout" style="color:#666;font-size:.9rem"></div>
</div>
<div id="pane-models" class="pane"><div id="modelsout">loading…</div></div>
<script>
async function embReq(fmt){const p=document.getElementById('embprompt').value.trim();
 if(!p)throw new Error('enter a prompt');
 const r=await fetch('/embed',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({prompt:p,format:fmt})});
 if(!r.ok)throw new Error((await r.json()).error||r.statusText);return r;}
async function inspectEmb(){const out=document.getElementById('embout');out.textContent='encoding…';
 try{const j=await(await embReq('json')).json();
  out.innerHTML=`<table><tr><th>shape</th><th>dtype</th><th>mean</th><th>std</th>`+
   `<th>min</th><th>max</th><th>token ‖·‖ mean</th></tr>`+
   `<tr><td>[${j.shape}]</td><td>${j.dtype}</td><td>${j.mean.toFixed(4)}</td>`+
   `<td>${j.std.toFixed(4)}</td><td>${j.min.toFixed(3)}</td><td>${j.max.toFixed(3)}</td>`+
   `<td>${j.token_norm_mean.toFixed(2)}</td></tr></table>`;
 }catch(e){out.textContent='error: '+e.message;}}
async function downloadEmb(){const out=document.getElementById('embout');
 try{const blob=await(await embReq('npy')).blob();
  const a=document.createElement('a');a.href=URL.createObjectURL(blob);
  a.download='embeddings.npy';a.click();URL.revokeObjectURL(a.href);
 }catch(e){out.textContent='error: '+e.message;}}
function tab(t){for(const x of ['gen','chat','emb','models']){
 document.getElementById('tab-'+x).classList.toggle('on',x===t);
 document.getElementById('pane-'+x).classList.toggle('on',x===t);}
 if(t==='models')loadModels();}
let chatMsgs=[];
async function sendChat(){const inp=document.getElementById('chatin'),log=document.getElementById('chatlog');
 const text=inp.value.trim();if(!text)return;inp.value='';
 chatMsgs.push({role:'user',content:text});
 log.innerHTML+=`<div class="msg-u">you: ${text.replace(/</g,'&lt;')}</div><div class="msg-a" id="cur"></div>`;
 const b=document.getElementById('send');b.disabled=true;
 try{const r=await fetch('/chat',{method:'POST',headers:{'Content-Type':'application/json'},
   body:JSON.stringify({messages:chatMsgs,stream:true,
     max_tokens:+document.getElementById('maxtok').value,
     temperature:+document.getElementById('temp').value,
     thinking:document.getElementById('think').checked})});
  if(!r.ok){throw new Error((await r.json()).error||r.statusText)}
  const rd=r.body.getReader(),dec=new TextDecoder();let full='';
  for(;;){const{done,value}=await rd.read();if(done)break;
   full+=dec.decode(value,{stream:true});
   const vis=full.split('\\x1e')[0];
   document.getElementById('cur').textContent='model: '+vis;
   log.scrollTop=log.scrollHeight;}
  const parts=full.split('\\x1e');
  chatMsgs.push({role:'assistant',content:parts[0].trimEnd()});
  if(parts[1]){const s=JSON.parse(parts[1]);
   document.getElementById('chatstats').textContent=
    `${s.tokens} tokens in ${s.duration_s}s (${s.tok_per_s} tok/s)`;}
 }catch(e){document.getElementById('cur').textContent='error: '+e;chatMsgs.pop();}
 document.getElementById('cur').removeAttribute('id');b.disabled=false;}
function gb(n){return n? (n/1073741824).toFixed(1)+' GB':'—';}
async function loadModels(){const out=document.getElementById('modelsout');
 try{const j=await(await fetch('/models')).json();
  const row=m=>`<tr><td>${m.model||m.name}${m.loaded?' <span class="badge">loaded</span>':''}</td>`+
   `<td>${m.repo}${m.gated?' 🔒':''}</td>`+
   `<td><span class="badge${m.downloaded?'':' off'}">${m.downloaded?gb(m.size_bytes):'not downloaded'}</span></td>`+
   `<td>${(m.prequantized||m.variants||[]).join(' ')||''}</td></tr>`;
  const mem=j.memory&&j.memory.bytes_limit?
   ` | HBM ${gb(j.memory.bytes_in_use)} / ${gb(j.memory.bytes_limit)}`:'';
  out.innerHTML=`<div id="status">model ${j.loaded.model} | encoder ${j.loaded.encoder||'none'}`+
   ` | chat ${j.loaded.chat_available?'available':'unavailable'}${mem}`+
   ` | recommended quantization: ${j.recommended_quantization}</div>`+
   `<table><tr><th>transformer</th><th>repo</th><th>local</th><th>prequantized</th></tr>`+
   j.transformers.map(row).join('')+`</table>`+
   `<table><tr><th>text encoder</th><th>repo</th><th>local</th><th>variants</th></tr>`+
   j.text_encoders.map(row).join('')+`</table>`+
   `<div id="status">VAE ${j.vae.repo}: ${j.vae.downloaded?gb(j.vae.size_bytes):'not downloaded'}`+
   ` | models dir ${j.models_dir}</div>`;
 }catch(e){out.textContent='error: '+e;}}
</script>
<script>
async function refresh(){try{const r=await fetch('/info');const j=await r.json();
 document.getElementById('status').textContent=`model ${j.model} | ${j.backend} x${j.devices}`+
 ` | served ${j.requests_served} in ${j.batches_run} batches | queue ${j.queue_depth}`;}catch(e){}}
function readRefs(){const fs=document.getElementById('refs').files;
 return Promise.all([...fs].map(f=>new Promise((res,rej)=>{const rd=new FileReader();
  rd.onload=()=>res(rd.result);rd.onerror=rej;rd.readAsDataURL(f);})));}
let pollTimer=null;
function pollPreview(pid){pollTimer=setInterval(async()=>{
 try{const r=await fetch(`/preview?id=${pid}&_=${Date.now()}`);if(!r.ok)return;
  const step=r.headers.get('X-Step'),tot=r.headers.get('X-Total-Steps');
  const blob=await r.blob();
  document.getElementById('out').innerHTML=
   `<img src="${URL.createObjectURL(blob)}" style="image-rendering:pixelated;width:100%">`;
  document.getElementById('status').textContent=`denoising… step ${step}${+tot?`/${tot}`:''}`;
 }catch(e){}},400);}
async function gen(){const b=document.getElementById('go');b.disabled=true;const t0=Date.now();
 try{const s=+document.getElementById('size').value;
  const refs=await readRefs();
  const body={prompt:document.getElementById('prompt').value,width:s,height:s,
    steps:+document.getElementById('steps').value,seed:+document.getElementById('seed').value};
  const g=document.getElementById('guidance').value; if(g!=='')body.guidance=+g;
  if(refs.length){body.references=refs;body.strength=+document.getElementById('strength').value;}
  if(document.getElementById('preview').checked){
   body.preview_id=Math.random().toString(36).slice(2);pollPreview(body.preview_id);}
  const r=await fetch('/generate',{method:'POST',headers:{'Content-Type':'application/json'},
   body:JSON.stringify(body)});
  if(pollTimer){clearInterval(pollTimer);pollTimer=null;}
  if(!r.ok){throw new Error(await r.text())}
  const blob=await r.blob();
  document.getElementById('out').innerHTML=`<img src="${URL.createObjectURL(blob)}">`;
  document.getElementById('status').textContent=`done in ${((Date.now()-t0)/1000).toFixed(1)}s`;
 }catch(e){if(pollTimer){clearInterval(pollTimer);pollTimer=null;}
  document.getElementById('status').textContent=String(e);}b.disabled=false;refresh();}
refresh();setInterval(refresh,5000);
</script></body></html>"""


def _decode_references(req: dict):
    """Base64 PNG/JPEG reference images -> [H, W, 3] float arrays (I2I)."""
    refs_b64 = req.get("references") or []
    if not refs_b64:
        return None
    from PIL import Image

    refs = []
    for b in refs_b64:
        if isinstance(b, str) and "," in b and b.lstrip().startswith("data:"):
            b = b.split(",", 1)[1]  # data-URL from the demo page
        raw = base64.b64decode(b)
        with Image.open(io.BytesIO(raw)) as im:
            refs.append(np.asarray(im.convert("RGB"), np.float32) / 255.0)
    return refs


def make_handler(server: Flux2Server):
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer coding (the streaming /chat response) is only
        # valid for HTTP/1.1 — browsers do NOT de-chunk an HTTP/1.0 body, so
        # the demo page would render raw hex chunk framing. Every non-chunked
        # response sets Content-Length, which HTTP/1.1 keep-alive requires.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/info":
                self._json(200, server.info())
            elif self.path.startswith("/preview"):
                from urllib.parse import parse_qs, urlparse

                pid = (parse_qs(urlparse(self.path).query).get("id") or [""])[0]
                entry = server.get_preview(pid)
                if entry is None:
                    self._json(404, {"error": "no preview yet"})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(entry["png"])))
                self.send_header("X-Step", str(entry["step"]))
                self.send_header("X-Total-Steps", str(entry["total"]))
                self.end_headers()
                self.wfile.write(entry["png"])
            elif self.path == "/models":
                try:
                    self._json(200, server.models())
                except Exception as e:
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
            elif self.path in ("/", "/index.html"):
                body = _DEMO_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/chat":
                self._do_chat()
                return
            if self.path == "/embed":
                self._do_embed()
                return
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                png = server.generate_png(req)
            except QueueFullError as e:  # backpressure: let clients retry
                self._json(503, {"error": str(e)})
                return
            except TimeoutError as e:  # per-request timeout_s exceeded
                self._json(504, {"error": str(e)})
                return
            except Exception as e:  # surface errors as JSON, keep serving
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            if req.get("format") == "json":
                self._json(200, {"image_png_base64": base64.b64encode(png).decode()})
            else:
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)

        def _do_embed(self):
            """POST /embed: {"prompt", "format": "json"|"npy"}.

            json (default) -> shape/stats summary for the embeddings panel;
            npy -> the raw [1, S, dim] array as a downloadable .npy
            (the app's EmbeddingsView export / `flux-encoders embed`)."""
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                emb = server.embed(req.get("prompt", ""))
                if req.get("format") == "npy":
                    buf = io.BytesIO()
                    np.save(buf, emb)
                    body = buf.getvalue()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header(
                        "Content-Disposition", 'attachment; filename="embeddings.npy"'
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                tok_norms = np.linalg.norm(emb[0], axis=-1)
                self._json(200, {
                    "shape": list(emb.shape),
                    "dtype": str(emb.dtype),
                    "seq_len": int(emb.shape[-2]),
                    "dim": int(emb.shape[-1]),
                    "mean": float(emb.mean()),
                    "std": float(emb.std()),
                    "min": float(emb.min()),
                    "max": float(emb.max()),
                    "token_norm_mean": float(tok_norms.mean()),
                    "token_norm_max": float(tok_norms.max()),
                })
            except ChatUnavailableError as e:
                self._json(503, {"error": str(e)})
            except (ValueError, TypeError, KeyError) as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except BrokenPipeError:  # client went away mid-download
                pass
            except Exception as e:
                try:  # the response may already be started (npy path)
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                except Exception:
                    pass

        def _do_chat(self):
            """POST /chat: {"messages": [{role, content}, ...], "max_tokens",
            "temperature", "seed", "stream": bool}.

            stream=false -> JSON {"reply", "tokens", "duration_s", "tok_per_s"}.
            stream=true  -> chunked text/plain token pieces as they decode
            (the web counterpart of ChatViewModel's streaming tokens)."""
            streaming = False  # True once the chunked response headers are out
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                kwargs = dict(
                    max_tokens=int(req.get("max_tokens", 512)),
                    temperature=float(req.get("temperature", 0.7)),
                    seed=int(req.get("seed", 0)),
                    thinking=bool(req.get("thinking", False)),
                )
                if not req.get("stream"):
                    self._json(200, server.chat(req.get("messages"), **kwargs))
                    return
                if not server.chat_available():
                    raise ChatUnavailableError(
                        "no text encoder attached — start serve with real weights "
                        "(not --random-init / --no-text-encoder) to enable chat"
                    )
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Transfer-Encoding", "chunked")
                self.send_header("X-Accel-Buffering", "no")
                self.end_headers()

                def emit(piece: str):
                    data = piece.encode("utf-8")
                    if data:
                        self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
                        self.wfile.flush()

                streaming = True
                stats = server.chat(req.get("messages"), on_token=emit, **kwargs)
                # final chunk carries the stats as a JSON trailer line the
                # demo page strips from the visible text
                emit("\n\x1e" + json.dumps(
                    {k: stats[k] for k in ("tokens", "duration_s", "tok_per_s")}
                ))
                self.wfile.write(b"0\r\n\r\n")
            except ChatUnavailableError as e:
                self._json(503, {"error": str(e)})
            except (ValueError, TypeError, KeyError) as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except BrokenPipeError:  # client went away mid-stream
                pass
            except Exception as e:
                try:
                    if streaming:
                        # headers already sent: a second status line would
                        # corrupt the chunk stream — emit the error in-band
                        # and terminate the chunked body instead
                        emit("\n\x1e" + json.dumps({"error": f"{type(e).__name__}: {e}"}))
                        self.wfile.write(b"0\r\n\r\n")
                    else:
                        self._json(500, {"error": f"{type(e).__name__}: {e}"})
                except Exception:
                    pass

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description="flux2-tpu serving endpoint")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--model", default="klein-4b")
    parser.add_argument("--quantization", default="bf16")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--transformer-dir")
    parser.add_argument("--vae-dir")
    parser.add_argument("--encoder-dir")
    parser.add_argument("--no-text-encoder", action="store_true")
    parser.add_argument("--small-decoder", action="store_true")
    parser.add_argument("--tp", type=int, default=0, help="shard over N devices (0 = no sharding)")
    parser.add_argument(
        "--precompile", metavar="PX,PX,...",
        help="warm the compile cache for these square sizes at startup "
        "(first requests skip the 30s+ cold-compile penalty)",
    )
    parser.add_argument("--steps-default", type=int, default=None,
                        help="steps used for --precompile warmup (default: model default)")
    args = parser.parse_args(argv)
    args.lora = []

    _enable_compile_cache()
    from flux2_tpu.cli.main import build_pipeline

    pipe = build_pipeline(args)
    if args.tp > 1:
        from flux2_tpu.parallel.mesh import make_mesh

        pipe.shard(make_mesh(data=1, fsdp=1, tp=args.tp))

    emb_fn = None
    if args.random_init:
        import jax
        import jax.numpy as jnp

        def emb_fn(prompt):
            key = jax.random.PRNGKey(abs(hash(prompt)) % (2**31))
            return jax.random.normal(key, (1, 512, pipe.transformer_config.joint_attention_dim), jnp.bfloat16)
    elif pipe.text_encoder is not None:
        # Real weights: encode on the request thread so the batching worker
        # only ever sees ready embeddings (per-request prompts batch cleanly).
        emb_fn = pipe.encode_prompt

    if args.precompile:
        import jax
        import jax.numpy as jnp

        for px in args.precompile.split(","):
            px = int(px)
            t0 = time.time()
            emb = (
                emb_fn("warmup") if emb_fn is not None
                else jnp.zeros((1, 512, pipe.transformer_config.joint_attention_dim), jnp.bfloat16)
            )
            pipe.generate(embeddings=emb, height=px, width=px,
                          num_steps=args.steps_default, seed=0)
            print(f"precompiled {px}x{px} in {time.time() - t0:.1f}s", flush=True)

    server = Flux2Server(pipe, emb_fn)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(f"flux2-tpu serving on http://{args.host}:{args.port} (model {args.model})", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
