"""Text-encoders facade, memory manager, and serving endpoint tests."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.flux2.config import Flux2Model
from flux2_tpu.models.text_encoders import config as tc
from flux2_tpu.models.text_encoders import decoder as dec
from flux2_tpu.models.text_encoders.facade import TextEncoders
from flux2_tpu.utils import memory

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier


class _StubTokenizer:
    pad_token_id = 0
    eos_token_id = None

    def apply_chat_template(self, messages, add_generation_prompt=False):
        text = " ".join(m["content"] for m in messages)
        return [hash(w) % 200 + 3 for w in text.split()][:16]

    def decode(self, tokens):
        return " ".join(f"t{t}" for t in tokens)


@pytest.fixture(scope="module")
def encoders():
    te = TextEncoders()
    params = dec.init_params(jax.random.PRNGKey(0), tc.TINY_DECODER, dtype=jnp.float32)
    te.attach("tiny", params, tc.TINY_DECODER, _StubTokenizer(), (1, 2, 3))
    return te


def test_facade_lifecycle(encoders):
    assert encoders.is_loaded("tiny")
    emb = encoders.extract_klein_embeddings("a cat", name="tiny")
    assert emb.shape == (1, 512, 3 * tc.TINY_DECODER.hidden_size)
    encoders.unload("tiny")
    assert not encoders.is_loaded("tiny")
    # re-attach for other tests
    params = dec.init_params(jax.random.PRNGKey(0), tc.TINY_DECODER, dtype=jnp.float32)
    encoders.attach("tiny", params, tc.TINY_DECODER, _StubTokenizer(), (1, 2, 3))


def test_facade_chat(encoders):
    from flux2_tpu.models.text_encoders.generation import GenerateParameters

    out = encoders.chat(
        [{"role": "user", "content": "hello"}], "tiny",
        params=GenerateParameters(max_tokens=4, temperature=0.0),
    )
    assert isinstance(out, str) and out


def test_memory_feasibility():
    # Dev bf16 doesn't fit one 16GB chip
    r = memory.check_feasibility(Flux2Model.DEV, "bf16", hbm_bytes=16 * 1024**3)
    assert not r.feasible
    assert any("qint8" in s for s in r.suggestions)
    assert any("shard" in s for s in r.suggestions)
    # Klein-4B int4 fits
    r2 = memory.check_feasibility(Flux2Model.KLEIN_4B, "int4", hbm_bytes=16 * 1024**3)
    assert r2.feasible
    assert memory.recommended_quantization(Flux2Model.DEV, hbm_bytes=16 * 1024**3) == "int4"
    assert memory.recommended_quantization(Flux2Model.KLEIN_4B, hbm_bytes=64 * 1024**3) == "bf16"


def test_device_memory_stats():
    stats = memory.device_memory_stats()
    assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}


def test_serving_endpoint():
    from http.server import ThreadingHTTPServer

    from flux2_tpu.serve import Flux2Server, make_handler
    from tests.test_pipeline import tiny_pipeline

    pipe = tiny_pipeline()

    def emb_fn(prompt):
        key = jax.random.PRNGKey(abs(hash(prompt)) % (2**31))
        return jax.random.normal(key, (1, 8, pipe.transformer_config.joint_attention_dim))

    server = Flux2Server(pipe, emb_fn)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/info") as r:
            info = json.loads(r.read())
            assert info["model"] == "klein-4b"
        body = json.dumps({"prompt": "x", "width": 64, "height": 64, "steps": 1, "format": "json"}).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
            assert "image_png_base64" in out
        # PNG mode
        body2 = json.dumps({"prompt": "x", "width": 64, "height": 64, "steps": 1}).encode()
        req2 = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=body2, method="POST")
        with urllib.request.urlopen(req2) as r:
            data = r.read()
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # malformed request -> 400, server keeps serving
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=b"{bad json", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        server.shutdown()


def test_pipeline_with_attached_text_encoder(encoders):
    """End-to-end: prompt -> extractor -> pipeline.generate."""
    import dataclasses

    from flux2_tpu.models.flux2 import config as fcfg, vae as vae_mod
    from flux2_tpu.pipeline.pipeline import Flux2Pipeline

    enc = encoders.get("tiny")
    tc_cfg = fcfg.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128,
        joint_attention_dim=enc.extractor.embedding_dim,
        guidance_embeds=False,
    )
    vc = vae_mod.VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1, norm_num_groups=4)
    pipe = Flux2Pipeline.from_random(
        model=fcfg.Flux2Model.KLEIN_4B, dtype=jnp.float32,
        transformer_config=tc_cfg, vae_config=vc,
    )
    pipe.text_encoder = enc.extractor
    res = pipe.generate(prompt="a tiny cat", height=64, width=64, num_steps=1, seed=3)
    assert res.image.shape == (64, 64, 3)
    assert res.phase_timings["text_encoding"] > 0


def test_facade_shard_encoder(encoders):
    from flux2_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(data=1, fsdp=2, tp=4)
    ref = encoders.extract_klein_embeddings("a cat", name="tiny")
    encoders.shard("tiny", mesh)
    with mesh:
        out = encoders.extract_klein_embeddings("a cat", name="tiny")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_compare_embeddings(encoders):
    from flux2_tpu.models.text_encoders.facade import compare_embeddings

    a = encoders.extract_klein_embeddings("a cat", name="tiny")
    stats_same = compare_embeddings(a, a)
    assert stats_same["cosine_similarity"] == pytest.approx(1.0)
    assert stats_same["max_abs_diff"] == 0.0
    b = a + 0.01
    stats = compare_embeddings(a, b)
    assert stats["max_abs_diff"] == pytest.approx(0.01, rel=1e-3)
    assert 0.9 < stats["cosine_similarity"] <= 1.0


def test_serving_micro_batching():
    """Concurrent same-shape requests coalesce into one batched generate."""
    import concurrent.futures

    from flux2_tpu.serve import Flux2Server
    from tests.test_pipeline import tiny_pipeline

    pipe = tiny_pipeline()

    def emb_fn(prompt):
        key = jax.random.PRNGKey(abs(hash(prompt)) % (2**31))
        return jax.random.normal(key, (1, 8, pipe.transformer_config.joint_attention_dim))

    server = Flux2Server(pipe, emb_fn, max_batch=4, batch_window_s=0.3)
    # warm the compiled path so the batch window isn't spent compiling
    server.generate_png({"prompt": "warm", "width": 64, "height": 64, "steps": 1})
    base_batches = server.batches_run

    reqs = [{"prompt": f"p{i}", "width": 64, "height": 64, "steps": 1} for i in range(4)]
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        pngs = list(ex.map(server.generate_png, reqs))
    assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for p in pngs)
    # 4 requests ran in fewer than 4 batches (window coalescing); different
    # prompts -> different conditioning -> distinct images
    assert server.batches_run - base_batches < 4
    assert len({bytes(p) for p in pngs}) == len(pngs)
    server.shutdown()


def test_serving_per_request_seeds():
    """Coalesced requests keep their own seeds: each batched row is pixel-
    identical to a solo generate with that request's seed."""
    import concurrent.futures

    from flux2_tpu.serve import Flux2Server
    from tests.test_pipeline import tiny_pipeline

    pipe = tiny_pipeline()
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, pipe.transformer_config.joint_attention_dim))
    server = Flux2Server(pipe, lambda prompt: emb, max_batch=4, batch_window_s=0.3)
    server.generate_png({"prompt": "warm", "width": 64, "height": 64, "steps": 1, "seed": 9})

    reqs = [{"prompt": "same", "width": 64, "height": 64, "steps": 1, "seed": s} for s in (11, 22)]
    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
        pngs = list(ex.map(server.generate_png, reqs))
    server.shutdown()
    # same conditioning, different seeds -> different images
    assert pngs[0] != pngs[1]
    # each row reproduces the solo pipeline run with that seed (PNG is a
    # lossless u8 roundtrip, so compare at u8)
    import io

    from PIL import Image

    for png, s in zip(pngs, (11, 22)):
        solo = pipe.generate(embeddings=emb, height=64, width=64, num_steps=1, seed=s)
        solo_u8 = (np.clip(solo.image, 0, 1) * 255).astype(np.uint8)
        got = np.asarray(Image.open(io.BytesIO(png)))
        # batched-vs-solo XLA reductions differ at ~1e-6 f32; allow the
        # single u8 rounding unit that can flip
        assert np.abs(got.astype(int) - solo_u8.astype(int)).max() <= 1


def test_serving_demo_page_and_queue_policy():
    """GET / serves the demo UI; cross-shape scheduling picks the largest
    same-shape group and ages out starving shapes; full queue -> 503."""
    from http.server import ThreadingHTTPServer

    from flux2_tpu.serve import Flux2Server, QueueFullError, _Pending, make_handler
    from tests.test_pipeline import tiny_pipeline

    pipe = tiny_pipeline()
    server = Flux2Server(pipe, None, max_batch=4, max_queue=2, max_wait_s=10.0)
    server.shutdown()  # drive _pick_batch directly (no worker racing)

    def pend(h, w, age=0.0):
        p = _Pending({"height": h, "width": w, "steps": 1}, None)
        p.enqueued_at -= age
        return p

    # largest group wins over FIFO head
    server._queue = [pend(64, 64), pend(128, 128), pend(128, 128)]
    batch = server._pick_batch()
    assert [server._shape_key(p) for p in batch] == [(128, 128, 1, None)] * 2
    # aging: a starving head older than max_wait_s preempts the bigger group
    server._queue = [pend(64, 64, age=99.0), pend(128, 128), pend(128, 128)]
    batch = server._pick_batch()
    assert server._shape_key(batch[0]) == (64, 64, 1, None)
    # backpressure: queue full raises (handler maps it to 503)
    server._queue = [pend(64, 64), pend(64, 64)]
    with pytest.raises(QueueFullError):
        server.generate_png({"prompt": "x", "width": 64, "height": 64})

    # MXU-fill batch cap: 512px+ (>512 img tokens) runs bs=1 even with a
    # deep same-shape queue (measured: every batched point there loses
    # throughput); 256px (256 tokens) batches to the measured bs=8
    # optimum; tiny shapes keep the max_batch cap
    server._queue = [pend(1024, 1024) for _ in range(4)]
    assert len(server._pick_batch()) == 1
    server8 = Flux2Server(pipe, None, max_batch=8)
    server8.shutdown()
    server8._queue = [pend(512, 512) for _ in range(8)]
    assert len(server8._pick_batch()) == 1
    server8._queue = [pend(256, 256) for _ in range(12)]
    assert len(server8._pick_batch()) == 8
    server8._queue = [pend(64, 64) for _ in range(12)]
    assert len(server8._pick_batch()) == 8

    # demo page served at /
    server2 = Flux2Server(pipe, None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server2))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            html = r.read().decode()
            assert "flux2-tpu" in html and "/generate" in html
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/info") as r:
            assert "queue_depth" in json.loads(r.read())
    finally:
        httpd.shutdown()
        server2.shutdown()


def test_serving_i2i_references_and_timeout():
    """/generate with base64 reference images runs the I2I path end-to-end
    (VERDICT r2 Missing/Weak #6), and timeout_s on a queued request returns
    504 without burning a batch."""
    import base64
    import io as _io

    from http.server import ThreadingHTTPServer

    import numpy as np
    from PIL import Image

    from flux2_tpu.serve import Flux2Server, make_handler
    from tests.test_pipeline import tiny_pipeline

    pipe = tiny_pipeline()

    def emb_fn(prompt):
        key = jax.random.PRNGKey(abs(hash(prompt)) % (2**31))
        return jax.random.normal(key, (1, 8, pipe.transformer_config.joint_attention_dim))

    server = Flux2Server(pipe, emb_fn)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        buf = _io.BytesIO()
        Image.fromarray(np.full((64, 64, 3), 90, np.uint8)).save(buf, "PNG")
        ref_b64 = base64.b64encode(buf.getvalue()).decode()
        body = json.dumps({
            "prompt": "make it blue", "width": 64, "height": 64, "steps": 1,
            "references": [ref_b64], "strength": 0.8,
        }).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        # data-URL prefix form (demo page) also accepted
        body2 = json.dumps({
            "prompt": "x", "width": 64, "height": 64, "steps": 1,
            "references": [f"data:image/png;base64,{ref_b64}"],
        }).encode()
        req2 = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=body2, method="POST")
        with urllib.request.urlopen(req2) as r:
            assert r.status == 200
        # timeout_s -> 504 for an impossible deadline
        body3 = json.dumps({"prompt": "slow", "width": 64, "height": 64,
                            "steps": 1, "timeout_s": 1e-6}).encode()
        req3 = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=body3, method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req3)
        assert e.value.code == 504
        # demo page carries the new I2I controls
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert 'id="refs"' in page and 'id="guidance"' in page and 'id="strength"' in page
    finally:
        httpd.shutdown()
        server.shutdown()


def test_serving_live_previews():
    """preview_id opt-in: per-step latent previews served at /preview
    (the app's live checkpoint previews, ImageGenerationViewModel.swift)."""
    from http.server import ThreadingHTTPServer

    from flux2_tpu.serve import Flux2Server, make_handler, packed_to_rgb_preview
    from tests.test_pipeline import tiny_pipeline

    pipe = tiny_pipeline()

    def emb_fn(prompt):
        key = jax.random.PRNGKey(1)
        return jax.random.normal(key, (1, 8, pipe.transformer_config.joint_attention_dim))

    server = Flux2Server(pipe, emb_fn)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        # unknown id -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/preview?id=nope")
        assert e.value.code == 404
        body = json.dumps({
            "prompt": "x", "width": 64, "height": 64, "steps": 2,
            "seed": 5, "preview_id": "pv-1",
        }).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        # previews persist after completion: the final step is retrievable
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/preview?id=pv-1") as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
            assert r.headers["X-Step"] == "2"
            assert r.headers["X-Total-Steps"] == "2"
        # demo page carries the preview toggle + poller
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert 'id="preview"' in page and "/preview?id=" in page
        # unit: the projection yields a latent-resolution RGB in [0, 1]
        seq = np.random.RandomState(0).randn(4 * 4, 32 * 4).astype(np.float32)
        rgb = packed_to_rgb_preview(seq, 64, 64)
        assert rgb.shape == (8, 8, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    finally:
        httpd.shutdown()
        server.shutdown()


def test_serving_chat_and_models(encoders):
    """/chat runs a turn on the attached encoder (streaming + JSON), /models
    returns the model-manager inventory — the serve counterparts of the
    app's ChatViewModel / ModelManager (Sources/Flux2App/ViewModels/)."""
    import urllib.error

    from http.server import ThreadingHTTPServer

    from flux2_tpu.serve import Flux2Server, make_handler
    from tests.test_pipeline import tiny_pipeline

    pipe = tiny_pipeline()
    # no encoder attached -> chat unavailable (503), models still works
    bare = Flux2Server(pipe, None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(bare))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        return urllib.request.urlopen(req)

    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            post("/chat", {"messages": [{"role": "user", "content": "hi"}]})
        assert e.value.code == 503
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/models") as r:
            inv = json.loads(r.read())
        assert inv["loaded"]["model"] == pipe.model.value
        assert inv["loaded"]["chat_available"] is False
        models = {t["model"] for t in inv["transformers"]}
        assert {"klein-4b", "klein-9b", "dev"} <= models
        k4 = next(t for t in inv["transformers"] if t["model"] == "klein-4b")
        assert k4["repo"].startswith("black-forest-labs/") and "qint8" in k4["prequantized"]
        assert {e["name"] for e in inv["text_encoders"]} >= {"qwen3-4b", "mistral-small-3.2"}
        assert inv["recommended_quantization"] in ("bf16", "qint8", "w8a8", "qint4", "w4a8")
        # demo page carries the chat + models tabs
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert "/chat" in page and "/models" in page and 'id="chatlog"' in page
    finally:
        httpd.shutdown()
        bare.shutdown()

    # real facade path: tiny decoder attached through the pipeline
    pipe.encoders = encoders
    pipe.text_encoder_name = "tiny"
    server = Flux2Server(pipe, None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with post("/chat", {"messages": [{"role": "user", "content": "hello world"}],
                            "max_tokens": 4, "temperature": 0.0}) as r:
            out = json.loads(r.read())
        assert out["reply"] and out["tokens"] >= 1 and out["tok_per_s"] > 0
        # streaming: chunked token pieces then a \x1e-separated stats trailer
        with post("/chat", {"messages": [{"role": "user", "content": "hello"}],
                            "max_tokens": 4, "temperature": 0.0, "stream": True}) as r:
            raw = r.read().decode()
        visible, _, trailer = raw.partition("\x1e")
        assert visible.strip()
        stats = json.loads(trailer)
        assert stats["tokens"] >= 1 and stats["duration_s"] >= 0
        assert server.chats_served == 2
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/models") as r:
            assert json.loads(r.read())["loaded"]["chat_available"] is True
    finally:
        httpd.shutdown()
        server.shutdown()


def test_serving_embed(encoders):
    """POST /embed extracts conditioning embeddings over HTTP — the serve
    counterpart of the app's EmbeddingsView (Sources/Flux2App) and
    `flux-encoders embed`: JSON stats + downloadable .npy; 503 bare."""
    import io as _io
    import urllib.error
    import urllib.request

    from http.server import ThreadingHTTPServer

    from flux2_tpu.serve import Flux2Server, make_handler
    from tests.test_pipeline import tiny_pipeline

    def post(port, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        return urllib.request.urlopen(req)

    # no encoder attached -> 503 (same contract as /chat)
    bare = Flux2Server(tiny_pipeline(), None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(bare))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            post(port, {"prompt": "a cat"})
        assert e.value.code == 503
    finally:
        httpd.shutdown()
        bare.shutdown()

    pipe = tiny_pipeline()
    pipe.text_encoder = encoders.get("tiny").extractor
    server = Flux2Server(pipe, None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with post(port, {"prompt": "a tiny cat"}) as r:
            stats = json.loads(r.read())
        assert stats["shape"][0] == 1 and stats["dim"] == stats["shape"][-1]
        assert np.isfinite(stats["mean"]) and stats["token_norm_mean"] > 0
        # .npy download round-trips to the same array shape
        with post(port, {"prompt": "a tiny cat", "format": "npy"}) as r:
            assert r.headers["Content-Type"] == "application/octet-stream"
            arr = np.load(_io.BytesIO(r.read()))
        assert list(arr.shape) == stats["shape"] and np.isfinite(arr).all()
        # empty prompt -> 400, server keeps serving
        with pytest.raises(urllib.error.HTTPError) as e:
            post(port, {"prompt": "  "})
        assert e.value.code == 400
        assert server.embeds_served == 2
        # demo page carries the embeddings tab
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert "/embed" in page and 'id="embprompt"' in page
    finally:
        httpd.shutdown()
        server.shutdown()


def test_cancel_all_covers_running_batch():
    """cancel_all must cancel the IN-FLIGHT batch too: _pick_batch removes a
    batch from the queue before running it, so a queue-only sweep would let
    a mid-denoise batch run to completion during graceful drain."""
    import threading
    import time as _time

    from flux2_tpu.serve import Flux2Server, make_handler
    from tests.test_pipeline import tiny_pipeline

    # handler protocol: chunked /chat streaming requires HTTP/1.1 framing
    class _P:  # minimal stand-in so make_handler doesn't build a pipeline
        pass

    assert make_handler(Flux2Server.__new__(Flux2Server)).protocol_version == "HTTP/1.1"

    pipe = tiny_pipeline()
    server = Flux2Server(pipe, embeddings_fn=lambda p: None, max_batch=2)
    try:
        class _FakePending:
            def __init__(self):
                self.cancelled = threading.Event()

        running = [_FakePending(), _FakePending()]
        server._running_batch = running  # as _pick_batch would set mid-run
        n = server.cancel_all()
        assert n >= 2
        assert all(p.cancelled.is_set() for p in running)
    finally:
        server.shutdown()
