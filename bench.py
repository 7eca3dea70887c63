"""Benchmark: FLUX.2 generation on the available device vs BASELINE.md.

Prints ONE final JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "rows": {...}}

AND one incremental ``BENCH_ROW {"name": {...}}`` line per row the moment it
is measured, so a timeout/kill loses only unmeasured sections, never
already-captured rows (round-4 post-mortem: an all-at-the-end print lost an
entire round's numbers to rc=124).

Survivability contract (VERDICT r4 item 1):
  - global wall budget: env ``FLUX2_BENCH_BUDGET_S`` (default 4800 s);
    sections are skipped with honest ``{"skipped": "budget"}`` rows once the
    remaining budget cannot fit them,
  - SIGTERM/SIGINT/SIGALRM dump the consolidated JSON from whatever has been
    collected before exiting (``timeout(1)`` sends SIGTERM first),
  - sections are ordered headline-first: Klein-4B steps + e2e, then W8A8
    e2e, 9B, KV, Dev, Mistral, LoRA, serving,
  - subprocess sections stream rows through a rows-file, so even a child
    killed mid-section contributes the rows it finished.

Headline: Klein-4B 1024x1024 4-step T2I end-to-end wall (denoise + VAE
decode, the reference's 25.3 s quantity on an M2 Ultra —
docs/examples/quantization-benchmark/README.md:37).

Step rows carry MFU: analytic DiT matmul+attention FLOPs per forward
(dit_flops_per_step) / measured s/step / chip peak (v5e: 197 TFLOP/s bf16,
394 TOP/s int8 — the peak matching the row's matmul precision).

All runs are random-init (bench hosts have no checkpoints); step timing
chains each step's output into the next so async dispatch can't hide work.
"""

import json
import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_KLEIN4B_E2E = 25.3  # s, bf16 1024^2 4 steps (BASELINE.md)
REF_KLEIN4B_E2E_Q8 = 27.9  # s, qint8 1024^2 4 steps (BASELINE.md)
REF_KLEIN4B_STEP = 5.5  # s/step bf16
REF_KLEIN4B_STEP_Q8 = 27.9 / 25.3 * 5.5  # ~6.07 s/step qint8
REF_KLEIN4B_STEP_I4 = 30.3 / 25.3 * 5.5  # ~6.59 s/step int4
REF_KLEIN9B_STEP_Q8 = 59.7 / 54.9 * 13.0  # ~14.1 s/step qint8
REF_KLEIN4B_STEP_2048 = 8.0  # s/step, qint8 2048^2 M3 Max (klein9b-baselines.md:19)
REF_DEV32B_STEP = 1758.6 / 28  # ~63 s/step (quantization-benchmark/README.md:39)
REF_LORA_STEP = 18.8  # s/step AdamW 500-step run (lora-training lion-vs-adamw)

# v5e (TPU v5 lite) chip peaks. MFU is quoted against the peak of the row's
# matmul precision: bf16 rows vs 197 TF/s, W8A8/W4A8 rows vs the int8 MXU's
# 394 TOP/s (attention stays bf16 in all rows, so quant-row MFU is a floor).
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


# ---------------------------------------------------------------------------
# Row registry: incremental emission + consolidated dump
# ---------------------------------------------------------------------------

ROWS: dict = {}
_T0 = time.monotonic()
# Default budget: generous. The SIGTERM/SIGALRM dump makes overshooting the
# driver's window safe (rows + the consolidated line still print — timeout(1)
# sends SIGTERM, rc 124, before SIGKILL), whereas undershooting silently
# skips sections that would have fit. Cold TPU compiles dominate the first
# run; with the persistent compile cache working (r5 fix: it was disabled on
# 'axon,cpu' hosts for rounds 1-4) repeat runs finish in a fraction of this.
_BUDGET_S = float(os.environ.get("FLUX2_BENCH_BUDGET_S", "4800"))
_FINAL_DONE = False
_CURRENT_CHILD = None  # Popen of the in-flight section subprocess, if any


def _remaining_s() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def emit_row(name: str, row: dict) -> None:
    """Record + stream one row the moment it's measured (crash-proof)."""
    ROWS[name] = row
    line = "BENCH_ROW " + json.dumps({name: row})
    print(line, flush=True)
    rf = os.environ.get("FLUX2_BENCH_ROWS_FILE")
    if rf:
        try:
            with open(rf, "a") as f:
                f.write(json.dumps({name: row}) + "\n")
        except OSError:
            pass


def _consolidated() -> dict:
    head = ROWS.get("klein4b_e2e_1024_4step") or {}
    return {
        "metric": "klein4b_t2i_e2e_1024px_4steps_bf16",
        "value": head.get("value"),
        "unit": "s",
        "vs_baseline": head.get("vs_baseline"),
        "budget_s": _BUDGET_S,
        "elapsed_s": round(time.monotonic() - _T0, 1),
        "rows": ROWS,
    }


def emit_final() -> None:
    global _FINAL_DONE
    if _FINAL_DONE:
        return
    _FINAL_DONE = True
    print(json.dumps(_consolidated()), flush=True)


def _install_dump_handlers() -> None:
    """Dump the consolidated JSON on SIGTERM/SIGINT/SIGALRM, then exit.

    ``timeout(1)`` (the driver's likely wrapper) sends SIGTERM before
    SIGKILL; the internal SIGALRM fires shortly before our own budget so a
    stalled section can't silently eat the final print."""

    def h(signum, frame):  # pragma: no cover - signal path
        if _CURRENT_CHILD is not None:
            try:
                _CURRENT_CHILD.kill()
            except Exception:
                pass
        emit_row("_interrupted", {"signal": int(signum),
                                  "elapsed_s": round(time.monotonic() - _T0, 1)})
        emit_final()
        os._exit(0)

    for s in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(s, h)
    signal.setitimer(signal.ITIMER_REAL, max(60.0, _BUDGET_S + 60.0))


def _skip(name: str, why: str = "budget") -> None:
    emit_row(name, {"skipped": why, "remaining_budget_s": round(_remaining_s(), 1)})


# One v5e chip has 16 GiB HBM; the axon tunnel backend reports
# memory_stats()["bytes_limit"] == 0, so the feasibility pre-checks below
# gate on this constant (override for bigger chips: FLUX2_BENCH_HBM_GIB).
_HBM_GIB = float(os.environ.get("FLUX2_BENCH_HBM_GIB", "16"))


# ---------------------------------------------------------------------------
# Analytic FLOPs (MFU)
# ---------------------------------------------------------------------------


def dit_flops_per_step(c, s_img: int, s_txt: int = 512) -> float:
    """Matmul + attention FLOPs of ONE DiT forward (2 FLOPs per MAC).

    Double block per stream: QKV (D->3D), out (D->D), SwiGLU FF (D->2M,
    M->D); joint attention 4*S^2*D (QK^T + PV). Single block: fused
    D->(3D+2M) in, (D+M)->D out, attention 4*S^2*D. Plus x/context
    embedders and proj_out. Modulation/timestep MLPs are per-image (not
    per-token) and contribute <0.1% — excluded."""
    D = c.inner_dim
    M = c.mlp_hidden_dim
    S = s_img + s_txt

    def stream(s):
        return 2 * s * D * (3 * D) + 2 * s * D * D + 2 * s * D * (2 * M) + 2 * s * M * D

    dbl = stream(s_img) + stream(s_txt) + 4 * S * S * D
    sgl = 2 * S * D * (3 * D + 2 * M) + 2 * S * (D + M) * D + 4 * S * S * D
    emb = (
        2 * s_img * c.in_channels * D
        + 2 * s_txt * c.joint_attention_dim * D
        + 2 * s_img * D * c.out_channels
    )
    return float(c.num_layers * dbl + c.num_single_layers * sgl + emb)


def _with_mfu(row: dict, config, s_img: int, peak: float, batch: int = 1) -> dict:
    flops = dit_flops_per_step(config, s_img) * batch
    row["mfu"] = round(flops / row["value"] / peak, 4)
    row["flops_per_step"] = flops
    row["peak_flops"] = peak
    return row


# ---------------------------------------------------------------------------
# Measurement helpers
# ---------------------------------------------------------------------------


def _steps_per_sec(config, params, h=1024, w=1024, n=8, batch=1):
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings

    s_txt = 512
    s_img = (h // 16) * (w // 16)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (batch, s_img, 128), jnp.bfloat16)
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (batch, s_txt, config.joint_attention_dim), jnp.bfloat16
    )
    ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))
    t_in = jnp.full((batch,), 0.5, jnp.float32)

    @jax.jit
    def step(params, hidden, txt, t):
        return tfm.forward(params, config, hidden, txt, t, cos, sin)

    step(params, hidden, txt, t_in).block_until_ready()
    t0 = time.perf_counter()
    out = hidden
    for _ in range(n):
        out = step(params, out, txt, t_in)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    # The axon runtime surfaces execution failures LAZILY: a failed program's
    # block_until_ready returns instantly with no error and only a value
    # readback raises (measured r4: an OOM'd row printed 0.0001 s). Every
    # timing must therefore be validated by reading a value back.
    _assert_finite_readback(out)
    return dt


def _assert_finite_readback(x):
    """Force a real device->host readback so lazily-parked execution errors
    (RESOURCE_EXHAUSTED etc.) surface here instead of yielding a bogus-fast
    timing; also rejects NaN."""
    v = float(jnp.sum(x.astype(jnp.float32)))
    if not np.isfinite(v):
        raise RuntimeError(f"non-finite output (sum={v})")


def _median_e2e(gen, n=3):
    """Median of n runs: the tunneled host transfer sporadically stalls
    for seconds (measured in ANY memory state — not HBM pressure), and a
    single-sample row can catch such a spike. Median = steady-state wall."""
    runs = []
    for i in range(n):
        t0 = time.perf_counter()
        r = gen(i)
        runs.append((time.perf_counter() - t0, r))
    runs.sort(key=lambda x: x[0])
    return runs[len(runs) // 2]


def _random_w8a8_params(config):
    """Random W8A8 params built straight from the shape structure — never
    materializes bf16 (Klein-9B bf16 is 17.3 GB, over one v5e's HBM)."""
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.ops.quant import W8A8Tensor

    shapes = jax.eval_shape(
        lambda k: tfm.init_params(k, config, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    counter = [0]

    def visit(sd):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        if sd.ndim >= 2 and sd.size >= (1 << 16):
            *lead, k, n = sd.shape
            q = jax.random.randint(key, sd.shape, -127, 128, jnp.int8)
            scale = jnp.full((*lead, 1, n), 0.02 / 127.0, jnp.float32)
            return W8A8Tensor(q, scale, k)
        return (jax.random.normal(key, sd.shape, jnp.float32) * 0.02).astype(sd.dtype)

    return jax.tree_util.tree_map(visit, shapes)


def _random_w4a8_params(config):
    """Random W4A8 DiT params built straight from shapes: packed uint8 codes
    + per-(K-block, col) scales, never a dense transient (Dev-32B dense bf16
    is 61 GiB — four v5e chips; W4A8 is ~15.5 GiB)."""
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.ops.quant import W4A8_BLOCK, W4A8Tensor

    shapes = jax.eval_shape(
        lambda k: tfm.init_params(k, config, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    counter = [0]

    def visit(sd):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        *lead, k, n = sd.shape if sd.ndim >= 2 else (0, 0)
        if sd.ndim >= 2 and sd.size >= (1 << 16) and k % W4A8_BLOCK == 0:
            q = jax.random.randint(key, (*lead, k // 2, n), 0, 256, jnp.uint8)
            scale = jnp.full((*lead, k // W4A8_BLOCK, n), 0.02 / 7.0, jnp.float32)
            return W4A8Tensor(q, scale, W4A8_BLOCK, k)
        return (jax.random.normal(key, sd.shape, jnp.float32) * 0.02).astype(sd.dtype)

    return jax.tree_util.tree_map(visit, shapes)


def _random_w8a8_decoder(config):
    """Random full-size text-encoder params straight from shapes: matmul
    leaves as W8A8 (halved HBM lets the encoder coexist with the DiT on one
    chip), embeddings/norms dense bf16."""
    from flux2_tpu.models.text_encoders import decoder as dec
    from flux2_tpu.ops.quant import W8A8Tensor, _path_is_matmul

    shapes = jax.eval_shape(
        lambda k: dec.init_params(k, config, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    counter = [0]

    def visit(path, sd):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        if _path_is_matmul(path) and sd.ndim >= 2 and sd.size >= (1 << 16):
            *lead, k, n = sd.shape
            q = jax.random.randint(key, sd.shape, -127, 128, jnp.int8)
            scale = jnp.full((*lead, 1, n), 0.02 / 127.0, jnp.float32)
            return W8A8Tensor(q, scale, k)
        return (jax.random.normal(key, sd.shape, jnp.float32) * 0.02).astype(sd.dtype)

    return jax.tree_util.tree_map_with_path(visit, shapes)


def _random_w4a8_decoder(config):
    """Random text-encoder params with W4A8 matmul leaves (quarter weight
    HBM — the format that lets the full 40-layer Mistral-24B encoder fit
    one v5e chip); embeddings/norms dense bf16."""
    from flux2_tpu.models.text_encoders import decoder as dec
    from flux2_tpu.ops.quant import W4A8_BLOCK, W4A8Tensor, _path_is_matmul

    shapes = jax.eval_shape(
        lambda k: dec.init_params(k, config, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    counter = [0]

    def visit(path, sd):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        if (
            _path_is_matmul(path)
            and sd.ndim >= 2
            and sd.size >= (1 << 16)
            and sd.shape[-2] % W4A8_BLOCK == 0
        ):
            *lead, k, n = sd.shape
            q = jax.random.randint(key, (*lead, k // 2, n), 0, 256, jnp.uint8)
            scale = jnp.full((*lead, k // W4A8_BLOCK, n), 0.02 / 7.0, jnp.float32)
            return W4A8Tensor(q, scale, W4A8_BLOCK, k)
        return (jax.random.normal(key, sd.shape, jnp.float32) * 0.02).astype(sd.dtype)

    return jax.tree_util.tree_map_with_path(visit, shapes)


def _device_watchdog(timeout_s: float = 180.0):
    """Fail LOUDLY (one honest JSON error line) instead of hanging forever
    when the device tunnel is wedged: backend init on a dead axon relay
    blocks indefinitely, which would hang the driver's bench capture. A
    daemon thread probes the first device op; the main thread proceeds only
    once the probe lands."""
    import threading

    done = threading.Event()

    def probe():
        jax.devices()
        jnp.ones((8, 8)).block_until_ready()
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        emit_row("_error", {"error": f"device backend did not initialize within "
                                     f"{timeout_s:.0f}s (axon tunnel unreachable)"})
        emit_final()
        os._exit(2)


def _bench_tokenizer():
    """A REAL fast tokenizer for the encoder-included e2e row (the bench
    host has no downloaded checkpoints): a ByteLevel-BPE trained inline on
    a few sentences, with the Qwen-style chat template — so the measured
    path runs actual tokenize -> template render -> pad, not a hash stub.
    Falls back to a byte-id stub only if `tokenizers` is unavailable."""
    from flux2_tpu.utils.dev_tokenizer import inline_bpe_tokenizer

    return inline_bpe_tokenizer()


def _time_encode(dec, params, cfg, toks, mask, layers, n=4):
    """Median per-call encode wall with a per-call readback (lazy-error-proof)."""
    dec.extract_hidden_layers(params, cfg, toks, mask, layers).block_until_ready()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = dec.extract_hidden_layers(params, cfg, toks, mask, layers)
        _assert_finite_readback(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"value": round(times[len(times) // 2], 4), "unit": "s", "vs_baseline": None}


# ---------------------------------------------------------------------------
# Sections — each emits its rows directly (headline-first ordering in main)
# ---------------------------------------------------------------------------


def _sec_klein4b_steps(cfg, tfm, quant):
    """Klein-4B per-step rows: bf16 / W8A8 / W4A8 (+MFU), then 2048px."""
    s_img_1024 = (1024 // 16) * (1024 // 16)
    params4 = tfm.init_params(jax.random.PRNGKey(0), cfg.KLEIN_4B, dtype=jnp.bfloat16)
    sec = _steps_per_sec(cfg.KLEIN_4B, params4)
    emit_row("klein4b_step_bf16", _with_mfu({
        "value": round(sec, 4), "unit": "s/step",
        "vs_baseline": round(REF_KLEIN4B_STEP / sec, 2),
    }, cfg.KLEIN_4B, s_img_1024, PEAK_BF16))

    params4_q = quant.w8a8_params(params4)
    sec = _steps_per_sec(cfg.KLEIN_4B, params4_q)
    emit_row("klein4b_step_w8a8", _with_mfu({
        "value": round(sec, 4), "unit": "s/step",
        "vs_baseline": round(REF_KLEIN4B_STEP_Q8 / sec, 2),
    }, cfg.KLEIN_4B, s_img_1024, PEAK_INT8))
    del params4_q

    params4_q4 = quant.w4a8_params(params4)
    sec = _steps_per_sec(cfg.KLEIN_4B, params4_q4)
    emit_row("klein4b_step_w4a8", _with_mfu({
        "value": round(sec, 4), "unit": "s/step",
        "vs_baseline": round(REF_KLEIN4B_STEP_I4 / sec, 2),
    }, cfg.KLEIN_4B, s_img_1024, PEAK_INT8))
    del params4_q4

    # 2048px: attention-quadratic regime (ref ~8 s/step qint8 on M3 Max),
    # plus a bs=2 point — amortizing weight reads across the batch is the
    # VERDICT-r4 experiment for the matmul-bound 2048 ceiling.
    s_img_2048 = (2048 // 16) * (2048 // 16)
    try:
        sec = _steps_per_sec(cfg.KLEIN_4B, params4, h=2048, w=2048, n=4)
        emit_row("klein4b_step_2048px", _with_mfu({
            "value": round(sec, 4), "unit": "s/step",
            "vs_baseline": round(REF_KLEIN4B_STEP_2048 / sec, 2),
        }, cfg.KLEIN_4B, s_img_2048, PEAK_BF16))
        sec2 = _steps_per_sec(cfg.KLEIN_4B, params4, h=2048, w=2048, n=4, batch=2)
        emit_row("klein4b_step_2048px_bs2", _with_mfu({
            "value": round(sec2, 4), "unit": "s/step (bs=2)",
            "vs_baseline": round(REF_KLEIN4B_STEP_2048 / (sec2 / 2), 2),
            "per_image_s": round(sec2 / 2, 4),
        }, cfg.KLEIN_4B, s_img_2048, PEAK_BF16, batch=2))
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("klein4b_step_2048px", {"error": str(e)[:120]})
    del params4
    jax.clear_caches()


def _sec_klein4b_e2e(cfg, quant):
    """Klein-4B end-to-end walls: bf16, with-encoder, W8A8 (one pipeline)."""
    from flux2_tpu.models.flux2.config import Flux2Model
    from flux2_tpu.pipeline.pipeline import Flux2Pipeline

    pipe = Flux2Pipeline.from_random(model=Flux2Model.KLEIN_4B)
    emb = jax.random.normal(
        jax.random.PRNGKey(3), (1, 512, cfg.KLEIN_4B.joint_attention_dim), jnp.bfloat16
    )
    pipe.generate(embeddings=emb, height=1024, width=1024, num_steps=4, seed=0)  # warm
    e2e, res = _median_e2e(
        lambda i: pipe.generate(embeddings=emb, height=1024, width=1024, num_steps=4, seed=1 + i)
    )
    emit_row("klein4b_e2e_1024_4step", {
        "value": round(e2e, 3), "unit": "s",
        "vs_baseline": round(REF_KLEIN4B_E2E / e2e, 2),
        "phases": {k: round(v, 3) for k, v in res.phase_timings.items()},
    })

    # --- e2e WITH text encoding (the reference's 25.3 s includes its
    # encoder work): full-size Qwen3-4B decoder, random W8A8 weights, real
    # facade extractor path (chat template -> 36-layer forward -> concat
    # hidden layers [9,18,27] -> LEFT-pad 512), encoder + DiT co-resident.
    # A FRESH prompt per run (seed suffix) so the row measures the real
    # encode, not the pipeline's prompt-embedding cache; the cached-repeat
    # cost is reported separately. ---
    try:
        from flux2_tpu.models.text_encoders import config as tenc_cfg
        from flux2_tpu.models.text_encoders import extractor as tenc_ext

        eparams = _random_w8a8_decoder(tenc_cfg.QWEN3_4B)
        pipe.text_encoder = tenc_ext.qwen3_extractor(
            eparams, tenc_cfg.QWEN3_4B, _bench_tokenizer()
        )
        pipe.generate(prompt="warm", height=1024, width=1024, num_steps=4, seed=0)
        e2e_enc, res_e = _median_e2e(
            lambda i: pipe.generate(
                prompt=f"a serene mountain lake at dawn, ultra detailed {i}",
                height=1024, width=1024, num_steps=4, seed=1 + i,
            )
        )
        # cached repeat: same prompt as the last run -> embedding cache hit
        t0 = time.perf_counter()
        res_c = pipe.generate(
            prompt="a serene mountain lake at dawn, ultra detailed 2",
            height=1024, width=1024, num_steps=4, seed=9,
        )
        cached_enc_s = res_c.phase_timings.get("text_encoding", 0.0)
        emit_row("klein4b_e2e_with_encoder", {
            "value": round(e2e_enc, 3), "unit": "s",
            "vs_baseline": round(REF_KLEIN4B_E2E / e2e_enc, 2),
            "phases": {k: round(v, 3) for k, v in res_e.phase_timings.items()},
            "cached_repeat_text_encoding_s": round(cached_enc_s, 4),
            "cached_repeat_e2e_s": round(time.perf_counter() - t0, 3),
        })
        del eparams
        pipe.text_encoder = None
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("klein4b_e2e_with_encoder", {"error": str(e)[:120]})

    # --- e2e at W8A8 (the speed configuration on TPU: int8-MXU matmuls
    # measured FASTER than bf16 at bs=1, where the reference's qint8 e2e is
    # SLOWER than its bf16 — 27.9 vs 25.3 s). Runs LAST on this pipeline:
    # quantizing replaces the bf16 params in place. ---
    try:
        pipe.transformer_params = quant.w8a8_params(pipe.transformer_params)
        pipe.generate(embeddings=emb, height=1024, width=1024, num_steps=4, seed=0)
        e2e_q, res_q = _median_e2e(
            lambda i: pipe.generate(embeddings=emb, height=1024, width=1024, num_steps=4, seed=1 + i)
        )
        emit_row("klein4b_e2e_1024_4step_w8a8", {
            "value": round(e2e_q, 3), "unit": "s",
            "vs_baseline": round(REF_KLEIN4B_E2E_Q8 / e2e_q, 2),
            "phases": {k: round(v, 3) for k, v in res_q.phase_timings.items()},
        })
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("klein4b_e2e_1024_4step_w8a8", {"error": str(e)[:120]})
    del pipe
    jax.clear_caches()


def _sec_klein9b_step(cfg):
    """Klein-9B W8A8 per-step (bf16 would not fit one v5e chip)."""
    try:
        params9 = _random_w8a8_params(cfg.KLEIN_9B)
        sec = _steps_per_sec(cfg.KLEIN_9B, params9, n=4)
        emit_row("klein9b_step_w8a8", _with_mfu({
            "value": round(sec, 4), "unit": "s/step",
            "vs_baseline": round(REF_KLEIN9B_STEP_Q8 / sec, 2),
        }, cfg.KLEIN_9B, (1024 // 16) * (1024 // 16), PEAK_INT8))
        del params9
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("klein9b_step_w8a8", {"error": str(e)[:120]})
    jax.clear_caches()


def _bench_dev32b_full(cfg, tfm):
    """Dev-32B W4A8 per-step, full depth. W4A8 weights are ~15.5 GiB —
    right at one v5e's 16 GiB HBM, so this may honestly OOM; the slice
    sections (separate processes) then carry the measurement."""
    try:
        params_dev = _random_w4a8_params(cfg.FLUX2_DEV)
        sec_dev = _steps_per_sec(cfg.FLUX2_DEV, params_dev, n=2)
        emit_row("dev32b_step_w4a8", _with_mfu({
            "value": round(sec_dev, 4), "unit": "s/step",
            "vs_baseline": round(REF_DEV32B_STEP / sec_dev, 2),
        }, cfg.FLUX2_DEV, (1024 // 16) * (1024 // 16), PEAK_INT8))
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("dev32b_step_w4a8", {"error": str(e)[:120]})


def _bench_dev32b_slice(cfg, tfm):
    """Quarter-depth Dev slice (2/8 double + 12/48 single at full 6144
    width / 48 heads / 15360 joint dim): MEASURED per-step at Dev shapes,
    full-depth step extrapolated as 4x the sliced per-layer cost."""
    try:
        import dataclasses as _dc

        dev_slice = _dc.replace(cfg.FLUX2_DEV, num_layers=2, num_single_layers=12)
        params_ds = _random_w4a8_params(dev_slice)
        sec_ds = _steps_per_sec(dev_slice, params_ds, n=2)
        sec_full = sec_ds * 4  # block cost dominates; embedders amortize
        emit_row("dev32b_step_w4a8_quarter_depth", {
            "value": round(sec_ds, 4), "unit": "s/step", "vs_baseline": None,
            "note": "2/8 double + 12/48 single blocks at full Dev width (measured)",
            "extrapolated_full_depth_s": round(sec_full, 4),
            "extrapolated_vs_baseline": round(REF_DEV32B_STEP / sec_full, 2),
        })
    except Exception as e2:  # pragma: no cover
        emit_row("dev32b_step_w4a8_quarter_depth", {"error": str(e2)[:120]})


def _bench_dev32b_half(cfg, tfm):
    """Half-depth Dev slice (4/8 double + 24/48 single at full width):
    a second point on the depth axis to validate that the quarter-depth
    x4 extrapolation is linear (embedder/epilogue cost amortizes)."""
    try:
        import dataclasses as _dc

        dev_half = _dc.replace(cfg.FLUX2_DEV, num_layers=4, num_single_layers=24)
        params_dh = _random_w4a8_params(dev_half)
        sec_dh = _steps_per_sec(dev_half, params_dh, n=2)
        emit_row("dev32b_step_w4a8_half_depth", {
            "value": round(sec_dh, 4), "unit": "s/step", "vs_baseline": None,
            "note": "4/8 double + 24/48 single blocks at full Dev width (measured)",
            "extrapolated_full_depth_s": round(sec_dh * 2, 4),
            "extrapolated_vs_baseline": round(REF_DEV32B_STEP / (sec_dh * 2), 2),
        })
    except Exception as e3:  # pragma: no cover
        emit_row("dev32b_step_w4a8_half_depth", {"error": str(e3)[:120]})


def _bench_mistral24b_encode():
    """Mistral-24B-shape conditioning encoder (Dev's encoder: 40 x 5120,
    MistralModel.swift:13): jitted hidden-state extraction over LEFT-pad 512
    tokens, W8A8 runtime. The reference has no encoder-only row (its Dev e2e
    folds it in), so vs_baseline is null — this pins the other half of the
    Dev e2e sum."""
    try:
        from flux2_tpu.models.text_encoders import config as tenc_cfg
        from flux2_tpu.models.text_encoders import decoder as dec

        mparams = _random_w8a8_decoder(tenc_cfg.MISTRAL_SMALL_3_2)
        # the conditioning extract never touches the vocabulary head; on a
        # 16 GiB chip the untied 131k x 5120 lm_head is 1.3 GiB of dead HBM
        mparams.pop("lm_head", None)
        toks = jnp.ones((1, 512), jnp.int32)
        mask = jnp.ones((1, 512), jnp.int32)
        emit_row("mistral24b_encode_512tok_w8a8", _time_encode(
            dec, mparams, tenc_cfg.MISTRAL_SMALL_3_2, toks, mask, (10, 20, 30)
        ))
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("mistral24b_encode_512tok_w8a8", {"error": str(e)[:120]})


def _bench_mistral24b_encode_w4a8():
    """FULL-depth Mistral-24B encode, W4A8 runtime (~6 GiB weights — the
    quarter-HBM format is what fits all 40 layers on one v5e chip; W8A8's
    11.4 GiB + XLA workspace does not). Measured full depth — no
    extrapolation. This is also the production Dev-on-one-chip encoder
    configuration (the DiT coexists in the remaining HBM)."""
    try:
        from flux2_tpu.models.text_encoders import config as tenc_cfg
        from flux2_tpu.models.text_encoders import decoder as dec

        mparams = _random_w4a8_decoder(tenc_cfg.MISTRAL_SMALL_3_2)
        mparams.pop("lm_head", None)
        toks = jnp.ones((1, 512), jnp.int32)
        mask = jnp.ones((1, 512), jnp.int32)
        row = _time_encode(dec, mparams, tenc_cfg.MISTRAL_SMALL_3_2, toks, mask, (10, 20, 30))
        row["note"] = "full 40 layers, W4A8 (measured, no extrapolation)"
        emit_row("mistral24b_encode_512tok_w4a8", row)
    except Exception as e:  # pragma: no cover
        emit_row("mistral24b_encode_512tok_w4a8", {"error": str(e)[:120]})


def _bench_mistral24b_encode_w8a8_slice(depth: int):
    """Deepest-fitting W8A8 Mistral-24B slice at `depth` layers: the full
    40-layer W8A8 (11.4 GiB weights) plus XLA workspace misses one v5e's
    HBM, so the parent walks depths downward — each attempt in a FRESH
    process (an OOM poisons the allocator) — and keeps the first fit,
    extrapolating linearly over layers."""
    try:
        import dataclasses as _dc

        from flux2_tpu.models.text_encoders import config as tenc_cfg
        from flux2_tpu.models.text_encoders import decoder as dec

        cfgd = _dc.replace(tenc_cfg.MISTRAL_SMALL_3_2, num_hidden_layers=depth)
        mpd = _random_w8a8_decoder(cfgd)
        mpd.pop("lm_head", None)
        toks = jnp.ones((1, 512), jnp.int32)
        mask = jnp.ones((1, 512), jnp.int32)
        row = _time_encode(dec, mpd, cfgd, toks, mask, (10, 20, 30))
        row["note"] = f"{depth}/40 layers (deepest single-chip W8A8 fit); extrapolated x40/{depth}"
        row["extrapolated_full_depth_s"] = round(row["value"] * 40 / depth, 4)
        emit_row(f"mistral24b_encode_512tok_w8a8_{depth}L", row)
    except Exception as e2:  # pragma: no cover
        emit_row(f"mistral24b_encode_512tok_w8a8_{depth}L", {"error": str(e2)[:120]})


def _bench_klein9b_kv(cfg, tfm):
    """klein-9b-kv: cached vs standard multi-reference I2I per-step
    (reference documents ~2.66x, Flux2Pipeline.swift:1559). 1024^2 output +
    1024^2 reference: standard re-runs all [txt; ref; img] tokens every
    step; cached runs [txt; img] queries against cached post-RoPE ref K/V."""
    try:
        from flux2_tpu.ops import latents as lu
        from flux2_tpu.ops.rope import rope_embeddings

        params9kv = _random_w8a8_params(cfg.KLEIN_9B)
        h = w = 1024
        s_img, s_txt = (h // 16) * (w // 16), 512
        hidden = jax.random.normal(jax.random.PRNGKey(1), (1, s_img, 128), jnp.bfloat16)
        ref_lat = jax.random.normal(jax.random.PRNGKey(2), (1, s_img, 128), jnp.bfloat16)
        txt = jax.random.normal(
            jax.random.PRNGKey(3), (1, s_txt, cfg.KLEIN_9B.joint_attention_dim), jnp.bfloat16
        )
        t_in = jnp.array([0.5], jnp.float32)
        ids_full = np.concatenate(
            [lu.text_position_ids(s_txt),
             lu.reference_image_position_ids([h // 16], [w // 16]),
             lu.image_position_ids(h, w)], axis=0)
        cos_f, sin_f = rope_embeddings(jnp.asarray(ids_full))
        ids_qo = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
        cos_q, sin_q = rope_embeddings(jnp.asarray(ids_qo))

        @jax.jit
        def std_step(p, hid, ref, t):
            full = jnp.concatenate([ref, hid], axis=1)
            out = tfm.forward(p, cfg.KLEIN_9B, full, txt, t, cos_f, sin_f)
            return out[:, ref.shape[1]:]

        @jax.jit
        def extract(p, hid, ref, t):
            return tfm.forward_kv_extract(p, cfg.KLEIN_9B, hid, ref, txt, t, cos_f, sin_f)

        @jax.jit
        def cached_step(p, hid, t, dkv, skv):
            return tfm.forward_kv_cached(p, cfg.KLEIN_9B, hid, txt, t, cos_q, sin_q, dkv, skv)

        std_step(params9kv, hidden, ref_lat, t_in).block_until_ready()
        t0 = time.perf_counter()
        out_s = hidden
        for _ in range(3):
            out_s = std_step(params9kv, out_s, ref_lat, t_in)
        out_s.block_until_ready()
        sec_std = (time.perf_counter() - t0) / 3
        _assert_finite_readback(out_s)

        _, dkv, skv = extract(params9kv, hidden, ref_lat, t_in)
        jax.block_until_ready(dkv)
        cached_step(params9kv, hidden, t_in, dkv, skv).block_until_ready()
        t0 = time.perf_counter()
        out_c = hidden
        for _ in range(3):
            out_c = cached_step(params9kv, out_c, t_in, dkv, skv)
        out_c.block_until_ready()
        sec_cached = (time.perf_counter() - t0) / 3
        _assert_finite_readback(out_c)

        emit_row("klein9bkv_i2i_step_cached_vs_std", {
            "value": round(sec_cached, 4),
            "unit": "s/step",
            "std_step_s": round(sec_std, 4),
            "speedup": round(sec_std / sec_cached, 2),
            "vs_baseline": round((sec_std / sec_cached) / 2.66, 2),
        })
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("klein9bkv_i2i_step_cached_vs_std", {"error": str(e)[:120]})


def _bench_lora_train(cfg, tfm):
    """Klein-4B LoRA train step (rank 32, 512px, bs=1, remat). Reference:
    lion-vs-adamw AdamW run = 2h36m45s / 500 = 18.8 s/step
    (docs/examples/lora-training lion-vs-adamw). The unmerged-LoRA step
    compiles in minutes (base params are operands, not HLO constants)."""
    try:
        from flux2_tpu.ops import latents as lu
        from flux2_tpu.ops.rope import rope_embeddings
        from flux2_tpu.training import trainer

        base4 = tfm.init_params(jax.random.PRNGKey(0), cfg.KLEIN_4B, dtype=jnp.bfloat16)
        tc = trainer.TrainConfig(
            rank=32, alpha=32.0, optimizer="adamw", timestep_sampling="balanced",
            loss_weighting="bell", remat=True,
        )
        state, opt = trainer.init_train_state(jax.random.PRNGKey(1), base4, tc)
        step_fn = trainer.make_train_step(base4, cfg.KLEIN_4B, tc, opt)
        h = w = 512
        s_img, s_txt = (h // 16) * (w // 16), 512
        ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
        cos, sin = rope_embeddings(jnp.asarray(ids))
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (1, s_img, 128)),
            "embeddings": jax.random.normal(
                jax.random.PRNGKey(3), (1, s_txt, cfg.KLEIN_4B.joint_attention_dim)
            ),
            "rope_cos": cos, "rope_sin": sin,
        }
        key = jax.random.PRNGKey(5)
        lora, ost, m = step_fn(state.lora, state.opt_state, batch, key)
        float(m["loss"])  # compile + first step, readback-verified
        times = []
        for _ in range(5):
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            lora, ost, m = step_fn(lora, ost, batch, k)
            loss = float(m["loss"])  # per-step readback: real completion,
            # lazy-error-proof, and median kills tunnel-stall outliers
            times.append(time.perf_counter() - t0)
        times.sort()
        sec_train = times[len(times) // 2]
        emit_row("klein4b_lora_train_step_512px", {
            "value": round(sec_train, 4),
            "unit": "s/step",
            "vs_baseline": round(REF_LORA_STEP / sec_train, 2),
            "last_loss": round(loss, 4),
        })
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("klein4b_lora_train_step_512px", {"error": str(e)[:120]})


def _bench_serve_batched(cfg, quant):
    """Serving throughput under the micro-batcher's MXU-fill policy
    (flux2_tpu/serve.py): batching pays only while the bs=1 step
    UNDER-FILLS the MXU. Measured per-image: every batched point at 512px
    and above LOSES (bs=1 already ~78% MFU at 1024px); 256px batches to a
    bs=8 optimum (1.44-1.48x throughput). So the policy runs >=512px at
    bs=1 and 256px at bs=8. The 1024px row records the measured bs=4
    regression that motivates the cap; the 256px row records the batching
    win. The reference is strictly bs=1 at any size
    (MemoryManager.swift:169-180)."""
    try:
        from flux2_tpu.models.flux2.config import Flux2Model
        from flux2_tpu.pipeline.pipeline import Flux2Pipeline

        pipe = Flux2Pipeline.from_random(model=Flux2Model.KLEIN_4B)
        pipe.transformer_params = quant.w8a8_params(pipe.transformer_params)
        D = cfg.KLEIN_4B.joint_attention_dim

        def run(bs, px, seed0=3):
            emb = jax.random.normal(jax.random.PRNGKey(seed0), (bs, 512, D), jnp.bfloat16)
            pipe.generate(embeddings=emb, height=px, width=px, num_steps=4, seed=0)
            e2e, _ = _median_e2e(
                lambda i: pipe.generate(embeddings=emb, height=px, width=px,
                                        num_steps=4, seed=1 + i))
            return e2e

        e2e1 = run(1, 1024)
        e2e4 = run(4, 1024)
        emit_row("serve_batched_generate_1024_w8a8", {
            "value": round(60.0 / e2e1, 2),
            "unit": "images/min (policy bs=1)",
            "bs1_s": round(e2e1, 3),
            "bs4_s": round(e2e4, 3),
            "bs4_images_per_min": round(4 * 60.0 / e2e4, 2),
            "note": "MXU-fill policy serves 1024px at bs=1: bs=4 measured "
                    "slower per image (step already ~78% MFU at bs=1)",
            "vs_baseline": round((60.0 / e2e1) / (60.0 / REF_KLEIN4B_E2E_Q8), 2),
        })
        s1 = run(1, 256)
        s8 = run(8, 256)
        emit_row("serve_batched_generate_256_w8a8", {
            "value": round(8 * 60.0 / s8, 2),
            "unit": "images/min (policy bs=8)",
            "bs1_s": round(s1, 3),
            "bs8_s": round(s8, 3),
            "bs1_images_per_min": round(60.0 / s1, 2),
            "batch_speedup": round(8 * s1 / s8, 2),
            "vs_baseline": None,
        })
    except Exception as e:  # pragma: no cover - HBM-dependent
        emit_row("serve_batched_generate_1024_w8a8", {"error": str(e)[:120]})


REF_CAT_TOY_DATA = "/root/reference/examples/cat-toy/train"


def _bench_lora_realdata(cfg, tfm):
    """Klein-4B LoRA training on the reference's REAL cat-toy dataset
    (7 JPEGs + caption .txt + trigger word): the full real-data seam —
    image decode -> bucketing -> VAE encode -> caption encode (chat
    template through a real BPE) -> train steps. Random-init weights (no
    checkpoints on bench hosts); measures data-prep wall and s/step."""
    if not os.path.isdir(REF_CAT_TOY_DATA):
        emit_row("klein4b_lora_e2e_realdata", {
            "skipped": f"reference dataset not present at {REF_CAT_TOY_DATA}"})
        return
    try:
        from flux2_tpu.cli.train import YAMLTrainingConfig, _prepare_real_data
        from flux2_tpu.models.flux2.config import Flux2Model
        from flux2_tpu.models.text_encoders import config as tenc_cfg
        from flux2_tpu.models.text_encoders import extractor as tenc_ext
        from flux2_tpu.pipeline.pipeline import Flux2Pipeline
        from flux2_tpu.training import trainer

        import tempfile

        tmp = tempfile.mkdtemp(prefix="bench_realdata_")
        repo = os.path.dirname(os.path.abspath(__file__))
        ycfg = YAMLTrainingConfig.from_yaml(
            os.path.join(repo, "examples/cat-toy/cat_toy_klein4b.yaml"))
        ycfg = ycfg.override(output_dir=tmp, max_steps=10)
        import dataclasses as _dc

        ycfg = _dc.replace(
            ycfg, dataset_dir=REF_CAT_TOY_DATA, bucket_resolutions=[512],
            dop_weight=0.0, cache_latents=False, cache_text_embeddings=False,
        )
        pipe = Flux2Pipeline.from_random(model=Flux2Model.KLEIN_4B)
        eparams = _random_w8a8_decoder(tenc_cfg.QWEN3_4B)
        pipe.text_encoder = tenc_ext.qwen3_extractor(
            eparams, tenc_cfg.QWEN3_4B, _bench_tokenizer()
        )
        t_prep0 = time.perf_counter()
        sample_batch, items = _prepare_real_data(pipe, ycfg, cfg.KLEIN_4B)
        prep_s = time.perf_counter() - t_prep0

        tc = trainer.TrainConfig(
            rank=32, alpha=32.0, optimizer="adamw", timestep_sampling="balanced",
            loss_weighting="bell", remat=True,
        )
        base4 = pipe.transformer_params
        state, opt = trainer.init_train_state(jax.random.PRNGKey(1), base4, tc)
        step_fn = trainer.make_train_step(base4, cfg.KLEIN_4B, tc, opt)
        rng = np.random.RandomState(0)
        key = jax.random.PRNGKey(5)
        batch = sample_batch(rng, 1)
        lora, ost, m = step_fn(state.lora, state.opt_state, batch, key)
        float(m["loss"])  # compile + step 1
        times = []
        for _ in range(5):
            key, k = jax.random.split(key)
            batch = sample_batch(rng, 1)
            t0 = time.perf_counter()
            lora, ost, m = step_fn(lora, ost, batch, k)
            loss = float(m["loss"])
            times.append(time.perf_counter() - t0)
        times.sort()
        emit_row("klein4b_lora_e2e_realdata", {
            "value": round(times[len(times) // 2], 4),
            "unit": "s/step",
            "vs_baseline": round(REF_LORA_STEP / times[len(times) // 2], 2),
            "data_prep_s": round(prep_s, 2),
            "n_items": len(items),
            "last_loss": round(loss, 4),
            "note": "real cat-toy JPEGs+captions through decode/bucket/VAE/encoder",
        })
    except Exception as e:  # pragma: no cover - env-dependent
        emit_row("klein4b_lora_e2e_realdata", {"error": str(e)[:160]})


# ---------------------------------------------------------------------------
# Section protocol: in-process child entry + budgeted subprocess runner
# ---------------------------------------------------------------------------


def _run_section(name):
    """Child-process entry: run ONE section, streaming rows to the rows-file
    (and stdout); finally print the BENCH_SECTION consolidated line."""
    from flux2_tpu.cli.main import _enable_compile_cache

    _device_watchdog()
    _enable_compile_cache()
    from flux2_tpu.models.flux2 import config as cfg
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.ops import quant

    if name == "mistral24b_encode":
        _bench_mistral24b_encode()
    elif name == "mistral24b_encode_w4a8":
        _bench_mistral24b_encode_w4a8()
    elif name.startswith("mistral24b_encode_w8a8_slice_"):
        _bench_mistral24b_encode_w8a8_slice(int(name.rsplit("_", 1)[1]))
    elif name == "klein9b_kv":
        _bench_klein9b_kv(cfg, tfm)
    elif name == "lora_train":
        _bench_lora_train(cfg, tfm)
    elif name == "lora_realdata":
        _bench_lora_realdata(cfg, tfm)
    elif name == "serve_batched":
        _bench_serve_batched(cfg, quant)
    elif name == "dev32b_full":
        _bench_dev32b_full(cfg, tfm)
    elif name == "dev32b_slice":
        _bench_dev32b_slice(cfg, tfm)
    elif name == "dev32b_half":
        _bench_dev32b_half(cfg, tfm)
    else:
        raise SystemExit(f"unknown bench section {name}")
    print("BENCH_SECTION " + json.dumps(ROWS), flush=True)


def _run_isolated(name, cap_s=420.0, min_s=90.0):
    """Run one section in a fresh process (clean HBM) within the budget.

    The child streams each row to a temp rows-file as it's measured, so a
    timeout salvages partial rows; the deadline is min(cap, remaining
    budget). Skips honestly when the remaining budget is under ``min_s``."""
    import subprocess
    import sys
    import tempfile

    global _CURRENT_CHILD
    left = _remaining_s()
    if left < min_s:
        _skip(name)
        return
    timeout_s = min(cap_s, left - 20.0)
    rf = tempfile.NamedTemporaryFile(
        mode="w", suffix=".rows.jsonl", prefix=f"bench_{name}_", delete=False
    )
    rf.close()
    env = dict(os.environ, FLUX2_BENCH_ROWS_FILE=rf.name)
    got = {}
    try:
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        _CURRENT_CHILD = p
        try:
            stdout, stderr = p.communicate(timeout=timeout_s)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, stderr = p.communicate()
            rc = "timeout"
        finally:
            _CURRENT_CHILD = None
        try:
            with open(rf.name) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        got.update(json.loads(line))
        except OSError:
            pass
        for rname, row in got.items():
            emit_row(rname, row)
        if not got:
            tail = ((stdout or "") + (stderr or ""))[-160:].replace("\n", " ")
            emit_row(name, {"error": f"section produced no rows (rc={rc}): {tail}"})
    finally:
        try:
            os.unlink(rf.name)
        except OSError:
            pass


def _budgeted(name, fn, est_s):
    """Run an in-process section if the budget can plausibly fit it."""
    if _remaining_s() < est_s:
        _skip(name)
        return False
    try:
        fn()
    except Exception as e:
        emit_row(name, {"error": str(e)[:160]})
    return True


def main():
    import atexit

    from flux2_tpu.cli.main import _enable_compile_cache

    _install_dump_handlers()
    atexit.register(emit_final)
    _device_watchdog()
    from flux2_tpu.models.flux2 import config as cfg
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.ops import quant

    _enable_compile_cache()  # repeat runs skip the ~10 min of compiles

    # Headline-first: every section after the first is optional under the
    # budget; rows stream out as they land. Estimates are cold-compile
    # worst cases; warm (compile-cache) runs finish far earlier.
    _budgeted("klein4b_steps", lambda: _sec_klein4b_steps(cfg, tfm, quant), est_s=60)
    _budgeted("klein4b_e2e", lambda: _sec_klein4b_e2e(cfg, quant), est_s=60)
    _budgeted("klein9b_step_w8a8", lambda: _sec_klein9b_step(cfg), est_s=60)

    # Subprocess sections (fresh HBM each; OOM cannot poison the parent),
    # in VERDICT-r4 priority order: KV, Dev, Mistral, LoRA, serving. Caps
    # are COLD-compile worst cases (9B KV compiles three multi-kiloToken
    # programs); warm-cache runs come in far under them, and the budget
    # check skips what no longer fits.
    def _missing(row_key):
        # fallback triggers on an in-section failure (row carries "error"),
        # an honest feasibility/budget skip ("skipped"), AND on a section
        # timeout/kill (row never emitted at all)
        r = ROWS.get(row_key)
        return r is None or "error" in r or "skipped" in r

    _run_isolated("klein9b_kv", cap_s=900)
    # Feasibility pre-check: Dev-32B full-depth W4A8 weights are ~15.5 GiB;
    # with the int8-matmul workspace it needs >16 GiB HBM (measured
    # RESOURCE_EXHAUSTED on the 16 GiB v5e, r5; a blind attempt burns its
    # whole cap compiling first). Attempt only on bigger chips.
    if _HBM_GIB > 17.0:
        _run_isolated("dev32b_full", cap_s=900)
    else:
        emit_row("dev32b_step_w4a8", {
            "skipped": f"infeasible on {_HBM_GIB:g} GiB chip: W4A8 weights "
                       "~15.5 GiB + int8 workspace (measured OOM r5); "
                       "depth slices below carry the measurement"})
    if _missing("dev32b_step_w4a8"):
        # full depth missed HBM: measure the quarter-depth slice in ANOTHER
        # fresh process (the OOM poisoned the previous one), plus a
        # half-depth point to validate the linear-in-depth extrapolation
        _run_isolated("dev32b_slice", cap_s=900)
        _run_isolated("dev32b_half", cap_s=900)
    # W4A8 first: full 40 layers fit one chip (measured, no extrapolation)
    _run_isolated("mistral24b_encode_w4a8", cap_s=900)
    # W8A8: full depth (11.4 GiB weights) and the 32L/28L slices all
    # measured RESOURCE_EXHAUSTED on 16 GiB (r5 run3) — the int8 runtime's
    # activation-quant workspace on top of weights misses HBM above 24
    # layers. Go straight to the deepest measured fit on small chips.
    if _HBM_GIB > 16.5:
        _run_isolated("mistral24b_encode", cap_s=600)
    else:
        emit_row("mistral24b_encode_512tok_w8a8", {
            "skipped": f"infeasible on {_HBM_GIB:g} GiB chip "
                       "(measured OOM r5); 24L slice below carries the "
                       "same-format point"})
    if _missing("mistral24b_encode_512tok_w8a8"):
        # W8A8 full depth missed HBM: a descending-depth bisect keeps a
        # same-format point; each attempt gets a FRESH process.
        for depth in (32, 28, 24):
            if depth > 24 and _HBM_GIB <= 16.5:
                continue  # measured OOM at 32L/28L on 16 GiB (r5 run3)
            _run_isolated(f"mistral24b_encode_w8a8_slice_{depth}", cap_s=700)
            if not _missing(f"mistral24b_encode_512tok_w8a8_{depth}L"):
                break
    _run_isolated("lora_train", cap_s=900)
    _run_isolated("lora_realdata", cap_s=900)
    _run_isolated("serve_batched", cap_s=900)

    emit_final()


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) >= 3 and _sys.argv[1] == "--section":
        _run_section(_sys.argv[2])
    else:
        main()
