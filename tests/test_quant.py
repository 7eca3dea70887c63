"""Quantization tests: round-trip accuracy, packing, formats, model quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.ops import quant


def _w(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape) * 0.05


def test_qint8_roundtrip_error():
    w = _w((256, 128))
    qw = quant.quantize(w, "qint8")
    deq = quant.dequantize(qw, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    # 8-bit affine on a group of 64: quantization step ~range/255
    assert err.max() < 0.05 * 4 / 255 * 2
    assert qw.q.dtype == jnp.uint8
    assert qw.scale.shape == (256 // 64, 128)


def test_int4_pack_unpack():
    w = _w((128, 128), seed=1)
    qw = quant.quantize(w, "int4")
    assert qw.q.shape == (64, 128)  # packed 2 per byte
    deq = quant.dequantize(qw, jnp.float32)
    assert deq.shape == (128, 128)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert err.max() < 0.05 * 4 / 15 * 1.1


def test_nibble_packing_exact():
    q = jnp.arange(16, dtype=jnp.uint8).reshape(8, 2) % 16
    packed = quant._pack_nibbles(q)
    unpacked = quant._unpack_nibbles(packed, 8)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(q))


def test_mxfp8_roundtrip():
    w = _w((64, 128), seed=2)
    qw = quant.quantize(w, "mxfp8")
    assert qw.q.dtype == jnp.float8_e4m3fn
    assert qw.bias is None
    deq = quant.dequantize(qw, jnp.float32)
    rel = np.abs(np.asarray(deq) - np.asarray(w)) / (np.abs(np.asarray(w)) + 1e-4)
    assert np.median(rel) < 0.05
    # scales are powers of two
    log2s = np.log2(np.asarray(qw.scale))
    np.testing.assert_allclose(log2s, np.round(log2s), atol=1e-6)


def test_mxfp4_and_nvfp4():
    w = _w((64, 128), seed=3)
    for fmt, gs in (("mxfp4", 32), ("nvfp4", 16)):
        qw = quant.quantize(w, fmt)
        assert qw.group_size == gs
        assert qw.q.shape == (32, 128)  # packed
        deq = quant.dequantize(qw, jnp.float32)
        rel = np.abs(np.asarray(deq) - np.asarray(w)) / (np.abs(np.asarray(w)) + 1e-3)
        assert np.median(rel) < 0.35  # 4-bit float is coarse


def test_q_matmul_matches_dense():
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 256))
    w = _w((256, 128), seed=5)
    qw = quant.quantize(w, "qint8")
    ref = x @ np.asarray(quant.dequantize(qw, jnp.float32))
    out = quant.q_matmul(x, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_stacked_3d_quantization():
    w = _w((4, 128, 128), seed=6)  # stacked per-layer
    qw = quant.quantize(w, "qint8")
    assert qw.q.shape == (4, 128, 128)
    assert qw.scale.shape == (4, 2, 128)
    deq = quant.dequantize(qw, jnp.float32)
    assert deq.shape == (4, 128, 128)


def test_qtensor_is_pytree():
    qw = quant.quantize(_w((128, 128)), "qint8")
    leaves = jax.tree_util.tree_leaves(qw)
    assert len(leaves) == 3  # q, scale, bias
    # survives jit boundaries
    f = jax.jit(lambda q, x: quant.q_matmul(x, q))
    out = f(qw, jnp.ones((2, 128)))
    assert out.shape == (2, 128)


@pytest.mark.slow
def test_quantized_transformer_forward():
    """The full DiT forward runs with quantized weights and stays close to bf16."""
    config = cfg.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    qparams = quant.quantize_params(params, "qint8", min_size=1024)

    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings

    ids = np.concatenate([lu.text_position_ids(4), lu.image_position_ids(64, 64)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 128))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 96))
    t = jnp.array([0.5])

    ref = tfm.forward(params, config, hidden, txt, t, cos, sin)
    out = tfm.forward(qparams, config, hidden, txt, t, cos, sin)
    assert out.shape == ref.shape
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert rel < 0.05, rel  # qint8 is near-lossless

    # memory actually shrinks
    assert quant.param_bytes(qparams) < 0.45 * quant.param_bytes(params)


@pytest.mark.slow
def test_quantize_params_skips_norms():
    config = cfg.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    qparams = quant.quantize_params(params, "int4", min_size=1024)
    assert not quant.is_quantized(qparams["double_blocks"]["norm_q"])
    assert quant.is_quantized(qparams["double_blocks"]["to_q"])


def test_dequantize_params_roundtrip():
    config = cfg.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    qparams = quant.quantize_params(params, "qint8", min_size=1024)
    dense = quant.dequantize_params(qparams, dtype=jnp.float32)
    # every leaf is dense again, close to the original
    assert not any(quant.is_quantized(l) for l in jax.tree_util.tree_leaves(dense))
    rel = np.abs(
        np.asarray(dense["double_blocks"]["to_q"]) - np.asarray(params["double_blocks"]["to_q"])
    ).max()
    assert rel < 0.01


# ---------------------------------------------------------------------------
# W8A8 (int8 activations x int8 weights on the MXU)
# ---------------------------------------------------------------------------


def test_w8a8_roundtrip_and_matmul():
    w = _w((512, 256), seed=4)
    wq = quant.to_w8a8(w)
    assert wq.q.dtype == jnp.int8
    assert wq.scale.shape == (1, 256)  # one 512-block
    deq = quant.dequantize_w8a8(wq, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert err.max() < np.abs(np.asarray(w)).max() / 127 * 1.01

    x = _w((8, 512), seed=5)
    ref = np.asarray(x @ w)
    got = np.asarray(quant.q_matmul(x, wq), np.float32)  # CPU: dequant fallback
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02


def test_w8a8_pallas_kernel_interpret():
    from flux2_tpu.ops import quant_kernels as qk

    w = _w((1024, 256), seed=6)
    x = _w((24, 1024), seed=7)
    wq = quant.to_w8a8(w)
    got = np.asarray(qk.w8a8_matmul(x, wq, interpret=True), np.float32)
    ref = np.asarray(x.astype(jnp.float32) @ w)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02  # int8 weights + dynamic int8 activations


def test_w8a8_kernel_matches_dequant_fallback():
    """The Pallas kernel (interpret) and the XLA dequant path must agree to
    within activation-quantization error."""
    from flux2_tpu.ops import quant_kernels as qk

    w = _w((512, 384), seed=8)
    x = _w((16, 512), seed=9)
    wq = quant.to_w8a8(w)
    kern = np.asarray(qk.w8a8_matmul(x, wq, interpret=True), np.float32)
    fall = np.asarray(x @ quant.dequantize_w8a8(wq, x.dtype), np.float32)
    rel = np.linalg.norm(kern - fall) / np.linalg.norm(fall)
    assert rel < 0.01


def test_w8a8_kernel_n_not_multiple_of_bn():
    """Regression: N=2560 (Qwen3-4B hidden) passes w8a8_supported (N%256==0)
    but is not a multiple of the default bn=1024 — the kernel must shrink bn
    to a divisor rather than leave trailing columns unwritten (NaN)."""
    from flux2_tpu.ops import quant_kernels as qk

    w = _w((512, 2560), seed=20)
    x = _w((16, 512), seed=21)
    wq = quant.to_w8a8(w)
    assert qk.w8a8_supported(x, wq)
    got = np.asarray(qk.w8a8_matmul(x, wq, interpret=True), np.float32)
    assert np.isfinite(got).all()
    fall = np.asarray(x @ quant.dequantize_w8a8(wq, x.dtype), np.float32)
    rel = np.linalg.norm(got - fall) / np.linalg.norm(fall)
    assert rel < 0.01


def test_w4a8_kernel_n_not_multiple_of_bn():
    """Same regression for the int4 kernel (default bn=1024, N=2560)."""
    from flux2_tpu.ops import quant_kernels as qk

    w = _w((1024, 2560), seed=22)
    x = _w((16, 1024), seed=23)
    wq = quant.to_w4a8(w)
    assert qk.w4a8_supported(x, wq)
    got = np.asarray(qk.w4a8_matmul(x, wq, interpret=True), np.float32)
    assert np.isfinite(got).all()
    fall = np.asarray(x @ quant.dequantize_w4a8(wq, x.dtype), np.float32)
    rel = np.linalg.norm(got - fall) / np.linalg.norm(fall)
    assert rel < 0.02


def test_dequant_kernel_n_not_multiple_of_bn():
    """dequant_matmul with N=640 (N%128==0 passes supported(), N%512!=0)."""
    from flux2_tpu.ops import quant_kernels as qk

    w = _w((512, 640), seed=24)
    x = _w((16, 512), seed=25)
    wq = quant.quantize(w, "qint8")
    got = np.asarray(qk.dequant_matmul(x, wq, interpret=True), np.float32)
    assert np.isfinite(got).all()
    fall = np.asarray(x @ quant.dequantize(wq, x.dtype), np.float32)
    rel = np.linalg.norm(got - fall) / np.linalg.norm(fall)
    assert rel < 0.01


def test_w8a8_from_stored_qtensor():
    """Storage format (qint8 g64 affine) converts to the W8A8 compute format."""
    w = _w((512, 128), seed=10)
    q8 = quant.quantize(w, "qint8")
    w8 = quant.to_w8a8(q8)
    assert isinstance(w8, quant.W8A8Tensor)
    deq = quant.dequantize_w8a8(w8, jnp.float32)
    rel = np.linalg.norm(np.asarray(deq) - np.asarray(w)) / np.linalg.norm(np.asarray(w))
    assert rel < 0.02


def test_w8a8_params_tree_and_3d():
    params = {
        "big": _w((512, 512)),
        "stacked": _w((4, 512, 256)),
        "norm_scale": jnp.ones((512,)),
    }
    qp = quant.w8a8_params(params, min_size=1)
    assert isinstance(qp["big"], quant.W8A8Tensor)
    assert isinstance(qp["stacked"], quant.W8A8Tensor)
    assert qp["stacked"].q.shape == (4, 512, 256)
    assert qp["stacked"].scale.shape == (4, 1, 256)
    assert not isinstance(qp["norm_scale"], quant.W8A8Tensor)
    # pytree: flows through jit
    out = jax.jit(lambda p, x: quant.q_matmul(x, p["big"]))(qp, _w((4, 512)))
    assert out.shape == (4, 512)
    # dequantize_params expands W8A8 leaves too
    dense = quant.dequantize_params(qp)
    assert dense["big"].shape == (512, 512)
    assert dense["big"].dtype == jnp.bfloat16


@pytest.mark.slow
def test_w8a8_transformer_forward():
    """Tiny DiT forward with W8A8 leaves stays close to bf16."""
    config = cfg.Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=64, mlp_ratio=4.0,
        guidance_embeds=False,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    qparams = quant.w8a8_params(params, min_size=1 << 10)
    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings

    ids = np.concatenate([lu.text_position_ids(8), lu.image_position_ids(64, 64)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 128))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64))
    t = jnp.array([0.5])
    base = np.asarray(tfm.forward(params, config, hidden, txt, t, cos, sin), np.float32)
    qout = np.asarray(tfm.forward(qparams, config, hidden, txt, t, cos, sin), np.float32)
    rel = np.linalg.norm(qout - base) / np.linalg.norm(base)
    assert rel < 0.05


# ---------------------------------------------------------------------------
# W4A8 (int8 activations x packed-int4 weights)
# ---------------------------------------------------------------------------


def test_w4a8_pack_roundtrip():
    w = _w((1024, 256), seed=11)
    wq = quant.to_w4a8(w)
    assert wq.q.dtype == jnp.uint8
    assert wq.q.shape == (512, 256)  # two codes per byte
    assert wq.scale.shape == (2, 256)  # one per 512-row K block
    deq = quant.dequantize_w4a8(wq, jnp.float32)
    # int4 symmetric: max error = scale/2 = amax/14 per block
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert err.max() < np.abs(np.asarray(w)).max() / 14 * 1.05


def test_w4a8_pallas_kernel_interpret():
    from flux2_tpu.ops import quant_kernels as qk

    w = _w((1024, 256), seed=12)
    x = _w((24, 1024), seed=13)
    wq = quant.to_w4a8(w)
    got = np.asarray(qk.w4a8_matmul(x, wq, interpret=True), np.float32)
    # the kernel must agree with the dequant fallback to within
    # activation-quantization error (weight error is shared)
    fall = np.asarray(x @ quant.dequantize_w4a8(wq, x.dtype), np.float32)
    rel = np.linalg.norm(got - fall) / np.linalg.norm(fall)
    assert rel < 0.02
    # and with the dense reference to within int4 error (symmetric int4 with
    # per-512-block scales measures ~13% rel on N(0, s) weights — matches
    # step/sqrt(12) theory; w4a8 is the FIT format, qint8/w8a8 the quality ones)
    ref = np.asarray(x.astype(jnp.float32) @ w)
    rel_dense = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel_dense < 0.17


def test_w4a8_params_and_dispatch():
    params = {"big": _w((512, 512)), "norm": jnp.ones((512,))}
    qp = quant.w4a8_params(params, min_size=1)
    assert isinstance(qp["big"], quant.W4A8Tensor)
    assert not isinstance(qp["norm"], quant.W4A8Tensor)
    x = _w((4, 512), seed=14)
    out = jax.jit(lambda p, x: quant.q_matmul(x, p["big"]))(qp, x)  # CPU fallback path
    ref = np.asarray(x @ params["big"])
    rel = np.linalg.norm(np.asarray(out, np.float32) - ref) / np.linalg.norm(ref)
    assert rel < 0.17
    dense = quant.dequantize_params(qp)
    assert dense["big"].shape == (512, 512)


def test_w4a8_from_stored_qtensor():
    w = _w((512, 128), seed=15)
    q4 = quant.quantize(w, "int4")
    w4 = quant.to_w4a8(q4)
    assert isinstance(w4, quant.W4A8Tensor)
    deq = quant.dequantize_w4a8(w4, jnp.float32)
    rel = np.linalg.norm(np.asarray(deq) - np.asarray(w)) / np.linalg.norm(np.asarray(w))
    assert rel < 0.2  # int4 g64 -> dequant -> per-block int4 re-quant compounds


def test_w8a8_params_skip_stacked_norm_leaves():
    """At 24B scale, stacked norm leaves ([40, 5120] = 205k elements) exceed
    min_size; the name filter must keep them dense or the layer scan breaks
    (regression found by the Mistral-24B coexistence AOT test)."""
    params = {
        "layers": {
            "q_proj": _w((4, 512, 256)),
            "input_norm": jnp.ones((40, 5120)),  # > default min_size
            "embedding_positions": _w((512, 256)),
        },
        "embed_tokens": _w((1024, 256)),
    }
    for fn in (
        lambda p: quant.w8a8_params(p),
        lambda p: quant.w4a8_params(p),
        lambda p: quant.quantize_params(p, "qint8", min_size=1),
    ):
        qp = fn(params)
        assert not quant.is_quantized(qp["layers"]["input_norm"])
        assert not quant.is_quantized(qp["layers"]["embedding_positions"])
        assert not quant.is_quantized(qp["embed_tokens"])
    qp = quant.w8a8_params(params)
    assert quant.is_quantized(qp["layers"]["q_proj"])


def test_nf4():
    """QLoRA NormalFloat4: codebook roundtrip + zero code + error bound."""
    from flux2_tpu.ops import quant

    w = jax.random.normal(jax.random.PRNGKey(3), (128, 64)) * 0.02
    qw = quant.quantize(w, "nf4")
    assert qw.group_size == 64 and qw.q.shape == (64, 64)  # packed nibbles
    deq = quant.dequantize(qw, jnp.float32)
    err = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert err < 0.12  # 4-bit normal-quantile codebook on gaussian weights
    # exact zero is representable (code 7)
    wz = w.at[0, 0].set(0.0)
    deqz = quant.dequantize(quant.quantize(wz, "nf4"), jnp.float32)
    assert float(jnp.abs(deqz[0, 0])) == 0.0
    # model forward runs with nf4 params
    base = tfm_init_small()
    qp = quant.quantize_params(base, "nf4", min_size=0)
    y = qmm_forward(qp)
    assert np.isfinite(np.asarray(y)).all()


def tfm_init_small():
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.models.flux2.config import Flux2TransformerConfig

    cfg = Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    return tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)


def qmm_forward(params):
    import numpy as _np

    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.models.flux2.config import Flux2TransformerConfig
    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings

    cfg = Flux2TransformerConfig(
        num_layers=1, num_single_layers=1, num_attention_heads=2,
        attention_head_dim=128, joint_attention_dim=96, guidance_embeds=False,
    )
    ids = _np.concatenate([lu.text_position_ids(4), lu.image_position_ids(64, 64)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 128), jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 96), jnp.bfloat16)
    return tfm.forward(params, cfg, x, emb, jnp.asarray([0.5]), cos, sin)
