"""Pallas kernel tests in interpreter mode (hermetic, CPU).

The compiled kernels are additionally validated on real TPU hardware (see
docs/knowledge/decisions/); interpret mode pins the kernel MATH into the
hermetic suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.ops import quant
from flux2_tpu.ops.attention import sdpa_xla
from flux2_tpu.ops.flash_attention import flash_attention
from flux2_tpu.ops.quant_kernels import dequant_matmul


def test_flash_attention_interpret_matches_xla():
    B, H, S, D = 1, 2, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    ref = sdpa_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_interpret_ragged_seq():
    """Sequence not divisible by the block: padding keys must be masked out."""
    B, H, S, D = 1, 1, 200, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    ref = sdpa_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_custom_scale():
    B, H, S, D = 1, 1, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    ref = sdpa_xla(q, k, v, scale=0.5)
    out = flash_attention(q, k, v, scale=0.5, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("fmt", ["qint8", "int4"])
def test_dequant_matmul_interpret(fmt):
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 512))
    w = jax.random.normal(jax.random.PRNGKey(4), (512, 256)) * 0.05
    qw = quant.quantize(w, fmt)
    ref = np.asarray(x @ quant.dequantize(qw, jnp.float32))
    out = np.asarray(dequant_matmul(x, qw, bm=64, bn=256, bk=512, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_dequant_matmul_interpret_multi_k_blocks():
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 1024))
    w = jax.random.normal(jax.random.PRNGKey(6), (1024, 128)) * 0.05
    qw = quant.quantize(w, "qint8")
    ref = np.asarray(x @ quant.dequantize(qw, jnp.float32))
    out = np.asarray(dequant_matmul(x, qw, bm=32, bn=128, bk=256, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_flash_attention_blocked_span_interpret():
    """Segment masking matches an explicit additive-bias reference."""
    B, H, S, D = 1, 1, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    q0, q1, k0 = 32, 96, 160  # "ref" queries 32..96 blind to keys >= 160
    row = np.arange(S)
    col = np.arange(S)
    blocked = (row[:, None] >= q0) & (row[:, None] < q1) & (col[None, :] >= k0)
    bias = jnp.asarray(np.where(blocked, -1e30, 0.0), jnp.float32)[None, None]
    ref = sdpa_xla(q, k, v, bias=bias)
    out = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True, blocked_span=(q0, q1, k0)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_gradients_interpret():
    """The custom VJP: grads through flash match grads through XLA attention."""
    B, H, S, D = 1, 1, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_flash_attention_gradients_blocked_span():
    B, H, S, D = 1, 1, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    span = (16, 48, 96)
    row, col = np.arange(S), np.arange(S)
    blocked = (row[:, None] >= span[0]) & (row[:, None] < span[1]) & (col[None, :] >= span[2])
    bias = jnp.asarray(np.where(blocked, -1e30, 0.0), jnp.float32)[None, None]

    gf = jax.grad(lambda q: jnp.sum(
        flash_attention(q, k, v, block_q=128, block_k=128, interpret=True, blocked_span=span) ** 2
    ))(q)
    gx = jax.grad(lambda q: jnp.sum(sdpa_xla(q, k, v, bias=bias) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=3e-4)


def test_pick_block_k_divisor_selection():
    """Long-sequence tiling picks a block that divides the padded KV length
    (interior tiles then skip the padding mask entirely); prime-ish lengths
    fall back to the masked 1024 path."""
    from flux2_tpu.ops import flash_attention as fa

    assert fa._pick_block_k(4608) == 4608  # single-block regime
    # 16896 keys = 132 blocks of 128 -> 22*128 = 2816 divides exactly
    assert fa._pick_block_k(16896) == 2816
    assert 16896 % fa._pick_block_k(16896) == 0
    # 16384 = 128 blocks -> largest divisor under the cap is 16*128 = 2048
    assert fa._pick_block_k(16384) == 2048
    # 131 blocks (prime): no usable divisor -> masked fallback
    assert fa._pick_block_k(131 * 128) == fa.TILED_BLOCK_K


def test_flash_attention_tiled_divisible_and_padded(monkeypatch):
    """The tiled multi-k-block path (cond-gated masks): exact-divisor KV and
    ragged (padded final block) KV both match XLA."""
    from flux2_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "MAX_SINGLE_BLOCK_K", 128)
    monkeypatch.setattr(fa, "MAX_TILED_BLOCK_K", 256)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    # S=512 -> 4 blocks of 128 -> bk=256 divides exactly (maskless interior)
    q = jax.random.normal(ks[0], (1, 3, 512, 128))
    k = jax.random.normal(ks[1], (1, 3, 512, 128))
    v = jax.random.normal(ks[2], (1, 3, 512, 128))
    out = fa.flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sdpa_xla(q, k, v)), atol=2e-5)
    # S=450 -> padded to 512, final block carries the cond-gated pad mask
    qr, kr, vr = q[:, :, :450], k[:, :, :450], v[:, :, :450]
    out_r = fa.flash_attention(qr, kr, vr, interpret=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(sdpa_xla(qr, kr, vr)), atol=2e-5)
    # gradients through the tiled path
    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2))(qr, kr, vr)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(qr, kr, vr)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_flash_attention_const_anchor_and_killswitch(monkeypatch):
    """bounded_logits unlocks the constant-anchor softmax on the multi-block
    KV path; results match XLA and the FLUX2_FLASH_EXACT_MAX running-max path.

    block_k=128 is EXPLICIT: adaptive _pick_block_k at S=384 would choose a
    single KV block, where const_anchor is never engaged (an earlier version
    of this test monkeypatched the MAX_* constants but still got the
    single-block fallback — it validated the running-max path twice)."""
    from flux2_tpu.ops import flash_attention as fa

    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    # qk-norm-like magnitudes: rows ~ unit RMS (the bounded_logits contract)
    q = jax.random.normal(ks[0], (1, 2, 384, 128))
    k = jax.random.normal(ks[1], (1, 2, 384, 128))
    v = jax.random.normal(ks[2], (1, 2, 384, 128))
    anchored = fa._flash_impl(q, k, v, interpret=True, bounded_logits=True, block_k=128)
    np.testing.assert_allclose(np.asarray(anchored), np.asarray(sdpa_xla(q, k, v)), atol=2e-5)
    monkeypatch.setattr(fa, "_EXACT_MAX", True)
    exact = fa._flash_impl(q, k, v, interpret=True, bounded_logits=True, block_k=128)
    np.testing.assert_allclose(np.asarray(anchored), np.asarray(exact), atol=2e-5)
    # gradients through the const-anchor path (lse with anchor 0)
    monkeypatch.setattr(fa, "_EXACT_MAX", False)

    def loss(q, k, v):
        return jnp.sum(
            fa.flash_attention(q, k, v, interpret=True, bounded_logits=True, block_k=128) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    # contract violation breaks LOUDLY: |logits| >> 127 in the exp2 domain
    # overflows to inf/inf = NaN instead of silently distorting
    bad = fa._flash_impl(q * 60, k * 60, v, interpret=True, bounded_logits=True, block_k=128)
    assert np.isnan(np.asarray(bad)).any()
    # the running-max kill-switch path stays finite on the same inputs
    monkeypatch.setattr(fa, "_EXACT_MAX", True)
    safe = fa._flash_impl(q * 60, k * 60, v, interpret=True, bounded_logits=True, block_k=128)
    assert np.isfinite(np.asarray(safe)).all()
