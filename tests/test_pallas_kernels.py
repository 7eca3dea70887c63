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
