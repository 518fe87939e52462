"""Pallas flash attention: forward and custom-VJP backward vs the einsum
reference (interpret mode on CPU; the same kernels compile on TPU)."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semireward_tpu.ops.attention import flash_attention


def ref_attn(q, k, v, d):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d)
    return jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize("N", [128, 200, 257])
def test_forward_matches(rs, N):
    B, H, d = 2, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, force=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_attn(q, k, v, d)),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, interpret=True, force=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (ref_attn(q, k, v, d) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_bias_falls_back(rs):
    # a non-key-only bias (varies over the query axis) must fall back to
    # the einsum path; a key-only [B,1,1,N] bias runs in-kernel (below)
    B, N, H, d = 1, 130, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias = jnp.asarray(rs.randn(B, 1, N, N), jnp.float32)
    out = flash_attention(q, k, v, bias=bias, force=True, interpret=True)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d) + bias
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# key-only padding bias (the BERT attention-mask path) runs IN-kernel
# ---------------------------------------------------------------------------

def _key_bias(rs, B, N, n_real):
    lens = np.full((B,), n_real)
    lens[0] = max(1, n_real - 37)
    m = (np.arange(N)[None, :] < lens[:, None]).astype(np.float32)
    return jnp.asarray(np.where(m, 0.0, -1e9))[:, None, None, :], m


def ref_attn_bias(q, k, v, d, bias):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d) + bias
    return jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize("N", [128, 200])
def test_key_bias_in_kernel_forward(rs, N):
    B, H, d = 2, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 11)
    out = flash_attention(q, k, v, bias=bias, interpret=True, force=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_attn_bias(q, k, v, d, bias)),
                               rtol=1e-4, atol=1e-5)


def test_key_bias_in_kernel_gradients(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 23)

    g1 = jax.grad(lambda q, k, v: (flash_attention(
        q, k, v, bias=bias, interpret=True, force=True) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (ref_attn_bias(q, k, v, d, bias) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# in-kernel counter-hash dropout (the BERT/HuBERT training path)
# ---------------------------------------------------------------------------

def _hash_ref_attn(q, k, v, d, seed, rate, bias=None):
    """Dense reference applying the EXACT mask stream the kernel generates
    (attention_keep_mask) — fwd/grad oracle for the dropout kernels."""
    from semireward_tpu.ops.attention import attention_keep_mask, keep_threshold

    B, N, H, _ = q.shape
    Np = ((N + 127) // 128) * 128
    keep = attention_keep_mask(seed, B * H, N, Np,
                               keep_threshold(rate)).reshape(B, H, N, N)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, -1)
    p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


def test_dropout_forward_matches_hash_oracle(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    out = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=1234,
                          interpret=True, force=True)
    ref = _hash_ref_attn(q, k, v, d, 1234, 0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # deterministic in the seed; different seeds give different masks
    out2 = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=1234,
                           interpret=True, force=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=77,
                           interpret=True, force=True)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-3


def test_dropout_backward_regenerates_same_mask(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 17)

    g1 = jax.grad(lambda q, k, v: (flash_attention(
        q, k, v, bias=bias, dropout_rate=0.1, dropout_seed=99,
        interpret=True, force=True) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_hash_ref_attn(
        q, k, v, d, 99, 0.1, bias=bias) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_dropout_keep_rate_and_fallback_parity(rs):
    from semireward_tpu.ops.attention import attention_keep_mask, keep_threshold

    keep = attention_keep_mask(3, 6, 200, 256, keep_threshold(0.1))
    rate = float(np.asarray(keep).mean())
    assert abs(rate - 0.9) < 0.005
    # the non-pallas fallback applies the identical stream -> same numbers
    B, N, H, d = 1, 136, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    pal = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=5,
                          interpret=True, force=True)
    fb = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=5)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(fb),
                               rtol=1e-4, atol=1e-5)
