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
    B, N, H, d = 1, 130, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias = jnp.where(jnp.arange(N)[None, None, None, :] < 100, 0.0, -1e9)
    out = flash_attention(q, k, v, bias=bias)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d) + bias
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
