"""Pallas flash attention for TPU.

The reference's attention is a vanilla q@k^T softmax matmul chain
(semilearn/nets/vit/vit.py:91-107) — fine at USB sequence lengths, but it
materializes the [B,H,N,N] score tensor in HBM. This kernel computes
attention blockwise in VMEM with the online-softmax recurrence, so HBM
traffic stays O(N*d): the standard flash pattern, sized for the MXU
(128-aligned tiles).

Exposed as :func:`flash_attention(q, k, v)` with automatic fallback to the
einsum path when shapes are too small to tile (or on non-TPU backends), so
models can call it unconditionally.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/GPU-gated
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_len):
    """One (batch*head, q-block) program: iterate k/v blocks with the
    online-softmax running max/denominator."""
    q = q_ref[0].astype(jnp.float32) * scale            # [bq, d]
    bq = q.shape[0]
    d = q.shape[-1]

    num_kb = pl.cdiv(seq_len, block_k)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq,bk]
        # mask out-of-range keys (seq_len may not divide block_k)
        kpos = i * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (bq, block_k), 1)
        s = jnp.where(kpos < seq_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_bhnd(q, k, v, block_q: int = 128, block_k: int = 128):
    """q,k,v: [BH, N, D] -> [BH, N, D]."""
    BH, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    Np = ((N + block_q - 1) // block_q) * block_q
    Dp = max(((D + 127) // 128) * 128, 128)
    qp = _pad_to(_pad_to(q, Np, 1), Dp, 2)
    kp = _pad_to(_pad_to(k, Np, 1), Dp, 2)
    vp = _pad_to(_pad_to(v, Np, 1), Dp, 2)

    grid = (BH, Np // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                          seq_len=N),
        out_shape=jax.ShapeDtypeStruct((BH, Np, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0)),
    )(qp, kp, vp)
    return out[:, :N, :D]


def flash_attention(q, k, v, bias=None):
    """q,k,v: [B, N, H, d]. Returns [B, N, H, d].

    Falls back to the fused-einsum path when pallas is unavailable, when an
    additive bias/mask is supplied (the BERT padding path), or when the
    geometry is too small for 128-tiles to pay off.
    """
    B, N, H, d = q.shape
    use_pallas = (_HAS_PALLAS and bias is None and N >= 128
                  and jax.default_backend() == "tpu")
    if not use_pallas:
        scale = 1.0 / math.sqrt(d)
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def reshape_in(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, N, d)

    out = _flash_bhnd(reshape_in(q), reshape_in(k), reshape_in(v))
    return out.reshape(B, H, N, d).transpose(0, 2, 1, 3)
