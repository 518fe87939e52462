"""Pallas flash attention for TPU — forward AND backward (custom VJP).

The reference's attention is a vanilla q@k^T softmax matmul chain
(semilearn/nets/vit/vit.py:91-107) that materializes the [B,H,N,N] score
tensor in HBM. This kernel computes attention blockwise in VMEM with the
online-softmax recurrence (forward saves only the per-row logsumexp), and
the backward recomputes probabilities blockwise — HBM traffic stays O(N*d)
in both directions, so the Pallas path is usable in TRAINING too.

Exposed as :func:`flash_attention(q, k, v, bias=None)` with automatic
fallback to the fused-einsum path when a bias/mask is supplied (the BERT
padding path), on non-TPU backends, or for tiny sequences.
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


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                seq_len):
    q = q_ref[0].astype(jnp.float32) * scale            # [bq, d]
    bq, d = q.shape
    num_kb = pl.cdiv(seq_len, block_k)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kpos = i * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (bq, block_k), 1)
        s = jnp.where(kpos < seq_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)
    qi = pl.program_id(1)
    lse_ref[0, 0, pl.ds(qi * bq, bq)] = (m + jnp.log(l)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# backward: dq over q-blocks; (dk, dv) over k-blocks, both recomputing p
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, block_k, seq_len):
    q = q_ref[0].astype(jnp.float32)                    # [bq, d]
    do = do_ref[0].astype(jnp.float32)
    bq, d = q.shape
    qi = pl.program_id(1)
    lse = lse_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.float32)    # [bq]
    delta = delta_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.float32)
    num_kb = pl.cdiv(seq_len, block_k)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        kpos = i * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (bq, block_k), 1)
        s = jnp.where(kpos < seq_len, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])                   # [bq, bk]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, seq_len):
    k = k_ref[0].astype(jnp.float32)                    # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    num_qb = pl.cdiv(seq_len, block_q)
    kidx = pl.program_id(1)
    kpos = kidx * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)[0]

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        # mask padded KEY columns and padded QUERY rows
        s = jnp.where(kpos[None, :] < seq_len, s, _NEG_INF)
        qpos = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)[:, 0]
        valid_q = (qpos < seq_len)[:, None]
        p = jnp.exp(s - lse[:, None]) * valid_q          # [bq, bk]
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# padding + pallas_call plumbing with custom VJP
# ---------------------------------------------------------------------------

def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


_BQ = 128
_BK = 128


def _fwd_call(qp, kp, vp, scale, seq_len, interpret=False):
    BH, Np, Dp = qp.shape
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=_BK,
                          seq_len=seq_len),
        out_shape=(jax.ShapeDtypeStruct((BH, Np, Dp), qp.dtype),
                   jax.ShapeDtypeStruct((BH, 1, Np), jnp.float32)),
        grid=(BH, Np // _BQ),
        in_specs=[
            pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0))),
        interpret=interpret,
    )(qp, kp, vp)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bhnd(q, k, v, true_d: int, seq_len: int, interpret: bool = False):
    """q,k,v: [BH, Np, Dp] (pre-padded). Returns [BH, Np, Dp]."""
    out, _ = _fwd_call(q, k, v, 1.0 / math.sqrt(true_d), seq_len, interpret)
    return out


def _flash_fwd(q, k, v, true_d, seq_len, interpret):
    out, lse = _fwd_call(q, k, v, 1.0 / math.sqrt(true_d), seq_len, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(true_d, seq_len, interpret, res, do):
    q, k, v, out, lse = res
    BH, Np, Dp = q.shape
    scale = 1.0 / math.sqrt(true_d)
    do = do.astype(q.dtype)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]  # [BH, 1, Np]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=_BK,
                          seq_len=seq_len),
        out_shape=jax.ShapeDtypeStruct((BH, Np, Dp), q.dtype),
        grid=(BH, Np // _BQ),
        in_specs=[
            pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),   # q
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),    # k
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),    # v
            pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),   # do
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),     # lse
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),     # delta
        ],
        out_specs=pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=_BQ,
                          seq_len=seq_len),
        out_shape=(jax.ShapeDtypeStruct((BH, Np, Dp), q.dtype),
                   jax.ShapeDtypeStruct((BH, Np, Dp), q.dtype)),
        grid=(BH, Np // _BK),
        in_specs=[
            pl.BlockSpec((1, Np, Dp), lambda b, j: (b, 0, 0)),    # q
            pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0)),   # k
            pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0)),   # v
            pl.BlockSpec((1, Np, Dp), lambda b, j: (b, 0, 0)),    # do
            pl.BlockSpec((1, 1, Np), lambda b, j: (b, 0, 0)),     # lse
            pl.BlockSpec((1, 1, Np), lambda b, j: (b, 0, 0)),     # delta
        ],
        out_specs=(pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0)),
                   pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0))),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


_flash_bhnd.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, bias=None, interpret=False, force=False):
    """q,k,v: [B, N, H, d]. Returns [B, N, H, d]. Differentiable — the
    backward runs as blockwise Pallas kernels (recompute + logsumexp).

    Falls back to the fused-einsum path when pallas is unavailable, when an
    additive bias/mask is supplied (the BERT padding path), or when the
    geometry is too small for 128-tiles to pay off.
    """
    B, N, H, d = q.shape
    use_pallas = force or (_HAS_PALLAS and bias is None and N >= 128
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

    Np = ((N + _BQ - 1) // _BQ) * _BQ
    Dp = max(((d + 127) // 128) * 128, 128)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, d)
        return _pad_to(_pad_to(x, Np, 1), Dp, 2)

    out = _flash_bhnd(prep(q), prep(k), prep(v), d, N, interpret)
    out = out[:, :N, :d]
    return out.reshape(B, H, N, d).transpose(0, 2, 1, 3)
