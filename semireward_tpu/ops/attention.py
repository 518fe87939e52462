"""Pallas flash attention for TPU — forward AND backward (custom VJP).

The reference's attention is a vanilla q@k^T softmax matmul chain
(semilearn/nets/vit/vit.py:91-107) that materializes the [B,H,N,N] score
tensor in HBM. This kernel computes attention blockwise in VMEM with the
online-softmax recurrence (forward saves only the per-row logsumexp), and
the backward recomputes probabilities blockwise — HBM traffic stays O(N*d)
in both directions, so the Pallas path is usable in TRAINING too.

Exposed as :func:`flash_attention(q, k, v, bias=None, dropout_rate=...,
dropout_seed=...)`:

- ``bias`` may be a KEY-ONLY additive bias of shape [B, 1, 1, N] (the BERT
  padding mask, models/bert.py) — handled inside the kernel. Any other bias
  shape falls back to the fused-einsum path. The bias is treated as
  NON-DIFFERENTIABLE (it always derives from an integer attention mask);
  its cotangent is zero.
- ``dropout_rate > 0`` applies dropout to the attention probabilities
  INSIDE the kernel (the reference trains BERT/HuBERT/wav2vec2 with p=0.1
  on the probs). The mask is a counter-based hash of
  (batch*head, query-pos, key-pos) mixed with ``dropout_seed``, so the
  backward kernels regenerate bit-identical masks with zero extra memory.
  The same stream is reproduced by :func:`attention_keep_mask` (used by
  the non-Pallas fallback and the tests), so semantics are
  backend-independent. This is a documented deviation (DEVIATIONS.md):
  same Bernoulli(keep=1-p) marginal as the reference, different bit
  stream than torch/jax.random.

Fallback to the fused-einsum path happens when pallas is unavailable, on
non-TPU backends (unless ``force``), for tiny sequences, or for
non-key-only biases.
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/GPU-gated
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# counter-based dropout hash (identical in-kernel and in plain jnp)
# ---------------------------------------------------------------------------

def _lowbias32(x):
    """lowbias32 integer hash (uint32 -> uint32); works on jnp arrays both
    inside pallas kernels and in plain XLA (the fallback/tests)."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> np.uint32(15))
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> np.uint32(16))
    return x


def _keep_bits(counter_u32, seed_u32):
    return _lowbias32(_lowbias32(counter_u32) ^ seed_u32)


def keep_threshold(dropout_rate: float) -> int:
    """uint32 comparison threshold for keep_prob = 1 - dropout_rate."""
    return int(round((1.0 - float(dropout_rate)) * 2.0 ** 32))


def attention_keep_mask(seed, BH: int, N: int, np_pad: int, thresh: int,
                        bh_offset=0, local_heads=None, head_stride=None):
    """Full keep mask [BH, N, N] matching the kernel's bit stream exactly
    (np_pad = the kernel's 128-padded sequence length; bh_offset = this
    shard's global (batch*head) start under flash_attention_sharded).
    ``local_heads``/``head_stride`` decompose a HEAD-SHARDED shard's local
    bh index L into global (batch, head): global_bh = bh_offset +
    (L // local_heads) * head_stride + L % local_heads — the
    tensor-parallel layout where each shard owns local_heads of the
    head_stride total heads. Defaults reproduce the contiguous stream
    (global_bh = bh_offset + L). Test/fallback use — this materializes
    what the kernel never does."""
    seed_u = jnp.asarray(seed, jnp.int32).reshape(()).astype(jnp.uint32)
    off_u = jnp.asarray(bh_offset, jnp.int32).astype(jnp.uint32)
    L = jnp.arange(BH, dtype=jnp.uint32)
    if local_heads is not None:
        hl = np.uint32(local_heads)
        st = np.uint32(head_stride if head_stride is not None else local_heads)
        bh = ((L // hl) * st + L % hl)[:, None, None] + off_u
    else:
        bh = L[:, None, None] + off_u
    qpos = jnp.arange(N, dtype=jnp.uint32)[None, :, None]
    kpos = jnp.arange(N, dtype=jnp.uint32)[None, None, :]
    npp = np.uint32(np_pad)
    counter = (bh * npp + qpos) * npp + kpos
    return _keep_bits(counter, seed_u) < np.uint32(thresh)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, scale, block_k, seq_len, has_bias, thresh, keep_prob,
                np_pad):
    i0 = 3 + int(has_bias) + int(thresh > 0)
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    bias_ref = refs[3] if has_bias else None
    seed_ref = refs[3 + int(has_bias)] if thresh else None
    o_ref, lse_ref = refs[i0], refs[i0 + 1]

    q = q_ref[0].astype(jnp.float32) * scale            # [bq, d]
    bq, d = q.shape
    num_kb = pl.cdiv(seq_len, block_k)
    if thresh:
        seed_u = seed_ref[0, 0].astype(jnp.uint32)
        L = pl.program_id(0)
        hl = seed_ref[0, 2]   # local heads; (hl, stride) = (H, H) when
        st = seed_ref[0, 3]   # heads are not sharded -> off + L exactly
        bh_u = (seed_ref[0, 1] + (L // hl) * st + L % hl).astype(jnp.uint32)
        qi = pl.program_id(1)
        qpos_u = (qi * bq + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 0)).astype(jnp.uint32)
        npp = np.uint32(np_pad)
        inv_keep = np.float32(1.0 / keep_prob)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kpos = i * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (bq, block_k), 1)
        if has_bias:
            s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :]
        s = jnp.where(kpos < seq_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + p.sum(axis=-1)
        if thresh:
            counter = (bh_u * npp + qpos_u) * npp + kpos.astype(jnp.uint32)
            keep = _keep_bits(counter, seed_u) < np.uint32(thresh)
            pv = jnp.where(keep, p * inv_keep, 0.0)
        else:
            pv = p
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
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

def _bwd_dq_kernel(*refs, scale, block_k, seq_len, has_bias, thresh,
                   keep_prob, np_pad):
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    idx = 3
    bias_ref = refs[idx] if has_bias else None
    idx += int(has_bias)
    seed_ref = refs[idx] if thresh else None
    idx += int(thresh > 0)
    do_ref, lse_ref, delta_ref, dq_ref = refs[idx:idx + 4]

    q = q_ref[0].astype(jnp.float32)                    # [bq, d]
    do = do_ref[0].astype(jnp.float32)
    bq, d = q.shape
    qi = pl.program_id(1)
    lse = lse_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.float32)    # [bq]
    delta = delta_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.float32)
    num_kb = pl.cdiv(seq_len, block_k)
    if thresh:
        seed_u = seed_ref[0, 0].astype(jnp.uint32)
        L = pl.program_id(0)
        hl = seed_ref[0, 2]
        st = seed_ref[0, 3]
        bh_u = (seed_ref[0, 1] + (L // hl) * st + L % hl).astype(jnp.uint32)
        qpos_u = (qi * bq + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 0)).astype(jnp.uint32)
        npp = np.uint32(np_pad)
        inv_keep = np.float32(1.0 / keep_prob)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        kpos = i * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                      (bq, block_k), 1)
        if has_bias:
            s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :]
        s = jnp.where(kpos < seq_len, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])                   # [bq, bk]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if thresh:
            counter = (bh_u * npp + qpos_u) * npp + kpos.astype(jnp.uint32)
            keep = _keep_bits(counter, seed_u) < np.uint32(thresh)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale, block_q, seq_len, has_bias, thresh,
                    keep_prob, np_pad):
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    idx = 3
    bias_ref = refs[idx] if has_bias else None
    idx += int(has_bias)
    seed_ref = refs[idx] if thresh else None
    idx += int(thresh > 0)
    do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs[idx:idx + 5]

    k = k_ref[0].astype(jnp.float32)                    # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    num_qb = pl.cdiv(seq_len, block_q)
    kidx = pl.program_id(1)
    kpos = kidx * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)[0]
    if has_bias:
        kbias = bias_ref[0, 0, :].astype(jnp.float32)   # [bk]
    if thresh:
        seed_u = seed_ref[0, 0].astype(jnp.uint32)
        L = pl.program_id(0)
        hl = seed_ref[0, 2]
        st = seed_ref[0, 3]
        bh_u = (seed_ref[0, 1] + (L // hl) * st + L % hl).astype(jnp.uint32)
        kpos_u = kpos.astype(jnp.uint32)
        npp = np.uint32(np_pad)
        inv_keep = np.float32(1.0 / keep_prob)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + kbias[None, :]
        # mask padded KEY columns and padded QUERY rows
        s = jnp.where(kpos[None, :] < seq_len, s, _NEG_INF)
        qpos = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)[:, 0]
        valid_q = (qpos < seq_len)[:, None]
        p = jnp.exp(s - lse[:, None]) * valid_q          # [bq, bk]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if thresh:
            counter = ((bh_u * npp + qpos.astype(jnp.uint32)[:, None]) * npp
                       + kpos_u[None, :])
            keep = _keep_bits(counter, seed_u) < np.uint32(thresh)
            pv = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            pv = p
        dv = dv + jax.lax.dot_general(pv, do, (((0,), (0,)), ((), ())),
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


def _extra_inputs(qp, bias, seed, has_bias, thresh, full_bias_spec=True):
    """(inputs, specs) for the optional bias/seed refs, in kernel order."""
    BH, Np, _ = qp.shape
    inputs, specs = [], []
    if has_bias:
        inputs.append(bias)
        if full_bias_spec:
            specs.append(pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)))
        else:  # dkv grid: one key block per grid step
            specs.append(pl.BlockSpec((1, 1, _BK), lambda b, j: (b, 0, j)))
    if thresh:
        inputs.append(seed)  # [1,4] int32: (seed, bh_offset, local_heads,
        #                                    head_stride)
        specs.append(pl.BlockSpec((1, 4), lambda b, i: (0, 0)))
    return inputs, specs


def _fwd_call(qp, kp, vp, bias, seed, scale, seq_len, has_bias, thresh,
              keep_prob, interpret=False):
    BH, Np, Dp = qp.shape
    xin, xspec = _extra_inputs(qp, bias, seed, has_bias, thresh)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=_BK,
                          seq_len=seq_len, has_bias=has_bias, thresh=thresh,
                          keep_prob=keep_prob, np_pad=Np),
        out_shape=(jax.ShapeDtypeStruct((BH, Np, Dp), qp.dtype),
                   jax.ShapeDtypeStruct((BH, 1, Np), jnp.float32)),
        grid=(BH, Np // _BQ),
        in_specs=[
            pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),
        ] + xspec,
        out_specs=(pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),
                   pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0))),
        interpret=interpret,
    )(qp, kp, vp, *xin)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_bhnd(q, k, v, bias, seed, true_d: int, seq_len: int,
                has_bias: bool, thresh: int, keep_prob: float,
                interpret: bool = False):
    """q,k,v: [BH, Np, Dp] (pre-padded); bias: [BH, 1, Np] f32 key bias
    (unused when has_bias=False); seed: [1,2] int32 (dropout seed,
    batch*head offset; unused when thresh=0). Returns [BH, Np, Dp]. bias
    is treated as non-differentiable."""
    out, _ = _fwd_call(q, k, v, bias, seed, 1.0 / math.sqrt(true_d), seq_len,
                       has_bias, thresh, keep_prob, interpret)
    return out


def _flash_fwd(q, k, v, bias, seed, true_d, seq_len, has_bias, thresh,
               keep_prob, interpret):
    out, lse = _fwd_call(q, k, v, bias, seed, 1.0 / math.sqrt(true_d),
                         seq_len, has_bias, thresh, keep_prob, interpret)
    return out, (q, k, v, bias, seed, out, lse)


def _flash_bwd(true_d, seq_len, has_bias, thresh, keep_prob, interpret,
               res, do):
    q, k, v, bias, seed, out, lse = res
    BH, Np, Dp = q.shape
    scale = 1.0 / math.sqrt(true_d)
    do = do.astype(q.dtype)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]  # [BH, 1, Np]

    xin_q, xspec_q = _extra_inputs(q, bias, seed, has_bias, thresh)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=_BK,
                          seq_len=seq_len, has_bias=has_bias, thresh=thresh,
                          keep_prob=keep_prob, np_pad=Np),
        out_shape=jax.ShapeDtypeStruct((BH, Np, Dp), q.dtype),
        grid=(BH, Np // _BQ),
        in_specs=[
            pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),   # q
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),    # k
            pl.BlockSpec((1, Np, Dp), lambda b, i: (b, 0, 0)),    # v
        ] + xspec_q + [
            pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),   # do
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),     # lse
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),     # delta
        ],
        out_specs=pl.BlockSpec((1, _BQ, Dp), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, *xin_q, do, lse, delta)

    xin_k, xspec_k = _extra_inputs(q, bias, seed, has_bias, thresh,
                                   full_bias_spec=False)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=_BQ,
                          seq_len=seq_len, has_bias=has_bias, thresh=thresh,
                          keep_prob=keep_prob, np_pad=Np),
        out_shape=(jax.ShapeDtypeStruct((BH, Np, Dp), q.dtype),
                   jax.ShapeDtypeStruct((BH, Np, Dp), q.dtype)),
        grid=(BH, Np // _BK),
        in_specs=[
            pl.BlockSpec((1, Np, Dp), lambda b, j: (b, 0, 0)),    # q
            pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0)),   # k
            pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0)),   # v
        ] + xspec_k + [
            pl.BlockSpec((1, Np, Dp), lambda b, j: (b, 0, 0)),    # do
            pl.BlockSpec((1, 1, Np), lambda b, j: (b, 0, 0)),     # lse
            pl.BlockSpec((1, 1, Np), lambda b, j: (b, 0, 0)),     # delta
        ],
        out_specs=(pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0)),
                   pl.BlockSpec((1, _BK, Dp), lambda b, j: (b, j, 0))),
        interpret=interpret,
    )(q, k, v, *xin_k, do, lse, delta)
    # bias: always mask-derived, non-differentiable by contract (docstring);
    # seed is integer -> float0 tangent space
    dbias = jnp.zeros_like(bias)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


_flash_bhnd.defvjp(_flash_fwd, _flash_bwd)


def _key_bias_of(bias, B, H, N):
    """Return [B*H, 1, N] f32 key-only bias, or None if the shape is not a
    key-only broadcast ([B,1,1,N] / [1,1,1,N] / [B,H,1,N])."""
    if bias is None or bias.ndim != 4:
        return None
    b0, h0, n0, n1 = bias.shape
    if n0 != 1 or n1 != N or b0 not in (1, B) or h0 not in (1, H):
        return None
    kb = jnp.broadcast_to(bias.astype(jnp.float32), (B, H, 1, N))
    return kb.reshape(B * H, 1, N)


def _xla_attention(q, k, v, bias, thresh, keep_prob, dropout_seed, Np,
                   bh_offset=0, local_heads=None, head_stride=None):
    """The fused-einsum path, applying the IDENTICAL hash-dropout stream
    the kernel generates (attention_keep_mask). The dropout case is
    rematerialized: without jax.checkpoint autodiff would hold the f32
    [B,H,N,N] probs + keep mask per layer for the backward (~300 MB/layer
    at L=512) — the residual-free contract the kernel provides must
    survive the fallback too."""
    B, N, H, d = q.shape
    scale = 1.0 / math.sqrt(d)

    def _body(q, k, v, seed, off):
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        if thresh:
            keep = attention_keep_mask(seed, B * H, N, Np, thresh,
                                       bh_offset=off,
                                       local_heads=local_heads,
                                       head_stride=head_stride)
            p = jnp.where(keep.reshape(B, H, N, N), p / keep_prob, 0.0)
        return jnp.einsum("bhnm,bmhd->bnhd", p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    if thresh:
        _body = jax.checkpoint(_body)
        return _body(q, k, v, jnp.asarray(dropout_seed, jnp.int32),
                     jnp.asarray(bh_offset, jnp.int32))
    return _body(q, k, v, None, None)


def flash_attention(q, k, v, bias=None, dropout_rate: float = 0.0,
                    dropout_seed=None, bh_offset=0, local_heads=None,
                    head_stride=None, interpret=False, force=False):
    """q,k,v: [B, N, H, d]. Returns [B, N, H, d]. Differentiable — the
    backward runs as blockwise Pallas kernels (recompute + logsumexp).

    ``bias``: optional additive attention bias. A key-only bias
    [B,1,1,N] (the BERT padding mask) runs INSIDE the kernel; any other
    shape falls back to the fused-einsum path. The bias never receives a
    gradient (it derives from an integer mask).

    ``dropout_rate``/``dropout_seed``: in-kernel dropout on the attention
    probabilities (see module docstring). The seed is any int32 scalar (or
    [1,1] array); the same (seed, geometry) always yields the same mask,
    so callers must derive a fresh seed per step/layer from their dropout
    RNG. The fused-einsum fallback applies the SAME hash mask, so the op
    is backend-independent. ``bh_offset`` (int or traced scalar) offsets
    the batch*head index in the dropout counter — used by
    :func:`flash_attention_sharded` so a batch-sharded run reproduces the
    single-device mask stream.

    Falls back to the fused-einsum path when pallas is unavailable, when a
    non-key-only bias is supplied, or when the geometry is too small for
    128-tiles to pay off.
    """
    B, N, H, d = q.shape
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    thresh = keep_threshold(dropout_rate) if dropout_rate > 0.0 else 0
    keep_prob = 1.0 - dropout_rate

    Np = ((N + _BQ - 1) // _BQ) * _BQ
    key_bias = _key_bias_of(bias, B, H, N)
    # the dropout counter (bh*Np + q)*Np + k must fit in uint32
    drop_ok = thresh == 0 or B * H * Np * Np < 2 ** 32
    use_pallas = (_HAS_PALLAS and N >= 128 and drop_ok
                  and (bias is None or key_bias is not None)
                  and (force or jax.default_backend() == "tpu"))
    if not use_pallas:
        return _xla_attention(q, k, v, bias, thresh, keep_prob, dropout_seed,
                              Np, bh_offset=bh_offset,
                              local_heads=local_heads,
                              head_stride=head_stride)

    Dp = max(((d + 127) // 128) * 128, 128)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, d)
        return _pad_to(_pad_to(x, Np, 1), Dp, 2)

    has_bias = key_bias is not None
    bias_arg = (_pad_to(key_bias, Np, 2) if has_bias
                else jnp.zeros((1, 1, 1), jnp.float32))
    if thresh:
        hl = H if local_heads is None else local_heads
        st = hl if head_stride is None else head_stride
        seed_arg = jnp.stack(
            [jnp.asarray(dropout_seed, jnp.int32).reshape(()),
             jnp.asarray(bh_offset, jnp.int32).reshape(()),
             jnp.asarray(hl, jnp.int32).reshape(()),
             jnp.asarray(st, jnp.int32).reshape(())]).reshape(1, 4)
    else:
        seed_arg = jnp.zeros((1, 4), jnp.int32)
    out = _flash_bhnd(prep(q), prep(k), prep(v), bias_arg, seed_arg,
                      d, N, has_bias, thresh, keep_prob, interpret)
    out = out[:, :N, :d]
    return out.reshape(B, H, N, d).transpose(0, 2, 1, 3)


def flash_attention_sharded(q, k, v, bias=None, dropout_rate: float = 0.0,
                            dropout_seed=None, *, mesh,
                            data_axis=None, interpret=False,
                            force=False):
    """:func:`flash_attention` under ``shard_map`` for data-parallel
    meshes: the batch dim of q/k/v (and a per-sample key bias) shards over
    ``data_axis`` (a mesh axis name or tuple; default = every data-like
    axis in the mesh — 'data', plus 'fsdp' on the 2-D ZeRO layout, where
    batch-sharding over both axes is FSDP's own compute pattern).
    pallas_call has no GSPMD partitioning rule, so under a
    plain pjit a multi-device mesh would all-gather the kernel's operands
    (same story as ops/fused_mlp.py:fused_mlp_sharded); this wrapper runs
    the kernel per-shard on local rows instead. Attention has no
    cross-batch reduction, so no collectives are needed — each shard's
    backward is self-contained. The dropout counter is offset by the
    shard's global batch*head start, so the mask stream is BIT-IDENTICAL
    to the single-device kernel (asserted in tests)."""
    from semireward_tpu.ops._compat import shard_map_no_check as shard_map
    from semireward_tpu.ops.fused_mlp import batch_shard_axes
    from jax.sharding import PartitionSpec as P

    B, N, H, d = q.shape
    if data_axis is None:
        data_axis = batch_shard_axes(mesh)
    elif isinstance(data_axis, str):
        data_axis = (data_axis,)
    ndev = 1
    for a in data_axis:
        ndev *= mesh.shape[a]
    # tensor-parallel meshes additionally shard the HEAD dim over 'model'
    # (the Megatron split_qkv layout stores q/k/v head-aligned); each
    # shard runs flash on its local heads — attention is head-separable,
    # so no collectives are needed there either
    model_axis = "model" if "model" in mesh.axis_names else None
    nm = mesh.shape[model_axis] if model_axis else 1
    key_bias_ok = bias is None or _key_bias_of(bias, B, H, N) is not None
    Np_pad = ((N + _BQ - 1) // _BQ) * _BQ
    # overflow guard on the GLOBAL counter: the per-shard kernel check sees
    # only local B, but bh_offset makes the counter global
    drop_ok = (float(dropout_rate) == 0.0
               or B * H * Np_pad * Np_pad < 2 ** 32)
    if (ndev == 0 or B % ndev != 0 or H % nm != 0 or not key_bias_ok
            or not drop_ok):
        # trace-time fallback (flax-init sample batches, eval remainders,
        # exotic biases): the XLA einsum path partitions fine under GSPMD
        Np = ((N + _BQ - 1) // _BQ) * _BQ
        thresh = keep_threshold(dropout_rate) if dropout_rate > 0.0 else 0
        return _xla_attention(q, k, v, bias, thresh, 1.0 - dropout_rate,
                              dropout_seed, Np)
    local_B = B // ndev
    local_H = H // nm

    qspec = P(data_axis, None, model_axis, None)
    args = [q, k, v]
    specs = [qspec, qspec, qspec]
    has_bias = bias is not None
    if has_bias:
        args.append(bias)
        specs.append(P(data_axis if bias.shape[0] == B else None,
                       None, None, None))
    drop = float(dropout_rate) > 0.0
    if drop:
        args.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1))
        specs.append(P(None, None))

    def _local(*a):
        ql, kl, vl = a[:3]
        bl = a[3] if has_bias else None
        sl = a[3 + int(has_bias)] if drop else None
        # linearized shard index over the batch axes (row-major in the
        # axis tuple, matching PartitionSpec's product-axis order)
        idx = jnp.int32(0)
        for ax in data_axis:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        # global bh = (b0 + lb) * H + h0 + lh: off carries b0*H + h0, the
        # kernel decomposes its local index with (local_heads, stride=H)
        off = idx * (local_B * H)
        if model_axis:
            off = off + jax.lax.axis_index(model_axis) * local_H
        return flash_attention(ql, kl, vl, bias=bl,
                               dropout_rate=dropout_rate, dropout_seed=sl,
                               bh_offset=off, local_heads=local_H,
                               head_stride=H, interpret=interpret,
                               force=force)

    return shard_map(_local, mesh=mesh, in_specs=tuple(specs),
                     out_specs=qspec)(*args)


def flash_fn(mesh=None):
    """The models' single dispatch point: the plain kernel, or the
    shard_map'd wrapper bound to a pure-dp mesh when one is supplied
    (core/trainer.py passes it as ``fused_mesh``)."""
    if mesh is None:
        return flash_attention
    return functools.partial(flash_attention_sharded, mesh=mesh)
