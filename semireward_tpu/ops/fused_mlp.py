"""Pallas fused transformer MLP (fc1 + exact-gelu + fc2) for TPU.

Motivation (NOTES_DEV round-2 trace work): at the headline geometry the
two hottest per-layer fusion patterns are both bound on re-reading the
[B*N, 4C] MLP hidden from HBM (~18.9 MB/layer each way). XLA materializes
the hidden twice (fc1-out write + fc2 read in the forward; again for dW2
and the dgelu chain in the backward). This kernel keeps the hidden in
VMEM for the whole block: ONE pallas launch per direction, grid over row
blocks, full fc1/fc2 weights resident.

Forward:  out = gelu(x @ W1 + b1) @ W2 + b2          (hidden never in HBM)
Backward: recomputes the pre-activation blockwise and accumulates
          dW1/dW2/db1/db2 across sequential grid steps in VMEM.

Numerics: matmuls run on the MXU in bf16 with f32 accumulation; gelu and
bias adds in f32 (the XLA path computes gelu in bf16, so this path is NOT
bit-identical — it is slightly MORE precise; opt-in via the model's
``use_fused_mlp`` and covered by a closeness test, like ``use_flash``).

Reference cost center: semilearn/nets/vit/vit.py:110-120 (timm Mlp);
this file exists for the perf contract (SURVEY §7), not API parity.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/GPU-gated (same pattern as ops/attention.py)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_SQRT_2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — five
    orders below bf16 resolution). ``lax.erf`` has no Pallas TPU (Mosaic)
    lowering; this rational form uses only exp/mul/add, which do."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(u):
    """Exact-form (erf) gelu, f32 (erf itself via ``_erf``)."""
    return 0.5 * u * (1.0 + _erf(u / _SQRT_2))


def _dgelu(u):
    """d/du of exact-form gelu."""
    cdf = 0.5 * (1.0 + _erf(u / _SQRT_2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * u * u)
    return cdf + u * pdf


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]                                        # [bm, C] bf16
    u = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b1_ref[...].astype(jnp.float32)               # [bm, H] f32
    h = _gelu(u).astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _fwd(x, w1, b1, w2, b2, *, block_m, interpret):
    m, c = x.shape
    h = w1.shape[1]
    grid = (pl.cdiv(m, block_m),)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0)),
            pl.BlockSpec((c, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((h, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref, *, m):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]                                        # [bm, C] bf16
    g = g_ref[...]                                        # [bm, C] bf16
    # a partial final block reads padded VMEM garbage — zero those rows so
    # they cannot poison the dW/db accumulators (0 * NaN = NaN otherwise)
    bm = x.shape[0]
    rid = pl.program_id(0) * bm + jax.lax.broadcasted_iota(
        jnp.int32, (bm, 1), 0)
    valid = rid < m
    x = jnp.where(valid, x, jnp.zeros_like(x))
    g = jnp.where(valid, g, jnp.zeros_like(g))
    w1 = w1_ref[...]                                      # [C, H] bf16
    w2 = w2_ref[...]                                      # [H, C] bf16

    # recompute the pre-activation for this block (cheaper than an HBM
    # round-trip of the hidden — the whole point of the fusion)
    u = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b1_ref[...].astype(jnp.float32)               # [bm, H] f32
    h = _gelu(u).astype(x.dtype)                          # [bm, H] bf16

    # dh = (g @ W2^T) * gelu'(u)
    dh = jax.lax.dot_general(g, w2, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = dh * _dgelu(u)                                   # [bm, H] f32
    dh_lp = dh.astype(x.dtype)

    dx_ref[...] = jax.lax.dot_general(
        dh_lp, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    dw1_ref[...] += jax.lax.dot_general(
        x, dh_lp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [C, H]
    dw2_ref[...] += jax.lax.dot_general(
        h, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, C]
    db1_ref[...] += dh.sum(axis=0, keepdims=True)
    db2_ref[...] += g.astype(jnp.float32).sum(axis=0, keepdims=True)


def _bwd(x, w1, b1, w2, g, *, block_m, interpret):
    m, c = x.shape
    h = w1.shape[1]
    grid = (pl.cdiv(m, block_m),)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0)),
            pl.BlockSpec((c, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((h, c), lambda i: (0, 0)),
            pl.BlockSpec((block_m, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0)),
            pl.BlockSpec((c, h), lambda i: (0, 0)),
            pl.BlockSpec((h, c), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x.dtype),        # dx
            jax.ShapeDtypeStruct((c, h), jnp.float32),    # dW1
            jax.ShapeDtypeStruct((h, c), jnp.float32),    # dW2
            jax.ShapeDtypeStruct((1, h), jnp.float32),    # db1
            jax.ShapeDtypeStruct((1, c), jnp.float32),    # db2
        ],
        interpret=interpret,
    )(x, w1, b1, w2, g)


# ---------------------------------------------------------------------------
# hidden-blocked variant (large models: ViT-B / BERT / HuBERT, H = 3072)
#
# The full-resident kernels above keep both weight matrices AND their f32
# grad accumulators in VMEM — ~12 bytes per weight element, fine for ViT-S
# (C*H = 0.6 M) but 28 MB at C=768/H=3072, far past the ~16 MB/core VMEM.
# These variants tile the HIDDEN dim: each grid step sees only a [C, bh]
# slice of W1 / [bh, C] of W2. The hidden activation still never touches
# HBM; the price is that x/g are re-read H/bh times and the backward needs
# two launches (dx accumulates over hidden blocks at fixed rows; dW1/dW2
# accumulate over row blocks at fixed hidden block — opposite grid orders,
# TPU grids are sequential-minor-last, so they cannot share one launch).
# ---------------------------------------------------------------------------

def _fwd_blocked_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                        acc_ref, *, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.broadcast_to(
            b2_ref[...].astype(jnp.float32), acc_ref.shape)

    x = x_ref[...]                                        # [bm, C] bf16
    u = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b1_ref[...].astype(jnp.float32)               # [bm, bh] f32
    h = _gelu(u).astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _fwd_blocked(x, w1, b1, w2, b2, *, block_m, block_h, interpret):
    m, c = x.shape
    h = w1.shape[1]
    nj = h // block_h
    grid = (pl.cdiv(m, block_m), nj)
    return pl.pallas_call(
        functools.partial(_fwd_blocked_kernel, nj=nj),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i, j: (i, 0)),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((block_h, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, c), jnp.float32)],
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _bwd_dx_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref, dx_ref,
                   acc_ref, *, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    g = g_ref[...]
    w1 = w1_ref[...]                                      # [C, bh]
    u = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b1_ref[...].astype(jnp.float32)
    dh = jax.lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = (dh * _dgelu(u)).astype(x.dtype)                 # [bm, bh]
    acc_ref[...] += jax.lax.dot_general(
        dh, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def _bwd_dw_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                   dw1_ref, dw2_ref, db1_ref, db2_ref, *, m):
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    @pl.when((i == 0) & (j == 0))
    def _init_db2():
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    g = g_ref[...]
    # mask padded rows of a partial final row block (see _bwd_kernel)
    bm = x.shape[0]
    rid = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    valid = rid < m
    x = jnp.where(valid, x, jnp.zeros_like(x))
    g = jnp.where(valid, g, jnp.zeros_like(g))

    u = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u + b1_ref[...].astype(jnp.float32)               # [bm, bh]
    h = _gelu(u).astype(x.dtype)
    dh = jax.lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = dh * _dgelu(u)
    dh_lp = dh.astype(x.dtype)

    dw1_ref[...] += jax.lax.dot_general(
        x, dh_lp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [C, bh]
    dw2_ref[...] += jax.lax.dot_general(
        h, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bh, C]
    db1_ref[...] += dh.sum(axis=0, keepdims=True)

    @pl.when(j == 0)  # db2 is hidden-block independent: count rows once
    def _acc_db2():
        db2_ref[...] += g.astype(jnp.float32).sum(axis=0, keepdims=True)


def _bwd_blocked(x, w1, b1, w2, g, *, block_m, dw_block_m, block_h,
                 interpret):
    m, c = x.shape
    h = w1.shape[1]
    nj = h // block_h
    ni = pl.cdiv(m, block_m)
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, nj=nj),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i, j: (i, 0)),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((block_h, c), lambda i, j: (j, 0)),
            pl.BlockSpec((block_m, c), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, c), jnp.float32)],
        interpret=interpret,
    )(x, w1, b1, w2, g)
    # the dW launch holds x/g/u/h/dh row buffers ON TOP of both weight
    # slices and f32 accumulators — at row block 512 / bh=768 its scoped
    # VMEM peaks ~16.75 MB (over the 16 MB stack limit inside a full
    # train-step program, measured on v5e), so it gets its own (smaller)
    # row block; fwd/dx keep the larger one and fetch the weight slices
    # half as often
    ni_dw = pl.cdiv(m, dw_block_m)
    dw1, dw2, db1, db2 = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, m=m),
        grid=(nj, ni_dw),
        in_specs=[
            pl.BlockSpec((dw_block_m, c), lambda j, i: (i, 0)),
            pl.BlockSpec((c, block_h), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_h), lambda j, i: (0, j)),
            pl.BlockSpec((block_h, c), lambda j, i: (j, 0)),
            pl.BlockSpec((dw_block_m, c), lambda j, i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c, block_h), lambda j, i: (0, j)),
            pl.BlockSpec((block_h, c), lambda j, i: (j, 0)),
            pl.BlockSpec((1, block_h), lambda j, i: (0, j)),
            pl.BlockSpec((1, c), lambda j, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, h), jnp.float32),    # dW1
            jax.ShapeDtypeStruct((h, c), jnp.float32),    # dW2
            jax.ShapeDtypeStruct((1, h), jnp.float32),    # db1
            jax.ShapeDtypeStruct((1, c), jnp.float32),    # db2
        ],
        interpret=interpret,
    )(x, w1, b1, w2, g)
    return dx, dw1, dw2, db1, db2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_mlp_blocked(x2d, w1, b1, w2, b2, block_m, dw_block_m, block_h,
                       interpret):
    return _fwd_blocked(x2d, w1, b1, w2, b2, block_m=block_m,
                        block_h=block_h, interpret=interpret)


def _fused_mlp_blocked_fwd(x2d, w1, b1, w2, b2, block_m, dw_block_m,
                           block_h, interpret):
    out = _fwd_blocked(x2d, w1, b1, w2, b2, block_m=block_m,
                       block_h=block_h, interpret=interpret)
    return out, (x2d, w1, b1, w2)


def _fused_mlp_blocked_bwd(block_m, dw_block_m, block_h, interpret, res, g):
    x2d, w1, b1, w2 = res
    dx, dw1, dw2, db1, db2 = _bwd_blocked(
        x2d, w1, b1, w2, g.astype(x2d.dtype),
        block_m=block_m, dw_block_m=dw_block_m, block_h=block_h,
        interpret=interpret)
    return dx, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2


_fused_mlp_blocked.defvjp(_fused_mlp_blocked_fwd, _fused_mlp_blocked_bwd)

# weights + f32 grad accumulators cost 12 bytes/element resident in VMEM;
# past this budget the full-resident kernels overflow ~16 MB/core and the
# hidden-blocked variants take over (ViT-S C*H=0.59M stays full-resident,
# ViT-B / BERT / HuBERT C*H=2.36M go blocked).
_FULL_RESIDENT_BUDGET_BYTES = 8 * 1024 * 1024


def _pick_block_h(c: int, h: int) -> Optional[int]:
    """Largest hidden-block size whose [C, bh] weight slice + f32
    accumulator fit the budget. None if no (8,128)-aligned divisor works."""
    for bh in (1536, 1024, 768, 512, 384, 256, 128):
        if h % bh == 0 and c * bh * 12 <= _FULL_RESIDENT_BUDGET_BYTES:
            return bh
    return None


# scoped-VMEM budget for one dW launch: v5e exposes a 16 MB stack limit to
# the kernel; leave ~3 MB headroom for compiler spills/alignment (the BERT
# C=768/bh=768 geometry measured 16.72 MB at row block 256 — 740 KB over)
_DW_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _pick_dw_block_m(c: int, bh: int, upper: int) -> int:
    """Largest dW row block whose per-block VMEM footprint fits the budget.
    Byte model of _bwd_dw_kernel: double-buffered bf16 x/g row blocks and
    W1/W2 slices, resident f32 dW accumulators, plus the u/h/dh/dh_lp
    intermediates and the padded-row-masked x/g copies."""
    for bm in (256, 128, 64, 32, 16, 8):
        if bm > upper:
            continue
        fixed = 2 * 2 * (c * bh * 2) + 2 * (c * bh * 4)
        var = (2 * 2 * (bm * c * 2)      # x, g (double-buffered)
               + 2 * (bm * c * 2)       # masked copies
               + bm * bh * (4 + 2 + 4 + 2))  # u, h, dh, dh_lp
        if fixed + var <= _DW_VMEM_BUDGET_BYTES:
            return bm
    return 8




@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_mlp(x2d, w1, b1, w2, b2, block_m, interpret):
    return _fwd(x2d, w1, b1, w2, b2, block_m=block_m, interpret=interpret)


def _fused_mlp_fwd(x2d, w1, b1, w2, b2, block_m, interpret):
    out = _fwd(x2d, w1, b1, w2, b2, block_m=block_m, interpret=interpret)
    return out, (x2d, w1, b1, w2)


def _fused_mlp_bwd(block_m, interpret, res, g):
    x2d, w1, b1, w2 = res
    dx, dw1, dw2, db1, db2 = _bwd(x2d, w1, b1, w2,
                                  g.astype(x2d.dtype),
                                  block_m=block_m, interpret=interpret)
    # cotangent dtypes must match the primals: weights arrive as bf16
    # (cast by the caller, like flax Dense's dtype= cast — the f32 master
    # params get their grad through the outer astype's chain rule, same
    # as the XLA path), biases arrive f32.
    return dx, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp(x, w1, b1, w2, b2, *, block_m: int = 512,
              block_h: Optional[int] = None,
              interpret: Optional[bool] = None):
    """gelu-MLP with the hidden kept in VMEM. ``x``: [..., C] (leading dims
    flattened to rows); weights as stored by flax Dense (f32 params are
    cast to the activation dtype for the MXU, like ``nn.Dense(dtype=...)``
    does). Dispatches to the full-resident kernels when weights + grad
    accumulators fit VMEM (ViT-S class), else to the hidden-blocked
    variants (ViT-B / BERT / HuBERT, H=3072); ``block_h`` forces a hidden
    block size. On non-TPU backends the kernel runs in interpret mode
    (slow — for tests)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    lead = x.shape[:-1]
    c = x.shape[-1]
    h = w1.shape[1]
    dt = x.dtype
    x2d = x.reshape(-1, c)
    args = (x2d, w1.astype(dt), b1.astype(jnp.float32).reshape(1, -1),
            w2.astype(dt), b2.astype(jnp.float32).reshape(1, -1))
    if block_h is not None and h % block_h != 0:
        # a non-divisor would silently truncate the hidden dim (the grid
        # floors h // block_h and the last partial block never runs)
        raise ValueError(f"block_h={block_h} must divide hidden dim {h}")
    if block_h is None and c * h * 12 > _FULL_RESIDENT_BUDGET_BYTES:
        block_h = _pick_block_h(c, h)
        if block_h is None:
            # no 128-aligned divisor tiles this hidden dim, and the
            # dispatch just established the full-resident kernels are over
            # budget — keep the XLA two-Dense path instead of overflowing
            # VMEM (matches the models' Dense semantics: bf16 matmuls,
            # exact gelu)
            hid = jax.nn.gelu(x2d @ args[1] + args[2].astype(dt),
                              approximate=False)
            return (hid @ args[3] + args[4].astype(dt)).reshape(*lead, -1)
    if block_h is not None and block_h < h:
        # the dW launch gets a smaller row block (VMEM peak, see
        # _bwd_blocked — sized by the byte model in _pick_dw_block_m);
        # fwd/dx keep block_m
        out = _fused_mlp_blocked(*args, block_m,
                                 _pick_dw_block_m(c, block_h, block_m),
                                 block_h, interpret)
    else:
        out = _fused_mlp(*args, block_m, interpret)
    return out.reshape(*lead, -1)


def batch_shard_axes(mesh) -> tuple:
    """The mesh axes a batch dim shards over for the per-shard pallas
    kernels: every data-like axis present ('data', and 'fsdp' when the mesh
    is the 2-D ZeRO layout). On a data×fsdp mesh this makes the kernel
    (data*fsdp)-way batch-parallel with weights all-gathered into the
    shard_map — exactly FSDP's compute pattern (params live sharded over
    'fsdp' between steps; shard_map's replicated in_spec performs the
    gather, and dW is psum'd back over both axes)."""
    return tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)


def fused_mlp_tp_sharded(x, w1, b1, w2, b2, *, mesh,
                         model_axis: str = "model", block_m: int = 256,
                         interpret: Optional[bool] = None):
    """``fused_mlp`` under ``shard_map`` for tensor-parallel meshes: the
    Megatron layout (parallel/mesh.py:tp_param_sharding) stores fc1
    column-sharded ([C, H] split on H over 'model') and fc2 row-sharded
    ([H, C] split on H), so each model-shard owns a contiguous hidden
    slice — exactly the hidden-blocked structure the kernel already
    exploits, now across chips. Per shard: x @ W1_local -> gelu ->
    @ W2_local is an UNREDUCED partial of the output, psum'd over
    'model' (the standard Megatron all-reduce after the row-parallel
    matmul); b2 is added once after the reduction. The batch dim shards
    over the data-like axes as in :func:`fused_mlp_sharded`. Backward:
    dx psums over 'model' (x is replicated there), dW/db1 stay
    hidden-slice-local and psum over the batch axes, db2 is the row-sum
    of g. A TP shard's [C, H/n_model] weight slice is often small enough
    to return the kernel to its full-resident form (e.g. BERT H=3072
    over 4 shards -> 768)."""
    from semireward_tpu.ops._compat import shard_map_no_check as shard_map
    from jax.sharding import PartitionSpec

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    batch_axes = batch_shard_axes(mesh)
    nb = 1
    for a in batch_axes:
        nb *= mesh.shape[a]
    nm = mesh.shape[model_axis]
    h = w1.shape[1]
    if x.shape[0] % max(nb, 1) != 0 or h % nm != 0 or b1.size != h:
        # trace-time fallback (init sample batches / indivisible hidden):
        # plain dense math partitions under GSPMD
        dt = x.dtype
        hid = jax.nn.gelu(
            x @ w1.astype(dt) + b1.astype(dt), approximate=False)
        return hid @ w2.astype(dt) + b2.astype(dt)

    xspec = PartitionSpec(batch_axes if batch_axes else None,
                          *([None] * (x.ndim - 1)))
    w1spec = PartitionSpec(None, model_axis)
    b1spec = PartitionSpec(model_axis)
    w2spec = PartitionSpec(model_axis, None)
    b2spec = PartitionSpec(None)

    def _local(xl, w1l, b1l, w2l):
        z = jnp.zeros((w2l.shape[1],), jnp.float32)
        return fused_mlp(xl, w1l, b1l, w2l, z, block_m=block_m,
                         interpret=interpret)

    @jax.custom_vjp
    def _sharded(x, w1, b1, w2, b2):
        def _fwd_local(xl, w1l, b1l, w2l, b2l):
            o = jax.lax.psum(_local(xl, w1l, b1l, w2l), model_axis)
            return o + b2l.astype(o.dtype)

        return shard_map(
            _fwd_local, mesh=mesh,
            in_specs=(xspec, w1spec, b1spec, w2spec, b2spec),
            out_specs=xspec)(x, w1, b1, w2, b2)

    def _sharded_fwd(x, w1, b1, w2, b2):
        return _sharded(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)

    def _sharded_bwd(res, g):
        x, w1, b1, w2, b2 = res

        def _local_bwd(xl, w1l, b1l, w2l, gl):
            _, vjp = jax.vjp(
                lambda a, b, c_, d: _local(a, b, c_, d), xl, w1l, b1l, w2l)
            dx, dw1, db1, dw2 = vjp(gl)
            dx = jax.lax.psum(dx, model_axis)     # x replicated over model
            if batch_axes:                        # hidden-slice-local grads
                dw1 = jax.lax.psum(dw1, batch_axes)
                db1 = jax.lax.psum(db1, batch_axes)
                dw2 = jax.lax.psum(dw2, batch_axes)
            db2 = gl.astype(jnp.float32).sum(
                axis=tuple(range(gl.ndim - 1)))
            if batch_axes:
                db2 = jax.lax.psum(db2, batch_axes)
            return dx, dw1, db1, dw2, db2.reshape(b2.shape).astype(b2.dtype)

        return shard_map(
            _local_bwd, mesh=mesh,
            in_specs=(xspec, w1spec, b1spec, w2spec, xspec),
            out_specs=(xspec, w1spec, b1spec, w2spec, b2spec),
        )(x, w1, b1, w2, g)

    _sharded.defvjp(_sharded_fwd, _sharded_bwd)
    return _sharded(x, w1, b1, w2, b2)


def fused_mlp_sharded(x, w1, b1, w2, b2, *, mesh, data_axis=None,
                      block_m: int = 256, block_h: Optional[int] = None,
                      interpret: Optional[bool] = None):
    """``fused_mlp`` under ``shard_map`` for data-parallel meshes: the
    leading (batch) dim of ``x`` shards over ``data_axis`` (a mesh axis
    name or tuple of names; default = every data-like axis in the mesh,
    :func:`batch_shard_axes`), weights are replicated per shard.
    pallas_call has no GSPMD partitioning rule, so under a
    plain pjit a multi-device mesh would all-gather the kernel's operands;
    this wrapper runs the kernel per-shard on local rows instead. On a 2-D
    data×fsdp mesh the batch shards over BOTH axes (FSDP all-gathers
    params and computes batch-parallel; the weight gather happens at the
    shard_map boundary). The backward psums dW/db over the batch axes
    inside the shard_map (the mechanical transpose of a replicated input
    is an unreduced per-shard partial; ``check_rep=False`` is required
    because pallas defeats the replication checker, so the reduction must
    be explicit)."""
    from semireward_tpu.ops._compat import shard_map_no_check as shard_map
    from jax.sharding import PartitionSpec

    if "model" in mesh.axis_names:
        # tensor-parallel mesh: Megatron hidden-sharded kernel form
        return fused_mlp_tp_sharded(x, w1, b1, w2, b2, mesh=mesh,
                                    block_m=block_m, interpret=interpret)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if data_axis is None:
        data_axis = batch_shard_axes(mesh)
    elif isinstance(data_axis, str):
        data_axis = (data_axis,)
    ndev = 1
    for a in data_axis:
        ndev *= mesh.shape[a]
    # block_h passes through unresolved: the inner fused_mlp derives the
    # identical value from the replicated weight shapes
    if ndev == 0 or x.shape[0] % ndev != 0:
        # trace-time fallback: flax init runs a 2-row sample batch, and odd
        # eval remainders can't shard evenly — run the plain kernel there
        # (GSPMD gathers its operands; fine off the hot path)
        return fused_mlp(x, w1, b1, w2, b2, block_m=block_m,
                         block_h=block_h, interpret=interpret)
    xspec = PartitionSpec(data_axis, *([None] * (x.ndim - 1)))
    wspec = PartitionSpec(None, None)
    bspec = PartitionSpec(None)

    def _local(xl, w1l, b1l, w2l, b2l):
        return fused_mlp(xl, w1l, b1l, w2l, b2l, block_m=block_m,
                         block_h=block_h, interpret=interpret)

    @jax.custom_vjp
    def _sharded(x, w1, b1, w2, b2):
        return shard_map(_local, mesh=mesh,
                         in_specs=(xspec, wspec, bspec, wspec, bspec),
                         out_specs=xspec)(x, w1, b1, w2, b2)

    def _sharded_fwd(x, w1, b1, w2, b2):
        return _sharded(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)

    def _sharded_bwd(res, g):
        x, w1, b1, w2, b2 = res

        def _local_bwd(xl, w1l, b1l, w2l, b2l, gl):
            _, vjp = jax.vjp(
                lambda a, b, c_, d, e: _local(a, b, c_, d, e), xl, w1l, b1l,
                w2l, b2l)
            dx, dw1, db1, dw2, db2 = vjp(gl)
            # replicated-weight cotangents: reduce the per-shard partials
            # over every batch axis (data, and fsdp on the 2-D layout)
            dw1 = jax.lax.psum(dw1, data_axis)
            db1 = jax.lax.psum(db1, data_axis)
            dw2 = jax.lax.psum(dw2, data_axis)
            db2 = jax.lax.psum(db2, data_axis)
            return dx, dw1, db1, dw2, db2

        return shard_map(
            _local_bwd, mesh=mesh,
            in_specs=(xspec, wspec, bspec, wspec, bspec, xspec),
            out_specs=(xspec, wspec, bspec, wspec, bspec),
        )(x, w1, b1, w2, b2, g)

    _sharded.defvjp(_sharded_fwd, _sharded_bwd)
    return _sharded(x, w1, b1, w2, b2)


def fused_mlp_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
