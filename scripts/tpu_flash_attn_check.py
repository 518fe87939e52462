"""On-chip validation + micro-bench of the flash-attention kernels.

Interpret-mode green does not imply Mosaic green (NOTES_DEV: lax.erf had
no TPU lowering and only the real chip caught it) — this script compiles
and runs the Pallas attention kernels (ops/attention.py) on the actual
TPU, including the round-3 additions (in-kernel key padding bias +
counter-hash prob dropout), checks fwd/grad closeness against the XLA
einsum path with the IDENTICAL hash mask, and A/B-times fwd+bwd at the
production geometries:

  bert:   B=12 H=12 N=512 d=64  (bench --mode nlp, usb_nlp max_length=512)
  hubert: B=24 H=12 N=199 d=64  (bench --mode audio, 4 s @ 16 kHz)

Run:  python scripts/tpu_flash_attn_check.py [--iters 30]
"""
import argparse
import math
import time

import numpy as np

import jax
import jax.numpy as jnp

from semireward_tpu.ops.attention import (attention_keep_mask,
                                          flash_attention, keep_threshold)

RATE = 0.1
SEED = 1234


def _ref(q, k, v, bias, use_drop):
    B, N, H, d = q.shape
    s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(d)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, -1)
    if use_drop:
        Np = ((N + 127) // 128) * 128
        keep = attention_keep_mask(SEED, B * H, N, Np,
                                   keep_threshold(RATE)).reshape(B, H, N, N)
        p = jnp.where(keep, p / (1.0 - RATE), 0.0)
    return jnp.einsum("bhnm,bmhd->bnhd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def check(name, B, H, N, d, iters, with_bias, with_drop):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.bfloat16)
    tgt = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    if with_bias:
        lens = rs.randint(N // 2, N + 1, size=(B,))
        m = np.arange(N)[None, :] < lens[:, None]
        bias = jnp.asarray(np.where(m, 0.0, -1e9),
                           jnp.float32)[:, None, None, :]
    else:
        bias = None
    fkw = (dict(dropout_rate=RATE, dropout_seed=SEED) if with_drop else {})

    def loss_f(q, k, v):
        return (flash_attention(q, k, v, bias=bias, **fkw
                                ).astype(jnp.float32) * tgt).sum()

    def loss_r(q, k, v):
        return (_ref(q, k, v, bias, with_drop).astype(jnp.float32)
                * tgt).sum()

    grad_f = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))
    grad_r = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))
    gf = jax.block_until_ready(grad_f(q, k, v))
    gr = jax.block_until_ready(grad_r(q, k, v))
    for i, (a, b) in enumerate(zip(gr, gf)):
        scale = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))) / scale
        print(f"[{name}] grad[{'qkv'[i]}] rel-err {err:.2e}")
        assert err < 0.03, (name, i, err)

    out_f = jax.block_until_ready(jax.jit(
        lambda: flash_attention(q, k, v, bias=bias, **fkw))())
    out_r = jax.block_until_ready(jax.jit(
        lambda: _ref(q, k, v, bias, with_drop))())
    scale = float(jnp.max(jnp.abs(out_r.astype(jnp.float32)))) + 1e-9
    err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                - out_r.astype(jnp.float32)))) / scale
    print(f"[{name}] fwd rel-err {err:.2e}")
    assert err < 0.02, (name, err)

    def timeit(g):
        jax.block_until_ready(g(q, k, v))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = g(q, k, v)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    t_f, t_r = timeit(grad_f), timeit(grad_r)
    print(f"[{name}] attn fwd+bwd ms/iter: flash {t_f:.3f}  xla {t_r:.3f}  "
          f"speedup {t_r / t_f:.2f}x")
    return t_f, t_r


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    print("devices:", jax.devices())
    check("bert_plain", 12, 12, 512, 64, a.iters, False, False)
    check("bert_bias", 12, 12, 512, 64, a.iters, True, False)
    check("bert_bias_drop", 12, 12, 512, 64, a.iters, True, True)
    check("hubert_drop", 24, 12, 199, 64, a.iters, False, True)
