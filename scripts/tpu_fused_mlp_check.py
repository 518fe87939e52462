"""On-chip validation + micro-bench of the fused MLP kernels.

Interpret-mode green does not imply Mosaic green (NOTES_DEV: lax.erf had
no TPU lowering and only the real chip caught it) — this script compiles
and runs both kernel variants on the actual TPU and A/B-times them
against the XLA two-Dense path at their production geometries:

  vit_s:  C=384,  H=1536  (full-resident kernel — the 85.4 steps/s headline)
  bert:   C=768,  H=3072  (hidden-blocked kernels — ViT-B/BERT/HuBERT class)

Run:  python scripts/tpu_fused_mlp_check.py [--rows 6168] [--iters 50]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _ref_mlp(x, w1, b1, w2, b2):
    # matches the model's Dense path: matmuls and the exact gelu all in the
    # activation dtype (bf16), like nn.Dense(dtype=bf16) + nn.gelu.
    # (An f32-gelu variant of this program SIGILLs the XLA TPU compiler at
    # these geometries — upstream bug, reproduced standalone; the bf16 form
    # is also the faithful A/B target.)
    dt = x.dtype
    h = x @ w1.astype(dt) + b1.astype(dt)
    h = jax.nn.gelu(h, approximate=False)
    return h @ w2.astype(dt) + b2.astype(dt)


def _loss(fn, x, args, tgt):
    # full-rank cotangent: a rank-1 broadcast (coef-vector) loss gives XLA a
    # degenerate dW2 pattern that SIGILLs the remote compiler (upstream bug)
    return (fn(x, *args).astype(jnp.float32) * tgt).sum()


def check(name, c, h, rows, iters):
    from semireward_tpu.ops.fused_mlp import fused_mlp

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(rows, c), jnp.bfloat16)
    args = (jnp.asarray(rs.randn(c, h) * 0.03, jnp.float32),
            jnp.asarray(rs.randn(h) * 0.1, jnp.float32),
            jnp.asarray(rs.randn(h, c) * 0.03, jnp.float32),
            jnp.asarray(rs.randn(c) * 0.1, jnp.float32))
    tgt = jnp.asarray(rs.randn(rows, c), jnp.float32)

    grad_f = jax.jit(jax.grad(lambda a: _loss(fused_mlp, x, a, tgt)))
    grad_r = jax.jit(jax.grad(lambda a: _loss(_ref_mlp, x, a, tgt)))
    gf = jax.block_until_ready(grad_f(args))
    gr = jax.block_until_ready(grad_r(args))
    for i, (a, b) in enumerate(zip(gr, gf)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))) / scale
        print(f"[{name}] grad[{i}] rel-err {err:.2e}")
        assert err < 0.03, (name, i, err)

    out_f = jax.block_until_ready(jax.jit(
        lambda: fused_mlp(x, *args))())
    out_r = jax.block_until_ready(jax.jit(
        lambda: _ref_mlp(x, *args))())
    scale = float(jnp.max(jnp.abs(out_r.astype(jnp.float32)))) + 1e-9
    err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                - out_r.astype(jnp.float32)))) / scale
    print(f"[{name}] fwd rel-err {err:.2e}")
    assert err < 0.02, (name, err)

    # A/B timing: fwd+bwd per iteration, min-over-chunks (tunnel jitter)
    def timeit(g):
        jax.block_until_ready(g(args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = g(args)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    t_f, t_r = timeit(grad_f), timeit(grad_r)
    print(f"[{name}] fwd+bwd ms/iter: fused {t_f:.3f}  xla {t_r:.3f}  "
          f"speedup {t_r / t_f:.2f}x")
    return t_f, t_r


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6168)  # 24 x 257 (headline)
    ap.add_argument("--iters", type=int, default=50)
    a = ap.parse_args()
    print("devices:", jax.devices())
    check("vit_s", 384, 1536, a.rows, a.iters)
    check("bert", 768, 3072, a.rows, a.iters)
