"""Batched on-device augmentation pipelines.

Rebuild of the reference's per-sample PIL pipelines
(semilearn/datasets/cv_datasets/cifar.py:34-50, augmentation/randaugment.py:
186-203) as vmapped JAX functions running inside the jitted train step:

- weak  = reflect-pad random crop + horizontal flip
- strong = weak + RandAugment(n=3, continuous magnitudes) + Cutout(<=0.5)
- eval  = plain normalize

Per-sample op selection uses ``lax.switch`` under vmap; XLA evaluates the
(cheap, elementwise/affine) branches and selects — at 32-224px this is noise
next to the backbone, and it removes the host PIL bottleneck entirely.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from semireward_tpu.data.augment import ops


class AugmentSpec(NamedTuple):
    crop_size: int
    crop_pad: int                  # int(crop_size * (1 - crop_ratio))
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    randaug_n: int = 3
    exclude_color: bool = False    # RandAugment no-color variant
    hflip: bool = True
    # full-size JPEG sets (imagenet/food101/semi_aves) decode at
    # src_size = floor(img_size / crop_ratio) and the views mirror the
    # reference transforms (imagenet.py:50-66): weak = RandomCrop(src ->
    # crop) + flip, strong = RandomResizedCropAndInterpolation + flip +
    # RandAugment. 0 = decode at crop_size (the 32/96px reflect-pad path).
    src_size: int = 0


# (op, min_val, max_val) — reference augment_list() randaugment.py:146-162
_FULL_OPS = [
    (ops.autocontrast, 0.0, 1.0),
    (ops.brightness, 0.05, 0.95),
    (ops.color, 0.05, 0.95),
    (ops.contrast, 0.05, 0.95),
    (ops.equalize, 0.0, 1.0),
    (ops.identity, 0.0, 1.0),
    (ops.posterize, 4.0, 8.0),
    (ops.rotate, -30.0, 30.0),
    (ops.sharpness, 0.05, 0.95),
    (ops.shear_x, -0.3, 0.3),
    (ops.shear_y, -0.3, 0.3),
    (ops.solarize, 0.0, 256.0),
    (ops.translate_x, -0.3, 0.3),
    (ops.translate_y, -0.3, 0.3),
]
# reference augment_list_no_color() randaugment.py:164-182
_NO_COLOR_OPS = [
    (ops.brightness, 0.05, 0.95),
    (ops.equalize, 0.0, 1.0),
    (ops.identity, 0.0, 1.0),
    (ops.rotate, -30.0, 30.0),
    (ops.sharpness, 0.05, 0.95),
    (ops.shear_x, -0.3, 0.3),
    (ops.shear_y, -0.3, 0.3),
    (ops.translate_x, -0.3, 0.3),
    (ops.translate_y, -0.3, 0.3),
]


# split the op table: the five geometric ops all reduce to ONE per-sample
# affine resample; the rest are cheap elementwise/histogram ops.
_GEO_NAMES = ("rotate", "shear_x", "shear_y", "translate_x", "translate_y")


def _affine_coeffs(name, v, H, W):
    """Output->input affine (a,b,c,d,e,f) per op (see ops._affine_nearest)."""
    zero = jnp.zeros_like(v)
    one = jnp.ones_like(v)
    if name == "rotate":
        theta = -v * jnp.pi / 180.0
        cx, cy = W / 2.0, H / 2.0
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        return (cos, sin, cx - cos * cx - sin * cy,
                -sin, cos, cy + sin * cx - cos * cy)
    if name == "shear_x":
        return (one, v, zero, zero, one, zero)
    if name == "shear_y":
        return (one, zero, zero, v, one, zero)
    if name == "translate_x":
        return (one, zero, v * W, zero, one, zero)
    if name == "translate_y":
        return (one, zero, zero, zero, one, v * H)
    raise KeyError(name)


def _randaugment_batch(rng, x, n: int, exclude_color: bool):
    """Per-sample random ops WITHOUT per-sample branching: each non-geometric
    op runs batched and a jnp.where chain selects the chosen one; the five
    geometric ops collapse into ONE per-sample affine resample per round
    (coefficients selected arithmetically). This keeps the HLO small — both
    compile time and per-step cost are dominated by gathers, and this form
    has exactly one spatial gather per round."""
    table = _NO_COLOR_OPS if exclude_color else _FULL_OPS
    names = [op.__name__ for op, _, _ in table]
    lo = jnp.array([l for _, l, _ in table], jnp.float32)
    hi = jnp.array([h for _, _, h in table], jnp.float32)
    k = len(table)
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    geo_idx = [i for i, nm in enumerate(names) if nm in _GEO_NAMES]

    for _ in range(n):
        rng, kop, kval = jax.random.split(rng, 3)
        idx = jax.random.randint(kop, (B,), 0, k)
        u = jax.random.uniform(kval, (B,))
        v = lo[idx] + (hi[idx] - lo[idx]) * u

        # elementwise ops: batched compute + select chain
        out = x
        for i, (op, _l, _h) in enumerate(table):
            if names[i] in _GEO_NAMES:
                continue
            cand = jax.vmap(op)(x, v)
            out = jnp.where((idx == i)[:, None, None, None], cand, out)

        if geo_idx:
            # one fused affine: identity coeffs unless this sample drew a
            # geometric op
            a = jnp.ones((B,)); b = jnp.zeros((B,)); c = jnp.zeros((B,))
            d = jnp.zeros((B,)); e = jnp.ones((B,)); f = jnp.zeros((B,))
            for i in geo_idx:
                ca, cb, cc, cd, ce, cf = _affine_coeffs(names[i], v, H, W)
                sel = idx == i
                a = jnp.where(sel, ca, a); b = jnp.where(sel, cb, b)
                c = jnp.where(sel, cc, c); d = jnp.where(sel, cd, d)
                e = jnp.where(sel, ce, e); f = jnp.where(sel, cf, f)
            geo = jax.vmap(ops._affine_nearest)(x, a, b, c, d, e, f)
            is_geo = jnp.isin(idx, jnp.asarray(geo_idx))
            out = jnp.where(is_geo[:, None, None, None], geo, out)
        x = out
    rng, kcv, kcut = jax.random.split(rng, 3)
    cut_v = jax.random.uniform(kcv, (B,)) * 0.5 * W
    cut_keys = jax.random.split(kcut, B)
    x = jax.vmap(ops.cutout_abs)(x, cut_v, cut_keys)
    return x


def _crop_flip_single(rng, img, pad: int, hflip: bool):
    """Per-image reference semantics (reflect-pad, random crop, hflip).
    Kept as the executable spec for the batched fast path below — vmapping
    this (dynamic_slice with per-image starts) lowers to a per-image
    while-loop + dynamic-update-slice chain on TPU, ~47 ms/step at the
    classic_cv geometry (448-image strong batch)."""
    kx, ky, kf = jax.random.split(rng, 3)
    if pad > 0:
        img = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        H = img.shape[0] - 2 * pad + 0  # crop back to original size
        oy = jax.random.randint(ky, (), 0, 2 * pad + 1)
        ox = jax.random.randint(kx, (), 0, 2 * pad + 1)
        img = jax.lax.dynamic_slice(
            img, (oy, ox, 0), (H, img.shape[1] - 2 * pad, img.shape[2]))
    if hflip:
        flip = jax.random.bernoulli(kf, 0.5)
        img = jnp.where(flip, img[:, ::-1, :], img)
    return img


def _crop_flip_batch(rng, x, pad: int, hflip: bool, use_dot: bool = False):
    """Batched reflect-pad random crop + hflip as ONE gather.

    Bit-identical to vmap(_crop_flip_single) — the per-image key derivation
    (split(rng, B) then split(k, 3)) and offset draws are the same; the
    reflect-pad + shifted crop is expressed as index arithmetic
    (padded[p+r] == x[-r] for r<0, x[2(H-1)-r] for r>H-1) and the flip as a
    column-index reversal, so the whole thing compiles to vectorized index
    math + one [B,H,W,C] gather instead of a B-step while loop."""
    B, H, W, C = x.shape
    keys = jax.random.split(rng, B)
    keys3 = jax.vmap(lambda k: jax.random.split(k, 3))(keys)  # [B,3,2]
    kx, ky, kf = keys3[:, 0], keys3[:, 1], keys3[:, 2]
    rows = jnp.broadcast_to(jnp.arange(H)[None, :], (B, H))
    cols = jnp.broadcast_to(jnp.arange(W)[None, :], (B, W))
    if pad > 0:
        oy = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2 * pad + 1))(ky)
        ox = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2 * pad + 1))(kx)
        rows = rows + oy[:, None] - pad
        cols = cols + ox[:, None] - pad
        # numpy-'reflect' (no edge repeat) index folding; pad < H so one
        # reflection suffices
        rows = jnp.where(rows < 0, -rows, rows)
        rows = jnp.where(rows > H - 1, 2 * (H - 1) - rows, rows)
        cols = jnp.where(cols < 0, -cols, cols)
        cols = jnp.where(cols > W - 1, 2 * (W - 1) - cols, cols)
    if hflip:
        flip = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5))(kf)
        cols = jnp.where(flip[:, None], cols[:, ::-1], cols)
    if use_dot:
        return _gather_rc_dot(x, rows, cols)
    gathered = jax.vmap(lambda im, r, c: im[r][:, c])(x, rows, cols)
    return gathered


def _gather_rc_dot(x, rows, cols):
    """``x[b, rows[b,i], cols[b,k], c]`` as two one-hot contractions on the
    MXU instead of one [B,H,W,C] gather. The TPU gather lowering
    materializes a [B,H,W,H,1] pred tensor + select-reduce fusions (the
    round-4 large-mode trace's top entries, ~0.45 ms/view plus pred
    copies); the dot form moves the same permutation onto the systolic
    array. Bit-exact for uint8-valued pixels: every output element is a
    single 1.0*v product (one-hot row), and integers <= 255 are exact in
    bf16, so even the lowest TPU matmul precision reproduces the gather
    bytes (tests/test_augment.py::test_crop_dot_bit_identity)."""
    H, W = x.shape[1], x.shape[2]
    ry = jax.nn.one_hot(rows, H, dtype=x.dtype)  # [B, Ho, H]
    cx = jax.nn.one_hot(cols, W, dtype=x.dtype)  # [B, Wo, W]
    t = jnp.einsum("bij,bjwc->biwc", ry, x)
    return jnp.einsum("bkw,biwc->bikc", cx, t)


def _crop_dot_ok(batch) -> bool:
    """The dot path is only bit-safe when the source pixels are uint8
    (values <= 255 exact under bf16 products); SRT_CROP_DOT=0 opts out."""
    import os as _os

    return (batch.dtype == jnp.uint8
            and _os.environ.get("SRT_CROP_DOT", "1") != "0")


def random_resized_crop(rng, batch, out_size: int,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """On-device RandomResizedCropAndInterpolation (reference
    datasets/augmentation/transforms.py:19-180, timm-derived): sample an
    area/aspect box per image, crop, bilinear-resize to out_size."""
    B, H, W, C = batch.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = H * W * jax.random.uniform(k1, (B,), minval=scale[0],
                                      maxval=scale[1])
    log_ratio = jax.random.uniform(k2, (B,), minval=jnp.log(ratio[0]),
                                   maxval=jnp.log(ratio[1]))
    ar = jnp.exp(log_ratio)
    w = jnp.clip(jnp.sqrt(area * ar).astype(jnp.int32), 1, W)
    h = jnp.clip(jnp.sqrt(area / ar).astype(jnp.int32), 1, H)
    x0 = (jax.random.uniform(k3, (B,)) * (W - w + 1)).astype(jnp.int32)
    y0 = (jax.random.uniform(k4, (B,)) * (H - h + 1)).astype(jnp.int32)

    def crop_resize(im, x0, y0, w, h):
        # gather-based bilinear sample of the box onto the out grid
        ys = y0 + (jnp.arange(out_size) + 0.5) * (h / out_size) - 0.5
        xs = x0 + (jnp.arange(out_size) + 0.5) * (w / out_size) - 0.5
        y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
        x0i = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        fy = (ys - y0i)[:, None, None]
        fx = (xs - x0i)[None, :, None]
        a = im[y0i][:, x0i]
        b = im[y0i][:, x1i]
        c = im[y1i][:, x0i]
        d = im[y1i][:, x1i]
        return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
                + c * fy * (1 - fx) + d * fy * fx)

    return jax.vmap(crop_resize)(batch.astype(jnp.float32), x0, y0, w, h)


def normalize(x, mean: Sequence[float], std: Sequence[float]):
    """ToTensor + Normalize: /255 then (x-mean)/std, NHWC float32."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - m) / s


def _hflip_batch(rng, x):
    B = x.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (B,))
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1], x)


def _crop_from_larger(rng, x, out_size: int, hflip: bool,
                      use_dot: bool = False):
    """RandomCrop from a larger decode (reference imagenet.py:51-53:
    Resize(img/crop_ratio) -> RandomCrop(img) -> HFlip) as one gather —
    offsets in [0, src-out], no padding/reflection."""
    B, H, W, C = x.shape
    keys = jax.random.split(rng, B)
    keys3 = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
    kx, ky, kf = keys3[:, 0], keys3[:, 1], keys3[:, 2]
    oy = jax.vmap(lambda k: jax.random.randint(k, (), 0, H - out_size + 1))(ky)
    ox = jax.vmap(lambda k: jax.random.randint(k, (), 0, W - out_size + 1))(kx)
    rows = jnp.arange(out_size)[None, :] + oy[:, None]
    cols = jnp.arange(out_size)[None, :] + ox[:, None]
    if hflip:
        flip = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5))(kf)
        cols = jnp.where(flip[:, None], cols[:, ::-1], cols)
    if use_dot:
        return _gather_rc_dot(x, rows, cols)
    return jax.vmap(lambda im, r, c: im[r][:, c])(x, rows, cols)


def weak_augment(rng, batch, spec: AugmentSpec):
    """[B,H,W,C] uint8/float -> normalized float32."""
    ud = _crop_dot_ok(batch)
    x = batch.astype(jnp.float32)
    if spec.src_size > spec.crop_size:
        x = _crop_from_larger(rng, x, spec.crop_size, spec.hflip, use_dot=ud)
    else:
        x = _crop_flip_batch(rng, x, spec.crop_pad, spec.hflip, use_dot=ud)
    return normalize(x, spec.mean, spec.std)


def randaugment(rng, batch, spec: AugmentSpec):
    """Strong view: crop/flip + RandAugment + Cutout, normalized. The
    full-size path (src_size > crop_size) uses RandomResizedCrop like the
    reference strong transform (imagenet.py:58-66); the crop_size path is
    byte-stable with earlier rounds (bit-identity tests)."""
    ud = _crop_dot_ok(batch)
    x = batch.astype(jnp.float32)
    if spec.src_size > spec.crop_size:
        k1, kf, k2 = jax.random.split(rng, 3)
        x = random_resized_crop(k1, x, spec.crop_size)
        if spec.hflip:
            x = _hflip_batch(kf, x)
    else:
        k1, k2 = jax.random.split(rng)
        x = _crop_flip_batch(k1, x, spec.crop_pad, spec.hflip, use_dot=ud)
    x = _randaugment_batch(k2, x, spec.randaug_n, spec.exclude_color)
    return normalize(x, spec.mean, spec.std)


def _rot90_per_sample(x, k):
    """Rotate each image in [B,H,W,C] by k[i]*90 degrees (k in 0..3)."""
    rots = jnp.stack([x, jnp.rot90(x, 1, (1, 2)), jnp.rot90(x, 2, (1, 2)),
                      jnp.rot90(x, 3, (1, 2))], axis=0)  # [4,B,H,W,C]
    return jnp.take_along_axis(
        rots, k[None, :, None, None, None], axis=0)[0]


def augment_views(rng, raw_lb, raw_ulb, spec: AugmentSpec,
                  keys: Sequence[str], weak_ulb_s: bool = False):
    """Produce the view dict an algorithm's BATCH_KEYS asks for, from raw
    uint8 batches. Mirrors the per-algorithm __getitem__ contract of the
    reference BasicDataset (cv_datasets/datasetbase.py:72-111):
    - default ulb strong views = RandAugment(+Cutout)
    - ``weak_ulb_s`` (pimodel/meanteacher/mixmatch): x_ulb_s is a SECOND weak
    - remixmatch: x_ulb_s_0_rot = the s_0 view rotated by per-sample rot_v*90
    - crmatch: x_ulb_rot = weak ulb view in all 4 rotations concat, rot_v
      grouped [0...,1...,2...,3...] (crmatch.py:205-212)
    """
    out = {}
    ks = list(jax.random.split(rng, len(keys) + 4))

    def take():
        return ks.pop()

    for key in keys:
        if key == "x_lb":
            out[key] = weak_augment(take(), raw_lb, spec)
        elif key == "x_lb_s":
            out[key] = randaugment(take(), raw_lb, spec)
        elif key == "x_ulb_w" or key == "x_ulb_w_2":
            out[key] = weak_augment(take(), raw_ulb, spec)
        elif key == "x_ulb_s" and weak_ulb_s:
            out[key] = weak_augment(take(), raw_ulb, spec)
        elif key in ("x_ulb_s", "x_ulb_s_0", "x_ulb_s_1"):
            out[key] = randaugment(take(), raw_ulb, spec)

    if "x_ulb_s_0_rot" in keys:  # remixmatch
        B = raw_ulb.shape[0]
        rot_v = jax.random.randint(take(), (B,), 0, 4)
        out["x_ulb_s_0_rot"] = _rot90_per_sample(out["x_ulb_s_0"], rot_v)
        out["rot_v"] = rot_v
    if "x_ulb_rot" in keys:  # crmatch
        B = raw_ulb.shape[0]
        base = weak_augment(take(), raw_ulb, spec)
        out["x_ulb_rot"] = jnp.concatenate(
            [base, jnp.rot90(base, 1, (1, 2)), jnp.rot90(base, 2, (1, 2)),
             jnp.rot90(base, 3, (1, 2))], axis=0)
        out["rot_v"] = jnp.repeat(jnp.arange(4), B)
    return out
