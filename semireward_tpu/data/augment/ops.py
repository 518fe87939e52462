"""On-device image ops emulating the PIL ops used by the reference's
RandAugment (semilearn/datasets/augmentation/randaugment.py:16-141).

All ops take/return float32 images in [0,255], shape [H,W,C], and round to
integers afterwards to emulate PIL's uint8 quantization between ops. They are
jit/vmap-safe (static shapes, no data-dependent control flow), so the whole
augmentation pipeline fuses into the train step — the reference burns host
CPU in dataloader workers for this (SURVEY §3 hotspot 4).

Geometric convention: PIL's AFFINE transform maps OUTPUT pixel (x,y) to input
(a*x+b*y+c, d*x+e*y+f) with nearest resampling and black fill. Sign
conventions for rotate/shear/translate are distributionally irrelevant here
(the magnitude ranges are symmetric and sampled uniformly).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_clip(x):
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def _luminance(img):
    # PIL convert('L'): ITU-R 601-2, L = (299R + 587G + 114B) / 1000
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (299.0 * r + 587.0 * g + 114.0 * b) / 1000.0


def _blend(degenerate, img, v):
    """PIL ImageEnhance.enhance(v) = blend(degenerate, img, v)."""
    return _round_clip(degenerate + (img - degenerate) * v)


# ---------------------------------------------------------------------------
# color ops
# ---------------------------------------------------------------------------

def autocontrast(img, _v):
    """Per-channel remap of [min,max] -> [0,255] (PIL autocontrast, cutoff=0)."""
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
    out = (img - lo) * scale
    return _round_clip(jnp.where(hi > lo, out, img))


def brightness(img, v):
    return _blend(jnp.zeros_like(img), img, v)


def color(img, v):
    gray = jnp.round(_luminance(img))[..., None]
    return _blend(jnp.broadcast_to(gray, img.shape), img, v)


def contrast(img, v):
    # PIL: degenerate = solid gray at int(mean_of_L + 0.5)
    mean = jnp.floor(jnp.mean(jnp.round(_luminance(img))) + 0.5)
    return _blend(jnp.full_like(img, mean), img, v)


def invert(img, _v):
    return 255.0 - img


def identity(img, _v):
    return img


def equalize(img, _v):
    """PIL ImageOps.equalize, per channel:
    step = (npixels - hist[-1]) // 255;
    lut[i] = (step//2 + cumsum(hist)[:i]) // step  (identity if step == 0).

    Gather/scatter-free: the histogram (a 256-bin scatter) and the LUT
    application (a per-pixel gather) are both expressed as a one-hot
    comparison reduced on the VPU — bincount/gather lower to serialized
    scatter/gather fusions on TPU that measured ~75 ms/step batched over
    the classic_cv geometry (448 images x 3 channels x 3 rounds), while
    the compare+reduce forms fuse and vectorize. Results are identical
    (integer equality on the truncated pixel values).
    """
    bins = jnp.arange(256, dtype=jnp.int32)

    def eq_channel(ch):
        pix = ch.astype(jnp.int32)                      # PIL truncation
        oh = (pix[..., None] == bins)                   # [H,W,256]
        hist = jnp.sum(oh, axis=(0, 1), dtype=jnp.int32)
        step = (jnp.sum(hist) - hist[255]) // 255
        csum = jnp.cumsum(hist)
        excl = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
        lut = (step // 2 + excl) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255)
        out = jnp.sum(oh * lut[None, None, :].astype(jnp.float32), axis=-1)
        return jnp.where(step == 0, ch, out)

    chans = [eq_channel(img[..., c]) for c in range(img.shape[-1])]
    return jnp.stack(chans, axis=-1)


def posterize(img, v):
    """Keep top v bits, v in [4,8] (reference passes float, takes int, min 1)."""
    bits = jnp.clip(v.astype(jnp.int32), 1, 8)
    shift = (8 - bits).astype(jnp.uint8)
    x = img.astype(jnp.uint8)
    return ((x >> shift) << shift).astype(jnp.float32)


def solarize(img, v):
    """Invert all pixels >= threshold (PIL solarize)."""
    return jnp.where(img < v, img, 255.0 - img)


def sharpness(img, v):
    """Blend with SMOOTH-filtered image; PIL leaves the 1px border equal to
    the original in the degenerate image."""
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    # channels as batch, single-channel 3x3 conv, same padding
    x = jnp.moveaxis(img, -1, 0)[:, None]  # [C,1,H,W]
    k = kernel[None, None]                  # [O=1,I=1,3,3]
    sm = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME")
    sm = jnp.moveaxis(sm[:, 0], 0, -1)
    sm = jnp.round(sm)
    H, W = img.shape[0], img.shape[1]
    ri = jnp.arange(H)[:, None, None]
    ci = jnp.arange(W)[None, :, None]
    interior = ((ri > 0) & (ri < H - 1) & (ci > 0) & (ci < W - 1))
    degenerate = jnp.where(interior, sm, img)
    return _blend(degenerate, img, v)


# ---------------------------------------------------------------------------
# geometric ops (one shared nearest-neighbor affine sampler)
# ---------------------------------------------------------------------------

def _affine_nearest(img, a, b, c, d, e, f):
    """out(x,y) = img(a*x+b*y+c, d*x+e*y+f), nearest, black fill.
    Coordinates use PIL's +0.5 pixel-center convention.

    Gather-free: `img[yc, xc]` is a per-pixel gather, which lowers to a
    serialized gather fusion on TPU (~3.7 ms/round batched over the
    classic_cv 448-image strong batch); two separable one-hot contractions
    (rows then columns) select the identical pixels on the MXU/VPU instead
    — multiplying by a one-hot and summing zeros is exact, so results are
    bit-identical."""
    H, W = img.shape[0], img.shape[1]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    xo = xs + 0.5
    yo = ys + 0.5
    xi = a * xo + b * yo + c
    yi = d * xo + e * yo + f
    xn = jnp.floor(xi).astype(jnp.int32)
    yn = jnp.floor(yi).astype(jnp.int32)
    valid = (xn >= 0) & (xn < W) & (yn >= 0) & (yn < H)
    xc = jnp.clip(xn, 0, W - 1)
    yc = jnp.clip(yn, 0, H - 1)
    rsel = (yc[..., None] == jnp.arange(H)).astype(img.dtype)  # [H,W,H]
    csel = (xc[..., None] == jnp.arange(W)).astype(img.dtype)  # [H,W,W]
    tmp = jnp.einsum("yxh,hwc->yxwc", rsel, img)
    out = jnp.einsum("yxw,yxwc->yxc", csel, tmp)
    return jnp.where(valid[..., None], out, 0.0)


def rotate(img, v):
    """PIL img.rotate(v): CCW rotation about the image center, black fill."""
    H, W = img.shape[0], img.shape[1]
    theta = -v * jnp.pi / 180.0
    cx, cy = W / 2.0, H / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    a, b = cos, sin
    d, e = -sin, cos
    c = cx - cos * cx - sin * cy
    f = cy + sin * cx - cos * cy
    return _affine_nearest(img, a, b, c, d, e, f)


def shear_x(img, v):
    return _affine_nearest(img, 1.0, v, 0.0, 0.0, 1.0, 0.0)


def shear_y(img, v):
    return _affine_nearest(img, 1.0, 0.0, 0.0, v, 1.0, 0.0)


def translate_x(img, v):
    W = img.shape[1]
    return _affine_nearest(img, 1.0, 0.0, v * W, 0.0, 1.0, 0.0)


def translate_y(img, v):
    H = img.shape[0]
    return _affine_nearest(img, 1.0, 0.0, 0.0, 0.0, 1.0, v * H)


# ---------------------------------------------------------------------------
# cutout (reference randaugment.py:117-143: fill (125,123,114),
# top-left at U(0,W)-v/2 clamped, size v)
# ---------------------------------------------------------------------------

CUTOUT_COLOR = jnp.array([125.0, 123.0, 114.0])


def cutout_abs(img, v, rng):
    H, W = img.shape[0], img.shape[1]
    kx, ky = jax.random.split(rng)
    x0 = jax.random.uniform(kx, (), minval=0.0, maxval=W)
    y0 = jax.random.uniform(ky, (), minval=0.0, maxval=H)
    x0 = jnp.floor(jnp.maximum(0.0, x0 - v / 2.0))
    y0 = jnp.floor(jnp.maximum(0.0, y0 - v / 2.0))
    x1 = jnp.minimum(W * 1.0, x0 + v)
    y1 = jnp.minimum(H * 1.0, y0 + v)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    # PIL rectangle(x0,y0,x1,y1) fills inclusive of both corners
    inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    return jnp.where(inside[..., None], CUTOUT_COLOR, img)
