"""Audio datasets + on-device waveform augmentation.

Rebuild of reference semilearn/datasets/audio_datasets/{pkl_data.py,
datasetbase.py} and collactors/audio_collactor.py:
- pickle-per-split loaders ({train,dev,test}.pkl of (wav, label))
- weak view = random subsample crop to ``max_length_seconds`` (reference
  datasetbase.py:177-230)
- strong view = the reference's sox chain (gain / pitch / speed / reverb,
  datasetbase.py:12-39) re-expressed as vectorized jnp ops: gain is exact;
  speed/pitch are 32-tap Nuttall-windowed-sinc resampling (sox's resampler
  class; sox's filter is longer still — documented residual); reverb is
  sox reverb.c's exact Freeverb structure — combs WITH the HF-damping
  one-pole, sox's reverberance->feedback mapping, Jezar's non-unit
  allpass — solved exactly in the frequency domain (DEVIATIONS.md #18).
- collator pads/crops to the static ``max_length_seconds * sample_rate``
  bucket so jit sees one shape.
"""
from __future__ import annotations

import functools
import os
import pickle
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class AudioDataset:
    waves: List[np.ndarray]
    targets: np.ndarray

    @property
    def data(self):
        return self.waves

    def __len__(self):
        return len(self.waves)


def load_pkl_dataset(data_dir: str, name: str):
    """reference audio_datasets/pkl_data.py."""
    base = os.path.join(data_dir, name)
    out = {}
    for split in ("train", "dev", "test"):
        with open(os.path.join(base, f"{split}.pkl"), "rb") as f:
            d = pickle.load(f)
        waves = [np.asarray(w, np.float32) for w, _ in d]
        ys = np.asarray([y for _, y in d], np.int64)
        out[split] = AudioDataset(waves, ys)
    return out


class AudioCollator:
    """Fixed-bucket batching: random-crop (train) / center-crop (eval) to
    max_length samples, zero-pad shorter clips; emits float32 [B, T]
    (reference audio_collactor.py:45-124 pads to max_length_seconds*sr)."""

    def __init__(self, max_length_seconds: float = 4.0,
                 sample_rate: int = 16000):
        self.T = int(max_length_seconds * sample_rate)

    def __call__(self, waves, rng: Optional[np.random.RandomState] = None):
        starts = np.zeros(len(waves), np.int64)
        if rng is not None:
            for i, w in enumerate(waves):
                if len(w) > self.T:
                    starts[i] = rng.randint(0, len(w) - self.T + 1)
        from semireward_tpu.data import _native
        return _native.crop_pad_f32(waves, starts, self.T)


# ---------------------------------------------------------------------------
# on-device waveform transforms (strong view)
# ---------------------------------------------------------------------------

def _resample_linear(x, rate):
    """Per-sample linear-interp resample of [T] by `rate`, same length out
    (content plays faster for rate>1, zero-padded tail)."""
    T = x.shape[0]
    pos = jnp.arange(T, dtype=jnp.float32) * rate
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = pos - lo.astype(jnp.float32)
    y = x[lo] * (1 - frac) + x[hi] * frac
    return jnp.where(pos < T - 1, y, 0.0)


_SINC_TAPS = 32
# Nuttall continuous-first-derivative window coefficients: value AND
# slope are exactly zero at the edges, sidelobes ~-93 dB — the same
# quality class as Kaiser beta~=10 with three cosines instead of Bessel
# evaluations in the hot path
_NUTTALL = (0.355768, 0.487396, 0.144232, 0.012604)


def _resample_sinc(x, rate):
    """Nuttall-windowed-sinc resample of [T] by `rate` (same length out,
    zero tail) — sox's `rate`/`speed` resampler class (rate.c: long
    windowed-sinc polyphase; sox's filter is still longer, but at 32
    taps / ~-93 dB stopband this is the same quality class vs the former
    16-tap Hann's ~-44 dB, DEVIATIONS.md #18). The kernel cutoff drops
    to 1/rate when rate>1 (reading faster = decimation), which is the
    anti-alias lowpass a linear interpolator lacks. Fully vectorized:
    one [K,T] gather + a weighted reduce — no data-dependent control
    flow, jit/vmap-safe, `rate` may be a traced scalar. Widening 16->32
    taps is near-free on TPU: the banded gather is row-count bound
    (~9 ns/row regardless of width, NOTES_DEV), and taps only widen the
    rows."""
    T = x.shape[0]
    K = _SINC_TAPS
    half = K // 2
    # TPU-friendly source fetch, measured on-chip (v5e): a [K,T] scattered
    # gather runs ~300 ms for [24,64000] batches (gathers are row-count
    # bound at ~9 ns/row on the scalar path and dominated the jitted audio
    # step); fetching instead ONE contiguous (2G+K)-wide window per block
    # of G=16 outputs — a 2-D row gather from a window matrix of static
    # shifted slices — cuts the row count 16x. The window weights are
    # evaluated directly at (source_index - pos): taps outside the true
    # +-half band are masked to EXACTLY zero, so the banded form is the
    # same filter as the per-output form, not an approximation.
    G = 16
    SPAN = 2 * G + K
    nb = -(-T // G)                                          # ceil: cover a
    Tp = nb * G                                              # ragged tail
    pos = jnp.arange(Tp, dtype=jnp.float32) * rate
    t0 = jnp.arange(nb, dtype=jnp.float32) * (G * rate)
    s0 = jnp.floor(t0).astype(jnp.int32) - (half - 1)        # block starts
    xp = jnp.pad(x, (K, SPAN + K + 1))                       # zeros both ends
    L = T + 2 * K + 1
    # Hankel window matrix cols[r, j] = xp[r + j], built with the
    # compiler's own patch extraction. Two prior forms both failed on
    # TPU: stacking SPAN shifted slices materializes [L,1] temps whose
    # unit dim pads to 128 (128x memory -> HBM OOM at SPAN=64), and a
    # broadcast+reshape tile trick lowered to a sequential while loop of
    # dynamic-update-slices (~25 ms/step, TRACE_r05_audio_fast).
    # conv_general_dilated_patches lowers as a convolution — MXU-native,
    # one pass, features-last so the row gather needs no transpose.
    Lq = L + SPAN
    cols = jax.lax.conv_general_dilated_patches(
        xp[None, :Lq, None], filter_shape=(SPAN,), window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))[0]          # [Lq-SPAN+1, SPAN]
    xw = cols[jnp.clip(s0 + K, 0, L - 1)]                    # [nb, SPAN]
    j = jnp.arange(SPAN, dtype=jnp.float32)
    posb = pos.reshape(nb, G)
    off = ((s0[:, None].astype(jnp.float32) + j[None, :])[:, None, :]
           - posb[:, :, None])                               # [nb, G, SPAN]
    cut = jnp.minimum(1.0, 1.0 / rate)
    # Nuttall CFD window, masked to EXACTLY zero outside +-half so the
    # banded form (taps evaluated at window positions beyond the true
    # support) is the same filter as the per-output form, not an
    # approximation (the analytic edge zero is only ~1e-8 in f32)
    u = jnp.clip(off / half, -1.0, 1.0)
    a0, a1, a2, a3 = _NUTTALL
    # Chebyshev form: cos(2t)=2c^2-1, cos(3t)=4c^3-3c with c=cos(pi*u) —
    # ONE cosine + a cubic instead of three (transcendentals dominate
    # this fusion's cost on the VPU: 2x 3.5 ms/step at the audio suite)
    c = jnp.cos(jnp.pi * u)
    win = jnp.where(jnp.abs(off) < half,
                    (a0 - a2) + (a1 - 3 * a3) * c
                    + 2 * a2 * c * c + 4 * a3 * c * c * c,
                    0.0)
    w = cut * jnp.sinc(cut * off) * win
    # renormalize so DC gain is exactly 1 at every fractional phase (the
    # truncated window otherwise ripples by ~1e-3)
    w = w / jnp.sum(w, axis=2, keepdims=True)
    y = jnp.sum(w * xw[:, None, :], axis=2).reshape(-1)
    return jnp.where(pos < T - 1, y, 0.0)[:T]


def strong_augment_wave(rng, batch, exact_reverb: bool = True):
    """Reference WaveformTransforms (audio_datasets/datasetbase.py:12-39):
    draws per sample speed in [0.5, 2.0) (0.5 + 1.5*random()), pitch in
    [-2, 2) CENTS (sox `pitch` takes cents — a near-inaudible <0.2%
    rate factor, faithfully tiny), attenuation int in [-5, 5) dBFS —
    then applies **random.choices(k=2)** of the four sox effects
    {gain -n, pitch, speed, reverb -w} in draw order (with replacement;
    NOT all four), followed by `rate` back to sample_rate.

    On-device per-sample reproduction: two lax.switch slots over the
    four effect kernels. gain -n normalizes the peak to the drawn dBFS;
    pitch is a single resample at the cents factor (sox preserves
    duration; the <=0.12% duration error sits in the zero-padded buffer);
    speed is a single resample (the trailing `rate` restores the sample
    rate, leaving the 1/speed duration change, zero-padded/truncated to
    the fixed buffer); reverb -w (wet-only) is sox reverb.c's EXACT
    filter by default — HF-damping one-pole, sox's reverberance->
    feedback mapping, Jezar's non-unit allpass — via the frequency-
    domain solve (measured +1.3 ms/batch24 on v5e vs the scan path once
    the Hankel build moved to conv patches). ``exact_reverb=False``
    (cfg.extra['audio_exact_reverb']) selects the associative-scan fast
    path (no damping pole), whose residual is BOUNDED by
    tests/test_modalities.py::TestSoxEffectKernels::
    test_fast_reverb_bounded_vs_exact."""
    B, T = batch.shape
    keys = jax.random.split(rng, 5)
    speed = jax.random.uniform(keys[0], (B,), minval=0.5, maxval=2.0)
    pitch_cents = jax.random.uniform(keys[1], (B,), minval=-2.0, maxval=2.0)
    # reference draws int(-5.0 + 10.0*random()) (datasetbase.py) — int()
    # TRUNCATES toward zero, so the support is {-4..4} with 0 at double
    # mass and -5 unreachable; jnp.trunc of the same uniform reproduces
    # that distribution exactly (a randint(-5, 5) floor draw would not)
    atten_db = jnp.trunc(
        jax.random.uniform(keys[2], (B,), minval=-5.0, maxval=5.0))
    choice = jax.random.randint(keys[3], (B, 2), 0, 4)
    reverb = _sox_reverb_wet_exact if exact_reverb else _sox_reverb_wet

    def apply_one(x, c, sp, pc, att):
        # Not lax.switch: under vmap a batched-predicate switch computes
        # EVERY branch and selects — so pitch and speed would each pay
        # their own full sinc resample per slot. Fold them into ONE
        # resample whose rate is selected by the effect id (rate 1.0 for
        # the gain/reverb slots), then select among the three kernels.
        rate = jnp.where(c == 1, 2.0 ** (pc / 1200.0),
                         jnp.where(c == 2, sp, 1.0))
        res = _resample_sinc(x, rate)
        gai = _sox_gain_n(x, sp, pc, att)
        rev = reverb(x, sp, pc, att)
        return jnp.select([c == 0, c == 3], [gai, rev], res)

    def per_sample(x, c2, sp, pc, att):
        x = apply_one(x, c2[0], sp, pc, att)
        return apply_one(x, c2[1], sp, pc, att)

    return jax.vmap(per_sample)(batch, choice, speed, pitch_cents,
                                atten_db)


def _sox_gain_n(x, sp, pc, att):
    """`gain -n <att>`: normalize the peak to att dBFS."""
    peak = jnp.max(jnp.abs(x)) + 1e-9
    return x / peak * (10.0 ** (att / 20.0))


def _sox_pitch(x, sp, pc, att):
    """`pitch <cents>`: shift pitch by 2^(cents/1200). sox preserves
    duration via WSOLA; here a single playback-rate resample applies the
    same spectral shift with a <=0.12% duration error at the drawn +-2
    cents (absorbed by the fixed zero-padded buffer) — a resample-up-
    then-back pair would cancel to the identity and shift nothing
    (DEVIATIONS.md #18)."""
    r = 2.0 ** (pc / 1200.0)
    return _resample_sinc(x, r)


def _sox_speed(x, sp, pc, att):
    """`speed <s>` + trailing `rate`: 1/s duration at the original
    sample rate (fixed buffer: zero-padded / truncated)."""
    return _resample_sinc(x, sp)


# sox `reverb` (reverb.c — the Freeverb structure with sox's own
# parameter mappings): 8 parallel feedback combs, each with a one-pole
# HF-damping lowpass INSIDE the feedback loop, then 4 series Freeverb
# "allpasses" (Jezar's famous non-unit-magnitude form: y = 1.5*b[t-d] -
# x with b = x + 0.5*b[t-d]). Delays quoted at 44.1 kHz, scaled by
# sample rate and room-scale. The reference applies bare `reverb -w`
# (datasetbase.py:30): every parameter at its sox default —
# reverberance 50%, HF-damping 50%, room-scale 100%, wet-gain 0 dB,
# wet-only output. sox's mappings (reverb.c):
#   a = -1/ln(1-0.3); b = 100/(ln(1-0.98)*a + 1)
#   feedback = 1 - exp((reverberance - b)/(a*b))     (= 0.8818 at 50%)
#   damping  = hf_damping/100 * 0.3 + 0.2            (= 0.35  at 50%)
#   scale    = room_scale/100 * 0.9 + 0.1; gain = 0.015 * 10^(wet_dB/20)
_SR = 16000
_COMB_DELAYS_44K = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
_ALLPASS_DELAYS_44K = (225, 341, 441, 556)


def _sox_reverb_constants(reverberance=50.0, hf_damping=50.0,
                          room_scale=100.0, wet_gain_db=0.0):
    import math

    a = -1.0 / math.log(1.0 - 0.3)
    b = 100.0 / (math.log(1.0 - 0.98) * a + 1.0)
    feedback = 1.0 - math.exp((reverberance - b) / (a * b))
    damping = hf_damping / 100.0 * 0.3 + 0.2
    scale = room_scale / 100.0 * 0.9 + 0.1
    gain = 0.015 * 10.0 ** (wet_gain_db / 20.0)
    return feedback, damping, scale, gain


@functools.lru_cache(maxsize=8)
def _reverb_ir_rfft(T: int, sr: int = _SR):
    """(rfft of the length-T wet impulse response, fft length L).

    The reverb is LTI with FIXED coefficients (no per-sample draws), so
    the exact output is one linear convolution: y = (x * h)[:T], which
    needs only h[:T] — computed ONCE per buffer length on the host with
    scipy.lfilter from the exact sox difference equations (comb:
    y[n] = x[n-d] + f*s[n-d], s[n] = damp*s[n-1] + (1-damp)*y[n] i.e.
    H = z^-d (1-damp z^-1) / (1 - damp z^-1 - f(1-damp) z^-d); allpass:
    H = (1.5 z^-d - 1)/(1 - 0.5 z^-d)) — and embedded as an rfft
    constant. L >= 2T-1 makes the circular convolution exactly linear
    for the first T outputs."""
    from scipy.signal import lfilter

    f, damp, scale, gain = _sox_reverb_constants()
    imp = np.zeros(T, np.float64)
    imp[0] = 1.0
    h = np.zeros(T, np.float64)
    for d44 in _COMB_DELAYS_44K:
        d = max(1, int(d44 * scale * sr / 44100.0 + 0.5))
        num = np.zeros(d + 2)
        num[d] = 1.0
        num[d + 1] = -damp
        den = np.zeros(d + 1)
        den[0] = 1.0
        den[1] = -damp
        den[d] += -f * (1.0 - damp)
        h += lfilter(num, den, imp)
    for d44 in _ALLPASS_DELAYS_44K:
        d = max(1, int(d44 * scale * sr / 44100.0 + 0.5))
        num = np.zeros(d + 1)
        num[0] = -1.0
        num[d] = 1.5
        den = np.zeros(d + 1)
        den[0] = 1.0
        den[d] = -0.5
        h = lfilter(num, den, h)
    h *= gain
    L = 1 << max(1, (2 * T - 1)).bit_length()
    return np.fft.rfft(h, L).astype(np.complex64), L


def _sox_reverb_wet_exact(x, sp=None, pc=None, att=None):
    """`reverb -w` (wet-only): EXACT sox reverb via one rfft/irfft pair
    against the precomputed impulse-response spectrum (_reverb_ir_rfft).
    Models everything in reverb.c — the comb HF-damping one-pole, sox's
    reverberance->feedback mapping, Jezar's non-unit allpass — exact to
    f32 rounding. Measured cost (v5e, round 5): XLA lowers the 131k FFT
    to a sequential while loop, ~28 ms/step extra at the usb_audio
    geometry (TRACE_r05_audio), so this is the opt-in
    (cfg.extra['audio_exact_reverb']) and the ORACLE the default fast
    path is bounded against — not the default."""
    T = x.shape[0]
    Hf, L = _reverb_ir_rfft(T)
    y = jnp.fft.irfft(jnp.fft.rfft(x, n=L) * jnp.asarray(Hf), n=L)
    return y[:T].astype(x.dtype)


def _comb_sum(x, coef, d):
    """Exact first-order delayed IIR: y[t] = x[t-d] + coef*y[t-d], i.e.
    y[t] = sum_{k>=1} coef^(k-1) x[t-kd]. Evaluated the TPU way: frame
    the delayed signal into [M, d] rows (rows are exactly one delay
    apart, so the recurrence couples whole rows), then solve the
    length-M linear recurrence with lax.associative_scan — ~2*log2(M)
    fused vector passes instead of a ~40-step sequential lax.scan of
    shifted copies. No truncation: the infinite IIR, exactly."""
    T = x.shape[0]
    z = jnp.pad(x, (d, 0))                       # z[t] = x[t-d]
    M = -(-(T + d) // d)
    Z = jnp.pad(z, (0, M * d - (T + d))).reshape(M, d)
    A = jnp.full((M, 1), jnp.asarray(coef, x.dtype))

    def combine(left, right):
        al, bl = left
        ar, br = right
        return al * ar, br + ar * bl

    _, Y = jax.lax.associative_scan(combine, (A, Z), axis=0)
    return Y.reshape(-1)[:T]


def _sox_reverb_wet(x, sp=None, pc=None, att=None):
    """`reverb -w` (wet-only), the fast DEFAULT path: sox's Freeverb
    structure with sox's own parameter mappings — feedback 0.8817 (the
    reverb.c reverberance formula at the default 50%) and the exact sox
    allpass H = (1.5 z^-d - 1)/(1 - 0.5 z^-d), which partial-fractions
    to ``comb_sum(x, 0.5, d) - x`` — solved exactly per filter via the
    frame-blocked associative_scan (_comb_sum, jit/vmap-parallel). The
    ONE approximation vs _sox_reverb_wet_exact is the comb HF-damping
    one-pole (a two-lag recurrence no frame-diagonal scan can express):
    high frequencies ring longer than sox's. The residual is BOUNDED by
    a measured octave-band test against the exact oracle
    (TestSoxEffectKernels::test_fast_reverb_bounded_vs_exact);
    DEVIATIONS.md #18 records the measured bound."""
    f, damp, scale, gain = _sox_reverb_constants()
    xin = gain * x
    out = jnp.zeros_like(x)
    for d44 in _COMB_DELAYS_44K:
        d = max(1, int(d44 * scale * _SR / 44100.0 + 0.5))
        out = out + _comb_sum(xin, f, d)
    for d44 in _ALLPASS_DELAYS_44K:
        d = max(1, int(d44 * scale * _SR / 44100.0 + 0.5))
        out = _comb_sum(out, 0.5, d) - out
    return out


def weak_augment_wave(rng, batch, orig_lens=None):
    """Weak = the random subsample crop already applied by the collator;
    on-device leg is identity (kept for pipeline symmetry)."""
    return batch


def get_audio_dataset(cfg, alg: str = "fixmatch"):
    splits = load_pkl_dataset(cfg.data_dir, cfg.dataset)
    train = splits["train"]
    rng = np.random.RandomState(cfg.seed)
    from semireward_tpu.data.split import sample_labeled_unlabeled_data

    lb_i, ulb_i = sample_labeled_unlabeled_data(
        train.targets, cfg.num_classes, cfg.num_labels,
        ulb_num_labels=cfg.ulb_num_labels, rng=rng)
    if cfg.include_lb_to_ulb:
        ulb_i = np.concatenate([lb_i, ulb_i])

    def sub(ds, idx):
        return AudioDataset([ds.waves[i] for i in idx], ds.targets[idx])

    return {"train_lb": sub(train, lb_i), "train_ulb": sub(train, ulb_i),
            "eval": splits["dev"], "test": splits["test"]}
