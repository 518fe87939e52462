"""Golden-learning tier: the algorithms must LEARN, not just run.

This distills the reference's correctness contract — reproducing its
benchmark CSVs (results/README.md:3) — into minutes-scale accuracy runs
on the rotation-orbit benchmark (semireward_tpu/validation.py,
data/datasets.py:make_synthetic_orbit): labeled data covers only the
small-angle end of each class's rotation orbit, so the labeled-only
ceiling is STRUCTURAL (~0.75-0.86 across seeds) and SSL gains have real
headroom — the round-2 task saturated at 0.875-0.963 and could only
support `acc > chance` bounds (VERDICT r2 items 1/4).

Tier: ``golden`` — EXCLUDED from the default pytest run (each test trains
1000 steps; ~15 min total on a TPU, hours on one CPU). Run with
``pytest -m golden --override-ini addopts=''``; the per-round evidence
artifact is produced by ``scripts/golden_quality.py`` (QUALITY_r*.json).

Bounds calibrated against the 3-seed sweep in QUALITY_r03{,_seed1,_seed2}
.json / docs/quality.md (TPU v5e): labeled-only 0.783/0.857/0.754; every
family's median gain is +0.09..+0.20; 16 of 17 families gain at EVERY
seed (freematch: -0.084 at seed 2 only); minimum seed-0 gain +0.078
(defixmatch). The margins below are ~half the worst observed gain at the
tested seed, so they hold with room for cross-backend jitter while still
failing on any regression that halves a family's gain.
"""
import pytest

from semireward_tpu.validation import (imb_gain, run_golden,
                                       sr_noise_experiment)

pytestmark = pytest.mark.golden

ITERS = 1000

# shared supervised baseline: fixmatch with the unsup loss zeroed — the
# honest same-label-budget baseline (NOT 'fullysupervised', which sees all
# labels)
_BASELINE = {}


def sup_baseline():
    if "acc" not in _BASELINE:
        _BASELINE["acc"] = run_golden("fixmatch", iters=ITERS,
                                      lambda_u=0.0)["acc"]
    return _BASELINE["acc"]


# every family that trains on unlabeled data, one bound each: beat the
# labeled-only baseline on the same label budget (the core SSL contract).
# Seed-0 calibration gains (QUALITY_r03.json): 0.078 (defixmatch) to
# 0.217; margins are ~half the per-family observed gain.
FAMILY_MARGIN = {
    "fixmatch": 0.10, "flexmatch": 0.10, "freematch": 0.10,
    "softmatch": 0.10, "uda": 0.10, "adamatch": 0.10, "dash": 0.08,
    "pseudolabel": 0.10, "meanteacher": 0.06, "pimodel": 0.06,
    "vat": 0.10, "mixmatch": 0.04, "remixmatch": 0.05, "comatch": 0.10,
    "simmatch": 0.10, "crmatch": 0.10, "defixmatch": 0.03,
}


@pytest.mark.parametrize("algorithm", sorted(FAMILY_MARGIN))
def test_family_beats_labeled_only(algorithm):
    """The core SSL contract, now for EVERY family (VERDICT r2 item 1
    closed the headroom problem that forced the round-2 `acc > 0.55`
    placeholders): with unlabeled data the algorithm must beat the same
    configuration with the unsupervised loss zeroed."""
    ssl = run_golden(algorithm, iters=ITERS, lambda_u=1.0)["acc"]
    sup = sup_baseline()
    assert ssl >= sup + FAMILY_MARGIN[algorithm], (
        f"{algorithm}: ssl={ssl:.3f} vs labeled-only={sup:.3f} "
        f"(3-seed calibration in QUALITY_r03*.json)")


def test_sr_filter_under_uniform_noise():
    """SemiReward under 40% uniform pseudo-label noise (VERDICT r2 item 2,
    stated at the level the evidence supports): the filter must actively
    filter and must not hurt. Observed gains +0.029/+0.043/+0.141 across
    seeds 0/1/2 — positive at every seed but within jitter of the static
    -downweighting control at seed 0 (+0.008), so the bound here is
    no-harm + filtering-is-active; the mechanism-level evidence (per-label
    keep rates, class-conditional probe, DEVIATIONS.md 15c) lives in
    docs/quality.md."""
    out = sr_noise_experiment(noise_frac=0.4, iters=500, start_timing=120)
    assert out["sr_noisy_flexmatch_acc"] >= out["noisy_flexmatch_acc"] - 0.02, out
    # the filter must actually be filtering (not keeping everything):
    # count-weighted mean of the per-label keep rates (observed ~0.2-0.5)
    rates, counts = out["per_label_keep_rate"], out["per_label_count"]
    keep = (sum(r * c for r, c in zip(rates, counts))
            / max(sum(counts), 1))
    assert 0.02 < keep < 0.95, out


@pytest.mark.parametrize("imb_alg,min_gain", [
    # bounds carry a jitter margin below the seed-0 calibration (+0.014 /
    # +0.016 / +0.032, QUALITY_r03.json): the 3-seed table in
    # docs/quality.md shows the gain itself is seed-noisy in both
    # directions (saw -0.030 @s1, +0.238 @s2), so a zero-margin >= 0.0
    # bound would let ordinary cross-backend numeric jitter fail CI with
    # no code regression. The asserted contract is therefore "the wrapper
    # trains, lands near the base (no collapse), and does not HURT by
    # more than jitter" — the positive-gain evidence lives in the
    # multi-seed quality reports, where it belongs.
    ("saw", -0.02),
    ("debiaspl", -0.02),
    ("abc", -0.02),
])
def test_imbalanced_method_vs_base(imb_alg, min_gain):
    """Imbalanced wrappers on a long-tailed split (VERDICT r1 item 2c):
    must train to near the base algorithm's balanced accuracy (0.946 at
    the calibrated seed) without collapse, and not regress it beyond
    jitter."""
    out = imb_gain(imb_alg, gamma=10.0, iters=400)
    assert out["imb_balanced_acc"] > 0.85, out
    assert out["gain"] >= min_gain, out
