"""Golden-learning validation: do the algorithms *learn*, not just run?

The reference's entire correctness contract is reproducing its benchmark
CSVs over hundreds of GPU-hours (results/README.md:3). That is not runnable
in CI, so this module distills the contract into minutes-scale synthetic
checks with loose-but-real accuracy bounds:

- ``ssl_gain``: an SSL algorithm with unlabeled data must beat the SAME
  configuration with the unlabeled loss zeroed (label budget held fixed).
- ``sr_noise_experiment``: the SemiReward headline claim — under injected
  pseudo-label noise, reward filtering recovers accuracy vs the same noisy
  base algorithm, and the trained rewarder scores correct (feature, label)
  pairs above corrupted ones.
- ``imb_gain``: an imbalanced-SSL wrapper must beat its base algorithm's
  balanced accuracy on a long-tailed split.

Used by tests/test_golden_learning.py (tier: golden) and
scripts/golden_quality.py (writes the QUALITY report for the judge).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

GOLDEN_NET_KWARGS = {"depth": 10, "widen_factor": 2}  # tiny WRN, 128 feats


def golden_config(algorithm: str, *, iters: int = 400, labels: int = 8,
                  num_classes: int = 4, seed: int = 0, lambda_u: float = 1.0,
                  imb_algorithm: Optional[str] = None,
                  lb_imb_ratio: float = 1.0, ulb_imb_ratio: float = 1.0,
                  save_dir: str = "/tmp/srt_golden", noise: int = 110,
                  **overrides):
    """The shared small-but-learnable synthetic setup. ``lambda_u=0`` turns
    any algorithm into its labeled-only baseline at the same label budget
    (the honest SSL baseline — 'fullysupervised' would see ALL labels)."""
    from semireward_tpu.config import get_config

    cfg_dict = dict(
        algorithm=algorithm, ulb_loss_ratio=lambda_u,
        net="wrn_28_2", dataset="synthetic",
        num_classes=num_classes, num_labels=labels,
        batch_size=8, uratio=4, eval_batch_size=64, img_size=32,
        num_train_iter=iters, num_eval_iter=iters,
        num_log_iter=max(iters // 2, 1),
        optim="SGD", lr=0.03, ema_m=0.0, p_cutoff=0.95, seed=seed,
        save_dir=save_dir, save_name=f"{algorithm}_{seed}_{lambda_u}",
        imb_algorithm=imb_algorithm or "",
        lb_imb_ratio=lb_imb_ratio, ulb_imb_ratio=ulb_imb_ratio,
        feature_dim=128, mesh_shape=(1,))
    cfg_dict.update(overrides)
    cfg = get_config(cfg_dict)
    # color RandAugment ops would scramble color-defined blob classes
    cfg.extra.update(synthetic_train=2048, synthetic_test=512,
                     bn_momentum=0.9, synthetic_noise=noise,
                     randaug_no_color=True,
                     net_kwargs=dict(GOLDEN_NET_KWARGS),
                     num_wu_iter=64, num_wu_eval_iter=64)
    return cfg


def run_golden(algorithm: str, alg_factory=None, return_trainer=False,
               **kw) -> Dict[str, Any]:
    from semireward_tpu.core.trainer import Trainer

    cfg = golden_config(algorithm, **kw)
    tr = Trainer(cfg, use_mesh=False, alg_factory=alg_factory)
    res = tr.train()
    out = {"acc": res.get("eval/top-1-acc"),
           "balanced_acc": res.get("eval/balanced_acc"),
           "results": res}
    if return_trainer:
        out["trainer"] = tr
    return out


def ssl_gain(algorithm: str, **kw) -> Dict[str, float]:
    """acc(algorithm with ulb) - acc(same config, unsup loss zeroed)."""
    sup = run_golden(algorithm, lambda_u=0.0, **kw)
    ssl = run_golden(algorithm, lambda_u=1.0, **kw)
    return {"algorithm": algorithm, "supervised_acc": sup["acc"],
            "ssl_acc": ssl["acc"], "gain": ssl["acc"] - sup["acc"]}


# ---------------------------------------------------------------------------
# SemiReward under pseudo-label noise
# ---------------------------------------------------------------------------

def make_noisy_flexmatch(noise_frac: float):
    """FlexMatch with a fraction of pseudo-labels deterministically corrupted
    (shifted one class) AFTER generation — batch order is random per step, so
    positional corruption is uniform corruption. The SR wrapper composes over
    it unchanged, scoring the corrupted labels like any pseudo-label."""
    import jax.numpy as jnp
    from semireward_tpu.algorithms.flexmatch import FlexMatch
    from semireward_tpu.algorithms.semireward import (SemiRewardWrapper,
                                                      SR_DEFAULTS)

    class NoisyFlexMatch(FlexMatch):
        NAME = "flexmatch"  # SR wrapper dispatches remask by base NAME

        def gen_ulb_targets(self, logits, use_hard_label=True, T=1.0,
                            softmax=True, label_smoothing=0.0):
            pl = super().gen_ulb_targets(logits, use_hard_label, T, softmax,
                                         label_smoothing)
            n_bad = int(round(pl.shape[0] * noise_frac))
            bad = jnp.arange(pl.shape[0]) < n_bad
            return jnp.where(bad, (pl + 1) % self.cfg.num_classes, pl)

    class SRNoisyFlexMatch(SemiRewardWrapper):
        NAME = "srflexmatch"
        BASE_CLS = NoisyFlexMatch
        DEFAULTS = {**FlexMatch.DEFAULTS, **SR_DEFAULTS}

    return NoisyFlexMatch, SRNoisyFlexMatch


def rewarder_separation(trainer, batch: int = 64, rounds: int = 8,
                        noise_frac: float = 0.5) -> Dict[str, float]:
    """Mechanism probe for the trained rewarder: in MIXED batches (like the
    ones the in-step filter sees — the reward's batch-dim attention
    normalizes per batch, so correct/corrupted pairs must be scored
    together), corrupted (feature, label) pairs should be kept by the
    ``reward >= mean(reward)`` filter less often than correct ones."""
    import jax.numpy as jnp
    import numpy as np
    from semireward_tpu.algorithms.semireward import score_pseudo_labels
    from semireward_tpu.data.augment import normalize

    cfg = trainer.cfg
    ds = trainer.bundle.eval
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    rs = np.random.RandomState(0)
    kept_ok, kept_bad, r_ok, r_bad = [], [], [], []
    for _ in range(rounds):
        idx = rs.choice(len(ds), batch, replace=False)
        x = jnp.asarray(ds.data[idx], jnp.float32) / 255.0
        x = normalize(x, trainer.aug_spec.mean, trainer.aug_spec.std)
        feats = trainer.model.apply(variables, x, train=False)["feat"]
        y = np.asarray(ds.targets[idx], np.int64)
        bad = rs.rand(batch) < noise_frac
        labels = np.where(bad, (y + 1) % cfg.num_classes, y)
        reward, keep = score_pseudo_labels(cfg, trainer.state.sr, feats,
                                           jnp.asarray(labels, jnp.int32))
        reward = np.asarray(reward).squeeze(-1)
        keep = np.asarray(keep)
        kept_ok.append(keep[~bad].mean())
        kept_bad.append(keep[bad].mean())
        r_ok.append(reward[~bad].mean())
        r_bad.append(reward[bad].mean())
    return {"keep_rate_correct": float(np.mean(kept_ok)),
            "keep_rate_corrupted": float(np.mean(kept_bad)),
            "reward_correct": float(np.mean(r_ok)),
            "reward_corrupted": float(np.mean(r_bad))}


def sr_noise_experiment(noise_frac: float = 0.4, iters: int = 500,
                        start_timing: int = 120, seed: int = 0,
                        **kw) -> Dict[str, Any]:
    NoisyFlex, SRNoisyFlex = make_noisy_flexmatch(noise_frac)
    base = run_golden(
        "flexmatch", alg_factory=lambda c, d: NoisyFlex(c, d),
        iters=iters, seed=seed, **kw)
    sr = run_golden(
        "srflexmatch", alg_factory=lambda c, d: SRNoisyFlex(c, d),
        iters=iters, seed=seed, start_timing=start_timing, N_k=10,
        return_trainer=True, **kw)
    sep = rewarder_separation(sr["trainer"])
    return {"noise_frac": noise_frac,
            "noisy_flexmatch_acc": base["acc"],
            "sr_noisy_flexmatch_acc": sr["acc"],
            "sr_gain": sr["acc"] - base["acc"], **sep}


# ---------------------------------------------------------------------------
# Imbalanced tier
# ---------------------------------------------------------------------------

def imb_gain(imb_algorithm: str, base_algorithm: str = "fixmatch",
             gamma: float = 10.0, iters: int = 500, labels: int = 40,
             num_classes: int = 4, **kw) -> Dict[str, float]:
    """balanced_acc(imb_algorithm over base) - balanced_acc(base) on a
    long-tailed synthetic split (both lb and ulb imbalanced by gamma)."""
    # in the imbalanced setting lb/ulb_num_labels are MAX-class counts
    # (reference datasets/utils.py:140-153 make_imbalance_data)
    shared = dict(labels=labels, num_classes=num_classes, iters=iters,
                  lb_imb_ratio=gamma, ulb_imb_ratio=gamma,
                  ulb_num_labels=int(kw.pop("ulb_num_labels", 400)), **kw)
    base = run_golden(base_algorithm, **shared)
    imb = run_golden(base_algorithm, imb_algorithm=imb_algorithm, **shared)
    return {"imb_algorithm": imb_algorithm, "base": base_algorithm,
            "gamma": gamma,
            "base_balanced_acc": base["balanced_acc"],
            "imb_balanced_acc": imb["balanced_acc"],
            "gain": imb["balanced_acc"] - base["balanced_acc"]}
