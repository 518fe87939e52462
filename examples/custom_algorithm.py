#!/usr/bin/env python
"""Custom algorithm example — the reference's Custom_Algorithm.ipynb flow
in the TPU-native API: register a new Algorithm as a pure loss function and
train it through the stock Trainer/jit machinery; then compose SemiReward
over it in one line.

Runs on anything (synthetic data, a few steps).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp

import semireward_tpu as st
from semireward_tpu.algorithms.base import Algorithm
from semireward_tpu.registry import ALGORITHMS


@ALGORITHMS.register("mymatch")
class MyMatch(Algorithm):
    """FixMatch-flavored custom algorithm: hard pseudo-labels over a fixed
    confidence threshold. An algorithm is a PURE function from step context
    to losses — no hooks, no mutable members; persistent statistics live in
    the ``init_state`` pytree threaded through the jitted step."""

    NAME = "mymatch"
    DEFAULTS = {"p_cutoff": 0.9}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def init_state(self):
        return jnp.zeros(())  # no persistent statistics

    def loss(self, ctx):
        fwd = self.forward(ctx)  # concat forward, {'logits','feat'} contract
        sup = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], "mean")
        probs = self.compute_prob(fwd.logits_x_ulb_w)
        mask = self.fixed_mask(probs)
        pl = self.gen_ulb_targets(probs, softmax=False)
        unsup = self.consistency_loss(fwd.logits_x_ulb_s, pl, "ce", mask=mask)
        return self.pack(sup_loss=sup, unsup_loss=unsup, fwd=fwd,
                         new_algo_state=ctx.algo_state, mask=mask,
                         pseudo_label=pl)


def main():
    cfg = st.get_config(dict(
        algorithm="mymatch", net="wrn_28_2", dataset="synthetic",
        num_classes=4, num_labels=16, batch_size=8, uratio=1,
        num_train_iter=8, num_eval_iter=8, num_log_iter=2,
        eval_batch_size=16, img_size=32, optim="SGD", lr=0.03, ema_m=0.0,
        save_dir="./saved_models/examples", save_name="mymatch"))
    res = st.Trainer(cfg).fit()
    print("mymatch:", {k: round(float(v), 4) for k, v in res.items()})

    # SemiReward composes over ANY registered algorithm in one line
    # (the reference hand-copies the protocol into 5 sr* classes)
    from semireward_tpu.algorithms.semireward import _make_sr_variant
    _make_sr_variant("srmymatch", "mymatch")
    cfg2 = st.get_config(dict(
        algorithm="srmymatch", net="wrn_28_2", dataset="synthetic",
        num_classes=4, num_labels=16, batch_size=8, uratio=1,
        num_train_iter=8, num_eval_iter=8, num_log_iter=2,
        eval_batch_size=16, img_size=32, optim="SGD", lr=0.03, ema_m=0.0,
        start_timing=4, N_k=2, feature_dim=128, sr_lr=1e-3,
        save_dir="./saved_models/examples", save_name="srmymatch"))
    res2 = st.Trainer(cfg2).fit()
    print("srmymatch:", {k: round(float(v), 4) for k, v in res2.items()})


if __name__ == "__main__":
    main()
