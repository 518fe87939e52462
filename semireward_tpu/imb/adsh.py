"""Adsh (https://proceedings.mlr.press/v162/guo22e/guo22e.pdf).

TPU rebuild of reference semilearn/imb_algorithms/adsh/{adsh.py,utils.py}:
per-class adaptive thresholds s_k; masking uses exp(-s[pred]); after every
epoch s is refit from the sorted per-class confidences of a full unlabeled
forward. Only supports FixMatch (adsh.py:32).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.imb.base import ImbAlgorithm, predict_ulb_logits


@IMB_ALGORITHMS.register("adsh")
class Adsh(ImbAlgorithm):
    NAME = "adsh"
    DEFAULTS = {"adsh_tau_1": 0.95}
    SUPPORTED_BASES = ("fixmatch",)

    @property
    def tau_1(self):
        return float(self.cfg.extra.get("adsh_tau_1", 0.95))

    def init_imb_state(self):
        return {"adsh_s": jnp.full((self.cfg.num_classes,), self.tau_1,
                                   jnp.float32)}

    def override_names(self):
        return ("fixed_mask",)

    def imb_fixed_mask(self, probs):
        """adsh/utils.py:12-21: mask = maxprob >= exp(-s[pred])."""
        s = self._imb_state["adsh_s"]
        pred = jnp.argmax(probs, axis=-1)
        return (jnp.max(probs, axis=-1) >= jnp.exp(-s[pred])).astype(
            probs.dtype)

    def on_epoch_end(self, trainer, state):
        """adsh/utils.py:23-46: refit s from sorted per-class confidences."""
        logits = predict_ulb_logits(trainer)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        conf, pred = probs.max(-1), probs.argmax(-1)
        C_ = self.cfg.num_classes
        per_cls = [np.sort(conf[pred == y])[::-1] for y in range(C_)]
        base_state, imb_state = state.algo
        s = np.asarray(imb_state["adsh_s"])
        if len(per_cls[0]) > 0:
            rho = 1.0
            for i in range(len(per_cls[0])):
                if per_cls[0][i] < self.tau_1:
                    break
                rho = i / len(per_cls[0])
            for k in range(C_):
                if len(per_cls[k]) != 0:
                    j = int(len(per_cls[k]) * rho) - 1
                    s[k] = -np.log(per_cls[k][j])
        imb_state = {"adsh_s": jnp.asarray(s, jnp.float32)}
        return state.replace(algo=(base_state, imb_state))
