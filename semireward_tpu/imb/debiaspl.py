"""DebiasPL (CVPR 2022 "Debiased Learning From Naturally Imbalanced
Pseudo-Labels").

TPU rebuild of reference semilearn/imb_algorithms/debiaspl/{debiaspl.py,
utils.py}: the marginal EMA p_hat debiases compute_prob
(logits - tau*log(p_hat)) and re-biases the consistency logits
(+tau*log(p_hat)). The reference's EMA update mixes with ``self.ema_m``
(the MODEL-EMA decay) while scaling the innovation by (1-debiaspl_ema_p)
(debiaspl.py:52-53) — reproduced verbatim.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import consistency_loss as _cons
from semireward_tpu.algorithms import common as C
from semireward_tpu.imb.base import ImbAlgorithm


@IMB_ALGORITHMS.register("debiaspl")
class DebiasPL(ImbAlgorithm):
    NAME = "debiaspl"
    DEFAULTS = {"debiaspl_tau": 0.4, "debiaspl_ema_p": 0.999}
    UNSUPPORTED_BASES = ("mixmatch", "meanteacher", "pimodel")

    @property
    def tau(self):
        return float(self.cfg.extra.get("debiaspl_tau", 0.4))

    @property
    def dbl_ema_p(self):
        return float(self.cfg.extra.get("debiaspl_ema_p", 0.999))

    def init_imb_state(self):
        C_ = self.cfg.num_classes
        return {"p_hat": jnp.ones((C_,), jnp.float32) / C_}

    def override_names(self):
        return ("compute_prob", "consistency_loss")

    def imb_compute_prob(self, logits):
        """debiaspl.py:49-54 — update p_hat THEN debias. Side effect captured
        through the per-trace cell; multiple calls chain EMA updates exactly
        like the reference."""
        probs = C.compute_prob(logits)
        p_hat = self._trace_cell.get("p_hat", self._imb_state["p_hat"])
        p_hat = self.cfg.ema_m * p_hat + (1 - self.dbl_ema_p) * probs.mean(axis=0)
        self._trace_cell["p_hat"] = p_hat
        return C.compute_prob(logits - self.tau * jnp.log(p_hat))

    def imb_consistency_loss(self, logits, targets, name="ce", mask=None,
                             mask2=None):
        p_hat = self._trace_cell.get("p_hat", self._imb_state["p_hat"])
        return _cons(logits + self.tau * jnp.log(p_hat), targets, name, mask,
                     mask2)

    def update_imb_state(self, imb_state, out, ctx):
        return {"p_hat": self._trace_cell.get("p_hat", imb_state["p_hat"])}
