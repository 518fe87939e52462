"""SAW (https://proceedings.mlr.press/v162/lai22b.html).

TPU rebuild of reference semilearn/imb_algorithms/saw/{saw.py,utils.py}:
class weights from effective numbers; labeled weights fixed from the data,
unlabeled weights re-estimated after every epoch from pseudo-label counts
over the full unlabeled set. Weighted CE / consistency replace the base's
criterions (saw/utils.py:60-90).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import ce_loss as _ce, consistency_loss as _cons
from semireward_tpu.imb.base import ImbAlgorithm, predict_ulb_logits


def effective_weights(y_cnt: np.ndarray) -> np.ndarray:
    """reference saw/utils.py:14-20."""
    y_cnt = np.asarray(y_cnt, np.float64)
    N = y_cnt.sum() / len(y_cnt)
    beta = (N - 1) / N
    eff = 1.0 - np.power(beta, y_cnt)
    w = (1.0 - beta) / eff
    return w / w.sum() * len(y_cnt)


@IMB_ALGORITHMS.register("saw")
class SAW(ImbAlgorithm):
    NAME = "saw"

    def init_imb_state(self):
        lb_cnt = self.lb_class_counts()
        num_ulb = self.data_info.get("ulb_dest_len", 1)
        ulb_cnt = np.full(self.cfg.num_classes,
                          num_ulb / self.cfg.num_classes)
        return {
            "x_lb_weights": jnp.asarray(effective_weights(lb_cnt), jnp.float32),
            "x_ulb_weights": jnp.asarray(effective_weights(ulb_cnt), jnp.float32),
        }

    def override_names(self):
        return ("ce_loss", "consistency_loss")

    # SAWCELoss (saw/utils.py:60-72): weight by target class, always mean
    def imb_ce_loss(self, logits, targets, reduction="none"):
        loss = _ce(logits, targets, reduction="none")
        t = targets if targets.ndim == 1 else jnp.argmax(targets, axis=-1)
        return (loss * self._imb_state["x_lb_weights"][t]).mean()

    # SAWConsistencyLoss (saw/utils.py:75-90): fold weights into the mask
    def imb_consistency_loss(self, logits, targets, name="ce", mask=None,
                             mask2=None):
        t = targets if targets.ndim == 1 else jnp.argmax(targets, axis=-1)
        w = self._imb_state["x_ulb_weights"][t]
        mask = w if mask is None else mask * w
        return _cons(logits, targets, name, mask, mask2)

    def on_epoch_end(self, trainer, state):
        """after_train_epoch (saw/utils.py:43-57): re-estimate ulb weights
        from pseudo-label counts over the whole unlabeled set."""
        logits = predict_ulb_logits(trainer)
        counts = np.bincount(logits.argmax(-1), minlength=self.cfg.num_classes)
        counts = np.maximum(counts, 1)
        base_state, imb_state = state.algo
        imb_state = dict(imb_state)
        imb_state["x_ulb_weights"] = jnp.asarray(
            effective_weights(counts), jnp.float32)
        return state.replace(algo=(base_state, imb_state))
