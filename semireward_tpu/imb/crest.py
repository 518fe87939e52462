"""CReST / CReST+ (https://arxiv.org/abs/2102.09559).

TPU rebuild of reference semilearn/imb_algorithms/crest/{crest.py,utils.py}:
generational self-training — each generation retrains from scratch on a
labeled set expanded with class-frequency-weighted top-confidence pseudo-
labeled samples from the previous generation (head classes take fewer, tail
classes take more: mu^((C-1-c)/alpha) sampling rates, crest.py:74-101).
CReST+ additionally installs progressive distribution alignment whose target
temperature anneals 1.0 -> dist_align_t across generations
(utils.py:70-87).

The generational loop is a host driver (``train_crest``); the per-step part
(progressive dist-align) runs inside the jitted step via the wrapper's
``maybe_dist_align`` override.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.algorithms import common as C
from semireward_tpu.imb.base import ImbAlgorithm, predict_ulb_logits


@IMB_ALGORITHMS.register("crest")
@IMB_ALGORITHMS.register("crest+")
class CReST(ImbAlgorithm):
    NAME = "crest"
    DEFAULTS = {"crest_num_gens": 6, "crest_dist_align_t": 0.5,
                "crest_pro_dist_align": True, "crest_alpha": 3}
    HOST_DRIVER = "train_crest"  # Trainer delegates to this module fn

    def __init__(self, cfg, data_info=None, base_cls=None, gen: int = 0):
        super().__init__(cfg, data_info, base_cls)
        x = cfg.extra
        self.num_gens = int(x.get("crest_num_gens", 6))
        self.dist_align_t = float(x.get("crest_dist_align_t", 0.5))
        self.pro_dist_align = bool(x.get("crest_pro_dist_align", True))
        self.sampling_alpha = float(x.get("crest_alpha", 3))
        self.gen = gen
        if self.num_gens > 1 and self.pro_dist_align:
            cur = gen / (self.num_gens - 1)
            self.cur_dist_align_t = (1.0 - cur) * 1.0 + cur * self.dist_align_t
        else:
            self.cur_dist_align_t = self.dist_align_t

    def init_imb_state(self):
        if not self.pro_dist_align:
            return ()
        dist = self.data_info.get(
            "lb_class_dist",
            np.full(self.cfg.num_classes, 1 / self.cfg.num_classes))
        state, _ = C.dist_align_ema_init(
            self.cfg.num_classes, p_target=jnp.asarray(dist, jnp.float32))
        return state

    def override_names(self):
        return ("maybe_dist_align",) if self.pro_dist_align else ()

    def imb_maybe_dist_align(self, probs_x_ulb, probs_x_lb=None):
        """ProgressiveDistAlignEMAHook.dist_align (crest/utils.py:75-87)."""
        st = self._trace_cell.get("da_state", self._imb_state)
        m = 0.999
        mean_ulb = probs_x_ulb.mean(axis=0)
        p_model = jnp.where(st.initialized, st.p_model * m + mean_ulb * (1 - m),
                            mean_ulb)
        new = st.replace(p_model=p_model, initialized=jnp.asarray(True))
        self._trace_cell["da_state"] = new
        p_target = st.p_target
        if self.cur_dist_align_t != 1:
            p_target = p_target ** self.cur_dist_align_t
            p_target = p_target / p_target.sum()
        aligned = probs_x_ulb * (p_target + 1e-6) / (p_model + 1e-6)
        return aligned / aligned.sum(axis=-1, keepdims=True)

    def update_imb_state(self, imb_state, out, ctx):
        return self._trace_cell.get("da_state", imb_state)


def crest_split(lb_data, lb_targets, ulb_data, ulb_targets, lb_class_dist,
                pseudo_label_list: Optional[List[np.ndarray]],
                sampling_alpha: float, num_classes: int):
    """reference crest.py:74-101 get_split."""
    if not pseudo_label_list:
        return lb_data, lb_targets
    data_picked, targets_picked = [], []
    sorted_class = np.argsort(lb_class_dist)[::-1]
    imb = lb_class_dist[sorted_class][0] / lb_class_dist[sorted_class[-1]]
    mu = np.power(1.0 / imb, 1 / (num_classes - 1))
    for c in sorted_class:
        num_picked = int(len(pseudo_label_list[c])
                         * np.power(np.power(mu, (num_classes - 1) - c),
                                    1 / sampling_alpha))
        idx = np.asarray(pseudo_label_list[c][:num_picked], np.int64)
        if len(idx) > 0:
            data_picked.append(ulb_data[idx])
            targets_picked.append(np.full(len(idx), c,
                                          dtype=np.asarray(lb_targets).dtype))
    data_picked.append(lb_data)
    targets_picked.append(lb_targets)
    return (np.concatenate(data_picked, 0), np.concatenate(targets_picked, 0))


def train_crest(cfg, logger=None):
    """Generational driver (reference crest.py:168-233 train())."""
    from semireward_tpu.core.trainer import Trainer
    from semireward_tpu.data.datasets import get_dataset, ArrayDataset, SSLDataBundle

    base_cfg = cfg.replace(include_lb_to_ulb=False)
    bundle0 = get_dataset(base_cfg, cfg.algorithm)
    lb_data0 = bundle0.train_lb.data
    lb_tgt0 = bundle0.train_lb.targets
    counts = np.bincount(np.asarray(lb_tgt0, np.int64),
                         minlength=cfg.num_classes).astype(np.float64)
    lb_class_dist = counts / counts.sum()

    num_gens = int(cfg.extra.get("crest_num_gens", 6))
    alpha = float(cfg.extra.get("crest_alpha", 3))
    pseudo_label_list = None
    best = {}
    trainer = None
    for gen in range(num_gens):
        lb_data, lb_tgt = crest_split(
            lb_data0, lb_tgt0, bundle0.train_ulb.data, bundle0.train_ulb.targets,
            lb_class_dist, pseudo_label_list, alpha, cfg.num_classes)
        bundle = SSLDataBundle(
            train_lb=ArrayDataset(lb_data, lb_tgt),
            train_ulb=bundle0.train_ulb, eval=bundle0.eval,
            num_classes=bundle0.num_classes, mean=bundle0.mean,
            std=bundle0.std)
        from semireward_tpu.registry import ALGORITHMS

        def factory(c, data_info, _gen=gen):
            return CReST(c, data_info,
                         base_cls=ALGORITHMS.get(cfg.algorithm), gen=_gen)

        trainer = Trainer(base_cfg, bundle=bundle, logger=logger,
                          alg_factory=factory)
        results = trainer.train()
        best[f"gen_{gen}"] = results

        # pseudo label list from full ulb forward (crest.py:214-228)
        logits = predict_ulb_logits(trainer)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        score, pred = probs.max(-1), probs.argmax(-1)
        pseudo_label_list = []
        for c in range(cfg.num_classes):
            idx = np.where(pred == c)[0]
            pseudo_label_list.append(idx[np.argsort(score[idx])[::-1]])
    return best, trainer
