"""Imbalanced-SSL wrapper infrastructure.

The reference composes an imb algorithm with any base algorithm by dynamic
multiple inheritance — ``class DummyClass(imb_alg, base_alg)``
(semilearn/imb_algorithms/__init__.py:14-19); the imb class overrides the
base's losses / masking / compute_prob / model and appends auxiliary losses.

Functional equivalent: :class:`ImbAlgorithm` *wraps* a base
:class:`Algorithm` instance. Its pytree state is ``(base_state, imb_state)``;
during ``loss()`` it temporarily installs overrides (ce_loss /
consistency_loss / compute_prob / fixed_mask) on the base instance — pure
functions of traced values, installed per trace — calls the base loss, and
appends its own terms via ``post_loss``. Host-side epoch work (SAW/ADSH
re-weighting from a full unlabeled eval, DARP is on-device) runs through
``on_epoch_end(trainer)``.
"""
from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


class ImbAlgorithm(Algorithm):
    NAME = "imb_base"
    DEFAULTS: Dict[str, Any] = {}
    # base-algorithm names this imb method supports (None = any); mirrors the
    # reference asserts (adsh.py:32, tras.py:89, debiaspl.py:34)
    SUPPORTED_BASES = None
    UNSUPPORTED_BASES = ()

    def __init__(self, cfg, data_info=None, base_cls=None):
        super().__init__(cfg, data_info)
        assert base_cls is not None, "imb algorithms wrap a base algorithm"
        if self.SUPPORTED_BASES is not None:
            assert cfg.algorithm in self.SUPPORTED_BASES, (
                f"{self.NAME} only supports {self.SUPPORTED_BASES} as base")
        assert cfg.algorithm not in self.UNSUPPORTED_BASES, (
            f"{self.NAME} does not support {cfg.algorithm} as base")
        self.base = base_cls(cfg, data_info)
        self.BATCH_KEYS = tuple(self.base.BATCH_KEYS)
        self.WEAK_ULB_S = getattr(self.base, "WEAK_ULB_S", False)

    # ---- labeled class distribution helpers --------------------------------
    def lb_class_counts(self) -> np.ndarray:
        dist = self.data_info.get("lb_class_dist")
        if dist is None:
            return np.ones(self.cfg.num_classes)
        n = self.data_info.get("lb_dest_len", self.cfg.num_classes)
        return np.asarray(dist) * n

    # ---- composition --------------------------------------------------------
    def wrap_model(self, model):
        return self.base.wrap_model(model)

    def init_state(self):
        return (self.base.init_state(), self.init_imb_state())

    def init_imb_state(self):
        return ()

    @contextlib.contextmanager
    def installed(self, imb_state, ctx):
        """Install per-trace overrides on the base, restore after."""
        saved = {}
        for name in self.override_names():
            saved[name] = getattr(self.base, name)
            setattr(self.base, name, getattr(self, f"imb_{name}"))
        try:
            yield
        finally:
            for name, fn in saved.items():
                setattr(self.base, name, fn)

    def override_names(self):
        return ()

    def loss(self, ctx: StepCtx) -> LossOut:
        base_state, imb_state = ctx.algo_state
        self._imb_state = imb_state  # visible to installed overrides
        self._trace_cell: Dict[str, Any] = {}
        with self.installed(imb_state, ctx):
            out = self.base.loss(ctx._replace(algo_state=base_state))
        out = self.post_loss(out, imb_state, ctx)
        new_imb = self.update_imb_state(imb_state, out, ctx)
        return out._replace(new_algo_state=(out.new_algo_state, new_imb))

    # ---- extension points ---------------------------------------------------
    def post_loss(self, out: LossOut, imb_state, ctx: StepCtx) -> LossOut:
        return out

    def update_imb_state(self, imb_state, out: LossOut, ctx: StepCtx):
        return imb_state

    def on_epoch_end(self, trainer, state):
        """Host-side epoch action; returns (possibly updated) TrainState."""
        return state

    def _add_loss(self, out: LossOut, term, name: str, value) -> LossOut:
        total = out.total_loss + term
        metrics = dict(out.metrics)
        metrics["total_loss"] = total
        metrics[name] = value
        return out._replace(total_loss=total, metrics=metrics)


def predict_ulb_logits(trainer, use_aux: bool = False) -> np.ndarray:
    """Full forward over the unlabeled set with eval transforms — the
    reference's 'eval_ulb' loader (saw.py:52-68, adsh.py:37-55)."""
    from semireward_tpu.data.loader import eval_batches

    ds = trainer.bundle.train_ulb
    outs = []
    for b in eval_batches(ds, trainer.cfg.eval_batch_size):
        logits = np.asarray(trainer._jit_eval(trainer.state, b["x"]))
        outs.append(logits[b["mask"]])
    return np.concatenate(outs)
