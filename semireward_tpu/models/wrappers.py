"""Algorithm-specific net wrappers (extra heads over any backbone).

Rebuild of the reference wrapper Modules: ReMixMatch_Net (rotation head,
remixmatch.py:16-47), CoMatch_Net (l2-normalized projection head,
comatch.py:13-38), SimMatch_Net (projection head, simmatch.py:13-40),
CRMatch_Net (rotation head + feature-map consistency head,
crmatch.py:31-118). Each keeps the backbone under the ``backbone`` scope so
pretrained backbone imports transfer unchanged.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from semireward_tpu.models.initializers import torch_kernel_init, torch_bias_init


def _dense(feats, name):
    return nn.Dense(feats, kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init, param_dtype=jnp.float32,
                    dtype=jnp.float32, name=name)


class RotNet(nn.Module):
    """ReMixMatch wrapper: extra 4-way rotation classifier
    (remixmatch.py:16-32)."""

    backbone: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = True, use_rot: bool = False,
                 only_fc: bool = False, only_feat: bool = False):
        if only_fc or only_feat:
            return self.backbone(x, train=train, only_fc=only_fc,
                                 only_feat=only_feat)
        feat = self.backbone(x, train=train, only_feat=True)
        logits = self.backbone(feat, only_fc=True)
        # head params must exist from init regardless of use_rot, so the
        # rot branch always materializes; XLA DCEs it when unused
        logits_rot = _dense(4, "rot_classifier")(feat)
        if not use_rot:
            return {"logits": logits, "feat": feat}
        return {"logits": logits, "logits_rot": logits_rot, "feat": feat}


def l2norm(x, power: int = 2, eps: float = 0.0):
    norm = jnp.power(jnp.sum(jnp.power(x, power), axis=1, keepdims=True),
                     1.0 / power)
    return x / norm


class ProjectionNet(nn.Module):
    """CoMatch wrapper: 'feat' output becomes the l2-normalized projection
    (comatch.py:30-34)."""

    backbone: nn.Module
    proj_size: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False):
        if only_fc or only_feat:
            return self.backbone(x, train=train, only_fc=only_fc,
                                 only_feat=only_feat)
        feat = self.backbone(x, train=train, only_feat=True)
        logits = self.backbone(feat, only_fc=True)
        h = _dense(feat.shape[-1], "mlp_proj_fc1")(feat)
        h = nn.relu(h)
        h = _dense(self.proj_size, "mlp_proj_fc2")(h)
        return {"logits": logits, "feat": l2norm(h)}


class SimMatchNet(nn.Module):
    """SimMatch wrapper: 'feat' = l2-normalized projection head output
    (simmatch.py:13-40: Linear(nf, nf) -> ReLU -> Linear(nf, proj))."""

    backbone: nn.Module
    proj_size: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False):
        if only_fc or only_feat:
            return self.backbone(x, train=train, only_fc=only_fc,
                                 only_feat=only_feat)
        feat = self.backbone(x, train=train, only_feat=True)
        logits = self.backbone(feat, only_fc=True)
        h = _dense(feat.shape[-1], "mlp_proj_fc1")(feat)
        h = nn.relu(h)
        h = _dense(self.proj_size, "mlp_proj_fc2")(h)
        return {"logits": logits, "feat": l2norm(h)}


class CRMatchNet(nn.Module):
    """CRMatch wrapper: rotation head + feature-level consistency ('logits_ds'
    from a linear over flattened pre-pool features). The reference sizes the
    flatten per backbone (crmatch.py:43-69); here the pooled feature feeds the
    ds head, which preserves the loss structure for any backbone."""

    backbone: nn.Module
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True, targets=None,
                 use_rot: bool = False, only_fc: bool = False,
                 only_feat: bool = False):
        if only_fc or only_feat:
            return self.backbone(x, train=train, only_fc=only_fc,
                                 only_feat=only_feat)
        feat = self.backbone(x, train=train, only_feat=True)
        logits = self.backbone(feat, only_fc=True)
        out = {"logits": logits, "feat": feat}
        out["logits_ds"] = _dense(self.num_classes, "ds_classifier")(feat)
        logits_rot = _dense(4, "rot_classifier")(feat)  # always materialized
        if use_rot:
            out["logits_rot"] = logits_rot
        return out
