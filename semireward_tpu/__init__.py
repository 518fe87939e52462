"""semireward_tpu — TPU-native semi-supervised learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SemiReward
(ICLR 2024) and its underlying USB `semilearn` framework: 21 SSL algorithms
+ SemiReward reward filtering + imbalanced-SSL suite, across CV/NLP/audio
backbones, driven by reference-compatible YAML configs, data-parallel over a
`jax.sharding.Mesh`.

Facade mirrors the reference package surface (semilearn/__init__.py:4-8).
"""
from __future__ import annotations

__version__ = "0.1.0"

from semireward_tpu.config import Config, from_dict, from_yaml, get_config
from semireward_tpu.registry import ALGORITHMS, DATASETS, IMB_ALGORITHMS, NETS

# populate registries (the reference does the same eagerly,
# core/__init__.py:6-8)
from semireward_tpu import algorithms as _algorithms  # noqa: E402,F401
from semireward_tpu import models as _models  # noqa: E402,F401


def get_algorithm(name: str):
    from semireward_tpu import algorithms as _a

    return _a.get_algorithm(name)


def get_net_builder(name: str, from_name: bool = False):
    from semireward_tpu import models as _m

    return _m.get_net_builder(name, from_name)


__all__ = [
    "Config", "from_dict", "from_yaml", "get_config",
    "get_algorithm", "get_net_builder",
    "ALGORITHMS", "IMB_ALGORITHMS", "NETS", "DATASETS",
]
