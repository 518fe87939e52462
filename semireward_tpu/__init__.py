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
from semireward_tpu import imb as _imb  # noqa: E402,F401
from semireward_tpu import models as _models  # noqa: E402,F401
from semireward_tpu.data import datasets as _cv_datasets  # noqa: E402,F401
try:  # modality dataset getters (reference get_dataset name dispatch)
    from semireward_tpu.data.nlp import get_nlp_dataset as _nlp_get
    from semireward_tpu.data.audio import get_audio_dataset as _audio_get

    DATASETS.register(_nlp_get, name="nlp")
    DATASETS.register(_audio_get, name="audio")
    from semireward_tpu.data.bio import get_bio_dataset as _bio_get

    DATASETS.register(_bio_get, name="bio")
except ImportError:  # pragma: no cover
    pass


def get_algorithm(name: str):
    from semireward_tpu import algorithms as _a

    return _a.get_algorithm(name)


def get_net_builder(name: str, from_name: bool = False):
    from semireward_tpu import models as _m

    return _m.get_net_builder(name, from_name)


def get_dataset(cfg, alg: str = "fixmatch"):
    from semireward_tpu.data.datasets import get_dataset as _g

    return _g(cfg, alg)


def split_ssl_data(*a, **kw):
    from semireward_tpu.data.split import split_ssl_data as _s

    return _s(*a, **kw)


def get_data_loader(*a, **kw):
    from semireward_tpu.data.loader import get_data_loader as _g

    return _g(*a, **kw)


def BasicDataset(*a, **kw):  # noqa: N802  (reference class name)
    """Raw-array dataset (the analogue of the reference's BasicDataset,
    datasets/cv_datasets/datasetbase.py:15-115 — per-algorithm view
    construction happens on device in augment_views, not in __getitem__)."""
    from semireward_tpu.data.datasets import ArrayDataset

    return ArrayDataset(*a, **kw)


def Trainer(*a, **kw):  # noqa: N802  (reference lighting API name)
    from semireward_tpu.core.trainer import Trainer as _T

    return _T(*a, **kw)


__all__ = [
    "Config", "from_dict", "from_yaml", "get_config",
    "get_algorithm", "get_net_builder", "get_dataset", "split_ssl_data",
    "get_data_loader", "BasicDataset", "Trainer",
    "ALGORITHMS", "IMB_ALGORITHMS", "NETS", "DATASETS",
]
