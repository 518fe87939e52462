"""Imbalanced-SSL algorithm registry (reference semilearn/imb_algorithms/).

Composition with a base algorithm happens via
``get_imb_algorithm(imb_name)(cfg, data_info, base_cls=...)`` — the
functional analogue of the reference's dynamic multiple inheritance
(imb_algorithms/__init__.py:14-19).
"""
from __future__ import annotations

from semireward_tpu.registry import IMB_ALGORITHMS

from . import base  # noqa: F401
from . import saw  # noqa: F401
from . import debiaspl  # noqa: F401
from . import adsh  # noqa: F401
from . import abc  # noqa: F401
from . import tras  # noqa: F401
from . import darp  # noqa: F401

for _optional in ("crest", "cossl", "daso"):
    try:
        __import__(f"semireward_tpu.imb.{_optional}")
    except ImportError:
        pass


def get_imb_algorithm(name: str):
    return IMB_ALGORITHMS.get(name)
