"""SSL algorithm registry.

Importing this package registers every algorithm under its reference name
(the reference eager-imports semilearn/algorithms/* so @ALGORITHMS.register
decorators run, core/__init__.py:6-8).
"""
from __future__ import annotations

from semireward_tpu.registry import ALGORITHMS

from . import base  # noqa: F401
from . import common  # noqa: F401
from . import fixmatch  # noqa: F401
from . import pseudolabel  # noqa: F401
from . import flexmatch  # noqa: F401
from . import freematch  # noqa: F401
from . import softmatch  # noqa: F401
from . import uda  # noqa: F401
from . import pimodel  # noqa: F401
from . import semireward  # noqa: F401

for _optional in ("mixmatch", "vat", "dash", "adamatch", "meanteacher_extra",
                  "remixmatch", "crmatch", "comatch", "simmatch"):
    try:
        __import__(f"semireward_tpu.algorithms.{_optional}")
    except ImportError:
        pass


def get_algorithm(name: str):
    """Name -> algorithm class (reference train.py:394-397 get_algorithm)."""
    return ALGORITHMS.get(name)


name2alg = get_algorithm
