"""Model zoo (flax.linen backbones honoring the reference net contract).

Every builder returns a linen Module whose ``__call__(x, train, only_fc,
only_feat)`` mirrors the reference forward contract
(semilearn/nets/__init__.py:4-10, nets/wrn/wrn.py:118-138): full forward
returns ``{'logits','feat'}``; ``only_feat`` returns pooled features;
``only_fc`` maps features to logits.
"""
from __future__ import annotations

from semireward_tpu.registry import NETS

from . import wrn as _wrn
from . import vit as _vit

for _name in ("wrn_28_2", "wrn_28_8", "wrn_var_37_2"):
    NETS.register(getattr(_wrn, _name), name=_name)
for _name in (
    "vit_tiny_patch2_32",
    "vit_small_patch2_32",
    "vit_small_patch16_224",
    "vit_base_patch16_96",
    "vit_base_patch16_224",
):
    NETS.register(getattr(_vit, _name), name=_name)

try:  # optional heavyweight families register lazily
    from . import resnet as _resnet

    NETS.register(_resnet.resnet50, name="resnet50")
except ImportError:  # pragma: no cover
    pass

try:
    from . import dinov2 as _dinov2

    NETS.register(_dinov2.dinov2_vitb14, name="dinov2_vitb14")
    NETS.register(_dinov2.dinov2_vitl14, name="dinov2_vitl14")
except ImportError:  # pragma: no cover
    pass

for _mod, _names in (
    ("bert", ("bert_base_cased", "bert_base_uncased")),
    ("hubert", ("hubert_base",)),
    ("wav2vec2", ("wave2vecv2_base",)),
    ("huggingface", ("dnabert_2_117m", "hf_text_classifier")),
):
    try:
        _m = __import__(f"semireward_tpu.models.{_mod}", fromlist=_names)
        for _n in _names:
            NETS.register(getattr(_m, _n), name=_n)
    except (ImportError, AttributeError):  # pragma: no cover
        pass


def get_net_builder(net_name: str, from_name: bool = False):
    """Name -> builder (reference semilearn/core/utils/build.py:14-39).
    ``from_name`` (torchvision-by-name) has no TPU analogue and raises."""
    if from_name:
        raise ValueError(
            "net_from_name/torchvision models are not part of the TPU build; "
            f"pick one of {sorted(NETS.keys())}"
        )
    return NETS.get(net_name)
