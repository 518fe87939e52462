from semireward_tpu.data.augment.pipeline import (  # noqa: F401
    randaugment, weak_augment, normalize, augment_views, AugmentSpec,
)
