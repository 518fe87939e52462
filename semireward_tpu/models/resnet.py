"""ResNet-50 in flax.linen (reference semilearn/nets/resnet/resnet.py:129-265,
torchvision-style bottleneck v1 with the {'logits','feat'} contract)."""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
_BN_MOM = 0.9  # torch default momentum 0.1


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=_BN_MOM, epsilon=1e-5,
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    name=n)
        conv = lambda f, k, s, n: nn.Conv(
            f, (k, k), strides=(s, s), padding=(k - 1) // 2, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, param_dtype=jnp.float32,
            name=n)
        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2")(out)))
        out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))
        if self.downsample:
            identity = bn("bn_ds")(
                conv(self.planes * 4, 1, self.stride, "conv_ds")(x))
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    num_classes: int
    dtype: Any = jnp.bfloat16
    layers: Sequence[int] = (3, 4, 6, 3)

    @property
    def num_features(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False):
        classifier = nn.Dense(self.num_classes, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="fc")
        if only_fc:
            return classifier(x)
        x = x.astype(self.dtype)
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOM,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        for li, n_blocks in enumerate(self.layers):
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                down = bi == 0
                h = Bottleneck(planes, stride, down, dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(h, train)
            planes *= 2
        feat = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        if only_feat:
            return feat
        return {"logits": classifier(feat), "feat": feat}


def _layer_id(names, num_layers):
    head = names[0] if names else ""
    if head in ("conv1", "bn1"):
        return 0
    if head.startswith("layer"):
        return int(head[5])
    return num_layers


def resnet50(num_classes: int, dtype=jnp.bfloat16, **kw):
    return ResNet50(num_classes=num_classes, dtype=dtype)


resnet50.layer_id_fn = _layer_id
resnet50.num_layers = 5
