"""WideResNet-28-{2,8} and WRN-Var-37-2 in flax.linen.

TPU-native rebuild of reference semilearn/nets/wrn/{wrn.py,wrn_var.py}:
- BatchNorm torch-momentum 0.001 (flax momentum 0.999), final BN eps 1e-3
- LeakyReLU(0.1)
- conv init kaiming-normal fan_out, classifier init xavier-normal
- forward contract: {'logits','feat'} / only_fc / only_feat
  (reference wrn.py:118-146)

Layout is NHWC (TPU conv-native); channels stay multiples of 8 so XLA tiles
convs straight onto the MXU. Compute runs in ``dtype`` (bf16 by default),
params and BN stats stay float32.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
dense_init = nn.initializers.xavier_normal()

# flax momentum = 1 - torch momentum; reference wrn.py:11 uses 0.001, i.e.
# running stats move VERY slowly (calibrated over ~10k steps). Models accept
# a bn_momentum override for short runs/tests.
_BN_MOM = 0.999


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class BasicBlock(nn.Module):
    out_planes: int
    stride: int
    drop_rate: float = 0.0
    activate_before_residual: bool = False
    dtype: Any = jnp.bfloat16
    bn_momentum: float = _BN_MOM

    @nn.compact
    def __call__(self, x, train: bool):
        in_planes = x.shape[-1]
        equal_in_out = in_planes == self.out_planes

        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        conv = lambda feats, stride, name: nn.Conv(
            feats, (3, 3), strides=(stride, stride), padding=1, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)

        # Branch structure mirrors reference wrn.py:47-56 exactly, including
        # the quirk that for (in!=out, activate_before_residual=False) blocks
        # conv1 consumes the RAW input and the bn1 activation is dead code —
        # only bn1's running stats update from it.
        bn1_out = leaky(bn("bn1")(x))
        if not equal_in_out and self.activate_before_residual:
            conv1_in = bn1_out
            residual_src = bn1_out
        elif equal_in_out:
            conv1_in = bn1_out
            residual_src = x
        else:
            conv1_in = x
            residual_src = x

        out = conv(self.out_planes, self.stride, "conv1")(conv1_in)
        out = leaky(bn("bn2")(out))
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = conv(self.out_planes, 1, "conv2")(out)

        if equal_in_out:
            shortcut = residual_src
        else:
            shortcut = nn.Conv(
                self.out_planes, (1, 1), strides=(self.stride, self.stride),
                padding=0, use_bias=False, kernel_init=conv_init,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="convShortcut")(residual_src)
        return shortcut + out


class NetworkBlock(nn.Module):
    nb_layers: int
    out_planes: int
    stride: int
    drop_rate: float = 0.0
    activate_before_residual: bool = False
    dtype: Any = jnp.bfloat16
    bn_momentum: float = _BN_MOM

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.nb_layers):
            x = BasicBlock(
                self.out_planes,
                self.stride if i == 0 else 1,
                self.drop_rate,
                self.activate_before_residual if i == 0 else False,
                dtype=self.dtype,
                bn_momentum=self.bn_momentum,
                name=f"layer{i}",
            )(x, train)
        return x


class WideResNet(nn.Module):
    """Reference wrn.py:76-157. Input NHWC float."""

    num_classes: int
    first_stride: int = 1
    depth: int = 28
    widen_factor: int = 2
    drop_rate: float = 0.0
    extra_block: bool = False  # WRN-Var (reference wrn_var.py:77-99)
    dtype: Any = jnp.bfloat16
    bn_momentum: float = _BN_MOM

    @property
    def num_features(self) -> int:
        return (128 if self.extra_block else 64) * self.widen_factor

    @nn.compact
    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False):
        classifier = nn.Dense(self.num_classes, kernel_init=dense_init,
                              dtype=jnp.float32, param_dtype=jnp.float32,
                              name="classifier")
        if only_fc:
            return classifier(x)

        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        w = self.widen_factor
        channels = [16, 16 * w, 32 * w, 64 * w] + ([128 * w] if self.extra_block else [])

        x = x.astype(self.dtype)
        out = nn.Conv(channels[0], (3, 3), strides=(1, 1), padding=1,
                      use_bias=True, kernel_init=conv_init, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(x)
        out = NetworkBlock(n, channels[1], self.first_stride, self.drop_rate,
                           activate_before_residual=True, dtype=self.dtype,
                           bn_momentum=self.bn_momentum,
                           name="block1")(out, train)
        out = NetworkBlock(n, channels[2], 2, self.drop_rate, dtype=self.dtype,
                           bn_momentum=self.bn_momentum,
                           name="block2")(out, train)
        out = NetworkBlock(n, channels[3], 2, self.drop_rate, dtype=self.dtype,
                           bn_momentum=self.bn_momentum,
                           name="block3")(out, train)
        if self.extra_block:
            out = NetworkBlock(n, channels[4], 2, self.drop_rate,
                               dtype=self.dtype,
                               bn_momentum=self.bn_momentum,
                               name="block4")(out, train)
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=self.bn_momentum,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32, name="bn1")(out)
        out = leaky(out)
        feat = jnp.mean(out, axis=(1, 2)).astype(jnp.float32)  # global avg pool

        if only_feat:
            return feat
        logits = classifier(feat)
        return {"logits": logits, "feat": feat}


def _layer_id(names: Sequence[str], num_layers: int) -> int:
    """group_matcher equivalent for layer-decay (reference wrn.py:148-150)."""
    if not names:
        return num_layers
    head = names[0]
    if head == "conv1":
        return 0
    if head.startswith("block"):
        return int(head[5:])
    return num_layers  # bn1 / classifier


def wrn_28_2(num_classes: int, dtype=jnp.bfloat16, bn_momentum=_BN_MOM,
             **kw) -> WideResNet:
    return WideResNet(num_classes=num_classes, first_stride=1,
                      depth=kw.get("depth", 28),
                      widen_factor=kw.get("widen_factor", 2),
                      dtype=dtype, bn_momentum=bn_momentum)


def wrn_28_8(num_classes: int, dtype=jnp.bfloat16, bn_momentum=_BN_MOM,
             **kw) -> WideResNet:
    return WideResNet(num_classes=num_classes, first_stride=1,
                      depth=kw.get("depth", 28),
                      widen_factor=kw.get("widen_factor", 8),
                      dtype=dtype, bn_momentum=bn_momentum)


def wrn_var_37_2(num_classes: int, dtype=jnp.bfloat16, bn_momentum=_BN_MOM,
                 **kw) -> WideResNet:
    # reference wrn_var.py:166-170: first_stride=2, depth=28 + extra block
    return WideResNet(num_classes=num_classes, first_stride=2, depth=28,
                      widen_factor=2, extra_block=True, dtype=dtype,
                      bn_momentum=bn_momentum)


for _f in (wrn_28_2, wrn_28_8, wrn_var_37_2):
    _f.layer_id_fn = _layer_id  # type: ignore[attr-defined]
    _f.num_layers = 4  # type: ignore[attr-defined]
