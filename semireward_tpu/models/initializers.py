"""Weight initializers matching torch module defaults.

torch nn.Linear / nn.Conv2d default to kaiming_uniform(a=sqrt(5)) for the
kernel — uniform with variance 1/(3*fan_in) — and uniform(+-1/sqrt(fan_in))
for the bias. Flax initializers can't see the layer's fan_in from the bias
shape, so biases init to zero here; every reference use-case either imports
pretrained weights or is insensitive to the bias prior (documented
deviation).
"""
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
torch_bias_init = nn.initializers.zeros


class DenseParams(nn.Module):
    """Registers kernel/bias with nn.Dense's exact names, shapes, inits and
    RNG-fold paths (flax folds the init key by param *path*, so values are
    bit-identical to the Dense this stands in for) — used by the fused-MLP
    paths (ops/fused_mlp.py), which need the raw weights for the pallas
    kernel while keeping the param tree checkpoint-compatible."""

    in_features: int
    features: int
    kernel_init: Callable[..., Any] = torch_kernel_init
    bias_init: Callable[..., Any] = torch_bias_init

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return k, b
