"""Weight initializers matching torch module defaults.

torch nn.Linear / nn.Conv2d default to kaiming_uniform(a=sqrt(5)) for the
kernel — uniform with variance 1/(3*fan_in) — and uniform(+-1/sqrt(fan_in))
for the bias. Flax initializers can't see the layer's fan_in from the bias
shape, so biases init to zero here; every reference use-case either imports
pretrained weights or is insensitive to the bias prior (documented
deviation).
"""
from flax import linen as nn

torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
torch_bias_init = nn.initializers.zeros
