"""TorchBatchNorm — BatchNorm with torch semantics and decoupled
"which stats normalize" vs "whether running stats update".

The reference's inner adversarial loop runs BN with
``track_running_stats=False`` (normalize by *batch* statistics, running
stats untouched — common/utils.py:114-147).  Flax's ``nn.BatchNorm``
couples the two (batch-stat mode always writes), so this module implements
torch's exact rule:

  * ``use_running_average=True``: normalize by stored running stats.
  * ``use_running_average=False``: normalize by batch stats; update running
    stats ONLY if the 'batch_stats' collection is mutable in this apply
    (torch updates iff ``training and track_running_stats``).
  * running_var is updated with the UNBIASED batch variance while
    normalization uses the biased one (torch parity), with
    ``new = (1 - momentum) * old + momentum * batch`` and momentum=0.1.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

__all__ = ["TorchBatchNorm"]


class TorchBatchNorm(nn.Module):
    momentum: float = 0.1
    epsilon: float = 1e-5
    scale_init: nn.initializers.Initializer = nn.initializers.ones
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", self.scale_init, (features,))
        bias = self.param("bias", self.bias_init, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if self.is_mutable_collection("batch_stats") and \
                    not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        shape = (1,) * (x.ndim - 1) + (features,)
        return (x - mean.reshape(shape)) * (inv * scale).reshape(shape) \
            + bias.reshape(shape)
