"""Dense generative MLPs (reference model/mlp.py:6-93) — vestigial
point-upsampling experiment heads; registered for API parity, unused by
the shipped configs. They operate on dense [N, in_channel] features and
predict out_points*3 coordinates (linear -> relu -> batchnorm stacks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class _GenerativeMLPBase(nn.Module):
    CHANNELS = [None, 512, 128, None]

    in_channel: int = 125
    out_points: int = 6
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = [c for c in self.CHANNELS if c is not None]
        for i, ch in enumerate(hidden):
            x = nn.Dense(ch, name=f"dense{i+1}")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=1.0 - self.bn_momentum,
                             name=f"bn{i+1}")(x)
        x = nn.Dense(self.out_points * 3, name="dense_out")(x)
        return nn.relu(x)


class GenerativeMLP(_GenerativeMLPBase):
    CHANNELS = [None, 512, 128, None]


class GenerativeMLP_98(_GenerativeMLPBase):
    CHANNELS = [None, 512, 256, None]


class GenerativeMLP_54(_GenerativeMLPBase):
    CHANNELS = [None, 32, 16, None]


class GenerativeMLP_4(_GenerativeMLPBase):
    CHANNELS = [None, 16, None]


class GenerativeMLP_11_10_9(_GenerativeMLPBase):
    CHANNELS = [None, 2048, 1024, 512, None]
