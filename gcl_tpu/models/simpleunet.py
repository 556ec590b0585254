"""Non-residual sparse U-Nets at 3 depths — TPU rebuild of the reference
model/simpleunet.py (SimpleNet :8-149, SimpleNet2 :152-337,
SimpleNet3 :340-541). Registered alternatives; not used by shipped configs.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.kernel_maps import ConvSpec
from ..core.sparse_ops import l2_normalize
from ..core.types import SparseGraph
from .common import SparseConv, get_norm


class _SimpleUNetBase(nn.Module):
    """Shared machinery: `DEPTH` stride-2 encoder convs, mirrored
    transpose-conv decoder with skip concats, k=3 conv1_tr + norm + relu,
    1x1 final with bias."""

    NORM_TYPE = None
    CHANNELS = [None, 32, 64, 128]
    TR_CHANNELS = [None, 32, 32, 64]
    DEPTH = 2  # number of stride-2 downsamples

    in_channels: int = 3
    out_channels: int = 32
    bn_momentum: float = 0.1
    normalize_feature: Optional[bool] = None
    conv1_kernel_size: Optional[int] = None
    D: int = 3
    num_items: int = 64

    @classmethod
    def encoder_strides(cls) -> Tuple[int, ...]:
        return tuple(2 ** i for i in range(cls.DEPTH + 1))  # 1,2,4,...

    @classmethod
    def conv_specs(cls, conv1_kernel_size: int) -> Tuple[ConvSpec, ...]:
        es = cls.encoder_strides()
        specs = [ConvSpec("conv1", 1, 1, conv1_kernel_size, 1)]
        for i in range(1, cls.DEPTH + 1):
            specs.append(ConvSpec(f"conv{i+1}", es[i - 1], es[i], 3, 1))
            specs.append(ConvSpec(f"conv{i+1}_tr", es[i], es[i - 1], 3, 1))
        specs.append(ConvSpec("conv1_tr", 1, 1, 3, 1))
        return tuple(specs)

    @nn.compact
    def __call__(self, graph: SparseGraph, feats: jax.Array,
                 train: bool = False, ones_exact: bool = True,
                 conv1_jitter=None) -> jax.Array:
        CH, TR, D = self.CHANNELS, self.TR_CHANNELS, self.DEPTH
        es = self.encoder_strides()
        mb = {s: (graph.levels[s].mask, graph.levels[s].coords[:, 0])
              for s in es}

        def norm(y, ch, s, name):
            return get_norm(self.NORM_TYPE, ch, self.bn_momentum,
                            self.num_items, name=name)(y, *mb[s], train)

        # encoder
        skips = {}
        out = SparseConv(self.in_channels, CH[1],
                         ConvSpec("conv1", 1, 1, self.conv1_kernel_size, 1),
                         occupancy=True,
                         name="conv1")(feats, graph, ones_exact,
                                       conv1_jitter)
        out = norm(out, CH[1], 1, "norm1")
        skips[0] = out
        out = nn.relu(out)
        for i in range(1, D + 1):
            y = SparseConv(CH[i], CH[i + 1],
                           ConvSpec(f"conv{i+1}", es[i - 1], es[i], 3, 1),
                           name=f"conv{i+1}")(out, graph)
            y = norm(y, CH[i + 1], es[i], f"norm{i+1}")
            skips[i] = y
            out = nn.relu(y)

        # decoder
        in_ch = CH[D + 1]
        for i in range(D, 0, -1):
            y = SparseConv(in_ch, TR[i + 1],
                           ConvSpec(f"conv{i+1}_tr", es[i], es[i - 1], 3, 1),
                           name=f"conv{i+1}_tr")(out, graph)
            y = norm(y, TR[i + 1], es[i - 1], f"norm{i+1}_tr")
            y = nn.relu(y)
            out = jnp.concatenate([y, skips[i - 1]], axis=1)
            in_ch = TR[i + 1] + CH[i]

        out = SparseConv(in_ch, TR[1], ConvSpec("conv1_tr", 1, 1, 3, 1),
                         name="conv1_tr")(out, graph)
        out = norm(out, TR[1], 1, "norm1_tr")
        out = nn.relu(out)
        out = SparseConv(TR[1], self.out_channels,
                         ConvSpec("final", 1, 1, 1, 1), use_bias=True,
                         name="final")(out, graph)
        if self.normalize_feature:
            out = l2_normalize(out)
        return out


class SimpleNet(_SimpleUNetBase):
    pass


class SimpleNetIN(SimpleNet):
    NORM_TYPE = "IN"


class SimpleNetBN(SimpleNet):
    NORM_TYPE = "BN"


class SimpleNetBNE(SimpleNetBN):
    CHANNELS = [None, 16, 32, 32]
    TR_CHANNELS = [None, 16, 16, 32]


class SimpleNetINE(SimpleNetBNE):
    NORM_TYPE = "IN"


class SimpleNet2(_SimpleUNetBase):
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 32, 32, 64, 64]
    DEPTH = 3


class SimpleNetIN2(SimpleNet2):
    NORM_TYPE = "IN"


class SimpleNetBN2(SimpleNet2):
    NORM_TYPE = "BN"


class SimpleNetBN2B(SimpleNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 64, 64, 64, 64]


class SimpleNetBN2C(SimpleNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 32, 64, 64, 128]


class SimpleNetBN2D(SimpleNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 32, 64, 64, 128]


class SimpleNetBN2E(SimpleNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 16, 32, 64, 128]
    TR_CHANNELS = [None, 16, 32, 32, 64]


class SimpleNetIN2E(SimpleNetBN2E):
    NORM_TYPE = "IN"


class SimpleNet3(_SimpleUNetBase):
    CHANNELS = [None, 32, 64, 128, 256, 512]
    TR_CHANNELS = [None, 32, 32, 64, 64, 128]
    DEPTH = 4


class SimpleNetIN3(SimpleNet3):
    NORM_TYPE = "IN"


class SimpleNetBN3(SimpleNet3):
    NORM_TYPE = "BN"


class SimpleNetBN3B(SimpleNet3):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256, 512]
    TR_CHANNELS = [None, 32, 64, 64, 64, 128]


class SimpleNetBN3C(SimpleNet3):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256, 512]
    TR_CHANNELS = [None, 32, 64, 64, 128, 128]


class SimpleNetBN3D(SimpleNet3):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256, 512]
    TR_CHANNELS = [None, 32, 64, 64, 128, 256]


class SimpleNetBN3E(SimpleNet3):
    NORM_TYPE = "BN"
    CHANNELS = [None, 16, 32, 64, 128, 256]
    TR_CHANNELS = [None, 16, 32, 32, 64, 128]
