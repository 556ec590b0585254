"""Projection heads (reference model/projection_head.py:10-82).
Registered alternatives; unused by the shipped configs.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
from flax import linen as nn

from ..core.kernel_maps import ConvSpec
from ..core.types import SparseGraph
from .common import SparseConv
from .residual_block import BasicBlock


class ProjectionHeadConv(nn.Module):
    in_channels: int = 128
    out_channels: int = 16
    bn_momentum: Optional[float] = None
    normalize_feature: Optional[bool] = None
    conv1_kernel_size: Optional[int] = None
    D: int = 3
    num_items: int = 64

    @classmethod
    def conv_specs(cls, conv1_kernel_size: int) -> Tuple[ConvSpec, ...]:
        return (ConvSpec("conv1", 1, 1, conv1_kernel_size, 1),)

    @nn.compact
    def __call__(self, graph: SparseGraph, feats: jax.Array,
                 train: bool = False, ones_exact: bool = True,
                 conv1_jitter=None) -> jax.Array:
        # no occupancy conv here (the head reads real features), so
        # ones_exact never routes to c1z; a conv1_jitter spec falls
        # through to SparseConv's reference-exact input jitter.
        return SparseConv(self.in_channels, self.out_channels,
                          ConvSpec("conv1", 1, 1, self.conv1_kernel_size, 1),
                          name="conv1")(feats, graph, ones_exact,
                                        conv1_jitter)


class ProjectionHeadMLP(nn.Module):
    CHANNEL = 128
    BLOCK_NORM_TYPE = "BN"

    in_channels: int = 128
    out_channels: int = 16
    bn_momentum: float = 0.1
    normalize_feature: Optional[bool] = None
    conv1_kernel_size: Optional[int] = None
    D: int = 3
    num_items: int = 64

    @classmethod
    def conv_specs(cls, conv1_kernel_size: int) -> Tuple[ConvSpec, ...]:
        return (ConvSpec("conv1", 1, 1, conv1_kernel_size, 1),
                ConvSpec("block", 1, 1, 3, 1))

    @nn.compact
    def __call__(self, graph: SparseGraph, feats: jax.Array,
                 train: bool = False, ones_exact: bool = True,
                 conv1_jitter=None) -> jax.Array:
        # no occupancy conv here (the head reads real features), so
        # ones_exact never routes to c1z; a conv1_jitter spec falls
        # through to SparseConv's reference-exact input jitter.
        lv = graph.levels[1]
        mask, bidx = lv.mask, lv.coords[:, 0]
        c1 = ConvSpec("conv1", 1, 1, self.conv1_kernel_size, 1)
        x = SparseConv(self.in_channels, self.CHANNEL, c1,
                       name="conv1")(feats, graph, ones_exact,
                                     conv1_jitter)
        x = BasicBlock(self.CHANNEL, self.CHANNEL, 1, self.BLOCK_NORM_TYPE,
                       bn_momentum=self.bn_momentum,
                       num_items=self.num_items, name="norm1")(
            x, graph, mask, bidx, train)
        x = nn.relu(x)
        return SparseConv(self.CHANNEL, self.out_channels, c1,
                          name="conv2")(x, graph)
