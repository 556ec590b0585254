"""Sparse residual block (reference model/residual_block.py:9-53):
conv3x3 -> norm -> relu -> conv3x3 -> norm, plus identity, then relu.
"""
from __future__ import annotations

import jax
from flax import linen as nn

from ..core.kernel_maps import ConvSpec
from ..core.types import SparseGraph
from .common import SparseConv, get_norm


class BasicBlock(nn.Module):
    inplanes: int
    planes: int
    stride_level: int  # tensor stride of the level this block lives on
    norm_type: str = "BN"
    dilation: int = 1
    bn_momentum: float = 0.1
    num_items: int = 64

    @nn.compact
    def __call__(self, x, graph: SparseGraph, mask, batch_idx, train: bool):
        s = self.stride_level
        spec = ConvSpec("block_conv", s, s, 3, self.dilation)
        out = SparseConv(self.inplanes, self.planes, spec, name="conv1")(
            x, graph)
        out = get_norm(self.norm_type, self.planes, self.bn_momentum,
                       self.num_items, name="norm1")(
            out, mask, batch_idx, train)
        out = nn.relu(out)
        out = SparseConv(self.planes, self.planes, spec, name="conv2")(
            out, graph)
        out = get_norm(self.norm_type, self.planes, self.bn_momentum,
                       self.num_items, name="norm2")(
            out, mask, batch_idx, train)
        out = out + x
        return nn.relu(out)
