"""Sparse residual U-Net family — TPU-native rebuild of the reference
model zoo (/root/reference/model/resunet.py).

Architecture (ResUNet2, reference :24-232): conv1 (k=conv1_kernel_size)
[+ optional dilated conv1_extra when KERNEL_SIZES[0] is set] -> block1 ->
3x (strided conv + residual block) encoder -> 3x (transpose conv + skip
concat + residual block) decoder [+ optional conv1_tr_extra] -> 1x1
conv1_tr -> relu -> 1x1 final (bias) -> optional L2 feature normalization.

Geometry (stride levels + kernel maps) is precomputed per batch into a
SparseGraph; `conv_specs()` declares exactly which maps a variant needs.
Forward is pure gathers + MXU GEMMs with static shapes.

Channel variants match the reference classes byte-for-byte
(reference :235-309); GCL's default backbone is ResUNetFatBN (:263-266),
the FCGF-baseline default is ResUNetFatBNEXP (:294-300).
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
from .residual_block import BasicBlock

_EXTRA_STRIDE = 5  # conv1_extra stride/dilation (reference :48-57)
_EXTRA_TR_DILATION = 4  # conv1_tr_extra dilation (reference :141-151)


class ResUNet2(nn.Module):
    NORM_TYPE = None  # plain class attr (NOT a dataclass field), variants override
    BLOCK_NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 32, 64, 64, 128]
    STRIDES = [1, 2, 2, 2]
    KERNEL_SIZES = [None, 3, 3, 3]
    DILATIONS = [1, 1, 1, 1]

    in_channels: int = 3
    out_channels: int = 32
    bn_momentum: float = 0.1
    normalize_feature: Optional[bool] = None
    conv1_kernel_size: Optional[int] = None
    D: int = 3
    num_items: int = 64  # max clouds per batch (for IN variants)

    @classmethod
    def encoder_strides(cls) -> Tuple[int, ...]:
        """Tensor stride after conv1[+extra], conv2, conv3, conv4."""
        s = _EXTRA_STRIDE if cls.KERNEL_SIZES[0] is not None else 1
        out = [s]
        for i in (1, 2, 3):
            s *= cls.STRIDES[i]
            out.append(s)
        return tuple(out)

    @classmethod
    def conv_specs(cls, conv1_kernel_size: int) -> Tuple[ConvSpec, ...]:
        """Every distinct conv geometry of this variant (for build_graph)."""
        es = cls.encoder_strides()
        specs = [ConvSpec("conv1", 1, 1, conv1_kernel_size, cls.DILATIONS[0])]
        if cls.KERNEL_SIZES[0] is not None:
            specs.append(ConvSpec("conv1_extra", 1, _EXTRA_STRIDE,
                                  cls.KERNEL_SIZES[0], _EXTRA_STRIDE))
        specs.append(ConvSpec("block1", es[0], es[0], 3, 1))
        for i in (1, 2, 3):
            specs.append(ConvSpec(f"conv{i+1}", es[i - 1], es[i],
                                  cls.KERNEL_SIZES[i], cls.DILATIONS[i]))
            specs.append(ConvSpec(f"block{i+1}", es[i], es[i], 3, 1))
        for i in (3, 2, 1):
            specs.append(ConvSpec(f"conv{i+1}_tr", es[i], es[i - 1],
                                  cls.KERNEL_SIZES[i], cls.DILATIONS[i]))
            specs.append(ConvSpec(f"block{i+1}_tr", es[i - 1], es[i - 1],
                                  3, 1))
        if cls.KERNEL_SIZES[0] is not None:
            specs.append(ConvSpec("conv1_tr_extra", _EXTRA_STRIDE, 1,
                                  cls.KERNEL_SIZES[0], _EXTRA_TR_DILATION))
        return tuple(specs)

    def _norm(self, ch, name):
        return get_norm(self.NORM_TYPE, ch, self.bn_momentum,
                        self.num_items, name=name)

    def _block(self, ch, stride, name):
        return BasicBlock(ch, ch, stride, self.BLOCK_NORM_TYPE,
                          bn_momentum=self.bn_momentum,
                          num_items=self.num_items, name=name)

    @nn.compact
    def __call__(self, graph: SparseGraph, feats: jax.Array,
                 train: bool = False, ones_exact: bool = True,
                 conv1_jitter=None) -> jax.Array:
        """``ones_exact``: static; True iff ``feats`` is exactly the
        all-ones occupancy input (False under train-time jitter). Gates
        the presence-bitmask conv1 fast path, which never reads feats.
        ``conv1_jitter``: optional (sigma, p, row_sel) — jitter owned by
        conv1 itself (StepConfig jitter_mode='c1z', see
        models.common.SparseConv)."""
        CH, TR = self.CHANNELS, self.TR_CHANNELS
        es = self.encoder_strides()
        lv = {s: graph.levels[s] for s in set((1,) + es)}
        mb = {s: (lv[s].mask, lv[s].coords[:, 0]) for s in lv}

        def norm_at(y, ch, s, name):
            return self._norm(ch, name)(y, *mb[s], train)

        # --- encoder -------------------------------------------------
        out_s1 = SparseConv(self.in_channels, CH[1],
                            ConvSpec("conv1", 1, 1, self.conv1_kernel_size,
                                     self.DILATIONS[0]),
                            occupancy=True,
                            name="conv1")(feats, graph, ones_exact,
                                          conv1_jitter)
        out_s1 = norm_at(out_s1, CH[1], 1, "norm1")
        if self.KERNEL_SIZES[0] is not None:
            out_s1 = nn.relu(out_s1)
            out_s1 = SparseConv(
                CH[1], CH[1],
                ConvSpec("conv1_extra", 1, _EXTRA_STRIDE,
                         self.KERNEL_SIZES[0], _EXTRA_STRIDE),
                name="conv1_extra")(out_s1, graph)
            out_s1 = norm_at(out_s1, CH[1], es[0], "norm1_extra")
        out_s1 = self._block(CH[1], es[0], "block1")(
            out_s1, graph, *mb[es[0]], train)
        out = nn.relu(out_s1)

        skips = {}
        for i in (1, 2, 3):
            y = SparseConv(CH[i], CH[i + 1],
                           ConvSpec(f"conv{i+1}", es[i - 1], es[i],
                                    self.KERNEL_SIZES[i], self.DILATIONS[i]),
                           name=f"conv{i+1}")(out, graph)
            y = norm_at(y, CH[i + 1], es[i], f"norm{i+1}")
            y = self._block(CH[i + 1], es[i], f"block{i+1}")(
                y, graph, *mb[es[i]], train)
            skips[i] = y  # pre-relu, as in reference (out_s2/4/8)
            out = nn.relu(y)

        # --- decoder -------------------------------------------------
        in_ch = CH[4]
        for i in (3, 2, 1):
            y = SparseConv(in_ch, TR[i + 1],
                           ConvSpec(f"conv{i+1}_tr", es[i], es[i - 1],
                                    self.KERNEL_SIZES[i], self.DILATIONS[i]),
                           name=f"conv{i+1}_tr")(out, graph)
            y = norm_at(y, TR[i + 1], es[i - 1], f"norm{i+1}_tr")
            y = self._block(TR[i + 1], es[i - 1], f"block{i+1}_tr")(
                y, graph, *mb[es[i - 1]], train)
            y = nn.relu(y)
            if i > 1:
                out = jnp.concatenate([y, skips[i - 1]], axis=1)
                in_ch = TR[i + 1] + CH[i]
            else:
                out = jnp.concatenate([y, out_s1], axis=1)
                in_ch = TR[2] + CH[1]

        conv1_tr_ch = in_ch
        if self.KERNEL_SIZES[0] is not None:
            out = SparseConv(
                in_ch, TR[2],
                ConvSpec("conv1_tr_extra", _EXTRA_STRIDE, 1,
                         self.KERNEL_SIZES[0], _EXTRA_TR_DILATION),
                name="conv1_tr_extra")(out, graph)
            out = norm_at(out, TR[1], 1, "norm1_tr_extra")
            out = nn.relu(out)
            conv1_tr_ch = TR[2]

        out = SparseConv(conv1_tr_ch, TR[1],
                         ConvSpec("conv1_tr", 1, 1, 1, 1),
                         name="conv1_tr")(out, graph)
        out = nn.relu(out)
        out = SparseConv(TR[1], self.out_channels,
                         ConvSpec("final", 1, 1, 1, 1), use_bias=True,
                         name="final")(out, graph)

        if self.normalize_feature:
            out = l2_normalize(out)
        return out


class ResUNetBN2(ResUNet2):
    NORM_TYPE = "BN"


class ResUNetBN2B(ResUNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 64, 64, 64, 64]


class ResUNetBN2C(ResUNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 64, 64, 64, 128]


class ResUNetBN2D(ResUNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 64, 64, 128, 128]


class ResUNetBN2E(ResUNet2):
    NORM_TYPE = "BN"
    CHANNELS = [None, 128, 128, 128, 256]
    TR_CHANNELS = [None, 64, 128, 128, 128]


class ResUNetFatBN(ResUNet2):
    """GCL's default backbone (reference :263-266)."""

    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 128, 128, 128, 256]


class ResUNetIN2(ResUNet2):
    NORM_TYPE = "BN"
    BLOCK_NORM_TYPE = "IN"


class ResUNetIN2B(ResUNetBN2B):
    NORM_TYPE = "BN"
    BLOCK_NORM_TYPE = "IN"


class ResUNetIN2C(ResUNetBN2C):
    NORM_TYPE = "BN"
    BLOCK_NORM_TYPE = "IN"


class ResUNetIN2D(ResUNetBN2D):
    NORM_TYPE = "BN"
    BLOCK_NORM_TYPE = "IN"


class ResUNetIN2E(ResUNetBN2E):
    NORM_TYPE = "BN"
    BLOCK_NORM_TYPE = "IN"


class ResUNetFatBNEXP(ResUNet2):
    """FCGF-baseline default: stride-3, k=5 encoder (reference :294-300)."""

    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 128, 128, 128, 256]
    STRIDES = [1, 3, 3, 3]
    KERNEL_SIZES = [None, 5, 5, 5]
    DILATIONS = [1, 1, 1, 1]


class ResUNetFatBNEXP_V2(ResUNet2):
    """Extra k=5 stride-5/dilated-5 layer pair (reference :303-309)."""

    NORM_TYPE = "BN"
    CHANNELS = [None, 32, 64, 128, 256]
    TR_CHANNELS = [None, 128, 128, 128, 256]
    STRIDES = [1, 2, 2, 2]
    KERNEL_SIZES = [5, 3, 3, 3]
    DILATIONS = [1, 1, 1, 1]
