"""Shared model building blocks: sparse conv module + norm factory.

Mirrors the reference's model/common.py:4-10 norm factory and wraps the
core gather-GEMM convolution as a flax module. Submodule names follow the
reference state_dict layout (conv1/norm1/...) so torch checkpoints map 1:1.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.kernel_maps import ConvSpec
from ..core.sparse_ops import (c1z_available, masked_instance_mean_var,
                               masked_mean_var, sparse_conv,
                               sparse_conv_c1z,
                               sparse_conv_c1z_exact_jitter,
                               sparse_conv_c1z_jittered,
                               sparse_conv_fused)
from ..core.types import SparseGraph, map_key

# torch kaiming_uniform(a=sqrt(5)) over fan_in = K^3 * Cin — the default
# init of ME.MinkowskiConvolution's underlying parameter.
conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class SparseConv(nn.Module):
    """Sparse (transpose) convolution over a prebuilt kernel map.

    1x1x1 same-level convolutions collapse to a plain matmul (no map).
    """

    in_ch: int
    out_ch: int
    spec: ConvSpec
    use_bias: bool = False
    # in_ch==1 occupancy contract: input features are all-ones on valid
    # rows (how the reference always drives in_ch==1 models). Enables
    # the presence-bitmask kernels for conv1 (sparse_ops.sparse_conv_c1z).
    occupancy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, graph: SparseGraph,
                 ones_exact: bool = True,
                 c1z_jitter=None) -> jax.Array:
        """``ones_exact``: static flag, True iff ``x`` is exactly the
        all-ones occupancy features. Train-time feature jitter
        (lib/transforms.py:24-34) breaks the c1z contract — the presence
        kernels never read ``x``, so routing them under jitter would
        silently drop the noise; the caller passes False then and the
        conv falls back to the feature-reading fused path.

        ``c1z_jitter``: optional (sigma, p, row_sel[, exact]) — the conv
        owns the train-time feature jitter. With exact=True (StepConfig
        jitter_mode='input', the default), the presence fast path stays
        EXACT by splitting conv(1+eps) = presence_conv(1) + conv(eps)
        with the eps conv's windows gated to jittered rows
        (sparse_ops.sparse_conv_c1z_exact_jitter). With exact=False
        (jitter_mode='c1z'), it injects distribution-matched
        output-space noise instead
        (sparse_ops.sparse_conv_c1z_jittered). On any route that reads
        features it applies the reference-exact input jitter to ``x``
        first. Requires an apply-time 'jitter' RNG stream."""
        if c1z_jitter is not None:
            assert ones_exact, \
                "c1z_jitter implies the raw all-ones input (the conv " \
                "applies the jitter itself)"

        def _jitter_parts():
            sigma, p, row_sel = c1z_jitter[:3]
            exact = c1z_jitter[3] if len(c1z_jitter) > 3 else True
            return sigma, p, row_sel, exact

        def input_jitter(x):
            # reference-exact input jitter for routes that read features
            sigma, p, row_sel, _ = _jitter_parts()
            k1, k2 = jax.random.split(self.make_rng("jitter"))
            gate = (jax.random.uniform(k1) < p).astype(x.dtype)
            lv_mask = graph.levels[self.spec.in_stride].mask
            noise = (jax.random.normal(k2, x.shape, jnp.float32)
                     * sigma * lv_mask[:, None])
            if row_sel is not None:
                noise = noise * row_sel[:, None]
            return x + gate * noise.astype(x.dtype)

        if self.spec.is_identity_map:
            if c1z_jitter is not None:
                x = input_jitter(x)
            w = self.param("kernel", conv_init, (self.in_ch, self.out_ch))
            y = jnp.dot(x, w.astype(x.dtype),
                        precision=(jax.lax.Precision.HIGHEST
                                   if x.dtype == jnp.float32 else None))
        else:
            w = self.param("kernel", conv_init,
                           (self.spec.kernel_size ** 3, self.in_ch,
                            self.out_ch))
            rk = map_key(self.spec.out_stride, self.spec.in_stride,
                         self.spec.kernel_size, self.spec.dilation)
            fm = (graph.fused.get(self.spec.key)
                  if graph.fused is not None else None)
            # build_graph only builds reverse-direction twins (needed by
            # the scatter-free backward) for odd kernels; even-kernel
            # geometries must use the explicit kmap path.
            on_c1z = ones_exact and c1z_available(fm, self.in_ch,
                                                  self.occupancy)
            if c1z_jitter is not None and not on_c1z:
                x = input_jitter(x)
            if on_c1z and c1z_jitter is not None:
                sigma, p, row_sel, exact = _jitter_parts()
                if exact:
                    # c1z maps only exist for same-level odd stencils,
                    # whose reverse fused twin build_graph always builds
                    rfm = graph.fused[rk]
                    lv_mask = graph.levels[self.spec.in_stride].mask
                    y = sparse_conv_c1z_exact_jitter(
                        w, fm, rfm, x.dtype, self.make_rng("jitter"),
                        sigma, p, lv_mask, row_sel)
                else:
                    y = sparse_conv_c1z_jittered(w, fm, x.dtype,
                                                 self.make_rng("jitter"),
                                                 sigma, p, row_sel)
            elif on_c1z:
                y = sparse_conv_c1z(w, fm, x.dtype)
            elif graph.fused is not None and rk in graph.fused:
                y = sparse_conv_fused(x, w, graph.fused[self.spec.key],
                                      graph.fused[rk])
            else:
                rev = (graph.kmaps.get(rk)
                       if self.spec.kernel_size % 2 == 1 else None)
                y = sparse_conv(x, w, graph.kmaps[self.spec.key], rev)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.astype(y.dtype)
        return y


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded sparse tensor.

    Semantics of torch BatchNorm1d as used by ME.MinkowskiBatchNorm
    (reference model/common.py:4-10): biased variance for normalization,
    unbiased for the running-average update, running = (1-m)*running +
    m*batch with m = bn_momentum (0.05 in the GCL configs, config.py:98).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, batch_idx, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train:
            mean, var, cnt = masked_mean_var(x.astype(jnp.float32), mask)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class MaskedInstanceNorm(nn.Module):
    """Per-cloud (batch-item) normalization — ME.MinkowskiInstanceNorm."""

    features: int
    num_items: int = 64
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, batch_idx, train: bool):
        mean, var = masked_instance_mean_var(
            x.astype(jnp.float32), mask, batch_idx, self.num_items)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return y.astype(x.dtype)


def get_norm(norm_type: str, features: int, bn_momentum: float = 0.1,
             num_items: int = 64, name: Optional[str] = None) -> nn.Module:
    """'BN' -> MaskedBatchNorm, 'IN' -> MaskedInstanceNorm."""
    if norm_type == "BN":
        return MaskedBatchNorm(features, momentum=bn_momentum, name=name)
    if norm_type == "IN":
        return MaskedInstanceNorm(features, num_items=num_items, name=name)
    raise ValueError(f"Type {norm_type}, not defined")
