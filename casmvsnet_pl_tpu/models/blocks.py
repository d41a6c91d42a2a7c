"""Flax building blocks: Conv+BatchNorm+LeakyReLU in 2D and 3D.

TPU-native replacement for the reference's ConvBnReLU/ConvBnReLU3D built on
the InPlace-ABN CUDA extension (/root/reference/models/modules.py:8-31, N1 in
SURVEY.md §2.2). InPlace-ABN = BatchNorm fused with leaky-relu(0.01) that
recomputes activations to save memory; on TPU, XLA fuses BN+activation into
the conv epilogue and ``jax.checkpoint`` (applied at the cascade level)
provides the memory saving, so a plain BatchNorm is both faster and exact.

Layout: channels-last (NHWC / NDHWC) — XLA's preferred TPU conv layout.
Parameters are float32; compute dtype is configurable (bfloat16 on TPU).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import (conv2d_wfolded, conv3x3x3, conv3x3x3_folded,
                          conv_transpose3x3x3_s2,
                          conv_transpose3x3x3_s2_folded, wfold_factor)

Dtype = Any

# InPlaceABN defaults: eps=1e-5, torch momentum 0.1 -> flax momentum 0.9,
# activation leaky_relu with negative_slope 0.01.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5
LEAKY_SLOPE = 0.01


class Conv3DKd(nn.Module):
    """3x3x3 conv (pad 1, stride 1|2, no bias) via ops.conv3d.conv3x3x3.

    Parameter tree matches nn.Conv (kernel (3,3,3,Cin,Cout) under 'kernel')
    so checkpoints are interchangeable with the naive formulation.
    """
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, x.shape[-1], self.features),
                            jnp.float32)
        y = conv3x3x3(x.astype(self.dtype), kernel.astype(self.dtype),
                      self.stride)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class FoldedBatchNorm(nn.Module):
    """BatchNorm over a D-folded volume (B, H, W, D*C), exactly equivalent
    to nn.BatchNorm on the unfolded (B, D, H, W, C): batch statistics pool
    over the D groups, running stats / scale / bias are per real channel C.
    Parameter and batch_stats structure matches nn.BatchNorm (scale, bias,
    mean, var of shape (C,)) so checkpoints are interchangeable.
    """
    features: int            # real channel count C
    d_size: int              # folded depth D
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xf: jax.Array, train: bool = False) -> jax.Array:
        C, D = self.features, self.d_size
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if train:
            xf32 = xf.astype(jnp.float32)
            # per-(d, c) moments over (B, H, W), then pool over d (equal
            # counts => plain mean of means / mean of second moments)
            m_dc = jnp.mean(xf32, axis=(0, 1, 2)).reshape(D, C)
            m2_dc = jnp.mean(xf32 * xf32, axis=(0, 1, 2)).reshape(D, C)
            mean = jnp.mean(m_dc, axis=0)
            m2 = jnp.mean(m2_dc, axis=0)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                m2 = jax.lax.pmean(m2, self.axis_name)
            var = m2 - mean * mean
            if not self.is_initializing():
                ra_mean.value = (BN_MOMENTUM * ra_mean.value
                                 + (1 - BN_MOMENTUM) * mean)
                ra_var.value = (BN_MOMENTUM * ra_var.value
                                + (1 - BN_MOMENTUM) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = scale * jax.lax.rsqrt(var + BN_EPS)
        shift = bias - mean * inv
        inv_f = jnp.tile(inv, D).astype(xf.dtype)            # (D*C,)
        shift_f = jnp.tile(shift, D).astype(xf.dtype)
        return xf * inv_f + shift_f


class _FoldedConv3D(nn.Module):
    """Bare folded 3x3x3 conv; param 'kernel' matches nn.Conv's (3,3,3,Ci,Co)."""
    features: int
    d_size: int
    stride: int = 1
    transpose: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xf: jax.Array) -> jax.Array:
        in_ch = xf.shape[-1] // self.d_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, in_ch, self.features), jnp.float32)
        xf = xf.astype(self.dtype)
        if self.transpose:
            return conv_transpose3x3x3_s2_folded(xf, kernel, self.d_size)
        return conv3x3x3_folded(xf, kernel, self.d_size, self.stride)


class ConvBnActFolded(nn.Module):
    """D-folded ConvBnAct: 3x3x3 conv (stride 1|2) + BN + leaky_relu on a
    (B, H, W, D*C) volume. Parameter tree matches ConvBnAct(dims=3)
    ({conv: {kernel}, bn: {scale, bias}} + batch_stats {bn: {mean, var}})."""
    features: int
    d_size: int              # input D
    stride: int = 1
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xf: jax.Array, train: bool = False) -> jax.Array:
        d_out = (self.d_size + self.stride - 1) // self.stride
        y = _FoldedConv3D(self.features, self.d_size, self.stride,
                          dtype=self.dtype, name="conv")(xf)
        y = FoldedBatchNorm(self.features, d_out, dtype=self.dtype,
                            axis_name=self.axis_name if train else None,
                            name="bn")(y, train)
        return nn.leaky_relu(y, LEAKY_SLOPE)


class ConvTransposeBnActFolded(nn.Module):
    """D-folded transposed-conv block; param tree matches
    ConvTransposeBnAct3D ({kernel, bn: {...}})."""
    features: int
    d_size: int              # input D (output is 2*D)
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xf: jax.Array, train: bool = False) -> jax.Array:
        in_ch = xf.shape[-1] // self.d_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, in_ch, self.features), jnp.float32)
        y = conv_transpose3x3x3_s2_folded(xf.astype(self.dtype), kernel,
                                          self.d_size)
        y = FoldedBatchNorm(self.features, 2 * self.d_size, dtype=self.dtype,
                            axis_name=self.axis_name if train else None,
                            name="bn")(y, train)
        return nn.leaky_relu(y, LEAKY_SLOPE)


class WFoldedConv2D(nn.Module):
    """Width-folded k x k stride-1 SAME 2D conv (ops/conv3d.conv2d_wfolded).

    Exact, and parameter-compatible with ``nn.Conv`` (kernel
    (k, k, Ci, Co) [+ bias (Co,)]), so checkpoints are interchangeable
    with the plain formulation. Used where the output channel count
    would idle most MXU lanes (feature-net smooth convs: Cout 8/16 at
    full resolution ran ~1% MFU, scripts/probe_feature.py).
    """
    features: int
    fold: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features), jnp.float32)
        y = conv2d_wfolded(x.astype(self.dtype),
                           kernel.astype(self.dtype), self.fold)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class ConvBnAct(nn.Module):
    """conv(bias=False) -> BatchNorm -> leaky_relu, N-dimensional.

    kernel_size/strides/padding are given per spatial dim; `dims` picks 2D/3D.
    """
    features: int
    dims: int = 2
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Dtype = jnp.float32
    axis_name: str | None = None  # cross-replica BN stat sync axis

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        wf = (wfold_factor(x.shape[-2], x.shape[-1], self.features)
              if (self.dims == 2 and self.stride == 1
                  and self.pad == (self.kernel_size - 1) // 2) else 1)
        if self.dims == 3 and self.kernel_size == 3 and self.pad == 1 \
                and self.stride in (1, 2):
            # kd-unrolled fast path (ops/conv3d.py): ~2-3x on TPU for the
            # small channel counts of CostRegNet. Same param tree as nn.Conv.
            x = Conv3DKd(self.features, self.stride, dtype=self.dtype,
                         name="conv")(x)
        elif wf >= 4:
            # width-folded fast path: small output channel counts idle the
            # 128 MXU lanes; the fold is a free reshape (identical layout).
            x = WFoldedConv2D(self.features, wf, self.kernel_size,
                              dtype=self.dtype, name="conv")(x)
        else:
            k = (self.kernel_size,) * self.dims
            s = (self.stride,) * self.dims
            p = ((self.pad, self.pad),) * self.dims
            x = nn.Conv(self.features, k, strides=s, padding=p,
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype,
                         axis_name=self.axis_name if train else None,
                         name="bn")(x)
        return nn.leaky_relu(x, LEAKY_SLOPE)


class ConvTransposeBnAct3D(nn.Module):
    """3D transposed conv (stride 2, exact doubling) -> BatchNorm -> leaky_relu.

    Implemented as ``conv_general_dilated`` with lhs_dilation=2 and explicit
    (1, 2) padding — the exact equivalent of torch's
    ConvTranspose3d(k=3, stride=2, padding=1, output_padding=1, bias=False)
    used by the reference decoder (/root/reference/models/mvsnet.py:74-87),
    so shapes double exactly and tap alignment matches.
    """
    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, in_ch, self.features), jnp.float32)
        # depth-parity-decomposed transposed conv (ops/conv3d.py) — exactly
        # lhs_dilation=(2,2,2) with (1,2) padding, but ~2x faster on TPU
        y = conv_transpose3x3x3_s2(x.astype(self.dtype),
                                   kernel.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype,
                         axis_name=self.axis_name if train else None,
                         name="bn")(y)
        return nn.leaky_relu(y, LEAKY_SLOPE)
