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

from ..ops.conv3d import conv3x3x3, conv_transpose3x3x3_s2

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
        if self.dims == 3 and self.kernel_size == 3 and self.pad == 1 \
                and self.stride in (1, 2):
            # kd-unrolled fast path (ops/conv3d.py): ~2-3x on TPU for the
            # small channel counts of CostRegNet. Same param tree as nn.Conv.
            x = Conv3DKd(self.features, self.stride, dtype=self.dtype,
                         name="conv")(x)
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
