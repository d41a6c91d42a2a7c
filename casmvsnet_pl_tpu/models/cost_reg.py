"""3D cost-volume regularization U-Net.

Capability parity with the reference's CostRegNet
(/root/reference/models/mvsnet.py:60-104): 3D conv encoder 8->16->32->64 with
stride-2 downsampling over (D, H, W), transposed-conv decoder with additive
skip connections, and a final 3x3x3 conv to a single cost channel.

One instance per cascade level; input channels are the cost-volume channels
(8*2^l for variance, G for groupwise correlation). Volumes are NDHWC.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import conv3x3x3_folded
from .blocks import (Conv3DKd, ConvBnAct, ConvBnActFolded,
                     ConvTransposeBnAct3D, ConvTransposeBnActFolded)


class CostRegNet(nn.Module):
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, D, H, W, C) cost volume -> (B, D, H, W) regularized cost.

        D, H, W must be divisible by 8 (three stride-2 stages).
        """
        kw = dict(dims=3, dtype=self.dtype, axis_name=self.axis_name)
        c0 = ConvBnAct(8, name="conv0", **kw)(x, train)
        c = ConvBnAct(16, stride=2, name="conv1", **kw)(c0, train)
        c2 = ConvBnAct(16, name="conv2", **kw)(c, train)
        c = ConvBnAct(32, stride=2, name="conv3", **kw)(c2, train)
        c4 = ConvBnAct(32, name="conv4", **kw)(c, train)
        c = ConvBnAct(64, stride=2, name="conv5", **kw)(c4, train)
        c = ConvBnAct(64, name="conv6", **kw)(c, train)
        c = c4 + ConvTransposeBnAct3D(32, dtype=self.dtype,
                                      axis_name=self.axis_name,
                                      name="deconv7")(c, train)
        c = c2 + ConvTransposeBnAct3D(16, dtype=self.dtype,
                                      axis_name=self.axis_name,
                                      name="deconv9")(c, train)
        c = c0 + ConvTransposeBnAct3D(8, dtype=self.dtype,
                                      axis_name=self.axis_name,
                                      name="deconv11")(c, train)
        cost = Conv3DKd(1, dtype=self.dtype, use_bias=True, name="prob")(c)
        return cost[..., 0]  # (B, D, H, W)


class _FoldedProbConv(nn.Module):
    """Folded 3x3x3 Co=1 conv with bias; params match Conv3DKd(use_bias)."""
    d_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf: jax.Array) -> jax.Array:
        in_ch = xf.shape[-1] // self.d_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, in_ch, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        y = conv3x3x3_folded(xf.astype(self.dtype), kernel, self.d_size, 1)
        return y + bias[0].astype(y.dtype)                   # (B, H, W, D)


class CostRegNetFolded(nn.Module):
    """CostRegNet executed in D-folded layout for small depth counts.

    The finest cascade level has only D = 8 depth hypotheses; NDHWC 3D convs
    at 8-64 channels idle most MXU lanes, so the whole U-Net runs on
    (B, H, W, D*C) volumes with the banded depth structure embedded in dense
    2D-conv kernels (ops/conv3d.py) — ~D/3 extra FLOPs for full lane
    occupancy, ~3x faster at D=8 on v5e. Mathematically identical to
    CostRegNet and parameter-compatible with it (same module/param names and
    shapes), so checkpoints are interchangeable between the two executions.

    Input (B, D, H, W, C) with D divisible by 8; output (B, D, H, W).
    """
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from ..ops.conv3d import fold_volume
        B, D, H, W, C = x.shape
        xf = fold_volume(x)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        c0 = ConvBnActFolded(8, D, name="conv0", **kw)(xf, train)
        c = ConvBnActFolded(16, D, stride=2, name="conv1", **kw)(c0, train)
        c2 = ConvBnActFolded(16, D // 2, name="conv2", **kw)(c, train)
        c = ConvBnActFolded(32, D // 2, stride=2, name="conv3", **kw)(c2, train)
        c4 = ConvBnActFolded(32, D // 4, name="conv4", **kw)(c, train)
        c = ConvBnActFolded(64, D // 4, stride=2, name="conv5", **kw)(c4, train)
        c = ConvBnActFolded(64, D // 8, name="conv6", **kw)(c, train)
        c = c4 + ConvTransposeBnActFolded(32, D // 8, dtype=self.dtype,
                                          axis_name=self.axis_name,
                                          name="deconv7")(c, train)
        c = c2 + ConvTransposeBnActFolded(16, D // 4, dtype=self.dtype,
                                          axis_name=self.axis_name,
                                          name="deconv9")(c, train)
        c = c0 + ConvTransposeBnActFolded(8, D // 2, dtype=self.dtype,
                                          axis_name=self.axis_name,
                                          name="deconv11")(c, train)
        cost = _FoldedProbConv(D, dtype=self.dtype, name="prob")(c)
        return cost.transpose(0, 3, 1, 2)                    # (B, D, H, W)
