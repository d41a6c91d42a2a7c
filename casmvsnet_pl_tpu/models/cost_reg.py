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

from .blocks import Conv3DKd, ConvBnAct, ConvTransposeBnAct3D


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
