"""FPN feature extractor.

Capability parity with the reference's FeatureNet
(/root/reference/models/mvsnet.py:7-57): three strided stages (8/16/32
channels at 1/1, 1/2, 1/4 resolution), top-down pathway with lateral 1x1
connections and bilinear x2 upsampling (align_corners), then 3x3 smoothing
convs reducing to 32/16/8 channels for cascade levels 2/1/0.

Channels-last; the x2 upsampling uses the matmul-based resize from
``ops.geometry`` so it runs on the MXU.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv3d import wfold_factor
from ..ops.geometry import upsample2x
from .blocks import ConvBnAct, WFoldedConv2D


class FeatureNet(nn.Module):
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict[str, jax.Array]:
        """x: (B, H, W, 3) -> {'level_0': (B,H,W,8), 'level_1': (B,H/2,W/2,16),
        'level_2': (B,H/4,W/4,32)}."""
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        # bottom-up
        c0 = ConvBnAct(8, name="conv0_0", **kw)(x, train)
        c0 = ConvBnAct(8, name="conv0_1", **kw)(c0, train)
        c1 = ConvBnAct(16, kernel_size=5, stride=2, pad=2, name="conv1_0", **kw)(c0, train)
        c1 = ConvBnAct(16, name="conv1_1", **kw)(c1, train)
        c1 = ConvBnAct(16, name="conv1_2", **kw)(c1, train)
        c2 = ConvBnAct(32, kernel_size=5, stride=2, pad=2, name="conv2_0", **kw)(c1, train)
        c2 = ConvBnAct(32, name="conv2_1", **kw)(c2, train)
        c2 = ConvBnAct(32, name="conv2_2", **kw)(c2, train)
        # top-down with lateral connections
        feat2 = nn.Conv(32, (1, 1), dtype=self.dtype, name="toplayer")(c2)
        feat1 = upsample2x(feat2) + nn.Conv(32, (1, 1), dtype=self.dtype,
                                            name="lat1")(c1)
        feat0 = upsample2x(feat1) + nn.Conv(32, (1, 1), dtype=self.dtype,
                                            name="lat0")(c0)
        # channel reduction — the net's hottest convs (2.25 of 5.54 ms at
        # bench res, ~1% MFU: Cout 8/16 idles the MXU lanes); width-folded
        # where the width divides (param-compatible with nn.Conv)
        wf1 = wfold_factor(feat1.shape[-2], feat1.shape[-1], 16)
        wf0 = wfold_factor(feat0.shape[-2], feat0.shape[-1], 8)
        if wf1 >= 4:
            feat1 = WFoldedConv2D(16, wf1, use_bias=True, dtype=self.dtype,
                                  name="smooth1")(feat1)
        else:
            feat1 = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="smooth1")(feat1)
        if wf0 >= 4:
            feat0 = WFoldedConv2D(8, wf0, use_bias=True, dtype=self.dtype,
                                  name="smooth0")(feat0)
        else:
            feat0 = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="smooth0")(feat0)
        return {"level_0": feat0, "level_1": feat1, "level_2": feat2}
