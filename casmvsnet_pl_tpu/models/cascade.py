"""CascadeMVSNet: coarse-to-fine cascaded plane-sweep depth inference.

Capability parity with /root/reference/models/mvsnet.py:107-244:
  - shared FPN features for all V views;
  - per-level plane-sweep cost volume (variance or groupwise correlation);
  - 3D U-Net regularization -> softmax over depth -> soft-argmax regression;
  - confidence = sum of probability over 4 consecutive depth bins at the
    regressed (truncated) depth index, computed without gradient;
  - level 2 sweeps uniformly from init_depth_min; levels 1 and 0 re-center a
    narrowed hypothesis window around the x2-upsampled previous depth
    (gradient-stopped), with per-level interval ratios.

Scalar and per-sample (B,) ``init_depth_min`` / ``depth_interval`` are
unified internally (the reference keeps two code paths,
/root/reference/models/mvsnet.py:215-229).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.geometry import (depth_regression, get_depth_values,
                            initial_depth_values, resize_bilinear)
from ..ops.plane_sweep import build_cost_volume
from .cost_reg import CostRegNet, CostRegNetFolded
from .feature_net import FeatureNet

Array = jax.Array


def _sum4_confidence(prob: Array, depth_values_len: int) -> Array:
    """Confidence: probability mass of 4 consecutive bins at the soft-argmax
    index (truncated like torch's ``.long()``), no gradient.

    prob: (B, D, H, W) -> (B, H, W).
    """
    D = depth_values_len
    prob = jax.lax.stop_gradient(prob.astype(jnp.float32))
    # sliding-window sum of 4 with (1, 2) zero padding along depth
    padded = jnp.pad(prob, ((0, 0), (1, 2), (0, 0), (0, 0)))
    cs = jnp.cumsum(padded, axis=1)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (0, 0), (0, 0)))
    sum4 = cs[:, 4:D + 4] - cs[:, :D]                        # (B, D, H, W)
    idx_f = jnp.sum(prob * jnp.arange(D, dtype=jnp.float32)[None, :, None, None],
                    axis=1)
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)        # (B, H, W)
    return jnp.take_along_axis(sum4, idx[:, None], axis=1)[:, 0]


def chunked_apply(model: "CascadeMVSNet", variables, imgs: Array,
                  proj_mats: Array, init_depth_min, depth_interval,
                  chunk: int = 1) -> dict[str, Array]:
    """Inference forward with the cascade chunked over the batch axis.

    Why: on v5e the cascade's per-sample working sets (packed tables,
    gathered rows, cost volumes — tens of MB each) ride VMEM at batch 1
    but spill to the ~450 GB/s HBM stream at batch >= 4, costing ~20% per
    map (PERF_NOTES.md "Batch scaling"). ``lax.map`` runs the FULL
    forward in chunks of ``chunk`` samples, so each iteration's working
    set stays in the VMEM-resident regime. Measured at the bench config
    (scripts/probe_chunked{,2}.py, 2026-08-20): batch 4 23.44 -> 29.39
    maps/s, batch 8 27.98 -> 29.33, vs 29.29 at batch 1 — full batch-1
    parity. Two rejected variants from the same probes: batching the
    feature net outside the map cost ~4 ms/iter in layout handoffs
    (27.00 maps/s), and a python-unrolled loop compiles nc x bigger for
    the same speed (29.22). The reference has no analog (its CUDA
    kernels stream from HBM at any batch,
    /root/reference/models/modules.py:52-92); this is a TPU memory-
    hierarchy concern only.

    Inference only: under training the cost regularizers' batch-norm
    statistics must see the whole batch, and training runs at batch <= 2
    per chip where the spill gap is small.

    imgs: (B, V, H, W, 3); B must be divisible by ``chunk``.
    Returns the same dict as ``model.apply`` on the full batch.
    """
    B = imgs.shape[0]
    assert B % chunk == 0, (B, chunk)
    nc = B // chunk
    if nc == 1:
        return model.apply(variables, imgs, proj_mats, init_depth_min,
                           depth_interval)
    dmin = jnp.broadcast_to(jnp.asarray(init_depth_min, jnp.float32), (B,))
    dint = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))

    def one(x):
        im, pr, dm, di = x
        return model.apply(variables, im, pr, dm, di)

    out = jax.lax.map(
        one, (imgs.reshape((nc, chunk) + imgs.shape[1:]),
              proj_mats.reshape((nc, chunk) + proj_mats.shape[1:]),
              dmin.reshape(nc, chunk), dint.reshape(nc, chunk)))
    return jax.tree.map(lambda o: o.reshape((B,) + o.shape[2:]), out)


class CascadeMVSNet(nn.Module):
    """Args mirror the reference flags (--n_depths, --interval_ratios,
    --num_groups); ``dtype`` selects the TPU compute precision (bfloat16
    recommended), parameters and depth math stay float32."""
    n_depths: Sequence[int] = (8, 32, 48)
    interval_ratios: Sequence[float] = (1.0, 2.0, 4.0)
    num_groups: int = 1
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # rematerialize the per-view warp in the backward pass. Off by default:
    # at the reference training config the stored warped volumes are well
    # within v5e HBM and remat costs ~14% step time re-gathering (the warp
    # recompute is gather-bound, not flop-bound). Turn on for very large
    # inference-resolution training or small-memory chips.
    remat: bool = False
    # plane-sweep sampling strategy (ops/plane_sweep.py::_resolve_sampling):
    # "auto" uses PATCH-shared gathers at every cascade level (one 4x4-patch
    # row serves a whole depth-hypothesis group, split-channel up to C=32;
    # exact via runtime group-fit fallbacks), with aligned-BLOCK tables as
    # the past-the-cliff / unfit-geometry fallback at large resolutions and
    # plain QUAD rows as the last resort. "quad"/"patch"/"window" force a
    # strategy; "window" is a bounded approximation kept for hardware with
    # a different gather/VPU cost ratio.
    sampling: str = "auto"

    levels: int = 3

    def setup(self):
        assert len(self.n_depths) == self.levels
        assert len(self.interval_ratios) == self.levels
        for d in self.n_depths:
            # three stride-2 stages in CostRegNet (same architecture
            # constraint as the reference, which only ever uses 8/32/48)
            assert d % 8 == 0, (
                f"n_depths must be divisible by 8 (got {self.n_depths}): "
                "the cost regularizer downsamples the depth axis 3x by 2")
        self.feature = FeatureNet(dtype=self.dtype, axis_name=self.axis_name)
        # The regularizer runs in D-folded layout where the depth count
        # allows it (D divisible by 8) AND the banded-dense FLOP inflation
        # (D/3x) stays profitable: parameter-compatible with CostRegNet,
        # folded measures 6.4 vs 22.8 ms at D=8 and 10.2 vs 15.5 at D=32,
        # but LOSES at D=48 (6.0 vs 5.3 — band fraction 3/48 wastes 16x
        # FLOPs; scripts/probe_costreg_mix.py), so deep levels use the
        # tap-unrolled 3D convs instead.
        self.cost_regs = [
            (CostRegNetFolded
             if self.n_depths[l] % 8 == 0 and self.n_depths[l] <= 32
             else CostRegNet)(
                dtype=self.dtype, axis_name=self.axis_name,
                name=f"cost_reg_{l}")
            for l in range(self.levels)]

    def _predict_depth(self, feats: Array, proj_mats: Array,
                       depth_values: Array, level: int,
                       train: bool) -> tuple[Array, Array]:
        """One cascade level: cost volume -> regularize -> regress.

        feats: (B, V, h, w, C); proj_mats: (B, V-1, 3, 4);
        depth_values: (B, D, h, w). Returns depth (B, h, w), confidence (B, h, w).
        """
        volume = build_cost_volume(feats, proj_mats, depth_values,
                                   groups=self.num_groups, remat=self.remat,
                                   sampling=self.sampling)
        cost = self.cost_regs[level](volume, train)           # (B, D, h, w)
        prob = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
        depth = depth_regression(prob, depth_values)
        confidence = _sum4_confidence(prob, depth_values.shape[1])
        return depth, confidence

    def features(self, imgs: Array, train: bool = False) -> dict[str, Array]:
        """Shared FPN features for all views.

        imgs: (B, V, H, W, 3) -> {'level_l': (B, V, h_l, w_l, C_l)}.
        Public with :meth:`from_features` so pipelines can cache or
        precompute features; note :func:`chunked_apply` deliberately
        does NOT use this split (batching features outside its lax.map
        measured ~4 ms/iter of layout-handoff overhead and was
        rejected — see its docstring).
        """
        B, V, H, W, _ = imgs.shape
        feats = self.feature(imgs.reshape(B * V, H, W, 3).astype(self.dtype),
                             train)
        out = {}
        for name, f in feats.items():
            h, w, c = f.shape[1:]
            out[name] = f.reshape(B, V, h, w, c)
        return out

    def from_features(self, feats: dict[str, Array], proj_mats: Array,
                      init_depth_min: Array | float,
                      depth_interval: Array | float,
                      train: bool = False) -> dict[str, Array]:
        """The cascade after feature extraction (cost volumes -> depths).

        feats: {'level_l': (B, V, h_l, w_l, C_l)} from :meth:`features`.
        """
        B = proj_mats.shape[0]
        dmin = jnp.broadcast_to(jnp.asarray(init_depth_min, jnp.float32), (B,))
        dint = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))

        results: dict[str, Array] = {}
        depth_prev = None
        for l in reversed(range(self.levels)):               # 2, 1, 0
            feats_l = feats[f"level_{l}"]                    # (B, V, h, w, C)
            h, w = feats_l.shape[2:4]
            proj_mats_l = proj_mats[:, :, l]                 # (B, V-1, 3, 4)
            interval_l = dint * float(self.interval_ratios[l])
            D = int(self.n_depths[l])
            if l == self.levels - 1:
                depth_values = initial_depth_values(dmin, interval_l, D, B, h, w)
            else:
                prev = jax.lax.stop_gradient(depth_prev)     # (B, h/2, w/2)
                prev = resize_bilinear(prev[..., None], (h, w))[..., 0]
                depth_values = get_depth_values(prev, D, interval_l)
            depth_l, conf_l = self._predict_depth(
                feats_l, proj_mats_l, depth_values, l, train)
            results[f"depth_{l}"] = depth_l
            results[f"confidence_{l}"] = conf_l
            depth_prev = depth_l
        return results

    def __call__(self, imgs: Array, proj_mats: Array,
                 init_depth_min: Array | float,
                 depth_interval: Array | float,
                 train: bool = False) -> dict[str, Array]:
        """imgs: (B, V, H, W, 3) normalized images;
        proj_mats: (B, V-1, levels, 3, 4), level index fine->coarse;
        init_depth_min / depth_interval: scalar or (B,).

        Returns {'depth_l': (B, h_l, w_l), 'confidence_l': ...} for l=0,1,2.
        """
        feats = self.features(imgs, train)
        return self.from_features(feats, proj_mats, init_depth_min,
                                  depth_interval, train)
