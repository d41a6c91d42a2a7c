"""Probe: decompose the eval-res L1 warp+cost — the largest remaining
whale (59.8 of 207.7 ms/view, round-5 final profile).

Pieces per source view at 432x576, D=32, C=16, split-2, g=16 (ng=2):
pack (table build), coords+stats (projection, group min/max, fracs),
gather (banded), epilogue (Mosaic kernel x2 splits), and the full
_sample_view for reference. Also times the 3-lane prob conv of the L2
CostRegNet (Co=1 -> N=3 lanes) plain vs width-folded — the last
unprobed small-channel conv.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

from probe_patch import rig_proj

rng = np.random.RandomState(0)


def main():
    from casmvsnet_pl_tpu.kernels import epilogue_fwd
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.ops.banded_take import (banded_gather_rows,
                                                  gather_band_cfg)
    from casmvsnet_pl_tpu.ops.geometry import project_to_src
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B, D, C = 1, 32, 16
    H, W = 432, 576
    hw = H * W
    Ht, Wt = H + 2, W + 2
    cfg = ps._resolve_sampling("auto", C, D, H, W, 2)
    assert cfg["mode"] == "patch", cfg
    ph, pw, S = cfg["ph"], cfg["pw"], cfg["split"]
    g = max(cfg["groups"])
    ng = D // g
    L = ph * pw * (C // S)

    ref, src = rig_proj(12.0, W, H)
    rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
    proj = jnp.asarray(np.tile(rel, (B, 1, 1)))
    base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * 2.65 * 2
    dv = jnp.asarray(np.tile(base[:, None, None],
                             (B, 1, H, W)).astype(np.float32))
    feat = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)

    def t(label, fn, *a, iters=12):
        dt = device_time(fn, *a, iters=iters)
        print(f"L1 eval {label:26s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    t("pack (fused-split table)", lambda f: jnp.sum(
        ps._pack_tables(f[:, None], cfg).astype(jnp.float32)), feat)

    table = jax.jit(lambda f: ps._pack_tables(f[:, None], cfg))(feat)
    table = jax.block_until_ready(table)

    def coords_stats(proj, dv):
        coords = jax.vmap(
            lambda p, d: project_to_src(p, d, H, W))(proj, dv)
        x = coords[..., 0].astype(jnp.float32).reshape(B, D, hw)
        y = coords[..., 1].astype(jnp.float32).reshape(B, D, hw)
        valid = ((x > -1.0) & (x < float(W)) & (y > -1.0) & (y < float(H)))
        xg = x.reshape(B, ng, g, hw)
        yg = y.reshape(B, ng, g, hw)
        vg = valid.reshape(B, ng, g, hw)
        big = jnp.float32(1e9)
        x_org = jnp.clip(jnp.floor(
            jnp.min(jnp.where(vg, xg, big), axis=2)), -1.0, W - 1.0)
        y_org = jnp.clip(jnp.floor(
            jnp.min(jnp.where(vg, yg, big), axis=2)), -1.0, H - 1.0)
        fx, fy = ps._patch_frac(xg, yg, vg, x_org, y_org, ph, pw)
        idx = ((y_org.astype(jnp.int32) + 1) * Wt
               + x_org.astype(jnp.int32) + 1).reshape(B, -1)
        vmask = jnp.any(vg, axis=2).reshape(B, -1)
        return fx, fy, idx, vmask

    t("coords+stats+fracs", lambda p, d: jnp.sum(
        coords_stats(p, d)[0]), proj, dv)
    fx, fy, idx, vmask = jax.block_until_ready(jax.jit(coords_stats)(proj, dv))

    bg = gather_band_cfg(Ht * Wt, Wt, H, W, S * L * 2)
    print(f"  gather_band_cfg -> {bg}", flush=True)
    tb = table.reshape(B, Ht * Wt, S * L)
    t("gather (banded)", lambda tb, i, v: jnp.sum(
        banded_gather_rows(tb, i, v, ng, H, W, Wt, *bg)
        .astype(jnp.float32)), tb, idx, vmask)

    rows = jax.block_until_ready(
        jax.jit(lambda tb, i, v: banded_gather_rows(
            tb, i, v, ng, H, W, Wt, *bg))(tb, idx, vmask))
    rows5 = rows.reshape(B, ng, hw, S, L)

    def epi(rows5, fx, fy):
        outs = []
        for s in range(S):
            rT = jnp.swapaxes(rows5[:, :, :, s], -1, -2)
            outs.append(epilogue_fwd(rT, fx, fy, ph, pw,
                                     out_dtype=jnp.bfloat16))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    t(f"epilogue kernel x{S}", epi, rows5, fx, fy)

    t("FULL _sample_view", lambda tb, p, d: jnp.sum(
        ps._sample_view(tb, p, d, H, W, cfg).astype(jnp.float32)),
      table[:, 0] if table.ndim == 5 else table, proj[:, 0] if proj.ndim == 4
      else proj, dv)

    # --- L2 prob conv (Co=1, N=3 lanes) --------------------------------
    from casmvsnet_pl_tpu.ops.conv3d import conv3x3x3
    xp = jnp.asarray(rng.randn(1, 48, 128, 160, 8), jnp.bfloat16)
    kp = jnp.asarray(rng.randn(3, 3, 3, 8, 1).astype(np.float32) * 0.1)
    for wf, name in ((False, "plain"), (True, "wfold F=4")):
        t(f"L2 prob conv {name}", lambda x, wf=wf: jnp.sum(
            conv3x3x3(x, kp, wfold=wf).astype(jnp.float32)), xp)


if __name__ == "__main__":
    main()
