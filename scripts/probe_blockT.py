"""Probe: eval-res L0 single-view warp — block lane-epilogue vs transposed
kernel vs forced patch.

Eval-res (1152x864) L0 runs aligned-block sampling (patch tables are past
the ~340K gather row cliff, _resolve_sampling). The block tap-select
epilogue is the same lane-layout hat pattern the transposed Pallas kernel
(kernels/patch_epilogue.py) replaced at train res. Variants:

  block   current _block_view (hat lanes * rows, stacked-identity MXU dot)
  blockT  same gather, epilogue via the transposed kernel (ng=D, g=1)
  patch   forced patch sampling: 4x4 patch table ((H+2)(W+2)=999K rows,
          256 MB bf16 — past every measured gather budget) but g-shared
          rows: D/g gathers per pixel + the kernel epilogue. Measures the
          slow-regime gather rate at this unprobed table size.

Usage: python scripts/probe_blockT.py [block blockT patch]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from probe_patch import rig_proj


def main():
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.kernels import epilogue_fwd
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.ops.geometry import project_to_src
    from casmvsnet_pl_tpu.ops.grid_sample import pack_blocks, pack_patches
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B, D, C = 1, 8, 8
    H, W = 864, 1152
    hw = H * W
    baseline = float(sys.argv[1]) if len(sys.argv) > 1 and \
        sys.argv[1].replace(".", "").isdigit() else 12.0
    modes = [a for a in sys.argv[1:] if not a.replace(".", "").isdigit()] \
        or ["block", "blockT", "patch"]
    rng = np.random.RandomState(0)
    ref, src = rig_proj(baseline, W, H)
    rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
    proj = jnp.asarray(np.tile(rel, (B, 1, 1)))
    base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * 2.65
    depths = jnp.asarray(np.tile(base[:, None, None],
                                 (B, 1, H, W)).astype(np.float32))
    feat = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    align = ps.block_align(C, H, W)
    print(f"eval-res L0: {W}x{H} C={C} D={D} align={align} "
          f"baseline={baseline}", flush=True)

    def block(feat, proj, depths):
        table = jax.vmap(lambda f: pack_blocks(f, align))(feat)
        return jnp.sum(ps._block_view(table, proj, depths, H, W, align))

    def blockT(feat, proj, depths):
        table = jax.vmap(lambda f: pack_blocks(f, align))(feat)
        Bt, Ht, nxb, L = table.shape
        coords = jax.vmap(
            lambda p, d: project_to_src(p, d, H, W))(proj, depths)
        x = coords[..., 0].astype(jnp.float32).reshape(B, D, hw)
        y = coords[..., 1].astype(jnp.float32).reshape(B, D, hw)
        valid = ((x > -1.0) & (x < float(W)) &
                 (y > -1.0) & (y < float(H)))
        xi = jnp.clip(jnp.floor(x).astype(jnp.int32) + 1, 0, W)
        yi = jnp.clip(jnp.floor(y).astype(jnp.int32) + 1, 0, H)
        xb = xi // align
        idx = (yi * nxb + xb).reshape(B, -1)
        rows = ps._patch_gather(table, idx)                  # (B, D*hw, L)
        rowsT = jnp.swapaxes(rows.reshape(B, D, hw, L), -1, -2)
        fx = jnp.where(valid, x - (xb * align - 1).astype(jnp.float32),
                       -9.0)[:, :, None, :]
        fy = (y - (yi - 1).astype(jnp.float32))[:, :, None, :]
        o = epilogue_fwd(rowsT, fx, fy, 2, align + 1)        # (B,D,1,C,hw)
        return jnp.sum(jnp.swapaxes(o.reshape(B, D, C, hw), -1, -2))

    def patch(feat, proj, depths):
        cfg = ps.patch_config(C, D)
        # Fused-split layout: (B, Ht, Wt, S*L); here split=1 so the vmap'd
        # pack_patches table is already the right shape.
        table = jax.vmap(
            lambda f: pack_patches(f, cfg["ph"], cfg["pw"]))(feat)
        return jnp.sum(ps._patch_view(table, proj, depths, H, W,
                                      cfg["ph"], cfg["pw"], cfg["groups"],
                                      split=cfg.get("split", 1)))

    fns = {"block": block, "blockT": blockT, "patch": patch}
    for mode in modes:
        t = device_time(fns[mode], feat, proj, depths, iters=8)
        n = B * D * hw
        print(f"L0 eval-res warp {mode:7s}: {t*1e3:7.2f} ms/view "
              f"({t/n*1e9:.2f} ns/sample)", flush=True)


if __name__ == "__main__":
    main()
