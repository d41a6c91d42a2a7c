"""Batch-1 per-stage decomposition of the L1/L0 patch sampler (post-fusion).

Where do the remaining warp+cost milliseconds sit after the fused-split
gather (one S*128-lane row per group) and the g=16 group candidate?
Times pack / coords+stats / gather / epilogue / full view / full level
with devtime.device_time. Run on the TPU:
    python -u scripts/probe_l1b1.py [l1|l0|l2]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    level = sys.argv[1] if len(sys.argv) > 1 else "l1"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.utils.devtime import device_time
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.ops.grid_sample import pack_patches
    from casmvsnet_pl_tpu.ops.banded_take import batched_take
    from casmvsnet_pl_tpu.kernels.patch_epilogue import epilogue_fwd

    B, V = 1, 3
    H, W = 512, 640
    if os.environ.get("EVALRES"):
        H, W = 864, 1152
    cfgs = {"l0": (0, 8, H, W, 8), "l1": (1, 32, H // 2, W // 2, 16),
            "l2": (2, 48, H // 4, W // 4, 32)}
    l, D, h, w, C = cfgs[level]
    hw = h * w
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    pcfg = ps.patch_config(C, D)
    S, ph, pw = pcfg["split"], pcfg["ph"], pcfg["pw"]
    g = max(gg for gg in pcfg["groups"])
    ng = D // g
    print(f"L{l}: D={D} {h}x{w} C={C} split={S} g={g} ng={ng} "
          f"rows/view={ng*hw}", flush=True)

    feat = jnp.asarray(rng.rand(h, w, C).astype(np.float32)).astype(dtype)
    proj_np = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]), (B, V - 1, 1, 1)
                      ).astype(np.float32)
    proj_np[..., 0, 3] = 3.0
    proj = jnp.asarray(proj_np)
    dv = jnp.asarray((425.0 + 2.65 * np.arange(D, dtype=np.float32))
                     [None, :, None, None] * np.ones((B, D, h, w), np.float32))

    def t(label, fn, *a):
        dt = device_time(fn, *a, iters=12)
        print(f"{label:34s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    # 1. pack (per view)
    def pk(f):
        cs = C // S
        return jnp.concatenate([pack_patches(f[..., i*cs:(i+1)*cs], ph, pw)
                                for i in range(S)], axis=-1)
    t("pack table", pk, feat)
    table = pk(feat)[None]                                   # (1, Ht, Wt, S*L)
    Ht, Wt = table.shape[1], table.shape[2]

    # 2. coords + stats (everything in _patch_view before _patch_sample)
    def coords_stats(proj, dv):
        c = jax.vmap(lambda p, d: ps.project_to_src(p, d, h, w))(
            proj[:, 0], dv)
        xf = c[..., 0].astype(jnp.float32).reshape(B, D, hw)
        yf = c[..., 1].astype(jnp.float32).reshape(B, D, hw)
        validf = ((xf > -1.0) & (xf < float(w)) & (yf > -1.0)
                  & (yf < float(h)))
        big = jnp.float32(1e9)
        ar = xf.reshape(B, ng, g, hw)
        vr = validf.reshape(B, ng, g, hw)
        mnx = jnp.min(jnp.where(vr, ar, big), axis=2)
        mxx = jnp.max(jnp.where(vr, ar, -big), axis=2)
        br = yf.reshape(B, ng, g, hw)
        mny = jnp.min(jnp.where(vr, br, big), axis=2)
        mxy = jnp.max(jnp.where(vr, br, -big), axis=2)
        return mnx, mxx, mny, mxy, xf, yf
    t("coords+stats", coords_stats, proj, dv)
    mnx, mxx, mny, mxy, xf, yf = jax.jit(coords_stats)(proj, dv)
    x_org = jnp.clip(jnp.floor(mnx), -1.0, w - 1.0)
    y_org = jnp.clip(jnp.floor(mny), -1.0, h - 1.0)
    xi = x_org.astype(jnp.int32) + 1
    yi = y_org.astype(jnp.int32) + 1
    idx = (yi * Wt + xi).reshape(B, -1)

    # 3. gather
    def gat(tab, idx):
        return batched_take(tab.reshape(B, Ht * Wt, -1), idx)
    t("gather (fused rows)", gat, table, idx)
    rows = jax.jit(gat)(table, idx)

    # 4. epilogue (all splits)
    x = xf.reshape(B, ng, g, hw); y = yf.reshape(B, ng, g, hw)
    valid = ((x > -1.0) & (x < float(w)) & (y > -1.0) & (y < float(h)))
    fx, fy = ps._patch_frac(x, y, valid, x_org, y_org, ph, pw)
    L = 128

    def epi(rows, fx, fy):
        r = rows.reshape(B, ng, hw, S, L)
        outs = []
        for s in range(S):
            rowsT = jnp.swapaxes(r[:, :, :, s], -1, -2)
            outs.append(epilogue_fwd(rowsT, fx, fy, ph, pw))
        o = outs[0] if S == 1 else jnp.concatenate(outs, axis=3)
        return jnp.swapaxes(o.reshape(B, D, C, hw), -1, -2)
    t("transpose+epilogue+out-T", epi, rows, fx, fy)

    # 5. full single view + 6. full level (2 views + variance)
    def one_view(tab, proj, dv):
        return ps._patch_view(tab, proj[:, 0], dv, h, w, ph, pw,
                              pcfg["groups"], S, 0)
    t("FULL _patch_view (1 view)", one_view, table, proj, dv)

    feats = jnp.asarray(rng.rand(B, V, h, w, C).astype(np.float32)).astype(dtype)
    def full(fe, pr, d):
        return ps.build_cost_volume(fe, pr, d, remat=False, sampling="patch")
    t("FULL level (2 views+var)", full, feats, proj, dv)


def fine():
    """Split the transpose+epilogue chain: swapaxes vs kernel vs out-T."""
    level = sys.argv[2] if len(sys.argv) > 2 else "l1"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.utils.devtime import device_time
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.kernels.patch_epilogue import epilogue_fwd

    B, H, W = 1, 512, 640
    if os.environ.get("EVALRES"):
        H, W = 864, 1152
    cfgs = {"l0": (8, H, W, 8), "l1": (32, H // 2, W // 2, 16),
            "l2": (48, H // 4, W // 4, 32)}
    D, h, w, C = cfgs[level]
    hw = h * w
    pcfg = ps.patch_config(C, D)
    S, ph, pw = pcfg["split"], pcfg["ph"], pcfg["pw"]
    g = max(pcfg["groups"])
    ng = D // g
    L = 128
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.rand(B, ng * hw, S * L).astype(np.float32)
                       ).astype(jnp.bfloat16)
    fx = jnp.asarray(rng.rand(B, ng, g, hw).astype(np.float32) * 3)
    fy = jnp.asarray(rng.rand(B, ng, g, hw).astype(np.float32) * 3)

    def t(label, fn, *a):
        dt = device_time(fn, *a, iters=12)
        print(f"{label:34s} {dt * 1e3:8.3f} ms", flush=True)

    def transpose_only(rows):
        r = rows.reshape(B, ng, hw, S, L)
        return tuple(jnp.swapaxes(r[:, :, :, s], -1, -2) + 0.0
                     for s in range(S))
    t(f"L{level[1]} rowsT transposes (S={S})", transpose_only, rows)

    rTs = jax.jit(transpose_only)(rows)

    def kernel_only(rTs, fx, fy):
        outs = [epilogue_fwd(rTs[s], fx, fy, ph, pw) for s in range(S)]
        return outs[0] if S == 1 else jnp.concatenate(outs, axis=3)
    t("kernel only (pre-transposed)", kernel_only, rTs, fx, fy)

    oT = jax.jit(kernel_only)(rTs, fx, fy)

    def out_t(o):
        return jnp.swapaxes(o.reshape(B, D, C, hw), -1, -2) + 0.0
    t("out transpose", out_t, oT.reshape(B, ng, g, C, hw))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fine":
        fine()
    else:
        main()
