"""Probe: patch-shared gathers — one 128-lane row serving a GROUP of samples.

The forward warp is gather-bound: one table row per (pixel, depth, view)
sample at a flat ~2.4-3.4 ns/row charge independent of row width
(PERF_NOTES.md). The only remaining lever is FEWER rows: gather one
Ph x Pw x C patch row (<=128 lanes) whose texels cover the bilinear
supports of a whole group of consecutive depth hypotheses, then extract
every sample with hat weights on constant lane iotas + one
stacked-identity matmul (the _block_view epilogue pattern).

Part 1 (CPU): span statistics of sample groups under realistic convergent
DTU-like geometry — how often does a group's bilinear support actually fit
a Ph x Pw patch (the exactness condition)?

Part 2 (TPU): device time of the patch-gather sampler vs the production
quad sampler at train-res level geometries.

Usage: python scripts/probe_patch.py [spans|time]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# Realistic convergent rig (DTU-like): cameras on a ~650 mm sphere looking at
# the object at the origin; focal 2892.33 px at 1600 width -> 1157 at 640.
# ---------------------------------------------------------------------------

def _lookat(center):
    z = -center / np.linalg.norm(center)          # optical axis toward origin
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])                        # world->cam rows
    t = -R @ center
    E = np.eye(4); E[:3, :3] = R; E[:3, 3] = t
    return E


def rig_proj(baseline_mm: float, W: int = 640, H: int = 512,
             radius: float = 650.0, elev_frac: float = 0.35):
    """(ref, src) 4x4 abs projections with baseline |C_src - C_ref|."""
    f = 2892.33 * W / 1600.0
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    th = baseline_mm / radius
    c_ref = np.array([0.0, 0.0, -radius])
    c_src = radius * np.array([np.sin(th * 0.9), np.sin(th * 0.45), 0.0])
    c_src[2] = -np.sqrt(radius ** 2 - c_src[0] ** 2 - c_src[1] ** 2)
    mats = []
    for c in (c_ref, c_src):
        E = _lookat(c)
        P = np.eye(4)
        P[:3] = K @ E[:3]
        mats.append(P)
    return mats[0], mats[1]


def src_coords(proj, depths, H, W):
    """Project the ref pixel grid at given depths into src. depths: (D,)."""
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    grid = np.stack([u, v, np.ones_like(u)], -1).reshape(-1, 3)   # (HW, 3)
    R, T = proj[:3, :3], proj[:3, 3]
    pts = (grid @ R.T)[None] * depths[:, None, None] + T          # (D, HW, 3)
    z = pts[..., 2]
    xy = pts[..., :2] / np.where(np.abs(z) < 1e-9, 1e-9, z)[..., None]
    return xy - 0.5, z  # match align_corners pixel-center convention loosely


def span_stats(level: int, baselines, d_groups, n_depths: int,
               interval: float, W0=640, H0=512):
    """Print group-span quantiles + patch-fit rates for one cascade level."""
    s = 2 ** level
    H, W = H0 // s, W0 // s
    for b in baselines:
        ref, src = rig_proj(b, W, H)
        rel = src @ np.linalg.inv(ref)
        # hypotheses: recentered window around plausible surface depths
        for d0 in (500.0, 650.0, 800.0):
            step = interval * (2 ** level if level else 1.0)
            depths = d0 + (np.arange(n_depths) - n_depths / 2) * step
            xy, z = src_coords(rel[:3], depths, H, W)
            x = xy[..., 0].reshape(n_depths, -1)
            y = xy[..., 1].reshape(n_depths, -1)
            valid = ((x > -1) & (x < W) & (y > -1) & (y < H) & (z.reshape(
                n_depths, -1) > 0))
            for g in d_groups:
                ng = n_depths // g
                xs = x.reshape(ng, g, -1); ys = y.reshape(ng, g, -1)
                vs = valid.reshape(ng, g, -1)
                big = 1e9
                sx = (np.max(np.where(vs, xs, -big), 1) -
                      np.min(np.where(vs, xs, big), 1))
                sy = (np.max(np.where(vs, ys, -big), 1) -
                      np.min(np.where(vs, ys, big), 1))
                any_v = vs.any(1)
                sx = sx[any_v]; sy = sy[any_v]
                sx = np.clip(sx, 0, None); sy = np.clip(sy, 0, None)
                q = lambda a: np.quantile(a, [0.5, 0.99, 1.0])
                # fit rates for candidate patches (x_span <= Pw-2, y <= Ph-2)
                fits = {}
                for (ph, pw) in ((4, 4), (3, 5), (2, 8), (4, 6), (2, 4),
                                 (4, 2), (3, 3)):
                    fits[f"{ph}x{pw}"] = float(
                        ((sx <= pw - 2) & (sy <= ph - 2)).mean())
                fs = " ".join(f"{k}:{v:.3f}" for k, v in fits.items())
                print(f"L{level} b={b:>3.0f} d0={d0:.0f} g={g}: "
                      f"span_x q50/99/max={q(sx)[0]:.2f}/{q(sx)[1]:.2f}/"
                      f"{q(sx)[2]:.2f} span_y={q(sy)[0]:.2f}/{q(sy)[1]:.2f}/"
                      f"{q(sy)[2]:.2f}  fit[{fs}]")


def run_spans():
    print("== per-depth-group spans, convergent DTU-like rig ==")
    # L0: D=8, interval 2.65 (ratio 1); L1: D=32, step 5.3; L2: D=48, 10.6
    span_stats(0, (20, 50, 100, 150), (2, 4, 8), 8, 2.65)
    span_stats(1, (20, 50, 100, 150), (2, 4, 8), 32, 2.65)
    span_stats(2, (20, 50, 100, 150), (4, 8), 48, 2.65)


# ---------------------------------------------------------------------------
# Part 2: TPU timing
# ---------------------------------------------------------------------------

def _patch_view(table, proj_mat, depth_values, height, width, ph, pw,
                group, n_charge=1):
    """Patch-shared sampling of one src view (timing probe version).

    table: (B, Ht, Wt, ph*pw*C) stride-1 patch table (origin yi, xi covers
    padded pixels [yi-1 : yi-1+ph) x [xi-1 : xi-1+pw)); one gather per
    (pixel, depth-group). Overflowing samples clamp (timing probe only).
    """
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.geometry import project_to_src

    B, Ht, Wt, L = table.shape
    C = L // (ph * pw)
    D = depth_values.shape[1]
    ng = D // group
    hw = height * width
    dtype = table.dtype

    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    x = coords[..., 0].astype(jnp.float32).reshape(B, ng, group, hw)
    y = coords[..., 1].astype(jnp.float32).reshape(B, ng, group, hw)
    valid = ((x > -1.0) & (x < float(width)) &
             (y > -1.0) & (y < float(height)))
    big = jnp.float32(1e9)
    x_org = jnp.clip(jnp.floor(jnp.min(jnp.where(valid, x, big), axis=2)),
                     -1.0, width - 1.0)
    y_org = jnp.clip(jnp.floor(jnp.min(jnp.where(valid, y, big), axis=2)),
                     -1.0, height - 1.0)
    xi = x_org.astype(jnp.int32) + 1
    yi = y_org.astype(jnp.int32) + 1
    idx = (yi * Wt + xi).reshape(B, -1)                    # (B, ng*hw)

    table_bytes = B * Ht * Wt * L * table.dtype.itemsize
    if table_bytes <= 24 * 1024 * 1024 or B == 1:
        flat = table.reshape(B * Ht * Wt, L)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
        rows = jnp.take(flat, fidx.reshape(-1), axis=0)
    else:
        rows = jnp.stack([
            jnp.take(table[b].reshape(Ht * Wt, L), idx[b], axis=0)
            for b in range(B)])
    rows = rows.reshape(B, ng, 1, hw, L)

    wt = jnp.float32 if n_charge == 1 else jnp.bfloat16  # reuse arg: see run
    fx1 = jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0)[..., None].astype(wt)
    fy1 = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None].astype(wt)
    vm = valid[..., None]
    lane = np.arange(L)
    dxl = jnp.asarray(((lane // C) % pw).astype(np.float32), wt)
    dyl = jnp.asarray((lane // (pw * C)).astype(np.float32), wt)
    one = jnp.asarray(1.0, wt)
    zero = jnp.asarray(0.0, wt)
    w = jnp.where(vm,
                  jnp.maximum(zero, one - jnp.abs(fx1 - dxl)) *
                  jnp.maximum(zero, one - jnp.abs(fy1 - dyl)), zero)
    prod = rows * w.astype(dtype)                          # (B,ng,g,hw,L)
    from casmvsnet_pl_tpu.ops.plane_sweep import _identity_stack
    kmat = jnp.asarray(_identity_stack(C, ph * pw), dtype)
    o = jax.lax.dot_general(
        prod.reshape(B, D * hw, L), kmat,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o.reshape(B, D, hw, C)


def _pack_patches(feat, ph, pw):
    """(H, W, C) -> (H+ph-1?, ...) stride-1 patch table, zero padded."""
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.grid_sample import _extract_patches
    p = jnp.pad(feat, ((1, ph), (1, pw), (0, 0)))
    return _extract_patches(p[None], ph, pw)[0]


def _patch_view_v2(table, proj_mat, depth_values, height, width, ph, pw,
                   group, separable=True):
    """Patch-shared sampling, tuned epilogue.

    Differences vs _patch_view: hat weights are built on SMALL (N, Ph)/(N,
    Pw) tensors in f32, cast to the feature dtype, then broadcast-expanded
    to lanes (constant masks) — no (N, L) f32 intermediates. `separable`
    contracts y first (L -> Pw*C via stacked-identity dot), then x.
    """
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.geometry import project_to_src
    from casmvsnet_pl_tpu.ops.plane_sweep import _identity_stack

    B, Ht, Wt, L = table.shape
    C = L // (ph * pw)
    D = depth_values.shape[1]
    ng = D // group
    hw = height * width
    dtype = table.dtype

    coords = jax.vmap(
        lambda p, d: project_to_src(p, d, height, width))(proj_mat,
                                                          depth_values)
    x = coords[..., 0].astype(jnp.float32).reshape(B, ng, group, hw)
    y = coords[..., 1].astype(jnp.float32).reshape(B, ng, group, hw)
    valid = ((x > -1.0) & (x < float(width)) &
             (y > -1.0) & (y < float(height)))
    big = jnp.float32(1e9)
    x_org = jnp.clip(jnp.floor(jnp.min(jnp.where(valid, x, big), axis=2)),
                     -1.0, width - 1.0)
    y_org = jnp.clip(jnp.floor(jnp.min(jnp.where(valid, y, big), axis=2)),
                     -1.0, height - 1.0)
    xi = x_org.astype(jnp.int32) + 1
    yi = y_org.astype(jnp.int32) + 1
    idx = (yi * Wt + xi).reshape(B, -1)                    # (B, ng*hw)

    flat = table.reshape(B * Ht * Wt, L)
    fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
    rows = jnp.take(flat, fidx.reshape(-1), axis=0).reshape(B, ng, 1, hw, L)

    # small hats: (B, ng, g, hw, P) f32 -> cast -> lane-expand via constant
    # 0/1 masks (a broadcast, free in the fusion)
    fx = jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0)[..., None]
    fy = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None]
    vmf = valid.astype(jnp.float32)[..., None]
    kx = jnp.arange(pw, dtype=jnp.float32)
    ky = jnp.arange(ph, dtype=jnp.float32)
    hx = (jnp.maximum(0.0, 1.0 - jnp.abs(fx - kx)) * vmf).astype(dtype)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - ky)).astype(dtype)

    lane = np.arange(L)

    def expand(h, of, nl):
        """(..., P) per-sample scalars -> (..., nl) via constant 0/1 masks."""
        out = None
        for p in range(h.shape[-1]):
            m = jnp.asarray((of == p).astype(np.float32), dtype)
            term = h[..., p:p + 1] * m
            out = term if out is None else out + term
        return out

    if separable:
        # stage 1: contract y. wy lane value = hy[dy] at lane (dy*pw+dx)*C+c
        dy_of = (lane // (pw * C)).astype(np.int32)
        wy = expand(hy, dy_of, L)                          # (B,ng,g,hw,L)
        py = rows * wy
        # collapse the ph y-blocks: lanes are (dy, dx, c) -> (dx, c)
        k1 = jnp.asarray(np.tile(np.eye(pw * C, dtype=np.float32),
                                 (ph, 1)), dtype)
        s1 = jax.lax.dot_general(
            py.reshape(B, D * hw, L), k1,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (B,N,pw*C)
        lane2 = np.arange(pw * C)
        dx_of2 = (lane2 // C).astype(np.int32)
        wx2 = expand(hx, dx_of2, pw * C).reshape(B, D * hw, pw * C)
        k2 = jnp.asarray(np.tile(np.eye(C, dtype=np.float32), (pw, 1)),
                         jnp.float32)
        o = jax.lax.dot_general(
            s1 * wx2.astype(jnp.float32), k2,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return o.reshape(B, D, hw, C)

    dx_of = ((lane // C) % pw).astype(np.int32)
    dy_of = (lane // (pw * C)).astype(np.int32)
    w = expand(hx, dx_of, L) * expand(hy, dy_of, L)
    prod = rows * w                                        # (B,ng,g,hw,L)
    kmat = jnp.asarray(_identity_stack(C, ph * pw), dtype)
    o = jax.lax.dot_general(
        prod.reshape(B, D * hw, L), kmat,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o.reshape(B, D, hw, C)


def run_time():
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.plane_sweep import _sample_view, _pack_tables
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B = 2
    rng = np.random.RandomState(0)

    def mk_geom(level, D, C):
        s = 2 ** level
        H, W = 512 // s, 640 // s
        ref, src = rig_proj(50.0, W, H)
        rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
        proj = np.tile(rel, (B, 1, 1))
        d0 = 650.0
        step = 2.65 * (2 ** level if level else 1.0)
        base = d0 + (np.arange(D, dtype=np.float32) - D / 2) * step
        depths = np.tile(base[:, None, None], (B, 1, H, W)).reshape(
            B, D, H, W).astype(np.float32)
        feat = rng.randn(B, H, W, C).astype(np.float32)
        return (jnp.asarray(feat, jnp.bfloat16), jnp.asarray(proj),
                jnp.asarray(depths), H, W)

    cases = [
        ("L0", 0, 8, 8, [(4, 4, 4), (4, 4, 8), (3, 3, 2)]),
        ("L1", 1, 32, 16, [(2, 4, 4), (2, 4, 8)]),
        ("L2", 2, 48, 32, []),
    ]
    for name, level, D, C, patch_cfgs in cases:
        feat, proj, depths, H, W = mk_geom(level, D, C)
        n = B * D * H * W

        def quad_fn(feat, proj, depths):
            tables = _pack_tables(feat[:, None], {"mode": "quad"})
            return _sample_view(tables[:, 0], proj, depths, H, W,
                                {"mode": "quad"})

        t = device_time(quad_fn, feat, proj, depths, iters=32)
        print(f"{name} quad: {t*1e3:7.2f} ms  ({t/n*1e9:.2f} ns/sample, "
              f"{n} samples)", flush=True)

        for ph, pw, g in patch_cfgs:
            if ph * pw * C > 128:
                continue
            for wdtype in (1, 2):      # 1 = f32 weight build, 2 = bf16
                def patch_fn(feat, proj, depths, ph=ph, pw=pw, g=g,
                             wd=wdtype):
                    table = jax.vmap(
                        lambda f: _pack_patches(f, ph, pw))(feat)
                    return _patch_view(table, proj, depths, H, W, ph, pw,
                                       g, n_charge=wd)

                t = device_time(patch_fn, feat, proj, depths, iters=32)
                tag = "wf32" if wdtype == 1 else "wbf16"
                print(f"{name} patch {ph}x{pw} g={g} {tag}: "
                      f"{t*1e3:7.2f} ms  ({t/n*1e9:.2f} ns/sample)",
                      flush=True)


def run_decomp():
    """Stage-by-stage decomposition of the patch path at L0 g=8 (4x4)."""
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.geometry import project_to_src
    from casmvsnet_pl_tpu.ops.plane_sweep import _identity_stack
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B, D, C, ph, pw, g = 2, 8, 8, 4, 4, 8
    H, W = 512, 640
    rng = np.random.RandomState(0)
    ref, src = rig_proj(50.0, W, H)
    rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
    proj = jnp.asarray(np.tile(rel, (B, 1, 1)))
    base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * 2.65
    depths = jnp.asarray(np.tile(base[:, None, None],
                                 (B, 1, H, W)).astype(np.float32))
    feat = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    n = B * D * H * W
    ng = D // g
    hw = H * W
    L = ph * pw * C

    def stage_coords(feat, proj, depths):
        coords = jax.vmap(
            lambda p, d: project_to_src(p, d, H, W))(proj, depths)
        return jnp.sum(coords)

    def _origins(proj, depths):
        coords = jax.vmap(
            lambda p, d: project_to_src(p, d, H, W))(proj, depths)
        x = coords[..., 0].astype(jnp.float32).reshape(B, ng, g, hw)
        y = coords[..., 1].astype(jnp.float32).reshape(B, ng, g, hw)
        valid = ((x > -1.0) & (x < float(W)) & (y > -1.0) & (y < float(H)))
        big = jnp.float32(1e9)
        x_org = jnp.clip(jnp.floor(jnp.min(jnp.where(valid, x, big), 2)),
                         -1.0, W - 1.0)
        y_org = jnp.clip(jnp.floor(jnp.min(jnp.where(valid, y, big), 2)),
                         -1.0, H - 1.0)
        return x, y, valid, x_org, y_org

    def stage_origin(feat, proj, depths):
        x, y, valid, x_org, y_org = _origins(proj, depths)
        return jnp.sum(x_org) + jnp.sum(y_org)

    def _rows(feat, proj, depths):
        x, y, valid, x_org, y_org = _origins(proj, depths)
        table = jax.vmap(lambda f: _pack_patches(f, ph, pw))(feat)
        Ht, Wt = table.shape[1], table.shape[2]
        xi = x_org.astype(jnp.int32) + 1
        yi = y_org.astype(jnp.int32) + 1
        idx = (yi * Wt + xi).reshape(B, -1)
        flat = table.reshape(B * Ht * Wt, L)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
        rows = jnp.take(flat, fidx.reshape(-1),
                        axis=0).reshape(B, ng, 1, hw, L)
        return rows, x, y, valid, x_org, y_org

    def stage_gather(feat, proj, depths):
        rows = _rows(feat, proj, depths)[0]
        return jnp.sum(rows.astype(jnp.float32))

    def stage_full(feat, proj, depths):
        rows, x, y, valid, x_org, y_org = _rows(feat, proj, depths)
        fx1 = jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0)[..., None]
        fy1 = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None]
        vm = valid.astype(jnp.float32)[..., None]
        lane = np.arange(L)
        dxl = jnp.asarray(((lane // C) % pw).astype(np.float32))
        dyl = jnp.asarray((lane // (pw * C)).astype(np.float32))
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - dxl)) *
             jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - dyl)) * vm)
        prod = rows * w.astype(jnp.bfloat16)
        kmat = jnp.asarray(_identity_stack(C, ph * pw), jnp.bfloat16)
        o = jax.lax.dot_general(
            prod.reshape(B, D * hw, L), kmat,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.sum(o)

    def stage_wonly(feat, proj, depths):
        # weights + dot WITHOUT the gathered rows (constant rows)
        rows, x, y, valid, x_org, y_org = _rows(feat, proj, depths)
        fx1 = jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0)[..., None]
        fy1 = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None]
        vm = valid.astype(jnp.float32)[..., None]
        lane = np.arange(L)
        dxl = jnp.asarray(((lane // C) % pw).astype(np.float32))
        dyl = jnp.asarray((lane // (pw * C)).astype(np.float32))
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - dxl)) *
             jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - dyl)) * vm)
        return jnp.sum(w.astype(jnp.bfloat16).astype(jnp.float32))

    for name, fn in (("coords", stage_coords), ("origin", stage_origin),
                     ("gather", stage_gather), ("wbuild", stage_wonly),
                     ("full", stage_full)):
        t = device_time(fn, feat, proj, depths, iters=32)
        print(f"decomp {name}: {t*1e3:7.2f} ms ({t/n*1e9:.2f} ns/sample)",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "spans"
    if mode == "spans":
        run_spans()
    elif mode == "decomp":
        run_decomp()
    else:
        run_time()
