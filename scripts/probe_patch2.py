"""Probe: patch-shared gather EPILOGUE variants.

probe_patch.py established (v5e, L0 train-res geometry, B=2, D=8, C=8):
quad baseline 18.3 ms/view; patch 4x4 g=8 total ~14.1 ms with the gather
at ~1.7 ms once per-batch unrolled — i.e. the hat-weight epilogue
(~12 ms for N=5.24M samples x 128 lanes) is the cost center, ~10-20x off
any bandwidth/VPU bound. This probe A/Bs epilogue formulations to find
the one XLA lowers well, then re-checks totals for g in {2, 4, 8} and the
L1 split-channel variant (two C=8 half-tables sharing one hat build).

Usage: python scripts/probe_patch2.py [epi|total|l1]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from probe_patch import rig_proj, _pack_patches


def _setup(level, D, C, B=2):
    import jax.numpy as jnp
    s = 2 ** level
    H, W = 512 // s, 640 // s
    rng = np.random.RandomState(0)
    ref, src = rig_proj(50.0, W, H)
    rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
    proj = np.tile(rel, (B, 1, 1))
    step = 2.65 * (2 ** level if level else 1.0)
    base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * step
    depths = np.tile(base[:, None, None], (B, 1, H, W)).astype(np.float32)
    feat = rng.randn(B, H, W, C).astype(np.float32)
    return (jnp.asarray(feat, jnp.bfloat16), jnp.asarray(proj),
            jnp.asarray(depths), H, W)


def _coords_origin(proj, depths, H, W, g):
    """Shared front half: project, group, window origin. Returns f32 parts."""
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.geometry import project_to_src
    B, D = depths.shape[:2]
    ng = D // g
    hw = H * W
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


def _gather_rows(table, x_org, y_org, B, ng, hw):
    """Per-batch-unrolled patch-row gather (fast-regime)."""
    import jax.numpy as jnp
    Ht, Wt, L = table.shape[1:]
    xi = x_org.astype(jnp.int32) + 1
    yi = y_org.astype(jnp.int32) + 1
    idx = (yi * Wt + xi).reshape(B, -1)
    table_bytes = B * Ht * Wt * L * table.dtype.itemsize
    if table_bytes <= 24 * 1024 * 1024 or B == 1:
        flat = table.reshape(B * Ht * Wt, L)
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
        rows = jnp.take(flat, fidx.reshape(-1), axis=0)
    else:
        rows = jnp.stack([
            jnp.take(table[b].reshape(Ht * Wt, L), idx[b], axis=0)
            for b in range(B)])
    return rows.reshape(B, ng, 1, hw, L)


def _epilogue(rows, x, y, valid, x_org, y_org, ph, pw, C, variant):
    """Hat-weight bilinear extraction: (B,ng,1,hw,L) rows -> (B,D*hw,C) f32."""
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.plane_sweep import _identity_stack
    B, ng, _, hw, L = rows.shape
    g = x.shape[2]
    D = ng * g
    dtype = rows.dtype
    lane = np.arange(L)
    dxl_np = ((lane // C) % pw).astype(np.float32)
    dyl_np = (lane // (pw * C)).astype(np.float32)
    kmat = jnp.asarray(_identity_stack(C, ph * pw), dtype)

    if variant == "base":
        fx1 = jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0)[..., None]
        fy1 = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None]
        vm = valid.astype(jnp.float32)[..., None]
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - jnp.asarray(dxl_np))) *
             jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - jnp.asarray(dyl_np))) * vm)
        prod = rows * w.astype(dtype)
    elif variant == "validfold":
        # valid folded into fx (invalid -> fx=-9 -> hat 0): one less (N,L) op
        fx1 = jnp.where(valid, jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0),
                        -9.0)[..., None]
        fy1 = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None]
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - jnp.asarray(dxl_np))) *
             jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - jnp.asarray(dyl_np))))
        prod = rows * w.astype(dtype)
    elif variant == "bf16hat":
        fx1 = jnp.where(valid, jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0),
                        -9.0)[..., None].astype(dtype)
        fy1 = jnp.clip(y - y_org[:, :, None], 0.0,
                       ph - 1.0)[..., None].astype(dtype)
        one = jnp.asarray(1.0, dtype)
        zero = jnp.asarray(0.0, dtype)
        w = (jnp.maximum(zero, one - jnp.abs(fx1 - jnp.asarray(dxl_np, dtype)))
             * jnp.maximum(zero,
                           one - jnp.abs(fy1 - jnp.asarray(dyl_np, dtype))))
        prod = rows * w
    elif variant == "twomult":
        # two sequential (N,L) multiplies: rows*hx then *hy — each hat is a
        # single max/abs chain, maybe better fusion than the 3-factor product
        fx1 = jnp.where(valid, jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0),
                        -9.0)[..., None]
        fy1 = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None]
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - jnp.asarray(dxl_np)))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - jnp.asarray(dyl_np)))
        prod = (rows * hx.astype(dtype)) * hy.astype(dtype)
    elif variant == "batchdot":
        fx1 = jnp.where(valid, jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0),
                        -9.0)[..., None]
        fy1 = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)[..., None]
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(fx1 - jnp.asarray(dxl_np))) *
             jnp.maximum(0.0, 1.0 - jnp.abs(fy1 - jnp.asarray(dyl_np))))
        prod = rows * w.astype(dtype)
        # contract L without the (B, D*hw, L) reshape of the broadcast
        o = jax.lax.dot_general(
            prod, kmat, dimension_numbers=(((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return o.reshape(B, D * hw, C)
    else:
        raise ValueError(variant)
    o = jax.lax.dot_general(
        prod.reshape(B, D * hw, L), kmat,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o


def patch_view(table, proj, depths, H, W, ph, pw, g, variant):
    B, D = depths.shape[:2]
    ng = D // g
    hw = H * W
    C = table.shape[-1] // (ph * pw)
    x, y, valid, x_org, y_org = _coords_origin(proj, depths, H, W, g)
    rows = _gather_rows(table, x_org, y_org, B, ng, hw)
    o = _epilogue(rows, x, y, valid, x_org, y_org, ph, pw, C, variant)
    return o.reshape(B, D, hw, C)


def run_epi():
    import jax
    from casmvsnet_pl_tpu.utils.devtime import device_time
    feat, proj, depths, H, W = _setup(0, 8, 8)
    B, D = depths.shape[:2]
    n = B * D * H * W
    ph, pw, g = 4, 4, 8
    for variant in ("base", "validfold", "bf16hat", "twomult", "batchdot"):
        def fn(feat, proj, depths, v=variant):
            table = jax.vmap(lambda f: _pack_patches(f, ph, pw))(feat)
            return patch_view(table, proj, depths, H, W, ph, pw, g, v)
        t = device_time(fn, feat, proj, depths, iters=32)
        print(f"L0 4x4 g=8 epi={variant}: {t*1e3:7.2f} ms "
              f"({t/n*1e9:.2f} ns/sample)", flush=True)


def run_total():
    import jax
    from casmvsnet_pl_tpu.ops.plane_sweep import _sample_view, _pack_tables
    from casmvsnet_pl_tpu.utils.devtime import device_time
    feat, proj, depths, H, W = _setup(0, 8, 8)
    B, D = depths.shape[:2]
    n = B * D * H * W

    def quad_fn(feat, proj, depths):
        tables = _pack_tables(feat[:, None], {"mode": "quad"})
        return _sample_view(tables[:, 0], proj, depths, H, W,
                            {"mode": "quad"})
    t = device_time(quad_fn, feat, proj, depths, iters=32)
    print(f"L0 quad: {t*1e3:7.2f} ms ({t/n*1e9:.2f} ns/sample)", flush=True)

    best = os.environ.get("EPI_VARIANT", "validfold")
    for g in (2, 4, 8):
        def fn(feat, proj, depths, g=g):
            table = jax.vmap(lambda f: _pack_patches(f, 4, 4))(feat)
            return patch_view(table, proj, depths, H, W, 4, 4, g, best)
        t = device_time(fn, feat, proj, depths, iters=32)
        print(f"L0 4x4 g={g} epi={best}: {t*1e3:7.2f} ms "
              f"({t/n*1e9:.2f} ns/sample)", flush=True)


def run_l1():
    """L1 split-channel: two C=8 half-tables, one shared hat build."""
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.ops.plane_sweep import _sample_view, _pack_tables
    from casmvsnet_pl_tpu.utils.devtime import device_time
    feat, proj, depths, H, W = _setup(1, 32, 16)
    B, D = depths.shape[:2]
    n = B * D * H * W

    def quad_fn(feat, proj, depths):
        tables = _pack_tables(feat[:, None], {"mode": "quad"})
        return _sample_view(tables[:, 0], proj, depths, H, W,
                            {"mode": "quad"})
    t = device_time(quad_fn, feat, proj, depths, iters=32)
    print(f"L1 quad: {t*1e3:7.2f} ms ({t/n*1e9:.2f} ns/sample)", flush=True)

    best = os.environ.get("EPI_VARIANT", "validfold")
    ph, pw = 4, 4
    for g in (4, 8):
        def fn(feat, proj, depths, g=g):
            ng = D // g
            hw = H * W
            x, y, valid, x_org, y_org = _coords_origin(proj, depths, H, W, g)
            outs = []
            for half in range(2):
                fh = feat[..., half * 8:(half + 1) * 8]
                table = jax.vmap(lambda f: _pack_patches(f, ph, pw))(fh)
                rows = _gather_rows(table, x_org, y_org, B, ng, hw)
                outs.append(_epilogue(rows, x, y, valid, x_org, y_org,
                                      ph, pw, 8, best))
            return jnp.concatenate(outs, axis=-1)
        t = device_time(fn, feat, proj, depths, iters=32)
        print(f"L1 split2 4x4 g={g} epi={best}: {t*1e3:7.2f} ms "
              f"({t/n*1e9:.2f} ns/sample)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "epi"
    {"epi": run_epi, "total": run_total, "l1": run_l1}[mode]()
