"""Probe: patch epilogue in TRANSPOSED (pixel-lane) layout — XLA and Pallas.

probe_patch2 established every (N, L=128)-lane-layout epilogue variant is
at an XLA lowering floor (~11.2 ms total at L0, vs a ~1-2 ms VPU/bandwidth
bound): the hat build broadcasts per-sample scalars (fx, fy) across the
128 tap lanes, and the output's C=8 minor dim occupies 8/128 lanes.

Hypothesis: transpose so PIXELS are on lanes and taps/channels on
sublanes. Then every op is a full (8,128)-vreg op:
  out[j, c, p] = sum_k w[j, k, p] * rowsT[k*Ch + c, p]
  w[j, k, p]   = hat(fx[j,p] - dx_k) * hat(fy[j,p] - dy_k)
with the k-sum as 16 FMAs of (g, Ch, T) blocks — expressible both as a
pure-XLA loop ("tfma") and as a trivially-tiled Pallas kernel ("pallas").

Usage: python scripts/probe_epi5.py [l0|l1|l2|check]
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from probe_patch import rig_proj, _pack_patches
from probe_patch2 import _coords_origin, _gather_rows, patch_view


def _setup(level, D, C, B=2, baseline=50.0, H0=512, W0=640):
    import jax.numpy as jnp
    s = 2 ** level
    H, W = H0 // s, W0 // s
    rng = np.random.RandomState(0)
    ref, src = rig_proj(baseline, W, H)
    rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
    proj = np.tile(rel, (B, 1, 1))
    step = 2.65 * (2 ** level if level else 1.0)
    base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * step
    depths = np.tile(base[:, None, None], (B, 1, H, W)).astype(np.float32)
    feat = rng.randn(B, H, W, C).astype(np.float32)
    return (jnp.asarray(feat, jnp.bfloat16), jnp.asarray(proj),
            jnp.asarray(depths), H, W)


def _frac_coords(x, y, valid, x_org, y_org, ph, pw):
    """validfold fractional coords: (B, ng, g, hw) f32 each."""
    import jax.numpy as jnp
    fx = jnp.where(valid, jnp.clip(x - x_org[:, :, None], 0.0, pw - 1.0),
                   -9.0)
    fy = jnp.clip(y - y_org[:, :, None], 0.0, ph - 1.0)
    return fx, fy


def tfma_epilogue(rowsT, fx, fy, ph, pw):
    """Pure-XLA transposed FMA: rowsT (B, ng, L, hw) -> (B, D, hw, C) f32."""
    import jax.numpy as jnp
    B, ng, L, hw = rowsT.shape
    g = fx.shape[2]
    C = L // (ph * pw)
    out = jnp.zeros((B, ng, g, C, hw), jnp.float32)
    for dy in range(ph):
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - float(dy)))
        for dx in range(pw):
            hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - float(dx)))
            w = (hx * hy)[:, :, :, None, :]                 # (B,ng,g,1,hw)
            k = dy * pw + dx
            r = rowsT[:, :, None, k * C:(k + 1) * C, :].astype(jnp.float32)
            out = out + w * r
    out = out.reshape(B, ng * g, C, hw)
    return jnp.swapaxes(out, -1, -2)                        # (B, D, hw, C)


@functools.lru_cache(maxsize=8)
def _pallas_epi(ph, pw, g, Ch, T, n_i, n_t, dtype_str):
    """Compiled transposed-FMA kernel: (n_i, L, hw) rowsT + (n_i, g, hw)
    fx/fy -> (n_i, g, Ch, hw) f32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = ph * pw * Ch
    hw = n_t * T

    def kernel(fx_ref, fy_ref, rT_ref, o_ref):
        fx = fx_ref[0]                                      # (g, T)
        fy = fy_ref[0]
        acc = jnp.zeros((g, Ch, T), jnp.float32)
        for dy in range(ph):
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - float(dy)))
            for dx in range(pw):
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - float(dx)))
                w = (hx * hy)[:, None, :]                   # (g, 1, T)
                k = dy * pw + dx
                r = rT_ref[0, k * Ch:(k + 1) * Ch, :].astype(jnp.float32)
                acc = acc + w * r[None]                     # (g, Ch, T)
        o_ref[0] = acc

    fn = pl.pallas_call(
        kernel,
        grid=(n_i, n_t),
        in_specs=[
            pl.BlockSpec((1, g, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, Ch, T), lambda i, t: (i, 0, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_i, g, Ch, hw), jnp.float32),
    )
    return fn


def pallas_epilogue(rowsT, fx, fy, ph, pw, T=512):
    """Pallas transposed FMA: rowsT (B, ng, L, hw) -> (B, D, hw, C) f32."""
    import jax.numpy as jnp
    B, ng, L, hw = rowsT.shape
    g = fx.shape[2]
    Ch = L // (ph * pw)
    n_i, n_t = B * ng, hw // T
    fn = _pallas_epi(ph, pw, g, Ch, T, n_i, n_t, str(rowsT.dtype))
    o = fn(fx.reshape(n_i, g, hw), fy.reshape(n_i, g, hw),
           rowsT.reshape(n_i, L, hw))
    out = o.reshape(B, ng * g, Ch, hw)
    return jnp.swapaxes(out, -1, -2)


def make_view_fn(variant, H, W, ph, pw, g, splits=1):
    """Full single-view sampler: (feat, proj, depths) -> (B, D, hw, C)."""
    import jax
    import jax.numpy as jnp

    def fn(feat, proj, depths):
        B, D = depths.shape[:2]
        ng = D // g
        hw = H * W
        x, y, valid, x_org, y_org = _coords_origin(proj, depths, H, W, g)
        fx, fy = _frac_coords(x, y, valid, x_org, y_org, ph, pw)
        outs = []
        cs = feat.shape[-1] // splits
        for s in range(splits):
            fh = feat[..., s * cs:(s + 1) * cs]
            table = jax.vmap(lambda f: _pack_patches(f, ph, pw))(fh)
            rows = _gather_rows(table, x_org, y_org, B, ng, hw)
            rowsT = jnp.swapaxes(rows[:, :, 0], -1, -2)     # (B, ng, L, hw)
            if variant == "tfma":
                outs.append(tfma_epilogue(rowsT, fx, fy, ph, pw))
            else:
                outs.append(pallas_epilogue(rowsT, fx, fy, ph, pw))
        return outs[0] if splits == 1 else jnp.concatenate(outs, axis=-1)

    return fn


def run_check():
    """CPU correctness: tfma and pallas(interpret) match validfold."""
    import contextlib

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    feat, proj, depths, H, W = _setup(0, 8, 8, B=1, H0=32, W0=64)
    feat = feat.astype(np.float32)
    ref = patch_view(jax.vmap(lambda f: _pack_patches(f, 4, 4))(feat),
                     proj, depths, H, W, 4, 4, 8, "validfold")
    for variant in ("tfma", "pallas"):
        if variant == "pallas":
            from jax.experimental.pallas import tpu as pltpu
            ctx = pltpu.force_tpu_interpret_mode()
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            out = make_view_fn(variant, H, W, 4, 4, 8)(feat, proj, depths)
        err = float(jnp.abs(jnp.asarray(out) - jnp.asarray(ref)).max())
        print(f"{variant}: max|diff| = {err:.2e}", flush=True)
        assert err < 1e-4, variant


def run_level(level, D, C, splits):
    import jax
    from casmvsnet_pl_tpu.utils.devtime import device_time
    feat, proj, depths, H, W = _setup(level, D, C)
    B = feat.shape[0]
    n = B * D * H * W
    ph, pw, g = 4, 4, 8

    def quad_base(feat, proj, depths):
        from casmvsnet_pl_tpu.ops.plane_sweep import (_pack_tables,
                                                      _sample_view)
        tables = _pack_tables(feat[:, None], {"mode": "quad"})
        return _sample_view(tables[:, 0], proj, depths, H, W,
                            {"mode": "quad"})

    def validfold(feat, proj, depths):
        import jax.numpy as jnp
        outs = []
        cs = C // splits
        for s in range(splits):
            fh = feat[..., s * cs:(s + 1) * cs]
            table = jax.vmap(lambda f: _pack_patches(f, ph, pw))(fh)
            outs.append(patch_view(table, proj, depths, H, W, ph, pw, g,
                                   "validfold"))
        return outs[0] if splits == 1 else jnp.concatenate(outs, axis=-1)

    for name, fn in [("quad", quad_base), ("validfold", validfold),
                     ("tfma", make_view_fn("tfma", H, W, ph, pw, g, splits)),
                     ("pallas", make_view_fn("pallas", H, W, ph, pw, g,
                                             splits))]:
        t = device_time(fn, feat, proj, depths, iters=32)
        print(f"L{level} C{C} D{D} split{splits} {name:10s}: {t*1e3:7.2f} ms "
              f"({t/n*1e9:.2f} ns/sample)", flush=True)


def run_parts():
    """Decompose the pallas path: where do the 9.93 ms at L0 go?"""
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.utils.devtime import device_time
    feat, proj, depths, H, W = _setup(0, 8, 8)
    B, D = depths.shape[:2]
    ph, pw, g = 4, 4, 8
    ng = D // g
    hw = H * W
    n = B * D * hw
    C = feat.shape[-1]
    L = ph * pw * C

    def front(feat, proj, depths):
        """pack + coords + gather, NO transpose: rows (B, ng, hw, L)."""
        x, y, valid, x_org, y_org = _coords_origin(proj, depths, H, W, g)
        fx, fy = _frac_coords(x, y, valid, x_org, y_org, ph, pw)
        table = jax.vmap(lambda f: _pack_patches(f, ph, pw))(feat)
        rows = _gather_rows(table, x_org, y_org, B, ng, hw)
        return rows.reshape(B, ng, hw, L), fx, fy

    def front_t(feat, proj, depths):
        rows, fx, fy = front(feat, proj, depths)
        return jnp.swapaxes(rows, -1, -2), fx, fy

    t = device_time(front, feat, proj, depths, iters=32)
    print(f"front (pack+coords+gather):        {t*1e3:7.2f} ms", flush=True)
    t = device_time(front_t, feat, proj, depths, iters=32)
    print(f"front + rowsT transpose:           {t*1e3:7.2f} ms", flush=True)

    rowsT, fx, fy = jax.jit(front_t)(feat, proj, depths)
    rowsT = jax.block_until_ready(rowsT)

    def kern(rowsT, fx, fy):
        return pallas_epilogue_raw(rowsT, fx, fy, ph, pw)

    def kern_t(rowsT, fx, fy):
        o = pallas_epilogue_raw(rowsT, fx, fy, ph, pw)
        return jnp.swapaxes(o.reshape(B, D, C, hw), -1, -2)

    t = device_time(kern, rowsT, fx, fy, iters=32)
    print(f"kernel only (channels-major out):  {t*1e3:7.2f} ms", flush=True)
    t = device_time(kern_t, rowsT, fx, fy, iters=32)
    print(f"kernel + out transpose:            {t*1e3:7.2f} ms", flush=True)

    # variance-style consumer fused on channels-major output
    def kern_var(rowsT, fx, fy):
        o = pallas_epilogue_raw(rowsT, fx, fy, ph, pw)
        s = o + 1.0
        sq = o * o
        return s, sq

    t = device_time(kern_var, rowsT, fx, fy, iters=32)
    print(f"kernel + chans-major var accum:    {t*1e3:7.2f} ms", flush=True)


def pallas_epilogue_raw(rowsT, fx, fy, ph, pw):
    """(B, ng, L, hw) -> (B, ng, g, Ch, hw) f32, no final transpose."""
    B, ng, L, hw = rowsT.shape
    g = fx.shape[2]
    Ch = L // (ph * pw)
    n_i, T = B * ng, 512
    fn = _pallas_epi(ph, pw, g, Ch, T, n_i, hw // T, str(rowsT.dtype))
    return fn(fx.reshape(n_i, g, hw), fy.reshape(n_i, g, hw),
              rowsT.reshape(n_i, L, hw)).reshape(B, ng, g, Ch, hw)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "l0"
    if mode == "check":
        run_check()
    elif mode == "l0":
        run_level(0, 8, 8, 1)
    elif mode == "l1":
        run_level(1, 32, 16, 2)
    elif mode == "l2":
        run_level(2, 48, 32, 4)
    elif mode == "parts":
        run_parts()
