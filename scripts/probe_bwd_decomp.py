"""Decompose the patch-sampler BACKWARD at train-res cascade geometry.

profile_bwd.py (post-kernel) measures warp+cost fwd+bwd per level at
L2/L1/L0 = 48.4/75.9/53.3 ms (batch 2, 2 src views) — the dominant block
of the 319.5 ms train step. The forward is known (probe_epi5 full-sampler
~5.3/9.2/9.9 ms/view), so the backward carries ~2-3x the forward. This
probe times each piece of _patch_sample_bwd in isolation per level:

  goT    : transpose of the incoming cotangent (B, D, hw, C) -> group form
  epi    : the transposed-layout Pallas adjoint kernel (per split, summed)
  updT   : transpose of the kernel output rows back to scatter layout
  scat   : banded_scatter_add of the cotangent rows into the table grad
  fold   : pack_patches' own VJP (table grad -> feature grad)
  [sum]  : sum of the pieces
  f+b    : jax.grad of sum(_patch_view) wrt the packed table (the real
           composition, minus pack/fold) and wrt features (with them)

Usage: python scripts/probe_bwd_decomp.py [baseline_mm]
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
    from casmvsnet_pl_tpu.kernels.patch_epilogue import epilogue_bwd
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.ops.banded_take import (banded_cfg,
                                                  banded_scatter_add)
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B = 2
    baseline = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    print(f"backend: {jax.default_backend()}  baseline={baseline}mm "
          f"(one src view, B={B})", flush=True)
    rng = np.random.RandomState(0)

    for name, C, D, H, W in (("L2", 32, 48, 128, 160),
                             ("L1", 16, 32, 256, 320),
                             ("L0", 8, 8, 512, 640)):
        cfg = ps._resolve_sampling("patch", C, D, H, W, 2)
        assert cfg["mode"] == "patch", cfg
        ph, pw, S = cfg["ph"], cfg["pw"], cfg["split"]
        cs = C // S
        L = ph * pw * cs
        hw = H * W
        Ht, Wt = H + 2, W + 2

        ref, src = rig_proj(baseline, W, H)
        rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
        proj = jnp.asarray(np.tile(rel, (B, 1, 1, 1)))    # (B, 1, 3, 4)
        base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * 2.65
        dv = jnp.asarray(np.tile(base[:, None, None],
                                 (B, 1, H, W)).astype(np.float32))
        feat = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)

        def pk(f):
            # Fused-split layout: splits concatenated along the lane axis
            # (one (S*L)-lane gather row per pixel), matching _pack_tables.
            return jnp.concatenate([
                ps.pack_patches(f[..., i * cs:(i + 1) * cs], ph, pw)
                for i in range(S)], axis=-1)

        table = jax.jit(jax.vmap(pk))(feat)           # (B, Ht, Wt, S*L)
        g = max(cfg["groups"])
        ng = D // g

        # Realistic coords/orgs for the standalone pieces (one materialized
        # trace of _patch_view's prologue).
        def prologue(proj, dv):
            from casmvsnet_pl_tpu.ops.geometry import project_to_src
            coords = jax.vmap(
                lambda p, d: project_to_src(p, d, H, W))(proj[:, 0], dv)
            xf = coords[..., 0].astype(jnp.float32).reshape(B, D, hw)
            yf = coords[..., 1].astype(jnp.float32).reshape(B, D, hw)
            valid = ((xf > -1.0) & (xf < float(W)) &
                     (yf > -1.0) & (yf < float(H)))
            xg = xf.reshape(B, ng, g, hw)
            yg = yf.reshape(B, ng, g, hw)
            vg = valid.reshape(B, ng, g, hw)
            big = jnp.float32(1e9)
            minx = jnp.min(jnp.where(vg, xg, big), axis=2)
            miny = jnp.min(jnp.where(vg, yg, big), axis=2)
            x_org = jnp.clip(jnp.floor(minx), -1.0, W - 1.0)
            y_org = jnp.clip(jnp.floor(miny), -1.0, H - 1.0)
            fx, fy = ps._patch_frac(xg, yg, vg, x_org, y_org, ph, pw)
            xi = x_org.astype(jnp.int32) + 1
            yi = y_org.astype(jnp.int32) + 1
            idx = (yi * Wt + xi).reshape(B, -1)
            valid_g = jnp.any(vg, axis=2).reshape(B, -1)
            return fx, fy, idx, valid_g

        fx, fy, idx, valid_g = jax.jit(prologue)(proj, dv)
        g_out = jnp.asarray(rng.randn(B, D, hw, C), jnp.float32)
        d_rowsT = jnp.asarray(rng.randn(B, ng, L, hw), jnp.float32)

        def t(label, fn, *a, iters=8):
            dt = device_time(fn, *a, iters=iters)
            print(f"{name} {label:28s} {dt * 1e3:8.2f} ms", flush=True)
            return dt

        t("goT transpose", lambda go: jnp.sum(jnp.swapaxes(
            go, -1, -2).reshape(B, ng, g, C, hw) * 1.0001), g_out)
        t(f"goT + epilogue_bwd x{S}", lambda go, fx, fy: sum(
            jnp.sum(epilogue_bwd(
                jnp.swapaxes(go, -1, -2).reshape(B, ng, g, C, hw)
                [:, :, :, s * cs:(s + 1) * cs], fx, fy, ph, pw))
            for s in range(S)), g_out, fx, fy)
        t("updT transpose", lambda d: jnp.sum(
            jnp.swapaxes(d, -1, -2).reshape(B, -1, L)
            .astype(jnp.float32) * 1.0001), d_rowsT)
        bcfg = banded_cfg(Ht, Wt, ng, H, W)

        def scat(upd, idx, valid_g):
            if bcfg is not None:
                o = banded_scatter_add((ng, H, W) + bcfg, Ht, Wt, idx,
                                       valid_g, upd)
            else:
                fidx = idx + (jnp.arange(B, dtype=jnp.int32)
                              * (Ht * Wt))[:, None]
                o = (jnp.zeros((B * Ht * Wt, L), jnp.float32)
                     .at[fidx.reshape(-1)].add(upd.reshape(-1, L)))
            return jnp.sum(o)

        upd = jnp.asarray(rng.randn(B, ng * hw, L), jnp.float32)
        t(f"scatter x1 of {S} (banded={bcfg is not None})",
          scat, upd, idx, valid_g)
        t("pack fold (pack_patches vjp)", lambda tb: jnp.sum(
            jax.vjp(pk, feat[0])[1](tb)[0].astype(jnp.float32)), table[0])

        def view_fb(table):
            o = ps._patch_view(table, proj[:, 0], dv, H, W, ph, pw,
                               cfg["groups"], split=S)
            return jnp.sum(o)

        t("view f+b (grad wrt table)", lambda tb: jnp.sum(
            jax.grad(view_fb)(tb).astype(jnp.float32)), table)

        def cv_fb(feat):
            f3 = jnp.stack([feat, feat, feat], axis=1)
            return jnp.sum(ps.build_cost_volume(
                f3, jnp.tile(proj, (1, 2, 1, 1)), dv, remat=False,
                sampling="patch"))

        t("CV f+b (2 views, grad wrt feats)", lambda f: jnp.sum(
            jax.grad(cv_fb)(f).astype(jnp.float32)), feat, iters=4)


if __name__ == "__main__":
    main()
