"""Per-batch-element UNROLLED monolithic scatter vs batch-folded.

The scatter cliff is keyed on the TARGET row count PER SCATTER OP
(probe_scatter.py). The production mono path folds B batch elements into
one (B*Ht*Wt)-target op — at L2 that turns a 21K-row (fast-regime) table
into a 42K-row (slow-regime) op. Same trick as the gather fold-vs-unroll
(_FOLD_LIMIT): unroll to B scatters of Ht*Wt targets each.

Usage: python scripts/probe_scatter3b.py [baseline_mm]
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
    from casmvsnet_pl_tpu.ops import plane_sweep as ps
    from casmvsnet_pl_tpu.utils.devtime import device_time

    B = 2
    baseline = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    print(f"backend: {jax.default_backend()}  baseline={baseline}mm  B={B}",
          flush=True)
    rng = np.random.RandomState(0)

    for name, C, D, H, W in (("L2", 32, 48, 128, 160),
                             ("L1", 16, 32, 256, 320),
                             ("L0", 8, 8, 512, 640)):
        cfg = ps._resolve_sampling("patch", C, D, H, W, 2)
        ph, pw, S = cfg["ph"], cfg["pw"], cfg["split"]
        cs = C // S
        L = ph * pw * cs
        hw = H * W
        Ht, Wt = H + 2, W + 2
        g = max(cfg["groups"])
        ng = D // g
        N = ng * hw

        ref, src = rig_proj(baseline, W, H)
        rel = (src @ np.linalg.inv(ref))[:3].astype(np.float32)
        proj = jnp.asarray(np.tile(rel, (B, 1, 1, 1)))
        base = 650.0 + (np.arange(D, dtype=np.float32) - D / 2) * 2.65
        dv = jnp.asarray(np.tile(base[:, None, None],
                                 (B, 1, H, W)).astype(np.float32))

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
            xi = x_org.astype(jnp.int32) + 1
            yi = y_org.astype(jnp.int32) + 1
            return (yi * Wt + xi).reshape(B, N), jnp.any(vg, axis=2)

        idx, valid_g = jax.jit(prologue)(proj, dv)
        upd = jnp.asarray(rng.randn(B, N, L), jnp.float32)
        upd = upd * valid_g.reshape(B, N)[..., None]

        print(f"{name} target/b={Ht * Wt} N/b={N} L={L}", flush=True)

        def t(label, fn, *a, iters=8):
            dt = device_time(fn, *a, iters=iters)
            ns = dt / (B * N) * 1e9
            print(f"{name} {label:26s} {dt * 1e3:8.2f} ms  {ns:6.2f} ns/upd",
                  flush=True)

        def mono_fold(upd, idx):
            fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
            return jnp.sum(jnp.zeros((B * Ht * Wt, L), jnp.float32)
                           .at[fidx.reshape(-1)].add(upd.reshape(-1, L)))

        def mono_unroll(upd, idx):
            return sum(
                jnp.sum(jnp.zeros((Ht * Wt, L), jnp.float32)
                        .at[idx[b]].add(upd[b]))
                for b in range(B))

        t("mono fold", mono_fold, upd, idx)
        t("mono unroll", mono_unroll, upd, idx)

        # aggregated rows (A=4): synthetic block indices from the real idx
        # (block min), Ld = ph*(pw+4-1... use rx=5)*cs
        A = 4
        idx_h = np.asarray(idx)
        v_h = np.asarray(valid_g).reshape(B, N)
        xb = idx_h % Wt
        yb = idx_h // Wt
        big = np.int32(1 << 30)
        vb = v_h.reshape(B, ng, hw // A, A)
        xbv = xb.reshape(B, ng, hw // A, A)
        ybv = yb.reshape(B, ng, hw // A, A)
        # span over VALID pixels only: invalid groups are edge-clipped and
        # would inflate rx to ~W (the round-3 OOM)
        xbl = np.where(vb, xbv, big).min(3)
        ybl = np.where(vb, ybv, big).min(3)
        rx = int(np.where(vb, xbv - np.minimum(xbl, big - 1)[..., None],
                          0).max()) + 1
        xbl = np.where(xbl == big, 0, xbl)
        ybl = np.where(ybl == big, 0, ybl)
        pw_ = pw + rx - 1
        Ld = ph * pw_ * cs
        Nb = ng * hw // A
        if Ld > 768:
            print(f"{name} agg A={A} rx={rx} Ld={Ld}: too wide, skipping",
                  flush=True)
            continue
        idx_b = jnp.asarray((ybl * Wt + xbl).reshape(B, Nb))
        upd_b = jnp.asarray(rng.randn(B, Nb, Ld), jnp.float32)
        print(f"{name} agg A={A} rx={rx} Ld={Ld} rows/b={Nb}", flush=True)

        def agg_fold(upd_b, idx_b):
            fidx = idx_b + (jnp.arange(B, dtype=jnp.int32)
                            * (Ht * Wt))[:, None]
            return jnp.sum(jnp.zeros((B * Ht * Wt, Ld), jnp.float32)
                           .at[fidx.reshape(-1)].add(upd_b.reshape(-1, Ld)))

        def agg_unroll(upd_b, idx_b):
            return sum(
                jnp.sum(jnp.zeros((Ht * Wt, Ld), jnp.float32)
                        .at[idx_b[b]].add(upd_b[b]))
                for b in range(B))

        t("agg mono fold", agg_fold, upd_b, idx_b)
        t("agg mono unroll", agg_unroll, upd_b, idx_b)


if __name__ == "__main__":
    main()
