"""A-block AGGREGATED scatter: fewer cotangent rows for the patch backward.

probe_bwd_decomp.py shows the _patch_sample_bwd scatters dominate the
train-step backward (~90 ms of 319.5) and run at 14.6-18.9 ns/upd — above
the 7.7 ns fast rate because the banded variant's band read-modify-write
traffic is poorly amortized (20K updates per 25.8K-row band at L1).

Two levers probed here at the real per-level patch-backward geometry:

1. **Banding tile size**: more ref rows per tile amortizes the band RMW,
   as long as the epipolar drift still fits the band (overflow rate
   reported from the actual indices).
2. **A-block aggregation**: merge the cotangent rows of A consecutive
   ref-x pixels into ONE widened (ph' x pw') patch row anchored at the
   block's min origin. The scatter engine charges per ROW independent of
   width <=128 lanes (~1.5 rows at 192), so A=4 at 256 lanes halves row
   charges and A=8 at 384 cuts them ~2.7x. The embed = static pw->pw'
   lane dilation + per-pixel lane shift by (off_y*pw'+off_x)*cs + an
   A-wise pixel reduce; three lowerings are timed (row-layout where+pad,
   transposed-layout shift with minor-dim reduce, transposed shift with
   post-transpose sublane reduce).

Correctness: the aggregated WIDE table grad folded to feature space must
equal the monolithic narrow fold (checked at every level, max|diff|).

Usage: python scripts/probe_scatter3.py [baseline_mm]
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
    from casmvsnet_pl_tpu.ops.banded_take import banded_scatter_add
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

        # --- real-geometry per-group origins (the scatter targets) -------
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
            xi = x_org.astype(jnp.int32) + 1          # (B, ng, hw) in [0, W]
            yi = y_org.astype(jnp.int32) + 1
            valid_g = jnp.any(vg, axis=2)             # (B, ng, hw)
            return xi, yi, valid_g

        xi, yi, valid_g = jax.jit(prologue)(proj, dv)
        xi_h, yi_h, vg_h = (np.asarray(xi), np.asarray(yi), np.asarray(valid_g))
        idx = (yi * Wt + xi).reshape(B, N)
        vflat = valid_g.reshape(B, N)
        upd = jnp.asarray(rng.randn(B, N, L), jnp.float32)
        upd = upd * vflat[..., None]
        updT = jnp.swapaxes(upd.reshape(B, ng, hw, L), -1, -2)  # (B,ng,L,hw)

        print(f"{name} C={C} D={D} {H}x{W} S={S} cs={cs} L={L} g={g} "
              f"ng={ng} N/b={N} target={Ht * Wt}", flush=True)

        def t(label, fn, *a, iters=8):
            dt = device_time(fn, *a, iters=iters)
            ns = dt / (B * N) * 1e9
            print(f"{name} {label:34s} {dt * 1e3:8.2f} ms  {ns:6.2f} ns/upd",
                  flush=True)
            return dt

        # --- baselines ----------------------------------------------------
        def mono(upd, idx):
            fidx = idx + (jnp.arange(B, dtype=jnp.int32) * (Ht * Wt))[:, None]
            return jnp.sum(jnp.zeros((B * Ht * Wt, L), jnp.float32)
                           .at[fidx.reshape(-1)].add(upd.reshape(-1, L)))

        t("mono", mono, upd, idx)

        def banded(tile_rows, band_rows, upd, idx, vflat, Wgeom=W,
                   Lw=None):
            geom = (ng, H, Wgeom, tile_rows, band_rows, 1)
            return jnp.sum(banded_scatter_add(geom, Ht, Wt, idx, vflat, upd))

        # overflow rate from the actual indices (numpy mirror of
        # banded_take._banded_grad_one): does any tile's valid local index
        # leave its band?
        def overflow_rate(tile_rows, band_rows, Wgeom, idx_h, v_h):
            n_tiles = H // tile_rows
            m = tile_rows * Wgeom
            bad = 0
            tot = 0
            for b in range(B):
                it = idx_h[b].reshape(ng, n_tiles, m)
                vt = v_h[b].reshape(ng, n_tiles, m)
                it = it.reshape(-1, m)
                vt = vt.reshape(-1, m)
                mv = np.where(vt, it, np.iinfo(np.int32).max).min(1)
                start = np.clip(mv // Wt, 0, Ht - 1) * Wt
                loc = it - start[:, None]
                bad += int(np.any(vt & ((loc < 0) | (loc >= band_rows * Wt)),
                                  axis=1).sum())
                tot += it.shape[0]
            return bad, tot

        cliff_br = min(Ht, (26_000 // Wt) // 8 * 8)
        brs = sorted({cliff_br, min(Ht // 8 * 8, 2 * cliff_br),
                      min(Ht // 8 * 8, 96)})
        for band_rows in brs:
            for tr in (16, 32, 64, 128):
                if H % tr or tr > band_rows:
                    continue
                bad, tot = overflow_rate(tr, band_rows,
                                         W, idx.reshape(B, ng, H, W)
                                         .reshape(B, -1), vg_h.reshape(B, -1))
                tag = f"banded tr={tr} br={band_rows}"
                if bad:
                    print(f"{name} {tag:34s} OVERFLOW {bad}/{tot} tiles -> "
                          f"fallback; skipping", flush=True)
                    continue
                t(tag, lambda u, i, v, tr=tr, br=band_rows:
                  banded(tr, br, u, i, v), upd, idx, vflat)

        # --- A-block aggregation -----------------------------------------
        # MEASURED DEAD END (r3, /tmp/probe_sc3.log -> PERF_NOTES): the
        # embed alone (L2 A=4: 13.8 ms) costs 3-6x the scatter it saves
        # (mono 3.9 ms); every lowering loses. Gated off; the banding
        # tile-size sweep above is the live result.
        agg = os.environ.get("PROBE_AGG", "0") == "1"
        for A in (4, 8) if agg else ():
            # measured span within A-blocks (valid pixels only)
            xb = xi_h.reshape(B, ng, hw // A, A)
            yb = yi_h.reshape(B, ng, hw // A, A)
            vb = vg_h.reshape(B, ng, hw // A, A)
            big = np.int32(1 << 30)
            xmin = np.where(vb, xb, big).min(3)
            ymin = np.where(vb, yb, big).min(3)
            offx = np.where(vb, xb - xmin[..., None], 0)
            offy = np.where(vb, yb - ymin[..., None], 0)
            anyv = vb.any(3)
            rx = int(offx.max()) + 1
            ry = int(offy.max()) + 1
            pw_ = pw + rx - 1
            ph_ = ph + ry - 1
            Ld = ph_ * pw_ * cs
            Nb = ng * hw // A
            print(f"{name} A={A}: span rx={rx} ry={ry} -> patch "
                  f"{ph_}x{pw_} Ld={Ld} rows/b={Nb}", flush=True)
            if Ld > 512:
                print(f"{name} A={A}: Ld too wide, skipping", flush=True)
                continue

            shifts = sorted({(oy * pw_ + ox) * cs
                             for oy in range(ry) for ox in range(rx)})
            anyv_j = jnp.asarray(anyv.reshape(B, Nb))

            def embed_row(upd, xi, yi, valid):
                """Row layout: (B,N,L) -> (B,Nb,Ld) via where+pad shifts."""
                xb = xi.reshape(B, ng, hw // A, A)
                yb = yi.reshape(B, ng, hw // A, A)
                vb = valid.reshape(B, ng, hw // A, A)
                xm = jnp.min(jnp.where(vb, xb, big), axis=3)
                ym = jnp.min(jnp.where(vb, yb, big), axis=3)
                s = ((jnp.where(vb, yb - ym[..., None], 0) * pw_
                      + jnp.where(vb, xb - xm[..., None], 0)) * cs)
                s = s.reshape(B, ng, hw // A, A)
                u = upd.reshape(B, ng, hw // A, A, ph, pw, cs)
                u = jnp.pad(u, ((0, 0),) * 5 + ((0, pw_ - pw), (0, 0)))
                u = u.reshape(B, ng, hw // A, A, ph * pw_ * cs)
                u = jnp.pad(u, ((0, 0),) * 4 + ((0, Ld - ph * pw_ * cs),))
                wide = jnp.zeros((B, ng, hw // A, Ld), jnp.float32)
                for sh in shifts:
                    c = jnp.where((s == sh)[..., None], u, 0.0).sum(3)
                    if sh:
                        c = jnp.pad(c, ((0, 0),) * 3 + ((sh, 0),))[..., :Ld]
                    wide = wide + c
                xm = jnp.clip(xm, 0, Wt - 1)
                ym = jnp.clip(ym, 0, Ht - 1)
                idx_b = (ym * Wt + xm).reshape(B, Nb)
                return wide.reshape(B, Nb, Ld), idx_b, anyv_j

            def embed_T(updT, xi, yi, valid, minor_reduce):
                """Transposed layout: (B,ng,L,hw); shifts along sublanes."""
                xb = xi.reshape(B, ng, hw // A, A)
                yb = yi.reshape(B, ng, hw // A, A)
                vb = valid.reshape(B, ng, hw // A, A)
                xm = jnp.min(jnp.where(vb, xb, big), axis=3)
                ym = jnp.min(jnp.where(vb, yb, big), axis=3)
                s = ((jnp.where(vb, yb - ym[..., None], 0) * pw_
                      + jnp.where(vb, xb - xm[..., None], 0)) * cs)
                s = s.reshape(B, ng, 1, hw)
                u = updT.reshape(B, ng, ph, pw, cs, hw)
                u = jnp.pad(u, ((0, 0),) * 3 + ((0, pw_ - pw), (0, 0),
                                                (0, 0)))
                u = u.reshape(B, ng, ph * pw_ * cs, hw)
                u = jnp.pad(u, ((0, 0), (0, 0), (0, Ld - ph * pw_ * cs),
                             (0, 0)))
                wide = jnp.zeros((B, ng, Ld, hw), jnp.float32)
                for sh in shifts:
                    c = jnp.where(s == sh, u, 0.0)
                    if sh:
                        c = jnp.pad(c, ((0, 0), (0, 0), (sh, 0),
                                        (0, 0)))[:, :, :Ld]
                    wide = wide + c
                xm = jnp.clip(xm, 0, Wt - 1)
                ym = jnp.clip(ym, 0, Ht - 1)
                idx_b = (ym * Wt + xm).reshape(B, Nb)
                if minor_reduce:
                    red = wide.reshape(B, ng, Ld, hw // A, A).sum(-1)
                    out = jnp.swapaxes(red, -1, -2).reshape(B, Nb, Ld)
                else:
                    tr = jnp.swapaxes(wide, -1, -2)          # (B,ng,hw,Ld)
                    out = tr.reshape(B, ng, hw // A, A, Ld).sum(3)
                    out = out.reshape(B, Nb, Ld)
                return out, idx_b, anyv_j

            t(f"A={A} embed_row only", lambda u, x, y, v: jnp.sum(
                embed_row(u, x, y, v)[0]), upd, xi, yi, valid_g)
            t(f"A={A} embed_T minor only", lambda u, x, y, v: jnp.sum(
                embed_T(u, x, y, v, True)[0]), updT, xi, yi, valid_g)
            t(f"A={A} embed_T sublane only", lambda u, x, y, v: jnp.sum(
                embed_T(u, x, y, v, False)[0]), updT, xi, yi, valid_g)

            def agg_mono(u, x, y, v, emb):
                wide, idx_b, av = emb(u, x, y, v)
                fidx = idx_b + (jnp.arange(B, dtype=jnp.int32)
                                * (Ht * Wt))[:, None]
                return jnp.sum(jnp.zeros((B * Ht * Wt, Ld), jnp.float32)
                               .at[fidx.reshape(-1)].add(
                                   wide.reshape(-1, Ld)))

            t(f"A={A} embed_row + mono", lambda u, x, y, v: agg_mono(
                u, x, y, v, embed_row), upd, xi, yi, valid_g)
            t(f"A={A} embed_T + mono", lambda u, x, y, v: agg_mono(
                u, x, y, v, lambda *a: embed_T(*a, False)),
              updT, xi, yi, valid_g)

            def agg_banded(u, x, y, v, tile_rows):
                wide, idx_b, av = embed_T(u, x, y, v, False)
                geom = (ng, H, W // A, tile_rows, band_rows, 1)
                return jnp.sum(banded_scatter_add(geom, Ht, Wt, idx_b, av,
                                                  wide))

            for tr in (16, 32, 64):
                if H % tr:
                    continue
                bad, tot = overflow_rate(
                    tr, band_rows, W // A,
                    np.asarray(idx_b_host := (
                        np.clip(ymin, 0, Ht - 1) * Wt
                        + np.clip(xmin, 0, Wt - 1)).reshape(B, -1)),
                    anyv.reshape(B, -1))
                if bad:
                    print(f"{name} A={A} banded tr={tr}: OVERFLOW "
                          f"{bad}/{tot} tiles; skipping", flush=True)
                    continue
                t(f"A={A} embed_T + banded tr={tr}",
                  lambda u, x, y, v, tr=tr: agg_banded(u, x, y, v, tr),
                  updT, xi, yi, valid_g)

            # ---- correctness: fold(wide agg) == fold(narrow mono) -------
            def fold(tbl, fh, fw):
                tp = jnp.pad(tbl, ((fh, 0), (fw, 0), (0, 0)))
                acc = 0.0
                for dy in range(fh):
                    for dx in range(fw):
                        blk = tbl.shape[-1] // (fh * fw)
                        tap = tp[fh + 1 - dy:fh + 1 - dy + H,
                                 fw + 1 - dx:fw + 1 - dx + W,
                                 (dy * fw + dx) * blk:(dy * fw + dx + 1)
                                 * blk]
                        acc = acc + tap
                return acc

            def feat_narrow(u, i):
                fidx = i + (jnp.arange(B, dtype=jnp.int32)
                            * (Ht * Wt))[:, None]
                tb = (jnp.zeros((B * Ht * Wt, L), jnp.float32)
                      .at[fidx.reshape(-1)].add(u.reshape(-1, L))
                      .reshape(B, Ht, Wt, L))
                return jax.vmap(lambda tt: fold(tt, ph, pw))(tb)

            def feat_wide(u, x, y, v):
                wide, idx_b, av = embed_T(u, x, y, v, False)
                fidx = idx_b + (jnp.arange(B, dtype=jnp.int32)
                                * (Ht * Wt))[:, None]
                tb = (jnp.zeros((B * Ht * Wt, Ld), jnp.float32)
                      .at[fidx.reshape(-1)].add(wide.reshape(-1, Ld))
                      .reshape(B, Ht, Wt, Ld))
                return jax.vmap(lambda tt: fold(tt, ph_, pw_))(tb)

            fn = jax.jit(feat_narrow)(upd, idx)
            fw_ = jax.jit(feat_wide)(updT, xi, yi, valid_g)
            diff = float(jnp.max(jnp.abs(fn - fw_)))
            ref = float(jnp.max(jnp.abs(fn)))
            print(f"{name} A={A} fold check: max|diff|={diff:.3e} "
                  f"(ref max {ref:.3e})", flush=True)


if __name__ == "__main__":
    main()
