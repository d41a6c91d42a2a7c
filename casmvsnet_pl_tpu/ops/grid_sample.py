"""Bilinear image sampling on TPU (XLA gather formulation).

This is the TPU replacement for the reference's hot CUDA kernel
``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=True)``
(/root/reference/models/modules.py:87-89). Coordinates here are kept in
*unnormalized* pixel space — the reference normalizes to [-1, 1] only because
torch's API demands it; align_corners=True makes the two exactly equivalent.

Semantics matched exactly:
  - 4-tap bilinear interpolation from floor/ceil neighbors;
  - each out-of-bounds tap contributes zero (zeros padding is per-tap, so a
    coordinate half-outside the image still gets partial contributions);
  - coordinate math in float32.

The XLA formulation flattens the spatial grid and issues one row-gather per
tap; gathers of contiguous C-vectors lower to efficient dynamic-gathers on
TPU. A fused Pallas plane-sweep kernel (warp + sample + cost accumulation)
lives in ``ops.plane_sweep`` and uses this as its reference implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=32)
def _patch_kernel(kh: int, kw: int, C: int):
    """One-hot (kh, kw, C, kh*kw*C) HWIO kernel: out[l= (dy*kw+dx)*C + c]
    = in[y+dy, x+dx, c]. Patch extraction as a convolution: lane-offset
    concatenation of shifted slices lowers to masked sub-128-lane stores
    (~26 ms for a 16-strip 512x640 table on v5e) while the identity conv
    runs on the MXU in well under a millisecond, exactly (0/1 weights)."""
    k = np.zeros((kh, kw, C, kh * kw * C), np.float32)
    for dy in range(kh):
        for dx in range(kw):
            for c in range(C):
                k[dy, dx, c, (dy * kw + dx) * C + c] = 1.0
    return k


def _extract_patches(padded: Array, kh: int, kw: int,
                     stride_w: int = 1) -> Array:
    """(B, Hp, Wp, C) -> (B, Hp-kh+1, out_w, kh*kw*C) via one-hot conv.

    Lane order: (dy*kw + dx)*C + c. Exact in any dtype: each output lane
    sums exactly one 1.0*value term. (No preferred_element_type: it would
    make the transpose/VJP conv mix f32 cotangents with the bf16 kernel,
    which lax.conv rejects.)
    """
    C = padded.shape[-1]
    kern = jnp.asarray(_patch_kernel(kh, kw, C), padded.dtype)
    return jax.lax.conv_general_dilated(
        padded, kern, window_strides=(1, stride_w), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def grid_sample(feat: Array, xy: Array) -> Array:
    """Sample one feature map at fractional pixel coordinates.

    Args:
      feat: (H, W, C) source feature map (any float dtype).
      xy:   (..., 2) pixel coordinates (x, y), float.
    Returns:
      (..., C) sampled features in feat.dtype.
    """
    H, W, C = feat.shape
    out_shape = xy.shape[:-1] + (C,)
    xy = xy.reshape(-1, 2).astype(jnp.float32)
    x, y = xy[:, 0], xy[:, 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0            # weight of the right tap
    wy1 = y - y0            # weight of the bottom tap
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = feat.reshape(H * W, C)

    def tap(yi, xi, wgt):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=0)                     # (N, C)
        w = jnp.where(valid, wgt, 0.0).astype(feat.dtype)
        return vals * w[:, None]

    out = (tap(y0i, x0i, wy0 * wx0) + tap(y0i, x1i, wy0 * wx1) +
           tap(y1i, x0i, wy1 * wx0) + tap(y1i, x1i, wy1 * wx1))
    return out.reshape(out_shape)


def grid_sample_batched(feat: Array, xy: Array) -> Array:
    """vmap of :func:`grid_sample` over a leading batch axis.

    feat: (B, H, W, C); xy: (B, ..., 2) -> (B, ..., C).
    """
    return jax.vmap(grid_sample)(feat, xy)


# ---------------------------------------------------------------------------
# Packed-quad fast path
#
# TPU's gather engine costs ~2.5 ns per gathered ROW independent of row width
# (8..128 lanes, measured on v5e). Four separate C-wide tap gathers therefore
# cost 4x one 4C-wide gather. pack_quad() precomputes, for every (y, x), the
# 2x2 bilinear support [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)] as 4C
# channels (zero-padded at borders), and grid_sample_quad() samples with a
# single row gather + a weighted 4-block reduction.
# ---------------------------------------------------------------------------

def pack_quad(feat: Array) -> Array:
    """(H, W, C) -> (H+1, W+1, 4C) packed 2x2 bilinear supports.

    Entry [yq, xq] holds the taps for floor coords (y0, x0) = (yq-1, xq-1):
    the +1 offset gives one row/col of zero guard so taps with y0 = -1 or
    x0 = -1 (coordinates in [-1, 0)) resolve in-bounds. Out-of-image taps
    are zero, preserving the reference's zeros padding semantics.
    """
    # pad: 1 guard before (for floor = -1) and 2 after (floor = H-1 needs
    # y0+1 = H, and the guard row y0 = H itself for clamped far coords).
    # A 4-piece lane concat beats the one-hot patch conv here (0.28 vs
    # 2.13 ms at C=16, scripts/probe_pack.py) — the conv only wins for
    # many-piece strip tables (pack_strips).
    H, W, C = feat.shape
    p = jnp.pad(feat, ((1, 2), (1, 2), (0, 0)))
    q00 = p[:H + 1, :W + 1]          # (y0, x0)
    q01 = p[:H + 1, 1:W + 2]         # (y0, x0+1)
    q10 = p[1:H + 2, :W + 1]         # (y0+1, x0)
    q11 = p[1:H + 2, 1:W + 2]        # (y0+1, x0+1)
    return jnp.concatenate([q00, q01, q10, q11], axis=-1)  # (H+1, W+1, 4C)


def grid_sample_quad(feat_quad: Array, xy: Array, height: int,
                     width: int) -> Array:
    """Bilinear sample via one row gather from a pack_quad() volume.

    Supports an optional shared leading batch axis on BOTH arguments: the
    batch is folded into the flat gather index (one unbatched gather) because
    XLA lowers batched gathers ~2x slower on TPU than flat ones.

    Args:
      feat_quad: (H+1, W+1, 4C) from :func:`pack_quad` of an (H, W, C) map,
        or (B, H+1, W+1, 4C).
      xy: (..., 2) pixel coordinates (x, y) in the ORIGINAL (H, W) frame;
        (B, ..., 2) in the batched form.
      height, width: original H, W (static).
    Returns:
      (..., C) sampled features, same semantics as :func:`grid_sample`.
    """
    batched = feat_quad.ndim == 4
    B = feat_quad.shape[0] if batched else 1
    Hq, Wq, C4 = feat_quad.shape[-3:]
    C = C4 // 4
    out_shape = xy.shape[:-1] + (C,)
    xy = xy.reshape(B, -1, 2).astype(jnp.float32)
    x, y = xy[..., 0], xy[..., 1]                            # (B, N)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    # quad index: +1 guard offset, clamped into the padded grid. Taps whose
    # floor falls outside [-1, H-1+1] land on zero padding or get w=0 below.
    x0i = jnp.clip(x0.astype(jnp.int32) + 1, 0, Wq - 1)
    y0i = jnp.clip(y0.astype(jnp.int32) + 1, 0, Hq - 1)

    # Per-tap validity, identical to grid_sample's per-tap zeros padding.
    # Far out-of-range coords clamp onto guard rows whose texels are zero
    # AND get zero weights, so clamping can never alias onto real texels.
    v_x0 = (x0 >= 0) & (x0 < width)
    v_x1 = (x0 + 1 >= 0) & (x0 + 1 < width)
    v_y0 = (y0 >= 0) & (y0 < height)
    v_y1 = (y0 + 1 >= 0) & (y0 + 1 < height)

    w00 = jnp.where(v_y0 & v_x0, wy0 * wx0, 0.0)
    w01 = jnp.where(v_y0 & v_x1, wy0 * wx1, 0.0)
    w10 = jnp.where(v_y1 & v_x0, wy1 * wx0, 0.0)
    w11 = jnp.where(v_y1 & v_x1, wy1 * wx1, 0.0)

    flat = feat_quad.reshape(B * Hq * Wq, C4)
    idx = y0i * Wq + x0i                                     # (B, N)
    if batched:
        idx = idx + (jnp.arange(B, dtype=jnp.int32) * (Hq * Wq))[:, None]
    rows = jnp.take(flat, idx.reshape(-1), axis=0)           # (B*N, 4C)
    # Weighted 4-tap reduction via static lane slices. XLA lowers the
    # cross-lane-group combine through a transposed copy + while loop
    # (~7.6 ms per 2.6M-sample view); every alternative measured WORSE on
    # v5e: einsum (same lowering), per-tap matmul vs a 0/1 selection matrix
    # (5x), channel-interleaved packing + minor-dim reduce (1.6x), and a
    # hand-written Pallas kernel (scripts/kernel_tap_reduce.py, 2.5x end-to-end —
    # the (N-sublane x C-lane)/(per-sample scalar) layout mismatch costs
    # more inside the kernel than XLA's transpose does).
    dtype = feat_quad.dtype
    taps = (w00, w01, w10, w11)
    out = sum(rows[:, q * C:(q + 1) * C]
              * taps[q].reshape(-1, 1).astype(dtype) for q in range(4))
    return out.reshape(out_shape)


def pack_blocks(feat: Array, align: int) -> Array:
    """(H, W, C) -> (H+2, ~W/align, 2*(align+1)*C) aligned-block table.

    Entry (yi, xb) holds the 2 x (align+1) patch of padded feat anchored at
    padded coords (yi, xb*align): enough texels that ANY bilinear support
    whose floor cell maps into the block (xi // align == xb) is covered —
    exact with no geometric conditions, unlike pack_strips windows. The
    point is the gather-engine fast regime: rates cliff ~4-5x once a
    table passes ~0.5M ROWS (scripts/probe_evalres_gather.py: 2.4 ns/row
    at 330K rows, 11.3-11.9 ns/row at 1M rows, independent of row width
    up to 128 lanes), so packing `align` quad cells per row keeps e.g. the
    1152x864 level-0 table in the fast regime. align=1 is pack_quad.

    Lane order: (dy*(align+1) + dx)*C + c.
    """
    p = jnp.pad(feat, ((1, 2), (1, align + 1), (0, 0)))
    return _extract_patches(p[None], 2, align + 1, stride_w=align)[0]


def pack_patches(feat: Array, ph: int, pw: int) -> Array:
    """(H, W, C) -> (H+2, W+2, ph*pw*C) stride-1 patch table.

    Entry [yi, xi] holds the ph x pw patch of zero-padded feat anchored at
    floor coords (yi-1, xi-1): lane (dy*pw + dx)*C + c = feat[yi-1+dy,
    xi-1+dx, c], zeros outside the image. One gathered row then provides
    EXACT bilinear taps for every sample whose 2x2 support falls inside the
    patch — a whole group of consecutive plane-sweep depth hypotheses when
    the group's coordinate span fits (see ops/plane_sweep.patch_config).
    The guard ring (one row/col before, ph/pw after) makes floor coords
    from -1 through H-1 resolve in-bounds with correct zeros padding.
    """
    p = jnp.pad(feat, ((1, ph), (1, pw), (0, 0)))
    return _extract_patches(p[None], ph, pw)[0]


def pack_strips(feat: Array, strip_w: int, window_h: int) -> Array:
    """(H, W, C) -> (H+window_h, W+1, strip_w*C) horizontal-strip table.

    Entry [yi, xi] holds the strip feat[yi-1, xi-1 : xi-1+strip_w, :] with
    zero padding outside the image (one guard row/col before for floor = -1
    coords, window_h-1 / strip_w-1 after). One gathered row then provides
    taps for every sample whose x support lies within the strip, so a
    window_h-row gather covers ALL depth hypotheses of a plane-sweep group
    in window_h rows instead of one quad row per (pixel, depth) — the
    gather engine charges per row, and 128-lane rows keep the fast rate
    even from tables this size (scripts/probe_window.py: 2.4 ns/row at
    85 MB; >128-lane rows collapse to ~13 ns/row).
    """
    p = jnp.pad(feat, ((1, window_h - 1), (1, strip_w - 1), (0, 0)))
    return _extract_patches(p[None], 1, strip_w)[0]


def quad_weights(xy: Array, height: int, width: int):
    """Tap weights + clamped quad-cell floor indices for pack_quad sampling.

    xy: (..., 2) pixel coords -> (w4 (..., 4) float32, y0i, x0i int32 clamped
    into the padded (H+1, W+1) grid). Weight order matches pack_quad's
    channel blocks: (y0x0, y0x1, y1x0, y1x1); out-of-image taps get weight 0
    (identical semantics to grid_sample / torch zeros padding).
    """
    xy = xy.astype(jnp.float32)
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    v_x0 = (x0 >= 0) & (x0 < width)
    v_x1 = (x0 + 1 >= 0) & (x0 + 1 < width)
    v_y0 = (y0 >= 0) & (y0 < height)
    v_y1 = (y0 + 1 >= 0) & (y0 + 1 < height)
    w4 = jnp.stack([
        jnp.where(v_y0 & v_x0, wy0 * wx0, 0.0),
        jnp.where(v_y0 & v_x1, wy0 * wx1, 0.0),
        jnp.where(v_y1 & v_x0, wy1 * wx0, 0.0),
        jnp.where(v_y1 & v_x1, wy1 * wx1, 0.0),
    ], axis=-1)
    # clip into the padded (H+1, W+1) quad grid; far out-of-range coords land
    # on zero guard rows AND carry zero weights, so clamping never aliases.
    x0i = jnp.clip(x0.astype(jnp.int32) + 1, 0, width)
    y0i = jnp.clip(y0.astype(jnp.int32) + 1, 0, height)
    return w4, y0i, x0i
