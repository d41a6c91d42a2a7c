"""TPU-fast 3x3x3 convolution via depth-tap unrolling.

XLA lowers NDHWC 3D convolutions with few output channels (8..64 here) to
im2col matmuls whose MXU N dimension is the output-channel count — at
Cout=8 that wastes 94% of the 128 MXU lanes (~2-4% MFU measured on v5e).

Trick: fold the 3 depth taps into the OUTPUT channels of a single 2D conv
over every depth slice (N -> 3*Cout), then combine with a shifted add over
the depth axis:

    z[d, i] = conv2d(x[d], k[i])                 # one conv, N = 3*Cout
    out[d]  = z[d-1, 0] + z[d, 1] + z[d+1, 2]    # elementwise shift-add

FLOPs are identical; MXU lane utilization triples (measured 2.2-2.6x
wall-clock on CostRegNet shapes). For stride 2, z is computed on all D
slices but only half the taps are consumed (2x FLOPs, still ~1.5x faster);
both variants are exact up to one extra bfloat16 round of the partial sums
(tap partials are produced in conv output dtype before the shift-add).

This replaces the hot path of the reference's ConvBnReLU3D stack
(/root/reference/models/mvsnet.py:60-104) — same math, TPU-shaped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def conv3x3x3(x: Array, kernel: Array, stride: int = 1,
              wfold: bool | None = None) -> Array:
    """3D conv, kernel 3x3x3, SAME padding, stride 1 or 2, NDHWC/DHWIO.

    x: (B, D, H, W, Cin); kernel: (3, 3, 3, Cin, Cout).
    Returns (B, ceil(D/s), ceil(H/s), ceil(W/s), Cout) in x.dtype.

    wfold: width-fold the stride-1 2D core (exact; see conv2d_wfolded).
    The tap-unrolled core has N = 3*Cout lanes — 19-38% occupancy at the
    CostRegNet's shallow convs — and F=4 folding measures 0.855 -> 0.587
    ms at the L2 conv0 shape and 0.155 -> 0.048 at conv2
    (scripts/probe_costreg_wfold.py, v5e). None = auto: fold on TPU when
    stride 1, W % 4 == 0 and 3*Cout <= 64 (the probe's win region;
    conv4/conv6 at 3*Cout = 96+ lose the F/3 FLOP trade).
    """
    B, D, H, W, Ci = x.shape
    kd, kh, kw, _, Co = kernel.shape
    assert kd == 3 and kh == 3 and kw == 3
    # (kh, kw, Ci, 3*Co): tap i of the depth kernel occupies channels
    # [i*Co, (i+1)*Co)
    k2 = jnp.concatenate([kernel[0], kernel[1], kernel[2]], axis=-1)
    if wfold is None:
        wfold = (stride == 1 and W % 4 == 0 and 3 * Co <= 64 and _on_tpu())
    if wfold and stride == 1 and W % 4 == 0:
        z = conv2d_wfolded(x.reshape(B * D, H, W, Ci),
                           k2.astype(x.dtype), 4)
    else:
        # explicit (1, 1) padding = torch Conv3d(k=3, padding=1) semantics
        # for both strides (XLA "SAME" would pad (0, 1) at stride 2 —
        # different taps)
        z = jax.lax.conv_general_dilated(
            x.reshape(B * D, H, W, Ci), k2.astype(x.dtype),
            window_strides=(stride, stride), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Ho, Wo = z.shape[1], z.shape[2]
    z = z.reshape(B, D, Ho, Wo, 3, Co)
    zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    if stride == 1:
        # out[d] = k0*x[d-1] + k1*x[d] + k2*x[d+1]
        #        = z[d-1, 0] + z[d, 1] + z[d+1, 2]
        return (zp[:, 0:D, ..., 0, :] + zp[:, 1:D + 1, ..., 1, :]
                + zp[:, 2:D + 2, ..., 2, :])
    assert stride == 2
    # out[d] = k0*x[2d-1] + k1*x[2d] + k2*x[2d+1]
    Do = (D + 1) // 2
    return (zp[:, 0:2 * Do:2, ..., 0, :] + zp[:, 1:2 * Do + 1:2, ..., 1, :]
            + zp[:, 2:2 * Do + 2:2, ..., 2, :])


def conv_transpose3x3x3_s2(x: Array, kernel: Array) -> Array:
    """3D transposed conv, kernel 3, stride 2, exact 2x upsampling, NDHWC.

    Equivalent to lax.conv_general_dilated with lhs_dilation=2 and (1, 2)
    padding (= torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1)), but
    decomposed over depth parity so the depth axis never convolves zeros:

      zero-stuffed x~[2d] = x[d];  out[o] = sum_i k[i] * x~[o+i-1]
      even o=2m:  only i=1 hits data  -> out = z[m, 1]
      odd  o=2m+1: i=0 -> x[m], i=2 -> x[m+1] -> z[m, 0] + z[m+1, 2]

    where z[d, i] = convT2d(x[d], k[i]) (spatial 2x). The spatial transposed
    conv keeps N = 3*Cout lanes like conv3x3x3.

    x: (B, D, H, W, Cin); kernel: (3, 3, 3, Cin, Cout) -> (B, 2D, 2H, 2W, Co).
    """
    B, D, H, W, Ci = x.shape
    Co = kernel.shape[-1]
    k2 = jnp.concatenate([kernel[0], kernel[1], kernel[2]], axis=-1)
    z = jax.lax.conv_general_dilated(
        x.reshape(B * D, H, W, Ci), k2.astype(x.dtype),
        window_strides=(1, 1), padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z.reshape(B, D, 2 * H, 2 * W, 3, Co)
    even = z[:, :, :, :, 1, :]                                # (B, D, ...)
    zp2 = jnp.pad(z[:, :, :, :, 2, :], ((0, 0), (0, 1), (0, 0), (0, 0),
                                        (0, 0)))
    odd = z[:, :, :, :, 0, :] + zp2[:, 1:D + 1]               # z[m,0]+z[m+1,2]
    # interleave even/odd along depth
    out = jnp.stack([even, odd], axis=2)                      # (B, D, 2, ...)
    return out.reshape(B, 2 * D, 2 * H, 2 * W, Co)


# ---------------------------------------------------------------------------
# D-folded execution: for small depth counts (the cascade's finest level has
# D = 8) the whole volume is kept as (B, H, W, D*C) and every 3D conv runs
# as ONE dense 2D conv whose kernel embeds the banded depth structure as
# zeros. ~D/3 more FLOPs, but channel counts hit 64-128 so the MXU runs at
# full lane occupancy instead of 6-19% — measured ~3x faster end-to-end for
# the level-0 CostRegNet on v5e. All variants are exact (same taps, same
# padding semantics as the unfolded ops above).
# ---------------------------------------------------------------------------

import numpy as np


@functools.lru_cache(maxsize=None)
def _fold_scatter(D_in: int, D_out: int, kd: int, stride: int,
                  transpose: bool):
    """(do, di, tap) index triples selecting which kernel tap connects
    in-slice di to out-slice do; returns numpy index arrays."""
    dos, dis, taps = [], [], []
    for do in range(D_out):
        for di in range(D_in):
            if transpose:
                # out[o] = sum_i k[i] * x~[o+i-1], x~[2d] = x[d]
                # => x[di] feeds out[do] via tap i = 2*di - do + 1
                tap = 2 * di - do + 1
            else:
                # out[do] = sum_i k[i] * x[do*s + i - 1]  (pad_lo = 1)
                tap = di - stride * do + 1
            if 0 <= tap < kd:
                dos.append(do)
                dis.append(di)
                taps.append(tap)
    return (np.asarray(dos), np.asarray(dis), np.asarray(taps))


def _fold_kernel(kernel: Array, D_in: int, D_out: int, stride: int,
                 transpose: bool) -> Array:
    """(3, kh, kw, Ci, Co) -> (kh, kw, D_in*Ci, D_out*Co) banded-dense."""
    kd, kh, kw, Ci, Co = kernel.shape
    dos, dis, taps = _fold_scatter(D_in, D_out, kd, stride, transpose)
    kf = jnp.zeros((kh, kw, D_in, Ci, D_out, Co), kernel.dtype)
    # kernel[tap] applies input slice di to output slice do
    kf = kf.at[:, :, dis, :, dos, :].set(
        kernel.transpose(1, 2, 0, 3, 4)[:, :, taps].transpose(2, 0, 1, 3, 4))
    return kf.reshape(kh, kw, D_in * Ci, D_out * Co)


def conv3x3x3_folded(xf: Array, kernel: Array, D_in: int,
                     stride: int = 1) -> Array:
    """3x3x3 conv on a D-folded volume.

    xf: (B, H, W, D_in*Ci); kernel: (3, 3, 3, Ci, Co) (standard params).
    Returns (B, ceil(H/s), ceil(W/s), D_out*Co) with D_out = ceil(D_in/s).
    """
    Ci = xf.shape[-1] // D_in
    D_out = (D_in + stride - 1) // stride
    kf = _fold_kernel(kernel.astype(xf.dtype), D_in, D_out, stride, False)
    return jax.lax.conv_general_dilated(
        xf, kf, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_transpose3x3x3_s2_folded(xf: Array, kernel: Array,
                                  D_in: int) -> Array:
    """Transposed 3x3x3 stride-2 conv on a D-folded volume (exact 2x in all
    three dims). xf: (B, H, W, D_in*Ci) -> (B, 2H, 2W, 2*D_in*Co)."""
    kf = _fold_kernel(kernel.astype(xf.dtype), D_in, 2 * D_in, 2, True)
    return jax.lax.conv_general_dilated(
        xf, kf, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# WIDTH-folded 2D convs: the same banded-dense trade for the FEATURE net's
# small-channel 3x3 stride-1 convs (smooth0/smooth1 run ~1% MFU at Cout 8/16,
# scripts/probe_feature.py). Unlike the D-fold, the W-fold costs NOTHING to
# enter or leave: (B, H, W, C) -> (B, H, W/F, F*C) is the identical row-major
# layout (w = wb*F + j), so folded and unfolded stages mix freely.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _wfold_scatter(F: int, kw: int):
    """(wbt, ji, jo, t) quadruples: folded-block tap wbt (0..2 = blocks
    -1/0/+1), in-block input j, output j, original width tap t; stride 1,
    pad (kw-1)//2."""
    p = (kw - 1) // 2
    out = []
    for wbt in range(3):
        for jo in range(F):
            for ji in range(F):
                t = (wbt - 1) * F + ji - jo + p
                if 0 <= t < kw:
                    out.append((wbt, ji, jo, t))
    a = np.asarray(out)
    return a[:, 0], a[:, 1], a[:, 2], a[:, 3]


def wfold_kernel2d(kernel: Array, F: int) -> Array:
    """(kh, kw, Ci, Co) -> (kh, 3, F*Ci, F*Co) banded-dense width fold."""
    kh, kw, Ci, Co = kernel.shape
    wbt, ji, jo, t = _wfold_scatter(F, kw)
    kf = jnp.zeros((kh, 3, F, Ci, F, Co), kernel.dtype)
    kf = kf.at[:, wbt, ji, :, jo, :].set(kernel[:, t].transpose(1, 0, 2, 3))
    return kf.reshape(kh, 3, F * Ci, F * Co)


def conv2d_wfolded(x: Array, kernel: Array, F: int) -> Array:
    """k x k stride-1 SAME 2D conv on a width-folded layout.

    x: (B, H, W, Ci) with W % F == 0; kernel: (kh, kw, Ci, Co).
    Exact (same taps; dense zeros only add fp-noise-free products).
    """
    B, H, W, Ci = x.shape
    kh = kernel.shape[0]
    Co = kernel.shape[-1]
    ph = (kh - 1) // 2
    xf = x.reshape(B, H, W // F, F * Ci)
    kf = wfold_kernel2d(kernel.astype(x.dtype), F)
    zf = jax.lax.conv_general_dilated(
        xf, kf, (1, 1), ((ph, ph), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return zf.reshape(B, H, W, Co)


# Single source of truth for trace-time backend detection (this very
# logic needed a string-vs-Device fix once; keep one copy).
from ..kernels.patch_epilogue import _on_tpu  # noqa: E402


def wfold_factor(W: int, Ci: int, Co: int, lanes: int = 128) -> int:
    """Width-fold factor for a stride-1 conv, or 1 (don't fold).

    Measured policy (scripts/probe_wfold.py, v5e): the best F puts the
    LARGER of the folded input/output channel counts at the 128-lane
    width — smooth0 (32->8) wants F=4 (0.94 vs 1.67 ms plain; F=16 is
    1.26), conv0_1 (8->8) wants F=16 (0.18 vs 0.24), smooth1 (32->16)
    F=4/8 tie (0.13 vs 0.56). Folding Cout=32 LOSES (conv2_1: 0.21 vs
    0.10 plain) — the plain conv already fills a quarter of the lanes
    and the F/3 FLOP inflation dominates — so only Cout <= 16 folds.

    TPU only: on CPU the fold is pure loss (F/3x FLOPs and measurably
    slower XLA:CPU compiles across every full-model test); the op
    itself stays backend-agnostic and exact (tests/test_model.py pins
    folded == plain directly).
    """
    if Co > 16 or not _on_tpu():
        return 1
    F = max(1, lanes // max(Ci, Co, 1))
    while F > 1 and W % F:
        F //= 2
    return F


def fold_volume(x: Array) -> Array:
    """(B, D, H, W, C) -> (B, H, W, D*C)."""
    B, D, H, W, C = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, D * C)


def unfold_volume(xf: Array, D: int) -> Array:
    """(B, H, W, D*C) -> (B, D, H, W, C)."""
    B, H, W, DC = xf.shape
    return xf.reshape(B, H, W, D, DC // D).transpose(0, 3, 1, 2, 4)
