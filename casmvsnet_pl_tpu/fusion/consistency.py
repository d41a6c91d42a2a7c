"""Geometric-consistency check between a reference and a source depth map.

Capability parity with the reference's numba kernels + cv2.remap pipeline
(/root/reference/eval.py:113-182): project each reference pixel into the
source view with its predicted depth, bilinearly sample the source depth and
image there, reproject back, and accept pixels whose round trip lands within
1 px and 1% relative depth error. Accepted pixels return the reprojected
depth and the source color (for iterative refinement); rejected pixels are 0.

Two backends:
  - a fused C++ kernel (OpenMP) compiled on demand (native/fusion_kernels.cc)
    — the TPU-framework equivalent of the reference's numba JIT (N3 in
    SURVEY.md §2.2);
  - a vectorized numpy/cv2 fallback, also used as the test oracle.
"""
from __future__ import annotations

import numpy as np

from .native import get_native_lib


def _project(P: np.ndarray, xy: np.ndarray, depth: np.ndarray):
    """Apply a (3, 4) projection to pixels lifted by their depth.

    xy: (2, H, W) pixel coords; depth: (H, W).
    Returns (x', y', z') each (H, W).
    """
    x, y = xy[0], xy[1]
    h = np.stack([x * depth, y * depth, depth, np.ones_like(depth)], 0)
    q = np.einsum("ij,jhw->ihw", P.astype(np.float64), h.astype(np.float64))
    return q[0], q[1], q[2]


def check_geo_consistency_np(depth_ref: np.ndarray, P_world2ref: np.ndarray,
                             depth_src: np.ndarray, P_world2src: np.ndarray,
                             image_src: np.ndarray):
    """Numpy/cv2 backend. depth_*: (H, W) float32; P_*: (4, 4);
    image_src: (H, W, 3).

    Returns (depth_ref_reproj, mask_geo, image_src2ref).
    """
    import cv2
    H, W = depth_ref.shape
    xy = np.mgrid[:H, :W][::-1].astype(np.float32)           # (2, H, W): x, y

    P_r2s = (P_world2src.astype(np.float64)
             @ np.linalg.inv(P_world2ref.astype(np.float64)))[:3]
    qx, qy, qz = _project(P_r2s, xy, depth_ref)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = (qx / qz).astype(np.float32)
        ys = (qy / qz).astype(np.float32)

    depth_src2ref = cv2.remap(depth_src, xs, ys,
                              interpolation=cv2.INTER_LINEAR)
    image_src2ref = cv2.remap(image_src, xs, ys,
                              interpolation=cv2.INTER_LINEAR)

    P_s2r = (P_world2ref.astype(np.float64)
             @ np.linalg.inv(P_world2src.astype(np.float64)))[:3]
    rx, ry, rz = _project(P_s2r, np.stack([xs, ys]), depth_src2ref)
    depth_ref_reproj = rz.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        xr = (rx / rz).astype(np.float32)
        yr = (ry / rz).astype(np.float32)

    with np.errstate(invalid="ignore", divide="ignore"):
        pix_err2 = (xr - xy[0]) ** 2 + (yr - xy[1]) ** 2
        rel_err = np.abs((depth_ref_reproj - depth_ref) / depth_ref)
        mask_geo = (pix_err2 < 1.0) & (rel_err < 0.01)
    mask_geo &= np.isfinite(pix_err2) & np.isfinite(rel_err)

    depth_ref_reproj = np.where(mask_geo, depth_ref_reproj, 0.0) \
        .astype(np.float32)
    image_src2ref = np.where(mask_geo[..., None], image_src2ref, 0.0)
    return depth_ref_reproj, mask_geo, image_src2ref


def check_geo_consistency_native(depth_ref, P_world2ref, depth_src,
                                 P_world2src, image_src):
    """Fused C++ backend (one pass over pixels, OpenMP-parallel)."""
    lib = get_native_lib()
    H, W = depth_ref.shape
    P_r2s = np.ascontiguousarray(
        (P_world2src.astype(np.float64)
         @ np.linalg.inv(P_world2ref.astype(np.float64)))[:3])
    P_s2r = np.ascontiguousarray(
        (P_world2ref.astype(np.float64)
         @ np.linalg.inv(P_world2src.astype(np.float64)))[:3])
    depth_ref = np.ascontiguousarray(depth_ref, np.float32)
    depth_src = np.ascontiguousarray(depth_src, np.float32)
    image_src = np.ascontiguousarray(image_src, np.float32)
    out_depth = np.empty((H, W), np.float32)
    out_mask = np.empty((H, W), np.uint8)
    out_image = np.empty((H, W, 3), np.float32)
    lib.geo_consistency(depth_ref, depth_src, image_src, P_r2s, P_s2r,
                        out_depth, out_mask, out_image, H, W)
    return out_depth, out_mask.astype(bool), out_image


def check_geo_consistency(depth_ref, P_world2ref, depth_src, P_world2src,
                          image_src, backend: str = "auto"):
    """Dispatch to the native kernel when available, else numpy."""
    if backend in ("auto", "native") and get_native_lib() is not None:
        return check_geo_consistency_native(depth_ref, P_world2ref,
                                            depth_src, P_world2src, image_src)
    if backend == "native":
        raise RuntimeError("native fusion kernel unavailable")
    return check_geo_consistency_np(depth_ref, P_world2ref, depth_src,
                                    P_world2src, image_src)
