"""Depth filtering and fusion into colored point clouds.

Capability parity with the reference's eval.py step 2
(/root/reference/eval.py:245-353):
  - confidence mask: quarter-res probability upsampled x4 (bilinear) > conf;
  - geometric mask: >= min_geo_consistent source views pass the round-trip
    consistency check;
  - iterative refinement: the fused depth/color of a reference view is the
    average over its consistent sources (plus itself), and refined views are
    reused as source data for later reference views;
  - accepted pixels are back-projected to world space with the inverse
    level-0 projection, subsampled by ``skip`` and appended to the scan's
    point cloud (binary PLY).

The per-view IO is injected through callables so DTU/Tanks/BlendedMVS (or a
synthetic scene) can share the driver.
"""
from __future__ import annotations

import os
from typing import Callable

import numpy as np

from .consistency import check_geo_consistency
from .ply import write_ply
from .spill import SpillCache


def upsample_proba(proba: np.ndarray, img_wh: tuple[int, int]) -> np.ndarray:
    """x4 bilinear upsampling of the quarter-res confidence to full res."""
    import cv2
    return cv2.resize(proba, img_wh, interpolation=cv2.INTER_LINEAR)


def backproject(depth: np.ndarray, mask: np.ndarray, colors: np.ndarray,
                P_world2ref: np.ndarray, skip: int = 1):
    """Masked pixels -> world points. colors: (H, W, 3) float 0-255.

    Returns (xyz (N, 3) float32, rgb (N, 3) uint8).
    """
    H, W = depth.shape
    P_inv = np.linalg.inv(P_world2ref.astype(np.float64))[:3]
    ys, xs = np.nonzero(mask)
    if skip > 1:
        ys, xs = ys[::skip], xs[::skip]
    d = depth[ys, xs].astype(np.float64)
    h = np.stack([xs * d, ys * d, d, np.ones_like(d)], 0)     # (4, N)
    xyz = (P_inv @ h).T.astype(np.float32)                    # (N, 3)
    rgb = np.clip(colors[ys, xs], 0, 255).astype(np.uint8)
    return xyz, rgb


class _Keyed:
    """Namespaced view over a shared :class:`SpillCache`."""

    def __init__(self, cache: SpillCache, tag: str):
        self._cache, self._tag = cache, tag

    def __contains__(self, vid) -> bool:
        return (self._tag, vid) in self._cache

    def __getitem__(self, vid):
        return self._cache[(self._tag, vid)]

    def __setitem__(self, vid, arr) -> None:
        self._cache[(self._tag, vid)] = arr


def fuse_scan(metas: list[tuple[int, list[int]]],
              read_image: Callable[[int], np.ndarray],
              read_depth: Callable[[int], np.ndarray],
              read_proba: Callable[[int], np.ndarray],
              proj_mat: Callable[[int], np.ndarray],
              img_wh: tuple[int, int],
              conf: float = 0.999, min_geo_consistent: int = 5,
              max_ref_views: int = 400, skip: int = 1,
              backend: str = "auto", progress: bool = False,
              cache_bytes: float | None = 4e9):
    """Fuse one scan. metas: [(ref_vid, src_vids), ...].

    read_image(vid) -> (H, W, 3) RGB uint8 at img_wh;
    read_depth(vid) -> (H, W) float32 (may raise FileNotFoundError);
    read_proba(vid) -> quarter-res confidence; proj_mat(vid) -> (4, 4).
    ``cache_bytes`` bounds host RAM for the refined depth/image reuse
    cache — overflow spills to disk (the reference instead keeps up to
    20 GB resident at T&T scale, /root/reference/evaluations/README.md:34);
    None keeps everything in memory.
    Returns (xyz (N, 3) float32, rgb (N, 3) uint8).
    """
    vs, v_colors = [], []
    cache = SpillCache(max_bytes=cache_bytes)
    refined_images = _Keyed(cache, "img")
    refined_depths = _Keyed(cache, "dep")
    refined: set[int] = set()

    iterator = metas[:max_ref_views]
    if progress:
        from tqdm import tqdm
        iterator = tqdm(iterator)

    for ref_vid, src_vids in iterator:
        try:
            if ref_vid in refined:
                image_ref = refined_images[ref_vid].astype(np.float32)
                depth_ref = refined_depths[ref_vid]
            else:
                image_ref = read_image(ref_vid).astype(np.float32)
                depth_ref = read_depth(ref_vid)
            proba = upsample_proba(read_proba(ref_vid), img_wh)
            mask_conf = proba > conf
            P_ref = proj_mat(ref_vid)

            mask_geo_sum = np.zeros(depth_ref.shape, np.int32)
            depth_acc = depth_ref.copy()
            color_acc = image_ref.copy()
            for src_vid in src_vids:
                if src_vid in refined:
                    image_src = refined_images[src_vid].astype(np.float32)
                    depth_src = refined_depths[src_vid]
                else:
                    image_src = read_image(src_vid).astype(np.float32)
                    depth_src = read_depth(src_vid)
                    refined_depths[src_vid] = depth_src   # raw cache, as ref
                P_src = proj_mat(src_vid)
                d_reproj, m_geo, img_reproj = check_geo_consistency(
                    depth_ref, P_ref, depth_src, P_src, image_src,
                    backend=backend)
                mask_geo_sum += m_geo.astype(np.int32)
                depth_acc += d_reproj
                color_acc += img_reproj

            mask_geo_final = mask_geo_sum >= min_geo_consistent
            depth_refined = (depth_acc / (mask_geo_sum + 1)).astype(np.float32)
            image_refined = color_acc / (mask_geo_sum + 1)[..., None]

            refined_depths[ref_vid] = depth_refined
            refined_images[ref_vid] = np.clip(image_refined, 0,
                                              255).astype(np.uint8)
            refined.add(ref_vid)

            mask_final = mask_conf & mask_geo_final
            xyz, rgb = backproject(depth_refined, mask_final, image_refined,
                                   P_ref, skip)
            vs.append(xyz)
            v_colors.append(rgb)
        except FileNotFoundError:
            # views with too few valid sources have no depth prediction
            print(f"Skipping view {ref_vid}: missing depth prediction")
            continue

    cache.close()
    if not vs:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8))
    return np.vstack(vs), np.vstack(v_colors)


def fuse_and_write(out_path: str, *args, **kwargs) -> int:
    """Run :func:`fuse_scan` and write a binary PLY; returns #points."""
    xyz, rgb = fuse_scan(*args, **kwargs)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    write_ply(out_path, xyz, rgb)
    return len(xyz)
