"""Visualization helpers for TensorBoard image panels.

Parity with /root/reference/utils/visualization.py: depth maps are normalized
over their positive range and JET-colormapped; probability maps are
BONE-colormapped. Returns (H, W, 3) float arrays in [0, 1], channels-last.
"""
from __future__ import annotations

import numpy as np


def _apply_colormap(x_u8: np.ndarray, cmap_name: str) -> np.ndarray:
    import cv2
    cmap = {"jet": cv2.COLORMAP_JET, "bone": cv2.COLORMAP_BONE}[cmap_name]
    bgr = cv2.applyColorMap(x_u8, cmap)
    return bgr[:, :, ::-1].astype(np.float32) / 255.0      # to RGB [0,1]


def visualize_depth(depth: np.ndarray, cmap: str = "jet") -> np.ndarray:
    """(H, W) depth -> (H, W, 3) RGB; normalized over positive depths."""
    x = np.nan_to_num(np.asarray(depth, np.float32))
    positive = x[x > 0]
    mi = positive.min() if positive.size else 0.0
    ma = x.max() if x.size else 1.0
    x = (x - mi) / (ma - mi + 1e-8)
    return _apply_colormap((255 * np.clip(x, 0, 1)).astype(np.uint8), cmap)


def visualize_prob(prob: np.ndarray, cmap: str = "bone") -> np.ndarray:
    """(H, W) probability in [0, 1] -> (H, W, 3) RGB."""
    x = np.nan_to_num(np.asarray(prob, np.float32))
    return _apply_colormap((255 * np.clip(x, 0, 1)).astype(np.uint8), cmap)
