"""Shared dataset machinery: image loading/normalization, depth pyramids.

Datasets here are plain Python sequences yielding numpy dicts (channels-last)
— batching/collation and device transfer live in ``data.loader``. The sample
schema matches the reference's (imgs, proj_mats, depths, masks,
init_depth_min, depth_interval, scan_vid) so the training system and eval
pipeline are drop-in compatible.
"""
from __future__ import annotations

import numpy as np
from PIL import Image

# ImageNet statistics, as in the reference transforms
# (/root/reference/datasets/dtu.py:132-142)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 normalized (H, W, 3), channels-last."""
    img = img.astype(np.float32) / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def unnormalize_image(img: np.ndarray) -> np.ndarray:
    """Invert :func:`normalize_image` -> float in [0, 1]."""
    return np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


def load_image(path: str, img_wh: tuple[int, int] | None = None) -> np.ndarray:
    """Load RGB image; optional bilinear resize to (w, h). Returns uint8 HWC."""
    img = Image.open(path).convert("RGB")
    if img_wh is not None:
        img = img.resize(img_wh, Image.BILINEAR)
    return np.asarray(img)


def color_jitter(img: np.ndarray, rng: np.random.RandomState,
                 brightness: float = 0.25, contrast: float = 0.5) -> np.ndarray:
    """Brightness/contrast jitter with torchvision ColorJitter semantics:
    factors drawn uniformly from [1-b, 1+b] / [1-c, 1+c], random order.
    Used by BlendedMVS training (/root/reference/datasets/blendedmvs.py:132-133).
    """
    img = img.astype(np.float32)
    ops = [0, 1]
    rng.shuffle(ops)
    for op in ops:
        if op == 0:
            f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
            img = img * f
        else:
            f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
            mean = img.mean(axis=(0, 1), keepdims=True).mean(axis=-1,
                                                             keepdims=True)
            img = (img - mean) * f + mean
    return np.clip(img, 0, 255).astype(np.uint8)


def depth_pyramid(depth_0: np.ndarray, levels: int = 3) -> dict[str, np.ndarray]:
    """Nearest-neighbor half-resolution pyramid {'level_0': full, ...}."""
    import cv2
    out = {"level_0": depth_0.astype(np.float32)}
    cur = depth_0
    for l in range(1, levels):
        cur = cv2.resize(cur, None, fx=0.5, fy=0.5,
                         interpolation=cv2.INTER_NEAREST)
        out[f"level_{l}"] = cur.astype(np.float32)
    return out


def mask_pyramid(mask_0: np.ndarray, levels: int = 3) -> dict[str, np.ndarray]:
    """Nearest-neighbor boolean mask pyramid."""
    import cv2
    out = {"level_0": mask_0.astype(bool)}
    cur = mask_0.astype(np.uint8)
    for l in range(1, levels):
        cur = cv2.resize(cur, None, fx=0.5, fy=0.5,
                         interpolation=cv2.INTER_NEAREST)
        out[f"level_{l}"] = cur.astype(bool)
    return out
