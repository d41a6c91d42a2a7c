"""Synthetic multi-view scenes with exact ground truth.

Used by the test suite and by ``bench.py`` so the framework can be exercised
end-to-end without the DTU data on disk (the reference has no equivalent —
its only smoke test is a notebook against real data, SURVEY.md §4).

The scene is a textured plane at depth ``z0`` (optionally tilted), observed
by cameras translated along x with identity rotation. Every pixel of every
view samples the same world texture, so:
  - GT depth is known in closed form;
  - the variance cost volume of the raw images is minimized at the true depth;
  - a training run must drive predicted depth toward ``z0``.

``write_dtu_tree`` materializes the scene in DTU's on-disk format (pair.txt,
cam.txt, PFM depths, mask PNGs, rectified PNGs) to exercise the data readers.
"""
from __future__ import annotations

import os

import numpy as np

from .pfm import save_pfm


def _smooth_texture(rng: np.random.RandomState, size: int = 64,
                    upsample: int = 8) -> np.ndarray:
    """Smooth random RGB texture in [0,1], (size*upsample, size*upsample, 3)."""
    import cv2
    base = rng.rand(size, size, 3).astype(np.float32)
    big = cv2.resize(base, (size * upsample, size * upsample),
                     interpolation=cv2.INTER_CUBIC)
    return np.clip(big, 0, 1)


def _sample_texture(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Bilinear sample tex at float coords (u, v) in texture pixels, clamped."""
    H, W = tex.shape[:2]
    u = np.clip(u, 0, W - 1.001)
    v = np.clip(v, 0, H - 1.001)
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    fu, fv = (u - u0)[..., None], (v - v0)[..., None]
    t00 = tex[v0, u0]
    t01 = tex[v0, u0 + 1]
    t10 = tex[v0 + 1, u0]
    t11 = tex[v0 + 1, u0 + 1]
    return (t00 * (1 - fu) * (1 - fv) + t01 * fu * (1 - fv) +
            t10 * (1 - fu) * fv + t11 * fu * fv)


class PlaneScene:
    """A textured plane z = z0 + slope_x * X viewed by V translated cameras."""

    def __init__(self, img_wh=(64, 64), n_views: int = 3, z0: float = 500.0,
                 baseline: float = 10.0, focal: float = 100.0,
                 slope_x: float = 0.0, seed: int = 0):
        self.img_wh = img_wh
        self.n_views = n_views
        self.z0 = z0
        self.baseline = baseline
        self.focal = focal
        self.slope_x = slope_x
        rng = np.random.RandomState(seed)
        self.texture = _smooth_texture(rng)
        W, H = img_wh
        self.K = np.array([[focal, 0, (W - 1) / 2],
                           [0, focal, (H - 1) / 2],
                           [0, 0, 1]], np.float32)
        # world->camera extrinsics: camera v sits at (v*baseline, 0, 0)
        self.extrinsics = []
        for v in range(n_views):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = -v * baseline
            self.extrinsics.append(E)

    def _plane_depth(self, X: np.ndarray) -> np.ndarray:
        return self.z0 + self.slope_x * X

    def depth_map(self, view: int) -> np.ndarray:
        """GT depth (camera z) of the plane for one view, (H, W) float32."""
        W, H = self.img_wh
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        cx, cy, f = self.K[0, 2], self.K[1, 2], self.focal
        # ray: X_cam = (u-cx)/f * z, plane in world: z = z0 + s*(X_cam + bx)
        bx = view * self.baseline
        dir_x = (u - cx) / f
        z = (self.z0 + self.slope_x * bx) / (1.0 - self.slope_x * dir_x)
        return z.astype(np.float32)

    def render(self, view: int) -> np.ndarray:
        """Render view as float RGB in [0,1], (H, W, 3)."""
        W, H = self.img_wh
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        cx, cy, f = self.K[0, 2], self.K[1, 2], self.focal
        z = self.depth_map(view)
        Xw = (u - cx) / f * z + view * self.baseline
        Yw = (v - cy) / f * z
        # map world plane coords to texture pixels: span ~ +-z0/2
        th, tw = self.texture.shape[:2]
        span = self.z0
        tu = (Xw / span + 0.5) * (tw - 1)
        tv = (Yw / span + 0.5) * (th - 1)
        return _sample_texture(self.texture, tu, tv).astype(np.float32)

    def surface_points(self, step: int = 1) -> np.ndarray:
        """Exact GT surface points (world frame, scene units) for all views.

        Backprojects every ``step``-th pixel of every view's closed-form
        depth map: with identity rotation and camera v centered at
        (v*baseline, 0, 0), world = (X_cam + v*baseline, Y_cam, z). The
        union over views is the observed surface — the "stl" ground truth
        for point-cloud benchmarking (evaluation/dtu_eval.py) of clouds
        fused from this scene's predictions.
        """
        W, H = self.img_wh
        cx, cy, f = self.K[0, 2], self.K[1, 2], self.focal
        u, v = np.meshgrid(np.arange(0, W, step, dtype=np.float32),
                           np.arange(0, H, step, dtype=np.float32))
        pts = []
        for view in range(self.n_views):
            z = self.depth_map(view)[::step, ::step]
            X = (u - cx) / f * z + view * self.baseline
            Y = (v - cy) / f * z
            pts.append(np.stack([X, Y, z], axis=-1).reshape(-1, 3))
        return np.concatenate(pts).astype(np.float64)

    def proj_mats_level(self, level_scale: float = 1.0) -> np.ndarray:
        """Absolute 4x4 projections K_s @ E per view at a resolution scale."""
        mats = []
        K = self.K.copy()
        K[:2] *= level_scale
        for E in self.extrinsics:
            P = np.eye(4, dtype=np.float32)
            P[:3] = (K @ E[:3]).astype(np.float32)
            mats.append(P)
        return np.stack(mats)

    def model_inputs(self, levels: int = 3, normalize: bool = True):
        """Build (imgs, proj_mats, init_depth_min) ready for CascadeMVSNet.

        Returns imgs (1, V, H, W, 3), proj_mats (1, V-1, L, 3, 4) fine->coarse,
        gt depth pyramid {'level_l': (1, h, w)}.
        """
        from .base import IMAGENET_MEAN, IMAGENET_STD
        from .cams import relative_proj_mats
        import cv2

        imgs = np.stack([self.render(v) for v in range(self.n_views)])
        if normalize:
            imgs = (imgs - IMAGENET_MEAN) / IMAGENET_STD
        abs_mats = np.stack(
            [self.proj_mats_level(0.5 ** l) for l in range(levels)], axis=1)
        rel = relative_proj_mats(abs_mats[0], abs_mats[1:])   # (V-1, L, 3, 4)

        depth0 = self.depth_map(0)
        depths = {"level_0": depth0[None]}
        cur = depth0
        for l in range(1, levels):
            cur = cv2.resize(cur, None, fx=0.5, fy=0.5,
                             interpolation=cv2.INTER_NEAREST)
            depths[f"level_{l}"] = cur[None]
        return imgs[None].astype(np.float32), rel[None], depths


def write_dtu_tree(root: str, scans=("scan1", "scan2"), n_cams: int = 5,
                   img_wh=(64, 64), native_wh=(256, 256), seed: int = 0,
                   z0: float = 460.0, slope_x: float = 0.3) -> None:
    """Write a miniature DTU-format tree for data-reader tests.

    Follows DTU's on-disk layout exactly but with configurable (tiny) sizes:
    rectified PNGs at ``img_wh`` x 7 lights, native-res PFM depths + mask
    PNGs, per-view cam.txt at train (1/4 of img_wh) and test (1/4 native)
    scales, and a shared pair.txt.
    """
    import cv2
    rng = np.random.RandomState(seed)
    W, H = img_wh
    os.makedirs(os.path.join(root, "Cameras/train"), exist_ok=True)

    # pair.txt: every view lists all the others, best-first
    with open(os.path.join(root, "Cameras/pair.txt"), "w") as f:
        f.write(f"{n_cams}\n")
        for ref in range(n_cams):
            srcs = [v for v in range(n_cams) if v != ref]
            f.write(f"{ref}\n{len(srcs)} " +
                    " ".join(f"{v} {100 - i}" for i, v in enumerate(srcs)) +
                    "\n")

    def write_cam(path, K, E, depth_min):
        with open(path, "w") as f:
            f.write("extrinsic\n")
            for row in E:
                f.write(" ".join(f"{x:.6f}" for x in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(f"{x:.6f}" for x in row) + "\n")
            f.write(f"\n{depth_min} 2.5\n")

    # off-center depth + slope: a random-init cascade predicts ~the sweep
    # center, so GT must sit away from it for training tests to have headroom
    scene = PlaneScene(img_wh=img_wh, n_views=n_cams, seed=seed, z0=z0,
                       slope_x=slope_x)
    for vid in range(n_cams):
        E = scene.extrinsics[vid]
        K_train = scene.K.copy()
        K_train[:2] /= 4                       # train cams: 1/4 of img_wh
        write_cam(os.path.join(root, f"Cameras/train/{vid:08d}_cam.txt"),
                  K_train, E, 425.0)
        K_test = scene.K.copy()                # test cams: native resolution
        K_test[0] *= native_wh[0] / W
        K_test[1] *= native_wh[1] / H
        write_cam(os.path.join(root, f"Cameras/{vid:08d}_cam.txt"),
                  K_test, E, 425.0)

    for scan in scans:
        os.makedirs(os.path.join(root, f"Rectified/{scan}_train"),
                    exist_ok=True)
        os.makedirs(os.path.join(root, f"Rectified/{scan}"), exist_ok=True)
        os.makedirs(os.path.join(root, f"Depths/{scan}"), exist_ok=True)
        for vid in range(n_cams):
            img = (scene.render(vid) * 255).astype(np.uint8)
            for light in range(7):
                shade = np.clip(img.astype(np.int32) + (light - 3) * 5,
                                0, 255).astype(np.uint8)
                for sub in (f"{scan}_train", scan):
                    cv2.imwrite(os.path.join(
                        root, f"Rectified/{sub}/"
                        f"rect_{vid + 1:03d}_{light}_r5000.png"),
                        shade[:, :, ::-1])
            # native-res depth + visibility mask
            nd = cv2.resize(scene.depth_map(vid),
                            native_wh, interpolation=cv2.INTER_NEAREST)
            save_pfm(os.path.join(root, f"Depths/{scan}/depth_map_{vid:04d}.pfm"),
                     nd.astype(np.float32))
            mask = (rng.rand(native_wh[1], native_wh[0]) > 0.1
                    ).astype(np.uint8) * 255
            cv2.imwrite(os.path.join(root,
                                     f"Depths/{scan}/depth_visual_{vid:04d}.png"),
                        mask)
