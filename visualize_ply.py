"""Point-cloud viewer for fused results.

Capability parity with /root/reference/visualize_ply.py:6-41: open a fused
scan's PLY, optionally saving/loading a pinhole viewpoint JSON so different
reconstructions can be compared from an identical camera pose.

Open3D is used when importable (same behavior as the reference). This image
does not ship open3d, so there is a headless matplotlib fallback that renders
the cloud to a PNG from a viewpoint JSON of the same format — useful on
display-less TPU hosts.
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np

from casmvsnet_pl_tpu.fusion import read_ply


def get_opts(argv=None):
    parser = ArgumentParser()
    parser.add_argument('--root_dir', type=str, default='results/dtu/points',
                        help='directory containing the fused *.ply files')
    parser.add_argument('--scan', type=str, default='scan9')
    parser.add_argument('--use_viewpoint', default=False, action='store_true',
                        help='load viewpoint.json to set the camera')
    parser.add_argument('--save_viewpoint', default=False, action='store_true',
                        help='save the camera to viewpoint.json on exit')
    parser.add_argument('--viewpoint_json', type=str, default='viewpoint.json')
    parser.add_argument('--out_png', type=str, default='',
                        help='headless mode: render to this PNG instead of '
                             'opening a window')
    parser.add_argument('--max_points', type=int, default=2_000_000,
                        help='headless mode: subsample cap for rendering')
    return parser.parse_args(argv)


def _view_open3d(args, ply_path: str) -> None:
    import open3d as o3d
    pcd = o3d.io.read_point_cloud(ply_path)
    vis = o3d.visualization.Visualizer()
    vis.create_window()
    vis.add_geometry(pcd)
    ctr = vis.get_view_control()
    if args.use_viewpoint and os.path.exists(args.viewpoint_json):
        param = o3d.io.read_pinhole_camera_parameters(args.viewpoint_json)
        ctr.convert_from_pinhole_camera_parameters(param)
    vis.run()
    if args.save_viewpoint:
        param = ctr.convert_to_pinhole_camera_parameters()
        o3d.io.write_pinhole_camera_parameters(args.viewpoint_json, param)
    vis.destroy_window()


def _view_headless(args, ply_path: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xyz, rgb = read_ply(ply_path)
    n = xyz.shape[0]
    if n > args.max_points:
        sel = np.random.RandomState(0).choice(n, args.max_points, replace=False)
        xyz, rgb = xyz[sel], rgb[sel]

    elev, azim = 20.0, -60.0
    if args.use_viewpoint and os.path.exists(args.viewpoint_json):
        with open(args.viewpoint_json) as f:
            vp = json.load(f)
        elev = vp.get("elev", elev)
        azim = vp.get("azim", azim)

    fig = plt.figure(figsize=(12, 9))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=rgb / 255.0, s=0.05,
               linewidths=0)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    out = args.out_png or f"{args.scan}.png"
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"{n} points; rendered to {out}")
    if args.save_viewpoint:
        with open(args.viewpoint_json, "w") as f:
            json.dump({"elev": elev, "azim": azim}, f)


if __name__ == "__main__":
    args = get_opts()
    ply_path = os.path.join(args.root_dir, f"{args.scan}.ply")
    try:
        import open3d  # noqa: F401
        have_o3d = not args.out_png
    except ImportError:
        have_o3d = False
    if have_o3d:
        _view_open3d(args, ply_path)
    else:
        _view_headless(args, ply_path)
