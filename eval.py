"""Inference + depth filtering/fusion entry point.

Drop-in equivalent of the reference's ``python eval.py ...``
(/root/reference/eval.py): step 1 runs jit-compiled depth inference per
reference view and writes ``depth_{vid:04d}.pfm`` (full res) and
``proba_{vid:04d}.pfm`` (quarter res) under ``results/<dataset>/depth/<scan>``;
step 2 fuses them into ``results/<dataset>/points/<scan>.ply`` via
confidence + geometric-consistency filtering with iterative refinement
(native C++ kernel with numpy fallback).

Because XLA compiles per shape, all views of a dataset config share one
compiled executable (shapes are fixed by --img_wh).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np

from casmvsnet_pl_tpu.opt import sampling_choices


def get_opts(argv=None):
    parser = ArgumentParser()
    parser.add_argument('--root_dir', type=str,
                        default='/data/DTU/mvs_training/dtu/')
    parser.add_argument('--dataset_name', type=str, default='dtu',
                        choices=['dtu', 'tanks', 'blendedmvs'])
    parser.add_argument('--split', type=str, default='test')
    parser.add_argument('--scan', type=str, default='',
                        help='specify scan to evaluate (must be in the split)')
    parser.add_argument('--cpu', default=False, action='store_true',
                        help='run depth inference on CPU instead of TPU')
    # depth prediction
    parser.add_argument('--n_views', type=int, default=5)
    parser.add_argument('--depth_interval', type=float, default=2.65)
    parser.add_argument('--n_depths', nargs='+', type=int, default=[8, 32, 48])
    parser.add_argument('--interval_ratios', nargs='+', type=float,
                        default=[1.0, 2.0, 4.0])
    parser.add_argument('--num_groups', type=int, default=1,
                        choices=[1, 2, 4, 8])
    parser.add_argument('--img_wh', nargs="+", type=int, default=[1152, 864],
                        help='resolution (img_w, img_h), multiples of 32')
    parser.add_argument('--ckpt_path', type=str, default='')
    parser.add_argument('--save_visual', default=False, action='store_true')
    parser.add_argument('--precision', type=str, default='bf16',
                        choices=['bf16', 'f32'])
    # point cloud fusion
    parser.add_argument('--sampling', type=str, default='auto',
                        choices=sampling_choices(),
                        help='plane-sweep sampling strategy (all listed '
                             'modes are exact; the approximate "window" '
                             'mode needs CASMVS_ENABLE_WINDOW_SAMPLING=1)')
    parser.add_argument('--conf', type=float, default=0.999,
                        help='min confidence for a pixel to be valid')
    parser.add_argument('--min_geo_consistent', type=int, default=5,
                        help='min consistent views for a pixel to be valid')
    parser.add_argument('--max_ref_views', type=int, default=400)
    parser.add_argument('--skip', type=int, default=1,
                        help='point subsampling when building the cloud')
    parser.add_argument('--fusion_backend', type=str, default='auto',
                        choices=['auto', 'native', 'numpy'])
    parser.add_argument('--fusion_cache_gb', type=float, default=4.0,
                        help='host-RAM budget for the fusion refinement '
                             'cache; overflow spills to disk (0 = keep '
                             'everything in memory, like the reference '
                             'up to ~20 GB at T&T scale)')
    parser.add_argument('--skip_inference', default=False, action='store_true',
                        help='reuse existing depth predictions (fusion only)')
    parser.add_argument('--skip_fusion', default=False, action='store_true')
    return parser.parse_args(argv)


def build_predictor(args):
    """jit-compiled forward returning full-res depth + quarter-res proba."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from casmvsnet_pl_tpu.models import CascadeMVSNet
    from casmvsnet_pl_tpu.utils import (extract_model_params, init_on_cpu,
                                        load_checkpoint)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model = CascadeMVSNet(n_depths=tuple(args.n_depths),
                          interval_ratios=tuple(args.interval_ratios),
                          num_groups=args.num_groups, dtype=dtype,
                          sampling=args.sampling)

    # Params are spatial-shape independent, so init at a small probe shape
    # on the host CPU (full-res eager init on the TPU costs minutes of
    # tunnel round trips; see utils/init.py).
    imgs0 = np.zeros((1, args.n_views, 64, 64, 3), np.float32)
    proj0 = np.zeros((1, args.n_views - 1, 3, 3, 4), np.float32)
    variables = init_on_cpu(model, jax.random.PRNGKey(0), imgs0, proj0,
                            425.0, 2.65)
    if args.ckpt_path:
        ckpt = load_checkpoint(args.ckpt_path)
        params = jax.tree.map(jnp.asarray, extract_model_params(ckpt))
        batch_stats = jax.tree.map(jnp.asarray,
                                   ckpt.get("batch_stats",
                                            variables.get("batch_stats", {})))
        variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def predict(imgs, proj_mats, init_depth_min, depth_interval):
        out = model.apply(variables, imgs, proj_mats, init_depth_min,
                          depth_interval)
        return out["depth_0"], out["confidence_2"]

    return predict


def run_inference(args, dataset, scans):
    import jax
    from tqdm import tqdm
    from casmvsnet_pl_tpu.data import save_pfm

    predict = build_predictor(args)
    depth_dir = f'results/{args.dataset_name}/depth'
    print('Creating depth and confidence predictions...')
    if args.scan:
        data_range = [i for i, x in enumerate(dataset.metas)
                      if x[0] == args.scan]
    else:
        data_range = range(len(dataset))
    for i in tqdm(data_range):
        sample = dataset[i]
        scan, vid = sample['scan_vid']
        os.makedirs(os.path.join(depth_dir, scan), exist_ok=True)
        depth, proba = predict(sample['imgs'][None], sample['proj_mats'][None],
                               float(sample['init_depth_min']),
                               float(sample['depth_interval']))
        depth = np.nan_to_num(np.asarray(depth[0], np.float32))
        proba = np.nan_to_num(np.asarray(proba[0], np.float32))  # 1/4 scale
        save_pfm(os.path.join(depth_dir, f'{scan}/depth_{vid:04d}.pfm'), depth)
        save_pfm(os.path.join(depth_dir, f'{scan}/proba_{vid:04d}.pfm'), proba)
        if args.save_visual:
            import cv2
            mi = np.min(depth[depth > 0]) if (depth > 0).any() else 0
            ma = np.max(depth)
            vis = (255 * (depth - mi) / (ma - mi + 1e-8)).astype(np.uint8)
            cv2.imwrite(os.path.join(depth_dir,
                                     f'{scan}/depth_visual_{vid:04d}.jpg'),
                        cv2.applyColorMap(vis, cv2.COLORMAP_JET))
            cv2.imwrite(os.path.join(depth_dir,
                                     f'{scan}/proba_visual_{vid:04d}.jpg'),
                        (255 * (proba > args.conf)).astype(np.uint8))


def run_fusion(args, dataset, scans):
    import cv2
    from casmvsnet_pl_tpu.data import read_pfm
    from casmvsnet_pl_tpu.fusion import fuse_and_write

    point_dir = f'results/{args.dataset_name}/points'
    depth_dir = f'results/{args.dataset_name}/depth'
    os.makedirs(point_dir, exist_ok=True)
    print('Fusing point clouds...')

    def image_path(scan, vid):
        if args.dataset_name == 'dtu':
            return os.path.join(args.root_dir,
                                f'Rectified/{scan}/rect_{vid + 1:03d}_3_r5000.png')
        if args.dataset_name == 'tanks':
            return os.path.join(args.root_dir, dataset.split, scan,
                                f'images/{vid:08d}.jpg')
        return os.path.join(args.root_dir, scan,
                            f'blended_images/{vid:08d}.jpg')

    def proj_mat_of(scan):
        def fn(vid):
            if args.dataset_name == 'dtu':
                return dataset.proj_mats[vid][0][0]
            return dataset.proj_mats[scan][vid][0][0]
        return fn

    for scan in scans:
        print(f'Processing {scan} ...')
        metas = [(m[2], m[3]) for m in dataset.metas if m[0] == scan]

        def read_image(vid):
            img = cv2.imread(image_path(scan, vid))
            img = cv2.resize(img, tuple(args.img_wh),
                             interpolation=cv2.INTER_LINEAR)
            return img[:, :, ::-1]                            # BGR -> RGB

        def read_depth(vid):
            return read_pfm(f'{depth_dir}/{scan}/depth_{vid:04d}.pfm')[0]

        def read_proba(vid):
            return read_pfm(f'{depth_dir}/{scan}/proba_{vid:04d}.pfm')[0]

        n = fuse_and_write(
            f'{point_dir}/{scan}.ply', metas, read_image, read_depth,
            read_proba, proj_mat_of(scan), tuple(args.img_wh),
            conf=args.conf, min_geo_consistent=args.min_geo_consistent,
            max_ref_views=args.max_ref_views, skip=args.skip,
            backend=args.fusion_backend, progress=True,
            cache_bytes=(args.fusion_cache_gb * 1e9
                         if args.fusion_cache_gb > 0 else None))
        print(f'{scan} contains {n / 1e6:.2f} M points')
    print('Done!')


if __name__ == "__main__":
    args = get_opts()
    from casmvsnet_pl_tpu.data import dataset_dict
    dataset = dataset_dict[args.dataset_name](
        args.root_dir, args.split, n_views=args.n_views,
        depth_interval=args.depth_interval, img_wh=tuple(args.img_wh))
    scans = [args.scan] if args.scan else dataset.scans
    if not args.skip_inference:
        run_inference(args, dataset, scans)
    if not args.skip_fusion:
        run_fusion(args, dataset, scans)
