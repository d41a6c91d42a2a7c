"""Interactive demo: run one sample through CascadeMVSNet and visualize.

Script equivalent of the reference's test.ipynb (load checkpoint -> run one
DTU test sample -> visualize depth / confidence / 2mm-error map, plus a
timing cell). Without --root_dir it runs on the built-in synthetic plane
scene so the demo works on a machine with no dataset.

Usage:
    python demo.py --ckpt_path ckpts/exp/best.ckpt \
        --root_dir /data/DTU/mvs_training/dtu --scan scan9 --view 22
    python demo.py            # synthetic scene, random weights
"""
from __future__ import annotations

import time
from argparse import ArgumentParser

import numpy as np


def get_opts(argv=None):
    parser = ArgumentParser()
    parser.add_argument('--root_dir', type=str, default='',
                        help='DTU root; empty = synthetic plane scene')
    parser.add_argument('--split', type=str, default='test')
    parser.add_argument('--scan', type=str, default='scan9')
    parser.add_argument('--view', type=int, default=22)
    parser.add_argument('--n_views', type=int, default=3)
    parser.add_argument('--depth_interval', type=float, default=2.65)
    parser.add_argument('--img_wh', nargs='+', type=int, default=[640, 512])
    parser.add_argument('--num_groups', type=int, default=1)
    parser.add_argument('--ckpt_path', type=str, default='')
    parser.add_argument('--precision', type=str, default='bf16',
                        choices=['bf16', 'f32'])
    parser.add_argument('--out_png', type=str, default='demo.png')
    parser.add_argument('--time_iters', type=int, default=10,
                        help='timing loop iterations (0 to skip)')
    return parser.parse_args(argv)


def load_sample(args):
    if args.root_dir:
        from casmvsnet_pl_tpu.data import dataset_dict
        dataset = dataset_dict['dtu'](
            args.root_dir, args.split, n_views=args.n_views,
            depth_interval=args.depth_interval, img_wh=tuple(args.img_wh))
        idx = next(i for i, m in enumerate(dataset.metas)
                   if m[0] == args.scan and m[2] == args.view)
        sample = dataset[idx]
        return sample, dataset
    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    W, H = args.img_wh
    scene = PlaneScene(img_wh=(W, H), n_views=args.n_views, z0=460.0,
                       baseline=12.0, focal=600.0, slope_x=0.2)
    imgs, proj, depths = scene.model_inputs()
    sample = {'imgs': imgs[0], 'proj_mats': proj[0],
              'init_depth_min': np.float32(425.0),
              'depth_interval': np.float32(2.65),
              'depths': {k: v[0] for k, v in depths.items()},
              'masks': {k: np.ones(v[0].shape, bool)
                        for k, v in depths.items()},
              'scan_vid': ('synthetic', 0)}
    return sample, None


def main(argv=None):
    args = get_opts(argv)
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    from casmvsnet_pl_tpu.utils import extract_model_params, load_checkpoint
    from casmvsnet_pl_tpu.utils.visualization import (visualize_depth,
                                                      visualize_prob)

    dtype = jnp.bfloat16 if args.precision == 'bf16' else jnp.float32
    model = CascadeMVSNet(num_groups=args.num_groups, dtype=dtype)

    sample, _ = load_sample(args)
    imgs = jnp.asarray(sample['imgs'][None])
    proj = jnp.asarray(sample['proj_mats'][None])
    dmin = float(sample['init_depth_min'])
    dint = float(sample['depth_interval'])

    variables = model.init(jax.random.PRNGKey(0), imgs, proj, dmin, dint)
    if args.ckpt_path:
        ckpt = load_checkpoint(args.ckpt_path)
        variables = {
            'params': jax.tree.map(jnp.asarray, extract_model_params(ckpt)),
            'batch_stats': jax.tree.map(
                jnp.asarray, ckpt.get('batch_stats',
                                      variables.get('batch_stats', {})))}

    @jax.jit
    def predict(imgs, proj):
        out = model.apply(variables, imgs, proj, dmin, dint)
        return out['depth_0'], out['confidence_0']

    t0 = time.perf_counter()
    depth, conf = jax.block_until_ready(predict(imgs, proj))
    print(f'compile+first run: {time.perf_counter() - t0:.2f}s')
    if args.time_iters:
        t0 = time.perf_counter()
        for _ in range(args.time_iters):
            depth, conf = predict(imgs, proj)
        jax.block_until_ready(depth)
        dt = (time.perf_counter() - t0) / args.time_iters
        print(f'inference: {dt * 1e3:.1f} ms/view '
              f'({1.0 / dt:.1f} views/s) on {jax.devices()[0].platform}')

    depth = np.asarray(depth[0], np.float32)
    conf = np.asarray(conf[0], np.float32)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from casmvsnet_pl_tpu.data.base import unnormalize_image

    panels = [(unnormalize_image(np.asarray(sample['imgs'][0])), 'ref image'),
              (visualize_depth(depth), 'predicted depth'),
              (visualize_prob(conf), 'confidence')]
    if 'depths' in sample:
        gt = np.asarray(sample['depths']['level_0'], np.float32)
        mask = np.asarray(sample['masks']['level_0'])
        err2 = ((np.abs(depth - gt) < 2) & mask)
        acc2 = err2.sum() / max(mask.sum(), 1)
        panels.append((visualize_depth(gt), 'GT depth'))
        panels.append((np.stack([err2 * 1.0] * 3, -1), f'acc_2mm={acc2:.4f}'))
        print(f'acc_2mm = {acc2:.4f}')
    fig, axes = plt.subplots(1, len(panels), figsize=(5 * len(panels), 4))
    for ax, (img, title) in zip(np.atleast_1d(axes), panels):
        ax.imshow(np.clip(img, 0, 1))
        ax.set_title(title)
        ax.axis('off')
    fig.savefig(args.out_png, dpi=120, bbox_inches='tight')
    print(f'wrote {args.out_png}')


if __name__ == '__main__':
    main()
