"""Training CLI flags.

Flag parity with /root/reference/opt.py:3-75, plus TPU-native extras
(``--precision``, ``--num_devices``). ``--num_gpus`` is kept as an alias of
``--num_devices`` for drop-in compatibility.
"""
from __future__ import annotations

import argparse
import os


def sampling_choices():
    """CLI-reachable sampling modes: exact modes only.

    ``window`` sampling is a bounded approximation (it clamps bilinear
    supports that exceed the packed strip, ops/plane_sweep.py) and loses
    on v5e anyway, so it is not offered as a normal choice — no user
    config should silently degrade accuracy. It remains reachable
    deliberately via ``CASMVS_ENABLE_WINDOW_SAMPLING=1`` for debugging
    or for hardware with a different gather/VPU cost ratio.
    """
    choices = ['auto', 'quad', 'patch']
    if os.environ.get('CASMVS_ENABLE_WINDOW_SAMPLING') == '1':
        choices.append('window')
    return choices


def get_opts(argv=None):
    parser = argparse.ArgumentParser()

    parser.add_argument('--root_dir', type=str,
                        default='/data/mvs_training/dtu/',
                        help='root directory of the dataset')
    parser.add_argument('--dataset_name', type=str, default='dtu',
                        choices=['dtu', 'blendedmvs'],
                        help='which dataset to train/val')
    parser.add_argument('--n_views', type=int, default=3,
                        help='number of views (including ref) used in training')
    parser.add_argument('--levels', type=int, default=3, choices=[3],
                        help='number of FPN levels (fixed to 3)')
    parser.add_argument('--depth_interval', type=float, default=2.65,
                        help='depth interval for the finest level, unit in mm')
    parser.add_argument('--n_depths', nargs='+', type=int, default=[8, 32, 48],
                        help='number of depths in each level (fine->coarse)')
    parser.add_argument('--interval_ratios', nargs='+', type=float,
                        default=[1.0, 2.0, 4.0],
                        help='depth interval ratio per level (fine->coarse)')
    parser.add_argument('--num_groups', type=int, default=1,
                        choices=[1, 2, 4, 8],
                        help='groups in groupwise correlation (divisor of 8)')
    parser.add_argument('--loss_type', type=str, default='sl1',
                        choices=['sl1'], help='loss to use')

    parser.add_argument('--batch_size', type=int, default=1)
    parser.add_argument('--num_epochs', type=int, default=16)
    parser.add_argument('--num_devices', '--num_gpus', type=int, default=0,
                        dest='num_devices',
                        help='number of TPU chips for data parallelism '
                             '(0 = all visible devices)')

    parser.add_argument('--ckpt_path', type=str, default='',
                        help='pretrained checkpoint path to load')
    parser.add_argument('--resume_path', type=str, default='',
                        help='checkpoint to FULLY resume from (params + '
                             'batch stats + optimizer state + step); the '
                             'reference can only warm-start weights')
    parser.add_argument('--prefixes_to_ignore', nargs='+', type=str,
                        default=['loss'],
                        help='prefixes to ignore in the checkpoint')

    parser.add_argument('--optimizer', type=str, default='sgd',
                        choices=['sgd', 'adam', 'radam', 'ranger'])
    parser.add_argument('--lr', type=float, default=1e-3)
    parser.add_argument('--momentum', type=float, default=0.9)
    parser.add_argument('--weight_decay', type=float, default=1e-5)
    parser.add_argument('--lr_scheduler', type=str, default='steplr',
                        choices=['steplr', 'cosine', 'poly'])
    parser.add_argument('--warmup_multiplier', type=float, default=1.0)
    parser.add_argument('--warmup_epochs', type=int, default=0)
    parser.add_argument('--decay_step', nargs='+', type=int, default=[20])
    parser.add_argument('--decay_gamma', type=float, default=0.1)
    parser.add_argument('--poly_exp', type=float, default=0.9)

    parser.add_argument('--precision', type=str, default='bf16',
                        choices=['bf16', 'f32'],
                        help='compute precision (bf16 is the TPU native path; '
                             'parameters and depth math stay f32)')
    parser.add_argument('--use_amp', default=False, action='store_true',
                        help='alias of --precision bf16 (kept for '
                             'compatibility; bf16 actually works here)')
    parser.add_argument('--remat', default=False, action='store_true',
                        help='rematerialize the plane-sweep warp in the '
                             'backward pass (trade ~14%% step time for '
                             'lower peak memory; the TPU analog of the '
                             "reference's InPlace-ABN memory trick)")
    parser.add_argument('--sampling', type=str, default='auto',
                        choices=sampling_choices(),
                        help='plane-sweep sampling strategy (see '
                             'ops/plane_sweep.py; auto=patch-shared gathers '
                             'at every cascade level, with aligned-block '
                             'tables as the unfit-geometry / past-the-cliff '
                             'fallback). All listed modes are exact; the '
                             'approximate "window" mode is a debug escape '
                             'hatch reachable only with '
                             'CASMVS_ENABLE_WINDOW_SAMPLING=1.')
    parser.add_argument('--num_workers', type=int, default=4)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--exp_name', type=str, default='exp')

    return parser.parse_args(argv)
