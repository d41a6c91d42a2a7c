"""Convert a reference (kwea123/CasMVSNet_pl) PyTorch ``.ckpt`` to this
framework's checkpoint format.

    python scripts/convert_torch_ckpt.py _ckpt_/epoch.15.ckpt out/ref.ckpt

The output loads everywhere a native checkpoint does (train --ckpt_path /
--resume_path weights, eval --ckpt_path, demo --ckpt_path). Numerical
parity of converted weights is pinned by tests/test_torch_parity.py
(depth maps match the reference implementation to <0.05 mm).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from casmvsnet_pl_tpu.utils.checkpoints import save_checkpoint  # noqa: E402
from casmvsnet_pl_tpu.utils.torch_convert import (  # noqa: E402
    convert_torch_checkpoint)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="reference PyTorch .ckpt/.pth file")
    p.add_argument("dst", help="output checkpoint path")
    args = p.parse_args()
    ckpt = convert_torch_checkpoint(args.src)
    save_checkpoint(args.dst, ckpt)
    n = sum(x.size for x in __import__("jax").tree.leaves(ckpt["params"]))
    print(f"wrote {args.dst}: {n / 1e6:.2f}M params")


if __name__ == "__main__":
    main()
