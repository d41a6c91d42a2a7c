"""Convert reference PyTorch checkpoints to this framework's parameters.

The reference (kwea123/CasMVSNet_pl) publishes PyTorch-Lightning ``.ckpt``
files whose ``state_dict`` holds ``model.``-prefixed CascadeMVSNet weights
(/root/reference/train.py:29-41, /root/reference/utils/__init__.py:52-80).
This module maps that state dict onto the flax parameter / batch-stats
pytree of :class:`casmvsnet_pl_tpu.models.CascadeMVSNet`, converting
layouts:

  - Conv2d ``(O, I, kh, kw)``        -> HWIO ``(kh, kw, I, O)``
  - Conv3d ``(O, I, kd, kh, kw)``    -> DHWIO ``(kd, kh, kw, I, O)``
  - ConvTranspose3d ``(I, O, k...)`` -> spatially flipped DHWIO (our
    decoder runs lhs-dilated *forward* convs, see
    models/blocks.py::ConvTransposeBnAct3D and
    tests/test_model.py::test_conv_transpose_matches_torch)
  - InPlaceABN ``weight/bias/running_mean/running_var``
                                     -> BN ``scale/bias`` + ``mean/var``

Name map (reference -> here):

  feature.convA.B.*          -> feature/convA_B/*
  feature.{toplayer,lat*,smooth*}.{weight,bias}
                             -> feature/<same>/{kernel,bias}
  cost_reg_L.convK.*         -> cost_reg_L/convK/*
  cost_reg_L.conv{7,9,11}.0.weight -> cost_reg_L/deconv{7,9,11}/kernel
  cost_reg_L.conv{7,9,11}.1.*      -> cost_reg_L/deconv{7,9,11}/bn/*
  cost_reg_L.prob.{weight,bias}    -> cost_reg_L/prob/{kernel,bias}

Unknown keys are returned (not raised) so Lightning extras (``loss.*``,
``num_batches_tracked``) are skipped exactly like the reference's
``prefixes_to_ignore`` mechanism.
"""
from __future__ import annotations

import re

import numpy as np
from flax import traverse_util


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose3d weight (I, O, kd, kh, kw); our decoder applies a
    # FORWARD conv on the dilated input, which equals the transposed conv
    # with the spatially flipped kernel.
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1])


_BN_MAP = {"weight": "scale", "bias": "bias",
           "running_mean": "mean", "running_var": "var"}


def convert_state_dict(state_dict) -> tuple[dict, dict, list[str]]:
    """Reference torch ``state_dict`` -> ``(params, batch_stats, skipped)``.

    Accepts tensors or numpy arrays; a Lightning ``model.`` prefix is
    stripped. ``skipped`` lists keys that did not match any known pattern.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model."):]
        sd[k] = np.asarray(getattr(v, "detach", lambda: v)().cpu()
                           if hasattr(v, "detach") else v)

    params: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}
    skipped: list[str] = []

    plain2d = {"toplayer", "lat0", "lat1", "smooth0", "smooth1"}

    for key, val in sd.items():
        parts = key.split(".")
        if key.endswith("num_batches_tracked"):
            continue
        # feature.convA.B.{conv.weight | bn.*}
        m = re.fullmatch(r"feature\.conv(\d)\.(\d)\.(conv|bn)\.(\w+)", key)
        if m:
            a, b, sub, leaf = m.groups()
            base = f"feature/conv{a}_{b}"
            if sub == "conv" and leaf == "weight":
                params[f"{base}/conv/kernel"] = _conv2d(val)
            elif sub == "bn" and leaf in _BN_MAP:
                tgt = _BN_MAP[leaf]
                (params if leaf in ("weight", "bias") else stats)[
                    f"{base}/bn/{tgt}"] = val
            else:
                skipped.append(key)
            continue
        # feature.{toplayer,lat*,smooth*}.{weight,bias}
        if (len(parts) == 3 and parts[0] == "feature"
                and parts[1] in plain2d):
            base = f"feature/{parts[1]}"
            if parts[2] == "weight":
                params[f"{base}/kernel"] = _conv2d(val)
            elif parts[2] == "bias":
                params[f"{base}/bias"] = val
            else:
                skipped.append(key)
            continue
        # cost_reg_L....
        m = re.fullmatch(r"cost_reg_(\d)\.(.+)", key)
        if m:
            lvl, rest = m.groups()
            base = f"cost_reg_{lvl}"
            m2 = re.fullmatch(r"conv(\d)\.(conv|bn)\.(\w+)", rest)
            if m2:
                k_, sub, leaf = m2.groups()
                if sub == "conv" and leaf == "weight":
                    params[f"{base}/conv{k_}/conv/kernel"] = _conv3d(val)
                elif sub == "bn" and leaf in _BN_MAP:
                    tgt = _BN_MAP[leaf]
                    (params if leaf in ("weight", "bias") else stats)[
                        f"{base}/conv{k_}/bn/{tgt}"] = val
                else:
                    skipped.append(key)
                continue
            m2 = re.fullmatch(r"conv(7|9|11)\.(0|1)\.(\w+)", rest)
            if m2:
                k_, idx, leaf = m2.groups()
                dbase = f"{base}/deconv{k_}"
                if idx == "0" and leaf == "weight":
                    params[f"{dbase}/kernel"] = _deconv3d(val)
                elif idx == "1" and leaf in _BN_MAP:
                    tgt = _BN_MAP[leaf]
                    (params if leaf in ("weight", "bias") else stats)[
                        f"{dbase}/bn/{tgt}"] = val
                else:
                    skipped.append(key)
                continue
            if rest == "prob.weight":
                params[f"{base}/prob/kernel"] = _conv3d(val)
                continue
            if rest == "prob.bias":
                params[f"{base}/prob/bias"] = val
                continue
            skipped.append(key)
            continue
        skipped.append(key)

    return (traverse_util.unflatten_dict(params, sep="/"),
            traverse_util.unflatten_dict(stats, sep="/"),
            skipped)


def convert_torch_checkpoint(ckpt_path: str) -> dict:
    """Load a reference ``.ckpt``/``.pth`` file and return a checkpoint dict
    in this framework's format: ``{"params", "batch_stats"}``.

    Requires torch (CPU is fine). Skipped keys (e.g. ``loss.*``) are
    reported on stdout, mirroring the reference's partial-load behavior.
    """
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob)
    params, stats, skipped = convert_state_dict(state_dict)
    if skipped:
        print(f"convert: skipped {len(skipped)} non-model keys: "
              f"{sorted(skipped)[:8]}{'...' if len(skipped) > 8 else ''}")
    return {"params": params, "batch_stats": stats}
