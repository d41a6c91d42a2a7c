"""Debug: diff gradients between 1-device and 8-device data-parallel step."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from casmvsnet_pl_tpu.data.loader import collate
from casmvsnet_pl_tpu.data.synthetic import PlaneScene
from casmvsnet_pl_tpu.losses import sl1_loss
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.parallel import make_mesh
from casmvsnet_pl_tpu.parallel.mesh import batch_sharding, replicated_sharding

model = CascadeMVSNet(n_depths=(8, 8, 16), interval_ratios=(1., 2., 4.))

scene = PlaneScene(img_wh=(64, 64), n_views=3, z0=460.0, slope_x=0.2)
imgs, proj, depths = scene.model_inputs()
samples = []
for i in range(8):
    rng = np.random.RandomState(i)
    samples.append({
        "imgs": imgs[0] + rng.randn(*imgs[0].shape).astype(np.float32) * 0.01,
        "proj_mats": proj[0],
        "init_depth_min": np.float32(425.0),
        "depth_interval": np.float32(2.65),
        "depths": {k: v[0] for k, v in depths.items()},
        "masks": {k: np.ones(v[0].shape, bool) for k, v in depths.items()},
    })
batch = collate(samples)

variables = model.init(jax.random.PRNGKey(0), batch["imgs"][:1],
                       batch["proj_mats"][:1], 425.0, 2.65)
params, bstats = variables["params"], variables.get("batch_stats", {})


def loss_fn(params, bstats, batch):
    outs, mut = model.apply(
        {"params": params, "batch_stats": bstats},
        batch["imgs"], batch["proj_mats"], batch["init_depth_min"],
        batch["depth_interval"], train=True, mutable=["batch_stats"])
    return sl1_loss(outs, batch["depths"], batch["masks"], 3), mut["batch_stats"]


results = {}
for n_dev in (1, 8):
    mesh = make_mesh(n_dev)
    rep, data = replicated_sharding(mesh), batch_sharding(mesh)
    p = jax.device_put(params, rep)
    b = jax.device_put(bstats, rep)
    db = jax.tree.map(lambda x: jax.device_put(x, data), batch)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                      in_shardings=(rep, rep, data))
    (loss, new_bs), grads = grad_fn(p, b, db)
    results[n_dev] = (float(loss), jax.device_get(grads),
                      jax.device_get(new_bs))
    print(f"n_dev={n_dev} loss={float(loss):.8f}")

g1, g8 = results[1][1], results[8][1]
flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
flat8 = jax.tree.leaves(g8)
worst = []
for (path, a), b in zip(flat1, flat8):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b)
    rel = d.max() / (np.abs(a).max() + 1e-12)
    worst.append((rel, d.max(), np.abs(a).max(), jax.tree_util.keystr(path)))
worst.sort(reverse=True)
for rel, dmax, amax, name in worst[:12]:
    print(f"rel={rel:.2e} absdiff={dmax:.3e} gradmax={amax:.3e} {name}")

bs1, bs8 = results[1][2], results[8][2]
flatb1 = jax.tree_util.tree_flatten_with_path(bs1)[0]
flatb8 = jax.tree.leaves(bs8)
print("--- batch_stats diffs ---")
for (path, a), b in zip(flatb1, flatb8):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b).max()
    if d > 1e-6:
        print(f"diff={d:.3e} {jax.tree_util.keystr(path)}")
