"""Forward device time at the DTU evaluation protocol config
(1152x864, 5 views — the reference measures 0.756 s/view there on a
2080Ti, /root/reference/test.ipynb cell 8)."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from casmvsnet_pl_tpu.data.synthetic import PlaneScene
from casmvsnet_pl_tpu.models import CascadeMVSNet
from casmvsnet_pl_tpu.utils.devtime import device_time

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
print("backend:", jax.default_backend(), flush=True)
W, H, V = 1152, 864, 5
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

scene = PlaneScene(img_wh=(W, H), n_views=V, z0=460.0, baseline=12.0,
                   focal=1000.0, slope_x=0.2)
imgs, proj, _ = scene.model_inputs()
imgs, proj = jnp.asarray(imgs), jnp.asarray(proj)

import os
_order = os.environ.get("ER_ORDER", "auto,quad").split(",")
for sampling in _order:
    from casmvsnet_pl_tpu.utils import init_on_cpu
    model = CascadeMVSNet(dtype=dtype, remat=False, sampling=sampling)
    variables = init_on_cpu(model, jax.random.PRNGKey(0),
                            np.asarray(imgs[:, :, :64, :64]),
                            np.asarray(proj), 425.0, 2.65)

    def forward(imgs, proj, model=model, variables=variables):
        out = model.apply(variables, imgs, proj, 425.0, 2.65)
        return out["depth_0"], out["confidence_2"]

    dt = device_time(forward, imgs, proj, iters=int(os.environ.get('ER_ITERS', '8')))
    print(f"eval-res forward {W}x{H} {V} views [{sampling}]: "
          f"{dt * 1e3:.1f} ms/view ({1.0 / dt:.2f} views/s; reference "
          f"2080Ti: 756 ms/view -> {756.0 / (dt * 1e3):.1f}x)", flush=True)
