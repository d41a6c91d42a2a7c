"""Measure XLA-TPU gather throughput vs row width; packed-patch variants."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)


def bench(label, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


HW, N = 81920, 32 * 256 * 320          # level-1 scale: 2.6M samples
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, HW, (N,)).astype(np.int32))

for C in (8, 16, 32, 64, 128):
    feat = jnp.asarray(rng.rand(HW, C).astype(np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda fe, ix: jnp.take(fe, ix, axis=0))
    bench(f"take rows C={C} bf16 N=2.6M", f, feat, idx)

# f32 comparison at C=16
feat32 = jnp.asarray(rng.rand(HW, 16).astype(np.float32))
f = jax.jit(lambda fe, ix: jnp.take(fe, ix, axis=0))
bench("take rows C=16 f32", f, feat32, idx)

# one-hot matmul over a 256-wide window (tile-local sim): 2.6M outputs,
# window contraction 256, C=16
TP = 512
tiles = N // TP
win = 256
w = jnp.asarray(rng.rand(tiles, TP, win).astype(np.float32)).astype(jnp.bfloat16)
patches = jnp.asarray(rng.rand(tiles, win, 16).astype(np.float32)).astype(jnp.bfloat16)
f = jax.jit(lambda a, b: jnp.einsum("tpw,twc->tpc", a, b,
                                    preferred_element_type=jnp.float32))
bench("batched onehot matmul (2.6M x 256 x 16)", f, w, patches)

# dynamic_slice-based row-pair extraction, 2.6M slices via vmap
f = jax.jit(lambda fe, ix: jax.vmap(
    lambda i: jax.lax.dynamic_slice_in_dim(fe, i, 1, axis=0))(ix))
bench("vmap dynamic_slice rows C=16", f, feat32, idx)
