"""Does jnp.take row-gather time depend on row WIDTH? (descriptor-bound?)"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
from casmvsnet_pl_tpu.utils.devtime import device_time

R = 83_000            # L1-like table rows
N = 328_000           # L1-like gathered rows (ng4 x hw82k -> per split)
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, R, size=N).astype(np.int32))
idx_sorted = jnp.asarray(np.sort(rng.randint(0, R, size=N)).astype(np.int32))
for L in (128, 256, 512, 1024):
    table = jnp.asarray(rng.rand(R, L).astype(np.float32)).astype(jnp.bfloat16)
    def take(t, i):
        return jnp.take(t, i, axis=0)
    dt = device_time(take, table, idx, iters=8)
    dts = device_time(take, table, idx_sorted, iters=8)
    print(f"L={L:5d} ({L*2:5d}B rows): rand {dt/N*1e9:6.2f} ns/row "
          f"({N*L*2/dt/1e9:6.1f} GB/s)   sorted {dts/N*1e9:6.2f} ns/row "
          f"({N*L*2/dts/1e9:6.1f} GB/s)", flush=True)
