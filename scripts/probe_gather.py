"""Probe: which dynamic-gather forms does Mosaic (TPU Pallas) support?"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)


def try_kernel(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK, out[0,:4]={np.asarray(out).reshape(-1)[:4]}",
              flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


H, W, C = 64, 128, 16
feat = jnp.asarray(np.random.RandomState(0).rand(H * W, 128).astype(np.float32))
idx = jnp.asarray(np.random.RandomState(1).randint(0, H * W, (256,)).astype(np.int32))


# 1. jnp.take along sublane axis (row gather from 2D)
def k_take(feat_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(feat_ref[:], idx_ref[:], axis=0)

try_kernel("take(rows from (HW,128))", k_take,
           jax.ShapeDtypeStruct((256, 128), jnp.float32), feat, idx)


# 2. take_along_axis on sublanes
def k_tala(feat_ref, idx_ref, out_ref):
    ids = idx_ref[:].reshape(256, 1)
    out_ref[:] = jnp.take_along_axis(
        feat_ref[:], jnp.broadcast_to(ids, (256, 128)), axis=0)

try_kernel("take_along_axis(sublane)", k_tala,
           jax.ShapeDtypeStruct((256, 128), jnp.float32), feat, idx)


# 3. take along lane axis (in-row gather)
featT = jnp.asarray(np.random.RandomState(0).rand(8, 1024).astype(np.float32))
idx_lane = jnp.asarray(np.random.RandomState(1).randint(0, 1024, (128,)).astype(np.int32))


def k_take_lane(feat_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(feat_ref[:], idx_ref[:], axis=1)

try_kernel("take(lanes from (8,1024))", k_take_lane,
           jax.ShapeDtypeStruct((8, 128), jnp.float32), featT, idx_lane)


# 4. per-element 2D advanced indexing
def k_adv(feat_ref, idx_ref, out_ref):
    out_ref[:] = feat_ref[idx_ref[:], :]

try_kernel("ref[vector_idx, :]", k_adv,
           jax.ShapeDtypeStruct((256, 128), jnp.float32), feat, idx)


# 5. one-hot matmul gather (guaranteed path)
def k_onehot(feat_ref, idx_ref, out_ref):
    ids = idx_ref[:].reshape(256, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (256, H * W), 1)
    onehot = (rows == ids).astype(jnp.float32)
    out_ref[:] = jnp.dot(onehot, feat_ref[:],
                         preferred_element_type=jnp.float32)

try_kernel("onehot-matmul", k_onehot,
           jax.ShapeDtypeStruct((256, 128), jnp.float32), feat, idx)


# 6. dynamic_slice in fori_loop (scalar row gather)
def k_dynslice(feat_ref, idx_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = feat_ref[pl.ds(idx_ref[i], 1), :]
        return 0
    jax.lax.fori_loop(0, 256, body, 0)

try_kernel("fori dynamic_slice rows", k_dynslice,
           jax.ShapeDtypeStruct((256, 128), jnp.float32), feat, idx)
