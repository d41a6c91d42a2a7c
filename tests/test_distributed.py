"""Distributed-bootstrap smoke tests (VERDICT r1 item 7).

The reference's multi-process story is one Lightning config line
(/root/reference/train.py:199, distributed_backend='ddp'); ours is
`initialize_distributed()` + `make_mesh()`. These tests pin the edges:

- `make_mesh` diagnostics when more devices are requested than exist;
- a REAL 2-process `jax.distributed` bring-up over localhost CPU (gloo
  collectives): both processes initialize, see 2 global devices, and a
  psum over the global mesh returns the cross-process sum.
"""
import os
import socket
import subprocess
import sys

import pytest

from casmvsnet_pl_tpu.parallel import make_mesh


def test_make_mesh_too_many_devices_message():
    with pytest.raises(ValueError, match="xla_force_host_platform"):
        make_mesh(n_devices=1024)


def test_make_mesh_model_axis_divisibility():
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(n_devices=3, model_axis=2)


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from casmvsnet_pl_tpu.parallel import initialize_distributed, make_mesh
from casmvsnet_pl_tpu.parallel.mesh import batch_sharding
import jax.numpy as jnp

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
mesh = make_mesh()

# global batch [1, 2] sharded one element per process; the jitted global
# sum compiles to a cross-process reduction over the gloo backend
batch = jax.make_array_from_process_local_data(
    batch_sharding(mesh), jnp.asarray([float(pid) + 1.0]), (2,))
got = float(jax.jit(lambda x: x.sum())(batch))
assert got == 3.0, got
print("WORKER_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_two_process_cpu_bringup(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()

    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": ""}  # no forced device count: 1 CPU dev per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out
