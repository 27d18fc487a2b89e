"""Multi-host (DCN) entry smoke test: 2 CPU processes join one JAX
distributed job, build a global mesh, place per-process batch shards with
``shard_process_local_batch``, and run one pjit program whose psum spans
both processes (SURVEY.md §2.3/§5.8; VERDICT r4 missing #1).

The workers are real subprocesses (jax.distributed over localhost gRPC);
each brings 2 virtual CPU devices, so the global mesh is 4-wide.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
from advchain_tpu.parallel import (initialize_distributed, make_mesh,
                                   shard_process_local_batch)

pid = initialize_distributed()  # from JAX_* env vars
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_mesh()  # global: spans both processes' devices
# global batch of 8 rows: process p loads rows [4p, 4p+4)
local = {
    "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)[4 * pid: 4 * pid + 4]
}
gbatch = shard_process_local_batch(local, mesh)
assert gbatch["x"].shape == (8, 3), gbatch["x"].shape

from jax.sharding import NamedSharding, PartitionSpec as P
out = jax.jit(lambda b: jax.numpy.sum(b["x"]),
              out_shardings=NamedSharding(mesh, P()))(gbatch)
expected = float(np.arange(8 * 3, dtype=np.float32).sum())
assert abs(float(out) - expected) < 1e-5, (float(out), expected)
print(f"WORKER_OK {pid} {float(out)}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # drop the axon sitecustomize
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "PYTHONUNBUFFERED": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out, out[-3000:]
