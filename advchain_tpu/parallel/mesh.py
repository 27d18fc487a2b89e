"""Device mesh + sharding helpers (jax.sharding; ICI-native collectives).

The augmentation math is embarrassingly parallel per-sample (SURVEY.md
section 2.3): every transform is batched over dim 0 with per-sample
parameters, so the whole adversarial train step data-parallelises by
sharding the batch dimension across chips.  We express that with a 1-D
``Mesh(('data',))`` and ``NamedSharding`` annotations on the jitted train
step — XLA inserts the (psum) grad reductions over ICI itself; there is no
hand-written collective anywhere (the reference has no distributed layer at
all; this design is green-field TPU-native).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate_to_mesh",
           "initialize_distributed", "shard_process_local_batch"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> int:
    """Multi-host (DCN) entry point: join this process to a JAX
    distributed job so ``jax.devices()`` spans every host's chips and
    ``make_mesh``/pjit programs compile as one SPMD program over the
    global device set (SURVEY.md §2.3/§5.8 — the one multi-host
    obligation; all collectives inside programs still ride ICI, DCN only
    carries the coordination/runtime traffic and per-process input
    feeding).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) and, on managed TPU slices, to
    JAX's own auto-detection (all three None).  Single-process callers
    (num_processes in (None-with-no-env, 1)) skip initialization — the
    function is safe to call unconditionally at program start.  Returns
    the process index (0 for single-process)."""
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes is None:
        return jax.process_index()  # single process (or TPU auto-detect
        # already done by the runtime)
    if num_processes == 1:
        return 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return jax.process_index()


def shard_process_local_batch(local_batch, mesh: Mesh,
                              axis_name: str = "data"):
    """Multi-host batch placement: each process passes the shard of the
    GLOBAL batch it loaded (dim 0 = global_batch / num_processes rows) and
    gets back global jax.Arrays sharded over ``axis_name`` — host data
    loading stays per-process over DCN, device collectives stay on ICI.
    Works unchanged (and equals ``shard_batch``) in single-process runs.

    Spatially-sharded ('data', 'space') meshes keep the volume axes local
    to each data shard, so per-process rows stay whole images; use
    ``parallel.spatial.shard_batch_spatial``-style specs via
    ``make_array_from_process_local_data`` directly if sharding volumes
    across hosts."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_batch)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of batched arrays with dim 0 sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree fully replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
