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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate_to_mesh"]


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
