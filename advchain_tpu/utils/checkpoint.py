"""Checkpoint / resume (SURVEY.md section 5.4).

The reference checkpoints only model state dicts (torch .pth); here the full
training state (params, batch stats, optimizer state, step) AND the
transform-chain parameters are pytrees saved with orbax (the standard JAX
checkpointer), giving training-loop resume the reference never had.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint",
           "save_transform_state", "restore_transform_state"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state) -> str:
    """Save a pytree (e.g. parallel.TrainState) to ``path``."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, target=None):
    """Restore a pytree; ``target`` (same structure) restores concrete
    types/dtypes exactly (pass e.g. a freshly-created TrainState)."""
    path = os.path.abspath(path)
    if target is not None:
        import orbax.checkpoint as ocp
        return _checkpointer().restore(
            path, item=jax.device_get(target))
    return _checkpointer().restore(path)


def save_transform_state(path: str, solver) -> str:
    """Persist a solver's transform-chain parameters (the augmentation-state
    save/restore surface: reference set_parameters/get_parameters,
    adv_transformation_base.py:53-57)."""
    params = {f"{i}_{t.get_name()}": t.get_parameters()
              for i, t in enumerate(solver.chain_of_transforms)}
    return save_checkpoint(path, params)


def restore_transform_state(path: str, solver) -> None:
    params = restore_checkpoint(path)
    for i, t in enumerate(solver.chain_of_transforms):
        key = f"{i}_{t.get_name()}"
        if key in params and params[key] is not None:
            t.set_parameters(params[key])
