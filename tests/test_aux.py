"""Aux subsystem tests: profiling timers, checkify wrapper, checkpointing."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor import AdvNoise, ComposeAdversarialTransformSolver
from advchain_tpu.models import UNet, SegmentationModel
from advchain_tpu.parallel import TrainState
from advchain_tpu.utils import (Timer, benchmark, checked, save_checkpoint,
                                restore_checkpoint, save_transform_state,
                                restore_transform_state)


def test_timer_and_benchmark():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    with Timer() as t:
        t.sync(f(x))
    assert t.ms is not None and t.ms >= 0
    stats = benchmark(f, x, reps=3)
    assert stats["min_ms"] <= stats["mean_ms"] + 1e-9
    assert stats["reps"] == 3


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    safe = checked(bad)
    out = safe(jnp.ones(3))
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(Exception):
        safe(jnp.full(3, -1.0))


def test_train_state_checkpoint_roundtrip(tmp_path):
    model = SegmentationModel.create(UNet(num_classes=2, feature_scale=16),
                                     (1, 1, 16, 16))
    opt = optax.adam(1e-3)
    state = TrainState.create(model, opt)
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state)
    restored = restore_checkpoint(p, target=state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transform_state_checkpoint_roundtrip(tmp_path):
    size = [2, 1, 16, 16]
    solver = ComposeAdversarialTransformSolver(
        [AdvNoise(config_dict={"epsilon": 0.1, "xi": 1e-6,
                               "data_size": size}, seed=0)])
    solver.init_random_transformation()
    p0 = np.asarray(solver.chain_of_transforms[0].param)
    path = str(tmp_path / "tr")
    save_transform_state(path, solver)
    solver.init_random_transformation()  # scramble
    assert not np.allclose(np.asarray(solver.chain_of_transforms[0].param),
                           p0)
    restore_transform_state(path, solver)
    np.testing.assert_array_equal(
        np.asarray(solver.chain_of_transforms[0].param), p0)
