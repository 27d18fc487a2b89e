"""Data-parallel fused train-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor import (AdvAffine, AdvNoise,
                                    ComposeAdversarialTransformSolver)
from advchain_tpu.models import UNet, SegmentationModel
from advchain_tpu.parallel import (TrainState, make_adversarial_train_step,
                                   make_supervised_train_step, make_mesh,
                                   shard_batch, replicate_to_mesh)

SIZE = [8, 1, 32, 32]


def _setup(seed=0):
    model = SegmentationModel.create(
        UNet(num_classes=4, feature_scale=16), tuple(SIZE),
        rng=jax.random.PRNGKey(seed))
    chain = [
        AdvNoise(config_dict={"epsilon": 0.2, "xi": 1e-6, "data_size": SIZE},
                 seed=seed),
        AdvAffine(config_dict={"rot": 0.1, "scale_x": 0.1, "scale_y": 0.1,
                               "shift_x": 0.1, "shift_y": 0.1,
                               "data_size": SIZE}, seed=seed + 1),
    ]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    r = np.random.RandomState(seed)
    batch = {
        "image": jnp.asarray(r.rand(*SIZE).astype(np.float32)),
        "label": jnp.asarray(r.randint(0, 4, (SIZE[0],) + tuple(SIZE[2:]))),
    }
    return model, solver, batch


def test_fused_adversarial_step_runs_and_learns():
    model, solver, batch = _setup()
    opt = optax.adam(1e-3)
    step = make_adversarial_train_step(model, solver, opt, n_iter=1,
                                       consistency_weight=1.0)
    state = TrainState.create(model, opt)
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses)), losses
    assert int(state.step) == 4
    assert losses[-1] < losses[0], losses  # adam on a fixed batch must drop


def test_fused_adversarial_step_on_8_device_mesh(cpu_devices):
    assert len(cpu_devices) >= 8, "conftest should give 8 virtual devices"
    mesh = make_mesh(8, devices=cpu_devices)
    model, solver, batch = _setup(seed=1)
    opt = optax.adam(1e-3)
    step = make_adversarial_train_step(model, solver, opt, n_iter=1,
                                       mesh=mesh)
    state = replicate_to_mesh(TrainState.create(model, opt), mesh)
    batch = shard_batch(batch, mesh)
    rng = replicate_to_mesh(jax.random.PRNGKey(7), mesh)
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay replicated (XLA psum'd the grads)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_mesh_matches_single_device_supervised(cpu_devices):
    """Sharded supervised step == single-device step (BN-free model path is
    exact up to reduction order)."""
    mesh = make_mesh(8, devices=cpu_devices)
    model, _, batch = _setup(seed=2)
    opt = optax.sgd(1e-2)

    step1 = make_supervised_train_step(model, opt, donate_state=False)
    state1 = TrainState.create(model, opt)
    rng = jax.random.PRNGKey(3)
    state1, m1 = step1(state1, batch, rng)

    step8 = make_supervised_train_step(model, opt, mesh=mesh,
                                       donate_state=False)
    state8 = replicate_to_mesh(TrainState.create(model, opt), mesh)
    state8, m8 = step8(state8, shard_batch(batch, mesh),
                       replicate_to_mesh(rng, mesh))
    # losses agree: the model has BN batch stats per shard, so allow a loose
    # tolerance on the loss but require same scale
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=0.2)


def test_supervised_step_overfits_small_batch():
    model, _, batch = _setup(seed=3)
    opt = optax.adam(3e-3)
    step = make_supervised_train_step(model, opt)
    state = TrainState.create(model, opt)
    rng = jax.random.PRNGKey(0)
    first = None
    for _ in range(15):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert last < 0.85 * first, (first, last)


def test_mesh_matches_single_device_adversarial(cpu_devices):
    """Sharded ADVERSARIAL step == single-device step with identical rng.
    The step is GSPMD (jit + NamedSharding), so BN batch statistics are
    computed globally across shards (XLA inserts the collectives) — the
    semantics promise numerical equivalence up to reduction order, unlike
    per-shard-BN pmap designs."""
    mesh = make_mesh(8, devices=cpu_devices)
    model, solver, batch = _setup(seed=4)
    opt = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(9)

    step1 = make_adversarial_train_step(model, solver, opt, n_iter=1,
                                        donate_state=False)
    state1, m1 = step1(TrainState.create(model, opt), batch, rng)

    model8, solver8, _ = _setup(seed=4)  # fresh solver: separate step cache
    step8 = make_adversarial_train_step(model8, solver8, opt, n_iter=1,
                                        mesh=mesh, donate_state=False)
    state8 = replicate_to_mesh(TrainState.create(model8, opt), mesh)
    state8, m8 = step8(state8, shard_batch(batch, mesh),
                       replicate_to_mesh(rng, mesh))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["consistency_loss"]),
                               float(m8["consistency_loss"]), rtol=1e-3)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
