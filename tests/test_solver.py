"""Tests for ComposeAdversarialTransformSolver: PGD ascent, geometric mask
roundtrips, pseudo-label generation, fallbacks, NaN guard.

The "segmentation model" is a frozen two-layer conv net (pure closure) —
the JAX equivalent of the reference's fixed-network inner-loop contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advchain_tpu import ops
from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph, AdvNoise,
                                    ComposeAdversarialTransformSolver)

SIZE = [2, 1, 32, 32]


def make_model(seed=0, num_classes=4):
    r = np.random.RandomState(seed)
    w1 = jnp.asarray(r.randn(8, 1, 3, 3).astype(np.float32) * 0.5)
    w2 = jnp.asarray(r.randn(num_classes, 8, 3, 3).astype(np.float32) * 0.5)

    def model(x):
        h = jnp.tanh(ops.conv_same(x, w1))
        return ops.conv_same(h, w2)

    return model


def make_data(seed=1):
    r = np.random.RandomState(seed)
    ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    img = np.exp(-(((ii - 16) / 7.0) ** 2 + ((jj - 16) / 6.0) ** 2))
    x = np.stack([img, img.T])[:, None].astype(np.float32)
    return jnp.asarray(x + 0.05 * r.rand(*SIZE).astype(np.float32))


def full_chain(seed=0):
    return [
        AdvNoise(config_dict={"epsilon": 0.1, "xi": 1e-6, "data_size": SIZE},
                 seed=seed),
        AdvBias(config_dict={"epsilon": 0.3, "control_point_spacing": [16, 16],
                             "downscale": 2, "data_size": SIZE,
                             "interpolation_order": 3, "init_mode": "random",
                             "space": "log"}, seed=seed + 1),
        AdvAffine(config_dict={"rot": 0.1, "scale_x": 0.1, "scale_y": 0.1,
                               "shift_x": 0.1, "shift_y": 0.1,
                               "data_size": SIZE}, seed=seed + 2),
        AdvMorph(config_dict={"epsilon": 1.0, "data_size": SIZE,
                              "vector_size": [8, 8]}, seed=seed + 3),
    ]


def test_adversarial_training_returns_finite_loss_and_stashes():
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=full_chain(),
        divergence_types=["mse", "contour"], divergence_weights=[1.0, 0.5])
    model = make_model()
    data = make_data()
    dist = solver.adversarial_training(data=data, model=model, n_iter=1)
    assert np.isfinite(float(dist))
    assert solver.adv_data.shape == tuple(SIZE)
    assert solver.init_output.shape == (2, 4, 32, 32)
    assert solver.warped_back_adv_output.shape == (2, 4, 32, 32)


def test_pgd_increases_divergence_photometric():
    """PGD ascent on a frozen net increases the consistency loss
    (SURVEY.md section 4 implied invariant)."""
    chain = [AdvNoise(config_dict={"epsilon": 0.5, "xi": 1e-6,
                                   "data_size": SIZE}, seed=4)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = make_model()
    data = make_data()
    init_output = solver.get_init_output(model, data)
    solver.init_random_transformation()
    d0 = float(solver.calc_adv_consistency_loss(data, model, init_output)[0])
    solver.optimizing_transform(model=model, data=data,
                                init_output=init_output,
                                optimize_flags=[True], n_iter=3,
                                step_sizes=[1.0])
    d1 = float(solver.calc_adv_consistency_loss(data, model, init_output)[0])
    assert d1 > d0, (d0, d1)


def test_pgd_increases_divergence_geometric():
    chain = [AdvAffine(config_dict={"rot": 0.15, "scale_x": 0.1,
                                    "scale_y": 0.1, "shift_x": 0.1,
                                    "shift_y": 0.1, "data_size": SIZE},
                       seed=5)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = make_model()
    data = make_data()
    init_output = solver.get_init_output(model, data)
    solver.init_random_transformation()
    d0 = float(solver.calc_adv_consistency_loss(data, model, init_output)[0])
    solver.optimizing_transform(model=model, data=data,
                                init_output=init_output,
                                optimize_flags=[True], n_iter=3,
                                step_sizes=[0.1])
    d1 = float(solver.calc_adv_consistency_loss(data, model, init_output)[0])
    assert d1 > d0, (d0, d1)


def test_get_adv_data_photometric_labels_unchanged():
    chain = [AdvNoise(config_dict={"epsilon": 0.2, "xi": 1e-6,
                                   "data_size": SIZE}, seed=6)]
    solver = ComposeAdversarialTransformSolver(chain_of_transforms=chain)
    model = make_model()
    data = make_data()
    aug, lab = solver.get_adv_data(data, model, n_iter=0)
    init_output = solver.get_init_output(model, data)
    # photometric transforms leave predictions untouched
    np.testing.assert_allclose(np.asarray(lab), np.asarray(init_output),
                               atol=1e-6)
    assert not np.allclose(np.asarray(aug), np.asarray(data))


def test_get_adv_data_geometric_labels_warped():
    chain = [AdvAffine(config_dict={"rot": 0.2, "scale_x": 0.1,
                                    "scale_y": 0.1, "shift_x": 0.2,
                                    "shift_y": 0.2, "data_size": SIZE},
                       seed=7)]
    solver = ComposeAdversarialTransformSolver(chain_of_transforms=chain)
    model = make_model()
    data = make_data()
    aug, lab = solver.get_adv_data(data, model, n_iter=1)
    init_output = solver.get_init_output(model, data)
    assert not np.allclose(np.asarray(lab), np.asarray(init_output))


def test_smart_power_iteration_flags():
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=full_chain())
    solver._apply_power_iteration_setting("smart")
    flags = [t.power_iteration for t in solver.chain_of_transforms]
    assert flags == [True, False, False, False]


def test_set_transformation_roundtrip():
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=full_chain())
    solver.init_random_transformation()
    params = solver.get_transformation_parameters()
    solver.init_random_transformation()
    solver.set_transformation(params)
    for p, t in zip(params, solver.chain_of_transforms):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(t.param))


def test_forward_backward_norm_image():
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=full_chain(), if_norm_image=True,
        min_intensity=0.0, max_intensity=1.0)
    solver.init_random_transformation()
    out = solver.forward(make_data())
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_nan_guard_keeps_params():
    """A model emitting NaN must not poison the transform parameters
    (reference adv_compose_solver.py:345-346)."""
    chain = [AdvNoise(config_dict={"epsilon": 0.2, "xi": 1e-6,
                                   "data_size": SIZE}, seed=8)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])

    def nan_model(x):
        return jnp.full((x.shape[0], 4) + x.shape[2:], jnp.nan)

    data = make_data()
    solver.init_random_transformation()
    p0 = np.asarray(solver.chain_of_transforms[0].param)
    init_output = nan_model(data)
    solver.optimizing_transform(model=nan_model, data=data,
                                init_output=init_output,
                                optimize_flags=[True], n_iter=1,
                                step_sizes=[1.0])
    p1 = np.asarray(solver.chain_of_transforms[0].param)
    assert np.isfinite(p1).all()
    # update skipped; only the final projection's float wobble remains
    np.testing.assert_allclose(p0, p1, atol=1e-6)


def test_anatomy_constrained_search_terminates():
    chain = [AdvAffine(config_dict={"rot": 0.02, "scale_x": 0.02,
                                    "scale_y": 0.02, "shift_x": 0.02,
                                    "shift_y": 0.02, "data_size": SIZE},
                       seed=9)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = make_model()
    data = make_data()
    mask = np.zeros(SIZE, np.float32)
    mask[:, :, 12:20, 12:20] = 1.0
    dist = solver.adversarial_training(
        data=data, model=model, n_iter=1,
        anatomy_mask_images=jnp.asarray(mask), anatomy_reg_weight=50,
        volume_preserve_tolerance=5e-4)
    assert np.isfinite(float(dist))


def test_anatomy_failed_volume_check_enters_retry_ladder(caplog):
    """When the fused first attempt fails the volume check, the graduated
    retry ladder (reference adv_compose_solver.py:376-401) must take over
    and terminate — at worst falling back to a random re-init at 3x
    n_iter with the reference's warning."""
    import logging
    chain = [AdvAffine(config_dict={"rot": 0.45, "scale_x": 0.4,
                                    "scale_y": 0.4, "shift_x": 0.4,
                                    "shift_y": 0.4, "data_size": SIZE},
                       seed=11)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = make_model()
    data = make_data()
    mask = np.zeros(SIZE, np.float32)
    mask[:, :, 4:28, 4:28] = 1.0
    with caplog.at_level(logging.WARNING):
        dist = solver.adversarial_training(
            data=data, model=model, n_iter=1,
            anatomy_mask_images=jnp.asarray(mask), anatomy_reg_weight=50,
            volume_preserve_tolerance=1e-9)  # unachievably tight
    assert np.isfinite(float(dist))
    # the impossible tolerance must exhaust the ladder into the random
    # fallback (reference :382-394)
    assert any("3X longer" in r.message for r in caplog.records), \
        [r.message for r in caplog.records]


def test_anatomy_fused_attempt_preserves_volume():
    """Common case: the fused first attempt's returned transforms satisfy
    the volume-preserve tolerance (bench config #3 semantics)."""
    chain = [AdvAffine(config_dict={"rot": 0.02, "scale_x": 0.02,
                                    "scale_y": 0.02, "shift_x": 0.02,
                                    "shift_y": 0.02, "data_size": SIZE},
                       seed=12)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = make_model()
    data = make_data()
    mask = np.zeros(SIZE, np.float32)
    mask[:, :, 12:20, 12:20] = 1.0
    mask = jnp.asarray(mask)
    tol = 5e-3
    dist = solver.adversarial_training(
        data=data, model=model, n_iter=2, anatomy_mask_images=mask,
        anatomy_reg_weight=50, volume_preserve_tolerance=tol)
    assert np.isfinite(float(dist))
    mis = float(solver.compute_anatomy_misoverlapping_loss(mask))
    assert mis <= tol, mis


def test_step_cache_reused():
    chain = [AdvNoise(config_dict={"epsilon": 0.2, "xi": 1e-6,
                                   "data_size": SIZE}, seed=10)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = make_model()
    data = make_data()
    solver.adversarial_training(data=data, model=model, n_iter=1)
    n_programs = len(solver._step_cache)
    for _ in range(2):
        solver.adversarial_training(data=data, model=model, n_iter=1)
    # repeated identical calls must not build new programs
    assert len(solver._step_cache) == n_programs


def test_episode_follows_model_weight_updates():
    """Updating SegmentationModel.params between adversarial_training calls
    must affect the cached episode program (weights are traced args, not
    baked constants)."""
    from advchain_tpu.models import UNet, SegmentationModel
    size = [2, 1, 32, 32]
    m = SegmentationModel.create(UNet(num_classes=4, feature_scale=16),
                                 tuple(size))
    chain = [AdvNoise(config_dict={"epsilon": 0.3, "xi": 1e-6,
                                   "data_size": size}, seed=20)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    data = make_data()
    d1 = float(solver.adversarial_training(data=data, model=m, n_iter=1))
    out1 = np.asarray(solver.init_output)
    # scale every weight: the reference predictions must change
    m.params = jax.tree_util.tree_map(lambda a: a * 1.5, m.params)
    d2 = float(solver.adversarial_training(data=data, model=m, n_iter=1))
    out2 = np.asarray(solver.init_output)
    assert not np.allclose(out1, out2), "episode used stale baked weights"
    # and the executable was reused (no new cache entries)
    n_entries = len(solver._step_cache)
    m.params = jax.tree_util.tree_map(lambda a: a * 0.9, m.params)
    solver.adversarial_training(data=data, model=m, n_iter=1)
    assert len(solver._step_cache) == n_entries


def test_lazy_load_partial_init_keeps_existing_params():
    """lazy_load must keep caller-provided params and init only missing ones
    (reference adv_compose_solver.py:487-492)."""
    size = [2, 1, 32, 32]
    t1 = AdvNoise(config_dict={"epsilon": 0.3, "xi": 1e-6,
                               "data_size": size}, seed=21)
    t2 = AdvAffine(config_dict={"rot": 0.1, "scale_x": 0.1, "scale_y": 0.1,
                                "shift_x": 0.1, "shift_y": 0.1,
                                "data_size": size}, seed=22)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=[t1, t2], divergence_types=["mse"],
        divergence_weights=[1.0])
    fixed = jnp.ones(tuple(size)) * 0.01
    t1.set_parameters(fixed)
    assert t2.param is None
    model = make_model()
    solver.adversarial_training(data=make_data(), model=model, n_iter=0,
                                lazy_load=True)
    np.testing.assert_allclose(np.asarray(t1.param), np.asarray(fixed),
                               atol=1e-7)
    assert t2.param is not None


def test_reference_manual_loop_recipe():
    """The reference's self-sufficient stateful loop (README.md:177-214):
    init -> forward -> 'dist.backward()' -> optimize_parameters() with NO
    gradient argument.  compute_transform_grads stashes transform.grad
    (reference autograd on .param, adv_noise.py:51-64)."""
    chain = full_chain(seed=11)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = make_model()
    data = make_data()
    solver.init_random_transformation()
    init_output = solver.get_init_output(data=data, model=model)
    before = [np.asarray(t.param) for t in chain]

    dist0, grads = solver.compute_transform_grads(data, model,
                                                  init_output=init_output)
    assert np.isfinite(float(dist0))
    for t, g in zip(chain, grads):
        assert g is not None and g.shape == t.param.shape
        assert np.asarray(t.grad is g) or np.array_equal(
            np.asarray(t.grad), np.asarray(g))
        t.optimize_parameters(step_size=1.0)  # no grad argument: reference
        t.rescale_parameters()
        t.eval()
    after = [np.asarray(t.param) for t in chain]
    assert all(not np.allclose(b, a) for b, a in zip(before, after))

    # ascent: the updated chain yields a larger divergence
    dist1, _ = solver.compute_transform_grads(data, model,
                                              init_output=init_output)
    assert float(dist1) > float(dist0), (float(dist0), float(dist1))


def test_optimize_parameters_without_grad_raises_when_unstashed():
    t = AdvNoise(config_dict={"epsilon": 0.1, "xi": 1e-6, "data_size": SIZE})
    t.init_parameters()
    with pytest.raises(ValueError):
        t.optimize_parameters(step_size=1.0)


def test_transform_grads_follow_model_weight_updates():
    """compute_transform_grads must see CURRENT model weights: the manual
    training loop (README.md:177-214) trains the model between calls, so a
    cached program with baked weights silently returns stale gradients."""
    from advchain_tpu.models import UNet, SegmentationModel
    size = [2, 1, 32, 32]
    m = SegmentationModel.create(UNet(num_classes=4, feature_scale=16),
                                 tuple(size))
    chain = [AdvNoise(config_dict={"epsilon": 0.3, "xi": 1e-6,
                                   "data_size": size}, seed=30)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    data = make_data()
    solver.init_random_transformation()
    d1, (g1,) = solver.compute_transform_grads(data, m)
    # train the model (scale weights): the SAME cached program must now
    # compute gradients w.r.t. the new weights
    m.params = jax.tree_util.tree_map(lambda a: a * 5.0, m.params)
    n_entries = len(solver._step_cache)
    d2, (g2,) = solver.compute_transform_grads(data, m)
    assert len(solver._step_cache) == n_entries, "unexpected retrace"
    assert not np.allclose(np.asarray(g1), np.asarray(g2)), (
        "cached grads program used stale baked weights")
    # cross-check against a fresh trace (fresh solver, same state)
    solver2 = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    d2f, (g2f,) = solver2.compute_transform_grads(data, m)
    np.testing.assert_allclose(float(d2), float(d2f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2f), atol=1e-6)


def test_final_loss_fn_follows_model_weight_updates():
    """_get_final_loss_fn threads model variables as traced args (same
    stale-weights hazard as compute_transform_grads)."""
    from advchain_tpu.models import UNet, SegmentationModel
    size = [2, 1, 32, 32]
    m = SegmentationModel.create(UNet(num_classes=4, feature_scale=16),
                                 tuple(size))
    chain = [AdvNoise(config_dict={"epsilon": 0.3, "xi": 1e-6,
                                   "data_size": size}, seed=31)]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    data = make_data()
    solver.init_random_transformation()
    params = tuple(t.param for t in chain)
    init_output = solver.get_init_output(m, data)
    fn = solver._get_final_loss_fn(m, data.shape)
    _, _, out1, _ = fn(params, data, init_output)
    m.params = jax.tree_util.tree_map(lambda a: a * 5.0, m.params)
    fn2 = solver._get_final_loss_fn(m, data.shape)
    _, _, out2, _ = fn2(params, data, init_output)
    assert not np.allclose(np.asarray(out1), np.asarray(out2)), (
        "final-loss program used stale baked weights")


def test_instance_level_get_net_output_override_detected(caplog):
    """solver.get_net_output = fn (the torch idiom for multi-branch nets,
    reference README.md:287-288) must route through the hook, and the
    stale-cache warning must fire exactly once."""
    import logging
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=[AdvNoise(
            config_dict={"epsilon": 0.3, "xi": 1e-6, "data_size": SIZE},
            seed=32)],
        divergence_types=["mse"], divergence_weights=[1.0])
    model = make_model()
    calls = {"n": 0}

    def hook(m, x):
        calls["n"] += 1
        return m(x) + 7.0

    solver.get_net_output = hook
    data = make_data()
    with caplog.at_level(logging.WARNING,
                         logger="advchain_tpu.augmentor.compose"):
        d1 = solver.adversarial_training(data=data, model=model, n_iter=1)
        warn_count = sum("clear_cache" in r.message for r in caplog.records)
        assert warn_count == 1, caplog.records
        solver.adversarial_training(data=data, model=model, n_iter=1)
        warn_count = sum("clear_cache" in r.message for r in caplog.records)
        assert warn_count == 1, "warning must fire only once"
    assert calls["n"] > 0, "instance-level hook was bypassed"
    assert np.isfinite(float(d1))
    # the hook's +7 shifts predictions: init_output must reflect it
    direct = model(data)
    assert np.allclose(np.asarray(solver.init_output),
                       np.asarray(direct) + 7.0, atol=1e-5)


def test_lazy_load_fast_path_is_fully_fused():
    """The lazy_load fast path must not dispatch eager per-transform inits:
    missing params are drawn INSIDE the episode program
    (VERDICT round-2 item 10)."""
    size = [2, 1, 32, 32]
    t1 = AdvNoise(config_dict={"epsilon": 0.3, "xi": 1e-6,
                               "data_size": size}, seed=33)
    t2 = AdvAffine(config_dict={"rot": 0.1, "scale_x": 0.1, "scale_y": 0.1,
                                "shift_x": 0.1, "shift_y": 0.1,
                                "data_size": size}, seed=34)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=[t1, t2], divergence_types=["mse"],
        divergence_weights=[1.0])
    fixed = jnp.ones(tuple(size)) * 0.01
    t1.set_parameters(fixed)

    def boom(*a, **k):
        raise AssertionError("eager init_parameters on the lazy fast path")

    t1.init_parameters = boom
    t2.init_parameters = boom
    solver.adversarial_training(data=make_data(), model=make_model(),
                                n_iter=0, lazy_load=True)
    np.testing.assert_allclose(np.asarray(t1.param), np.asarray(fixed),
                               atol=1e-7)
    assert t2.param is not None and t2.param.shape == (2, 5)


def test_misoverlap_program_not_reused_across_chain_swap():
    """Reassigning chain_of_transforms with same-typed but differently
    configured transforms must rebuild the misoverlap program (the closure
    captures the transform objects)."""
    size = [2, 1, 32, 32]

    def make_chain(vec):
        return [AdvMorph(config_dict={"epsilon": 1.0, "data_size": size,
                                      "vector_size": vec}, seed=35)]

    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=make_chain([8, 8]), divergence_types=["mse"],
        divergence_weights=[1.0])
    solver.init_random_transformation()
    mask = jnp.ones(tuple(size))
    fn1 = solver._get_misoverlap_fn(tuple(mask.shape))
    s1 = float(solver.compute_anatomy_misoverlapping_loss(mask))
    solver.chain_of_transforms = make_chain([4, 4])
    solver.init_random_transformation()
    fn2 = solver._get_misoverlap_fn(tuple(mask.shape))
    assert fn1 is not fn2, "stale misoverlap program reused"
    s2 = float(solver.compute_anatomy_misoverlapping_loss(mask))
    assert np.isfinite(s1) and np.isfinite(s2)


def _bias_chain(epsilon=0.3, space="log"):
    return [AdvBias(config_dict={"epsilon": epsilon,
                                 "control_point_spacing": [16, 16],
                                 "downscale": 2, "data_size": SIZE,
                                 "interpolation_order": 3,
                                 "init_mode": "random", "space": space},
                    seed=42)]


def test_episode_program_not_reused_across_chain_swap():
    """Reassigning chain_of_transforms with a same-typed, same-shaped but
    differently-configured transform must rebuild the cached episode
    program (round-3 verdict item 1; closure captures the objects)."""
    data = make_data()
    model = make_model()
    tiny = AdvNoise(config_dict={"epsilon": 1e-6, "xi": 1e-6,
                                 "data_size": SIZE}, seed=40)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=[tiny], divergence_types=["mse"],
        divergence_weights=[1.0])
    solver.adversarial_training(data=data, model=model, n_iter=0)
    dev_tiny = float(jnp.max(jnp.abs(solver.adv_data - data)))
    # same type, same data_size, same program key shape — only epsilon differs
    solver.chain_of_transforms = [
        AdvNoise(config_dict={"epsilon": 0.5, "xi": 1e-6,
                              "data_size": SIZE}, seed=41)]
    solver.adversarial_training(data=data, model=model, n_iter=0)
    dev_big = float(jnp.max(jnp.abs(solver.adv_data - data)))
    assert dev_big > 100 * max(dev_tiny, 1e-12), (
        f"stale episode program: eps=0.5 deviation {dev_big} vs eps=1e-6 "
        f"deviation {dev_tiny}")


def test_init_all_program_not_reused_across_chain_swap():
    """Bias init bounds depend on epsilon; a chain swap must not draw inits
    from a stale program's bounds (round-3 verdict item 1)."""
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_bias_chain(epsilon=0.5),
        divergence_types=["mse"], divergence_weights=[1.0])
    solver.init_random_transformation()
    big = float(jnp.max(jnp.abs(solver.chain_of_transforms[0].param)))
    solver.chain_of_transforms = _bias_chain(epsilon=0.01)
    solver.init_random_transformation()
    small = float(jnp.max(jnp.abs(solver.chain_of_transforms[0].param)))
    # log-space bounds: eps=0.01 -> |cp| <= |log(0.99)| ~ 0.01005
    assert small <= 0.0101, f"stale init_all program: |param|={small}"
    assert big > 0.05, f"sanity: eps=0.5 init too small ({big})"


def test_project_all_program_not_reused_across_chain_swap():
    """Projection bounds depend on epsilon; a chain swap must not clamp to
    a stale program's bounds (round-3 verdict item 1)."""
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_bias_chain(epsilon=0.5),
        divergence_types=["mse"], divergence_weights=[1.0])
    cp_shape = solver.chain_of_transforms[0].cp_grid
    raw = jnp.full(cp_shape, 0.3)
    out1 = solver._get_project_all_fn([True])((raw,))[0]
    assert float(jnp.max(jnp.abs(out1))) > 0.2  # inside eps=0.5 bounds
    solver.chain_of_transforms = _bias_chain(epsilon=0.01)
    out2 = solver._get_project_all_fn([True])((raw,))[0]
    assert float(jnp.max(out2)) <= 0.01, (
        f"stale project_all program: max={float(jnp.max(out2))}")


def test_final_loss_program_not_reused_across_chain_swap():
    """log vs linear bias space changes the traced final-loss program but
    not the param shapes; a chain swap must rebuild it
    (round-3 verdict item 1)."""
    data = make_data()
    model = make_model()
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_bias_chain(space="log"),
        divergence_types=["mse"], divergence_weights=[1.0])
    cp_shape = solver.chain_of_transforms[0].cp_grid
    params = (jnp.full(cp_shape, 0.3),)
    init_output = solver.get_init_output(model, data)
    fn1 = solver._get_final_loss_fn(model, data.shape)
    _, adv1, _, _ = fn1(params, data, init_output)
    solver.chain_of_transforms = _bias_chain(space="linear")
    fn2 = solver._get_final_loss_fn(model, data.shape)
    _, adv2, _, _ = fn2(params, data, init_output)
    # exp(field) != 1 + field; a stale (reused) program would give
    # bitwise-identical outputs on identical inputs, so any clearly
    # nonzero gap proves the rebuild (smoothing attenuates |field| to
    # ~0.03 here, so exp-vs-linear differs by ~field^2/2 ~ 5e-4)
    assert float(jnp.max(jnp.abs(adv1 - adv2))) > 1e-5, (
        "stale final-loss program reused across log->linear chain swap")


def test_pgd_step_and_grads_programs_not_reused_across_chain_swap():
    """_get_pgd_step and compute_transform_grads close over the transform
    objects — chain swaps must rebuild both (round-3 verdict item 1)."""
    data = make_data()
    model = make_model()
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_bias_chain(space="log"),
        divergence_types=["mse"], divergence_weights=[1.0])
    init_output = solver.get_init_output(model, data)
    fn1 = solver._get_pgd_step(model, [True], [1.0], False, 50.0, data.shape)
    cp_shape = solver.chain_of_transforms[0].cp_grid
    solver.chain_of_transforms[0].set_parameters(jnp.full(cp_shape, 0.1))
    _, g1 = solver.compute_transform_grads(data, model,
                                           init_output=init_output)
    solver.chain_of_transforms = _bias_chain(space="linear")
    fn2 = solver._get_pgd_step(model, [True], [1.0], False, 50.0, data.shape)
    assert fn1 is not fn2, "stale PGD-step program reused"
    solver.chain_of_transforms[0].set_parameters(jnp.full(cp_shape, 0.1))
    _, g2 = solver.compute_transform_grads(data, model,
                                           init_output=init_output)
    assert not np.allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                           atol=1e-9), \
        "stale transform-grads program reused across log->linear chain swap"


def test_morph_remat_false_rejected():
    """AdvMorph(remat=False) must error, not silently fall back to 'auto'."""
    with pytest.raises(AssertionError):
        AdvMorph(config_dict={"epsilon": 1.0, "data_size": SIZE,
                              "vector_size": [8, 8]}, remat=False)
