"""Tests for the extended block zoo (shapes + key semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from advchain_tpu.models import (ConvDown, ResConvDown, ResConv,
                                 ResBilinearUp, ResConvUp, DilationConv,
                                 OutConvRelu, SELayer, CSELayer,
                                 ChannelSELayer, SpatialSELayer,
                                 ChannelSpatialSELayer, SqeUp,
                                 BatchInstanceNorm, AdaptiveInstanceNorm,
                                 AdaptiveBatchNorm,
                                 bilinear_additive_upsampling,
                                 spatial_pyramid_pool, UnetConv3, UnetUp3,
                                 TorchBatchNorm)


def _init_apply(module, *xs, method_kwargs=None):
    rng = {"params": jax.random.PRNGKey(0),
           "dropout": jax.random.PRNGKey(1)}
    kw = method_kwargs or {}
    variables = module.init(rng, *xs, **kw)
    return module.apply(variables, *xs, **kw,
                        rngs={"dropout": jax.random.PRNGKey(2)})


def _x(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape)
                       .astype(np.float32))


def test_down_up_block_shapes():
    x = _x(2, 16, 16, 8)
    assert _init_apply(ConvDown(16), x).shape == (2, 8, 8, 16)
    assert _init_apply(ResConvDown(16), x).shape == (2, 8, 8, 16)
    assert _init_apply(ResConv(16), x).shape == (2, 16, 16, 16)
    assert _init_apply(DilationConv(12, dilation=2), x).shape == (2, 16, 16, 12)
    lo = _x(2, 8, 8, 16, seed=1)
    hi = _x(2, 16, 16, 8, seed=2)
    assert _init_apply(ResBilinearUp(12), lo, hi).shape == (2, 16, 16, 12)
    assert _init_apply(ResConvUp(12), lo, hi).shape == (2, 16, 16, 12)
    assert _init_apply(SqeUp(12), lo, hi).shape == (2, 16, 16, 12)
    assert _init_apply(OutConvRelu(4), x).shape == (2, 16, 16, 4)
    y = _init_apply(OutConvRelu(4), x)
    assert float(jnp.min(y)) >= 0.0  # relu head


def test_se_layers_gate_bounds():
    x = _x(2, 8, 8, 16)
    for mod in (SELayer(), CSELayer(), ChannelSELayer(), SpatialSELayer(),
                ChannelSpatialSELayer()):
        y = np.asarray(_init_apply(mod, x))
        assert y.shape == x.shape
        # sigmoid-gated: |out| <= |in| elementwise for nonneg input
        assert (y <= np.asarray(x) + 1e-6).all()
        assert (y >= -1e-6).all()


def test_batch_instance_norm_gate_one_equals_bn():
    x = _x(4, 8, 8, 6)
    bin_mod = BatchInstanceNorm()
    variables = bin_mod.init(jax.random.PRNGKey(0), x,
                             use_running_average=False)
    # gate starts at 1 -> pure batch-norm branch
    out = bin_mod.apply(variables, x, use_running_average=False)
    bn = TorchBatchNorm()
    bn_vars = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    ref = bn.apply(bn_vars, x, use_running_average=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_adaptive_norms():
    x = _x(2, 8, 8, 4)
    w = jnp.asarray(np.full(4, 2.0, np.float32))
    b = jnp.asarray(np.full(4, 0.5, np.float32))
    out = _init_apply(AdaptiveInstanceNorm(), x, w, b)
    # per-(sample, channel) normalized then scaled: mean ~0.5, std ~2
    m = np.asarray(out).mean(axis=(1, 2))
    np.testing.assert_allclose(m, 0.5, atol=1e-3)
    out_bn = _init_apply(AdaptiveBatchNorm(), x, w, b)
    np.testing.assert_allclose(np.asarray(out_bn).mean(), 0.5, atol=1e-3)


def test_bilinear_additive_upsampling():
    x = _x(1, 4, 4, 8)
    y = bilinear_additive_upsampling(x, 2)
    assert y.shape == (1, 8, 8, 2)
    # each output channel is the sum of 4 upsampled input channels
    from advchain_tpu.models.unet import upsample2x_align_corners
    up = np.asarray(upsample2x_align_corners(x))
    np.testing.assert_allclose(np.asarray(y)[..., 0],
                               up[..., :4].sum(-1), atol=1e-5)


def test_spatial_pyramid_pool():
    x = _x(2, 16, 16, 3)
    out = spatial_pyramid_pool(x, [1, 2, 4])
    assert out.shape == (2, 3 * (1 + 4 + 16))
    # bin=1 equals global max pool
    np.testing.assert_allclose(np.asarray(out)[:, :3],
                               np.asarray(x).max(axis=(1, 2)), atol=1e-6)


def test_unet3d_blocks():
    x = _x(1, 8, 8, 8, 4)
    y = _init_apply(UnetConv3(8), x)
    assert y.shape == (1, 8, 8, 8, 8)
    lo = _x(1, 4, 4, 4, 8, seed=3)
    skip = _x(1, 8, 8, 8, 4, seed=4)
    up = _init_apply(UnetUp3(8, z_scale_factor=2), skip, lo)
    assert up.shape == (1, 8, 8, 8, 8)


def test_domain_blocks_and_simple_convs():
    from advchain_tpu.models import (DomainDoubleConv, DomainInConv,
                                     DomainPoolDown, DomainUp, UnetConv2,
                                     Conv2DBatchNorm, Conv2DBatchNormRelu)
    x = _x(2, 16, 16, 8)
    m = DomainDoubleConv(12, num_domains=3)
    v = m.init(jax.random.PRNGKey(0), x, 0)
    y0 = m.apply(v, x, 0)
    assert y0.shape == (2, 16, 16, 12)
    # different domain banks share convs but differ after BN training drift:
    # at init the banks are identical, so outputs match
    y1 = m.apply(v, x, 1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
    # 3 domains -> 3 independent norm banks in params
    assert "norm_1_2" in v["params"]
    assert _init_apply(DomainInConv(12, 2), x,
                       method_kwargs={"domain_id": 1}).shape == (2, 16, 16, 12)
    assert _init_apply(DomainPoolDown(12, 2), x,
                       method_kwargs={"domain_id": 0}).shape == (2, 8, 8, 12)
    lo = _x(2, 8, 8, 16, seed=5)
    assert _init_apply(DomainUp(12, 2), lo, x,
                       method_kwargs={"domain_id": 1}).shape == (2, 16, 16, 12)
    assert _init_apply(UnetConv2(10), x).shape == (2, 16, 16, 10)
    assert _init_apply(Conv2DBatchNorm(10), x).shape == (2, 16, 16, 10)
    assert _init_apply(Conv2DBatchNormRelu(10), x).shape == (2, 16, 16, 10)


def test_unet_last_layer_act():
    from advchain_tpu.models import UNet, SegmentationModel
    m = SegmentationModel.create(
        UNet(num_classes=4, feature_scale=16, last_layer_act="softmax"),
        (1, 1, 32, 32))
    y = np.asarray(m.predict(jnp.zeros((1, 1, 32, 32))))
    np.testing.assert_allclose(y.sum(axis=1), 1.0, atol=1e-5)


def test_spectral_norm_conv_matches_torch_oracle():
    """flax.linen.SpectralNorm wiring (the reference if_SN branches,
    unet_parts.py:16-44) against torch.nn.utils.spectral_norm: both sides
    converge power iteration (u inits differ, so compare at convergence —
    sigma -> the true top singular value), then compare eval outputs.
    torch reshapes the kernel (out, in*k*k), flax ((k*k*in), out) — the
    transposed matrix has the same singular values."""
    import torch
    import flax.linen as fnn

    torch.manual_seed(0)  # torch's u init draws from the global RNG
    r = np.random.RandomState(0)
    w = r.randn(6, 4, 3, 3).astype(np.float32)  # torch OIHW
    # make the top singular value strongly dominant so BOTH power
    # iterations converge to machine precision from any random u start
    # (a raw Gaussian's sigma1/sigma2 gap can be small -> flaky test)
    wm = w.reshape(6, -1)
    u1, s1, v1 = np.linalg.svd(wm, full_matrices=False)
    wm = wm + 4.0 * s1[0] * np.outer(u1[:, 0], v1[0])
    w = wm.reshape(6, 4, 3, 3).astype(np.float32)
    b = r.randn(6).astype(np.float32)
    x = r.rand(2, 4, 8, 8).astype(np.float32)

    tconv = torch.nn.Conv2d(4, 6, 3, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
    tsn = torch.nn.utils.spectral_norm(tconv, n_power_iterations=1)
    tsn.train()
    with torch.no_grad():
        for _ in range(200):  # converge u
            tsn(torch.from_numpy(x))
    tsn.eval()
    with torch.no_grad():
        y_t = tsn(torch.from_numpy(x)).numpy()

    conv = fnn.Conv(6, (3, 3), padding=1, name="c")
    sn = fnn.SpectralNorm(conv, n_steps=200)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = sn.init(jax.random.PRNGKey(0), x_nhwc, update_stats=False)
    # inject the torch weights (flax kernel layout HWIO); the top-level
    # SpectralNorm wrapper scopes the conv as 'layer_instance'
    k_flax = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    params = {"layer_instance": {"kernel": k_flax, "bias": jnp.asarray(b)}}
    _, upd = sn.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      x_nhwc, update_stats=True,
                      mutable=["batch_stats"])
    y_j = sn.apply({"params": params, "batch_stats": upd["batch_stats"]},
                   x_nhwc, update_stats=False)
    y_j = np.transpose(np.asarray(y_j), (0, 3, 1, 2))
    # cross-check both against the closed-form sigma (SVD) normalization
    sigma = np.linalg.svd(w.reshape(6, -1), compute_uv=False)[0]
    t_exact = torch.nn.Conv2d(4, 6, 3, padding=1)
    with torch.no_grad():
        t_exact.weight.copy_(torch.from_numpy(w / sigma))
        t_exact.bias.copy_(torch.from_numpy(b))
        y_exact = t_exact(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y_t, y_exact, atol=2e-4)
    np.testing.assert_allclose(y_j, y_exact, atol=2e-4)
    np.testing.assert_allclose(y_j, y_t, atol=2e-4)


def test_spectral_blocks_run_and_differ():
    """spectral=True changes the forward output (sigma > 1 for random
    kernels) and leaves shapes intact for every flagged block."""
    x = _x(2, 16, 16, 8)
    lo = _x(2, 8, 8, 16, seed=1)
    hi = _x(2, 16, 16, 8, seed=2)
    for plain, spec, args in [
            (ConvDown(16), ConvDown(16, spectral=True), (x,)),
            (ResConvDown(16), ResConvDown(16, spectral=True), (x,)),
            (ResConv(16), ResConv(16, spectral=True), (x,)),
            (ResBilinearUp(12), ResBilinearUp(12, spectral=True), (lo, hi)),
            (ResConvUp(12), ResConvUp(12, spectral=True), (lo, hi)),
    ]:
        y0 = np.asarray(_init_apply(plain, *args))
        y1 = np.asarray(_init_apply(spec, *args))
        assert y0.shape == y1.shape
        assert np.isfinite(y1).all()
        assert not np.allclose(y0, y1), type(plain).__name__


def test_unet_spectral_flag_solver_compatible():
    """UNet(spectral=True) must work through the SegmentationModel paths
    the solver uses: frozen apply (mutable=False) and apply_train
    (mutable batch_stats, power-iteration updates)."""
    from advchain_tpu.models import UNet, SegmentationModel
    size = (2, 1, 32, 32)
    m = SegmentationModel.create(
        UNet(num_classes=4, feature_scale=16, spectral=True), size)
    x = _x(*size, seed=3)
    y = m(x)  # frozen path: update_stats must stay off (mutable=False)
    assert y.shape == (2, 4, 32, 32) and np.isfinite(np.asarray(y)).all()
    logits, new_bs = m.apply_train(m.params, m.batch_stats, x,
                                   jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(logits)).all()
    # power iteration updated the stored u/sigma estimates
    flat_old = jax.tree_util.tree_leaves(m.batch_stats)
    flat_new = jax.tree_util.tree_leaves(new_bs)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(flat_old, flat_new))
