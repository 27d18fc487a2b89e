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
