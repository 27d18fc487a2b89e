"""Model tests: Flax UNet family shapes/modes + trained-checkpoint
conversion parity vs the torch reference model run directly (the honest
oracle — we execute the reference implementation, never copy it)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advchain_tpu.models import (UNet, UNetv2, DeeplySupervisedUNet,
                                 PseudoConv3dModel, SegmentationModel,
                                 get_unet_model)

CKPT = "/root/reference/example/saved_checkpoints/cardiac_seg_unet_16.pth"


def test_unet_random_init_forward_and_jit():
    model = SegmentationModel.create(UNet(num_classes=4, feature_scale=4),
                                     (2, 1, 64, 64))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 64, 64),
                    jnp.float32)
    y = model(x)
    assert y.shape == (2, 4, 64, 64)
    y2 = jax.jit(model.predict)(x)
    assert y2.shape == (2, 4, 64, 64)


def test_unet_batch_stats_vs_running_average_differ():
    model = SegmentationModel.create(UNet(num_classes=4, feature_scale=4),
                                     (2, 1, 32, 32))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 1, 32, 32),
                    jnp.float32)
    solver_mode = np.asarray(model(x))        # batch statistics
    inference = np.asarray(model.predict(x))  # running averages (fresh init)
    assert not np.allclose(solver_mode, inference)


def test_unet_dropout_episode_fixed():
    model = SegmentationModel.create(
        UNet(num_classes=2, feature_scale=4, encoder_dropout=0.5),
        (1, 1, 32, 32))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 1, 32, 32), jnp.float32)
    y1 = np.asarray(model(x))
    y2 = np.asarray(model(x))
    np.testing.assert_array_equal(y1, y2)  # same episode -> same mask
    model.begin_episode()
    y3 = np.asarray(model(x))
    assert not np.allclose(y1, y3)  # new episode -> new mask


def test_unetv2_and_dsv_shapes():
    m1 = SegmentationModel.create(UNetv2(num_classes=3, feature_scale=4),
                                  (1, 1, 64, 64))
    assert m1.predict(jnp.zeros((1, 1, 64, 64))).shape == (1, 3, 64, 64)
    m2 = SegmentationModel.create(
        DeeplySupervisedUNet(num_classes=3, base_n_filters=16),
        (1, 1, 64, 64))
    assert m2.predict(jnp.zeros((1, 1, 64, 64))).shape == (1, 3, 64, 64)


def test_pseudo3d_shape():
    m = SegmentationModel.create(PseudoConv3dModel(num_classes=4),
                                 (1, 1, 8, 16, 16))
    assert m.predict(jnp.zeros((1, 1, 8, 16, 16))).shape == (1, 4, 8, 16, 16)


# ------------------------------------------------- checkpoint conversion
def _load_reference_torch_unet():
    """Run the reference implementation as the oracle (SimpleITK stubbed —
    not installed in this container and unused by the model path)."""
    if "SimpleITK" not in sys.modules:
        sys.modules["SimpleITK"] = types.ModuleType("SimpleITK")
    sys.path.insert(0, "/root/reference")
    try:
        from advchain.models.unet import UNet as TorchUNet
    finally:
        sys.path.pop(0)
    import torch
    model = TorchUNet(input_channel=1, num_classes=4, feature_scale=4)
    model.load_state_dict(torch.load(CKPT, map_location="cpu"))
    model.eval()
    return model


def test_checkpoint_conversion_parity_vs_reference():
    """Converted UNet_16 must match the torch reference to <1e-3 max
    deviation (BASELINE.md north star) on a realistic input."""
    import torch
    ref = _load_reference_torch_unet()
    ours = get_unet_model(CKPT, num_classes=4, model_arch="UNet_16")
    rng = np.random.RandomState(3)
    x = rng.rand(2, 1, 192, 192).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    mine = np.asarray(ours.predict(jnp.asarray(x)))
    dev = np.abs(mine - theirs).max()
    assert dev < 1e-3, f"max deviation {dev}"


def test_checkpoint_conversion_batchstats_mode_parity():
    """Batch-statistics mode (the solver's inner-loop mode) must also match
    torch with track_running_stats disabled."""
    import torch
    ref = _load_reference_torch_unet()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.train()
            m.track_running_stats = False
    ours = get_unet_model(CKPT, num_classes=4, model_arch="UNet_16")
    rng = np.random.RandomState(4)
    x = rng.rand(2, 1, 96, 96).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    mine = np.asarray(ours(jnp.asarray(x)))
    dev = np.abs(mine - theirs).max()
    assert dev < 1e-2, f"max deviation {dev}"
