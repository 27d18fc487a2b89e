"""Parity tests for advchain_tpu.losses vs a torch oracle implementing the
reference formulas (advchain/common/loss.py — see SURVEY.md section 2 row 7)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from advchain_tpu import losses

TOL = 1e-5


def _logits(rng, *shape):
    return (rng.randn(*shape) * 2).astype(np.float32)


# -------------------------------------------------------------- torch oracle
def _kl_oracle(ref, pred, mask=None, is_gt=False):
    q = torch.from_numpy(pred)
    r = torch.from_numpy(ref)
    m = torch.ones_like(q) if mask is None else torch.from_numpy(mask)
    if not is_gt:
        p = F.softmax(r, dim=1)
        log_p = F.log_softmax(r, dim=1)
    else:
        p = torch.where(r == 0, torch.tensor(1e-8), torch.tensor(1 - 1e-8))
        log_p = torch.log(p)
    plogp = torch.sum(m * (p * log_p), dim=1)
    plogq = torch.sum(m * (p * F.log_softmax(q, dim=1)), dim=1)
    return torch.mean(plogp - plogq).item()


def _mse_oracle(ref, pred, mask=None, is_gt=False):
    r = torch.from_numpy(ref)
    q = torch.from_numpy(pred)
    c = r.shape[1]
    m = torch.ones_like(q) if mask is None else torch.from_numpy(mask)
    tp = r if is_gt else torch.softmax(r, dim=1)
    ip = torch.softmax(q, dim=1)
    loss = torch.nn.MSELoss(reduction="mean")(input=ip * m, target=tp * m)
    return (loss / (m.numel() / c)).item()


def _contour_oracle_single_channel(inp, tgt, mask, spatial_dims):
    """Per-class (1-channel) contour loss, reference loss.py:141-219."""
    i_t = torch.from_numpy(inp)
    t_t = torch.from_numpy(tgt)
    m = torch.from_numpy(mask)[:, :1]
    if spatial_dims == 2:
        xf = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]],
                          dtype=torch.float32).view(1, 1, 3, 3)
        yf = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
                          dtype=torch.float32).view(1, 1, 3, 3)
        gx_p = F.conv2d(i_t, xf, padding=1) * m
        gy_p = F.conv2d(i_t, yf, padding=1) * m
        gx_t = F.conv2d(t_t, xf, padding=1) * m
        gy_t = F.conv2d(t_t, yf, padding=1) * m
        return 0.5 * (F.mse_loss(gx_p, gx_t) + F.mse_loss(gy_p, gy_t)).item()
    smooth = np.array([1, 2, 1], np.float64)
    diff = np.array([1, 0, -1], np.float64)
    gx = np.einsum("i,j,k->ijk", smooth, diff, smooth)
    gz = np.einsum("i,j,k->ijk", smooth, smooth, diff)
    gxk = torch.from_numpy(gx.reshape(1, 1, 3, 3, 3)).float()
    gzk = torch.from_numpy(gz.reshape(1, 1, 3, 3, 3)).float()
    gx_p = F.conv3d(i_t, gxk, padding=1) * m
    gy_p = F.conv3d(i_t, gxk, padding=1) * m  # reference gy duplicates gx
    gz_p = F.conv3d(i_t, gzk, padding=1) * m
    gx_t = F.conv3d(t_t, gxk, padding=1) * m
    gy_t = F.conv3d(t_t, gxk, padding=1) * m
    gz_t = F.conv3d(t_t, gzk, padding=1) * m
    return (1 / 3 * (F.mse_loss(gx_p, gx_t) + F.mse_loss(gy_p, gy_t)
                     + F.mse_loss(gz_p, gz_t))).item()


def _consistency_oracle(out, ref, types, weights, scales=(0,), mask=None,
                        is_gt=False):
    c = ref.shape[1]
    spatial_dims = out.ndim - 2
    dist = 0.0
    for scale in scales:
        if scale > 0:
            pool = (F.avg_pool2d if spatial_dims == 2 else F.avg_pool3d)
            ref_s = pool(torch.from_numpy(ref), 2 ** scale).numpy()
            out_s = pool(torch.from_numpy(out), 2 ** scale).numpy()
            mask_s = None if mask is None else pool(
                torch.from_numpy(mask), 2 ** scale).numpy()
        else:
            ref_s, out_s, mask_s = ref, out, mask
        for ty, w in zip(types, weights):
            if ty == "kl":
                loss = _kl_oracle(ref_s, out_s, mask_s, is_gt)
            elif ty == "mse":
                loss = _mse_oracle(ref_s, out_s, mask_s, is_gt)
            elif ty == "contour":
                tp = ref_s if is_gt else torch.softmax(
                    torch.from_numpy(ref_s), dim=1).numpy()
                ip = torch.softmax(torch.from_numpy(out_s), dim=1).numpy()
                m = np.ones_like(out_s) if mask_s is None else mask_s
                loss = 0.0
                for i in range(1, c):
                    loss += _contour_oracle_single_channel(
                        ip[:, i:i + 1], tp[:, i:i + 1], m, spatial_dims)
                loss /= (c - 1)
            dist += 2 ** scale * w * loss
    return dist / len(scales)


# -------------------------------------------------------------------- tests
@pytest.mark.parametrize("is_gt", [False, True])
def test_kl_divergence_parity(rng, is_gt):
    ref = _logits(rng, 2, 4, 12, 10)
    pred = _logits(rng, 2, 4, 12, 10)
    if is_gt:
        lab = rng.randint(0, 4, (2, 12, 10))
        ref = np.eye(4, dtype=np.float32)[lab].transpose(0, 3, 1, 2)
    ours = float(losses.kl_divergence(jnp.asarray(ref), jnp.asarray(pred),
                                      is_gt=is_gt))
    theirs = _kl_oracle(ref, pred, is_gt=is_gt)
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_kl_with_mask_parity(rng):
    ref = _logits(rng, 2, 3, 8, 8)
    pred = _logits(rng, 2, 3, 8, 8)
    mask = (rng.rand(2, 3, 8, 8) > 0.3).astype(np.float32)
    ours = float(losses.kl_divergence(jnp.asarray(ref), jnp.asarray(pred),
                                      mask=jnp.asarray(mask)))
    np.testing.assert_allclose(ours, _kl_oracle(ref, pred, mask), atol=TOL)


def test_mse_consistency_parity(rng):
    ref = _logits(rng, 3, 4, 16, 16)
    pred = _logits(rng, 3, 4, 16, 16)
    mask = (rng.rand(3, 4, 16, 16) > 0.5).astype(np.float32)
    ours = float(losses.calc_segmentation_consistency(
        jnp.asarray(pred), jnp.asarray(ref), divergence_types=["mse"],
        divergence_weights=[1.0], mask=jnp.asarray(mask)))
    theirs = _consistency_oracle(pred, ref, ["mse"], [1.0], mask=mask)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("spatial", [(14, 12), (6, 8, 10)])
def test_contour_consistency_parity(rng, spatial):
    shape = (2, 3) + spatial
    ref = _logits(rng, *shape)
    pred = _logits(rng, *shape)
    ours = float(losses.calc_segmentation_consistency(
        jnp.asarray(pred), jnp.asarray(ref), divergence_types=["contour"],
        divergence_weights=[1.0]))
    theirs = _consistency_oracle(pred, ref, ["contour"], [1.0])
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-8)


def test_combined_multiscale_parity(rng):
    ref = _logits(rng, 2, 4, 32, 32)
    pred = _logits(rng, 2, 4, 32, 32)
    ours = float(losses.calc_segmentation_consistency(
        jnp.asarray(pred), jnp.asarray(ref),
        divergence_types=["kl", "contour", "mse"],
        divergence_weights=[1.0, 0.5, 0.3], scales=[0, 1, 2]))
    theirs = _consistency_oracle(pred, ref, ["kl", "contour", "mse"],
                                 [1.0, 0.5, 0.3], scales=[0, 1, 2])
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-8)


def test_consistency_zero_when_identical(rng):
    ref = _logits(rng, 2, 4, 16, 16)
    v = float(losses.calc_segmentation_consistency(
        jnp.asarray(ref), jnp.asarray(ref),
        divergence_types=["kl", "mse", "contour"],
        divergence_weights=[1.0, 1.0, 1.0]))
    assert abs(v) < 1e-6


def test_one_hot():
    lab = np.array([[[0, 1], [2, 3]]])
    oh = np.asarray(losses.one_hot(jnp.asarray(lab), 4))
    assert oh.shape == (1, 4, 2, 2)
    ref = np.eye(4, dtype=np.float32)[lab].transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(oh, ref)


@pytest.mark.parametrize("weight", [None, [1.0, 2.0, 0.5, 1.5]])
def test_cross_entropy_2d_hard_labels(rng, weight):
    logits = _logits(rng, 2, 4, 8, 8)
    target = rng.randint(0, 4, (2, 8, 8))
    ours = float(losses.cross_entropy_2d(jnp.asarray(logits),
                                         jnp.asarray(target), weight=weight))
    lp = F.log_softmax(torch.from_numpy(logits), dim=1)
    lp = lp.transpose(1, 2).transpose(2, 3).contiguous().view(-1, 4)
    t = torch.from_numpy(target.reshape(-1))
    w = None
    if weight is not None:
        w = torch.tensor(weight, dtype=torch.float32)
        w = w / w.sum() * 4
    lv = F.nll_loss(lp, t, weight=w, reduction="none")
    theirs = (torch.sum(lv) / (2 * 8 * 8)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("weight", [None, [1.0, 2.0, 0.5, 1.5]])
def test_cross_entropy_2d_soft_targets(rng, weight):
    logits = _logits(rng, 2, 4, 8, 8)
    probs = torch.softmax(torch.from_numpy(_logits(rng, 2, 4, 8, 8)),
                          dim=1).numpy()
    ours = float(losses.cross_entropy_2d(jnp.asarray(logits),
                                         jnp.asarray(probs), weight=weight))
    lp = F.log_softmax(torch.from_numpy(logits), dim=1)
    lp = lp.transpose(1, 2).transpose(2, 3).contiguous().view(-1, 4)
    r = torch.from_numpy(probs).transpose(1, 2).transpose(2, 3)
    r = r.contiguous().view(-1, 4)
    if weight is None:
        plogq = torch.sum(r * lp) / (2 * 8 * 8)
    else:
        w = np.array(weight)
        w = w / w.sum() * 4
        plogq = sum(torch.sum(r[:, i] * lp[:, i] * w[i]) for i in range(4))
        plogq = plogq / (2 * 8 * 8)
    np.testing.assert_allclose(ours, (-plogq).item(), rtol=1e-5, atol=1e-7)


def test_cross_entropy_rank_generic_3d_matches_torch(rng):
    """cross_entropy (framework extension; reference only ships a 2D CE,
    loss.py:274) on 3D logits == torch mean CE."""
    logits = _logits(rng, 2, 4, 3, 8, 8)
    target = rng.randint(0, 4, (2, 3, 8, 8))
    ours = float(losses.cross_entropy(jnp.asarray(logits),
                                      jnp.asarray(target)))
    theirs = F.cross_entropy(torch.from_numpy(logits),
                             torch.from_numpy(target).long()).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_cross_entropy_rank_generic_matches_2d(rng):
    logits = _logits(rng, 2, 4, 8, 8)
    target = rng.randint(0, 4, (2, 8, 8))
    a = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    b = float(losses.cross_entropy_2d(jnp.asarray(logits),
                                      jnp.asarray(target)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
