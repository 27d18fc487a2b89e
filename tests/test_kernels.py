"""Pallas gather-matmul kernel parity (interpret mode on CPU; the same code
compiles with Mosaic on TPU — validated there by the bench/examples)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from advchain_tpu.kernels import (corner_gather, corner_scatter,
                                  grid_sample_2d_pallas,
                                  grid_sample_3d_pallas)


def test_corner_gather_exact(rng):
    n, c, s = 2, 3, 1000
    img = jnp.asarray(rng.rand(n, c, s).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, s - 50, (n, 600)).astype(np.int32))
    offsets = (0, 1, 20, 21)
    vals = np.asarray(corner_gather(img, idx, offsets))  # (N, K, C, P)
    for k, off in enumerate(offsets):
        ref = np.take_along_axis(np.asarray(img),
                                 np.asarray(idx)[:, None, :] + off, axis=2)
        np.testing.assert_allclose(vals[:, k], ref, atol=1e-6)


def test_corner_scatter_is_transpose(rng):
    """<scatter(g), img> == <g, gather(img)> — exact adjointness."""
    n, c, s, p = 2, 2, 777, 500
    offsets = (0, 1, 30, 31)
    img = jnp.asarray(rng.rand(n, c, s).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, s - 40, (n, p)).astype(np.int32))
    g = jnp.asarray(rng.rand(n, len(offsets), c, p).astype(np.float32))
    lhs = float(jnp.sum(corner_scatter(g, idx, offsets, s)
                        * img))
    rhs = float(jnp.sum(g * corner_gather(img, idx, offsets)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
def test_pallas_2d_matches_torch(rng, padding_mode):
    x = rng.randn(3, 2, 17, 23).astype(np.float32)
    grid = (rng.rand(3, 9, 11, 2).astype(np.float32) * 2.6 - 1.3)
    ours = np.asarray(grid_sample_2d_pallas(
        jnp.asarray(x), jnp.asarray(grid), padding_mode=padding_mode))
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                           mode="bilinear", padding_mode=padding_mode,
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_pallas_3d_matches_torch(rng, padding_mode):
    x = rng.randn(2, 2, 7, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 4, 5, 6, 3).astype(np.float32) * 2.4 - 1.2)
    ours = np.asarray(grid_sample_3d_pallas(
        jnp.asarray(x), jnp.asarray(grid), padding_mode=padding_mode))
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                           mode="bilinear", padding_mode=padding_mode,
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_pallas_2d_gradients_match_torch(rng):
    x = rng.randn(1, 1, 12, 12).astype(np.float32)
    grid = (rng.rand(1, 5, 5, 2).astype(np.float32) * 1.6 - 0.8)

    gx_ours, gg_ours = jax.grad(
        lambda xx, gg: jnp.sum(grid_sample_2d_pallas(xx, gg) ** 2),
        argnums=(0, 1))(jnp.asarray(x), jnp.asarray(grid))

    xt = torch.from_numpy(x).requires_grad_(True)
    gt = torch.from_numpy(grid).requires_grad_(True)
    (F.grid_sample(xt, gt, align_corners=True) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gx_ours), xt.grad.numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gg_ours), gt.grad.numpy(),
                               atol=1e-3)
